from . import lmdb_utils

__all__ = ["lmdb_utils"]
