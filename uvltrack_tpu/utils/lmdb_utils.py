"""LMDB-backed dataset IO (parity: lib/utils/lmdb_utils.py:11-42).

Cached per-path LMDB environments with image/str/json decode. The lmdb
package is not part of the baked environment; everything here degrades to a
clear ImportError at first use so the pure-filesystem adapters stay usable.
"""

from __future__ import annotations

import json
from typing import Dict

import numpy as np

try:
    import lmdb

    HAS_LMDB = True
except ImportError:  # pragma: no cover
    lmdb = None
    HAS_LMDB = False

_ENVS: Dict[str, "lmdb.Environment"] = {}


def _require():
    if not HAS_LMDB:
        raise ImportError(
            "lmdb is not installed; install it or use the filesystem dataset "
            "adapters (the *_lmdb dataset names require it)")


def get_env(db_path: str):
    _require()
    if db_path not in _ENVS:
        _ENVS[db_path] = lmdb.open(db_path, readonly=True, lock=False,
                                   readahead=False, meminit=False)
    return _ENVS[db_path]


def read_bytes(db_path: str, key: str) -> bytes:
    env = get_env(db_path)
    with env.begin(write=False) as txn:
        buf = txn.get(key.encode())
    if buf is None:
        raise KeyError(f"{key!r} not found in {db_path}")
    return buf


def decode_img(db_path: str, key: str) -> np.ndarray:
    import cv2

    buf = read_bytes(db_path, key)
    arr = np.frombuffer(buf, np.uint8)
    img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def decode_str(db_path: str, key: str) -> str:
    return read_bytes(db_path, key).decode()


def decode_json(db_path: str, key: str):
    return json.loads(decode_str(db_path, key))
