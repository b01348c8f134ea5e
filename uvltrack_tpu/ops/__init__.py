from .attention import (attention_core, attention_qkv_core, get_backend,
                        key_padding_bias, set_backend, xla_attention)

__all__ = ["attention_core", "attention_qkv_core", "get_backend",
           "key_padding_bias", "set_backend", "xla_attention"]
