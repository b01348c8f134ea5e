from .attention import attention_core, get_backend, key_padding_bias, set_backend, xla_attention

__all__ = ["attention_core", "get_backend", "key_padding_bias", "set_backend", "xla_attention"]
