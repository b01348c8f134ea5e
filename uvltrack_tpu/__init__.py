"""uvltrack_tpu — a TPU-native (JAX/XLA/Pallas) vision-language tracking framework.

A from-scratch rebuild of the capabilities of OpenSpaceAI/UVLTrack (AAAI 2024):
unified single-object tracking driven by a bounding box (BBOX), natural language
(NL), or both (NL+BBOX), with a modality-unified ViT+BERT feature extractor,
multi-modal contrastive alignment, and a modality-adaptive box head.

Design stance (see SURVEY.md §7): pure-functional flax models, static shapes,
one jit-compiled device call per tracking step, bf16 on the MXU, sharding via
jax.sharding.Mesh + NamedSharding for data/model parallel training.
"""

__version__ = "0.1.0"
