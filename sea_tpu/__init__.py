"""sea_tpu — TPU-native SEA sparse attention framework (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of
gmlwns2000/sea-attention (SEA: Sparse Linear Attention with Estimated
Attention Mask, ICLR 2024) designed for TPU: static shapes, uniform-CSR
sparse masks, Pallas kernels, pjit/shard_map parallelism.
"""

from .config import SeaConfig, bert_config, opt_config

__version__ = "0.1.0"

__all__ = ["SeaConfig", "bert_config", "opt_config", "__version__"]
