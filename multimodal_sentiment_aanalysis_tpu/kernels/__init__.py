"""Pallas TPU kernels for the hot compute blocks.

Each kernel is a drop-in for a jax.numpy implementation in ``ops/`` or
``models/`` and carries an A/B numerics test against it (SURVEY.md §7.5):

- :mod:`contrastive` — fused supervised InfoNCE (normalize + similarity
  matmul + masked log-sum-exp in one VMEM-resident kernel)
- :mod:`attention`   — blockwise flash multi-head attention
- :mod:`conv_stem`   — fused conv-BN-GELU-pool EEG stem block (serving path)
- :mod:`fusion_head` — fused ME-MHACL modality-MHA fusion + classifier

Kernels dispatch to the pure-jnp reference implementation off-TPU
(``interpret`` mode covers CPU testing).
"""

from .contrastive import fused_supervised_infonce
from .attention import flash_mha
from .conv_stem import fused_conv_bn_gelu_pool
from .fusion_head import fused_mha_fusion_head

__all__ = [
    "fused_supervised_infonce",
    "flash_mha",
    "fused_conv_bn_gelu_pool",
    "fused_mha_fusion_head",
]
