"""peneo-tpu: TPU-native document key-value pair extraction (PEneo capabilities).

A from-scratch JAX/XLA/Pallas framework providing the full capability surface of
the PEneo reference (line extraction + line grouping + entity linking over a
LayoutLM-family multimodal backbone), redesigned TPU-first:

- flax.linen functional models (params as pytrees), bf16 compute / fp32 params
- dense (L, L) pair-label matrices instead of flattened L(L+1)/2 "shaking"
  sequences (XLA-friendly static shapes; semantics identical)
- blockwise pair-head that never materializes (B, L, L, 2H); fused Pallas
  BiACM attention kernel on the LiLT backbone
- pjit/shard_map data+tensor parallel training over a jax.sharding.Mesh
- host-side data plane (tokenization, reading-order packing, label building)
- orbax checkpointing, optax two-group optimizer (head-LR speedup)

Reference behavior citations in docstrings point into the upstream PEneo repo
(ZeningLin/PEneo) as `<file>:<line>`.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
