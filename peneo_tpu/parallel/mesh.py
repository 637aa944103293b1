"""Device mesh + sharding layout.

TPU-native replacement for the reference's torchrun/DDP/NCCL stack
(SURVEY.md §2.6; reference: pipeline/trainer.py DDP wrap, evaluation.py
all_gather). Parallelism is expressed as a 2D ``(dp, tp)``
jax.sharding.Mesh:

- **dp** (data parallel): the batch dimension of every input is sharded;
  gradient reduction is the automatic psum XLA inserts for replicated params.
- **tp** (tensor parallel): attention QKV/output and MLP kernels are sharded
  Megatron-style (column- then row-parallel), as are the pair-head combine
  and classifier kernels — the O(L²·H) pair features are then sharded over
  their hidden dim, so the dominant decoder FLOPs and memory split across
  the tp axis with one reduce per classifier.

Collectives ride ICI inside a slice; scaling across slices adds an outer
(dcn) mesh dim later. Single-device runs use a trivial 1×1 mesh so the same
jitted step serves all configurations.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, sp: int = 1,
              devices=None) -> Mesh:
    """(dp, tp, sp) mesh. ``sp`` is the sequence-parallel axis sharding the
    pair grid's rows (parallel/seq_parallel.py); dp/tp semantics per the
    module docstring. sp=1 keeps the axis degenerate so every existing
    (dp, tp) PartitionSpec works unchanged."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // (tp * sp)
    assert dp * tp * sp == len(devices), (
        f"dp({dp}) * tp({tp}) * sp({sp}) != device count {len(devices)}")
    arr = np.asarray(devices).reshape(dp, tp, sp)
    return Mesh(arr, ("dp", "tp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


# (regex on 'a/b/c' param path) → PartitionSpec. First match wins; default
# replicated. Column-parallel kernels shard the output dim, row-parallel
# kernels the input dim (contraction inserts the psum).
_PARAM_RULES = (
    # backbone attention: qkv column-parallel, output projection row-parallel
    (r".*self_attn/(layout_)?(query|key|value)/kernel$", P(None, "tp")),
    (r".*self_attn/(layout_)?(query|key|value)/bias$", P("tp")),
    (r".*(attn_output|layout_attn_output)/dense/kernel$", P("tp", None)),
    # backbone MLPs
    (r".*(mlp|layout_mlp)/intermediate_dense/kernel$", P(None, "tp")),
    (r".*(mlp|layout_mlp)/intermediate_dense/bias$", P("tp")),
    (r".*(mlp|layout_mlp)/output/dense/kernel$", P("tp", None)),
    # layoutlmv3 single-stream naming
    (r".*layer_\d+/(query|key|value)/kernel$", P(None, "tp")),
    (r".*layer_\d+/(query|key|value)/bias$", P("tp")),
    (r".*attention_output_dense/kernel$", P("tp", None)),
    (r".*layer_\d+/intermediate/kernel$", P(None, "tp")),
    (r".*layer_\d+/intermediate/bias$", P("tp")),
    (r".*layer_\d+/output_dense/kernel$", P("tp", None)),
    # pair head: combine column-parallel → pair features sharded on hidden,
    # classifier hidden column-parallel, logits row-parallel
    (r".*peneo_decoder/comb_[ab]/kernel$", P(None, "tp")),
    (r".*peneo_decoder/comb_a/bias$", P("tp")),
    (r".*heads/.*fc_\d+/kernel$", P(None, "tp")),
    (r".*heads/.*fc_\d+/bias$", P("tp")),
    (r".*heads/.*fc_out/kernel$", P("tp", None)),
    # large embedding tables: shard the vocab/bucket dim (gathers stay local-ish
    # via XLA's partitioned gather)
    (r".*word_embeddings/embedding$", P("tp", None)),
)


def param_spec(path: str) -> P:
    for pat, spec in _PARAM_RULES:
        if re.match(pat, path):
            return spec
    return P()


def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, prefix + (k,))
    else:
        yield prefix, tree


# leaves smaller than this stay replicated under fsdp (sharding tiny biases
# costs more in collective latency than it saves in HBM)
_FSDP_MIN_ELEMENTS = 2 ** 15


def param_shardings(params, mesh: Mesh, fsdp: bool = False,
                    fsdp_min_elements: int = _FSDP_MIN_ELEMENTS):
    """Pytree of NamedShardings matching ``params`` via _PARAM_RULES.

    Falls back to replicated when a sharded dim is not divisible by the tp
    axis size (tiny test models).

    ``fsdp=True`` additionally shards each large leaf's biggest tp-free dim
    over the **dp** axis (ZeRO-3 style): params AND the mirrored adam moments
    (shard_state places mu/nu like params) live 1/dp-sized per chip; XLA
    inserts the all-gather at use and the reduce-scatter on gradients. The
    reference has nothing comparable — DDP replicates everything
    (SURVEY.md §2.6 'FSDP-style sharded params later')."""
    tp = mesh.shape["tp"]
    dp = mesh.shape["dp"]

    def spec_for(path, leaf):
        spec = param_spec("/".join(path))
        for dim, axis in enumerate(spec):
            if axis == "tp" and (dim >= leaf.ndim or leaf.shape[dim] % tp != 0):
                spec = P()
                break
        if not fsdp or dp == 1 or leaf.size < fsdp_min_elements:
            return spec
        axes = list(spec) + [None] * (leaf.ndim - len(spec))
        free = [d for d in range(leaf.ndim)
                if axes[d] is None and leaf.shape[d] % dp == 0]
        if not free:
            return spec
        best = max(free, key=lambda d: leaf.shape[d])
        axes[best] = "dp"
        return P(*axes)

    out = {}
    for path, leaf in _tree_paths(params):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = NamedSharding(mesh, spec_for(path, leaf))
    return out


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
