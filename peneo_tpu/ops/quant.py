"""Int8 serving quantization: a drop-in Dense that runs its matmul
s8×s8→s32 on the MXU (2× the bf16 peak on v5e).

Param names/shapes are identical to ``nn.Dense`` so full-precision
checkpoints load unchanged; quantization is derived on the fly —
per-output-channel symmetric scales for the kernel (an O(H·F) reduce,
trivial next to the matmuls it feeds) and per-row dynamic scales for the
activations (amax over the contraction axis, fused into the producer that
materializes the row). Serving-only: callers gate on deterministic
forwards; the quantized matmul has no useful gradient.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class Int8Dense(nn.Module):
    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        H = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (H, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        w_scale = jnp.max(jnp.abs(kernel), axis=0) / 127.0
        wq = jnp.round(kernel / jnp.maximum(w_scale, 1e-12)).astype(jnp.int8)
        xf = x.astype(jnp.float32)
        x_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        xq = jnp.round(xf / jnp.maximum(x_scale, 1e-12)).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((xf.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * x_scale * w_scale
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


def dense(features: int, *, quant: bool, kernel_init: Callable,
          dtype, name: str, use_bias: bool = True) -> nn.Module:
    """``nn.Dense`` or :class:`Int8Dense` behind one switch — identical
    param tree either way."""
    if quant:
        return Int8Dense(features, kernel_init=kernel_init,
                         use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, kernel_init=kernel_init, use_bias=use_bias,
                    dtype=dtype, name=name)
