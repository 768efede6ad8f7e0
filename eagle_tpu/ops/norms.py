"""Normalization layers (f32 math regardless of activation dtype, matching the
reference's f32 norm computation in llm_build_norm, src/llama.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array | None, eps: float) -> jax.Array:
    """RMSNorm; `weight=None` gives the unweighted norm used by the EAGLE head's
    final norm (the draft head has no output_norm tensor — src/llama.cpp:1982)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(x.dtype)
