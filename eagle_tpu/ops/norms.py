"""Normalization layers (f32 math regardless of activation dtype, matching the
reference's f32 norm computation in llm_build_norm, src/llama.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(
    x: jax.Array, weight: jax.Array | None, bias: jax.Array | None, eps: float
) -> jax.Array:
    """Mean-subtracted LayerNorm in f32 (the reference's LLM_NORM path in
    llm_build_norm — gpt2/starcoder2/command-r/phi2/falcon families)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = xc * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def rms_norm(x: jax.Array, weight: jax.Array | None, eps: float) -> jax.Array:
    """RMSNorm; `weight=None` gives the unweighted norm used by the EAGLE head's
    final norm (the draft head has no output_norm tensor — src/llama.cpp:1982)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(x.dtype)
