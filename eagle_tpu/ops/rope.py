"""Rotary position embedding, half-split ("NEOX"/HF) layout.

The GGUF loader un-permutes llama q/k projection rows back to HF layout
(inverting convert_hf_to_gguf.py:1596 LlamaModel.permute), so runtime rope is
always the TPU-friendly half-split form: no lane interleaving, just one roll of
the feature halves — maps to cheap VPU ops under XLA."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_freqs(head_dim: int, base: float, scale_factor: float = 1.0) -> jax.Array:
    """Inverse frequencies [head_dim/2] (f32)."""
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv_freq = 1.0 / (base**exponent)
    return inv_freq / scale_factor


def apply_rope(x: jax.Array, positions: jax.Array, inv_freq: jax.Array) -> jax.Array:
    """Rotate features.

    x: [..., T, H, D]; positions: broadcastable to [..., T] (int32);
    inv_freq: [D/2].
    """
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, D/2]
    cos = jnp.cos(angles)[..., None, :]  # [..., T, 1, D/2]
    sin = jnp.sin(angles)[..., None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)
