"""Attention ops: masked GQA attention over a position-tagged KV cache.

XLA einsum implementation (the MXU handles these shapes well for verify/prefill
batches); a Pallas flash-attention kernel takes over for long contexts — see
ops/pallas_attention.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # large-negative instead of -inf: keeps softmax NaN-free on fully-masked rows


def gqa_attention(
    q: jax.Array,  # [B, T, H, D]
    k_cache: jax.Array,  # [B, S, H_kv, D]
    v_cache: jax.Array,  # [B, S, H_kv, D]
    mask: jax.Array,  # [B, T, S] bool
    scale: float | None = None,
) -> jax.Array:
    """Returns [B, T, H, D] (f32)."""
    b, t, h, d = q.shape
    h_kv = k_cache.shape[2]
    group = h // h_kv
    if scale is None:
        scale = d**-0.5

    qf = q.astype(jnp.float32).reshape(b, t, h_kv, group, d)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)

    scores = jnp.einsum("btkgd,bskd->bkgts", qf, kf, preferred_element_type=jnp.float32)
    scores = scores * scale
    scores = jnp.where(mask[:, None, None, :, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bskd->btkgd", probs, vf, preferred_element_type=jnp.float32)
    return out.reshape(b, t, h, d)
