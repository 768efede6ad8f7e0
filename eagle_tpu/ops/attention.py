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
    k_cache: jax.Array,  # [B, H_kv, S, D] (head-major)
    v_cache: jax.Array,  # [B, H_kv, S, D]
    mask: jax.Array,  # [B, T, S] bool
    scale: float | None = None,
    softcap: float = 0.0,  # gemma2 attn_logit_softcapping
    alibi: jax.Array | None = None,  # [H] per-head ALiBi slopes (bloom/mpt)
    q_pos: jax.Array | None = None,  # [B, T] query positions (ALiBi only)
) -> jax.Array:
    """Returns [B, T, H, D] (f32).

    QK/PV contractions run on cache-native dtype inputs with f32 MXU
    accumulation — K/V are never materialized at f32 width (that would double
    the decode-critical HBM traffic); softmax is f32."""
    b, t, h, d = q.shape
    h_kv = k_cache.shape[1]
    group = h // h_kv
    if scale is None:
        scale = d**-0.5

    cdt = k_cache.dtype
    qc = q.astype(cdt).reshape(b, t, h_kv, group, d)
    scores = jnp.einsum(
        "btkgd,bksd->bkgts", qc, k_cache, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if softcap > 0:
        scores = softcap * jnp.tanh(scores / softcap)
    if alibi is not None:
        # ALiBi: score(i, j) -= slope_h * (i - j). Key position == slot index
        # (the engines' slot==position cache invariant); computed as broadcast
        # iota math so XLA fuses it into the score computation — never a
        # materialized [B, H, T, S] tensor in HBM.
        s_io = jnp.arange(k_cache.shape[2], dtype=jnp.int32)[None, None, :]
        dist = (q_pos[:, :, None] - s_io).astype(jnp.float32)  # [B, T, S]
        slopes = alibi.astype(jnp.float32).reshape(1, h_kv, group, 1, 1)
        scores = scores - slopes * dist[:, None, None, :, :]
    scores = jnp.where(mask[:, None, None, :, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgts,bksd->btkgd", probs.astype(cdt), v_cache,
        preferred_element_type=jnp.float32,
    )
    # value width can differ from the QK head dim (deepseek2 MLA)
    return out.reshape(b, t, h, v_cache.shape[-1])
