"""Fused decode/verify attention Pallas kernel (flash-style online softmax).

Replaces the XLA einsum attention on the decode path: K/V stream from the
layer-stacked head-major cache [L, B, H_kv, S, D] (layer picked by
scalar-prefetch — no slice copies), scores+softmax+PV accumulate in VMEM over
S blocks, nothing round-trips to HBM. The visibility mask (position tags /
tree ancestors) is computed outside and streamed per block — so the same
kernel serves causal decode, speculative verify, and tree attention.

Counterpart of the reference's fattn kernels (ggml-cuda/fattn*.cu) built for
the tagged-cache design."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pick_tile(dim, target, multiple_of):
    best = multiple_of
    d = multiple_of
    while d <= min(dim, target):
        if dim % d == 0:
            best = d
        d += multiple_of
    return best


def _flash_kernel(l_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, m_ref, s_ref, acc_ref, *, scale, n_sblocks):
    """One (head-block, S-block) step: HB heads processed per grid step so the
    grid is S/SB * H/HB steps, not H*S/SB — per-step overhead was what lost
    to XLA's einsum at decode S=1024 (supports_flash history)."""
    s_idx = pl.program_id(2)

    @pl.when(s_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [HB, TGp, D]
    k = k_ref[0, 0]  # [HB, SB, D]
    v = v_ref[0, 0]
    hb, tgp, _ = q.shape
    mask = mask_ref[0]  # [TGp, SB] bool (shared across heads)

    scores = jax.lax.dot_general(
        q.astype(k.dtype), k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [HB, TGp, SB]
    scores = jnp.where(mask[None], scores, _NEG_INF)

    m_prev = m_ref[:, :, :1]  # [HB, TGp, 1]
    m_cur = jnp.max(scores, axis=2, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)  # [HB, TGp, SB]
    s_new = s_ref[:, :, :1] * alpha + jnp.sum(p, axis=2, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    s_ref[:] = jnp.broadcast_to(s_new, s_ref.shape)

    @pl.when(s_idx == n_sblocks - 1)
    def _():
        denom = jnp.maximum(s_ref[:, :, :1], 1e-20)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "s_block", "s_limit"))
def _flash_call(q_hm, k_cache, v_cache, mask_rows, layer, scale, interpret=False,
                s_block=512, s_limit=None):
    b, h_kv, tgp, d = q_hm.shape
    L = k_cache.shape[0]
    # s_limit (static) bounds the S grid: only cache blocks [0, s_limit) are
    # DMA'd — the caller guarantees every visible tag lives below it. The
    # BlockSpec index maps are unchanged; blocks past the limit simply never
    # come up in the grid.
    s = s_limit if s_limit is not None else k_cache.shape[3]
    sb = _pick_tile(s, s_block, 128)
    hb = 8 if h_kv % 8 == 0 else (h_kv if h_kv <= 8 else _pick_tile(h_kv, 8, 1))
    grid = (b, h_kv // hb, s // sb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, tgp, d), lambda bi, hi, si, l: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hb, sb, d), lambda bi, hi, si, l: (l[0], bi, hi, si, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hb, sb, d), lambda bi, hi, si, l: (l[0], bi, hi, si, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tgp, sb), lambda bi, hi, si, l: (bi, 0, si), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, tgp, d), lambda bi, hi, si, l: (bi, hi, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((hb, tgp, 128), jnp.float32),
            pltpu.VMEM((hb, tgp, 128), jnp.float32),
            pltpu.VMEM((hb, tgp, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, n_sblocks=s // sb),
        out_shape=jax.ShapeDtypeStruct((b, h_kv, tgp, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h_kv * tgp * s * d,
            bytes_accessed=2 * b * h_kv * s * d * 2,
            transcendentals=b * h_kv * tgp * s,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), q_hm, k_cache, v_cache, mask_rows)


def flash_attention_cached(
    q: jax.Array,  # [B, T, H, D]
    k_cache: jax.Array,  # [L, B, H_kv, S, D]
    v_cache: jax.Array,
    mask: jax.Array,  # [B, T, S_read] bool — S_read == s_limit when bounded
    layer: jax.Array,  # scalar layer index
    scale: float | None = None,
    interpret: bool = False,
    s_limit: int | None = None,
) -> jax.Array:
    """Returns [B, T, H, D] f32. `s_limit` (static) bounds the cache read to
    slots [0, s_limit); `mask` must already be sliced to that extent."""
    b, t, h, d = q.shape
    h_kv = k_cache.shape[2]
    g = h // h_kv
    if scale is None:
        scale = d**-0.5
    tg = t * g
    tgp = _round_up(max(tg, 8), 8)

    q_hm = q.reshape(b, t, h_kv, g, d).transpose(0, 2, 1, 3, 4).reshape(b, h_kv, tg, d)
    mask_rows = jnp.repeat(mask, g, axis=1)  # [B, TG, S]
    if tgp != tg:
        q_hm = jnp.pad(q_hm, ((0, 0), (0, 0), (0, tgp - tg), (0, 0)))
        mask_rows = jnp.pad(mask_rows, ((0, 0), (0, tgp - tg), (0, 0)))

    out = _flash_call(q_hm, k_cache, v_cache, mask_rows, layer, scale,
                      interpret=interpret, s_limit=s_limit)
    out = out[:, :, :tg].reshape(b, h_kv, t, g, d).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, t, h, d)


def _flash_prefill_kernel(l_ref, q_ref, k_ref, v_ref, qpos_ref, spos_ref,
                          o_ref, m_ref, s_ref, acc_ref, *, scale, n_sblocks):
    """Prefill flash: (head-block, T-block, S-block) grid with the causal
    tag mask computed IN KERNEL from q positions + cache slot tags — no
    O(T*S) mask (or scores) ever materializes in HBM. Same online-softmax
    recurrence as _flash_kernel."""
    s_idx = pl.program_id(3)

    @pl.when(s_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [HB, TB, D]
    k = k_ref[0, 0]  # [HB, SB, D]
    v = v_ref[0, 0]
    q_pos = qpos_ref[0]  # [TB] int32 (g-repeated rows)
    s_tag = spos_ref[0]  # [SB] int32 position tags (-1 = empty slot)
    # visibility: slot holds a valid tag at or before the query position
    mask = (s_tag[None, :] >= 0) & (s_tag[None, :] <= q_pos[:, None])  # [TB, SB]

    scores = jax.lax.dot_general(
        q.astype(k.dtype), k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [HB, TB, SB]
    scores = jnp.where(mask[None], scores, _NEG_INF)

    m_prev = m_ref[:, :, :1]
    m_cur = jnp.max(scores, axis=2, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)
    s_new = s_ref[:, :, :1] * alpha + jnp.sum(p, axis=2, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    s_ref[:] = jnp.broadcast_to(s_new, s_ref.shape)

    @pl.when(s_idx == n_sblocks - 1)
    def _():
        denom = jnp.maximum(s_ref[:, :, :1], 1e-20)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "t_block",
                                             "s_block", "s_limit"))
def _flash_prefill_call(q_hm, k_cache, v_cache, q_pos_rows, slot_pos, layer,
                        scale, interpret=False, t_block=256, s_block=256,
                        s_limit=None):
    b, h_kv, tgp, d = q_hm.shape
    s = s_limit if s_limit is not None else k_cache.shape[3]
    sb = _pick_tile(s, s_block, 128)
    tb = _pick_tile(tgp, t_block, 8)
    hb = 8 if h_kv % 8 == 0 else (h_kv if h_kv <= 8 else _pick_tile(h_kv, 8, 1))
    grid = (b, h_kv // hb, tgp // tb, s // sb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, tb, d), lambda bi, hi, ti, si, l: (bi, hi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hb, sb, d),
                         lambda bi, hi, ti, si, l: (l[0], bi, hi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hb, sb, d),
                         lambda bi, hi, ti, si, l: (l[0], bi, hi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda bi, hi, ti, si, l: (bi, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sb), lambda bi, hi, ti, si, l: (bi, si),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, tb, d), lambda bi, hi, ti, si, l: (bi, hi, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((hb, tb, 128), jnp.float32),
            pltpu.VMEM((hb, tb, 128), jnp.float32),
            pltpu.VMEM((hb, tb, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_flash_prefill_kernel, scale=scale, n_sblocks=s // sb),
        out_shape=jax.ShapeDtypeStruct((b, h_kv, tgp, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h_kv * tgp * s * d,
            bytes_accessed=2 * b * h_kv * s * d * 2 * (tgp // tb),
            transcendentals=b * h_kv * tgp * s,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), q_hm, k_cache, v_cache,
      q_pos_rows, slot_pos)


def flash_attention_prefill(
    q: jax.Array,  # [B, T, H, D]
    k_cache: jax.Array,  # [L, B, H_kv, S, D]
    v_cache: jax.Array,
    q_pos: jax.Array,  # [B, T] int32 query positions
    slot_pos: jax.Array,  # [B, S] int32 cache tags (-1 empty)
    layer: jax.Array,
    scale: float | None = None,
    interpret: bool = False,
    s_limit: int | None = None,
) -> jax.Array:
    """Long-context prefill attention over the tagged cache: tiles Q rows AND
    cache columns; the causal mask derives from tags in VMEM, so HBM traffic
    stays O(T*D + S*D) instead of the XLA path's O(T*S) score round-trip."""
    b, t, h, d = q.shape
    h_kv = k_cache.shape[2]
    g = h // h_kv
    if scale is None:
        scale = d**-0.5
    tg = t * g
    tgp = _round_up(max(tg, 8), 8)

    q_hm = q.reshape(b, t, h_kv, g, d).transpose(0, 2, 1, 3, 4).reshape(b, h_kv, tg, d)
    q_pos_rows = jnp.repeat(q_pos, g, axis=1)  # [B, TG]
    if tgp != tg:
        q_hm = jnp.pad(q_hm, ((0, 0), (0, 0), (0, tgp - tg), (0, 0)))
        q_pos_rows = jnp.pad(q_pos_rows, ((0, 0), (0, tgp - tg)),
                             constant_values=-1)  # padded rows see nothing

    out = _flash_prefill_call(q_hm, k_cache, v_cache, q_pos_rows,
                              slot_pos.astype(jnp.int32), layer, scale,
                              interpret=interpret, s_limit=s_limit)
    out = out[:, :, :tg].reshape(b, h_kv, t, g, d).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, t, h, d)


def supports_flash_prefill(t: int, h: int, h_kv: int, s: int, d: int) -> bool:
    """Gate for the prefill flash kernel: worth it once the chunk is large
    enough that XLA's materialized [H, T, S] scores dominate HBM traffic."""
    return (
        t >= 256
        and s >= 512
        and d % 128 == 0
        and s % 128 == 0
        and (t * (h // h_kv)) % 8 == 0
        and h_kv % 8 == 0
    )


def supports_flash(t: int, h: int, h_kv: int, s: int, d: int) -> bool:
    """Use the fused kernel where it beats XLA's einsum attention. The
    original per-head grid lost at decode S<=1024 (60.2 vs 57.5 t/s on 7B);
    the head-blocked grid (8 heads/step, S/512 blocks) cut per-step overhead
    ~8x, so the kernel takes over from S>=512."""
    return s % 128 == 0 and d % 128 == 0 and t * (h // h_kv) <= 256 and s >= 512