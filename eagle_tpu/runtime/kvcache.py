"""KV cache — static-shape, position-tagged.

Design notes (vs the reference): llama.cpp keeps a host-side ring of cells with
{pos, seq_id} per slot and rebuilds an attention mask per ubatch on the host
(src/llama-kv-cache.h:10-78, mask build src/llama-context.cpp:136-200). On TPU
everything must be static-shaped and device-resident, so the cache is a dense
[L, B, S, H_kv, D] buffer plus a per-slot *position tag* array `slot_pos`
[B, S] (-1 = empty). Masks are computed on device from the tags; sequence
trimming/rollback (speculation rejects, context shift) is O(1): overwrite the
tags, never move K/V data. This subsumes llama.cpp's seq_rm/seq_add cell
machinery for the single-sequence-per-slot case; multi-sequence batching gives
each batch row its own cache rows (continuous batching assigns requests to
rows)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KVCache:
    k: jax.Array  # [L, B, H_kv, S, D]
    v: jax.Array  # [L, B, H_kv, S, D]
    slot_pos: jax.Array  # [B, S] int32, position tag per slot, -1 = empty
    #: int8 KV quantization (the reference's type_k/type_v,
    #: src/llama-kv-cache.h:49-50): when k/v are int8 these hold per-vector
    #: (per layer/batch/head/slot) absmax scales; None for float caches.
    k_scale: jax.Array | None = None  # [L, B, H_kv, S] f32
    v_scale: jax.Array | None = None

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @staticmethod
    def create(n_layers, batch, max_seq, n_kv_heads, head_dim, dtype=jnp.bfloat16,
               v_head_dim: int | None = None):
        """`v_head_dim` differs from the (QK) head_dim only for MLA archs
        (deepseek2: key = nope+rope dims, value = v_head_dim)."""
        shape = (n_layers, batch, n_kv_heads, max_seq, head_dim)
        vshape = shape[:-1] + (v_head_dim or head_dim,)
        if dtype == jnp.int8:
            return KVCache(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(vshape, jnp.int8),
                slot_pos=jnp.full((batch, max_seq), -1, jnp.int32),
                k_scale=jnp.zeros(shape[:-1], jnp.float32),
                v_scale=jnp.zeros(shape[:-1], jnp.float32),
            )
        return KVCache(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(vshape, dtype),
            slot_pos=jnp.full((batch, max_seq), -1, jnp.int32),
        )

    def with_tags(self, slots: jax.Array, positions: jax.Array, valid=None) -> "KVCache":
        """Tag `slots` [B,T] with `positions` [B,T] (write happens in the model
        forward; tags define visibility). `valid` [B,T] bool masks out padding
        writes (their tag is set to -1 only if the slot was previously empty —
        padded writes always target a dedicated scratch slot by convention)."""
        pos = positions if valid is None else jnp.where(valid, positions, -1)
        b_idx = jnp.arange(self.slot_pos.shape[0])[:, None]
        return dataclasses.replace(
            self, slot_pos=self.slot_pos.at[b_idx, slots].set(pos.astype(jnp.int32))
        )

    def rollback(self, keep_below: jax.Array) -> "KVCache":
        """Invalidate every slot whose position >= keep_below [B] (the KV
        rollback after speculative verification — functional equivalent of
        llama_kv_cache_seq_rm(ctx, 0, n_past, -1), llama-kv-cache.cpp:368)."""
        new_tags = jnp.where(self.slot_pos >= keep_below[:, None], -1, self.slot_pos)
        return dataclasses.replace(self, slot_pos=new_tags)


def quantize_kv_vec(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-vector symmetric int8: x [..., D] -> (codes int8 [..., D],
    scale f32 [...])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale == 0, 1.0, scale), 0.0)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) * inv[..., None]), -127, 127)
    return codes.astype(jnp.int8), scale


def dequantize_kv(codes: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """codes int8 [..., D] x scale [...] -> dense [..., D] in `dtype`."""
    return (codes.astype(dtype) * scale.astype(dtype)[..., None])


def context_shift(kv: KVCache, inv_freq: jax.Array, n_keep: int, n_discard: int) -> KVCache:
    """Evict `n_discard` tokens after the first `n_keep`, slide the rest down,
    and re-rotate the cached keys by -n_discard positions.

    The functional equivalent of llama.cpp's context shift (main.cpp:553-577:
    kv_cache_seq_rm + seq_add and the deferred K-shift RoPE graph,
    build_k_shift src/llama.cpp:1334-1370) — here it is one jitted tensor
    program: a slice-roll of the cache rows plus a rope of the moved keys.
    Keeps the slot==position invariant the engines rely on."""
    from ..ops.rope import apply_rope

    s = kv.max_seq
    start = n_keep + n_discard

    def shift_rows(buf, rotate: bool, scale=None):
        # buf: [L, B, H, S, D]
        moved = buf[:, :, :, start:]
        new_scale = None
        if rotate:
            l, b, h, t, d = moved.shape
            if scale is not None:  # int8 cache: dequant -> rotate -> requant
                moved = dequantize_kv(moved, scale[:, :, :, start:], jnp.float32)
            flat = moved.transpose(0, 1, 3, 2, 4).reshape(l * b, t, h, d)
            neg = jnp.full((l * b, t), -n_discard, jnp.int32)
            flat = apply_rope(flat, neg, inv_freq)
            moved = flat.reshape(l, b, t, h, d).transpose(0, 1, 3, 2, 4)
            if scale is not None:
                moved, sc = quantize_kv_vec(moved)
                new_scale = jax.lax.dynamic_update_slice_in_dim(scale, sc, n_keep, axis=3)
            else:
                moved = moved.astype(buf.dtype)
        elif scale is not None:
            new_scale = jax.lax.dynamic_update_slice_in_dim(
                scale, scale[:, :, :, start:], n_keep, axis=3
            )
        return jax.lax.dynamic_update_slice_in_dim(buf, moved, n_keep, axis=3), new_scale

    k, k_scale = shift_rows(kv.k, rotate=True, scale=kv.k_scale)
    v, v_scale = shift_rows(kv.v, rotate=False, scale=kv.v_scale)
    tags = kv.slot_pos
    moved_tags = jnp.where(tags[:, start:] >= 0, tags[:, start:] - n_discard, -1)
    tags = jax.lax.dynamic_update_slice_in_dim(tags, moved_tags, n_keep, axis=1)
    # invalidate the tail that slid away
    s_iota = jnp.arange(s, dtype=jnp.int32)[None, :]
    tags = jnp.where(s_iota >= s - n_discard, -1, tags)
    return dataclasses.replace(
        kv, k=k, v=v, slot_pos=tags, k_scale=k_scale, v_scale=v_scale
    )


def self_extend_shift(kv: KVCache, inv_freq: jax.Array, n_past: int, ga_i: int,
                      ga_n: int, ga_w: int) -> tuple[KVCache, int, int]:
    """One Self-Extend group-attention compression step — the functional
    equivalent of main.cpp:590-608's seq_add/seq_div/seq_add triple plus the
    deferred K-shift re-rope (build_k_shift, src/llama.cpp:1334):

        add [ga_i, n_past) += ib*bd
        div [ga_i+ib*bd, ga_i+ib*bd+ga_w) /= ga_n
        add [ga_i+ib*bd+ga_w, n_past+ib*bd) += dd

    Position tags are remapped and cached K re-rotated by each slot's delta
    in one tensor program; slots (token ordinals) never move. Returns
    (kv, new_n_past, new_ga_i)."""
    from ..ops.rope import apply_rope

    ib = (ga_n * ga_i) // ga_w
    bd = (ga_w // ga_n) * (ga_n - 1)
    dd = (ga_w // ga_n) - ib * bd - ga_w

    pos = kv.slot_pos  # [B, S]
    live = pos >= 0
    p = pos
    in1 = live & (p >= ga_i) & (p < n_past)
    p = jnp.where(in1, p + ib * bd, p)
    lo = ga_i + ib * bd
    in2 = live & (p >= lo) & (p < lo + ga_w)
    p = jnp.where(in2, p // ga_n, p)
    in3 = live & (pos >= 0) & (jnp.where(in1, pos + ib * bd, pos) >= lo + ga_w) & (
        jnp.where(in1, pos + ib * bd, pos) < n_past + ib * bd
    )
    p = jnp.where(in3, p + dd, p)

    delta = jnp.where(live, p - pos, 0)  # [B, S]
    l, b, h, s, d = kv.k.shape
    if kv.quantized:
        k_f = dequantize_kv(kv.k, kv.k_scale, jnp.float32)
    else:
        k_f = kv.k
    flat = k_f.transpose(0, 1, 3, 2, 4).reshape(l * b, s, h, d)
    deltas = jnp.tile(delta, (l, 1))  # [L*B, S]
    flat = apply_rope(flat, deltas, inv_freq)
    k_new = flat.reshape(l, b, s, h, d).transpose(0, 1, 3, 2, 4)
    if kv.quantized:
        k_new, k_sc = quantize_kv_vec(k_new)
        kv = dataclasses.replace(kv, k=k_new, k_scale=k_sc, slot_pos=p)
    else:
        kv = dataclasses.replace(kv, k=k_new.astype(kv.k.dtype), slot_pos=p)
    return kv, n_past - bd, ga_i + ga_w // ga_n


def causal_mask_from_tags(
    slot_pos: jax.Array, q_positions: jax.Array, swa_window: int = 0
) -> jax.Array:
    """Boolean attention mask [B, T, S]: slot visible iff non-empty and its
    position <= the query token's position (mirrors the reference's
    cell-position mask, llama-context.cpp:136-200). `swa_window` > 0 adds the
    sliding-window constraint (inp_KQ_mask_swa, src/llama-context.h:103)."""
    vis = (slot_pos[:, None, :] >= 0) & (
        slot_pos[:, None, :] <= q_positions[:, :, None]
    )
    if swa_window > 0:
        vis = vis & (q_positions[:, :, None] - slot_pos[:, None, :] < swa_window)
    return vis
