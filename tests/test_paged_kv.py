"""Paged/shared KV pool: indirection correctness, prefix sharing, allocator.

The paged pool (runtime/paged_kv.py) replaces the reference's shared cell
buffer + seq_id machinery (src/llama-kv-cache.h:10-78, find_slot
llama-kv-cache.cpp:120). These tests prove the page indirection is invisible
to the model: a paged forward over a SHUFFLED page mapping must produce the
dense forward's logits exactly, prefix-shared pages must serve a second
sequence without re-prefill, and the allocator must share/evict correctly."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.models.config import ModelConfig
from eagle_tpu.models.llama import llama_forward
from eagle_tpu.models.synth import synth_llama_params
from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags
from eagle_tpu.runtime.paged_kv import PagedKVCache, PagePool

# CPU eager mode can't dispatch bf16 dots — run every forward under jit
_fwd = jax.jit(
    lambda params, tokens, pos, kv, slots, mask, lim=None: llama_forward(
        params, CFG, tokens, pos, kv, slots, mask, backend="xla",
        compute_dtype=jnp.float32, kv_limit=lim,
    ), static_argnames=("lim",)
)

CFG = ModelConfig(
    arch="llama", vocab_size=128, n_embd=64, n_layers=2, n_heads=2,
    n_kv_heads=2, head_dim=32, n_ff=128, rope_dim=32, rms_eps=1e-5,
    n_ctx_train=256,
)
PS = 8  # page size


@pytest.fixture(scope="module")
def params():
    return synth_llama_params(CFG, seed=3)


def _dense_logits(params, tokens, steps=3, kv_dtype=jnp.float32):
    b, t = tokens.shape
    kv = KVCache.create(CFG.n_layers, b, 64, CFG.n_kv_heads, CFG.head_dim, kv_dtype)
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    kv = kv.with_tags(positions, positions)
    mask = causal_mask_from_tags(kv.slot_pos, positions)
    out = _fwd(params, tokens, positions, kv, positions, mask)
    logits = [out.logits[:, -1]]
    tok = jnp.argmax(out.logits[:, -1], -1)
    kv = out.kv
    for s in range(steps):
        pos = jnp.full((b, 1), t + s, jnp.int32)
        kv = kv.with_tags(pos, pos)
        mask = causal_mask_from_tags(kv.slot_pos, pos)
        out = _fwd(params, tok[:, None], pos, kv, pos, mask)
        logits.append(out.logits[:, -1])
        tok = jnp.argmax(out.logits[:, -1], -1)
        kv = out.kv
    return jnp.stack(logits, 1)


def _paged_logits(params, tokens, page_table, pool_pages, steps=3,
                  kv_dtype=jnp.float32):
    b, t = tokens.shape
    mp = page_table.shape[1]
    kv = PagedKVCache.create(CFG.n_layers, b, pool_pages, mp, PS,
                             CFG.n_kv_heads, CFG.head_dim, kv_dtype)
    kv = dataclasses.replace(kv, page_table=jnp.asarray(page_table, jnp.int32))
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    kv = kv.with_tags(positions, positions)
    mask = causal_mask_from_tags(kv.slot_pos, positions)
    out = _fwd(params, tokens, positions, kv, positions, mask, lim=64)
    logits = [out.logits[:, -1]]
    tok = jnp.argmax(out.logits[:, -1], -1)
    kv = out.kv
    for s in range(steps):
        pos = jnp.full((b, 1), t + s, jnp.int32)
        kv = kv.with_tags(pos, pos)
        mask = causal_mask_from_tags(kv.slot_pos, pos)
        out = _fwd(params, tok[:, None], pos, kv, pos, mask, lim=64)
        logits.append(out.logits[:, -1])
        tok = jnp.argmax(out.logits[:, -1], -1)
        kv = out.kv
    return jnp.stack(logits, 1), kv


def test_paged_forward_matches_dense(params):
    """A shuffled page mapping must be invisible: logits == dense exactly."""
    rng = np.random.default_rng(0)
    b, t = 2, 19
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (b, t)), jnp.int32)
    dense = _dense_logits(params, tokens, kv_dtype=jnp.float32)
    # 8 slot-pages per row, mapped to a shuffled disjoint set of pool pages
    perm = rng.permutation(24)[: b * 8].reshape(b, 8)
    paged, _ = _paged_logits(params, tokens, perm, pool_pages=24,
                             kv_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(paged), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_paged_int8_shuffle_invariant(params):
    """int8 pool: the page shuffle must not change a single logit (same
    quantized codes + scales regardless of where pages land)."""
    rng = np.random.default_rng(0)
    b, t = 2, 19
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (b, t)), jnp.int32)
    ident = np.arange(b * 8, dtype=np.int32).reshape(b, 8)
    base, _ = _paged_logits(params, tokens, ident, pool_pages=24,
                            kv_dtype=jnp.int8)
    perm = rng.permutation(24)[: b * 8].reshape(b, 8)
    shuf, _ = _paged_logits(params, tokens, perm, pool_pages=24,
                            kv_dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(shuf), np.asarray(base))


def test_paged_prefix_sharing(params):
    """Row 1 reuses row 0's prompt pages (tags preset, NO prefill of the
    shared region) and must decode identically to a full prefill."""
    rng = np.random.default_rng(1)
    t = 16  # exactly 2 full pages
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, t)), jnp.int32)

    # full prefill of row 0 into pages [0, 1], then decode 4 steps
    pt = np.full((2, 8), -1, np.int32)
    pt[0, :4] = [0, 1, 2, 3]
    kv = PagedKVCache.create(CFG.n_layers, 2, 16, 8, PS, CFG.n_kv_heads,
                             CFG.head_dim, jnp.float32)
    kv = dataclasses.replace(kv, page_table=jnp.asarray(pt))
    positions = jnp.arange(t, dtype=jnp.int32)[None, :]
    slots = jnp.concatenate([positions, jnp.full((1, t), -1, jnp.int32)], 0)
    pos2 = jnp.concatenate([positions, jnp.zeros((1, t), jnp.int32)], 0)
    toks2 = jnp.concatenate([prompt, jnp.zeros((1, t), jnp.int32)], 0)
    kv = kv.with_tags(slots, pos2, valid=jnp.asarray([[True] * t, [False] * t]))
    mask = causal_mask_from_tags(kv.slot_pos, pos2)
    out = _fwd(params, toks2, pos2, kv, slots, mask, lim=64)
    kv = out.kv

    # row 1: SHARE pages [0, 1] (the 16 prompt tokens), tags preset, and remap
    # its write window to fresh pages [4, 5...]
    pt2 = np.array(kv.page_table)
    pt2[1, :2] = [0, 1]
    pt2[1, 2:5] = [4, 5, 6]
    kv = dataclasses.replace(kv, page_table=jnp.asarray(pt2))
    shared_tags = jnp.stack([kv.slot_pos[0], kv.slot_pos[0]])  # copy row-0 tags
    kv = dataclasses.replace(kv, slot_pos=shared_tags)

    # decode both rows from the same last prompt token
    last = jnp.concatenate([prompt[:, -1:], prompt[:, -1:]], 0)
    # row 0 already holds the prompt's K/V INCLUDING slot t-1... both rows
    # decode the next position t
    tok = last[:, 0]
    outs = []
    for s in range(4):
        pos = jnp.full((2, 1), t + s, jnp.int32)
        kv = kv.with_tags(pos, pos)
        mask = causal_mask_from_tags(kv.slot_pos, pos)
        o = _fwd(params, tok[:, None], pos, kv, pos, mask, lim=64)
        outs.append(o.logits[:, -1])
        tok = jnp.argmax(o.logits[:, -1], -1)
        kv = o.kv
    outs = np.asarray(jnp.stack(outs, 1))
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-5, atol=1e-5)


def test_page_pool_allocator():
    pool = PagePool(n_pages=8, page_size=4)
    pages = [pool.alloc() for _ in range(8)]
    assert len(set(pages)) == 8
    with pytest.raises(MemoryError):
        pool.alloc()
    for p in pages[4:]:
        pool.release(p)
    assert pool.alloc() in pages[4:]


def test_page_pool_prefix_cache():
    pool = PagePool(n_pages=16, page_size=4)
    toks = list(range(11))  # 2 full pages + partial
    p0, p1 = pool.alloc(), pool.alloc()
    pool.register_prefix(toks, [p0, p1])
    n, pages = pool.match_prefix(toks)
    assert n == 8 and pages == [p0, p1]
    assert pool.ref[p0] == 3  # owner + cache + match
    # a diverging prefix shares only the first page
    toks2 = toks[:4] + [99, 98, 97, 96, 95]
    n2, pages2 = pool.match_prefix(toks2)
    assert n2 == 4 and pages2 == [p0]
    # release all references except the cache's: pages stay cached
    # (p0: alloc + both matches; p1: alloc + first match)
    for _ in range(3):
        pool.release(p0)
    pool.release(p1), pool.release(p1)
    assert pool.ref[p0] == 1 and pool.ref[p1] == 1
    # exhaust the pool: cached pages get evicted LRU rather than OOM
    got = [pool.alloc() for _ in range(16)]
    assert len(got) == 16


def test_paged_rollback_matches_dense_semantics():
    kv = PagedKVCache.create(1, 1, 4, 4, PS, 1, 8, jnp.float32)
    slots = jnp.arange(12, dtype=jnp.int32)[None, :]
    kv = kv.with_tags(slots, slots)
    kv = kv.rollback(keep_below=jnp.asarray([7], jnp.int32))
    tags = np.asarray(kv.slot_pos[0])
    assert (tags[:7] == np.arange(7)).all() and (tags[7:] == -1).all()
