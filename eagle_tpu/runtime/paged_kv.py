"""Paged/shared KV pool — the serving-scale cache.

The reference shares ONE cell buffer across all sequences with per-cell
seq_id sets and a find_slot allocator (src/llama-kv-cache.h:10-78,
llama-kv-cache.cpp:120 find_slot) — that sharing is what makes its server
slots memory-viable. The dense TPU cache (runtime/kvcache.py) reserves
B x max_seq rows regardless of occupancy; this module is the TPU-shaped
replacement: a page pool à la vLLM / ragged-paged-attention (PAPERS.md),
static-shaped for XLA.

Layout
------
- pool      kp/vp [L, P, H_kv, page, D] — P physical pages shared by all slots
- page map  page_table [B, MP] int32 — slot-local page index -> pool page
            (-1 = unmapped; reads clamp to page 0, tags keep the rows invisible)
- tags      slot_pos [B, MP*page] int32 — IDENTICAL semantics to the dense
            cache's position tags, so every engine (speculation rollback,
            masks, chunked prefill) runs unchanged on a paged cache.

Logical slot s of batch row b lives at pool page page_table[b, s // page],
row s % page. The model forward (models/llama.py:_layer_step) does the
indirection: writes scatter through the table, reads gather the mapped pages
and run the same attention. Sharing: two batch rows whose tables reference the
same pool page read the same K/V bytes — the host-side PagePool allocator
(refcounts + full-page prefix hashing) decides who shares what, which also
lets the scheduler skip prefill for shared prefixes entirely (identical
(token, position) prefixes produce identical K/V).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PagedKVCache:
    k: jax.Array  # [L, P, H_kv, page, D] — page pool
    v: jax.Array
    page_table: jax.Array  # [B, MP] int32, -1 = unmapped
    slot_pos: jax.Array  # [B, MP*page] int32 position tags, -1 = empty
    k_scale: jax.Array | None = None  # [L, P, H_kv, page] f32 (int8 pool)
    v_scale: jax.Array | None = None
    page_size: int = dataclasses.field(metadata=dict(static=True), default=64)

    @property
    def max_seq(self) -> int:
        return self.page_table.shape[1] * self.page_size

    @property
    def n_pages(self) -> int:
        """Allocatable pages — the pool's LAST physical page is a reserved
        write-sink scratch page (never allocated, never read)."""
        return self.k.shape[1] - 1

    @property
    def scratch_page(self) -> int:
        return self.k.shape[1] - 1

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @staticmethod
    def create(n_layers, batch, n_pages, pages_per_slot, page_size,
               n_kv_heads, head_dim, dtype=jnp.bfloat16,
               v_head_dim: int | None = None) -> "PagedKVCache":
        """Allocates `n_pages` usable pages PLUS one reserved scratch page at
        physical index n_pages: writes whose slot or page-table entry is
        unmapped (-1) are routed there by the model forward, so they can never
        corrupt a live page regardless of caller invariants (dus clamps and
        scatter wrap would otherwise both land in-bounds on a real page)."""
        shape = (n_layers, n_pages + 1, n_kv_heads, page_size, head_dim)
        vshape = shape[:-1] + (v_head_dim or head_dim,)
        kw = {}
        if dtype == jnp.int8:
            kw = dict(
                k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(vshape, jnp.int8),
                k_scale=jnp.zeros(shape[:-1], jnp.float32),
                v_scale=jnp.zeros(vshape[:-1], jnp.float32),
            )
        else:
            kw = dict(k=jnp.zeros(shape, dtype), v=jnp.zeros(vshape, dtype))
        return PagedKVCache(
            page_table=jnp.full((batch, pages_per_slot), -1, jnp.int32),
            slot_pos=jnp.full((batch, pages_per_slot * page_size), -1, jnp.int32),
            page_size=page_size,
            **kw,
        )

    # --- tag ops: byte-for-byte the dense KVCache semantics ---------------

    def with_tags(self, slots: jax.Array, positions: jax.Array, valid=None) -> "PagedKVCache":
        pos = positions if valid is None else jnp.where(valid, positions, -1)
        b_idx = jnp.arange(self.slot_pos.shape[0])[:, None]
        return dataclasses.replace(
            self, slot_pos=self.slot_pos.at[b_idx, slots].set(pos.astype(jnp.int32))
        )

    def rollback(self, keep_below: jax.Array) -> "PagedKVCache":
        new_tags = jnp.where(self.slot_pos >= keep_below[:, None], -1, self.slot_pos)
        return dataclasses.replace(self, slot_pos=new_tags)


class PagePool:
    """Host-side page allocator: free list + refcounts + full-page prefix
    cache (the find_slot / seq_id-sharing capability of llama-kv-cache.cpp,
    reshaped: identity of shared content is the token chain, not a cell id).

    Pages enter the prefix cache when a prompt finishes prefill; cached pages
    carry one extra reference so they survive their owner. When allocation
    fails, cached-only pages are evicted LRU."""

    def __init__(self, n_pages: int, page_size: int):
        self.page_size = page_size
        self.n_pages = n_pages
        self.free: list[int] = list(range(n_pages - 1, -1, -1))
        self.ref = np.zeros(n_pages, np.int32)
        # prefix cache: chain-hash -> page id, insertion-ordered for LRU
        self._cache: dict = {}
        self._cache_of_page: dict[int, object] = {}
        # optional per-entry payload (the paged batcher stores the EAGLE
        # boundary feature at each page's last token so a matched prefix can
        # seed the draft head without re-running the target)
        self._payload: dict = {}
        # copy-on-write index for shift-keyed pools: the same pages keyed by
        # their chain WITHOUT the shift tail (match_cow). Adds no refs of its
        # own; entries die with their exact-cache entry.
        self._cow: dict = {}
        self._cow_of_page: dict[int, object] = {}

    # -- raw page ops ------------------------------------------------------

    def available(self) -> int:
        return len(self.free) + sum(
            1 for p, h in self._cache_of_page.items() if self.ref[p] == 1
        )

    def alloc(self) -> int:
        if not self.free:
            self._evict_one()
        page = self.free.pop()
        self.ref[page] = 1
        return page

    def retain(self, page: int):
        self.ref[page] += 1

    def release(self, page: int):
        assert self.ref[page] > 0, page
        self.ref[page] -= 1
        if self.ref[page] == 0:
            self.free.append(page)

    def _evict_one(self):
        for h, page in list(self._cache.items()):  # insertion order = LRU
            if self.ref[page] == 1:  # held only by the cache
                del self._cache[h]
                del self._cache_of_page[page]
                self._payload.pop(h, None)
                ck = self._cow_of_page.pop(page, None)
                if ck is not None:
                    self._cow.pop(ck, None)
                    # other cached pages may share this stripped chain (same
                    # page span, different shift tail); re-point the cow key
                    # so eviction doesn't close the match_cow window for them
                    for k2, p2 in self._cache.items():
                        if (p2 != page and len(k2) > len(ck)
                                and len(k2) - len(ck) < self.page_size
                                and k2[: len(ck)] == ck):
                            self._cow[ck] = p2
                            self._cow_of_page[p2] = ck
                            break
                self.release(page)
                if self.free:
                    return
        if not self.free:
            raise MemoryError("KV page pool exhausted")

    def is_shared(self, page: int) -> bool:
        """True when writing `page` could be observed by anyone but the single
        caller holding it: another live reference, or the prefix cache (a
        cached page must stay bitwise-stable for future matchers). The paged
        batcher copy-on-writes before touching a shared page."""
        return self.ref[page] > 1 or page in self._cache_of_page

    # -- prefix sharing ----------------------------------------------------

    def _chain_keys(self, tokens, shift: int = 0) -> list:
        """Exact cache key per FULL page of the token prefix: key i is the
        token tuple tokens[: (i+1)*page + shift] itself — no hashing, so two
        different prefixes can never collide (a collision would silently serve
        another request's KV). `shift` extends each key by that many trailing
        tokens: the EAGLE draft cache row at position p holds the pair
        (x_{p+1}, f_p), so draft page i's content depends on one token MORE
        than the target page's — its chains are keyed with shift=1. Only full
        pages are shared (partial pages would need copy-on-write)."""
        toks = tuple(int(t) for t in tokens)
        out = []
        for i in range((len(toks) - shift) // self.page_size):
            out.append(toks[: (i + 1) * self.page_size + shift])
        return out

    def match_prefix(self, tokens, want_payloads: bool = False, shift: int = 0):
        """Longest cached full-page prefix of `tokens`: returns
        (n_shared_tokens, page_ids[, payloads]) with every returned page
        retained for the caller. The caller must keep n_shared < len(tokens)
        (the engine still needs >= 1 token of real prefill for
        features/logits)."""
        pages: list[int] = []
        payloads: list = []
        for key in self._chain_keys(tokens, shift):
            page = self._cache.get(key)
            if page is None:
                break
            self._cache.pop(key)  # re-insert: LRU touch
            self._cache[key] = page
            self.retain(page)
            pages.append(page)
            payloads.append(self._payload.get(key))
        if want_payloads:
            return len(pages) * self.page_size, pages, payloads
        return len(pages) * self.page_size, pages

    def register_prefix(self, tokens, page_ids: list[int], payloads=None,
                        shift: int = 0):
        """Publish a prefilled prompt's full pages for reuse (pages gain one
        cache reference each; already-cached chains are left alone).
        `payloads` optionally attaches caller data (e.g. the EAGLE boundary
        feature) to each page's cache entry, returned by match_prefix.

        For shift-keyed pools (the EAGLE draft cache), each page is also
        indexed under its chain WITHOUT the shift tail, so a prompt that
        agrees on a page's first page_size tokens but diverges at the shift
        token can COPY the page and rebuild only the divergent final row
        (match_cow — the batcher's boundary-page copy-on-write)."""
        keys = self._chain_keys(tokens, shift)
        for i, (key, page) in enumerate(zip(keys, page_ids)):
            if key in self._cache:
                continue
            self._cache[key] = page
            self._cache_of_page[page] = key
            if payloads is not None and i < len(payloads) and payloads[i] is not None:
                self._payload[key] = payloads[i]
            if shift and key[:-shift] not in self._cow:
                self._cow[key[:-shift]] = page
                self._cow_of_page[page] = key[:-shift]
            self.retain(page)

    def match_cow(self, tokens, page_idx: int):
        """Page whose first page_size-token span matches `tokens`' page
        `page_idx` ignoring the shift tail, retained for the caller (copy it,
        then release) — None if uncached. Content beyond the agreeing span
        (the shift-dependent final rows) is STALE for the caller's chain and
        must stay untagged until rewritten."""
        key = tuple(int(t) for t in tokens[: (page_idx + 1) * self.page_size])
        if len(key) < (page_idx + 1) * self.page_size:
            return None
        page = self._cow.get(key)
        if page is None:
            return None
        self.retain(page)
        return page


def copy_pool_page(kv: PagedKVCache, src, dst) -> PagedKVCache:
    """Copy physical page `src` -> `dst` across every layer of the pool (the
    copy-on-write primitive: the batcher duplicates a shared page before a
    slot writes into it). src/dst are traced scalars — one compiled program
    serves every copy."""

    def cp(buf):
        if buf is None:
            return None
        page = jax.lax.dynamic_slice_in_dim(buf, src, 1, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(buf, page, dst, axis=1)

    return dataclasses.replace(
        kv, k=cp(kv.k), v=cp(kv.v), k_scale=cp(kv.k_scale), v_scale=cp(kv.v_scale)
    )


def copy_pool_pages(kv: PagedKVCache, srcs, dsts) -> PagedKVCache:
    """Batched copy_pool_page: srcs/dsts are [N] int32 (padded entries use
    an out-of-bounds positive dst, dropped by the scatter — -1 would wrap). One program copies every admission
    CoW page of a scheduler step — through the TPU relay each separate copy
    would cost a 25-40 ms sync."""

    def cp(buf):
        if buf is None:
            return None
        pages = buf[:, srcs]
        return buf.at[:, dsts].set(pages, mode="drop")

    return dataclasses.replace(
        kv, k=cp(kv.k), v=cp(kv.v), k_scale=cp(kv.k_scale), v_scale=cp(kv.v_scale)
    )


def gather_pages(pool: jax.Array, li, page_table: jax.Array, n_pages: int) -> jax.Array:
    """Layer li of pool [L, P, H, page, D] (or [L, P, H, page] for int8
    scales) -> per-slot contiguous view [B, H, n_pages*page, ...]; unmapped
    (-1) pages clamp to page 0 (their rows stay invisible through the
    position tags)."""
    pt = jnp.maximum(page_table[:, :n_pages], 0)  # [B, NP]
    g = pool[li, pt]  # [B, NP, H, page, ...]
    b, np_, h, ps = g.shape[:4]
    perm = (0, 2, 1, 3) + tuple(range(4, g.ndim))
    return g.transpose(perm).reshape(b, h, np_ * ps, *g.shape[4:])
