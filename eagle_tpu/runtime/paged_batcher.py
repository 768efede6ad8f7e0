"""PagedBatcher — continuous batching over a shared KV page pool.

This is the serving-side capability the reference implements with find_slot +
per-cell seq_id sharing (src/llama-kv-cache.cpp:120 find_slot,
src/llama-kv-cache.h:10-78), exercised per ubatch by the server's
update_slots (examples/server/server.cpp:2764): many slots draw cache memory
from ONE shared buffer, so summed context can exceed what dense
per-slot allocation would allow, and identical prompt prefixes are served
from the same physical pages without re-prefill.

TPU shape of the same idea (vLLM/ragged-paged-attention style, PAPERS.md):

- device: `PagedKVCache` pools for target AND draft caches — static-shaped
  [L, P, H, page, D] page pools with per-row page tables; the model forward
  does the indirection (models/llama.py paged branch), so every engine
  program (chunked prefill, the speculative cycle, rollback) is unchanged.
- host (this module): `PagePool` allocators own the free lists, refcounts,
  and the full-page prefix cache. The batcher maps each slot's write windows
  just-in-time (the find_slot equivalent), registers finished prompts'
  full pages for prefix reuse, matches new prompts against the cache to skip
  shared-prefix prefill entirely, and copy-on-writes any shared page before
  a slot writes into it.

EAGLE specifics: the draft cache row at position p holds the pair
(x_{p+1}, f_p), so draft pages are keyed with one extra token (shift=1) and
the chunk-boundary feature f_{S-1} is attached to each target page as its
cache payload — a matched prefix seeds the draft head without re-running the
target over the shared region."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .paged_kv import PagePool, copy_pool_page, copy_pool_pages
from .scheduler import ContinuousBatcher, Slot
from .speculative import EagleChainEngine

#: scatter-pad sentinel: a LARGE POSITIVE index is dropped by mode="drop";
#: -1 would wrap to the last row (negative indices are valid in jnp scatters)
_DROP = 1 << 30


def _flush_rows(state, max_seq, q_sids, a_sids, rows_t, rows_d, feats):
    """Apply every deferred admission/quarantine of a scheduler step in ONE
    compiled program: park rows q_sids at max_seq (scratch-page writes), and
    preset rows a_sids' tag rows + boundary features (prefix-hit admission).
    Padded entries carry an out-of-bounds POSITIVE sid (mode="drop" drops
    out-of-bounds scatters, but a -1 pad would WRAP to the last row) and are
    dropped by the scatters — through the
    TPU relay each eager .at[].set would be its own 25-40 ms round trip."""
    return dataclasses.replace(
        state,
        n_past=state.n_past.at[q_sids].set(max_seq, mode="drop"),
        tgt_kv=dataclasses.replace(
            state.tgt_kv,
            slot_pos=state.tgt_kv.slot_pos.at[a_sids].set(rows_t, mode="drop")),
        dft_kv=dataclasses.replace(
            state.dft_kv,
            slot_pos=state.dft_kv.slot_pos.at[a_sids].set(rows_d, mode="drop")),
        feature=state.feature.at[a_sids].set(feats, mode="drop"),
    )


class PagedBatcher(ContinuousBatcher):
    """ContinuousBatcher whose KV memory is a shared page pool.

    `n_pages` target pool pages (and `dft_n_pages` draft pages, default the
    same count) are shared by all `engine.batch` slots: each slot may still
    address up to engine.max_seq positions, but physical pages are allocated
    only for regions actually written — B slots can be served from far fewer
    than B * max_seq/page_size pages when sequences are short or share
    prefixes. Raises MemoryError when the pool is truly exhausted (all pages
    referenced by live slots)."""

    def __init__(self, engine: EagleChainEngine, n_pages: int,
                 page_size: int = 64, prefill_chunk: int | None = None,
                 dft_n_pages: int | None = None, prefix_cache: bool = True):
        # Prefix reuse stays PAGE-granular at any chunk size: prefill chunks
        # return the feature at every page boundary (_feat_every below), so
        # each full prompt page carries the EAGLE boundary feature a resumed
        # draft needs. Larger chunks just mean fewer scheduler steps (each
        # one is a host<->device sync). The remaining granularity limit is
        # the draft cache's shift-1 keying: the draft page containing the
        # shared/suffix boundary depends on one suffix token, so reuse tops
        # out one page short of the target-side match for novel suffixes.
        prefill_chunk = page_size if prefill_chunk is None else prefill_chunk
        assert prefill_chunk % page_size == 0, (prefill_chunk, page_size)
        state = engine.fresh_paged_state(n_pages, page_size, dft_n_pages)
        super().__init__(engine, prefill_chunk=prefill_chunk, state=state)
        self.ps = page_size
        # prefill chunks return the feature at every page boundary so each
        # full prompt page gets its payload even when chunk > page
        self._feat_every = page_size
        self._flush_c = jax.jit(_flush_rows, donate_argnums=(0,))
        self.prefix_cache = prefix_cache
        #: deferred device work, applied in ONE program at the next step()
        #: (admission previously paid 4-6 relay syncs per submitted request:
        #: quarantine, CoW copy, table sync, tag/feature preset)
        self._pending_quar: list[int] = []
        self._pending_admits: list[tuple] = []  # (sid, row_t, row_d, feat)
        self._pending_copies: dict[str, list[tuple[int, int]]] = {
            "tgt": [], "dft": []}
        self.pools = {
            "tgt": PagePool(n_pages, page_size),
            "dft": PagePool(dft_n_pages or n_pages, page_size),
        }
        mp = state.tgt_kv.page_table.shape[1]
        #: host-authoritative page tables; device copies sync on change
        self.tables = {
            "tgt": np.full((self.batch, mp), -1, np.int32),
            "dft": np.full((self.batch, mp), -1, np.int32),
        }
        self._dirty = {"tgt": False, "dft": False}
        self._copy_c = jax.jit(copy_pool_page, donate_argnums=(0,))
        self._copy_pages_c = jax.jit(copy_pool_pages, donate_argnums=(0,))
        #: per-slot page-boundary features captured during prefill
        #: (slot id -> {prompt page index: [D] device array})
        self._payloads: dict[int, dict] = {}
        self.stats = {"prefill_tokens_skipped": 0, "pages_copied": 0,
                      "prefix_hits": 0}

    # -- pool plumbing -----------------------------------------------------

    def _kv(self, kind):
        return self.state.tgt_kv if kind == "tgt" else self.state.dft_kv

    def _set_kv(self, kind, kv):
        field = "tgt_kv" if kind == "tgt" else "dft_kv"
        self.state = dataclasses.replace(self.state, **{field: kv})

    def _sync_tables(self):
        for kind in ("tgt", "dft"):
            if self._dirty[kind]:
                self._set_kv(kind, dataclasses.replace(
                    self._kv(kind),
                    page_table=jnp.asarray(self.tables[kind]),
                ))
                self._dirty[kind] = False

    def _ensure_writable(self, kind: str, slot_id: int, lo: int, hi: int):
        """find_slot, paged: map every page covering positions [lo, hi) to a
        page this slot may write — allocate unmapped pages; copy-on-write
        pages that are shared (other refs or the prefix cache)."""
        if hi <= lo:
            return
        pool, table = self.pools[kind], self.tables[kind]
        for pg in range(max(lo, 0) // self.ps, (hi - 1) // self.ps + 1):
            cur = int(table[slot_id, pg])
            if cur < 0:
                table[slot_id, pg] = pool.alloc()
                self._dirty[kind] = True
            elif pool.is_shared(cur):
                new = pool.alloc()
                self._set_kv(kind, self._copy_c(self._kv(kind), cur, new))
                table[slot_id, pg] = new
                pool.release(cur)
                self._dirty[kind] = True
                self.stats["pages_copied"] += 1

    def _quarantine(self, sid: int):
        """Park row `sid`'s n_past at max_seq: the speculative cycle still
        runs data writes for inactive rows (tags frozen), and a parked row
        whose table already holds freshly-matched SHARED prefix pages must
        not scribble into them. At max_seq, both the target window
        [m, m+K+1) and the draft window [m-1, m+K) resolve to the table's
        last entry, which a parked row never maps -> scratch page.

        Deferred: applied by _flush_admissions at the next step(), before any
        device program runs — nothing reads engine state in between."""
        self._pending_quar.append(sid)

    def _flush_admissions(self):
        """Apply every deferred admission effect in at most three compiled
        calls (CoW page copies, page-table sync, row preset/quarantine) —
        the per-request admission cost that made shared-prefix serving a net
        loss at short prefixes was dominated by per-submit relay syncs."""
        for kind in ("tgt", "dft"):
            lst = self._pending_copies[kind]
            if not lst:
                continue
            cap = max(len(lst), self.batch)
            srcs = np.zeros(cap, np.int32)
            dsts = np.full(cap, _DROP, np.int32)
            for i, (s, d) in enumerate(lst):
                srcs[i], dsts[i] = s, d
            self._set_kv(kind, self._copy_pages_c(
                self._kv(kind), jnp.asarray(srcs), jnp.asarray(dsts)))
            lst.clear()
        self._sync_tables()
        if not (self._pending_quar or self._pending_admits):
            return
        B = self.batch
        q = np.full(2 * B, _DROP, np.int32)
        for i, s in enumerate(dict.fromkeys(self._pending_quar)):  # <= B distinct
            q[i] = s
        a = np.full(B, _DROP, np.int32)
        rows_t = np.zeros((B, self.state.tgt_kv.slot_pos.shape[1]), np.int32)
        rows_d = np.zeros((B, self.state.dft_kv.slot_pos.shape[1]), np.int32)
        feats = [jnp.zeros((self.state.feature.shape[1],),
                           self.state.feature.dtype)] * B
        for i, (sid, rt, rd, f) in enumerate(self._pending_admits):
            a[i] = sid
            rows_t[i, : len(rt)] = rt
            rows_d[i, : len(rd)] = rd
            feats[i] = jnp.asarray(f, self.state.feature.dtype)
        self.state = self._flush_c(
            self.state, jnp.int32(self.engine.max_seq), jnp.asarray(q),
            jnp.asarray(a), jnp.asarray(rows_t), jnp.asarray(rows_d),
            jnp.stack(feats),
        )
        self._pending_quar.clear()
        self._pending_admits.clear()

    def step(self):
        self._flush_admissions()
        super().step()

    # -- admission: prefix matching ----------------------------------------

    def submit(self, prompt_tokens, **kw) -> Slot | None:
        slot = super().submit(prompt_tokens, **kw)
        if slot is None:
            return slot
        self._quarantine(slot.id)
        if not self.prefix_cache:
            return slot
        toks = [int(t) for t in slot.prompt]
        n = len(toks)
        _, pages_t, payloads = self.pools["tgt"].match_prefix(
            toks, want_payloads=True)
        _, pages_d = self.pools["dft"].match_prefix(toks, shift=1)
        # The draft cache's shift-1 keying means its page at the shared/
        # suffix boundary depends on one suffix token and can never exact-
        # match a novel suffix — extend draft coverage by one page via
        # copy-on-write: copy a page agreeing on all page_size prefix tokens;
        # its final row (the suffix-dependent pair) stays UNTAGGED after
        # admission (d_row below validates [0, s-1) only) and is rewritten by
        # the resumed prefill's first chunk before anything can read it.
        if len(pages_d) < len(pages_t):
            src = self.pools["dft"].match_cow(toks, len(pages_d))
            if src is not None:
                try:
                    fresh = self.pools["dft"].alloc()
                except MemoryError:
                    fresh = None
                if fresh is not None:
                    # deferred: flushed in one batched program at the next
                    # step(), before any device write can touch either page
                    self._pending_copies["dft"].append((src, fresh))
                    pages_d.append(fresh)
                    self.stats["pages_copied"] += 1
                self.pools["dft"].release(src)
        # shared length: both caches must cover it, >= 1 token of real prefill
        # must remain (the engine needs the final logits/feature), and the
        # boundary feature f_{S-1} must be available to seed the draft
        m = min(len(pages_t), len(pages_d))
        while m > 0 and (m * self.ps >= n or payloads[m - 1] is None):
            m -= 1
        for p in pages_t[m:]:
            self.pools["tgt"].release(p)
        for p in pages_d[m:]:
            self.pools["dft"].release(p)
        if m == 0:
            return slot
        s = m * self.ps
        sid = slot.id
        self.tables["tgt"][sid, :m] = pages_t[:m]
        self.tables["dft"][sid, :m] = pages_d[:m]
        self._dirty["tgt"] = self._dirty["dft"] = True
        # preset the row's device state as if positions [0, s) were prefilled:
        # tags make the shared pages visible; the page payload is the chunk-
        # boundary feature the resumed prefill expects in state.feature.
        # DEFERRED to _flush_admissions: one compiled program applies every
        # admission of the step (per-submit eager updates each cost a
        # 25-40 ms remote round trip through the TPU relay)
        mp_t = self.state.tgt_kv.slot_pos.shape[1]
        row = np.full(mp_t, -1, np.int32)
        row[:s] = np.arange(s, dtype=np.int32)
        d_row = np.full(self.state.dft_kv.slot_pos.shape[1], -1, np.int32)
        d_row[: s - 1] = np.arange(s - 1, dtype=np.int32)
        self._pending_admits.append((sid, row, d_row, payloads[m - 1]))
        slot.consumed = s
        self.stats["prefill_tokens_skipped"] += s
        self.stats["prefix_hits"] += 1
        return slot

    # -- scheduler hooks ---------------------------------------------------

    def _before_prefill_chunk(self, slot: Slot, n: int):
        c = slot.consumed
        self._ensure_writable("tgt", slot.id, c, c + n)
        # draft pairs for tokens [c, c+n) sit at draft positions [c-1, c+n-1)
        self._ensure_writable("dft", slot.id, max(c - 1, 0), c + n - 1)
        self._sync_tables()

    def _after_prefill_chunk(self, slot: Slot, finished: bool):
        if not self.prefix_cache:
            return
        # every page fully covered by this chunk gets its boundary feature
        # f_{(j+1)*ps - 1} from the chunk's stride features (bfeats row m is
        # the feature at start + (m+1)*ps - 1; _feat_every == ps, and chunk
        # starts are always page-aligned: admission resumes at a page
        # multiple and whole chunks are page multiples)
        start, bf = self._chunk_feats
        assert start % self.ps == 0, start
        pl = self._payloads.setdefault(slot.id, {})
        for m in range((slot.consumed - start) // self.ps):
            pl[start // self.ps + m] = bf[m]
        if finished:
            self._register_prompt(slot)

    def _register_prompt(self, slot: Slot):
        toks = [int(t) for t in slot.prompt]
        n = len(toks)
        full_t = n // self.ps
        if full_t:
            pages = [int(self.tables["tgt"][slot.id, i]) for i in range(full_t)]
            pl = self._payloads.get(slot.id, {})
            self.pools["tgt"].register_prefix(
                toks, pages, payloads=[pl.get(i) for i in range(full_t)]
            )
        # draft page i is full iff rows [i*ps, (i+1)*ps) were all written —
        # the last draft row of the prompt is position n-2
        full_d = (n - 1) // self.ps
        if full_d:
            pages = [int(self.tables["dft"][slot.id, i]) for i in range(full_d)]
            self.pools["dft"].register_prefix(toks, pages, shift=1)
        self._payloads.pop(slot.id, None)

    def _before_cycle(self, n_past: np.ndarray):
        k = self.engine.K
        for slot in self.slots:
            if slot.state != "generating" or not self._active_mask[slot.id]:
                continue
            m = int(n_past[slot.id])
            # verify writes [m, m+K+1); draft writes [m-1, m+K)
            self._ensure_writable("tgt", slot.id, m, m + k + 1)
            self._ensure_writable("dft", slot.id, max(m - 1, 0), m + k)
        self._sync_tables()

    def _on_slot_freed(self, slot: Slot):
        sid = slot.id
        for kind in ("tgt", "dft"):
            table, pool = self.tables[kind], self.pools[kind]
            for pg in np.nonzero(table[sid] >= 0)[0]:
                pool.release(int(table[sid, pg]))
            table[sid] = -1
            self._dirty[kind] = True
        # table sync + quarantine are deferred to the next step's flush —
        # no device program runs before it, and after it the freed row's
        # unmapped (-1) entries route its data-only cycle writes to the
        # scratch page
        self._quarantine(sid)
        self._payloads.pop(sid, None)

    # -- slot save/restore --------------------------------------------------
    # A paged row is a view into the shared pool, so save/restore serializes
    # through the DENSE per-sequence format (state_io.extract_seq_state
    # layout): save gathers the slot's pages into contiguous dense KV rows —
    # the artifact is byte-compatible with the dense batcher's save_slot, so
    # a slot saved paged restores dense and vice versa (the reference's
    # llama_state_seq_* files are likewise cache-layout agnostic).

    def _dense_template(self):
        """B=1 dense SpecState with this engine's shapes (restore template)."""
        from .speculative import SpecState

        def tkv(kind):
            from .kvcache import KVCache

            pool = self._kv(kind)
            L, _, H, _, D = pool.k.shape
            Dv = pool.v.shape[-1]
            S = self.engine.max_seq
            return KVCache(
                k=jnp.zeros((L, 1, H, S, D), pool.k.dtype),
                v=jnp.zeros((L, 1, H, S, Dv), pool.v.dtype),
                slot_pos=jnp.full((1, S), -1, jnp.int32),
                k_scale=None if pool.k_scale is None
                else jnp.zeros((L, 1, H, S), jnp.float32),
                v_scale=None if pool.v_scale is None
                else jnp.zeros((L, 1, H, S), jnp.float32),
            )

        return SpecState(
            tgt_kv=tkv("tgt"), dft_kv=tkv("dft"),
            last_token=jnp.zeros((1,), jnp.int32),
            feature=jnp.zeros((1, self.state.feature.shape[1]),
                              self.state.feature.dtype),
            n_past=jnp.zeros((1,), jnp.int32),
            key=self.state.key,
        )

    def _gather_dense_seq(self, sid: int):
        """Dense B=1 SpecState snapshot of one paged slot (host-side page
        gather — save is rare, clarity over device round-trips)."""
        from .kvcache import KVCache
        from .speculative import SpecState

        S = self.engine.max_seq

        def gather(kind):
            pool = self._kv(kind)
            kN, vN = np.asarray(pool.k), np.asarray(pool.v)
            L, _, H, ps, D = kN.shape
            dk = np.zeros((L, 1, H, S, D), kN.dtype)
            dv = np.zeros((L, 1, H, S, vN.shape[-1]), vN.dtype)
            ks = vs = None
            if pool.k_scale is not None:
                ksN = np.asarray(pool.k_scale)
                vsN = np.asarray(pool.v_scale)
                ks = np.zeros((L, 1, H, S), np.float32)
                vs = np.zeros((L, 1, H, S), np.float32)
            for pg, p in enumerate(self.tables[kind][sid]):
                p = int(p)
                lo = pg * ps
                if p < 0 or lo >= S:
                    continue
                w = min(ps, S - lo)
                dk[:, 0, :, lo : lo + w] = kN[:, p, :, :w]
                dv[:, 0, :, lo : lo + w] = vN[:, p, :, :w]
                if ks is not None:
                    ks[:, 0, :, lo : lo + w] = ksN[:, p, :, :w]
                    vs[:, 0, :, lo : lo + w] = vsN[:, p, :, :w]
            return KVCache(
                k=jnp.asarray(dk), v=jnp.asarray(dv),
                slot_pos=jnp.asarray(
                    np.asarray(pool.slot_pos[sid])[:S][None]),
                k_scale=None if ks is None else jnp.asarray(ks),
                v_scale=None if vs is None else jnp.asarray(vs),
            )

        return SpecState(
            tgt_kv=gather("tgt"), dft_kv=gather("dft"),
            last_token=self.state.last_token[sid : sid + 1],
            feature=self.state.feature[sid : sid + 1],
            n_past=self.state.n_past[sid : sid + 1],
            key=self.state.key,
        )

    def save_slot(self, slot_id: int, path) -> dict:
        from .state_io import save_state

        slot = self.slots[slot_id]
        if slot.state == "free":
            raise ValueError(
                "paged slot save needs a live slot: completion releases its "
                "pages back to the shared pool (save before the request "
                "finishes; the dense batcher can snapshot after completion "
                "because its rows are per-slot)"
            )
        extra = {
            "generated": list(slot.generated),
            "prompt_len": slot.prompt_len,
            "max_new": slot.max_new,
            "stop_at_eos": slot.stop_at_eos,
        }
        save_state(self._gather_dense_seq(slot_id), path, extra=extra)
        return extra

    def restore_slot(self, path, slot_id: int | None = None):
        from .state_io import load_state

        if slot_id is None:
            free = [s for s in self.slots if s.state == "free"]
            if not free:
                return None
            slot_id = free[0].id
        sub, extra = load_state(self._dense_template(), path)

        # allocate private pages covering the written region and scatter the
        # dense rows into them — one jitted program per cache
        for kind, kv_row in (("tgt", sub.tgt_kv), ("dft", sub.dft_kv)):
            row = np.asarray(kv_row.slot_pos[0])
            valid = np.nonzero(row >= 0)[0]
            n_w = int(valid.max()) + 1 if valid.size else 0
            if n_w == 0:
                continue
            self._ensure_writable(kind, slot_id, 0, n_w)
            self._sync_tables()
            pool = self._kv(kind)
            ps = self.ps
            n_pg = -(-n_w // ps)
            pages = jnp.asarray(
                self.tables[kind][slot_id, :n_pg].copy(), jnp.int32)
            S = self.engine.max_seq
            pad = n_pg * ps - S

            full_row = np.full(pool.slot_pos.shape[1], -1, np.int32)
            full_row[: min(S, len(row))] = row[: min(S, len(row))]

            def write(kv, pages, kr, vr, ksr, vsr, srow):
                kv = dataclasses.replace(
                    kv,
                    k=kv.k.at[:, pages].set(kr),
                    v=kv.v.at[:, pages].set(vr),
                    slot_pos=kv.slot_pos.at[slot_id].set(srow),
                )
                if ksr is not None:
                    kv = dataclasses.replace(
                        kv,
                        k_scale=kv.k_scale.at[:, pages].set(ksr),
                        v_scale=kv.v_scale.at[:, pages].set(vsr),
                    )
                return kv

            # axes: dense [L,1,H,S,D] -> pages [L,n_pg,H,ps,D]
            def rows_of(a):
                a = a[:, 0]  # [L,H,S,...]
                if pad > 0:
                    widths = [(0, 0)] * a.ndim
                    widths[2] = (0, pad)
                    a = jnp.pad(a, widths)
                a = a[:, :, : n_pg * ps]
                a = a.reshape(a.shape[0], a.shape[1], n_pg, ps, *a.shape[3:])
                return jnp.swapaxes(a, 1, 2)  # [L,n_pg,H,ps,...]

            self._set_kv(kind, jax.jit(write, donate_argnums=(0,))(
                pool, pages, rows_of(kv_row.k), rows_of(kv_row.v),
                None if kv_row.k_scale is None else rows_of(kv_row.k_scale),
                None if kv_row.v_scale is None else rows_of(kv_row.v_scale),
                jnp.asarray(full_row),
            ))

        def set_row(state, lt, ft, npast):
            return dataclasses.replace(
                state,
                last_token=state.last_token.at[slot_id].set(lt),
                feature=state.feature.at[slot_id].set(ft),
                n_past=state.n_past.at[slot_id].set(npast),
            )

        self.state = jax.jit(set_row)(
            self.state, sub.last_token[0], sub.feature[0], sub.n_past[0])

        slot = self.slots[slot_id]
        slot.state = "restored"
        slot.generated = list(extra.get("generated", []))
        slot.prompt_len = int(extra.get("prompt_len", 0))
        slot.max_new = int(extra.get("max_new", 0))
        slot.stop_at_eos = bool(extra.get("stop_at_eos", True))
        return slot
