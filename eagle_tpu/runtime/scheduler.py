"""Continuous batching scheduler — slots over batched engines.

The TPU counterpart of llama-server's slot machinery (server.cpp:2764
update_slots): a fixed batch of B slots, each an independent sequence in its
own KV-cache row. Prompt prefill is CHUNKED: each scheduler step admits at
most one chunk of one pending prompt and then runs the decode/speculation
cycle for every generating slot — a long prompt never stalls the other slots
for more than one chunk (the reference interleaves the same way in
update_slots). Per-request sampler params occupy rows of the engine's
BatchedSamplerParams (server.cpp:272-278), and requests can be aborted
mid-generation (slot release, abort_callback semantics).

Slot lifecycle, streaming, and EOS/limit handling live on the host;
everything per-token is on device."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .kvcache import KVCache
from .sampling import SamplerConfig
from .speculative import EagleChainEngine, SpecState


@dataclass
class Slot:
    id: int
    state: str = "free"  # free | prefilling | generating
    request_id: str | None = None
    prompt_len: int = 0
    max_new: int = 0
    generated: list = field(default_factory=list)
    on_token: Callable | None = None  # streaming callback(token_id)
    eos_id: int = 2
    stop_at_eos: bool = True
    # chunked-prefill progress
    prompt: np.ndarray | None = None
    consumed: int = 0

    @property
    def done(self) -> bool:
        if self.generated and self.stop_at_eos and self.generated[-1] == self.eos_id:
            return True
        return len(self.generated) >= self.max_new


def _take_row_kv(kv, slot):
    """B=1 view of one cache row. Paged caches (runtime/paged_kv.py) slice
    only the per-slot page-table/tag rows — the page POOL is shared, so it
    flows through whole (writes go through the row's table)."""
    if getattr(kv, "page_table", None) is not None:
        return dataclasses.replace(
            kv,
            page_table=jax.lax.dynamic_slice_in_dim(kv.page_table, slot, 1, axis=0),
            slot_pos=jax.lax.dynamic_slice_in_dim(kv.slot_pos, slot, 1, axis=0),
        )

    def take(x):  # [L, B, ...] -> [L, 1, ...]
        return jax.lax.dynamic_slice_in_dim(x, slot, 1, axis=1)

    return KVCache(
        k=take(kv.k),
        v=take(kv.v),
        slot_pos=jax.lax.dynamic_slice_in_dim(kv.slot_pos, slot, 1, axis=0),
        k_scale=None if kv.k_scale is None else take(kv.k_scale),
        v_scale=None if kv.v_scale is None else take(kv.v_scale),
    )


def _put_row_kv(full, row, slot):
    if getattr(full, "page_table", None) is not None:
        # pools come back updated from the forward; table/tags scatter back
        return dataclasses.replace(
            full,
            k=row.k, v=row.v, k_scale=row.k_scale, v_scale=row.v_scale,
            page_table=jax.lax.dynamic_update_slice_in_dim(
                full.page_table, row.page_table, slot, axis=0
            ),
            slot_pos=jax.lax.dynamic_update_slice_in_dim(
                full.slot_pos, row.slot_pos, slot, axis=0
            ),
        )

    def put(f, r):
        return jax.lax.dynamic_update_slice_in_dim(f, r, slot, axis=1)

    return KVCache(
        k=put(full.k, row.k),
        v=put(full.v, row.v),
        slot_pos=jax.lax.dynamic_update_slice_in_dim(
            full.slot_pos, row.slot_pos, slot, axis=0
        ),
        k_scale=None if full.k_scale is None else put(full.k_scale, row.k_scale),
        v_scale=None if full.v_scale is None else put(full.v_scale, row.v_scale),
    )


class ContinuousBatcher:
    """Slot scheduler over a batched EagleChainEngine (speculative) — plain
    decoding falls out of n_draft=1 if no draft head is wanted."""

    def __init__(self, engine: EagleChainEngine, prefill_chunk: int = 64,
                 state: SpecState | None = None):
        self.engine = engine
        self.batch = engine.batch
        self.prefill_chunk = prefill_chunk
        self.slots = [Slot(id=i, eos_id=engine.eos_id) for i in range(self.batch)]
        self.state = state if state is not None else engine.fresh_state()
        # parked inactive slots sit at n_past=1 so draft positions stay >= 0
        self.state = dataclasses.replace(
            self.state, n_past=jnp.ones((self.batch,), jnp.int32)
        )
        self._chunk_c = jax.jit(self._prefill_chunk_one,
                                static_argnames=("ct", "feat_every"))
        self._active_mask = np.zeros(self.batch, bool)
        self._prefill_queue: list[Slot] = []
        #: stride at which prefill chunks also return boundary features
        #: (0 = off; PagedBatcher sets page_size so every full page gets its
        #: EAGLE boundary-feature payload even under multi-page chunks)
        self._feat_every = 0
        #: (chunk_start, bfeats row) of the chunk just run, for hooks
        self._chunk_feats: tuple[int, np.ndarray] | None = None

    # ------------------------------------------------------------------

    def _prefill_chunk_one(self, tp, dp, state: SpecState, tokens, start, n_valid,
                           bs, slot: jax.Array, ct: int, feat_every: int = 0):
        """Run one prompt chunk for batch row `slot` (B=1 view, scattered
        back); other rows untouched."""
        eng = self.engine
        first_tags = jnp.where(
            start[None, :] == 0,
            jnp.full_like(jax.lax.dynamic_slice_in_dim(state.tgt_kv.slot_pos, slot, 1, axis=0), -1),
            jax.lax.dynamic_slice_in_dim(state.tgt_kv.slot_pos, slot, 1, axis=0),
        )
        sub_t = _take_row_kv(state.tgt_kv, slot)
        sub_t = dataclasses.replace(sub_t, slot_pos=first_tags)
        sub_d = _take_row_kv(state.dft_kv, slot)
        d_tags = jnp.where(
            start[None, :] == 0, jnp.full_like(sub_d.slot_pos, -1), sub_d.slot_pos
        )
        sub_d = dataclasses.replace(sub_d, slot_pos=d_tags)

        def take1(x):
            return jax.lax.dynamic_slice_in_dim(x, slot, 1, axis=0)

        sub = SpecState(
            tgt_kv=sub_t, dft_kv=sub_d,
            last_token=take1(state.last_token),
            feature=take1(state.feature),
            n_past=take1(state.n_past),
            key=state.key,
        )
        bs_row = jax.tree_util.tree_map(take1, bs)
        out = eng._prefill_chunk(
            tp, dp, sub, tokens[None, :], start, n_valid, bs_row, ct=ct,
            feat_every=feat_every,
        )
        new_sub, bfeats = out if feat_every else (out, None)

        def put1(f, r):
            return jax.lax.dynamic_update_slice_in_dim(f, r, slot, axis=0)

        new_state = dataclasses.replace(
            state,
            tgt_kv=_put_row_kv(state.tgt_kv, new_sub.tgt_kv, slot),
            dft_kv=_put_row_kv(state.dft_kv, new_sub.dft_kv, slot),
            last_token=put1(state.last_token, new_sub.last_token),
            feature=put1(state.feature, new_sub.feature),
            n_past=put1(state.n_past, new_sub.n_past),
            key=new_sub.key,
        )
        return (new_state, bfeats[0]) if feat_every else new_state

    # ------------------------------------------------------------------

    def submit(
        self,
        prompt_tokens,
        max_new_tokens: int = 128,
        request_id: str | None = None,
        on_token: Callable | None = None,
        stop_at_eos: bool = True,
        sampler: SamplerConfig | None = None,
        spec_k: int | None = None,
    ) -> Slot | None:
        """Assign a request to a free slot (None if saturated) and queue its
        prompt for chunked prefill. `sampler` configures the slot's row of the
        engine's per-slot sampler params; `spec_k` caps accepted drafts/cycle
        for this request (per-request speculative override)."""
        free = [s for s in self.slots if s.state == "free"]
        if not free:
            return None
        slot = free[0]
        slot.state = "prefilling"
        slot.request_id = request_id
        slot.prompt = np.asarray(prompt_tokens, np.int32)
        slot.consumed = 0
        slot.prompt_len = len(slot.prompt)
        slot.max_new = max_new_tokens
        slot.generated = []
        slot.on_token = on_token
        slot.stop_at_eos = stop_at_eos
        # always (re)configure the row: a reused slot must not inherit the
        # previous request's sampler when this one carries none
        self.engine.set_row_sampler(
            slot.id, sampler or self.engine.scfg,
            spec_k=spec_k if spec_k is not None else self.engine.K,
        )
        self._prefill_queue.append(slot)
        return slot

    def abort(self, request_id: str) -> bool:
        """Release the slot serving `request_id` (mid-prefill or
        mid-generation) — the slot-release path of server.cpp's cancel
        handling; the KV row is reclaimed by the next request's prefill."""
        for slot in self.slots:
            if slot.request_id == request_id and slot.state != "free":
                if slot in self._prefill_queue:
                    self._prefill_queue.remove(slot)
                slot.state = "free"
                self._active_mask[slot.id] = False
                self._on_slot_freed(slot)
                slot.prompt = None
                return True
        return False

    def _emit(self, slot: Slot, token: int):
        slot.generated.append(token)
        if slot.on_token:
            slot.on_token(token)

    def _maybe_finish(self, slot: Slot):
        if slot.state == "generating" and slot.done:
            slot.state = "free"
            self._active_mask[slot.id] = False
            self._on_slot_freed(slot)

    def slot_capacity(self, slot_id: int) -> int:
        """Max cache positions this slot may occupy (paged batchers override)."""
        return self.engine.max_seq

    def _on_slot_freed(self, slot: Slot):
        """Hook for resource reclamation (paged batchers release pages)."""

    @property
    def n_active(self) -> int:
        return int(self._active_mask.sum())

    @property
    def n_pending(self) -> int:
        return len(self._prefill_queue)

    def _before_prefill_chunk(self, slot: Slot, n: int):
        """Hook: about to prefill `n` prompt tokens at slot.consumed (paged
        batchers map the chunk's write-window pages here)."""

    def _after_prefill_chunk(self, slot: Slot, finished: bool):
        """Hook: a chunk landed (paged batchers capture page-boundary features
        here, and register the prompt's pages for prefix sharing when
        `finished`)."""

    def _before_cycle(self, n_past: np.ndarray):
        """Hook: about to run one speculative cycle over all generating slots
        (paged batchers map each slot's decode window here). `n_past` is the
        host copy step() already synced — hooks must not re-sync it (each
        device sync costs 25-40 ms through the TPU relay)."""

    def _advance_prefill(self):
        """Process ONE chunk of the head-of-queue prompt."""
        slot = self._prefill_queue[0]
        prompt = slot.prompt
        ct = self.prefill_chunk
        chunk = np.zeros(ct, np.int32)
        n = min(ct, len(prompt) - slot.consumed)
        chunk[:n] = prompt[slot.consumed : slot.consumed + n]
        self._before_prefill_chunk(slot, n)
        start = slot.consumed
        out = self._chunk_c(
            self.engine.tp, self.engine.dp, self.state,
            jnp.asarray(chunk),
            jnp.asarray([slot.consumed], np.int32),
            jnp.asarray([len(prompt)], np.int32),
            self.engine.bsampler,
            jnp.asarray(slot.id, np.int32), ct=ct,
            feat_every=self._feat_every,
        )
        if self._feat_every:
            self.state, bfeats = out
            self._chunk_feats = (start, np.asarray(bfeats))
        else:
            self.state = out
        slot.consumed += n
        finished = slot.consumed >= len(prompt)
        self._after_prefill_chunk(slot, finished)
        if finished:
            self._prefill_queue.pop(0)
            slot.state = "generating"
            first = int(np.asarray(self.state.last_token)[slot.id])
            self._emit(slot, first)
            self._active_mask[slot.id] = True
            self._maybe_finish(slot)

    def step(self):
        """One scheduler tick: at most one prefill chunk, then one speculative
        cycle across all generating slots."""
        if self._prefill_queue:
            self._advance_prefill()
        if self.n_active == 0:
            return
        # ONE n_past sync per step, shared with the hooks (the TPU relay
        # charges 25-40 ms per device sync). Static attention-read bound:
        # every GENERATING slot's tags live below max(n_past over active
        # rows) + K + 2 after this cycle. Parked rows are excluded: they may
        # carry stale or quarantined n_past values (PagedBatcher parks rows
        # at max_seq so their data-only cycle writes land on the scratch page)
        n_past_h = np.asarray(self.state.n_past)
        self._before_cycle(n_past_h)
        hint = int(n_past_h[self._active_mask].max()) + self.engine.K + 2
        res = self.engine._cycle_jit(
            self.state, active=jnp.asarray(self._active_mask),
            kv_limit=self.engine.kv_read_bucket(hint),
        )
        self.state = res.state
        toks = np.asarray(res.tokens)
        n_out = np.asarray(res.n_out)
        for slot in self.slots:
            if slot.state != "generating":
                continue
            for tk in toks[slot.id, : n_out[slot.id]]:
                self._emit(slot, int(tk))
                self._maybe_finish(slot)
                if slot.state == "free":
                    break
            # overflow guard: recycle slots whose cache window is exhausted
            if (
                slot.state == "generating"
                and int(np.asarray(self.state.n_past)[slot.id]) + self.engine.K + 2
                >= self.slot_capacity(slot.id)
            ):
                slot.state = "free"
                self._active_mask[slot.id] = False
                self._on_slot_freed(slot)

    # -- per-slot state save/restore (server.cpp:3690,3760; the reference's
    # -- tests/unit/test_slot_save.py scenario) ---------------------------

    def save_slot(self, slot_id: int, path) -> dict:
        """Persist one slot's full sequence state (KV row + counters) plus its
        host-side progress; returns the saved metadata."""
        from .state_io import save_seq_state

        slot = self.slots[slot_id]
        extra = {
            "generated": list(slot.generated),
            "prompt_len": slot.prompt_len,
            "max_new": slot.max_new,
            "stop_at_eos": slot.stop_at_eos,
        }
        save_seq_state(self.state, slot_id, path, extra=extra)
        return extra

    def restore_slot(self, path, slot_id: int | None = None):
        """Load a saved sequence state into a free slot (paused — call
        resume_slot to continue generating). Returns the Slot."""
        from .state_io import load_seq_state

        if slot_id is None:
            free = [s for s in self.slots if s.state == "free"]
            if not free:
                return None
            slot_id = free[0].id
        self.state, extra = load_seq_state(self.state, slot_id, path)
        slot = self.slots[slot_id]
        slot.state = "restored"
        slot.generated = list(extra.get("generated", []))
        slot.prompt_len = int(extra.get("prompt_len", 0))
        slot.max_new = int(extra.get("max_new", 0))
        slot.stop_at_eos = bool(extra.get("stop_at_eos", True))
        return slot

    def resume_slot(self, slot_id: int, max_new_tokens: int | None = None,
                    on_token: Callable | None = None,
                    sampler: SamplerConfig | None = None):
        """Continue generation on a restored slot (prompt-cache resume)."""
        slot = self.slots[slot_id]
        assert slot.state == "restored", slot.state
        if max_new_tokens is not None:
            slot.max_new = max_new_tokens
        slot.on_token = on_token
        if sampler is not None:
            self.engine.set_row_sampler(slot_id, sampler)
        slot.state = "generating"
        self._active_mask[slot_id] = True
        return slot

    def run_until_done(self, max_steps: int = 10_000):
        steps = 0
        while (self.n_active > 0 or self._prefill_queue) and steps < max_steps:
            self.step()
            steps += 1
