"""Continuous batching scheduler — slots over batched engines.

The TPU counterpart of llama-server's slot machinery (server.cpp:2764
update_slots): a fixed batch of B slots, each an independent sequence in its
own KV-cache row. New requests prefill into free slots (a B=1-shaped program
writing one batch row); decode/speculation advances ALL active slots in one
compiled step — inactive slots compute masked garbage into parked positions
(static shapes beat idle FLOPs on TPU). Slot lifecycle, streaming, and
EOS/limit handling live on the host; everything per-token is on device.

Works with both the plain Generator-style decode and the EAGLE engines (their
cycles are already batch-shaped: per-slot n_past, acceptance counts, rollback
tags)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .generate import pad_bucket
from .kvcache import KVCache, causal_mask_from_tags
from .sampling import SamplerConfig, sample
from .speculative import EagleChainEngine, SpecState


@dataclass
class Slot:
    id: int
    state: str = "free"  # free | generating
    request_id: str | None = None
    prompt_len: int = 0
    max_new: int = 0
    generated: list = field(default_factory=list)
    on_token: Callable | None = None  # streaming callback(token_id)
    eos_id: int = 2
    stop_at_eos: bool = True

    @property
    def done(self) -> bool:
        if self.generated and self.stop_at_eos and self.generated[-1] == self.eos_id:
            return True
        return len(self.generated) >= self.max_new


class ContinuousBatcher:
    """Slot scheduler over a batched EagleChainEngine (speculative) — plain
    decoding falls out of n_draft=1 if no draft head is wanted."""

    def __init__(self, engine: EagleChainEngine):
        self.engine = engine
        self.batch = engine.batch
        self.slots = [Slot(id=i, eos_id=engine.eos_id) for i in range(self.batch)]
        self.state = engine.fresh_state()
        # parked inactive slots sit at n_past=1 so draft positions stay >= 0
        self.state = dataclasses.replace(
            self.state, n_past=jnp.ones((self.batch,), jnp.int32)
        )
        self._prefill_one_c = jax.jit(self._prefill_one, static_argnames=("t",))
        self._active_mask = np.zeros(self.batch, bool)

    # ------------------------------------------------------------------

    def _prefill_one(self, tp, dp, state: SpecState, tokens, n_valid, slot: jax.Array, t: int):
        """Prefill a single batch row `slot` with `tokens` [t]; other rows
        untouched. Reuses the engine's batched prefill on a B=1 view, then
        scatters the results back into row `slot`."""
        eng = self.engine

        def take_row(x):
            return jax.lax.dynamic_slice_in_dim(x, slot, 1, axis=0)

        def put_row(full, row):
            return jax.lax.dynamic_update_slice_in_dim(full, row, slot, axis=0)

        sub = SpecState(
            tgt_kv=KVCache(
                k=jnp.moveaxis(take_row(jnp.moveaxis(state.tgt_kv.k, 1, 0)), 0, 1),
                v=jnp.moveaxis(take_row(jnp.moveaxis(state.tgt_kv.v, 1, 0)), 0, 1),
                slot_pos=jnp.full_like(take_row(state.tgt_kv.slot_pos), -1),
            ),
            dft_kv=KVCache(
                k=jnp.moveaxis(take_row(jnp.moveaxis(state.dft_kv.k, 1, 0)), 0, 1),
                v=jnp.moveaxis(take_row(jnp.moveaxis(state.dft_kv.v, 1, 0)), 0, 1),
                slot_pos=jnp.full_like(take_row(state.dft_kv.slot_pos), -1),
            ),
            last_token=take_row(state.last_token),
            feature=take_row(state.feature),
            n_past=take_row(state.n_past),
            key=state.key,
        )
        saved_batch = eng.batch
        eng.batch = 1
        try:
            new_sub = eng._prefill(tp, dp, sub, tokens[None, :], n_valid[None], t=t)
        finally:
            eng.batch = saved_batch
        return dataclasses.replace(
            state,
            tgt_kv=KVCache(
                k=jnp.moveaxis(put_row(jnp.moveaxis(state.tgt_kv.k, 1, 0),
                                       jnp.moveaxis(new_sub.tgt_kv.k, 1, 0)), 0, 1),
                v=jnp.moveaxis(put_row(jnp.moveaxis(state.tgt_kv.v, 1, 0),
                                       jnp.moveaxis(new_sub.tgt_kv.v, 1, 0)), 0, 1),
                slot_pos=put_row(state.tgt_kv.slot_pos, new_sub.tgt_kv.slot_pos),
            ),
            dft_kv=KVCache(
                k=jnp.moveaxis(put_row(jnp.moveaxis(state.dft_kv.k, 1, 0),
                                       jnp.moveaxis(new_sub.dft_kv.k, 1, 0)), 0, 1),
                v=jnp.moveaxis(put_row(jnp.moveaxis(state.dft_kv.v, 1, 0),
                                       jnp.moveaxis(new_sub.dft_kv.v, 1, 0)), 0, 1),
                slot_pos=put_row(state.dft_kv.slot_pos, new_sub.dft_kv.slot_pos),
            ),
            last_token=put_row(state.last_token, new_sub.last_token),
            feature=put_row(state.feature, new_sub.feature),
            n_past=put_row(state.n_past, new_sub.n_past),
            key=new_sub.key,
        )

    # ------------------------------------------------------------------

    def submit(
        self,
        prompt_tokens,
        max_new_tokens: int = 128,
        request_id: str | None = None,
        on_token: Callable | None = None,
        stop_at_eos: bool = True,
    ) -> Slot | None:
        """Assign a request to a free slot (None if saturated) and prefill it."""
        free = [s for s in self.slots if s.state == "free"]
        if not free:
            return None
        slot = free[0]
        prompt = np.asarray(prompt_tokens, np.int32)
        t = pad_bucket(len(prompt))
        padded = np.zeros(t, np.int32)
        padded[: len(prompt)] = prompt
        self.state = self._prefill_one_c(
            self.engine.tp, self.engine.dp, self.state,
            jnp.asarray(padded), jnp.asarray(len(prompt), np.int32),
            jnp.asarray(slot.id, np.int32), t=t,
        )
        slot.state = "generating"
        slot.request_id = request_id
        slot.prompt_len = len(prompt)
        slot.max_new = max_new_tokens
        slot.generated = []
        slot.on_token = on_token
        slot.stop_at_eos = stop_at_eos
        first = int(np.asarray(self.state.last_token)[slot.id])
        self._emit(slot, first)
        self._active_mask[slot.id] = True
        self._maybe_finish(slot)
        return slot

    def _emit(self, slot: Slot, token: int):
        slot.generated.append(token)
        if slot.on_token:
            slot.on_token(token)

    def _maybe_finish(self, slot: Slot):
        if slot.state == "generating" and slot.done:
            slot.state = "free"
            self._active_mask[slot.id] = False

    @property
    def n_active(self) -> int:
        return int(self._active_mask.sum())

    def step(self):
        """One speculative cycle across all slots."""
        if self.n_active == 0:
            return
        res = self.engine._cycle_jit(self.state)
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
                >= self.engine.max_seq
            ):
                slot.state = "free"
                self._active_mask[slot.id] = False

    def run_until_done(self, max_steps: int = 10_000):
        steps = 0
        while self.n_active > 0 and steps < max_steps:
            self.step()
            steps += 1
