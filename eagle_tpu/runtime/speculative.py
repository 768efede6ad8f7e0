"""EAGLE chain speculative decoding engine.

One *fully-jitted* cycle does: K-step draft scan (feature autoregression) ->
single verify forward over [input token + K drafts] -> greedy/sampled
exact-prefix acceptance -> KV rollback by tag invalidation -> feature handoff.
The reference pays ~8 host<->device round-trips per cycle (hidden-state
download/upload at src/llama.cpp:10426 / llama-context.cpp:83-88, per-token
draft sampling on host, KV ops on host cells); here the entire cycle is one
XLA program and the hidden state never leaves the device — the design fix
called out in SURVEY.md §7 stage 5.

Indexing model (matches EAGLE training's shifted sequence):
  target token x_i lives at target position i;
  draft *pair* (x_i, f_{i-1}) lives at draft position i-1, where f_j is the
  target hidden state at position j (post- or pre-final-norm per
  `feature_source`; the fork uses post — result_norm — while official EAGLE
  checkpoints are trained on pre-norm features).

Acceptance: greedy rows use the exact-match prefix walk of
common_sampler_sample_and_accept_n (common/sampling.cpp:423-460); sampling
rows use stochastic speculative sampling — draft proposals SAMPLED from the
draft's transformed distribution q, accepted with min(1, p/q), rejections
resampled from the residual norm(max(p-q, 0))
(examples/speculative/speculative-eagle.cpp:294-320). Both emit one
bonus/correction token per cycle and both leave the emitted stream
distributed exactly as plain decoding under the same sampler.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.eagle import eagle_forward
from ..models.llama import llama_forward
from .generate import pad_bucket
from .kvcache import KVCache, causal_mask_from_tags
from .sampling import (
    BatchedSamplerParams,
    SamplerConfig,
    sample,
    sample_batched,
    speculative_accept,
    transformed_probs_batched,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpecState:
    tgt_kv: KVCache
    dft_kv: KVCache
    last_token: jax.Array  # [B] sampled but not yet decoded by the target
    feature: jax.Array  # [B, D] target feature at position n_past-1
    n_past: jax.Array  # [B] committed target tokens (m)
    key: jax.Array


class CycleOutput(NamedTuple):
    state: SpecState
    tokens: jax.Array  # [B, K+1] output tokens (accepted drafts + correction)
    n_out: jax.Array  # [B] how many of `tokens` are real output (n_acc + 1)
    n_accepted: jax.Array  # [B] accepted draft tokens this cycle


class Proposal(NamedTuple):
    """Uncommitted cycle result for host-mediated acceptance (grammar
    composition): drafts + greedy targets + top-k candidates per verify
    position, with the post-write KV buffers held for _cycle_commit."""

    drafts: jax.Array  # [B, K]
    t_true: jax.Array  # [B, K+1] greedy target tokens
    cand_ids: jax.Array  # [B, K+1, C] top-C target candidates per position
    feats: jax.Array  # [B, K+1, D] features for the next draft step
    tgt_kv: Any
    dft_kv: Any
    m: jax.Array  # [B] n_past at propose time


class EagleChainEngine:
    """Single-sequence (B=1-oriented, but batch-shaped) chain speculation."""

    def __init__(
        self,
        target_params: dict[str, Any],
        draft_params: dict[str, Any],
        target_cfg: ModelConfig,
        draft_cfg: ModelConfig | None = None,
        *,
        n_draft: int = 5,
        max_seq: int = 2048,
        batch: int = 1,
        kv_dtype=jnp.bfloat16,
        compute_dtype=jnp.bfloat16,
        backend: str | None = None,
        draft_backend: str | None = None,
        feature_source: str = "post_norm",  # "post_norm" (fork) | "pre_norm" (official)
        sampler: SamplerConfig | None = None,
        eos_id: int = 2,
    ):
        self.tp, self.dp = target_params, draft_params
        self.tcfg = target_cfg
        self.dcfg = draft_cfg or dataclasses.replace(target_cfg, n_layers=1, is_eagle=True)
        self.K = n_draft
        self.max_seq = max_seq
        self.batch = batch
        self.compute_dtype = compute_dtype
        self.backend = backend
        #: backend for the EAGLE draft forwards only. The L=1 draft runs
        #: tiny matmuls inside a lax.scan where the pallas kernels showed
        #: pathological Mosaic behavior on TPU (NOTES.md round-1 known
        #: issue); 'xla' sidesteps it at negligible cost (the draft is
        #: ~1/32 of the cycle's weight traffic). Defaults to `backend`.
        self.draft_backend = backend if draft_backend is None else draft_backend
        self.feature_source = feature_source
        self.scfg = sampler or SamplerConfig(greedy=True)
        self.eos_id = eos_id
        self.kv_dtype = kv_dtype

        #: per-slot sampler parameters (server.cpp:272-278 equivalent); rows
        #: default to the engine-wide SamplerConfig. The batcher overwrites
        #: rows per request via set_row_sampler (which also maintains the
        #: host-side all-greedy flag below).
        self.bsampler = BatchedSamplerParams.create(batch, self.scfg, n_draft=n_draft)
        #: host-tracked per-row greediness. When every row is greedy the cycle
        #: compiles a pure-argmax acceptance (`fast_greedy`) — the branch-free
        #: per-row transform pipeline costs two full [B,V] sorts per verify
        #: position (~0.5 ms/cycle measured on v5e) that cannot change an
        #: argmax outcome (counts=None in the cycle, masks always keep the max).
        self._row_greedy = [bool(self.scfg.greedy or self.scfg.temperature <= 0)] * batch

        # params are threaded as jit arguments (NOT captured in the closure:
        # closure-captured arrays become XLA constants, which bloats compiles
        # catastrophically for GB-scale weights)
        self._prefill_c = jax.jit(self._prefill, static_argnames=("t",))
        self._cycle_c = jax.jit(
            self._cycle, static_argnames=("kv_limit", "fast_greedy"),
            donate_argnames=("state",),
        )
        self._prefill_jit = lambda state, tokens, n_valid, t: self._prefill_c(
            self.tp, self.dp, state, tokens, n_valid, t=t
        )
        self._cycle_jit = lambda state, bs=None, active=None, kv_limit=None: self._cycle_c(
            self.tp, self.dp, state,
            bs if bs is not None else self.bsampler,
            active if active is not None else jnp.ones((self.batch,), bool),
            kv_limit=kv_limit,
            fast_greedy=all(self._row_greedy),
        )
        self._multi_c = jax.jit(
            self._multi_cycle,
            static_argnames=("n_cycles", "kv_limit", "fast_greedy"),
            donate_argnames=("state",),
        )
        self._multi_jit = lambda state, n_cycles, kv_limit=None: self._multi_c(
            self.tp, self.dp, state, self.bsampler,
            jnp.ones((self.batch,), bool), n_cycles=n_cycles,
            kv_limit=kv_limit, fast_greedy=all(self._row_greedy),
        )

    def set_row_sampler(self, i: int, cfg: SamplerConfig, spec_k: int | None = None):
        """Configure slot i's sampler (host-side). Keeps the all-greedy flag
        in sync so the cycle picks the argmax-only acceptance when possible."""
        self.bsampler = self.bsampler.set_row(i, cfg, spec_k=spec_k)
        self._row_greedy[i] = bool(cfg.greedy or cfg.temperature <= 0)

    def kv_read_bucket(self, slot_end: int) -> int:
        """Static attention-read bound covering cache slots < slot_end (see
        llama_forward kv_limit); power-of-two buckets from 128."""
        return min(self.max_seq, pad_bucket(max(slot_end, 1), 128))

    def _multi_cycle(self, tp, dp, state: SpecState, bs, active,
                     n_cycles: int, kv_limit: int | None = None,
                     fast_greedy: bool = False) -> CycleOutput:
        """`n_cycles` chained speculative cycles in ONE compiled program
        (lax.scan over _cycle). Single-stream serving through a remote link
        pays one host<->device round trip per dispatch (25-40 ms on the TPU
        relay) — at ~2 accepted tokens/cycle that sync dominates the 7B
        cycle's ~10 ms of compute, so chaining C cycles cuts the per-token
        link cost by C. Host-side stop conditions (eos, max_new) are checked
        between DISPATCHES; overshoot cycles are computed and discarded
        (identical tokens, wasted compute — the caller sizes C against its
        stop horizon). kv_limit must bound the LAST cycle's reads."""

        def body(st, _):
            r = self._cycle(tp, dp, st, bs, active, kv_limit=kv_limit,
                            fast_greedy=fast_greedy)
            return r.state, (r.tokens, r.n_out, r.n_accepted)

        st, (toks, n_out, n_acc) = jax.lax.scan(
            body, state, None, length=n_cycles)
        # [C, B, K+1] / [C, B] stacked per-cycle outputs
        return CycleOutput(st, toks, n_out, n_acc)

    # ------------------------------------------------------------------

    def _pick_feature(self, post: jax.Array, pre: jax.Array) -> jax.Array:
        return post if self.feature_source == "post_norm" else pre

    def fresh_state(self) -> SpecState:
        b = self.batch
        return SpecState(
            tgt_kv=KVCache.create(
                self.tcfg.n_layers, b, self.max_seq, self.tcfg.n_kv_heads,
                self.tcfg.head_dim, self.kv_dtype,
            ),
            dft_kv=KVCache.create(
                1, b, self.max_seq, self.dcfg.n_kv_heads, self.dcfg.head_dim, self.kv_dtype
            ),
            last_token=jnp.zeros((b,), jnp.int32),
            feature=jnp.zeros((b, self.tcfg.n_embd), jnp.float32),
            n_past=jnp.zeros((b,), jnp.int32),
            key=jax.random.PRNGKey(0),
        )

    def fresh_paged_state(self, n_pages: int, page_size: int = 64,
                          dft_n_pages: int | None = None) -> SpecState:
        """Paged counterpart of fresh_state: target AND draft caches are page
        pools shared across all batch rows (runtime/paged_kv.py). Every jitted
        program (prefill chunks, the cycle, rollback) runs unchanged — the
        page indirection lives inside llama_forward/eagle_forward. Use with
        PagedBatcher, which owns the host-side allocators."""
        from .paged_kv import PagedKVCache

        b = self.batch
        mp = -(-self.max_seq // page_size)
        return SpecState(
            tgt_kv=PagedKVCache.create(
                self.tcfg.n_layers, b, n_pages, mp, page_size,
                self.tcfg.n_kv_heads, self.tcfg.head_dim, self.kv_dtype,
            ),
            dft_kv=PagedKVCache.create(
                1, b, dft_n_pages or n_pages, mp, page_size,
                self.dcfg.n_kv_heads, self.dcfg.head_dim, self.kv_dtype,
            ),
            last_token=jnp.zeros((b,), jnp.int32),
            feature=jnp.zeros((b, self.tcfg.n_embd), jnp.float32),
            n_past=jnp.zeros((b,), jnp.int32),
            key=jax.random.PRNGKey(0),
        )

    def _prefill(self, tp, dp, state: SpecState, tokens, n_valid, t: int, bs=None):
        """Target prefill over the padded prompt + draft prefill over the
        shifted (token, feature) pairs. Samples the first output token."""
        b = tokens.shape[0]
        positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
        valid = positions < n_valid[:, None]

        lim = min(self.max_seq, max(t, 128))
        tgt_kv = state.tgt_kv.with_tags(positions, positions, valid=valid)
        mask = causal_mask_from_tags(tgt_kv.slot_pos, positions)
        tout = llama_forward(
            tp, self.tcfg, tokens, positions, tgt_kv, positions, mask,
            backend=self.backend, compute_dtype=self.compute_dtype,
            kv_limit=lim, slots_contiguous=True,
        )
        feats = self._pick_feature(tout.hidden, tout.hidden_pre)

        # draft pairs: (x_i, f_{i-1}) for i = 1..n-1 at draft positions 0..n-2
        d_tokens = jnp.roll(tokens, -1, axis=1)  # x_{i+1} at index i
        d_feats = feats
        d_valid = positions < (n_valid[:, None] - 1)
        dft_kv = state.dft_kv.with_tags(positions, positions, valid=d_valid)
        d_mask = causal_mask_from_tags(dft_kv.slot_pos, positions)
        dout = eagle_forward(
            dp, tp, self.dcfg, d_tokens, d_feats, positions, dft_kv,
            positions, d_mask, backend=self.draft_backend,
            compute_dtype=self.compute_dtype,
            return_logits=False, kv_limit=lim, slots_contiguous=True,
        )

        b_idx = jnp.arange(b)
        last = n_valid - 1
        key, sub = jax.random.split(state.key)
        if bs is not None:
            first_tok = sample_batched(tout.logits[b_idx, last], sub, bs)
        else:
            first_tok = sample(tout.logits[b_idx, last], sub, self.scfg)
        return dataclasses.replace(
            state,
            tgt_kv=tout.kv,
            dft_kv=dout.kv,
            last_token=first_tok,
            feature=feats[b_idx, last],
            n_past=n_valid,
            key=key,
        )

    def _prefill_chunk(self, tp, dp, state: SpecState, tokens, start, n_valid, bs,
                       ct: int, feat_every: int = 0):
        """One prompt CHUNK [B, ct] at absolute positions start..start+ct: the
        unit of chunked prefill, so the batcher can interleave long-prompt
        admission with decode steps instead of stalling every generating slot
        for a whole prompt (the reference interleaves in update_slots,
        server.cpp:2764).

        Draft pairs are shifted one back: pair (x_i, f_{i-1}) sits at draft
        position i-1; the chunk-boundary feature comes from state.feature.
        On the final chunk the first output token is sampled per-slot.

        feat_every > 0 (static, must divide ct) additionally returns the
        features at every in-chunk stride boundary — row m is the feature of
        absolute position start + (m+1)*feat_every - 1, shape
        [B, ct//feat_every, D] — so a paged batcher can attach a boundary
        feature to EVERY full KV page regardless of chunk size (prefix reuse
        then stays page-granular under large chunks); rows past n_valid carry
        garbage and must be ignored by the caller. Returns (state, bfeats)
        in that mode, plain state otherwise."""
        b = tokens.shape[0]
        b_idx = jnp.arange(b)
        positions = start[:, None] + jnp.arange(ct, dtype=jnp.int32)[None, :]
        valid = positions < n_valid[:, None]

        tgt_kv = state.tgt_kv.with_tags(positions, positions, valid=valid)
        mask = causal_mask_from_tags(tgt_kv.slot_pos, positions)
        tout = llama_forward(
            tp, self.tcfg, tokens, positions, tgt_kv, positions, mask,
            backend=self.backend, compute_dtype=self.compute_dtype,
            slots_contiguous=True,
        )
        feats = self._pick_feature(tout.hidden, tout.hidden_pre)

        # draft pair for token x_i uses f_{i-1}: boundary feature for i=start
        d_feats = jnp.concatenate([state.feature[:, None], feats[:, :-1]], axis=1)
        d_pos = positions - 1
        d_valid = (d_pos >= 0) & (d_pos < (n_valid[:, None] - 1))
        dft_kv = state.dft_kv.with_tags(d_pos, d_pos, valid=d_valid)
        d_mask = causal_mask_from_tags(dft_kv.slot_pos, d_pos)
        dout = eagle_forward(
            dp, tp, self.dcfg, tokens, d_feats, d_pos, dft_kv, d_pos, d_mask,
            backend=self.draft_backend, compute_dtype=self.compute_dtype,
            return_logits=False,
        )

        done = jnp.minimum(n_valid, start + ct)  # tokens processed so far
        is_final = done >= n_valid
        last_idx = jnp.clip(done - start - 1, 0, ct - 1)
        key, sub = jax.random.split(state.key)
        tok = sample_batched(tout.logits[b_idx, last_idx], sub, bs)
        new_last = jnp.where(is_final, tok, state.last_token)
        new_feature = feats[b_idx, last_idx]
        new_state = dataclasses.replace(
            state,
            tgt_kv=tout.kv,
            dft_kv=dout.kv,
            last_token=new_last,
            feature=new_feature,
            n_past=done,
            key=key,
        )
        if feat_every:
            assert ct % feat_every == 0, (ct, feat_every)
            return new_state, feats[:, feat_every - 1 :: feat_every]
        return new_state

    # ------------------------------------------------------------------

    def _cycle(self, tp, dp, state: SpecState, bs: BatchedSamplerParams,
               active: jax.Array, kv_limit: int | None = None,
               fast_greedy: bool = False) -> CycleOutput:
        b, K = self.batch, self.K
        b_idx = jnp.arange(b)
        m = state.n_past  # [B]
        key, sub = jax.random.split(state.key)
        greedy_rows = bs.greedy | (bs.temperature <= 0)

        # ---- 1. draft K tokens (feature autoregression) ----
        # greedy: argmax proposals (exact-match acceptance below is optimal).
        # sampling: proposals are SAMPLED from the draft's transformed
        # distribution q and q is carried to the verifier — argmax proposals
        # would cap the accept rate at p(argmax q), while min(1, p/q)
        # acceptance over sampled proposals accepts with sum min(p, q) ≈ 1
        # when the draft is good (speculative-eagle.cpp:294-320 semantics)
        dkeys = jax.random.split(sub, K + 1)

        def draft_step(carry, inp):
            k, dkey = inp
            tok, feat, dkv = carry
            pos = (m - 1 + k)[:, None]  # [B,1] draft position of this pair
            dkv = dkv.with_tags(pos, pos)
            mask = causal_mask_from_tags(dkv.slot_pos, pos)
            out = eagle_forward(
                dp, tp, self.dcfg, tok[:, None], feat[:, None], pos,
                dkv, pos, mask, backend=self.draft_backend,
                compute_dtype=self.compute_dtype, kv_limit=kv_limit,
            )
            dl = out.logits[:, 0]
            feat_next = self._pick_feature(out.feature, out.feature_pre)[:, 0]
            if fast_greedy:
                nxt = jnp.argmax(dl, axis=-1).astype(jnp.int32)
                return (nxt, feat_next, out.kv), nxt
            q = transformed_probs_batched(dl, bs)  # [B, V]
            nxt = jnp.where(
                greedy_rows,
                jnp.argmax(q, axis=-1),
                jax.random.categorical(dkey, jnp.log(q + 1e-30), axis=-1),
            ).astype(jnp.int32)
            return (nxt, feat_next, out.kv), (nxt, q)

        (_, _, dft_kv), scanned = jax.lax.scan(
            draft_step, (state.last_token, state.feature, state.dft_kv),
            (jnp.arange(K), dkeys[:K]),
        )
        if fast_greedy:
            drafts = scanned.T  # [B, K]; drafts[:, k] = candidate for x_{m+1+k}
        else:
            drafts = scanned[0].T
            q_probs = scanned[1].transpose(1, 0, 2)  # [B, K, V]

        # ---- 2. verify: one target forward over [x_m, d_1..d_K] ----
        v_tokens = jnp.concatenate([state.last_token[:, None], drafts], axis=1)  # [B, K+1]
        v_pos = m[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        tgt_kv = state.tgt_kv.with_tags(v_pos, v_pos)
        mask = causal_mask_from_tags(tgt_kv.slot_pos, v_pos)
        tout = llama_forward(
            tp, self.tcfg, v_tokens, v_pos, tgt_kv, v_pos, mask,
            backend=self.backend, compute_dtype=self.compute_dtype,
            kv_limit=kv_limit, slots_contiguous=True,
        )

        # ---- 3. acceptance ----
        if fast_greedy:
            # all rows greedy (host-tracked): argmax of the raw logits is
            # token-identical to the transform pipeline (no penalties in the
            # cycle; top-k/p/min-p masks always keep the max; temperature
            # cannot reorder) but skips its two full [B,V] sorts per position
            t_true = jnp.argmax(tout.logits, axis=-1).astype(jnp.int32)
            match = drafts == t_true[:, :K]  # [B, K]
            n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
            # per-slot speculative override (server request's speculative.n_max)
            n_acc = jnp.minimum(n_acc, bs.spec_k)
            out_tokens = t_true
        else:
            # stochastic speculative sampling: min(1, p/q) accept + residual
            # resample, per-row sampler transforms on both sides; greedy rows
            # inside a mixed batch reduce to exact-match via their one-hot
            # p/q (sampling.speculative_accept)
            p_probs = jax.vmap(
                lambda l: transformed_probs_batched(l, bs),
                in_axes=1, out_axes=1,
            )(tout.logits)  # [B, K+1, V]
            out_tokens, n_acc = speculative_accept(
                drafts, q_probs, p_probs, bs.spec_k, greedy_rows, dkeys[K]
            )

        new_m = m + n_acc + 1
        feats = self._pick_feature(tout.hidden, tout.hidden_pre)
        new_feature = feats[b_idx, n_acc]
        new_token = out_tokens[b_idx, n_acc]

        tgt_kv = tout.kv.rollback(keep_below=new_m)
        dft_kv = dft_kv.rollback(keep_below=new_m - 1)

        # freeze INACTIVE rows (parked slots / slots mid-chunked-prefill): the
        # cycle may scribble into their KV data slots, but their tags and
        # scalar state must come through untouched so an in-progress prefill
        # isn't corrupted by concurrent decode steps.
        a = active
        a2 = active[:, None]
        new_state = SpecState(
            tgt_kv=dataclasses.replace(
                tgt_kv, slot_pos=jnp.where(a2, tgt_kv.slot_pos, state.tgt_kv.slot_pos)
            ),
            dft_kv=dataclasses.replace(
                dft_kv, slot_pos=jnp.where(a2, dft_kv.slot_pos, state.dft_kv.slot_pos)
            ),
            last_token=jnp.where(a, new_token, state.last_token),
            feature=jnp.where(a2, new_feature, state.feature),
            n_past=jnp.where(a, new_m, m),
            key=key,
        )
        return CycleOutput(
            state=new_state, tokens=out_tokens, n_out=n_acc + 1, n_accepted=n_acc
        )

    # ------------------------------------------------------------------
    # grammar-constrained speculation: the cycle splits into PROPOSE (draft +
    # verify, no state commit) and COMMIT (host-decided acceptance length +
    # final token). The host walks the proposed tokens through the grammar
    # automaton between the two — the same candidate-list masking the
    # reference's sampler chain applies per accepted token
    # (src/llama-grammar.cpp:1120), composed with speculation.

    def _cycle_propose(self, tp, dp, state: SpecState, kv_limit=None,
                       n_cand: int = 64) -> Proposal:
        b, K = self.batch, self.K
        m = state.n_past

        def draft_step(carry, k):
            tok, feat, dkv = carry
            pos = (m - 1 + k)[:, None]
            dkv = dkv.with_tags(pos, pos)
            mask = causal_mask_from_tags(dkv.slot_pos, pos)
            out = eagle_forward(
                dp, tp, self.dcfg, tok[:, None], feat[:, None], pos,
                dkv, pos, mask, backend=self.draft_backend,
                compute_dtype=self.compute_dtype, kv_limit=kv_limit,
            )
            nxt = jnp.argmax(out.logits[:, 0], axis=-1).astype(jnp.int32)
            feat_next = self._pick_feature(out.feature, out.feature_pre)[:, 0]
            return (nxt, feat_next, out.kv), nxt

        (_, _, dft_kv), drafts = jax.lax.scan(
            draft_step, (state.last_token, state.feature, state.dft_kv), jnp.arange(K)
        )
        drafts = drafts.T

        v_tokens = jnp.concatenate([state.last_token[:, None], drafts], axis=1)
        v_pos = m[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        tgt_kv = state.tgt_kv.with_tags(v_pos, v_pos)
        mask = causal_mask_from_tags(tgt_kv.slot_pos, v_pos)
        tout = llama_forward(
            tp, self.tcfg, v_tokens, v_pos, tgt_kv, v_pos, mask,
            backend=self.backend, compute_dtype=self.compute_dtype,
            kv_limit=kv_limit, slots_contiguous=True,
        )
        t_true = jnp.argmax(tout.logits, axis=-1).astype(jnp.int32)
        _, cand_ids = jax.lax.top_k(tout.logits, n_cand)
        feats = self._pick_feature(tout.hidden, tout.hidden_pre)
        return Proposal(drafts=drafts, t_true=t_true,
                        cand_ids=cand_ids.astype(jnp.int32), feats=feats,
                        tgt_kv=tout.kv, dft_kv=dft_kv, m=m)

    def _cycle_commit(self, state: SpecState, prop: Proposal,
                      n_final: jax.Array, final_token: jax.Array) -> SpecState:
        """Commit n_final output tokens; the LAST one is `final_token` (may
        differ from t_true when the grammar vetoed it)."""
        b_idx = jnp.arange(self.batch)
        new_m = prop.m + n_final
        key, _ = jax.random.split(state.key)
        return SpecState(
            tgt_kv=prop.tgt_kv.rollback(keep_below=new_m),
            dft_kv=prop.dft_kv.rollback(keep_below=new_m - 1),
            last_token=final_token,
            feature=prop.feats[b_idx, n_final - 1],
            n_past=new_m,
            key=key,
        )

    def generate_constrained(
        self,
        prompt_tokens,
        grammar,
        tokenizer,
        max_new_tokens: int = 128,
        seed: int = 0,
        stop_at_eos: bool = True,
    ) -> tuple[list[int], dict]:
        """Grammar-constrained speculative decoding: every emitted token is
        validated against (and advances) the grammar automaton; a vetoed
        position truncates the cycle's acceptance and is replaced by the
        best grammar-legal candidate from the target's top-64."""
        from .grammar import TokenTrie

        assert self.batch == 1, "constrained generation is single-sequence"
        if not hasattr(self, "_propose_c"):  # compiled once per engine
            self._propose_c = jax.jit(
                self._cycle_propose, static_argnames=("kv_limit", "n_cand")
            )
            self._commit_c = jax.jit(self._cycle_commit, donate_argnames=("state",))
        propose, commit = self._propose_c, self._commit_c

        pieces = [tokenizer.piece(i) for i in range(self.tcfg.vocab_size)]
        trie = TokenTrie(pieces)
        eos = tokenizer.eos_id

        state = self.fresh_state()
        state = dataclasses.replace(state, key=jax.random.PRNGKey(seed))
        prompt = np.asarray(prompt_tokens, dtype=np.int32)
        n = len(prompt)
        t = pad_bucket(n)
        padded = np.zeros((self.batch, t), np.int32)
        padded[0, :n] = prompt
        state = self._prefill_jit(state, jnp.asarray(padded), jnp.asarray([n], np.int32), t=t)

        # the FIRST output token must be the masked argmax of the prefill's
        # final-position logits (like the plain constrained generator) — the
        # prefill sampled unmasked, so recompute that one logits row (the KV
        # row it rewrites carries identical values)
        def _tail_logits(tp, st, tok, pos):
            kv = st.tgt_kv.with_tags(pos, pos)
            mask = causal_mask_from_tags(kv.slot_pos, pos)
            o = llama_forward(
                tp, self.tcfg, tok, pos, kv, pos, mask, backend=self.backend,
                compute_dtype=self.compute_dtype,
            )
            return o.logits[:, 0]

        if not hasattr(self, "_tail_logits_c"):
            self._tail_logits_c = jax.jit(_tail_logits)
        logits0 = np.asarray(self._tail_logits_c(
            self.tp, state,
            jnp.asarray([[int(prompt[-1])]], jnp.int32),
            jnp.asarray([[n - 1]], jnp.int32),
        ))[0]
        gmask = grammar.token_mask(trie)
        if eos >= 0:
            gmask[eos] = bool(grammar.can_end)
        masked = np.where(gmask, logits0, -np.inf)
        first = int(np.argmax(masked)) if np.isfinite(masked).any() else eos
        state = dataclasses.replace(state, last_token=jnp.asarray([first], jnp.int32))
        out = [first]
        if first != eos:
            grammar.accept_token(first, pieces[first])

        n_cycles = n_accepted = 0
        while len(out) < max_new_tokens and not (stop_at_eos and out[-1] == eos):
            n_past = int(np.asarray(state.n_past)[0])
            if n_past + self.K + 2 >= self.max_seq:
                break
            prop = propose(self.tp, self.dp, state,
                           kv_limit=self.kv_read_bucket(n_past + self.K + 2),
                           n_cand=min(256, self.tcfg.vocab_size))
            drafts = np.asarray(prop.drafts)[0]
            t_true = np.asarray(prop.t_true)[0]
            cands = np.asarray(prop.cand_ids)[0]
            # device acceptance: longest exact-match prefix
            n_dev = 1
            for p in range(self.K):
                if drafts[p] == t_true[p]:
                    n_dev += 1
                else:
                    break
            # grammar walk over the proposed output tokens
            kept: list[int] = []
            final_tok = None
            for p in range(n_dev):
                tok = int(t_true[p])
                gmask = grammar.token_mask(trie)
                if eos >= 0:
                    gmask[eos] = bool(grammar.can_end)
                if gmask[tok]:
                    kept.append(tok)
                    if tok != eos:
                        grammar.accept_token(tok, pieces[tok])
                    if tok == eos:
                        break
                    continue
                # vetoed: replace with the best grammar-legal candidate
                repl = next((int(c) for c in cands[p] if gmask[c]), None)
                if repl is None:
                    legal = np.nonzero(gmask)[0]
                    repl = int(legal[0]) if len(legal) else eos
                kept.append(repl)
                if repl != eos:
                    grammar.accept_token(repl, pieces[repl])
                final_tok = repl
                break
            n_final = len(kept)
            final_tok = kept[-1] if final_tok is None else final_tok
            state = commit(
                state, prop, jnp.asarray([n_final], jnp.int32),
                jnp.asarray([final_tok], jnp.int32),
            )
            out.extend(kept)
            n_cycles += 1
            n_accepted += max(0, n_final - 1)

        stats = {
            "constrained": True,
            "n_cycles": n_cycles,
            "n_accepted": n_accepted,
            "mean_accept_len": (n_accepted + n_cycles) / max(1, n_cycles),
        }
        return out[: max_new_tokens], stats

    # ------------------------------------------------------------------

    def generate(
        self,
        prompt_tokens,
        max_new_tokens: int = 128,
        seed: int = 0,
        stop_at_eos: bool = True,
        on_token=None,
        cycles_per_dispatch: int | None = None,
    ) -> tuple[list[int], dict]:
        """Returns (tokens, stats). Output is identical to non-speculative
        decoding with the same sampler (the draft only changes *speed*).

        `cycles_per_dispatch` > 1 chains that many speculative cycles inside
        one compiled program (_multi_cycle): through a remote device link
        every dispatch costs a round trip, so C cycles per dispatch cuts the
        per-token link cost ~C-fold at the price of up to C-1 wasted cycles
        after a stop condition."""
        state = self.fresh_state()
        state = dataclasses.replace(state, key=jax.random.PRNGKey(seed))
        prompt = np.asarray(prompt_tokens, dtype=np.int32)
        n = len(prompt)
        t = pad_bucket(n)
        padded = np.zeros((self.batch, t), np.int32)
        padded[0, :n] = prompt
        state = self._prefill_jit(state, jnp.asarray(padded), jnp.asarray([n], np.int32), t=t)

        out = [int(np.asarray(state.last_token)[0])]
        if on_token:
            on_token(out[0])
        n_cycles = 0
        n_drafted = 0
        n_accepted = 0
        C = max(1, cycles_per_dispatch or getattr(self, "cycles_per_dispatch", 1))
        while len(out) < max_new_tokens and not (stop_at_eos and out[-1] == self.eos_id):
            n_past = int(np.asarray(state.n_past)[0])
            if n_past + self.K + 2 >= self.max_seq:
                break
            # full C only if the LAST chained cycle stays in range; otherwise
            # wind down to single cycles (avoids compiling every c in [2, C))
            c = C if n_past + C * (self.K + 2) < self.max_seq else 1
            if c > 1:
                res = self._multi_jit(
                    state, n_cycles=c,
                    kv_limit=self.kv_read_bucket(n_past + c * (self.K + 2)),
                )
                state = res.state
                toks_c = np.asarray(res.tokens)[:, 0]  # [c, K+1]
                nout_c = np.asarray(res.n_out)[:, 0]
                nacc_c = np.asarray(res.n_accepted)[:, 0]
                done = False
                for ci in range(c):
                    n_cycles += 1
                    n_drafted += self.K
                    n_accepted += int(nacc_c[ci])
                    for tk in toks_c[ci][: int(nout_c[ci])]:
                        out.append(int(tk))
                        if on_token:
                            on_token(int(tk))
                        if (stop_at_eos and tk == self.eos_id) or len(out) >= max_new_tokens:
                            done = True
                            break
                    if done:
                        break
                continue
            res = self._cycle_jit(state, kv_limit=self.kv_read_bucket(n_past + self.K + 2))
            state = res.state
            toks = np.asarray(res.tokens)[0]
            k = int(np.asarray(res.n_out)[0])
            n_cycles += 1
            n_drafted += self.K
            n_accepted += int(np.asarray(res.n_accepted)[0])
            for tk in toks[:k]:
                out.append(int(tk))
                if on_token:
                    on_token(int(tk))
                if (stop_at_eos and tk == self.eos_id) or len(out) >= max_new_tokens:
                    break
        stats = {
            "n_cycles": n_cycles,
            "n_drafted": n_drafted,
            "n_accepted": n_accepted,
            "accept_rate": n_accepted / max(1, n_drafted),
            "mean_accept_len": (n_accepted + n_cycles) / max(1, n_cycles),
        }
        return out, stats
