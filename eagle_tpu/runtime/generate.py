"""Autoregressive generation engine (non-speculative path).

The whole decode loop — forward, sample, KV append, EOS tracking — runs inside
one compiled program per chunk (lax.scan), eliminating the per-token
host<->device round-trips the reference pays in its C++ driver loop
(examples/main, stack SURVEY.md §3.2). Prompt lengths are bucketed to powers of
two to bound recompilation."""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import llama_forward
from ..runtime.kvcache import KVCache, causal_mask_from_tags
from .sampling import SamplerConfig, SamplerState, sample, sample_stateful


def pad_bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class Generator:
    params: Any
    cfg: ModelConfig
    max_seq: int = 2048
    batch: int = 1
    kv_dtype: Any = jnp.bfloat16
    compute_dtype: Any = jnp.bfloat16
    backend: str | None = None
    eos_id: int = 2

    def __post_init__(self):
        self.kv = KVCache.create(
            self.cfg.n_layers, self.batch, self.max_seq, self.cfg.n_kv_heads,
            self.cfg.head_dim, dtype=self.kv_dtype, v_head_dim=self.cfg.v_dim,
        )
        self._prefill_jit = jax.jit(self._prefill, static_argnames=("t",), donate_argnames=("kv",))
        self._extend_jit = jax.jit(
            self._extend, static_argnames=("t", "kv_limit"), donate_argnames=("kv",)
        )
        self._decode_jit = jax.jit(
            self._decode_chunk, static_argnames=("n_steps", "scfg", "kv_limit"),
            donate_argnames=("kv",),
        )

    def kv_read_bucket(self, slot_end: int) -> int:
        """Static attention-read bound for a chunk whose highest written cache
        slot is < slot_end (see llama_forward kv_limit). Power-of-two buckets
        from 128 bound recompiles to log2(max_seq/128) program variants."""
        return min(self.max_seq, pad_bucket(slot_end, 128))

    # ---- compiled bodies --------------------------------------------------

    def _prefill(self, params, kv: KVCache, tokens, n_valid, t: int):
        """tokens [B, t] padded; n_valid [B] actual lengths. Returns
        (last_logits [B, V], hidden [B, D], kv)."""
        b = tokens.shape[0]
        positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
        valid = positions < n_valid[:, None]
        kv = kv.with_tags(positions, positions, valid=valid)
        mask = causal_mask_from_tags(kv.slot_pos, positions)
        out = llama_forward(
            params, self.cfg, tokens, positions, kv, positions, mask,
            backend=self.backend, compute_dtype=self.compute_dtype,
            kv_limit=min(self.max_seq, max(t, 128)),
            causal_tags_prefill=True,  # enables the prefill flash kernel
        )
        last = n_valid - 1
        b_idx = jnp.arange(b)
        return out.logits[b_idx, last], out.hidden[b_idx, last], out.kv

    def _extend(self, params, kv: KVCache, tokens, start, n_valid, t: int,
                kv_limit: int):
        """Prefill-at-offset: feed `tokens` [B, t] (n_valid real) at positions
        start..start+t-1 on top of a live cache — the incremental decode the
        reference does when a chat turn appends to an existing context
        (llama_decode with n_past > 0). Returns (last_logits [B, V], kv)."""
        b = tokens.shape[0]
        offs = jnp.arange(t, dtype=jnp.int32)[None, :]
        positions = start[:, None] + offs
        valid = offs < n_valid[:, None]
        kv = kv.with_tags(positions, positions, valid=valid)
        mask = causal_mask_from_tags(kv.slot_pos, positions)
        out = llama_forward(
            params, self.cfg, tokens, positions, kv, positions, mask,
            backend=self.backend, compute_dtype=self.compute_dtype,
            kv_limit=kv_limit, causal_tags_prefill=True,
        )
        last = n_valid - 1
        b_idx = jnp.arange(b)
        return out.logits[b_idx, last], out.kv

    def _decode_chunk(self, params, kv: KVCache, first_token, start_pos, key, scfg: SamplerConfig, n_steps: int, sampler_state: SamplerState | None = None, start_slot=None, kv_limit: int | None = None):
        """Greedy/sampled decode of n_steps tokens inside one scan; with a
        stateful sampler config, penalties/mirostat state rides the carry.

        first_token [B], start_pos [B]. `start_slot` separates the physical
        cache slot (token ordinal) from the rope position — they differ under
        self-extend group attention, where positions are compressed but every
        token keeps its own slot. Returns (tokens [B, n_steps], kv, state)."""

        def step(carry, _):
            kv, tok, pos, slot, key, sstate = carry
            p = pos[:, None]
            sl = slot[:, None]
            kv = kv.with_tags(sl, p)
            mask = causal_mask_from_tags(kv.slot_pos, p)
            fo = llama_forward(
                params, self.cfg, tok[:, None], p, kv, sl, mask,
                backend=self.backend, compute_dtype=self.compute_dtype,
                kv_limit=kv_limit,
            )
            kv = fo.kv
            key, sub = jax.random.split(key)
            if sstate is not None:
                nxt, sstate = sample_stateful(fo.logits[:, 0], sub, scfg, sstate)
            else:
                nxt = sample(fo.logits[:, 0], sub, scfg)
            return (kv, nxt, pos + 1, slot + 1, key, sstate), nxt

        if start_slot is None:
            start_slot = start_pos
        (kv, _, _, _, _, sampler_state), toks = jax.lax.scan(
            step, (kv, first_token, start_pos, start_slot, key, sampler_state),
            None, length=n_steps,
        )
        return toks.T, kv, sampler_state  # [B, n_steps]

    # ---- host API ---------------------------------------------------------

    def generate_constrained(
        self,
        prompt_tokens,
        grammar,
        tokenizer,
        max_new_tokens: int = 128,
        sampler: SamplerConfig | None = None,
        seed: int = 0,
    ) -> list[int]:
        """Grammar-constrained generation (GBNF). Token-by-token with a
        host-side grammar mask, like the reference's sampler-chain grammar
        stage (src/llama-sampling.cpp grammar sampler). The grammar object is
        mutated (its automaton advances)."""
        from .sampling import transform_logits

        scfg = sampler or SamplerConfig(greedy=True)
        prompt = np.asarray(prompt_tokens, dtype=np.int32)
        n = len(prompt)
        t = pad_bucket(n)
        padded = np.zeros((self.batch, t), np.int32)
        padded[0, :n] = prompt
        logits, _, self.kv = self._prefill_jit(
            self.params, self.kv, jnp.asarray(padded), jnp.asarray([n], np.int32), t=t
        )
        from .grammar import TokenTrie

        pieces = [tokenizer.piece(i) for i in range(self.cfg.vocab_size)]
        trie = TokenTrie(pieces)
        rng = np.random.default_rng(seed)
        out: list[int] = []
        pos = n
        for _ in range(max_new_tokens):
            l = np.asarray(transform_logits(logits[0], scfg)).astype(np.float64)
            mask = grammar.token_mask(trie)
            if (grammar.awaiting_trigger or grammar.can_end) and tokenizer.eos_id >= 0:
                mask[tokenizer.eos_id] = True
            l[~mask] = -np.inf
            if scfg.greedy or scfg.temperature <= 0:
                tok = int(l.argmax())
            else:
                p = np.exp(l - l.max())
                p /= p.sum()
                tok = int(rng.choice(len(p), p=p))
            out.append(tok)
            if tok == tokenizer.eos_id:
                break
            grammar.accept_token(tok, pieces[tok])
            if pos + 1 >= self.max_seq:
                break
            p_arr = jnp.full((self.batch, 1), pos, jnp.int32)
            self.kv = self.kv.with_tags(p_arr, p_arr)
            from .kvcache import causal_mask_from_tags

            m = causal_mask_from_tags(self.kv.slot_pos, p_arr)
            fo = llama_forward(
                self.params, self.cfg, jnp.full((self.batch, 1), tok, jnp.int32),
                p_arr, self.kv, p_arr, m,
                backend=self.backend, compute_dtype=self.compute_dtype,
            )
            self.kv = fo.kv
            logits = fo.logits[:, 0]
            pos += 1
        return out

    def generate(
        self,
        prompt_tokens: list[int] | np.ndarray,
        max_new_tokens: int = 128,
        sampler: SamplerConfig | None = None,
        seed: int = 0,
        chunk: int = 32,
        stop_at_eos: bool = True,
        context_shift_keep: int | None = None,
        grp_attn_n: int = 1,
        grp_attn_w: int = 512,
        on_token=None,
        session_path=None,
        session_cache_all: bool = False,
    ) -> list[int]:
        """Single-sequence generation. Returns generated token ids.

        `context_shift_keep`: when set, generation past max_seq evicts half of
        the non-kept context (llama.cpp's --keep / context-shift behavior)
        instead of stopping.

        `grp_attn_n > 1` enables Self-Extend group attention (main.cpp's
        --grp-attn-n/--grp-attn-w, examples/passkey): rope positions are
        periodically compressed by the seq_add/div triple so the model never
        sees positions beyond its training window, while every token keeps
        its own cache slot.

        `session_path` enables prompt-cache sessions (main.cpp:235-253
        --prompt-cache): the longest token prefix shared with the session
        file's cached KV skips prefill; the session is (re)written on return.
        `session_cache_all` also caches the generated continuation
        (--prompt-cache-all). Sessions are not written after a context shift
        or under self-extend (slots no longer equal token ordinals)."""
        scfg = sampler or SamplerConfig(greedy=True)
        prompt = np.asarray(prompt_tokens, dtype=np.int32)
        n = len(prompt)
        # invalidate any previous generation's tags: a reused Generator must
        # not leak stale rows above this prompt into the visibility mask
        self.kv = self.kv.rollback(keep_below=jnp.zeros((self.batch,), jnp.int32))
        n_matched = 0
        if session_path:
            from .state_io import (
                insert_session_kv,
                load_prompt_session,
                session_prefix_len,
            )

            loaded = load_prompt_session(session_path, self.kv)
            if loaded is not None:
                sess_tokens, arrs = loaded
                # always re-evaluate at least the final prompt token: its
                # logits seed the first sample (main.cpp forces n_past--
                # on an exact whole-prompt match for the same reason)
                n_matched = min(session_prefix_len(sess_tokens, prompt), n - 1)
                if n_matched > 0:
                    self.kv = insert_session_kv(self.kv, arrs, n_matched)
        self.session_prefix_reused = n_matched  # introspection for tools/tests
        if n_matched > 0:
            tail = prompt[n_matched:]
            tn = len(tail)
            t = pad_bucket(tn)
            padded = np.zeros((self.batch, t), np.int32)
            padded[0, :tn] = tail
            logits, self.kv = self._extend_jit(
                self.params, self.kv, jnp.asarray(padded),
                jnp.asarray([n_matched], np.int32), jnp.asarray([tn], np.int32),
                t=t, kv_limit=self.kv_read_bucket(n),
            )
        else:
            t = pad_bucket(n)
            padded = np.zeros((self.batch, t), np.int32)
            padded[0, :n] = prompt
            logits, _, self.kv = self._prefill_jit(
                self.params, self.kv, jnp.asarray(padded), jnp.asarray([n], np.int32), t=t
            )
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        sstate = (
            SamplerState.create(self.batch, self.cfg.vocab_size, scfg.mirostat_tau)
            if scfg.stateful
            else None
        )
        if sstate is not None:
            # count the prompt tokens into the penalty window
            b_idx = np.zeros(n, np.int32)
            sstate = dataclasses.replace(
                sstate,
                counts=sstate.counts.at[0, jnp.asarray(prompt)].add(1.0),
            )
            first, sstate = sample_stateful(logits, sub, scfg, sstate)
        else:
            first = sample(logits, sub, scfg)

        out = [int(first[0])]
        shifted = [False]  # context shift / self-extend break slot==ordinal

        def finish():
            if session_path and not shifted[0]:
                from .state_io import save_prompt_session

                # the final sampled token was never FED, so its KV row does
                # not exist — cache rows/tokens up to the last fed position
                end = n + len(out) - 1 if session_cache_all else n
                toks = list(prompt) + out if session_cache_all else list(prompt)
                save_prompt_session(session_path, toks[:end], self.kv, end)
            return out

        if on_token:
            on_token(out[0])
        if stop_at_eos and out[-1] == self.eos_id:
            return finish()
        pos = n
        slot = n
        ga_i = 0
        tok = first
        while len(out) < max_new_tokens:
            if grp_attn_n > 1:
                from ..ops.rope import rope_freqs_cfg
                from .kvcache import self_extend_shift

                # delta re-rotations use the YaRN-blended frequencies but NOT
                # mscale: K already carries its mscale from the forward, and
                # rotation by a position delta must keep magnitudes so that
                # shift == recompute holds exactly (the reference re-applies
                # mscale in build_k_shift — a magnitude drift per shift we
                # deliberately avoid)
                inv_freq, _ = rope_freqs_cfg(self.cfg)
                while pos >= ga_i + grp_attn_w:
                    shifted[0] = True
                    self.kv, pos, ga_i = self_extend_shift(
                        self.kv, inv_freq, pos, ga_i, grp_attn_n, grp_attn_w
                    )
                if slot + chunk + 1 >= self.max_seq:
                    break
                steps = min(chunk, max_new_tokens - len(out),
                            ga_i + grp_attn_w - pos)
                key, sub = jax.random.split(key)
                toks, self.kv, sstate = self._decode_jit(
                    self.params, self.kv, tok,
                    jnp.full((self.batch,), pos, jnp.int32), sub, scfg,
                    n_steps=steps, sampler_state=sstate,
                    start_slot=jnp.full((self.batch,), slot, jnp.int32),
                    kv_limit=self.kv_read_bucket(slot + steps),
                )
                for tk in np.asarray(toks)[0].tolist():
                    out.append(int(tk))
                    if on_token:
                        on_token(int(tk))
                    if stop_at_eos and tk == self.eos_id:
                        return finish()
                pos += steps
                slot += steps
                tok = toks[:, -1]
                continue
            if context_shift_keep is not None and pos + chunk + 1 >= self.max_seq:
                from ..ops.rope import rope_freqs_cfg
                from .kvcache import context_shift

                n_discard = (self.max_seq - context_shift_keep) // 2
                inv_freq, _ = rope_freqs_cfg(self.cfg)  # no mscale (see above)
                self.kv = context_shift(self.kv, inv_freq, context_shift_keep, n_discard)
                shifted[0] = True
                pos -= n_discard
            elif pos + chunk + 1 >= self.max_seq:
                break
            steps = min(chunk, max_new_tokens - len(out))
            key, sub = jax.random.split(key)
            toks, self.kv, sstate = self._decode_jit(
                self.params, self.kv, tok, jnp.full((self.batch,), pos, jnp.int32),
                sub, scfg, n_steps=steps, sampler_state=sstate,
                kv_limit=self.kv_read_bucket(pos + steps),
            )
            chunk_toks = np.asarray(toks)[0].tolist()
            for tk in chunk_toks:
                out.append(int(tk))
                if on_token:
                    on_token(int(tk))
                if stop_at_eos and tk == self.eos_id:
                    return finish()
            pos += steps
            tok = jnp.asarray(np.asarray(toks)[:, -1])
        return finish()
