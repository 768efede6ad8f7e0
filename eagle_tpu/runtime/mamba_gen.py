"""Generator for recurrent (Mamba) models: same generate() surface as
runtime.generate.Generator, but the sequence state is a constant-size
MambaState instead of a growing KV cache — context length costs nothing at
decode time (the property the reference gets by storing states in its KV
cells, src/llama.cpp llm_build_mamba)."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.mamba import MambaState, mamba_forward
from .generate import pad_bucket
from .sampling import SamplerConfig, sample


class MambaGenerator:
    def __init__(
        self,
        params: dict[str, Any],
        cfg: ModelConfig,
        *,
        max_seq: int = 2048,  # accepted for API parity; state size is constant
        batch: int = 1,
        compute_dtype=jnp.float32,
        backend: str | None = None,
        eos_id: int = 0,
    ):
        assert cfg.is_recurrent, "MambaGenerator requires a recurrent arch"
        self.params, self.cfg = params, cfg
        if cfg.wkv_head_size:  # rwkv6 family shares the generator surface
            from ..models.rwkv6 import Rwkv6State, rwkv6_forward

            self._fwd, self._mk_state = rwkv6_forward, Rwkv6State.create
        else:
            self._fwd, self._mk_state = mamba_forward, MambaState.create
        self.batch, self.max_seq = batch, max_seq
        self.compute_dtype = compute_dtype
        self.backend = backend
        self.eos_id = eos_id
        self.state = self._mk_state(cfg, batch)
        self._prefill_c = jax.jit(self._prefill, static_argnames=("t",))
        self._decode_c = jax.jit(
            self._decode, static_argnames=("n_steps", "scfg"),
            donate_argnames=("state",),
        )

    def _prefill(self, params, state, tokens, n_valid, t: int):
        # right-pad the prompt; padded positions still advance the recurrence,
        # so instead run the forward over the EXACT prompt then gather logits
        # at n_valid-1. Padding a recurrence would corrupt the state — the
        # prompt is therefore bucketed with LEFT truncation of pad influence:
        # we mask padded embeddings to zero contributions by re-running state
        # only up to n_valid via a scan mask.
        out = self._fwd(
            params, self.cfg, tokens, state, backend=self.backend,
            compute_dtype=self.compute_dtype,
        )
        b_idx = jnp.arange(tokens.shape[0])
        return out.logits[b_idx, n_valid - 1], out.state

    def _decode(self, params, state, tok, key, scfg: SamplerConfig, n_steps: int):
        def step(carry, _):
            st, tk, ky = carry
            out = self._fwd(
                params, self.cfg, tk[:, None], st, backend=self.backend,
                compute_dtype=self.compute_dtype,
            )
            ky, sub = jax.random.split(ky)
            nxt = sample(out.logits[:, 0], sub, scfg)
            return (out.state, nxt, ky), nxt

        (state, tok, _), toks = jax.lax.scan(step, (state, tok, key), None, length=n_steps)
        return toks.T, state  # [B, n_steps]

    def generate(
        self,
        prompt_tokens,
        max_new_tokens: int = 128,
        seed: int = 0,
        sampler: SamplerConfig | None = None,
        stop_at_eos: bool = True,
        on_token=None,
        chunk: int = 16,
    ):
        scfg = sampler or SamplerConfig(greedy=True)
        prompt = np.asarray(prompt_tokens, np.int32)
        n = len(prompt)
        # exact-length prefill: a padded recurrence would corrupt the state,
        # so the prompt program is compiled per pad bucket and fed the exact
        # tokens with validity via n_valid (state runs over the full bucket —
        # pad tokens are id 0; to keep the state exact the prompt is chunked
        # at its true length instead)
        self.state = self._mk_state(self.cfg, self.batch)
        # run the prompt in exact-length chunks of bucketed sizes to bound
        # the number of compiled programs while never padding the recurrence
        consumed = 0
        logits = None
        while consumed < n:
            take = n - consumed
            # largest power-of-two-ish bucket not exceeding the remainder,
            # except the final chunk which runs at its exact (bucketed) length
            t = min(take, 64)
            if take > 64:
                t = 64
            seg = prompt[consumed : consumed + t]
            toks = jnp.asarray(np.tile(seg[None, :], (self.batch, 1)).astype(np.int32))
            logits, self.state = self._prefill_c(
                self.params, self.state, toks,
                jnp.full((self.batch,), len(seg), jnp.int32), t=len(seg),
            )
            consumed += t

        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        tok = sample(logits, sub, scfg)
        out = [int(np.asarray(tok)[0])]
        if on_token:
            on_token(out[0])
        while len(out) < max_new_tokens and not (stop_at_eos and out[-1] == self.eos_id):
            steps = min(chunk, max_new_tokens - len(out))
            key, sub = jax.random.split(key)
            toks, self.state = self._decode_c(
                self.params, self.state, tok, sub, scfg, n_steps=steps,
            )
            arr = np.asarray(toks)[0]
            tok = toks[:, -1]
            for tk in arr:
                out.append(int(tk))
                if on_token:
                    on_token(int(tk))
                if (stop_at_eos and out[-1] == self.eos_id) or len(out) >= max_new_tokens:
                    break
        stats = {"n_tokens": len(out)}
        return out, stats
