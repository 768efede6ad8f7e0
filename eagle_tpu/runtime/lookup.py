"""Prompt-lookup / n-gram speculative decoding (no draft model).

The reference ships two model-free speculation tools: llama-lookup (n-gram
cache, common/ngram-cache.cpp) and the simpler prompt-lookup idea. Drafts are
proposed on the host from n-gram matches against the already-generated
context, then verified by the target in one forward — the verification,
acceptance and KV rollback run as a single jitted step (same machinery as the
EAGLE chain engine, minus the draft head)."""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import llama_forward
from .generate import pad_bucket
from .kvcache import KVCache, causal_mask_from_tags


class NgramCache:
    """Token-sequence n-gram statistics (common/ngram-cache.h analogue)."""

    def __init__(self, n_min: int = 2, n_max: int = 3):
        self.n_min, self.n_max = n_min, n_max
        self.table: dict[tuple, dict[int, int]] = defaultdict(lambda: defaultdict(int))

    def update(self, tokens: list[int]):
        for n in range(self.n_min, self.n_max + 1):
            for i in range(len(tokens) - n):
                key = tuple(tokens[i : i + n])
                self.table[key][tokens[i + n]] += 1

    def draft(self, context: list[int], k: int) -> list[int]:
        out: list[int] = []
        ctx = list(context)
        for _ in range(k):
            best = None
            for n in range(self.n_max, self.n_min - 1, -1):
                key = tuple(ctx[-n:])
                cand = self.table.get(key)
                if cand:
                    best = max(cand.items(), key=lambda kv: kv[1])[0]
                    break
            if best is None:
                break
            out.append(best)
            ctx.append(best)
        return out


def prompt_lookup_draft(context: list[int], k: int, ngram: int = 2) -> list[int]:
    """Prompt-lookup: find the latest earlier occurrence of the trailing
    `ngram` and copy what followed it."""
    if len(context) <= ngram:
        return []
    tail = tuple(context[-ngram:])
    for start in range(len(context) - ngram - 1, -1, -1):
        if tuple(context[start : start + ngram]) == tail:
            cont = context[start + ngram : start + ngram + k]
            if cont:
                return list(cont)
    return []


class LookupEngine:
    """Target-only speculative decoding with host-proposed drafts."""

    def __init__(
        self,
        params: dict[str, Any],
        cfg: ModelConfig,
        *,
        n_draft: int = 8,
        max_seq: int = 2048,
        kv_dtype=jnp.bfloat16,
        compute_dtype=jnp.bfloat16,
        backend: str | None = None,
        eos_id: int = 2,
        use_ngram_cache: bool = True,
    ):
        self.params, self.cfg = params, cfg
        self.K = n_draft
        self.max_seq = max_seq
        self.eos_id = eos_id
        self.compute_dtype = compute_dtype
        self.backend = backend
        self.kv_dtype = kv_dtype
        self.ngram = NgramCache() if use_ngram_cache else None

        self._prefill_jit = jax.jit(self._prefill, static_argnames=("t",))
        self._verify_jit = jax.jit(self._verify, donate_argnames=("kv",))

    def _prefill(self, params, kv, tokens, n_valid, t: int):
        b = tokens.shape[0]
        positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
        valid = positions < n_valid[:, None]
        kv = kv.with_tags(positions, positions, valid=valid)
        mask = causal_mask_from_tags(kv.slot_pos, positions)
        out = llama_forward(
            params, self.cfg, tokens, positions, kv, positions, mask,
            backend=self.backend, compute_dtype=self.compute_dtype,
        )
        first = jnp.argmax(out.logits[jnp.arange(b), n_valid - 1], axis=-1)
        return first.astype(jnp.int32), out.kv

    def _verify(self, params, kv, v_tokens, drafts, m):
        """v_tokens [B, K+1] = [last] + drafts; greedy accept; rollback."""
        b, kp1 = v_tokens.shape
        b_idx = jnp.arange(b)
        v_pos = m[:, None] + jnp.arange(kp1, dtype=jnp.int32)[None, :]
        kv = kv.with_tags(v_pos, v_pos)
        mask = causal_mask_from_tags(kv.slot_pos, v_pos)
        out = llama_forward(
            params, self.cfg, v_tokens, v_pos, kv, v_pos, mask,
            backend=self.backend, compute_dtype=self.compute_dtype,
        )
        t_true = jnp.argmax(out.logits, axis=-1).astype(jnp.int32)
        match = drafts == t_true[:, : kp1 - 1]
        n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        new_m = m + n_acc + 1
        kv = out.kv.rollback(keep_below=new_m)
        return t_true, n_acc, kv, t_true[b_idx, n_acc]

    def generate(self, prompt_tokens, max_new_tokens: int = 128, stop_at_eos: bool = True):
        prompt = [int(x) for x in prompt_tokens]
        n = len(prompt)
        t = pad_bucket(n)
        padded = np.zeros((1, t), np.int32)
        padded[0, :n] = prompt
        kv = KVCache.create(
            self.cfg.n_layers, 1, self.max_seq, self.cfg.n_kv_heads,
            self.cfg.head_dim, self.kv_dtype,
        )
        tok, kv = self._prefill_jit(
            self.params, kv, jnp.asarray(padded), jnp.asarray([n], np.int32), t=t
        )
        if self.ngram:
            self.ngram.update(prompt)
        context = prompt + [int(tok[0])]
        out = [int(tok[0])]
        m = n
        stats = {"n_cycles": 0, "n_drafted": 0, "n_accepted": 0}
        while len(out) < max_new_tokens and not (stop_at_eos and out[-1] == self.eos_id):
            if m + self.K + 2 >= self.max_seq:
                break
            drafts = prompt_lookup_draft(context, self.K)
            if self.ngram and len(drafts) < self.K:
                drafts += self.ngram.draft(context + drafts, self.K - len(drafts))
            drafts = (drafts + [0] * self.K)[: self.K]
            v = np.asarray([[out[-1] if len(out) else 0] + drafts], np.int32)
            v[0, 0] = context[-1]
            t_true, n_acc, kv, nxt = self._verify_jit(
                self.params, kv, jnp.asarray(v), jnp.asarray([drafts], np.int32),
                jnp.asarray([m], np.int32),
            )
            na = int(n_acc[0])
            emitted = np.asarray(t_true)[0][: na + 1].tolist()
            stats["n_cycles"] += 1
            stats["n_drafted"] += self.K
            stats["n_accepted"] += na
            for tk in emitted:
                out.append(int(tk))
                context.append(int(tk))
                if self.ngram:
                    self.ngram.update(context[-5:])
                if (stop_at_eos and tk == self.eos_id) or len(out) >= max_new_tokens:
                    break
            m = m + na + 1
        stats["accept_rate"] = stats["n_accepted"] / max(1, stats["n_drafted"])
        stats["mean_accept_len"] = (stats["n_accepted"] + stats["n_cycles"]) / max(
            1, stats["n_cycles"]
        )
        return out, stats
