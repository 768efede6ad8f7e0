"""Lookahead decoding (model-free speculation via Jacobi iteration n-grams).

Re-design of the reference's examples/lookahead/lookahead.cpp (484 LoC): the
reference builds a (W + G + 1)-sequence llama_batch per step, relies on
KV-cell seq_id sharing for the lookahead mask, and runs the verification /
Jacobi bookkeeping on the host. Here the whole lookahead step — the batched
forward over [input ⊕ G verification n-grams ⊕ the W×(N-1) lookahead grid]
with the lookahead visibility mask (lmsys lookahead-decoding blog; mask
diagram at lookahead.cpp:180-200), greedy verification walk, and accepted-row
KV compaction — is ONE jitted XLA program over the tag-based cache. Only the
n-gram pool (a vocab-indexed ring buffer, lookahead.cpp:21-36) and the Jacobi
window update (lookahead.cpp:350-377) stay on the host: they are O(W·N)
integer ops between steps.

Like every speculation engine here, output is token-identical to plain greedy
decoding — the pool only changes speed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import llama_forward
from .kvcache import KVCache
from .tree import _compact_kv


class _Layout:
    """Static row layout of one lookahead step's batch.

    Row order (lookahead.cpp:208-258): input token, then G×(N-1) verification
    rows (gram g, token j at row 1 + g(N-1) + j), then level-0 columns 1..W-1,
    then levels 1..N-2 × columns 0..W-1."""

    def __init__(self, W: int, N: int, G: int):
        if N < 3 or W < 2 or G < 1:
            raise ValueError(
                f"lookahead needs N >= 3, W >= 2, G >= 1 (got W={W}, N={N}, G={G})"
            )
        self.W, self.N, self.G = W, N, G
        self.v_rows = 1 + G * (N - 1)
        self.T = self.v_rows + (W - 1) + (N - 2) * W

        pos_off = np.zeros(self.T, np.int32)
        vis = np.eye(self.T, dtype=bool)
        vis[:, 0] = True  # the input token is visible to every row
        for g in range(G):
            for j in range(N - 1):
                r = 1 + g * (N - 1) + j
                pos_off[r] = j + 1
                for j2 in range(j):
                    vis[r, 1 + g * (N - 1) + j2] = True
        self.a0 = lambda i: self.v_rows + (i - 1)  # level-0 column i (1..W-1)
        self.aj = lambda j, i: self.v_rows + (W - 1) + (j - 1) * W + i
        for i in range(1, W):
            r = self.a0(i)
            pos_off[r] = i
            for i2 in range(1, i):
                vis[r, self.a0(i2)] = True
        for j in range(1, N - 1):
            for i in range(W):
                r = self.aj(j, i)
                pos_off[r] = j + i
                for i2 in range(1, i + 1):
                    vis[r, self.a0(i2)] = True
                for j2 in range(1, j):
                    vis[r, self.aj(j2, i)] = True
        self.pos_off = pos_off
        self.visible = vis
        self.gram_row0 = 1  # rows of gram g start at 1 + g*(N-1)
        self.lastlvl_rows = np.asarray(
            [self.aj(N - 2, i) for i in range(W)], np.int32
        )
        # verification row of gram g, token index j (0-based within the gram)
        self.gram_rows = np.asarray(
            [[1 + g * (N - 1) + j for j in range(N - 1)] for g in range(G)],
            np.int32,
        )


class LookaheadStep(NamedTuple):
    kv: KVCache
    tokens: jax.Array  # [B, N] accepted candidates (col 0 always real)
    n_out: jax.Array  # [B] = 1 + grams-accepted
    lastlvl: jax.Array  # [B, W] greedy samples from the deepest level


class LookaheadEngine:
    """Single-sequence lookahead decoding (W window, N gram size, G pool).

    Defaults follow lookahead.cpp:47-49 scaled for the batch row budget."""

    def __init__(
        self,
        params: dict[str, Any],
        cfg: ModelConfig,
        *,
        W: int = 8,
        N: int = 4,
        G: int = 8,
        max_seq: int = 2048,
        kv_dtype=jnp.bfloat16,
        compute_dtype=jnp.bfloat16,
        backend: str | None = None,
        eos_id: int = 2,
    ):
        self.params = params
        self.cfg = cfg
        self.lay = _Layout(W, N, G)
        self.max_seq = max_seq
        self.compute_dtype = compute_dtype
        self.backend = backend
        self.eos_id = eos_id
        self.kv_dtype = kv_dtype
        self.batch = 1
        self._vis = jnp.asarray(self.lay.visible)
        self._pos_off = jnp.asarray(self.lay.pos_off)
        self._gram_rows = jnp.asarray(self.lay.gram_rows)
        self._lastlvl_rows = jnp.asarray(self.lay.lastlvl_rows)
        self._step_c = jax.jit(self._step, donate_argnames=("kv",))

    def fresh_kv(self) -> KVCache:
        return KVCache.create(
            self.cfg.n_layers, 1, self.max_seq, self.cfg.n_kv_heads,
            self.cfg.head_dim, self.kv_dtype,
        )

    # ------------------------------------------------------------------

    def _step(
        self,
        params,
        kv: KVCache,
        cur: jax.Array,  # [B] input token
        tokens_j: jax.Array,  # [N-1, W] Jacobi window
        gram_tokens: jax.Array,  # [G, N-1] verification grams (suffixes)
        g_active: jax.Array,  # [G] bool
        n_past: jax.Array,  # [B]
    ) -> LookaheadStep:
        lay = self.lay
        W, N, G, T = lay.W, lay.N, lay.G, lay.T
        b = 1
        b_idx = jnp.arange(b)

        # ---- assemble the step's token row ----
        toks = jnp.zeros((T,), jnp.int32)
        toks = toks.at[0].set(cur[0])
        toks = toks.at[self._gram_rows.reshape(-1)].set(gram_tokens.reshape(-1))
        l0 = jnp.asarray([lay.a0(i) for i in range(1, W)], jnp.int32)
        toks = toks.at[l0].set(tokens_j[0, 1:])
        for j in range(1, N - 1):
            rows_j = jnp.asarray([lay.aj(j, i) for i in range(W)], jnp.int32)
            toks = toks.at[rows_j].set(tokens_j[j])
        toks = toks[None, :]  # [B, T]

        positions = n_past[:, None] + self._pos_off[None, :]
        slot_base = self.max_seq - T
        slots = slot_base + jnp.arange(T, dtype=jnp.int32)[None, :]

        # rows of inactive grams get invalid tags (they still write K/V into
        # scratch, but are invisible and the scratch is wiped afterwards)
        row_ok = jnp.ones((T,), bool)
        row_ok = row_ok.at[self._gram_rows.reshape(-1)].set(
            jnp.repeat(g_active, N - 1)
        )
        kv = kv.with_tags(slots, positions, valid=row_ok[None, :])

        # ---- lookahead mask: committed prefix ∪ static window visibility ----
        s_iota = jnp.arange(kv.max_seq, dtype=jnp.int32)[None, :]
        committed = (kv.slot_pos >= 0) & (s_iota < slot_base)
        mask = committed[:, None, :] & (
            kv.slot_pos[:, None, :] <= positions[:, :, None]
        )  # [B, T, S]
        win = self._vis & row_ok[None, :]  # [T, T] columns of inactive rows off
        mask = mask.at[:, :, slot_base:].set(win[None])

        out = llama_forward(
            params, self.cfg, toks, positions, kv, slots, mask,
            backend=self.backend, compute_dtype=self.compute_dtype,
            slots_contiguous=True,
        )
        logits = out.logits[0]  # [T, V]

        # ---- greedy verification walk (lookahead.cpp:265-311) ----
        id1 = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
        ids = [id1]
        src_rows = [jnp.asarray(0, jnp.int32)]
        active = g_active & (gram_tokens[:, 0] == id1)
        n_acc = jnp.zeros((), jnp.int32)
        for v in range(1, N):
            any_hit = active.any()
            g_star = jnp.argmax(active)
            row = self._gram_rows[g_star, v - 1]
            idv = jnp.argmax(logits[row], axis=-1).astype(jnp.int32)
            ids.append(jnp.where(any_hit, idv, 0))
            src_rows.append(jnp.where(any_hit, row, 0))
            n_acc = n_acc + any_hit.astype(jnp.int32)
            if v < N - 1:
                active = active & (gram_tokens[:, v] == idv)
            else:
                active = jnp.zeros_like(active)

        out_tokens = jnp.stack(ids)[None, :]  # [B, N]
        n_out = (n_acc + 1)[None]

        # ---- compact accepted rows into committed slots, wipe the window ----
        src = (slot_base + jnp.stack(src_rows))[None, :]  # [B, N]
        col = jnp.arange(N, dtype=jnp.int32)[None, :]
        dst = n_past[:, None] + col
        keep = col <= n_acc[None, None]
        new_kv = _compact_kv(out.kv, src, dst, keep[0][None])
        new_kv = dataclasses.replace(
            new_kv, slot_pos=new_kv.slot_pos.at[:, slot_base:].set(-1)
        )

        lastlvl = jnp.argmax(logits[self._lastlvl_rows], axis=-1).astype(jnp.int32)
        return LookaheadStep(
            kv=new_kv, tokens=out_tokens, n_out=n_out, lastlvl=lastlvl[None, :]
        )

    # ------------------------------------------------------------------

    def generate(
        self,
        prompt_tokens,
        max_new_tokens: int = 128,
        stop_at_eos: bool = True,
        on_token=None,
        seed: int = 0,  # accepted for engine-API parity; greedy decode ignores it
    ) -> tuple[list[int], dict]:
        """Greedy lookahead generation; returns (tokens, stats)."""
        from .generate import pad_bucket
        from .kvcache import causal_mask_from_tags

        lay = self.lay
        W, N, G = lay.W, lay.N, lay.G
        prompt = np.asarray(prompt_tokens, np.int32)
        n = len(prompt)
        kv = self.fresh_kv()

        # prefill (same padded-bucket program shape as Generator)
        t = pad_bucket(n)
        padded = np.zeros((1, t), np.int32)
        padded[0, :n] = prompt

        @jax.jit
        def prefill(params, kv, tokens, n_valid):
            positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (1, 1))
            valid = positions < n_valid[:, None]
            kv = kv.with_tags(positions, positions, valid=valid)
            mask = causal_mask_from_tags(kv.slot_pos, positions)
            o = llama_forward(
                params, self.cfg, tokens, positions, kv, positions, mask,
                backend=self.backend, compute_dtype=self.compute_dtype,
            )
            return o.logits[jnp.arange(1), n_valid - 1], o.kv

        logits0, kv = prefill(self.params, kv, jnp.asarray(padded), jnp.asarray([n], np.int32))
        cur = int(np.argmax(np.asarray(logits0)[0]))
        out = [cur]
        if on_token:
            on_token(cur)

        # host state: Jacobi window + n-gram pool (lookahead.cpp:125-152)
        rng = np.random.default_rng(0)
        tokens_j = np.empty((N - 1, W), np.int32)
        for j in range(N - 1):
            # reference inits with 100+i (lookahead.cpp:139); sampling the
            # prompt is the other documented option — use prompt tokens, they
            # converge faster for repetitive text
            tokens_j[j] = prompt[rng.integers(0, n, size=W)] if n > 0 else 100 + np.arange(W)
        pool_cnt = np.zeros(self.cfg.vocab_size, np.int32)
        pool_head = np.zeros(self.cfg.vocab_size, np.int32)
        pool = np.zeros((self.cfg.vocab_size, G, N - 1), np.int32)

        n_past = n
        n_predict = 1
        n_accept = 0
        n_steps = 0
        while n_predict < max_new_tokens and not (stop_at_eos and out[-1] == self.eos_id):
            if n_past + N + 1 >= self.max_seq - lay.T:
                break
            # active verification grams for `cur` from the pool
            g_cur = int(pool_cnt[cur])
            gram_tokens = pool[cur].copy()
            g_active = np.zeros(G, bool)
            g_active[:g_cur] = True

            res = self._step_c(
                self.params, kv, jnp.asarray([cur], jnp.int32),
                jnp.asarray(tokens_j), jnp.asarray(gram_tokens),
                jnp.asarray(g_active), jnp.asarray([n_past], jnp.int32),
            )
            kv = res.kv
            toks = np.asarray(res.tokens)[0]
            k = int(np.asarray(res.n_out)[0])
            lastlvl = np.asarray(res.lastlvl)[0]
            n_steps += 1
            n_accept += k - 1

            # per accepted token: emit + Jacobi shift + pool update
            # (lookahead.cpp:350-430)
            for v in range(k):
                tok = int(toks[v])
                out.append(tok)
                n_predict += 1
                n_past += 1
                if on_token:
                    on_token(tok)
                if (stop_at_eos and tok == self.eos_id) or n_predict >= max_new_tokens:
                    break
                tokens_j_prev = tokens_j[0].copy()
                tokens_j[:-1] = tokens_j[1:]
                tokens_j[-1] = lastlvl if v == 0 else tokens_j[0]
                if v == 0:
                    for f in range(W):
                        ft = int(tokens_j_prev[f])
                        ngram = tokens_j[:, f]
                        existing = pool[ft, : pool_cnt[ft]]
                        if (existing == ngram).all(axis=1).any():
                            continue
                        head = pool_head[ft]
                        pool[ft, head] = ngram
                        pool_cnt[ft] = min(G, pool_cnt[ft] + 1)
                        pool_head[ft] = (head + 1) % G
            cur = out[-1]

        stats = {
            "n_steps": n_steps,
            "n_predict": n_predict,
            "n_accept": n_accept,
            "tokens_per_step": n_predict / max(1, n_steps),
        }
        return out, stats
