"""EAGLE-2 dynamic draft trees: context-aware tree expansion + rerank.

EAGLE-1 (runtime/tree.py) drafts a FIXED tree topology — every cycle spends
its verify budget the same way regardless of how confident the draft is.
EAGLE-2 (Li et al., 2024, arXiv:2406.16858) grows the tree dynamically: the
draft's own token probabilities approximate acceptance rates, so each level
expands only the globally most probable nodes (beam search over cumulative
draft log-probs), and the verify pass reranks ALL drafted candidates and
submits only the top-N. Same verify cost, strictly better-aimed speculation.
The reference fork never had any working tree mode (its tree example replays
upstream multi-sequence speculation, examples/speculative/speculative-eagle
.cpp); this is a capability beyond it.

TPU shape discipline: beam width M, depth D and verify budget N are static;
the topology lives in DATA (parent pointers + ancestor bitmaps computed on
device), not in shapes. The whole cycle — D draft forwards, expansion top-ks,
rerank, one tree-mask verify, acceptance walk, KV compaction — is ONE jitted
program, like the chain/tree engines.

Candidate table layout (size W = 1 + D*M):
  global id 0            = root (the cycle's input token, already committed)
  global ids 1+(d-1)*M.. = the M beam nodes of level d (depth d), d = 1..D
Draft KV slot of node g = (m-1) + g; verify slot of selected row j = m + j.
Level-D nodes are drafted but never forwarded through the draft head (their
children are not needed), so a fully-accepted path leaves one untagged draft
slot behind — a masked hole the next cycles simply never attend (same
trade-off as the static tree engine; acceptance, not correctness, is at
stake since every emitted token is target-verified).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.eagle import eagle_forward
from ..models.llama import llama_forward
from .kvcache import causal_mask_from_tags
from .speculative import CycleOutput, EagleChainEngine, SpecState
from .tree import _compact_kv


def _window_tree_mask(
    slot_pos: jax.Array,  # [B, S] cache tags
    q_pos: jax.Array,  # [B, T] query rope positions
    base: jax.Array,  # [B] slot of window element 0
    vis: jax.Array,  # [B, T, W] within-window visibility (ancestor bitmaps)
) -> jax.Array:
    """Committed slots (tagged, strictly below the window) ∪ window slots the
    per-row bitmap allows. The dynamic-topology counterpart of tree._tree_mask
    (there the ancestor matrix is static; here it is data)."""
    b, s = slot_pos.shape
    w = vis.shape[-1]
    s_iota = jnp.arange(s, dtype=jnp.int32)[None, :]
    committed = (slot_pos >= 0) & (s_iota < base[:, None])  # [B, S]
    causal = committed[:, None, :] & (slot_pos[:, None, :] <= q_pos[:, :, None])
    rel = s_iota - base[:, None]  # [B, S]
    in_win = (rel >= 0) & (rel < w)
    rel_c = jnp.clip(rel, 0, w - 1)
    win = jnp.take_along_axis(
        vis, jnp.broadcast_to(rel_c[:, None, :], (b, vis.shape[1], s)), axis=2
    ) & in_win[:, None, :]
    return causal | win


class EagleTree2Engine(EagleChainEngine):
    """EAGLE-2 beam-expanded, reranked tree speculation.

    beam:     nodes expanded per level (M; paper's "top-K" expansion)
    depth:    draft tree depth (D levels below the root)
    n_verify: candidate rows submitted to the single verify forward (N,
              root included; N <= 1 + D*beam). The paper's "total tokens".
    """

    def __init__(self, *args, beam: int = 8, depth: int = 6,
                 n_verify: int = 32, **kwargs):
        kwargs.setdefault("n_draft", 0)
        super().__init__(*args, **kwargs)
        self.M, self.D = int(beam), int(depth)
        self.W = 1 + self.D * self.M
        self.N = min(int(n_verify), self.W)
        assert self.M >= 1 and self.D >= 1 and self.N >= 2
        #: static depth of each candidate-table entry
        self._depth_t = jnp.asarray(
            [0] + [d + 1 for d in range(self.D) for _ in range(self.M)], jnp.int32
        )
        # generate()'s window-overflow margin: both the draft window (W slots
        # from m-1) and the verify window (N slots from m) must fit
        self.K = self.W
        self._cycle_c = jax.jit(
            self._tree2_cycle, static_argnames=("kv_limit",),
            donate_argnames=("state",),
        )
        self._cycle_jit = lambda state, kv_limit=None: self._cycle_c(
            self.tp, self.dp, state, kv_limit=kv_limit
        )

        # multi-cycle dispatch over the TREE cycle (generate()'s
        # cycles_per_dispatch; see EagleChainEngine._multi_cycle)
        def _tree2_multi(tp, dp, state, n_cycles: int, kv_limit=None):
            import jax as _jax

            def body(st, _):
                r = self._tree2_cycle(tp, dp, st, kv_limit=kv_limit)
                return r.state, (r.tokens, r.n_out, r.n_accepted)

            st, (toks, n_out, n_acc) = _jax.lax.scan(
                body, state, None, length=n_cycles)
            from .speculative import CycleOutput

            return CycleOutput(st, toks, n_out, n_acc)

        self._multi_c = jax.jit(
            _tree2_multi, static_argnames=("n_cycles", "kv_limit"),
            donate_argnames=("state",),
        )
        self._multi_jit = lambda state, n_cycles, kv_limit=None: self._multi_c(
            self.tp, self.dp, state, n_cycles=n_cycles, kv_limit=kv_limit
        )

    # ------------------------------------------------------------------

    def _tree2_cycle(self, tp, dp, state: SpecState,
                     kv_limit: int | None = None) -> CycleOutput:
        b, M, D, W, N = self.batch, self.M, self.D, self.W, self.N
        b_idx = jnp.arange(b)
        m = state.n_past
        db = m - 1  # [B] draft slot of the root pair

        # candidate table
        cand_tok = jnp.zeros((b, W), jnp.int32).at[:, 0].set(state.last_token)
        cand_par = jnp.full((b, W), -1, jnp.int32)
        cand_score = jnp.full((b, W), -jnp.inf, jnp.float32).at[:, 0].set(0.0)
        # ancestor-or-self bitmaps, row per candidate (built as levels land)
        anc = jnp.zeros((b, W, W), bool).at[:, 0, 0].set(True)

        # ---- level 0: forward the root pair, seed the beam ----
        dft_kv = state.dft_kv.with_tags(db[:, None], db[:, None])
        mask0 = causal_mask_from_tags(dft_kv.slot_pos, db[:, None])
        out = eagle_forward(
            dp, tp, self.dcfg, state.last_token[:, None], state.feature[:, None],
            db[:, None], dft_kv, db[:, None], mask0, backend=self.draft_backend,
            compute_dtype=self.compute_dtype, kv_limit=kv_limit,
            slots_contiguous=True,
        )
        dft_kv = out.kv
        root_feat = self._pick_feature(out.feature, out.feature_pre)[:, 0]
        logp = jax.nn.log_softmax(out.logits[:, 0].astype(jnp.float32), axis=-1)
        # expansion top-k over the vocab: approx_max_k is TPU-native (~5x
        # cheaper than the full-sort lowering of top_k); a missed near-tie
        # only changes WHICH candidates get drafted — acceptance stays exact
        bscore, btok = jax.lax.approx_max_k(logp, M, recall_target=0.95)
        btok = btok.astype(jnp.int32)
        bpar = jnp.zeros((b, M), jnp.int32)  # all level-1 parents are the root
        bfeat = jnp.broadcast_to(root_feat[:, None], (b, M, root_feat.shape[-1]))

        # ---- levels 1..D: record the beam; forward + expand while d < D ----
        for d in range(1, D + 1):
            gids = jnp.arange(1 + (d - 1) * M, 1 + d * M, dtype=jnp.int32)
            cand_tok = cand_tok.at[:, gids].set(btok)
            cand_par = cand_par.at[:, gids].set(bpar)
            cand_score = cand_score.at[:, gids].set(bscore)
            # child bitmap = parent's bitmap ∪ {self}
            rows = jnp.take_along_axis(
                anc, bpar[:, :, None].astype(jnp.int32), axis=1
            )  # [B, M, W] parent rows (parents are already in the table)
            rows = rows | (jnp.arange(W)[None, None, :] == gids[None, :, None])
            anc = anc.at[:, gids, :].set(rows)
            if d == D:
                break  # last level is drafted, not expanded further

            pos = (db + d)[:, None]  # rope position of every level-d node
            pos = jnp.broadcast_to(pos, (b, M))
            slots = db[:, None] + gids[None, :]
            dft_kv = dft_kv.with_tags(slots, pos)
            mask = _window_tree_mask(dft_kv.slot_pos, pos, db, rows)
            out = eagle_forward(
                dp, tp, self.dcfg, btok, bfeat, pos, dft_kv, slots, mask,
                backend=self.draft_backend, compute_dtype=self.compute_dtype,
                kv_limit=kv_limit, slots_contiguous=True,
            )
            dft_kv = out.kv
            feat_out = self._pick_feature(out.feature, out.feature_pre)
            logp = jax.nn.log_softmax(out.logits.astype(jnp.float32), axis=-1)
            cvals, cidx = jax.lax.approx_max_k(logp, M, recall_target=0.95)
            cidx = cidx.astype(jnp.int32)  # [B, M, M] per-node children
            flat_scores = (bscore[:, :, None] + cvals).reshape(b, M * M)
            bscore, flat = jax.lax.top_k(flat_scores, M)  # global best M
            prow = flat // M  # beam row of each chosen child's parent
            btok = jnp.take_along_axis(cidx.reshape(b, M * M), flat, axis=1)
            bpar = jnp.take_along_axis(gids[None, :].repeat(b, 0), prow, axis=1)
            bfeat = jnp.take_along_axis(
                feat_out, prow[:, :, None].astype(jnp.int32), axis=1
            )

        # ---- rerank: top-N candidates by cumulative score ----
        # strict eps-per-depth tie-break keeps every selection ancestor-closed
        # (parent score >= child score already, since log-probs are <= 0)
        sel_score = cand_score - 1e-6 * self._depth_t[None, :].astype(jnp.float32)
        _, sidx = jax.lax.top_k(sel_score, N)
        sel = jnp.sort(sidx, axis=1)  # level order; row 0 is always the root

        # ---- single tree-mask verify forward over the selected rows ----
        v_base = m
        vt = jnp.take_along_axis(cand_tok, sel, axis=1)  # [B, N]
        v_pos = v_base[:, None] + self._depth_t[sel]
        v_slots = v_base[:, None] + jnp.arange(N, dtype=jnp.int32)[None, :]
        # within-window visibility between selected rows: anc[sel_q, sel_k]
        rows = jnp.take_along_axis(anc, sel[:, :, None].astype(jnp.int32), axis=1)
        vis = jnp.take_along_axis(
            rows, jnp.broadcast_to(sel[:, None, :], (b, N, N)).astype(jnp.int32), axis=2
        )  # [B, N, N]
        tgt_kv = state.tgt_kv.with_tags(v_slots, v_pos)
        mask = _window_tree_mask(tgt_kv.slot_pos, v_pos, v_base, vis)
        tout = llama_forward(
            tp, self.tcfg, vt, v_pos, tgt_kv, v_slots, mask,
            backend=self.backend, compute_dtype=self.compute_dtype,
            kv_limit=kv_limit, slots_contiguous=True,
        )
        key, sub = jax.random.split(state.key)
        if self.scfg.greedy:
            t_true = jnp.argmax(tout.logits, axis=-1).astype(jnp.int32)  # [B, N]
        else:
            from .sampling import sample

            keys = jax.random.split(sub, N)
            t_true = jax.vmap(
                lambda l, k: sample(l, k, self.scfg), in_axes=(1, 0), out_axes=1
            )(tout.logits, keys)

        # ---- acceptance walk over the dynamic topology ----
        sel_par = jnp.take_along_axis(cand_par, sel, axis=1)  # [B, N] global ids
        cur = jnp.zeros((b,), jnp.int32)  # verify-row index, starts at root
        alive = jnp.ones((b,), bool)
        n_acc = jnp.zeros((b,), jnp.int32)
        path = [cur]
        for _ in range(D):
            want = t_true[b_idx, cur]
            glob_cur = sel[b_idx, cur]
            hit = (sel_par == glob_cur[:, None]) & (vt == want[:, None])  # [B, N]
            any_hit = hit.any(axis=1) & alive
            first = jnp.argmax(hit, axis=1)
            cur = jnp.where(any_hit, first, cur)
            n_acc = n_acc + any_hit.astype(jnp.int32)
            alive = any_hit
            path.append(cur)
        path = jnp.stack(path, axis=1)  # [B, D+1] verify-row indices

        new_m = m + n_acc + 1
        bonus = t_true[b_idx, cur]
        new_feature = self._pick_feature(tout.hidden, tout.hidden_pre)[b_idx, cur]

        # ---- compact accepted rows into contiguous slots ----
        depth_iota = jnp.arange(D + 1, dtype=jnp.int32)[None, :]
        keep = depth_iota <= n_acc[:, None]
        tgt_kv2 = _compact_kv(
            tout.kv, v_base[:, None] + path, v_base[:, None] + depth_iota, keep
        )
        path_glob = jnp.take_along_axis(sel, path, axis=1)  # global ids
        dft_kv = _compact_kv(
            dft_kv, db[:, None] + path_glob, db[:, None] + depth_iota, keep
        )
        tgt_kv2 = tgt_kv2.rollback(keep_below=new_m)
        dft_kv = dft_kv.rollback(keep_below=new_m - 1)

        accepted_toks = jnp.take_along_axis(vt, path[:, 1:], axis=1)  # [B, D]
        col = jnp.arange(D + 1, dtype=jnp.int32)[None, :]
        out_tokens = jnp.where(
            col < n_acc[:, None],
            jnp.pad(accepted_toks, ((0, 0), (0, 1))),
            jnp.where(col == n_acc[:, None], bonus[:, None], 0),
        )
        new_state = SpecState(
            tgt_kv=tgt_kv2, dft_kv=dft_kv, last_token=bonus,
            feature=new_feature, n_past=new_m, key=key,
        )
        return CycleOutput(
            state=new_state, tokens=out_tokens, n_out=n_acc + 1, n_accepted=n_acc
        )
