"""EAGLE tree speculative decoding: token-tree drafting + single-pass
tree-attention verification + paged rollback by tag rewrite.

The reference never got tree drafting working with the EAGLE head — its tree
example (examples/speculative/speculative-eagle.cpp) replays upstream
multi-sequence speculation where "tree attention" happens implicitly via
KV-cell seq_id sharing, costing duplicated KV entries and host-side branch
bookkeeping. Here the tree is explicit and static (XLA-friendly):

  - a fixed-topology tree (branching factors per level) drafted level-by-level
    with the EAGLE head — each level is ONE draft forward over all nodes of
    that level, attending to {committed prefix} ∪ {its ancestor chain} via an
    ancestor mask;
  - ONE target forward verifies the whole tree (root token + all nodes) with
    the same ancestor-mask attention — the "single tree-mask verify pass" the
    north star asks for;
  - greedy path acceptance walks the tree on device;
  - accepted nodes' K/V rows are compacted into contiguous slots (gather by
    node index), everything else is invalidated by tag rewrite — no data
    movement for rejected branches.

Whole cycle = one jitted XLA program; no host round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.eagle import eagle_forward
from ..models.llama import llama_forward
from .kvcache import KVCache
from .sampling import SamplerConfig
from .speculative import CycleOutput, EagleChainEngine, SpecState


class TreeSpec:
    """Static tree topology. Node 0 is the root (the cycle's input token);
    speculative nodes are numbered level by level."""

    def __init__(self, branching: tuple[int, ...] = (4, 2, 2)):
        self.branching = tuple(branching)
        parents = [-1]  # root
        depth = [0]
        level_nodes: list[list[int]] = [[0]]
        for d, b in enumerate(self.branching):
            new_level = []
            for p in level_nodes[d]:
                for _ in range(b):
                    new_level.append(len(parents))
                    parents.append(p)
                    depth.append(d + 1)
            level_nodes.append(new_level)
        self.parent = np.asarray(parents, np.int32)
        self.depth = np.asarray(depth, np.int32)
        self.n_nodes = len(parents)  # includes root
        self.levels = level_nodes  # node ids per level
        self.max_depth = len(self.branching)

        # ancestor[i, j] = node j is an ancestor of i, or i == j
        anc = np.eye(self.n_nodes, dtype=bool)
        for i in range(self.n_nodes):
            p = self.parent[i]
            while p >= 0:
                anc[i, p] = True
                p = self.parent[p]
        self.ancestor = anc

        # children[i] = list of child node ids (padded later as needed)
        self.children: list[list[int]] = [[] for _ in range(self.n_nodes)]
        for i in range(1, self.n_nodes):
            self.children[self.parent[i]].append(i)
        self.max_children = max((len(c) for c in self.children), default=0)
        self.child_mat = np.full((self.n_nodes, self.max_children), -1, np.int32)
        for i, cs in enumerate(self.children):
            self.child_mat[i, : len(cs)] = cs


def _tree_mask(
    slot_pos: jax.Array,  # [B, S] tags
    q_pos: jax.Array,  # [B, T] query rope positions
    base: jax.Array,  # [B] first node slot (slot of node 0)
    node_ids: jax.Array,  # [T] global node id of each query row
    ancestor: jax.Array,  # [N, N] bool
    n_nodes: int,
) -> jax.Array:
    """Visibility: committed slots by position tag (strictly before the node
    window) OR ancestor nodes inside the window."""
    b, s = slot_pos.shape
    s_iota = jnp.arange(s, dtype=jnp.int32)[None, :]  # [1, S]
    committed = (slot_pos >= 0) & (s_iota < base[:, None])  # [B, S]
    causal = committed[:, None, :] & (slot_pos[:, None, :] <= q_pos[:, :, None])

    rel = s_iota - base[:, None]  # [B, S] node index of each slot (if in window)
    in_win = (rel >= 0) & (rel < n_nodes)
    rel_c = jnp.clip(rel, 0, n_nodes - 1)
    # anc_rows: [T, N] — which nodes each query may see
    anc_rows = ancestor[node_ids]  # [T, N]
    tree_part = jnp.take_along_axis(
        jnp.broadcast_to(anc_rows[None], (b,) + anc_rows.shape),  # [B, T, N]
        jnp.broadcast_to(rel_c[:, None, :], (b, anc_rows.shape[0], s)),
        axis=2,
    ) & in_win[:, None, :]
    return causal | tree_part


class EagleTreeEngine(EagleChainEngine):
    """Tree-drafting variant; shares prefill/state with the chain engine."""

    def __init__(self, *args, tree: TreeSpec | None = None, **kwargs):
        kwargs.setdefault("n_draft", 0)
        super().__init__(*args, **kwargs)
        self.tree = tree or TreeSpec()
        self.K = self.tree.n_nodes  # slot-window size for generate()'s overflow check
        self._anc = jnp.asarray(self.tree.ancestor)
        self._depth = jnp.asarray(self.tree.depth)
        self._parent = jnp.asarray(self.tree.parent)
        self._cycle_c = jax.jit(
            self._tree_cycle, static_argnames=("kv_limit",), donate_argnames=("state",)
        )
        self._cycle_jit = lambda state, kv_limit=None: self._cycle_c(
            self.tp, self.dp, state, kv_limit=kv_limit
        )

    # ------------------------------------------------------------------

    def _tree_cycle(self, tp, dp, state: SpecState,
                    kv_limit: int | None = None) -> CycleOutput:
        tree = self.tree
        b = self.batch
        b_idx = jnp.arange(b)
        m = state.n_past
        N = tree.n_nodes
        D = self.tcfg.n_embd

        # node buffers
        node_tokens = jnp.zeros((b, N), jnp.int32).at[:, 0].set(state.last_token)
        node_feats = jnp.zeros((b, N, D), jnp.float32).at[:, 0].set(state.feature)

        dft_kv = state.dft_kv
        d_base = (m - 1)[:, None]  # draft slot of node 0

        # ---- 1. level-by-level tree drafting ----
        for d, level in enumerate(tree.levels[:-1]):
            ids = jnp.asarray(level, jnp.int32)
            toks = node_tokens[:, ids]  # [B, L]
            feats = node_feats[:, ids]
            pos = d_base + d  # [B, 1] rope position for this level
            pos = jnp.broadcast_to(pos, (b, len(level)))
            slots = d_base + ids[None, :]  # unique slot per node
            dft_kv = dft_kv.with_tags(slots, pos)
            mask = _tree_mask(dft_kv.slot_pos, pos, d_base[:, 0], ids, self._anc, N)
            out = eagle_forward(
                dp, tp, self.dcfg, toks, feats, pos, dft_kv, slots, mask,
                backend=self.draft_backend, compute_dtype=self.compute_dtype,
                kv_limit=kv_limit, slots_contiguous=True,
            )
            dft_kv = out.kv
            feat_out = self._pick_feature(out.feature, out.feature_pre)
            bfac = tree.branching[d]
            top = jax.lax.top_k(
                jax.nn.log_softmax(out.logits.astype(jnp.float32), axis=-1), bfac
            )  # values/idx [B, L, bfac]
            child_tokens = top[1].reshape(b, -1).astype(jnp.int32)
            child_ids = jnp.asarray(tree.levels[d + 1], jnp.int32)
            node_tokens = node_tokens.at[:, child_ids].set(child_tokens)
            # child feature = its parent's draft output feature
            parent_local = jnp.repeat(jnp.arange(len(level)), bfac)
            node_feats = node_feats.at[:, child_ids].set(feat_out[:, parent_local])

        # ---- 2. single tree-attention verify forward ----
        v_base = m[:, None]  # target slot of node 0
        all_ids = jnp.arange(N, dtype=jnp.int32)
        v_pos = v_base + self._depth[None, :]  # [B, N]
        v_slots = v_base + all_ids[None, :]
        tgt_kv = state.tgt_kv.with_tags(v_slots, v_pos)
        mask = _tree_mask(tgt_kv.slot_pos, v_pos, v_base[:, 0], all_ids, self._anc, N)
        tout = llama_forward(
            tp, self.tcfg, node_tokens, v_pos, tgt_kv, v_slots, mask,
            backend=self.backend, compute_dtype=self.compute_dtype,
            kv_limit=kv_limit, slots_contiguous=True,
        )
        # target decision per node: argmax (greedy) or one sampler-chain draw,
        # then exact-match against the node's children. For the tree engines
        # this sample-then-match IS the optimal stochastic acceptance: the
        # expansion is deterministic top-k, so the proposal at a node is a
        # fixed candidate set C, and any distribution-preserving scheme can
        # accept with probability at most P(x in C) = sum_{c in C} p(c) —
        # exactly what sampling x ~ p and matching achieves (the sequential
        # min(1, p/q)-with-residual walk over deterministic candidates
        # telescopes to the same probability). The chain engine's stochastic
        # gain (runtime/sampling.speculative_accept) comes from SAMPLING its
        # single proposal from q, an option a deterministic multi-candidate
        # tree has already spent on breadth.
        key, sub = jax.random.split(state.key)
        if self.scfg.greedy:
            t_argmax = jnp.argmax(tout.logits, axis=-1).astype(jnp.int32)  # [B, N]
        else:
            from .sampling import sample

            keys = jax.random.split(sub, N)
            t_argmax = jax.vmap(
                lambda l, k: sample(l, k, self.scfg), in_axes=(1, 0), out_axes=1
            )(tout.logits, keys)

        # ---- 3. greedy path acceptance walk (static depth loop) ----
        child_mat = jnp.asarray(self.tree.child_mat)  # [N, C]
        cur = jnp.zeros((b,), jnp.int32)  # current node (root)
        alive = jnp.ones((b,), bool)
        n_acc = jnp.zeros((b,), jnp.int32)
        # path_nodes[d] = accepted node at depth d (0 = root)
        path_nodes = [cur]
        for d in range(tree.max_depth):
            want = t_argmax[b_idx, cur]  # target's token after `cur`
            kids = child_mat[cur]  # [B, C]
            kid_toks = jnp.where(kids >= 0, node_tokens[b_idx[:, None], jnp.maximum(kids, 0)], -1)
            hit = kid_toks == want[:, None]  # [B, C]
            any_hit = hit.any(axis=1) & alive
            first_hit = jnp.argmax(hit, axis=1)
            nxt = jnp.where(any_hit, kids[b_idx, first_hit], cur)
            n_acc = n_acc + any_hit.astype(jnp.int32)
            alive = any_hit
            cur = nxt
            path_nodes.append(cur)
        path = jnp.stack(path_nodes, axis=1)  # [B, depth+1] node ids (clamped)

        new_m = m + n_acc + 1
        bonus = t_argmax[b_idx, cur]
        new_feature = self._pick_feature(tout.hidden, tout.hidden_pre)[b_idx, cur]

        # ---- 4. compact accepted path K/V into contiguous slots ----
        # target: node j sits at slot m + j; move path node at depth d -> slot m + d
        depth_iota = jnp.arange(tree.max_depth + 1, dtype=jnp.int32)[None, :]
        keep = depth_iota <= n_acc[:, None]  # [B, depth+1]
        src_t = v_base + path  # [B, depth+1] source slots
        dst_t = v_base + depth_iota
        tgt_kv = _compact_kv(tout.kv, src_t, dst_t, keep)
        # draft: node j at slot (m-1) + j; accepted pair for token at depth d -> slot m-1+d
        src_d = d_base + path
        dst_d = d_base + depth_iota
        dft_kv = _compact_kv(dft_kv, src_d, dst_d, keep)

        tgt_kv = tgt_kv.rollback(keep_below=new_m)
        dft_kv = dft_kv.rollback(keep_below=new_m - 1)

        # output tokens [B, depth+1]: path tokens for cols < n_acc, bonus at
        # col == n_acc, zero-padding beyond
        accepted_toks = node_tokens[b_idx[:, None], path[:, 1:]]  # [B, depth]
        col = jnp.arange(tree.max_depth + 1, dtype=jnp.int32)[None, :]
        out_tokens = jnp.where(
            col < n_acc[:, None],
            jnp.pad(accepted_toks, ((0, 0), (0, 1))),
            jnp.where(col == n_acc[:, None], bonus[:, None], 0),
        )

        new_state = SpecState(
            tgt_kv=tgt_kv, dft_kv=dft_kv, last_token=bonus,
            feature=new_feature, n_past=new_m, key=key,
        )
        return CycleOutput(
            state=new_state, tokens=out_tokens, n_out=n_acc + 1, n_accepted=n_acc
        )


def _compact_kv(kv: KVCache, src: jax.Array, dst: jax.Array, keep: jax.Array) -> KVCache:
    """Copy K/V rows src->dst per batch where keep; also move the position tags.

    src/dst/keep: [B, P]; per-row dst MUST be a contiguous run
    (dst[b, j] == dst[b, 0] + j — true for both engines: accepted depth d
    lands at base + d). That makes the data movement P dynamic-slice row
    reads + ONE dynamic_update_slice write per batch row per buffer — the
    TPU-fast path. The earlier generic put_along_axis scatter rewrote the
    whole [L,B,H,S,D] buffer through computed indices (measured 23.5 ms per
    buffer on v5e for a 7B cache — 40x the whole verify forward's share);
    this form moves only the P accepted rows (~4 MB).

    Rows with keep=False write back the dst slot's CURRENT content (identity),
    and all src rows are read before any write, so in-window permutation is
    safe. int8-KV scale planes move with their rows."""
    b, p = src.shape
    b_idx = jnp.arange(b)[:, None]

    def move(buf, per_slot: bool = False):
        # buf: [L, B, H, S, D] (or [L, B, H, S] scale planes)
        if buf is None:
            return None
        l, _, h = buf.shape[:3]
        tail = buf.shape[4:]  # (D,) or ()
        sizes = (l, 1, h, 1) + tail
        out = buf
        for bi in range(b):
            rows = [
                jax.lax.dynamic_slice(buf, (0, bi, 0, src[bi, j]) + (0,) * len(tail), sizes)
                for j in range(p)
            ]
            new = jnp.concatenate(rows, axis=3)  # [L,1,H,P,...]
            cur = jax.lax.dynamic_slice(
                buf, (0, bi, 0, dst[bi, 0]) + (0,) * len(tail),
                (l, 1, h, p) + tail,
            )
            kb = keep[bi].reshape((1, 1, 1, p) + (1,) * len(tail))
            new = jnp.where(kb, new, cur)
            out = jax.lax.dynamic_update_slice(
                out, new, (0, bi, 0, dst[bi, 0]) + (0,) * len(tail)
            )
        return out

    tag_rows = kv.slot_pos[b_idx, src]
    safe_dst = jnp.where(keep, dst, src)  # no-op tag writes for dropped rows
    tags = kv.slot_pos.at[b_idx, safe_dst].set(tag_rows)
    return dataclasses.replace(
        kv, k=move(kv.k), v=move(kv.v), slot_pos=tags,
        k_scale=move(kv.k_scale), v_scale=move(kv.v_scale),
    )
