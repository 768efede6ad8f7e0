"""Sharding rules for llama/eagle params and runtime state.

Megatron-style tensor parallelism over the "model" mesh axis:
  - q/k/v and ffn gate/up projections: column-parallel (output features
    sharded -> attention heads land sharded, no comms inside attention)
  - o and ffn down projections: row-parallel (input features sharded -> XLA
    emits a psum/reduce-scatter after the matmul)
  - lm_head: column-parallel over vocab (logit reductions/argmax handled by
    GSPMD)
  - embeddings, norms, the EAGLE fusion FC and draft head: replicated (the
    north star keeps the small draft head replicated per host)
  - KV cache: kv-heads sharded on "model", batch on "data".

Weights use QTensor layout "kn" (q [L, K, N]); specs shard the same logical
axes of q/scale/bias consistently."""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.qtensor import QTensor
from .mesh import DATA_AXIS, MODEL_AXIS


def _qspec(col_or_row: str, stacked: bool) -> dict[str, P]:
    """PartitionSpecs for a QTensor's (q, scale, bias) in 'kn' layout."""
    lead = (None,) if stacked else ()
    if col_or_row == "col":  # shard N (last axis)
        s = P(*lead, None, MODEL_AXIS)
    else:  # shard K (first non-lead axis)
        s = P(*lead, MODEL_AXIS, None)
    return {"q": s, "scale": s, "bias": s}


def _apply_qspec(t, spec_kind: str, stacked: bool):
    if isinstance(t, QTensor):
        sp = _qspec(spec_kind, stacked)
        return QTensorSpec(sp["q"], sp["scale"], sp["bias"])
    # dense [.., N, K] ("nk" numpy convention) — shard logical N
    lead = (None,) if stacked else ()
    if spec_kind == "col":
        return P(*lead, MODEL_AXIS, None)
    return P(*lead, None, MODEL_AXIS)


class QTensorSpec:
    """Pytree-shaped container of PartitionSpecs mirroring a QTensor.

    `sup`/`sup_min` (the coded-scale per-256 super-scales of the packed+coded
    SERVING layout) default to the `scale` spec: they share scale's logical
    axes ([.., K/256, N] vs [.., K/G, N]), so the same PartitionSpec shards
    them consistently. Row-sharded (K-sharded) coded tensors therefore need
    K/256 divisible by the model-axis size."""

    def __init__(self, q, scale, bias, sup=None, sup_min=None):
        self.q, self.scale, self.bias = q, scale, bias
        self.sup = scale if sup is None else sup
        self.sup_min = scale if sup_min is None else sup_min


_LAYER_KIND = {
    "wq": "col",
    "wk": "col",
    "wv": "col",
    "wqkv": "col",
    "wo": "row",
    "w_gate": "col",
    "w_up": "col",
    "w_gate_up": "col",
    "w_down": "row",
}


#: MoE expert tensors [L, E, ...]: the EXPERT axis shards over "model" —
#: each device computes its local experts in the all-expert einsum and the
#: router-weighted combine contracts the sharded axis, so GSPMD inserts ONE
#: psum per MoE layer (the expert-parallelism story, SURVEY §2.4)
_EXPERT_SHARDED = {"w_gate_exps", "w_up_exps", "w_down_exps"}


def llama_param_specs(params: dict[str, Any]) -> dict[str, Any]:
    """Build a params-shaped pytree of PartitionSpecs."""
    layer_specs = {}
    for name, t in params["layers"].items():
        if name in _LAYER_KIND:
            layer_specs[name] = _apply_qspec(t, _LAYER_KIND[name], stacked=True)
        elif name in _EXPERT_SHARDED:  # [L, E, F, D] dense expert stacks
            layer_specs[name] = P(None, MODEL_AXIS, None, None)
        else:  # norms [L, D] / router [L, E, D] / shared experts: replicated
            layer_specs[name] = P(None, None)
    specs: dict[str, Any] = {
        "tok_embd": P(None, None)
        if not isinstance(params["tok_embd"], QTensor)
        else QTensorSpec(P(None, None), P(None, None), P(None, None)),
        "layers": layer_specs,
        "output_norm": P(None),
    }
    out = params.get("output")
    if out is params.get("tok_embd"):
        specs["output"] = specs["tok_embd"]
    elif isinstance(out, QTensor):
        specs["output"] = QTensorSpec(*[P(None, MODEL_AXIS)] * 3)  # kn: shard vocab
    elif out is not None:
        specs["output"] = P(MODEL_AXIS, None)  # dense [V, D]
    return specs


def eagle_param_specs(params: dict[str, Any]) -> dict[str, Any]:
    """EAGLE draft head: replicated everywhere (it is tiny and latency-bound)."""

    def rep(t):
        if isinstance(t, QTensor):
            return QTensorSpec(
                P(*(None,) * t.q.ndim),
                P(*(None,) * t.scale.ndim),
                None if t.bias is None else P(*(None,) * t.bias.ndim),
            )
        return P(*(None,) * t.ndim)

    return jax.tree_util.tree_map(
        rep, params, is_leaf=lambda x: isinstance(x, QTensor)
    )


def kv_cache_specs() -> dict[str, P]:
    return {
        "k": P(None, DATA_AXIS, MODEL_AXIS, None, None),
        "v": P(None, DATA_AXIS, MODEL_AXIS, None, None),
        "slot_pos": P(DATA_AXIS, None),
    }


def _spec_leaves(spec_tree):
    """Flatten a spec tree where QTensorSpec mirrors QTensor leaves."""
    return spec_tree


def shard_params(params, mesh: Mesh, specs) -> Any:
    """device_put every leaf with its NamedSharding (QTensor-aware)."""

    def put(t, s):
        if isinstance(t, QTensor):
            import dataclasses

            return dataclasses.replace(
                t,
                q=jax.device_put(t.q, NamedSharding(mesh, s.q)),
                scale=jax.device_put(t.scale, NamedSharding(mesh, s.scale)),
                bias=None
                if t.bias is None
                else jax.device_put(t.bias, NamedSharding(mesh, s.bias)),
                sup=None
                if t.sup is None
                else jax.device_put(t.sup, NamedSharding(mesh, s.sup)),
                sup_min=None
                if t.sup_min is None
                else jax.device_put(t.sup_min, NamedSharding(mesh, s.sup_min)),
            )
        return jax.device_put(t, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(
        put,
        params,
        specs,
        is_leaf=lambda x: isinstance(x, QTensor) or x is None,
    )
