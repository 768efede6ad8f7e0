"""GGUF -> device params pytree.

Replaces llama.cpp's load_tensors/llama_model_loader machinery
(src/llama-model.cpp, src/llama-model-loader.cpp): tensors are read from the
mmap'd GGUF, repacked to the TPU QTensor layout (quant/qtensor.py), un-permuted
where needed, stacked across layers (so the forward pass can lax.scan), and
device_put with the requested shardings.

Rope layout: GGUF llama q/k projections carry convert_hf_to_gguf.py:1596's
row permutation (adjacent-pair rope layout). We invert it at load so the
runtime uses half-split rope (ops/rope.py)."""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader, GGUFTensorInfo
from ..quant.qtensor import (
    CODED_TYPES,
    QTensor,
    REPACKABLE_TYPES,
    repack_coded_numpy,
    repack_numpy,
)

#: coded-scales load for k-quant matmul weights (the bit-exact serving mode,
#: BENCHMARKS.md); EAGLE_TPU_CODED_LOAD=0 reverts to materialized products
_CODED_LOAD = os.environ.get("EAGLE_TPU_CODED_LOAD", "1") not in ("0", "false")
from .config import ModelConfig

LayerKeyMap = {
    # our name -> GGUF tensor suffix (canonical names: src/llama-arch.cpp tables)
    "attn_norm": "attn_norm.weight",
    "wq": "attn_q.weight",
    "wk": "attn_k.weight",
    "wv": "attn_v.weight",
    "wo": "attn_output.weight",
    "ffn_norm": "ffn_norm.weight",
    "w_gate": "ffn_gate.weight",
    "w_up": "ffn_up.weight",
    "w_down": "ffn_down.weight",
}


def unpermute_rows(n_rows: int, n_heads: int, rope_dim: int | None = None) -> np.ndarray:
    """Row index map inverting convert_hf_to_gguf LlamaModel.permute
    (convert_hf_to_gguf.py:1596: reshape(h, 2, d/2).swapaxes(1,2), i.e. GGUF
    row 2j+m = HF row m*d/2 + j — pair-interleaved for ggml's NORM rope).
    The inverse gather is reshape(d/2, 2).T: HF row i = GGUF row inv[i].

    This same gather converts pair-interleaved rotary rows (ggml NORM rope /
    HF interleaved models like cohere/glm) to the runtime's half-split
    layout. `rope_dim` < head_rows restricts the map to the first rope_dim
    rows of each head — partial rotary stored interleaved (chatglm's
    head_dim/2 rotary; build_chatglm ropes n_rot dims in NORM style).

    (The round-1 implementation built the FORWARD map here — an involution
    only at head_dim 4, so writer∘loader round-trips masked it; real
    reference-converted GGUFs would have loaded with scrambled rope pairs.)"""
    head_rows = n_rows // n_heads
    rd = head_rows if rope_dim is None or rope_dim <= 0 else min(rope_dim, head_rows)
    within = np.arange(head_rows)
    within[:rd] = np.arange(rd).reshape(rd // 2, 2).T.reshape(-1)
    return (np.arange(n_heads)[:, None] * head_rows + within[None, :]).reshape(-1)


def _load_tensor(
    reader: GGUFReader,
    name: str,
    row_perm: np.ndarray | None = None,
    dense_dtype=jnp.float32,
    layout: str = "nk",
) -> QTensor | np.ndarray:
    """Load one tensor: QTensor for quantized types, numpy float for dense.

    layout="kn" stores matmul weights K-major (TPU kernel layout); the row
    permutation (logical N axis) is applied before the transpose."""
    info: GGUFTensorInfo = reader.tensors[name]
    data = reader.tensor_bytes(name)
    if (
        layout == "kn"
        and info.ggml_type in CODED_TYPES
        and len(info.shape) == 2
        and info.shape[-1] % 256 == 0
        and _CODED_LOAD
    ):
        # k-quant matmul weights keep their super-block factorization ON-CHIP
        # (sub-scale CODES + f32 per-256 super-scales): the bit-exact serving
        # layout — same f32 d*sc products as ggml, computed in-kernel, at
        # ~half the scale-stream bytes (EAGLE_TPU_CODED_LOAD=0 reverts to
        # materialized f32 products)
        q, sc, mc, group, sup, supmin = repack_coded_numpy(
            data, info.ggml_type, info.shape
        )
        if row_perm is not None:
            q, sc, sup = q[row_perm], sc[row_perm], sup[row_perm]
            mc = mc[row_perm] if mc is not None else None
            supmin = supmin[row_perm] if supmin is not None else None
        t = lambda x: None if x is None else np.ascontiguousarray(x.T)
        return QTensor(
            q=t(q), scale=t(sc), bias=t(mc), group=group,
            ggml_type=int(info.ggml_type), layout="kn",
            sup=t(sup), sup_min=t(supmin),
        )
    if info.ggml_type in REPACKABLE_TYPES and len(info.shape) == 2:
        q, scale, bias, group = repack_numpy(data, info.ggml_type, info.shape)
        if row_perm is not None:
            q, scale = q[row_perm], scale[row_perm]
            bias = bias[row_perm] if bias is not None else None
        if layout == "kn":
            q, scale = np.ascontiguousarray(q.T), np.ascontiguousarray(scale.T)
            bias = None if bias is None else np.ascontiguousarray(bias.T)
        return QTensor(
            q=q, scale=scale, bias=bias, group=group, ggml_type=int(info.ggml_type),
            layout=layout,
        )
    w = reader.tensor_f32(name)
    if row_perm is not None:
        w = w[row_perm]
    return w.astype(np.dtype(dense_dtype)) if dense_dtype != jnp.float32 else w


def _stack(items: list[QTensor | np.ndarray]):
    if isinstance(items[0], QTensor):
        first = items[0]
        return QTensor(
            q=np.stack([t.q for t in items]),
            scale=np.stack([t.scale for t in items]),
            bias=None if first.bias is None else np.stack([t.bias for t in items]),
            group=first.group,
            ggml_type=first.ggml_type,
            layout=first.layout,
            sup=None if first.sup is None else np.stack([t.sup for t in items]),
            sup_min=None if first.sup_min is None
            else np.stack([t.sup_min for t in items]),
        )
    return np.stack(items)


def _device_put_tree(tree, put: Callable):
    return jax.tree_util.tree_map(lambda x: put(x), tree)


def fuse_layer_weights(stacked: dict[str, Any]) -> dict[str, Any]:
    """Fuse qkv and gate+up projections along N (single MXU dispatch each)."""
    from ..quant.qtensor import concat_qtensors

    out = dict(stacked)
    if "wq" in out and "wk" in out:  # fused-qkv GGUFs / MLA have no wk/wv
        out["wqkv"] = concat_qtensors([out.pop("wq"), out.pop("wk"), out.pop("wv")])
    if "w_gate" in out:  # MoE layers have expert tensors instead; no-gate
        out["w_gate_up"] = concat_qtensors([out.pop("w_gate"), out.pop("w_up")])
        if "b_gate" in out:  # jais gated-FFN biases fuse along with them
            import numpy as _np

            out["b_gate_up"] = _np.concatenate(
                [out.pop("b_gate"), out.pop("b_up")], axis=-1
            )
    return out


def _mla_rope_perm(n_heads: int, head_dim: int, rope_dim: int, lead: int) -> np.ndarray:
    """Row map for deepseek2's NORM-rope sub-slices: within each head (or the
    single MQA k_pe slice), the trailing `rope_dim` rows move from the GGUF's
    pair-interleaved order to the runtime's half-split order; the leading
    `lead` rows (nope dims / kv_lora) pass through."""
    within_rope = unpermute_rows(rope_dim, 1)
    per_head = np.concatenate([np.arange(lead), lead + within_rope])
    stride = lead + rope_dim
    return (np.arange(n_heads)[:, None] * stride + per_head[None, :]).reshape(-1)


def load_deepseek2_params(
    reader: GGUFReader,
    cfg: ModelConfig,
    device_put: Callable | None = None,
    fuse: bool = True,
) -> tuple[dict[str, Any], ModelConfig, dict[str, Any]]:
    """deepseek2 (MLA + leading-dense MoE, build_deepseek2): per-layer tensors
    split into two structural groups — the first `leading_dense_block_count`
    layers carry a plain gated FFN, the rest carry router + experts (+ shared
    expert). Attention rope rows (q per-head tail, kv_a_mqa tail) un-permute
    from the NORM (pair-interleaved) layout like llama q/k rows."""
    nope = cfg.head_dim - cfg.rope_dim
    from .config import PERMUTED_ROPE_ARCHS

    if cfg.arch in PERMUTED_ROPE_ARCHS:  # deepseek2 (NORM rope)
        q_perm = _mla_rope_perm(cfg.n_heads, cfg.head_dim, cfg.rope_dim, nope)
        kv_a_perm = _mla_rope_perm(1, 0, cfg.rope_dim, cfg.kv_lora_rank)
    else:  # minicpm3 (NEOX rope — rows already half-split)
        q_perm = kv_a_perm = None

    attn_map = {
        "attn_norm": "attn_norm.weight",
        "wkv_a": "attn_kv_a_mqa.weight",
        "wkv_b": "attn_kv_b.weight",
        "wo": "attn_output.weight",
        "ffn_norm": "ffn_norm.weight",
    }
    if cfg.q_lora_rank:
        attn_map.update(wq_a="attn_q_a.weight", wq_b="attn_q_b.weight")
    else:
        attn_map["wq"] = "attn_q.weight"
    dense_map = {**attn_map, "w_gate": "ffn_gate.weight", "w_up": "ffn_up.weight",
                 "w_down": "ffn_down.weight"}
    # minicpm3 is dense-only MLA: every layer carries the plain gated FFN
    nd0 = cfg.n_dense_layers
    if f"blk.{nd0}.ffn_gate_exps.weight" not in reader.tensors:
        moe_map = dict(dense_map)
    else:
        moe_map = dict(attn_map)

    def load_group(idx: list[int], key_map) -> dict[str, Any]:
        group: dict[str, list] = {k: [] for k in key_map}
        for i in idx:
            for ours, suffix in key_map.items():
                perm = (
                    q_perm if ours in ("wq", "wq_b")
                    else kv_a_perm if ours == "wkv_a" else None
                )
                group[ours].append(
                    _load_tensor(reader, f"blk.{i}.{suffix}", row_perm=perm, layout="kn")
                )
            for ours, name in (
                ("kv_a_norm", f"blk.{i}.attn_kv_a_norm.weight"),
                ("q_a_norm", f"blk.{i}.attn_q_a_norm.weight"),
                ("ffn_gate_inp", f"blk.{i}.ffn_gate_inp.weight"),
                ("w_gate_exps", f"blk.{i}.ffn_gate_exps.weight"),
                ("w_up_exps", f"blk.{i}.ffn_up_exps.weight"),
                ("w_down_exps", f"blk.{i}.ffn_down_exps.weight"),
                ("w_gate_shexp", f"blk.{i}.ffn_gate_shexp.weight"),
                ("w_up_shexp", f"blk.{i}.ffn_up_shexp.weight"),
                ("w_down_shexp", f"blk.{i}.ffn_down_shexp.weight"),
            ):
                if name in reader.tensors:
                    group.setdefault(ours, []).append(reader.tensor_f32(name))
        stacked = {k: _stack(v) for k, v in group.items()}
        return fuse_layer_weights(stacked) if fuse else stacked

    nd = cfg.n_dense_layers
    params: dict[str, Any] = {
        "tok_embd": _load_tensor(reader, "token_embd.weight"),
        "layers": load_group(list(range(nd, cfg.n_layers)), moe_map),
        "output_norm": _load_tensor(reader, "output_norm.weight"),
    }
    if nd:
        params["layers_dense"] = load_group(list(range(nd)), dense_map)
    if "output.weight" in reader.tensors:
        params["output"] = _load_tensor(reader, "output.weight", layout="kn")
    else:
        params["output"] = params["tok_embd"]
    put = device_put if device_put is not None else jnp.asarray
    return _device_put_tree(params, put), cfg, reader.metadata


def load_hetero_params(
    reader: GGUFReader,
    cfg: ModelConfig,
    device_put: Callable | None = None,
) -> tuple[dict[str, Any], ModelConfig, dict[str, Any]]:
    """openelm / deci: per-layer head counts and FFN widths (NAS schedules)
    differ, so layers cannot share one stacked scan — each layer becomes its
    own single-entry group under params["hetero"] (build_openelm reads
    hparams.n_head(il); build_deci additionally has attention-free and
    linear-attention layers where q/k/v tensors are absent)."""
    from .config import PERMUTED_ROPE_ARCHS

    permuted = cfg.arch in PERMUTED_ROPE_ARCHS
    names = {
        "attn_norm": ("attn_norm.weight", None),
        "wqkv": ("attn_qkv.weight", "kn"),  # openelm fused
        "wq": ("attn_q.weight", "kn"),
        "wk": ("attn_k.weight", "kn"),
        "wv": ("attn_v.weight", "kn"),
        "wo": ("attn_output.weight", "kn"),
        "attn_q_norm": ("attn_q_norm.weight", None),
        "attn_k_norm": ("attn_k_norm.weight", None),
        "ffn_norm": ("ffn_norm.weight", None),
        "w_gate": ("ffn_gate.weight", "kn"),
        "w_up": ("ffn_up.weight", "kn"),
        "w_down": ("ffn_down.weight", "kn"),
    }
    hetero = []
    for i in range(cfg.n_layers):
        hc = cfg.head_counts[i] if cfg.head_counts else cfg.n_heads
        kvc = cfg.kv_head_counts[i] if cfg.kv_head_counts else cfg.n_kv_heads
        q_perm = (
            unpermute_rows(hc * cfg.head_dim, hc, cfg.rope_dim)
            if permuted and hc else None
        )
        k_perm = (
            unpermute_rows(kvc * cfg.head_dim, kvc, cfg.rope_dim)
            if permuted and kvc else None
        )
        lyr: dict[str, Any] = {}
        for ours, (suffix, layout) in names.items():
            name = f"blk.{i}.{suffix}"
            if name not in reader.tensors:
                continue
            perm = q_perm if ours == "wq" else k_perm if ours == "wk" else None
            lyr[ours] = _stack([
                _load_tensor(reader, name, row_perm=perm, layout=layout or "nk")
            ])
        hetero.append(lyr)

    params: dict[str, Any] = {
        "tok_embd": _load_tensor(reader, "token_embd.weight"),
        "hetero": hetero,
        "layers": {},  # scan path unused; kept for API uniformity
    }
    if "output_norm.weight" in reader.tensors:
        params["output_norm"] = _load_tensor(reader, "output_norm.weight")
    if "output.weight" in reader.tensors:
        params["output"] = _load_tensor(reader, "output.weight", layout="kn")
    else:
        params["output"] = params["tok_embd"]
    put = device_put if device_put is not None else jnp.asarray
    return _device_put_tree(params, put), cfg, reader.metadata


def load_deepseek1_params(
    reader: GGUFReader,
    cfg: ModelConfig,
    device_put: Callable | None = None,
    fuse: bool = True,
) -> tuple[dict[str, Any], ModelConfig, dict[str, Any]]:
    """deepseek v1 (build_deepseek): llama attention (permuted NORM-rope
    rows) + leading dense layers, then MoE layers with shared experts.
    Mirrors load_deepseek2_params' structural-group split."""
    q_perm = unpermute_rows(cfg.n_q_dim, cfg.n_heads, cfg.rope_dim)
    k_perm = unpermute_rows(cfg.n_kv_dim, cfg.n_kv_heads, cfg.rope_dim)

    attn_map = {
        "attn_norm": "attn_norm.weight",
        "wq": "attn_q.weight",
        "wk": "attn_k.weight",
        "wv": "attn_v.weight",
        "wo": "attn_output.weight",
        "ffn_norm": "ffn_norm.weight",
    }
    dense_map = {**attn_map, "w_gate": "ffn_gate.weight",
                 "w_up": "ffn_up.weight", "w_down": "ffn_down.weight"}

    def load_group(idx: list[int], key_map) -> dict[str, Any]:
        group: dict[str, list] = {k: [] for k in key_map}
        for i in idx:
            for ours, suffix in key_map.items():
                perm = q_perm if ours == "wq" else k_perm if ours == "wk" else None
                group[ours].append(
                    _load_tensor(reader, f"blk.{i}.{suffix}", row_perm=perm, layout="kn")
                )
            for ours, name in (
                ("ffn_gate_inp", f"blk.{i}.ffn_gate_inp.weight"),
                ("w_gate_exps", f"blk.{i}.ffn_gate_exps.weight"),
                ("w_up_exps", f"blk.{i}.ffn_up_exps.weight"),
                ("w_down_exps", f"blk.{i}.ffn_down_exps.weight"),
                ("w_gate_shexp", f"blk.{i}.ffn_gate_shexp.weight"),
                ("w_up_shexp", f"blk.{i}.ffn_up_shexp.weight"),
                ("w_down_shexp", f"blk.{i}.ffn_down_shexp.weight"),
            ):
                if name in reader.tensors:
                    group.setdefault(ours, []).append(reader.tensor_f32(name))
        stacked = {k: _stack(v) for k, v in group.items()}
        return fuse_layer_weights(stacked) if fuse else stacked

    nd = cfg.n_dense_layers
    params: dict[str, Any] = {
        "tok_embd": _load_tensor(reader, "token_embd.weight"),
        "layers": load_group(list(range(nd, cfg.n_layers)), dict(attn_map)),
        "output_norm": _load_tensor(reader, "output_norm.weight"),
    }
    if nd:
        params["layers_dense"] = load_group(list(range(nd)), dense_map)
    if "output.weight" in reader.tensors:
        params["output"] = _load_tensor(reader, "output.weight", layout="kn")
    else:
        params["output"] = params["tok_embd"]
    put = device_put if device_put is not None else jnp.asarray
    return _device_put_tree(params, put), cfg, reader.metadata


def load_t5_params(
    reader: GGUFReader,
    cfg: ModelConfig,
    device_put: Callable | None = None,
) -> tuple[dict[str, Any], ModelConfig, dict[str, Any]]:
    """t5 / t5encoder (LLM_ARCH_T5 tensor table, llama-arch.cpp:1056):
    enc.blk.* / dec.blk.* stacks, shared rel-bias table from block 0, tied
    head unless output.weight exists."""

    def load_stack(prefix: str, cross: bool) -> dict[str, Any]:
        key_map = {
            "attn_norm": "attn_norm.weight",
            "wq": "attn_q.weight", "wk": "attn_k.weight",
            "wv": "attn_v.weight", "wo": "attn_o.weight",
            "ffn_norm": "ffn_norm.weight",
            "w_up": "ffn_up.weight", "w_down": "ffn_down.weight",
        }
        if f"{prefix}.blk.0.ffn_gate.weight" in reader.tensors:
            key_map["w_gate"] = "ffn_gate.weight"  # flan-t5 gated-gelu
        if cross:
            key_map.update(
                cross_norm="cross_attn_norm.weight",
                cross_q="cross_attn_q.weight", cross_k="cross_attn_k.weight",
                cross_v="cross_attn_v.weight", cross_o="cross_attn_o.weight",
            )
        layers: dict[str, list] = {k: [] for k in key_map}
        for i in range(cfg.n_layers):
            for ours, suffix in key_map.items():
                layers[ours].append(
                    _load_tensor(reader, f"{prefix}.blk.{i}.{suffix}", layout="kn")
                )
        return {
            "layers": {k: _stack(v) for k, v in layers.items()},
            "rel_b": reader.tensor_f32(f"{prefix}.blk.0.attn_rel_b.weight"),
            "output_norm": reader.tensor_f32(f"{prefix}.output_norm.weight"),
        }

    params: dict[str, Any] = {
        "tok_embd": _load_tensor(reader, "token_embd.weight"),
        "enc": load_stack("enc", cross=False),
    }
    if cfg.arch == "t5":
        params["dec"] = load_stack("dec", cross=True)
    if "output.weight" in reader.tensors:
        params["output"] = _load_tensor(reader, "output.weight", layout="kn")
        params["tied_head"] = False
    else:
        params["output"] = params["tok_embd"]
        params["tied_head"] = True
    put = device_put if device_put is not None else jnp.asarray
    out = _device_put_tree(
        {k: v for k, v in params.items() if k != "tied_head"}, put
    )
    out["tied_head"] = params["tied_head"]
    return out, cfg, reader.metadata


def load_rwkv6_params(
    reader: GGUFReader,
    cfg: ModelConfig,
    device_put: Callable | None = None,
) -> tuple[dict[str, Any], ModelConfig, dict[str, Any]]:
    """RWKV6 / rwkv6qwen2 (LLM_ARCH_RWKV6 tensor table, llama-arch.cpp:1161).
    Large projections stay quantized (QTensor, kn layout); the tiny lora /
    lerp / decay tensors load dense f32 in their written [out, in] shapes."""
    L = cfg.n_layers
    d = cfg.n_embd

    big = {  # 2-D projections consumed via qmatmul_layer
        "tm_k": "time_mix_key.weight",
        "tm_v": "time_mix_value.weight",
        "tm_r": "time_mix_receptance.weight",
        "tm_g": "time_mix_gate.weight",
        "tm_out": "time_mix_output.weight",
    }
    if f"blk.0.channel_mix_key.weight" in reader.tensors:
        big.update(cm_k="channel_mix_key.weight", cm_v="channel_mix_value.weight",
                   cm_r="channel_mix_receptance.weight")
    else:  # rwkv6qwen2: qwen2 gated FFN instead of channel mix
        big.update(w_gate="ffn_gate.weight", w_up="ffn_up.weight",
                   w_down="ffn_down.weight")

    small = {  # dense tensors, shapes normalized below
        "attn_norm": "attn_norm.weight",
        "tm_lerp_x": "time_mix_lerp_x.weight",
        "tm_w1": "time_mix_w1.weight",
        "tm_w2": "time_mix_w2.weight",
        "tm_decay_w0": "time_mix_decay.weight",
        "tm_decay_w1": "time_mix_decay_w1.weight",
        "tm_decay_w2": "time_mix_decay_w2.weight",
    }
    optional_small = {
        "attn_norm_b": "attn_norm.bias",
        "ffn_norm": "attn_norm_2.weight" if cfg.arch == "rwkv6" else "ffn_norm.weight",
        "ffn_norm_b": "attn_norm_2.bias",
        "tm_first": "time_mix_first.weight",
        "tm_ln": "time_mix_ln.weight",
        "tm_ln_b": "time_mix_ln.bias",
        "cm_lerp_k": "channel_mix_lerp_k.weight",
        "cm_lerp_r": "channel_mix_lerp_r.weight",
        "tm_r_b": "time_mix_receptance.bias",
        "tm_k_b": "time_mix_key.bias",
        "tm_v_b": "time_mix_value.bias",
    }

    layers: dict[str, list] = {}
    for i in range(L):
        for ours, suffix in big.items():
            layers.setdefault(ours, []).append(
                _load_tensor(reader, f"blk.{i}.{suffix}", layout="kn")
            )
        for ours, suffix in small.items():
            layers.setdefault(ours, []).append(reader.tensor_f32(f"blk.{i}.{suffix}"))
        for ours, suffix in optional_small.items():
            name = f"blk.{i}.{suffix}"
            if name in reader.tensors:
                layers.setdefault(ours, []).append(reader.tensor_f32(name))
        # the reference converter fuses the five lerp vectors; accept both
        if f"blk.{i}.time_mix_lerp_fused.weight" in reader.tensors:
            fused = reader.tensor_f32(f"blk.{i}.time_mix_lerp_fused.weight")
        else:
            fused = np.stack([
                reader.tensor_f32(f"blk.{i}.time_mix_lerp_{p}.weight").reshape(-1)
                for p in ("w", "k", "v", "r", "g")
            ])
        layers.setdefault("tm_lerp_fused", []).append(fused.reshape(5, d))

    ext = layers["tm_w1"][0].size // (5 * d)
    ext2 = layers["tm_decay_w1"][0].size // d
    for i in range(L):
        layers["tm_lerp_x"][i] = layers["tm_lerp_x"][i].reshape(d)
        layers["tm_w1"][i] = layers["tm_w1"][i].reshape(5 * ext, d)
        layers["tm_w2"][i] = layers["tm_w2"][i].reshape(5, d, ext)
        layers["tm_decay_w0"][i] = layers["tm_decay_w0"][i].reshape(d)
        layers["tm_decay_w1"][i] = layers["tm_decay_w1"][i].reshape(ext2, d)
        layers["tm_decay_w2"][i] = layers["tm_decay_w2"][i].reshape(d, ext2)
        if "tm_first" in layers:
            layers["tm_first"][i] = layers["tm_first"][i].reshape(
                d // cfg.wkv_head_size, cfg.wkv_head_size
            )
        for key in ("cm_lerp_k", "cm_lerp_r"):
            if key in layers:
                layers[key][i] = layers[key][i].reshape(d)

    params: dict[str, Any] = {
        "tok_embd": _load_tensor(reader, "token_embd.weight"),
        "layers": {k: _stack(v) for k, v in layers.items()},
    }
    if "token_embd_norm.weight" in reader.tensors:
        params["tok_norm"] = reader.tensor_f32("token_embd_norm.weight")
        if "token_embd_norm.bias" in reader.tensors:
            params["tok_norm_b"] = reader.tensor_f32("token_embd_norm.bias")
    params["output_norm"] = reader.tensor_f32("output_norm.weight")
    if "output_norm.bias" in reader.tensors:
        params["output_norm_b"] = reader.tensor_f32("output_norm.bias")
    if "output.weight" in reader.tensors:
        params["output"] = _load_tensor(reader, "output.weight", layout="kn")
    else:
        params["output"] = params["tok_embd"]
    put = device_put if device_put is not None else jnp.asarray
    return _device_put_tree(params, put), cfg, reader.metadata


def load_mamba_params(
    reader: GGUFReader,
    cfg: ModelConfig,
    device_put: Callable | None = None,
) -> tuple[dict[str, Any], ModelConfig, dict[str, Any]]:
    """Mamba GGUF (LLM_ARCH_MAMBA tensor table, llama-arch.cpp): per-layer
    attn_norm + ssm_{in,conv1d(+bias),x,dt(+bias),a,d,out}. Projection weights
    load as QTensors (kn layout) when quantized; A/D/conv/norms are dense.
    Layers stay as per-layer LISTS (the forward's layer loop is a static
    python loop — no stacked scan, recurrent state dominates anyway)."""
    names = {
        "attn_norm": ("attn_norm.weight", False),
        "ssm_in": ("ssm_in.weight", True),
        "ssm_conv1d": ("ssm_conv1d.weight", False),
        "ssm_conv1d_b": ("ssm_conv1d.bias", False),
        "ssm_x": ("ssm_x.weight", True),
        "ssm_dt": ("ssm_dt.weight", True),
        "ssm_dt_b": ("ssm_dt.bias", False),
        "ssm_a": ("ssm_a", False),
        "ssm_d": ("ssm_d", False),
        "ssm_out": ("ssm_out.weight", True),
    }
    layers: dict[str, list] = {k: [] for k in names}
    for i in range(cfg.n_layers):
        for ours, (suffix, mm) in names.items():
            w = _load_tensor(reader, f"blk.{i}.{suffix}", layout="kn" if mm else "nk")
            if ours == "ssm_conv1d" and not isinstance(w, np.ndarray):
                w = reader.tensor_f32(f"blk.{i}.{suffix}")
            layers[ours].append(w)
    # conv weight may arrive [di, dc] (our converter squeezes) or [di, 1, dc]
    # (HF Conv1d shape, written verbatim by the reference) — both collapse
    # row-major to [di, dc]; ssm_a likewise normalizes to [di, ds]
    layers["ssm_conv1d"] = [
        np.asarray(w, np.float32).reshape(cfg.ssm_d_inner, cfg.ssm_d_conv)
        for w in layers["ssm_conv1d"]
    ]
    layers["ssm_a"] = [
        np.asarray(w, np.float32).reshape(cfg.ssm_d_inner, cfg.ssm_d_state)
        for w in layers["ssm_a"]
    ]
    params: dict[str, Any] = {
        "tok_embd": _load_tensor(reader, "token_embd.weight"),
        "layers": layers,
        "output_norm": _load_tensor(reader, "output_norm.weight"),
    }
    if "output.weight" in reader.tensors:
        params["output"] = _load_tensor(reader, "output.weight", layout="kn")
    else:
        params["output"] = params["tok_embd"]
    put = device_put if device_put is not None else jnp.asarray
    params = _device_put_tree(params, put)
    return params, cfg, reader.metadata


def load_bert_params(
    reader: GGUFReader,
    cfg: ModelConfig,
    device_put: Callable | None = None,
) -> tuple[dict[str, Any], ModelConfig, dict[str, Any]]:
    """BERT-family encoder GGUF (LLM_ARCH_BERT/NOMIC_BERT/JINA_BERT_V2
    tables): token (+type, +position for plain bert) embeddings with an
    embedding LayerNorm, post-norm blocks (attn_output_norm /
    layer_output_norm). Variants differ by tensor presence: nomic fuses qkv
    without biases and gates the FFN; jina-v2 keeps split qkv+biases, gates
    the FFN (down bias only), and relies on ALiBi."""
    names = {
        "wq": ("attn_q.weight", "kn"), "bq": ("attn_q.bias", None),
        "wk": ("attn_k.weight", "kn"), "bk": ("attn_k.bias", None),
        "wv": ("attn_v.weight", "kn"), "bv": ("attn_v.bias", None),
        "wqkv": ("attn_qkv.weight", "kn"),  # nomic-bert fused, no bias
        "wo": ("attn_output.weight", "kn"), "bo": ("attn_output.bias", None),
        "attn_out_norm": ("attn_output_norm.weight", None),
        "attn_out_norm_b": ("attn_output_norm.bias", None),
        "w_gate": ("ffn_gate.weight", "kn"),  # nomic(silu)/jina(gelu) gated
        "w_up": ("ffn_up.weight", "kn"), "b_up": ("ffn_up.bias", None),
        "w_down": ("ffn_down.weight", "kn"), "b_down": ("ffn_down.bias", None),
        "layer_out_norm": ("layer_output_norm.weight", None),
        "layer_out_norm_b": ("layer_output_norm.bias", None),
    }
    layers: dict[str, list] = {}
    for i in range(cfg.n_layers):
        for ours, (suffix, layout) in names.items():
            name = f"blk.{i}.{suffix}"
            if name in reader.tensors:
                layers.setdefault(ours, []).append(
                    _load_tensor(reader, name, layout=layout or "nk")
                )
    params: dict[str, Any] = {
        "tok_embd": _load_tensor(reader, "token_embd.weight"),
        "tok_embd_norm": reader.tensor_f32("token_embd_norm.weight"),
        "tok_embd_norm_b": reader.tensor_f32("token_embd_norm.bias"),
        "layers": layers,
    }
    if "token_types.weight" in reader.tensors:
        params["token_types"] = reader.tensor_f32("token_types.weight").reshape(
            -1, cfg.n_embd
        )
    if "position_embd.weight" in reader.tensors:  # plain bert only
        params["pos_embd"] = reader.tensor_f32("position_embd.weight").reshape(
            -1, cfg.n_embd
        )
    put = device_put if device_put is not None else jnp.asarray
    return _device_put_tree(params, put), cfg, reader.metadata


def load_llama_params(
    path: str | Path,
    device_put: Callable | None = None,
    fuse: bool = True,
) -> tuple[dict[str, Any], ModelConfig, dict[str, Any]]:
    """Load a llama-architecture GGUF. Returns (params, config, metadata)."""
    reader = GGUFReader(path)
    cfg = ModelConfig.from_gguf_metadata(reader.metadata)
    if cfg.kv_lora_rank:
        return load_deepseek2_params(reader, cfg, device_put, fuse)
    if cfg.arch in ("t5", "t5encoder"):
        return load_t5_params(reader, cfg, device_put)
    if cfg.wkv_head_size:
        return load_rwkv6_params(reader, cfg, device_put)
    if cfg.is_recurrent:
        return load_mamba_params(reader, cfg, device_put)
    if cfg.arch in ("bert", "nomic-bert", "jina-bert-v2"):
        return load_bert_params(reader, cfg, device_put)

    from .config import PERMUTED_ROPE_ARCHS

    # only adjacent-pair-rope archs carry LlamaModel.permute'd q/k rows in
    # GGUF; NEOX-rope archs are already in the runtime's half-split layout
    permuted = cfg.arch in PERMUTED_ROPE_ARCHS
    q_perm = unpermute_rows(cfg.n_q_dim, cfg.n_heads, cfg.rope_dim) if permuted else None
    k_perm = unpermute_rows(cfg.n_kv_dim, cfg.n_kv_heads, cfg.rope_dim) if permuted else None
    # fused-qkv GGUFs of NORM-rope archs (chatglm): permute the q/k segments
    # of the fused rows, keep v
    qkv_perm = None
    if permuted:
        nq, nkv = cfg.n_q_dim, cfg.n_kv_dim
        qkv_perm = np.concatenate([q_perm, nq + k_perm, nq + nkv + np.arange(nkv)])

    if cfg.arch in ("openelm", "deci"):
        return load_hetero_params(reader, cfg, device_put)
    if cfg.arch == "deepseek" and cfg.n_dense_layers:
        # deepseek v1: llama attention but deepseek2-style leading-dense /
        # MoE structural groups (build_deepseek, n_layer_dense_lead)
        return load_deepseek1_params(reader, cfg, device_put, fuse)

    is_moe = "blk.0.ffn_gate_inp.weight" in reader.tensors
    # optional per-arch tensors (gemma2 sandwich norms; q/k norms; MoE router
    # + experts; qwen2moe shared expert)
    optional = {
        "post_attn_norm": "attn_post_norm.weight",
        "post_ffn_norm": "ffn_post_norm.weight",
        "attn_q_norm": "attn_q_norm.weight",
        "attn_k_norm": "attn_k_norm.weight",
        # chameleon: per-head LayerNorm q/k norms carry biases
        "attn_q_norm_b": "attn_q_norm.bias",
        "attn_k_norm_b": "attn_k_norm.bias",
        # jais: gated-FFN biases (gpt2-family archs use b_up/b_down only)
        "b_gate": "ffn_gate.bias",
        # bitnet: ternary-weight per-tensor scales + pre-projection sub-norms
        "attn_sub_norm": "attn_sub_norm.weight",
        "ffn_sub_norm": "ffn_sub_norm.weight",
        "wq_s": "attn_q.scale", "wk_s": "attn_k.scale", "wv_s": "attn_v.scale",
        "wo_s": "attn_output.scale",
        "w_gate_s": "ffn_gate.scale", "w_up_s": "ffn_up.scale",
        "w_down_s": "ffn_down.scale",
        # LayerNorm-family archs (gpt2/starcoder2/phi2/falcon): norm biases,
        # attention output bias, FFN biases (canonical names llama-arch.cpp)
        "attn_norm_b": "attn_norm.bias",
        "ffn_norm_b": "ffn_norm.bias",
        "bo": "attn_output.bias",
        "b_up": "ffn_up.bias",
        "b_down": "ffn_down.bias",
    }
    key_map = dict(LayerKeyMap)
    if f"blk.0.attn_qkv.weight" in reader.tensors:
        # pre-fused qkv projection (gpt2/gpt-neox/falcon GGUF layout)
        for k in ("wq", "wk", "wv"):
            key_map.pop(k)
        key_map["wqkv"] = "attn_qkv.weight"
    if is_moe and cfg.arch != "arctic":
        # arctic keeps its DENSE residual_mlp alongside the experts
        # (build_arctic) — everyone else replaces the dense FFN with them
        for k in ("w_gate", "w_up", "w_down"):
            key_map.pop(k)
    if is_moe:
        optional.update(
            ffn_norm_exps="ffn_norm_exps.weight",  # arctic residual-MoE norm
            ffn_gate_inp="ffn_gate_inp.weight",
            w_gate_exps="ffn_gate_exps.weight",
            w_up_exps="ffn_up_exps.weight",
            w_down_exps="ffn_down_exps.weight",
            # qwen2moe shared expert + its sigmoid gate
            ffn_gate_inp_shexp="ffn_gate_inp_shexp.weight",
            w_gate_shexp="ffn_gate_shexp.weight",
            w_up_shexp="ffn_up_shexp.weight",
            w_down_shexp="ffn_down_shexp.weight",
        )
    # norms may be absent per arch (olmo2 has no pre-norms; eagle no attn_norm;
    # command-r has no ffn_norm — one shared input norm; gpt2 has no gate)
    for opt_key in ("attn_norm", "ffn_norm", "w_gate"):
        if opt_key in key_map and f"blk.0.{key_map[opt_key]}" not in reader.tensors:
            optional[opt_key] = key_map.pop(opt_key)
    if cfg.arch == "dbrx":
        # dbrx's pre-FFN norm is named attn_output_norm (norm_2 of the
        # fused norm_attn_norm block — build_dbrx uses it as the MoE input
        # norm); route it into the runtime's ffn_norm slot
        optional["ffn_norm"] = "attn_output_norm.weight"
    if cfg.arch == "grok":
        # grok's post-attention / post-MoE norms live under the OUT_NORM
        # names (build_grok) — same positions as gemma2's sandwich norms
        optional["post_attn_norm"] = "attn_output_norm.weight"
        optional["post_ffn_norm"] = "layer_output_norm.weight"
    if cfg.arch == "chatglm" and "w_gate" not in key_map:
        # chatglm stores [gate;up] fused in ffn_up (LLM_FFN_SWIGLU splits the
        # projection in half — build_chatglm); load it straight into the
        # runtime's fused w_gate_up slot
        key_map["w_gate_up"] = key_map.pop("w_up")

    layers: dict[str, list] = {k: [] for k in key_map}
    for i in range(cfg.n_layers):
        for ours, suffix in key_map.items():
            name = f"blk.{i}.{suffix}"
            perm = (
                q_perm if ours == "wq" else k_perm if ours == "wk"
                else qkv_perm if ours == "wqkv" else None
            )
            layers[ours].append(_load_tensor(reader, name, row_perm=perm, layout="kn"))
        for ours, suffix in optional.items():
            name = f"blk.{i}.{suffix}"
            if name in reader.tensors:
                # router/experts load dense (expert weights are 3-D; MoE
                # quantized storage decodes to dense here). A FLAT q/k norm
                # (olmo2: one weight across all heads) follows its
                # projection's row order — permute along for permuted archs.
                w = reader.tensor_f32(name)
                if (permuted and ours in ("attn_q_norm", "attn_q_norm_b")
                        and w.size == cfg.n_q_dim):
                    w = w[q_perm]
                if (permuted and ours in ("attn_k_norm", "attn_k_norm_b")
                        and w.size == cfg.n_kv_dim):
                    w = w[k_perm]
                layers.setdefault(ours, []).append(w)

    # pre-fused qkv bias (gpt2/gpt-neox/chatglm layout)
    if f"blk.0.attn_qkv.bias" in reader.tensors:
        layers["bqkv"] = [
            reader.tensor_f32(f"blk.{i}.attn_qkv.bias")[
                qkv_perm if qkv_perm is not None else slice(None)
            ]
            for i in range(cfg.n_layers)
        ]
    # optional attention biases (qwen2 family)
    if f"blk.0.attn_q.bias" in reader.tensors:
        biases = []
        for i in range(cfg.n_layers):
            bq = reader.tensor_f32(f"blk.{i}.attn_q.bias")
            bk = reader.tensor_f32(f"blk.{i}.attn_k.bias")
            bv = reader.tensor_f32(f"blk.{i}.attn_v.bias")
            if permuted:
                bq, bk = bq[q_perm], bk[k_perm]
            biases.append(np.concatenate([bq, bk, bv]))
        layers["bqkv"] = [b for b in biases]

    stacked = {k: _stack(v) for k, v in layers.items()}
    if cfg.swin_norm:
        # chameleon swin mode: attn_norm/ffn_norm normalize the block OUTPUTS
        # (build_chameleon) — same positions as olmo2's post-norms
        stacked["post_attn_norm"] = stacked.pop("attn_norm")
        stacked["post_ffn_norm"] = stacked.pop("ffn_norm")
    if fuse:
        stacked = fuse_layer_weights(stacked)
    params: dict[str, Any] = {
        "tok_embd": _load_tensor(reader, "token_embd.weight"),
        "layers": stacked,
    }
    if "output_norm.weight" in reader.tensors:
        params["output_norm"] = _load_tensor(reader, "output_norm.weight")
    # else: non-parametric final norm (olmo) — llama_forward norms with None
    if "output_norm.bias" in reader.tensors:
        params["output_norm_b"] = reader.tensor_f32("output_norm.bias")
    if "rope_freqs.weight" in reader.tensors:
        # llama-3.1 / longrope per-frequency divisors (LLM_TENSOR_ROPE_FREQS)
        params["rope_factors"] = reader.tensor_f32("rope_freqs.weight")
    if "token_embd_norm.weight" in reader.tensors:  # bloom embedding LayerNorm
        params["tok_embd_norm"] = reader.tensor_f32("token_embd_norm.weight")
        if "token_embd_norm.bias" in reader.tensors:
            params["tok_embd_norm_b"] = reader.tensor_f32("token_embd_norm.bias")
    if "position_embd.weight" in reader.tensors:  # gpt2 learned positions
        params["pos_embd"] = reader.tensor_f32("position_embd.weight").reshape(
            -1, cfg.n_embd
        )
    if "output.weight" in reader.tensors:
        params["output"] = _load_tensor(reader, "output.weight", layout="kn")
    else:
        params["output"] = params["tok_embd"]  # tied embeddings (stays "nk")
    if "output.bias" in reader.tensors:  # phi2 lm_head bias
        params["output_b"] = reader.tensor_f32("output.bias")

    put = device_put if device_put is not None else jnp.asarray
    params = _device_put_tree(params, put)
    return params, cfg, reader.metadata


def load_eagle_params(
    path: str | Path,
    device_put: Callable | None = None,
) -> tuple[dict[str, Any], ModelConfig, dict[str, Any]]:
    """Load an EAGLE draft-head GGUF (LLM_ARCH_EAGLE tensor layout,
    src/llama-model.cpp:1589-1647): token_embd, fusion fc (+bias), one decoder
    layer WITHOUT attn_norm, no output_norm/output (borrowed from target)."""
    reader = GGUFReader(path)
    cfg = ModelConfig.from_gguf_metadata(reader.metadata)

    q_perm = unpermute_rows(cfg.n_q_dim, cfg.n_heads)
    k_perm = unpermute_rows(cfg.n_kv_dim, cfg.n_kv_heads)

    layer = {}
    for ours, suffix in LayerKeyMap.items():
        if ours == "attn_norm":
            continue  # EAGLE's layer has no input norm
        name = f"blk.0.{suffix}"
        perm = q_perm if ours == "wq" else k_perm if ours == "wk" else None
        layer[ours] = _stack([_load_tensor(reader, name, row_perm=perm, layout="kn")])

    params = {
        "tok_embd": _load_tensor(reader, "token_embd.weight"),
        "fc_w": _load_tensor(reader, "fc.weight", layout="kn"),
        "fc_b": reader.tensor_f32("fc.bias") if "fc.bias" in reader.tensors else None,
        "layers": layer,
    }
    put = device_put if device_put is not None else jnp.asarray
    params = jax.tree_util.tree_map(put, params)
    return params, cfg, reader.metadata
