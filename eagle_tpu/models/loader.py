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

from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader, GGUFTensorInfo
from ..quant.qtensor import QTensor, REPACKABLE_TYPES, repack_numpy
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


def unpermute_rows(n_rows: int, n_heads: int) -> np.ndarray:
    """Row index map inverting convert_hf_to_gguf LlamaModel.permute."""
    head_rows = n_rows // n_heads
    within = np.arange(head_rows).reshape(2, head_rows // 2).T.reshape(-1)
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
        )
    return np.stack(items)


def _device_put_tree(tree, put: Callable):
    return jax.tree_util.tree_map(lambda x: put(x), tree)


def fuse_layer_weights(stacked: dict[str, Any]) -> dict[str, Any]:
    """Fuse qkv and gate+up projections along N (single MXU dispatch each)."""
    from ..quant.qtensor import concat_qtensors

    out = dict(stacked)
    out["wqkv"] = concat_qtensors([out.pop("wq"), out.pop("wk"), out.pop("wv")])
    if "w_gate" in out:  # MoE layers have expert tensors instead
        out["w_gate_up"] = concat_qtensors([out.pop("w_gate"), out.pop("w_up")])
    return out


def load_llama_params(
    path: str | Path,
    device_put: Callable | None = None,
    fuse: bool = True,
) -> tuple[dict[str, Any], ModelConfig, dict[str, Any]]:
    """Load a llama-architecture GGUF. Returns (params, config, metadata)."""
    reader = GGUFReader(path)
    cfg = ModelConfig.from_gguf_metadata(reader.metadata)

    from .config import PERMUTED_ROPE_ARCHS

    # only adjacent-pair-rope archs carry LlamaModel.permute'd q/k rows in
    # GGUF; NEOX-rope archs are already in the runtime's half-split layout
    permuted = cfg.arch in PERMUTED_ROPE_ARCHS
    q_perm = unpermute_rows(cfg.n_q_dim, cfg.n_heads) if permuted else None
    k_perm = unpermute_rows(cfg.n_kv_dim, cfg.n_kv_heads) if permuted else None

    is_moe = "blk.0.ffn_gate_inp.weight" in reader.tensors
    # optional per-arch tensors (gemma2 sandwich norms; q/k norms; MoE router
    # + experts; qwen2moe shared expert)
    optional = {
        "post_attn_norm": "attn_post_norm.weight",
        "post_ffn_norm": "ffn_post_norm.weight",
        "attn_q_norm": "attn_q_norm.weight",
        "attn_k_norm": "attn_k_norm.weight",
    }
    key_map = dict(LayerKeyMap)
    if is_moe:
        for k in ("w_gate", "w_up", "w_down"):
            key_map.pop(k)
        optional.update(
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
    # norms may be absent per arch (olmo2 has no pre-norms; eagle no attn_norm)
    for norm_key in ("attn_norm", "ffn_norm"):
        if f"blk.0.{key_map[norm_key]}" not in reader.tensors:
            optional[norm_key] = key_map.pop(norm_key)

    layers: dict[str, list] = {k: [] for k in key_map}
    for i in range(cfg.n_layers):
        for ours, suffix in key_map.items():
            name = f"blk.{i}.{suffix}"
            perm = q_perm if ours == "wq" else k_perm if ours == "wk" else None
            layers[ours].append(_load_tensor(reader, name, row_perm=perm, layout="kn"))
        for ours, suffix in optional.items():
            name = f"blk.{i}.{suffix}"
            if name in reader.tensors:
                # router/experts load dense (expert weights are 3-D; MoE
                # quantized storage decodes to dense here). A FLAT q/k norm
                # (olmo2: one weight across all heads) follows its
                # projection's row order — permute along for permuted archs.
                w = reader.tensor_f32(name)
                if permuted and ours == "attn_q_norm" and w.size == cfg.n_q_dim:
                    w = w[q_perm]
                if permuted and ours == "attn_k_norm" and w.size == cfg.n_kv_dim:
                    w = w[k_perm]
                layers.setdefault(ours, []).append(w)

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
    if fuse:
        stacked = fuse_layer_weights(stacked)
    params: dict[str, Any] = {
        "tok_embd": _load_tensor(reader, "token_embd.weight"),
        "layers": stacked,
        "output_norm": _load_tensor(reader, "output_norm.weight"),
    }
    if "output.weight" in reader.tensors:
        params["output"] = _load_tensor(reader, "output.weight", layout="kn")
    else:
        params["output"] = params["tok_embd"]  # tied embeddings (stays "nk")

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
