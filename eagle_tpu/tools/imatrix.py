"""Importance-matrix collection — the llama-imatrix equivalent.

Runs calibration tokens through the model collecting mean squared activation
per in-feature for every weight matmul (the importance weights ggml's
quantizers consume, examples/imatrix + ggml's imatrix-aware quantize_q*).
Stored as an .npz keyed by GGUF tensor name -> [K] float32 (our own container;
the reference's binary imatrix format is llama.cpp-internal).

The collection loop re-runs layers eagerly (offline tool; no need for scan)."""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import embed_lookup
from ..ops.matmul import qmatmul
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_freqs_cfg
from ..ops.attention import gqa_attention
from ..runtime.kvcache import KVCache, causal_mask_from_tags


def collect_imatrix(
    params: dict[str, Any],
    cfg: ModelConfig,
    token_chunks: list[np.ndarray],
    compute_dtype=jnp.float32,
) -> dict[str, np.ndarray]:
    """Returns {gguf_tensor_name: mean_sq_activation [K]}."""
    sums: dict[str, np.ndarray] = {}
    counts: dict[str, int] = {}

    def add(name, x):
        v = np.asarray((x.astype(jnp.float32) ** 2).sum(axis=(0, 1)))
        sums[name] = sums.get(name, 0) + v
        counts[name] = counts.get(name, 0) + x.shape[0] * x.shape[1]

    inv_freq, _ = rope_freqs_cfg(cfg)
    h, h_kv, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    for chunk in token_chunks:
        tokens = jnp.asarray(chunk[None, :], jnp.int32)
        b, t = tokens.shape
        positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
        kv = KVCache.create(1, b, t, h_kv, dh, jnp.float32)
        kv = kv.with_tags(positions, positions)
        mask = causal_mask_from_tags(kv.slot_pos, positions)

        x = embed_lookup(params["tok_embd"], tokens)
        for i in range(cfg.n_layers):
            layer = jax.tree_util.tree_map(lambda a: a[i], params["layers"])
            attn_in = rms_norm(x, layer.get("attn_norm"), cfg.rms_eps)
            if "wqkv" in layer:
                add(f"blk.{i}.attn_q.weight", attn_in)  # shared input for q/k/v
                qkv = qmatmul(attn_in, layer["wqkv"], None, compute_dtype)
                q, k, v = jnp.split(qkv, [h * dh, (h + h_kv) * dh], axis=-1)
            else:
                add(f"blk.{i}.attn_q.weight", attn_in)
                q = qmatmul(attn_in, layer["wq"], None, compute_dtype)
                k = qmatmul(attn_in, layer["wk"], None, compute_dtype)
                v = qmatmul(attn_in, layer["wv"], None, compute_dtype)
            q = apply_rope(q.reshape(b, t, h, dh), positions, inv_freq)
            k = apply_rope(k.reshape(b, t, h_kv, dh), positions, inv_freq)
            v = v.reshape(b, t, h_kv, dh)
            kc = kv.k[0].at[:, :, :t].set(k.transpose(0, 2, 1, 3).astype(kv.k.dtype))
            vc = kv.v[0].at[:, :, :t].set(v.transpose(0, 2, 1, 3).astype(kv.v.dtype))
            attn = gqa_attention(q, kc, vc, mask).reshape(b, t, h * dh)
            add(f"blk.{i}.attn_output.weight", attn)
            x = x + qmatmul(attn, layer["wo"], None, compute_dtype)
            ffn_in = rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
            add(f"blk.{i}.ffn_gate.weight", ffn_in)
            if "w_gate_up" in layer:
                gu = qmatmul(ffn_in, layer["w_gate_up"], None, compute_dtype)
                gate, up = jnp.split(gu, 2, axis=-1)
            else:
                gate = qmatmul(ffn_in, layer["w_gate"], None, compute_dtype)
                up = qmatmul(ffn_in, layer["w_up"], None, compute_dtype)
            act = jax.nn.silu(gate) * up
            add(f"blk.{i}.ffn_down.weight", act)
            x = x + qmatmul(act, layer["w_down"], None, compute_dtype)
        hidden = rms_norm(x, params.get("output_norm"), cfg.rms_eps)
        add("output.weight", hidden)

    return {k: (sums[k] / counts[k]).astype(np.float32) for k in sums}


# aliases: q/k/v and gate/up share inputs
_ALIASES = {
    "attn_k.weight": "attn_q.weight",
    "attn_v.weight": "attn_q.weight",
    "ffn_up.weight": "ffn_gate.weight",
}


def imatrix_for(name: str, imatrix: dict[str, np.ndarray]) -> np.ndarray | None:
    if name in imatrix:
        return imatrix[name]
    parts = name.split(".")
    suffix = ".".join(parts[-2:])
    if suffix in _ALIASES:
        alias = ".".join(parts[:-2] + [_ALIASES[suffix]])
        return imatrix.get(alias)
    return None


def save_imatrix(imatrix: dict[str, np.ndarray], path: str | Path):
    np.savez_compressed(path, **imatrix)


def load_imatrix(path: str | Path) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
