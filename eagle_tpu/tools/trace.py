"""Per-tensor debug tracing — the eval-callback equivalent
(examples/eval-callback/eval-callback.cpp:161, ggml_backend_sched_set_eval_callback).

The reference hooks every graph node and prints name/shape/samples. Here the
forward is re-run EAGERLY layer by layer (outside jit — tracing is a debug
path, not a serving path) and a callback receives one record per intermediate
tensor: name, shape, mean / absmax / a few leading values. Useful for
activation-level divergence hunts against transformers or between backends."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np


def _stats(name: str, arr) -> dict:
    a = np.asarray(arr, dtype=np.float32)
    flat = a.reshape(-1)
    return {
        "name": name,
        "shape": tuple(a.shape),
        "mean": float(flat.mean()) if flat.size else 0.0,
        "absmax": float(np.abs(flat).max()) if flat.size else 0.0,
        "first": [float(x) for x in flat[:4]],
        "has_nan": bool(np.isnan(flat).any()),
    }


def default_printer(rec: dict):
    print(
        f"{rec['name']:>24} {str(rec['shape']):>20} "
        f"mean {rec['mean']:+.5f} absmax {rec['absmax']:.5f} "
        f"first {rec['first']}" + ("  ** NaN **" if rec["has_nan"] else "")
    )


def trace_forward(
    params: dict[str, Any],
    cfg,
    tokens,
    callback: Callable[[dict], None] | None = None,
    compute_dtype=None,
) -> list[dict]:
    """Run a full-sequence causal forward, emitting a record per layer output
    plus embeddings / final norm / logits. Returns all records."""
    import jax.numpy as jnp

    from ..models.llama import _layer_step, embed_lookup, rms_norm
    from ..ops.matmul import qmatmul
    from ..ops.rope import rope_freqs_cfg
    from ..runtime.kvcache import KVCache, causal_mask_from_tags

    compute_dtype = compute_dtype or jnp.float32
    tokens = jnp.asarray(tokens)
    if tokens.ndim == 1:
        tokens = tokens[None, :]
    b, t = tokens.shape
    records: list[dict] = []

    def emit(name, arr):
        rec = _stats(name, arr)
        records.append(rec)
        if callback:
            callback(rec)

    x = embed_lookup(params["tok_embd"], tokens)
    if cfg.embd_scale != 1.0:
        x = x * jnp.asarray(cfg.embd_scale, x.dtype)
    emit("token_embd", x)

    inv_freq, _ = rope_freqs_cfg(cfg)
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    kv = KVCache.create(cfg.n_layers, b, t, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    kv = kv.with_tags(positions, positions)
    mask = causal_mask_from_tags(kv.slot_pos, positions)

    k_all, v_all, k_s, v_s = kv.k, kv.v, kv.k_scale, kv.v_scale
    for li in range(cfg.n_layers):
        x, k_all, v_all, k_s, v_s = _layer_step(
            cfg, inv_freq, positions, positions, mask, compute_dtype, None,
            x, params["layers"], jnp.int32(li), k_all, v_all, k_s, v_s,
        )
        emit(f"blk.{li}.out", x)

    hidden = rms_norm(x, params.get("output_norm"), cfg.rms_eps)
    emit("result_norm", hidden)
    logits = qmatmul(hidden, params["output"], None, compute_dtype)
    if cfg.final_softcap > 0:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    emit("result_output", logits)
    return records


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser("eagle-tpu eval-callback tracer")
    ap.add_argument("model", help="GGUF path")
    ap.add_argument("--prompt", default="hello")
    args = ap.parse_args(argv)

    from ..models.loader import load_llama_params
    from ..tokenizer.bpe import tokenizer_from_gguf_metadata

    params, cfg, md = load_llama_params(args.model)
    tok = tokenizer_from_gguf_metadata(md)
    ids = tok.encode(args.prompt)
    trace_forward(params, cfg, ids, callback=default_printer)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
