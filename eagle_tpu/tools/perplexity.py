"""Perplexity + KL-divergence evaluation.

Mirrors the math of the reference's perplexity tool (examples/perplexity):
non-overlapping n_ctx windows, NLL counted from the second half of each window
(so every scored token has >= n_ctx/2 context), PPL = exp(mean NLL). The KLD
mode reproduces its --kl-divergence statistics (mean KLD, delta-PPL,
same-top-token %) between a reference model and a quantized one — the quality
gate that attributes quant error independent of any dataset."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import llama_forward
from ..runtime.kvcache import KVCache, causal_mask_from_tags


def _chunk_logprobs(params, cfg, tokens_chunk: jax.Array, compute_dtype, backend):
    """log-softmax logits for one [1, n_ctx] chunk."""
    b, t = tokens_chunk.shape
    kv = KVCache.create(cfg.n_layers, b, t, cfg.n_kv_heads, cfg.head_dim, jnp.bfloat16)
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    kv = kv.with_tags(positions, positions)
    mask = causal_mask_from_tags(kv.slot_pos, positions)
    out = llama_forward(
        params, cfg, tokens_chunk, positions, kv, positions, mask,
        compute_dtype=compute_dtype, backend=backend,
    )
    return jax.nn.log_softmax(out.logits.astype(jnp.float32), axis=-1)


def perplexity(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: np.ndarray,
    n_ctx: int = 512,
    compute_dtype=jnp.bfloat16,
    backend: str | None = None,
    bos_id: int | None = None,
) -> dict[str, float]:
    """PPL over a token stream (1-D array). `bos_id` replaces each chunk's
    first token with BOS (llama-perplexity's add_bos behavior,
    examples/perplexity/perplexity.cpp:565-570)."""
    tokens = np.asarray(tokens, np.int32)
    n_chunks = len(tokens) // n_ctx
    assert n_chunks >= 1, "need at least one full n_ctx chunk"
    first = n_ctx // 2

    fwd = jax.jit(
        lambda p, t: _chunk_logprobs(p, cfg, t, compute_dtype, backend)
    )
    nll, count = 0.0, 0
    for c in range(n_chunks):
        chunk = tokens[c * n_ctx : (c + 1) * n_ctx][None, :].copy()
        if bos_id is not None:
            chunk[0, 0] = bos_id
        lp = np.asarray(fwd(params, jnp.asarray(chunk)))[0]  # [n_ctx, V]
        targets = chunk[0, first + 1 :]
        nll -= lp[first:-1][np.arange(len(targets)), targets].sum()
        count += len(targets)
    return {"ppl": float(np.exp(nll / count)), "nll": nll / count, "tokens": count}


def kl_divergence(
    params_ref: dict[str, Any],
    params_test: dict[str, Any],
    cfg: ModelConfig,
    tokens: np.ndarray,
    n_ctx: int = 512,
    compute_dtype_ref=jnp.float32,
    compute_dtype_test=jnp.bfloat16,
    backend: str | None = None,
) -> dict[str, float]:
    """Per-token KLD of test vs ref + delta-PPL (examples/perplexity README
    statistics)."""
    tokens = np.asarray(tokens, np.int32)
    n_chunks = len(tokens) // n_ctx
    first = n_ctx // 2

    fwd_ref = jax.jit(lambda p, t: _chunk_logprobs(p, cfg, t, compute_dtype_ref, backend))
    fwd_test = jax.jit(lambda p, t: _chunk_logprobs(p, cfg, t, compute_dtype_test, backend))

    klds, nll_ref, nll_test, same_top, count = [], 0.0, 0.0, 0, 0
    for c in range(n_chunks):
        chunk = tokens[c * n_ctx : (c + 1) * n_ctx][None, :]
        lp_r = np.asarray(fwd_ref(params_ref, jnp.asarray(chunk)))[0][first:-1]
        lp_t = np.asarray(fwd_test(params_test, jnp.asarray(chunk)))[0][first:-1]
        targets = chunk[0, first + 1 :]
        idx = np.arange(len(targets))
        nll_ref -= lp_r[idx, targets].sum()
        nll_test -= lp_t[idx, targets].sum()
        kld = (np.exp(lp_r) * (lp_r - lp_t)).sum(axis=-1)
        klds.append(kld)
        same_top += (lp_r.argmax(-1) == lp_t.argmax(-1)).sum()
        count += len(targets)
    klds = np.concatenate(klds)
    return {
        "mean_kld": float(klds.mean()),
        "max_kld": float(klds.max()),
        "ppl_ref": float(np.exp(nll_ref / count)),
        "ppl_test": float(np.exp(nll_test / count)),
        "delta_ppl": float(np.exp(nll_test / count) - np.exp(nll_ref / count)),
        "same_top_frac": same_top / count,
        "tokens": count,
    }


def multiple_choice_score(
    params: dict[str, Any],
    cfg: ModelConfig,
    tasks: list[dict],
    compute_dtype=jnp.float32,
    backend: str | None = None,
) -> dict[str, float]:
    """HellaSwag-style multiple choice accuracy (hellaswag_score /
    multiple_choice_score, examples/perplexity/perplexity.cpp:742,1389).

    tasks: [{"context": [token ids], "endings": [[ids], ...], "gold": int}].
    Each ending is scored by its MEAN token log-prob given the context (the
    reference divides the summed ending log-prob by the ending length,
    perplexity.cpp:969) and the argmax is compared against gold."""
    import functools

    @functools.lru_cache(maxsize=None)
    def fwd(t):
        return jax.jit(lambda p, tok: _chunk_logprobs(p, cfg, tok, compute_dtype, backend))

    n_correct = 0
    details = []
    for task in tasks:
        ctx = list(task["context"])
        scores = []
        for ending in task["endings"]:
            seq = np.asarray(ctx + list(ending), np.int32)[None, :]
            lp = np.asarray(fwd(seq.shape[1])(params, jnp.asarray(seq)))[0]
            # ending token at position j is predicted by logits at j-1
            pos = np.arange(len(ctx) - 1, len(seq[0]) - 1)
            scores.append(float(lp[pos, seq[0, pos + 1]].mean()))
        pick = int(np.argmax(scores))
        n_correct += int(pick == int(task["gold"]))
        details.append({"scores": scores, "pick": pick, "gold": int(task["gold"])})
    return {
        "accuracy": n_correct / max(1, len(tasks)),
        "n_tasks": len(tasks),
        "details": details,
    }


def main(argv=None):
    """llama-perplexity CLI: -m model.gguf -f eval.txt [--n-ctx 256]."""
    import sys

    import jax.numpy as jnp

    from ..models.loader import load_llama_params
    from ..tokenizer.bpe import tokenizer_from_gguf_metadata
    from ..utils.args import apply_log_args, build_parser

    ap = build_parser("perplexity", description="perplexity over a text file")
    args = ap.parse_args(argv)
    apply_log_args(args)
    if not args.file:
        ap.error("-f/--file is required")
    params, cfg, md = load_llama_params(args.model)
    tok = tokenizer_from_gguf_metadata(md)
    ids = tok.encode(open(args.file).read())
    backend = args.backend
    res = perplexity(params, cfg, np.asarray(ids, np.int32),
                     n_ctx=args.n_ctx, backend=backend)
    print(f"ppl = {res['ppl']:.4f} over {res['tokens']} tokens "
          f"(n_ctx {args.n_ctx})", file=sys.stderr)
    print(res["ppl"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
