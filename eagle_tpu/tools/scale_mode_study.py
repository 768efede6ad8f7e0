"""Scale-mode quality study: is the bf16 product-scale stream quality-safe?

The serving kernels can stream group scales either as exact f32 d*sc products
(ggml's dequant math verbatim, ggml-quants.c:1280) or rounded to bf16 (half
the scale bytes, measured faster on v5e). bf16 perturbs each dequantized
weight by <= 2^-9 relative — this study measures what that does to the model's
OUTPUT distribution, against the yardstick that matters: the Q4_K quantization
error itself (the reference's own accepted quality budget,
examples/perplexity/README.md:59 dPPL +0.1755 on Llama-3-8B).

Method (no external weights can enter this environment): train a small llama
on a synthetic language until sharp (tools/train_draft.py recipe), write f16 +
Q4_K GGUFs through the production writer/quantizer, reload through the
production loader, and compare on held-out text:

  - KLD(q4k_f32scales || q4k_bf16scales)   — the scale-rounding effect
  - KLD(f16_dense     || q4k_f32scales)    — the quantization effect
  - dPPL for both, same-top-token fraction

Verdict gate: scale-rounding KLD and |dPPL| must be < 5% of the quantization
effect, and top-1 agreement >= 99.5%. Results recorded in BENCHMARKS.md.

Usage: python -m eagle_tpu.tools.scale_mode_study [--steps 700] [--json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import tempfile
from pathlib import Path

import numpy as np


def run_study(steps: int = 700, eval_tokens: int = 16384, n_ctx: int = 256,
              out_dir: str | None = None, log=print) -> dict:
    import jax.numpy as jnp

    from ..gguf.constants import GGMLType
    from ..models.loader import load_llama_params
    from ..quant.serving import prepare_params_for_serving
    from .perplexity import kl_divergence, perplexity
    from .train_draft import MarkovLang, save_target_gguf, train_target

    from ..models.config import ModelConfig

    # all matmul K dims must be multiples of 256 (QK_K super-blocks) so every
    # projection actually quantizes to Q4_K
    cfg = ModelConfig(
        arch="llama", vocab_size=256, n_embd=256, n_layers=4, n_heads=4,
        n_kv_heads=4, head_dim=64, n_ff=512, rope_dim=64, rms_eps=1e-5,
        n_ctx_train=256,
    )
    lang = MarkovLang(vocab=cfg.vocab_size, seed=0)
    log(f"training {cfg.n_layers}L d{cfg.n_embd} target for {steps} steps ...")
    params_t = train_target(cfg, lang, steps=steps, batch=16, seqlen=128, log=log)

    tmp = Path(out_dir or tempfile.mkdtemp(prefix="scale_study_"))
    f16_path = tmp / "target_f16.gguf"
    q4k_path = tmp / "target_q4k.gguf"
    save_target_gguf(f16_path, params_t, cfg, qtype=None)
    save_target_gguf(q4k_path, params_t, cfg, qtype=GGMLType.Q4_K)

    # force MATERIALIZED product scales: the loader's default coded layout is
    # bit-exact by construction (sup*code == precomputed product), so comparing
    # coded-vs-coded would trivially measure zero — this study quantifies the
    # bf16-PRODUCT mode, the approximate fast path
    from ..models import loader as _loader

    dense, mcfg, _ = load_llama_params(f16_path)
    coded_flag = _loader._CODED_LOAD
    try:
        _loader._CODED_LOAD = False
        q_f32, _, _ = load_llama_params(q4k_path)
        q_f32 = prepare_params_for_serving(q_f32, scale_mode="f32", pack=True)
        q_bf16, _, _ = load_llama_params(q4k_path)
        q_bf16 = prepare_params_for_serving(q_bf16, scale_mode="bf16", pack=True)
    finally:
        _loader._CODED_LOAD = coded_flag

    rng = np.random.default_rng(99)  # held-out stream (train used seed+1=1)
    heldout = lang.sample(rng, 1, eval_tokens)[0]

    kw = dict(n_ctx=n_ctx, compute_dtype_ref=jnp.float32,
              compute_dtype_test=jnp.float32, backend="xla")
    log("evaluating quantization effect (f16 dense vs Q4_K f32-scales) ...")
    quant = kl_divergence(dense, q_f32, mcfg, heldout, **kw)
    log("evaluating scale-rounding effect (f32 vs bf16 scales) ...")
    scale = kl_divergence(q_f32, q_bf16, mcfg, heldout, **kw)
    ppl_f16 = perplexity(dense, mcfg, heldout, n_ctx=n_ctx,
                         compute_dtype=jnp.float32, backend="xla")

    kld_ratio = scale["mean_kld"] / max(quant["mean_kld"], 1e-12)
    dppl_ratio = abs(scale["delta_ppl"]) / max(abs(quant["delta_ppl"]), 1e-12)
    verdict = (
        kld_ratio < 0.05 and dppl_ratio < 0.05 and scale["same_top_frac"] >= 0.995
    )
    res = {
        "ppl_f16": ppl_f16["ppl"],
        "ppl_q4k_f32scales": quant["ppl_test"],
        "ppl_q4k_bf16scales": scale["ppl_test"],
        "quant_mean_kld": quant["mean_kld"],
        "quant_delta_ppl": quant["delta_ppl"],
        "scale_mean_kld": scale["mean_kld"],
        "scale_delta_ppl": scale["delta_ppl"],
        "scale_same_top_frac": scale["same_top_frac"],
        "kld_ratio_scale_vs_quant": kld_ratio,
        "dppl_ratio_scale_vs_quant": dppl_ratio,
        "eval_tokens": quant["tokens"],
        "bf16_scales_quality_safe": bool(verdict),
    }
    return res


def main(argv=None):
    ap = argparse.ArgumentParser("scale-mode quality study")
    ap.add_argument("--steps", type=int, default=700)
    ap.add_argument("--eval-tokens", type=int, default=16384)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args(argv)
    res = run_study(args.steps, args.eval_tokens, out_dir=args.out_dir)
    if args.json:
        print(json.dumps(res))
    else:
        for k, v in res.items():
            print(f"{k:>28}: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
