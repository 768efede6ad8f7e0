"""Acceptance-vs-target-scale study — turning the EAGLE speedup gate from a
cited constant into a measured trend.

The ≥2.5x end-to-end projection multiplies a MEASURED cycle time by the
EAGLE paper's accept length (3.9-4.3 chain on Vicuna-7B). Real checkpoints
cannot enter this environment, so this study trains target+draft pairs at
SEVERAL target scales (tools/train_draft.py recipe: next-token-trained tiny
llama + EAGLE-recipe distilled 1-layer head) and measures mean accept length
for the chain and the EAGLE-2 dynamic tree at each scale, plus the chain at
temperature 0.8 under stochastic min(1,p/q) acceptance. A rising (or flat)
curve from tiny scales toward the paper's numbers is evidence the projection
extrapolates; results land in BENCHMARKS.md.

Usage:
  python -m eagle_tpu.tools.acceptance_study [--steps 600] [--json]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

#: target scales: params grow ~5x across the sweep; head_dim fixed by d/heads
SCALES = {
    "S (2L d96)": dict(n_embd=96, n_layers=2, n_ff=192, n_heads=4,
                       n_kv_heads=4, head_dim=24, rope_dim=24),
    "M (4L d128)": dict(),  # train_draft.TINY default
    "L (6L d192)": dict(n_embd=192, n_layers=6, n_ff=384, n_heads=4,
                        n_kv_heads=4, head_dim=48, rope_dim=48),
}


def run_study(steps: int = 600, n_prompts: int = 4, max_new_tokens: int = 96,
              log=print, scaled_steps: bool = False) -> dict:
    from ..runtime.sampling import SamplerConfig
    from ..runtime.speculative import EagleChainEngine
    from .train_draft import measure_acceptance, train_pipeline

    results = {}
    for idx, (name, overrides) in enumerate(SCALES.items()):
        # fixed `steps` for every scale confounds the curve: the larger
        # targets are less converged (higher-entropy distributions are harder
        # to draft). --scaled-steps doubles the budget per tier (S:1x M:2x
        # L:4x, ~compute-matched to the ~5x param growth) so the trend
        # reflects scale, not training budget.
        n_steps = steps * (2 ** idx if scaled_steps else 1)
        log(f"=== scale {name}: training target + draft ({n_steps} steps) ===")
        target, draft, tcfg, dcfg, lang = train_pipeline(
            steps=n_steps, cfg_overrides=overrides, log=log
        )
        row = {}
        row["chain_k5"] = measure_acceptance(
            target, draft, tcfg, dcfg, lang, n_prompts=n_prompts,
            max_new_tokens=max_new_tokens, n_draft=5,
        )["mean_accept_len"]
        row["tree2_8_6_24"] = measure_acceptance(
            target, draft, tcfg, dcfg, lang, n_prompts=n_prompts,
            max_new_tokens=max_new_tokens, engine="tree2", tree2=(8, 6, 24),
        )["mean_accept_len"]
        # chain at temperature: stochastic min(1, p/q) acceptance
        eng = EagleChainEngine(
            target, draft, tcfg, dcfg, n_draft=5, max_seq=512, backend="xla",
            feature_source="post_norm", eos_id=-1,
            sampler=SamplerConfig(temperature=0.8, top_k=0, top_p=1.0, min_p=0.0),
        )
        rng = np.random.default_rng(99)
        agg_c = agg_a = 0
        for p in lang.sample(rng, n_prompts, 32):
            _, stats = eng.generate(list(p), max_new_tokens=max_new_tokens)
            agg_c += stats["n_cycles"]
            agg_a += stats["n_accepted"]
        row["chain_k5_temp0.8_stochastic"] = (agg_a + agg_c) / max(1, agg_c)
        n_params = (
            tcfg.n_layers * (4 * tcfg.n_embd * tcfg.n_heads * tcfg.head_dim
                             + 3 * tcfg.n_embd * tcfg.n_ff)
            + 2 * tcfg.vocab_size * tcfg.n_embd
        )
        row["target_params"] = n_params
        results[name] = row
        log(f"    {name}: {row}")
    return results


def run_draft_sweep(target_steps: int = 1200, draft_steps=(300, 1200, 4800),
                    n_prompts: int = 8, max_new_tokens: int = 96,
                    save_best: str | None = None, log=print) -> dict:
    """Acceptance vs DRAFT training budget at a fixed target — the
    complementary axis to the scale sweep: if acceptance rises with draft
    convergence at constant target, the low toy-scale numbers are a
    draft-quality artifact (real EAGLE heads train on 68k ShareGPT
    conversations), not a ceiling of the speculation machinery.

    Each budget row measures chain K=5, the EAGLE-2 tree, and the chain at
    temperature 0.8 under stochastic min(1,p/q) acceptance.  With
    `save_best`, the highest-budget pair is exported as target.gguf +
    draft.gguf so the wall-clock spec-vs-plain bench can drive the SAME
    trained pair through `api.Engine` on TPU."""
    import dataclasses

    from ..models.config import ModelConfig
    from ..runtime.sampling import SamplerConfig
    from ..runtime.speculative import EagleChainEngine
    from .train_draft import (MarkovLang, TINY, measure_acceptance,
                              train_draft, train_target)

    tcfg = ModelConfig(arch="llama", **TINY)
    dcfg = dataclasses.replace(tcfg, n_layers=1, is_eagle=True, arch="eagle")
    lang = MarkovLang(vocab=tcfg.vocab_size, seed=0)
    log(f"training fixed target ({target_steps} steps)")
    target = train_target(tcfg, lang, target_steps, 24, 64, seed=0, log=log)
    results = {}
    for ds in draft_steps:
        log(f"=== draft budget {ds} steps ===")
        draft = train_draft(tcfg, dcfg, target, lang, ds, 24, 64, seed=10,
                            feature_source="post_norm", log=log)
        row = {}
        for eng, kw in (("chain", dict(n_draft=5)),
                        ("tree2", dict(engine="tree2", tree2=(8, 6, 24)))):
            row[eng] = measure_acceptance(
                target, draft, tcfg, dcfg, lang, n_prompts=n_prompts,
                max_new_tokens=max_new_tokens, **kw)["mean_accept_len"]
        # stochastic min(1,p/q) acceptance at temperature 0.8 (the serving
        # sampling path; provably target-distribution-preserving)
        eng = EagleChainEngine(
            target, draft, tcfg, dcfg, n_draft=5, max_seq=512, backend="xla",
            feature_source="post_norm", eos_id=-1,
            sampler=SamplerConfig(temperature=0.8, top_k=0, top_p=1.0, min_p=0.0),
        )
        rng = np.random.default_rng(99)
        agg_c = agg_a = 0
        for p in lang.sample(rng, n_prompts, 32):
            _, stats = eng.generate(list(p), max_new_tokens=max_new_tokens)
            agg_c += stats["n_cycles"]
            agg_a += stats["n_accepted"]
        row["chain_temp0.8_stochastic"] = (agg_a + agg_c) / max(1, agg_c)
        results[f"draft_{ds}"] = row
        log(f"    {ds}: {row}")
        if save_best:  # overwrite each budget: last (largest) survives
            from pathlib import Path

            from .train_draft import save_eagle_gguf, save_target_gguf

            out = Path(save_best)
            out.mkdir(parents=True, exist_ok=True)
            save_target_gguf(out / "target.gguf", target, tcfg, qtype=None)
            save_eagle_gguf(out / "draft.gguf", draft, dcfg)
            log(f"    saved pair (budget {ds}) to {out}")
    return results


def main(argv=None):
    ap = argparse.ArgumentParser("acceptance-vs-scale study")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--scaled-steps", action="store_true",
                    help="double the training budget per scale tier "
                    "(convergence-matched curve; see run_study)")
    ap.add_argument("--n-prompts", type=int, default=4)
    ap.add_argument("--draft-sweep", action="store_true",
                    help="sweep DRAFT training budget at a fixed target "
                    "instead of sweeping target scale")
    ap.add_argument("--draft-steps", default="300,1200,4800",
                    help="comma-separated draft budgets for --draft-sweep")
    ap.add_argument("--target-steps", type=int, default=1200)
    ap.add_argument("--save-best", default=None,
                    help="dir to export the largest-budget pair as GGUFs")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    if args.draft_sweep:
        res = run_draft_sweep(
            target_steps=args.target_steps,
            draft_steps=tuple(int(x) for x in args.draft_steps.split(",")),
            n_prompts=args.n_prompts, save_best=args.save_best)
    else:
        res = run_study(args.steps, args.n_prompts, scaled_steps=args.scaled_steps)
    if args.json:
        print(json.dumps(res))
    else:
        for k, v in res.items():
            print(k, v)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
