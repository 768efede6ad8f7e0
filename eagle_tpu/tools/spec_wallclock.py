"""Wall-clock speculative-vs-plain decode ratio through `api.Engine`.

The reference's speculative driver reports n_draft/n_accept and both decoders'
timings from one run (examples/speculative/speculative-eagle.cpp:371-384);
this measures the SAME quantity end-to-end on real engine surfaces: load a
target+EAGLE GGUF pair, generate with the speculative engine, generate the
same tokens with the plain generator over the SAME target params, and report
wall-clock tokens/s for both plus their ratio.

Unlike BENCHMARKS.md's accept-len x cycle-time product, this is a literal
stopwatch around the full generate() loops — host logic, device syncs and
all.  Through the TPU relay every host<->device step costs 25-40 ms for BOTH
paths, so on small models the ratio is dominated by how many syncs each path
needs per emitted token (the speculative cycle amortizes the sync over
accept_len tokens — a real serving effect of this deployment, labeled in the
output); at 7B-shape compute the kernel time dominates instead.

Usage:
  python -m eagle_tpu.tools.spec_wallclock -m target.gguf --draft draft.gguf \
      [--engine chain|tree2] [--n 256] [--prompt-len 32] [--reps 3] [--json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run(args) -> dict:
    import jax.numpy as jnp

    from ..api import Engine, EngineConfig
    from ..runtime.sampling import SamplerConfig

    sampler = SamplerConfig(greedy=True) if args.temp <= 0 else SamplerConfig(
        temperature=args.temp, top_k=0, top_p=1.0, min_p=0.0)
    cfg = EngineConfig(
        model_path=args.model, draft_path=args.draft, max_seq=args.max_seq,
        n_draft=args.n_draft,
        tree2=tuple(int(x) for x in args.tree2.split(",")) if args.engine == "tree2" else None,
        backend=args.backend, feature_source=args.feature_source,
        sampler=sampler,
        compute_dtype=jnp.float32 if args.compute_dtype == "f32" else jnp.bfloat16,
        kv_dtype=jnp.float32 if args.compute_dtype == "f32" else jnp.bfloat16,
    )
    eng = Engine(cfg)
    rng = np.random.default_rng(args.seed)
    v = eng.model_cfg.vocab_size
    if args.prompt_source == "markov":
        # in-distribution prompts for train_draft.py artifacts: the pair was
        # trained on MarkovLang(vocab, seed=0) — uniform-random prompts are
        # out-of-distribution and depress acceptance ~30%
        from .train_draft import MarkovLang

        lang = MarkovLang(vocab=v, seed=0)
        prompts = [list(p) for p in lang.sample(rng, args.reps, args.prompt_len)]
    else:
        prompts = [rng.integers(3, v, size=args.prompt_len).tolist()
                   for _ in range(args.reps)]

    # --- speculative path (the engine api.Engine serves with a draft) ------
    spec = eng.engine
    gen_kw = dict(max_new_tokens=args.n, stop_at_eos=False)
    if args.cycles > 1:
        gen_kw["cycles_per_dispatch"] = args.cycles
    # full-length warmup: covers every kv-limit bucket the timed loop hits
    spec.generate(prompts[0], **gen_kw)
    t0 = time.time()
    n_spec = 0
    stats_agg = {"n_cycles": 0, "n_drafted": 0, "n_accepted": 0}
    for p in prompts:
        out, st = spec.generate(p, **gen_kw)
        n_spec += len(out)
        for k in stats_agg:
            stats_agg[k] += st.get(k, 0)
    t_spec = time.time() - t0

    # --- plain path (same target params, non-speculative generator) --------
    plain = eng._plain_generator()
    plain.generate(prompts[0], max_new_tokens=args.n, sampler=sampler,
                   stop_at_eos=False)  # full-length warmup (all buckets)
    t0 = time.time()
    n_plain = 0
    for p in prompts:
        out = plain.generate(p, max_new_tokens=args.n, sampler=sampler,
                             stop_at_eos=False)  # returns NEW tokens only
        n_plain += len(out)
    t_plain = time.time() - t0

    res = {
        "engine": args.engine,
        "spec_tokens": n_spec,
        "spec_wall_s": round(t_spec, 3),
        "spec_t/s": round(n_spec / t_spec, 2),
        "plain_tokens": n_plain,
        "plain_wall_s": round(t_plain, 3),
        "plain_t/s": round(n_plain / t_plain, 2),
        "wallclock_speedup": round((n_spec / t_spec) / (n_plain / t_plain), 3),
        "mean_accept_len": round(
            (stats_agg["n_accepted"] + stats_agg["n_cycles"])
            / max(1, stats_agg["n_cycles"]), 3),
        "accept_rate": round(
            stats_agg["n_accepted"] / max(1, stats_agg["n_drafted"]), 3),
        "n_draft": args.n_draft,
        "cycles_per_dispatch": args.cycles,
        "temp": args.temp,
    }
    return res


def main(argv=None):
    ap = argparse.ArgumentParser("wall-clock spec-vs-plain bench")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--draft", required=True)
    ap.add_argument("--engine", default="chain", choices=["chain", "tree2"])
    ap.add_argument("--tree2", default="8,6,24")
    ap.add_argument("--n-draft", type=int, default=5)
    ap.add_argument("-n", type=int, default=256)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--max-seq", type=int, default=512)
    ap.add_argument("--backend", default=None, choices=[None, "xla", "pallas"])
    ap.add_argument("--feature-source", default="post_norm")
    ap.add_argument("--compute-dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--temp", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prompt-source", default="uniform",
                    choices=["uniform", "markov"])
    ap.add_argument("--cycles", type=int, default=1,
                    help="speculative cycles chained per program dispatch "
                    "(amortizes the per-dispatch link round trip)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    res = run(args)
    if args.json:
        print(json.dumps(res))
    else:
        for k, val in res.items():
            print(f"{k}: {val}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
