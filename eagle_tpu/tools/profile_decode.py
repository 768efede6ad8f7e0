"""Per-op decode-step profile on the real TPU.

Runs a decode chunk under jax.profiler and aggregates device-side op
durations from the captured trace, grouping by op kind (pallas qmm kernels,
attention einsums, cache scatters, norms, ...). This is the measurement that
decides kernel-fusion strategy: it separates

  - pallas kernel execution time (is the qmm at roofline?)
  - XLA fusion execution time (attention, rope, sampling)
  - gaps (per-launch overhead: time the chip sits idle between programs)

Usage: python -m eagle_tpu.tools.profile_decode [--layers N] [--steps N]
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import gzip
import json
import os
import pathlib
import sys
import time


def parse_trace(logdir: str):
    """Parse the newest trace.json.gz under logdir; return (events, meta).

    Events are chrome-trace 'X' (complete) events with ts/dur in us. We keep
    only TensorFlow-op / XLA-op rows (device lanes)."""
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # device lanes: pid/tid names containing "TPU" / "XLA Ops"
    names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    thread_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    return events, names, thread_names


def summarize(events, names, thread_names, top: int = 40):
    """Aggregate device-lane op durations by name."""
    dev_events = []
    for e in events:
        pname = names.get(e["pid"], "")
        tname = thread_names.get((e["pid"], e.get("tid")), "")
        if "TPU" in pname or "XLA Ops" in tname or "XLA Ops" in pname:
            dev_events.append(e)
    if not dev_events:
        dev_events = events  # fall back: aggregate everything
    agg = collections.defaultdict(lambda: [0.0, 0])
    lanes = collections.defaultdict(list)
    for e in dev_events:
        key = e["name"]
        agg[key][0] += e.get("dur", 0.0)
        agg[key][1] += 1
        lanes[(e["pid"], e.get("tid"))].append((e["ts"], e.get("dur", 0.0)))
    # busy vs span per lane (gap analysis)
    print("\n== lane busy/span ==")
    for lane, evs in sorted(lanes.items(), key=lambda kv: -len(kv[1])):
        evs.sort()
        busy = sum(d for _, d in evs)
        span = (evs[-1][0] + evs[-1][1]) - evs[0][0]
        pname = names.get(lane[0], "")
        tname = thread_names.get(lane, "")
        if len(evs) > 5:
            print(f"  {pname}/{tname}: {len(evs)} evs, busy {busy/1e3:.2f} ms, "
                  f"span {span/1e3:.2f} ms, idle {(span-busy)/1e3:.2f} ms")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print("\n== top ops by total device time ==")
    total = sum(v[0] for v in agg.values())
    for name, (dur, cnt) in rows[:top]:
        print(f"  {dur/1e3:9.3f} ms  n={cnt:5d}  avg={dur/max(cnt,1):8.1f} us  {name[:110]}")
    print(f"  total: {total/1e3:.2f} ms over {sum(v[1] for v in agg.values())} events")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--dim", type=int, default=None)
    ap.add_argument("--heads", type=int, default=None)
    ap.add_argument("--ff", type=int, default=None)
    ap.add_argument("--coded", action="store_true",
                    help="profile the coded-scales serving layout")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--kv-limit", type=int, default=None,
                    help="static attention-read bucket (the bench passes one; "
                    "without it every step streams all max_seq cache slots)")
    ap.add_argument("--logdir", default="/tmp/eagle_profile")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--spec", action="store_true",
                    help="profile the EAGLE chain cycle instead of plain decode")
    ap.add_argument("--tree2", default=None, metavar="BEAM,DEPTH,NVERIFY",
                    help="profile the EAGLE-2 dynamic-tree cycle, e.g. 8,6,32")
    ap.add_argument("--n-draft", type=int, default=5)
    ap.add_argument("--draft-backend", default=None, choices=[None, "xla", "pallas"])
    args = ap.parse_args(argv)

    if args.parse_only:
        ev, nm, tn = parse_trace(args.logdir)
        summarize(ev, nm, tn, args.top)
        return 0

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ..models.synth import VICUNA_7B, synth_llama_params
    from ..runtime.generate import Generator
    from ..runtime.sampling import SamplerConfig

    cfg = dataclasses.replace(VICUNA_7B, n_layers=args.layers)
    if args.dim:
        cfg = dataclasses.replace(
            cfg, n_embd=args.dim, n_heads=args.heads or args.dim // 128,
            n_kv_heads=args.heads or args.dim // 128, n_ff=args.ff or 4 * args.dim,
        )
    t0 = time.time()
    params = synth_llama_params(cfg, seed=0, on_device=True,
                                packed=args.backend == "pallas",
                                scale_dtype=jnp.bfloat16,
                                coded=args.coded and args.backend == "pallas")
    jax.block_until_ready(params["layers"]["wqkv"].q)
    print(f"# params on-device in {time.time()-t0:.1f}s", file=sys.stderr)

    if args.spec or args.tree2:
        # EAGLE cycle profile: draft steps + tree/chain verify + accept, one jit.
        from ..models.synth import synth_eagle_params

        dcfg = dataclasses.replace(cfg, n_layers=1, is_eagle=True)
        dparams = jax.tree_util.tree_map(
            jnp.asarray,
            synth_eagle_params(dcfg, seed=1, packed=args.backend == "pallas",
                               scale_dtype=jnp.bfloat16),
        )
        if args.tree2:
            from ..runtime.tree2 import EagleTree2Engine

            bm, dpt, nv = (int(x) for x in args.tree2.split(","))
            eng = EagleTree2Engine(params, dparams, cfg, dcfg, beam=bm,
                                   depth=dpt, n_verify=nv, max_seq=args.max_seq,
                                   backend=args.backend,
                                   draft_backend=args.draft_backend, eos_id=-1)
            lim_steps = (args.steps + 2) * (dpt + 1) + eng.W
        else:
            from ..runtime.speculative import EagleChainEngine

            eng = EagleChainEngine(params, dparams, cfg, dcfg, n_draft=args.n_draft,
                                   max_seq=args.max_seq, backend=args.backend,
                                   draft_backend=args.draft_backend, eos_id=-1)
            lim_steps = (args.steps + 2) * (args.n_draft + 2)
        st = eng.fresh_state()
        pt = jnp.zeros((1, 16), jnp.int32)
        st = eng._prefill_jit(st, pt, jnp.asarray([8], np.int32), t=16)
        lim = eng.kv_read_bucket(8 + lim_steps)
        t0 = time.time()
        res = eng._cycle_jit(st, kv_limit=lim)  # warmup/compile
        int(np.asarray(res.n_out)[0])
        print(f"# warmup+compile {time.time()-t0:.1f}s", file=sys.stderr)
        st = res.state
        os.makedirs(args.logdir, exist_ok=True)
        with jax.profiler.trace(args.logdir):
            for _ in range(args.steps):
                res = eng._cycle_jit(st, kv_limit=lim)
                st = res.state
            int(np.asarray(res.n_out)[0])  # hard sync
        print(f"# trace captured ({args.steps} cycles)", file=sys.stderr)
        ev, nm, tn = parse_trace(args.logdir)
        summarize(ev, nm, tn, args.top)
        return 0

    gen = Generator(params, cfg, max_seq=args.max_seq, batch=1,
                    compute_dtype=jnp.bfloat16, backend=args.backend, eos_id=-1)
    prompt = np.random.default_rng(0).integers(0, cfg.vocab_size, size=64)
    t0 = time.time()
    gen.generate(prompt, max_new_tokens=args.steps + 1, stop_at_eos=False,
                 chunk=args.steps)
    print(f"# warmup+compile {time.time()-t0:.1f}s", file=sys.stderr)

    # profiled run: one decode chunk
    scfg = SamplerConfig(greedy=True)
    key = jax.random.PRNGKey(0)
    tok = jnp.zeros((1,), jnp.int32)
    pos = jnp.asarray([70], jnp.int32)
    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        toks, gen.kv, _ = gen._decode_jit(gen.params, gen.kv, tok, pos, key,
                                          scfg, n_steps=args.steps,
                                          kv_limit=args.kv_limit)
        int(toks[0, -1])  # hard sync
    print("# trace captured", file=sys.stderr)
    ev, nm, tn = parse_trace(args.logdir)
    summarize(ev, nm, tn, args.top)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
