"""Benchmark matrix — the llama-bench / batched-bench equivalent.

Measures prefill (pp) and decode (tg) throughput over batch/length
combinations plus EAGLE speculative cycle latency, printing a markdown or
JSON table (llama-bench's output styles).

Usage:
  python -m eagle_tpu.tools.bench_suite [--layers 32] [--json]
      [--pp 128,512] [--tg 64] [--batch 1,8] [--spec]

All timings use the slope method (two run lengths) so fixed host-sync latency
(e.g. a TPU relay) is excluded."""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def _time_slope(fn, small: int, big: int):
    """fn(n) runs n units and blocks; returns seconds/unit via slope."""
    ts, tb = [], []
    for _ in range(2):
        t0 = time.time(); fn(small); ts.append(time.time() - t0)
        t0 = time.time(); fn(big); tb.append(time.time() - t0)
    return (min(tb) - min(ts)) / (big - small)


def main(argv=None):
    from ..utils.args import build_parser

    ap = build_parser("bench", prog="eagle-tpu bench-suite")
    ap.set_defaults(backend="pallas")  # TPU bench default; registry row is None
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--pp", default="128")
    ap.add_argument("--tg", default="64")
    ap.add_argument("--batch", default="1")
    ap.add_argument("--spec", action="store_true", help="include EAGLE cycle bench")
    ap.add_argument("--draft-backend", default=None, choices=[None, "xla", "pallas"])
    ap.add_argument("--compute-dtype", default="bf16", choices=["bf16", "f32"],
                    help="f32 for CPU smoke runs (this host lacks bf16 dots)")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--max-seq", type=int, default=1024)
    # -- continuous-batching serving bench (batched-bench equivalent):
    # R staggered requests over B slots, dense or paged KV
    ap.add_argument("--serve", type=int, default=0, metavar="R",
                    help="serving bench: R staggered requests through the "
                    "continuous batcher (aggregate + per-request t/s)")
    ap.add_argument("--serve-batch", type=int, default=4, help="slots")
    ap.add_argument("--serve-pp", type=int, default=64, help="prompt tokens/request")
    ap.add_argument("--serve-tg", type=int, default=64, help="decode tokens/request")
    ap.add_argument("--paged", action="store_true",
                    help="serve over the paged KV pool (PagedBatcher)")
    ap.add_argument("--serve-pages", type=int, default=None,
                    help="page-pool size (default: full dense capacity)")
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--serve-prefix", type=int, default=0, metavar="P",
                    help="share the first P prompt tokens across all serve "
                    "requests (with --paged, later requests prefix-match "
                    "registered pages and skip those prefill chunks)")
    ap.add_argument("--no-prefix-cache", action="store_true",
                    help="paged serving without the prefix cache (clean "
                    "zero-hit baseline: otherwise the warm run's identical "
                    "prompts register pages the measured run reuses)")
    ap.add_argument("--serve-chunk", type=int, default=None,
                    help="prefill chunk for the paged batcher (multiple of "
                    "--page-size; default: the full prompt). Prefix reuse is "
                    "CHUNK-granular — boundary features exist only where a "
                    "chunk ended — so set this to the shared-prefix length "
                    "to make --serve-prefix matchable")
    args = ap.parse_args(argv)

    import pathlib

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from ..models.synth import VICUNA_7B, synth_eagle_params, synth_llama_params
    from ..runtime.generate import Generator, pad_bucket
    from ..runtime.sampling import SamplerConfig

    cdt = jnp.bfloat16 if args.compute_dtype == "bf16" else jnp.float32
    cfg = dataclasses.replace(VICUNA_7B, n_layers=args.layers)
    sdt = jnp.bfloat16 if args.compute_dtype == "bf16" else jnp.float32
    params = synth_llama_params(cfg, seed=0, on_device=True, packed=True,
                                scale_dtype=sdt, embed_dtype=cdt)
    jax.block_until_ready(params["layers"]["wqkv"].q)
    rows = []

    # -- prefill throughput --------------------------------------------------
    for t in (int(x) for x in args.pp.split(",") if x.strip()):
        if t <= 0:
            continue
        gen = Generator(params, cfg, max_seq=max(args.max_seq, 2 * t), batch=1,
                        backend=args.backend, compute_dtype=cdt, eos_id=-1)
        tokens = jnp.zeros((1, t), jnp.int32)

        def run_pp(n, gen=gen, tokens=tokens, t=t):
            for _ in range(n):
                # kv is donated by the jit — must thread the returned buffer
                logits, _, gen.kv = gen._prefill_jit(
                    gen.params, gen.kv, tokens, jnp.asarray([t], np.int32), t=t
                )
            float(jnp.nan_to_num(jnp.max(logits)))  # hard sync (NaN-tolerant: synthetic weights)

        run_pp(1)  # compile
        per = _time_slope(run_pp, 1, 4)
        rows.append({"test": f"pp{t}", "t/s": round(t / per, 1)})
        print(f"# {rows[-1]}", file=sys.stderr, flush=True)
        del gen, run_pp  # free the KV buffer before the next config

    # -- decode throughput ---------------------------------------------------
    tg = int(args.tg.split(",")[0])
    for b in (int(x) for x in args.batch.split(",")) if tg > 0 else ():
        gen = Generator(params, cfg, max_seq=args.max_seq, batch=b,
                        backend=args.backend, compute_dtype=cdt, eos_id=-1)
        scfg = SamplerConfig(greedy=True)
        state = {"pos": 8, "tok": jnp.zeros((b,), jnp.int32)}
        prompt = jnp.zeros((b, 8), jnp.int32)
        gen.kv = gen.kv.with_tags(
            jnp.tile(jnp.arange(8, dtype=jnp.int32), (b, 1)),
            jnp.tile(jnp.arange(8, dtype=jnp.int32), (b, 1)),
        )

        # context-true read bucket: every slope run RESTARTS at the prompt
        # position (bench.py's round-4 fix), so the attention-read bound
        # matches the live 8+tg context instead of the runs' accumulated
        # positions (the reference's tg graph also reads only live context)
        lim = gen.kv_read_bucket(8 + tg + 2)

        def run_tg(n, gen=gen, b=b, lim=lim):
            state["pos"] = 8  # restart at the prompt position
            toks, gen.kv, _ = gen._decode_jit(
                gen.params, gen.kv, state["tok"], jnp.full((b,), state["pos"], jnp.int32),
                jax.random.PRNGKey(0), SamplerConfig(greedy=True), n_steps=n,
                kv_limit=lim,
            )
            state["tok"] = toks[:, -1]
            int(state["tok"][0])

        run_tg(8)
        per = _time_slope(run_tg, 8, tg)
        rows.append({"test": f"tg{tg} b{b}", "t/s": round(b / per, 1)})
        print(f"# {rows[-1]}", file=sys.stderr, flush=True)
        del gen, run_tg  # free this batch size's dense KV before the next

    # -- speculative cycle ---------------------------------------------------
    if args.spec:
        from ..runtime.speculative import EagleChainEngine

        dcfg = dataclasses.replace(cfg, n_layers=1, is_eagle=True)
        dparams = synth_eagle_params(dcfg, seed=1, packed=True,
                                     scale_dtype=sdt, embed_dtype=cdt)
        dparams = jax.tree_util.tree_map(jnp.asarray, dparams)
        eng = EagleChainEngine(params, dparams, cfg, dcfg, n_draft=args.n_draft,
                               max_seq=args.max_seq, backend=args.backend,
                               draft_backend=args.draft_backend, eos_id=-1)
        st = eng.fresh_state()
        pt = jnp.zeros((1, 16), jnp.int32)
        st = eng._prefill_jit(st, pt, jnp.asarray([8], np.int32), t=16)
        box = {"st": st}

        # one read-bucket for all slope points (same compiled program): 8
        # prompt tokens + <=10 cycles x (K+1) slots stays under 128
        lim = eng.kv_read_bucket(8 + 10 * (args.n_draft + 2))

        def run_cycle(n, eng=eng):
            for _ in range(n):
                res = eng._cycle_jit(box["st"], kv_limit=lim)
                box["st"] = res.state
            int(np.asarray(res.n_out)[0])

        run_cycle(1)
        per = _time_slope(run_cycle, 2, 8)
        rows.append({"test": f"spec-cycle k{args.n_draft}", "ms/cycle": round(per * 1e3, 2)})
        print(f"# {rows[-1]}", file=sys.stderr, flush=True)

    # -- EAGLE-2 dynamic-tree cycle -------------------------------------------
    if args.tree2:
        from ..runtime.tree2 import EagleTree2Engine

        bm, dpt, nv = (int(x) for x in args.tree2.split(","))
        dcfg = dataclasses.replace(cfg, n_layers=1, is_eagle=True)
        dparams = synth_eagle_params(dcfg, seed=1, packed=True,
                                     scale_dtype=sdt, embed_dtype=cdt)
        dparams = jax.tree_util.tree_map(jnp.asarray, dparams)
        eng = EagleTree2Engine(params, dparams, cfg, dcfg, beam=bm, depth=dpt,
                               n_verify=nv, max_seq=args.max_seq,
                               backend=args.backend,
                               draft_backend=args.draft_backend, eos_id=-1)
        st = eng.fresh_state()
        pt = jnp.zeros((1, 16), jnp.int32)
        st = eng._prefill_jit(st, pt, jnp.asarray([8], np.int32), t=16)
        box = {"st": st}
        # slope uses <=10 cycles; worst n_past grows depth+1 per cycle and the
        # verify window extends W slots past it
        lim = eng.kv_read_bucket(8 + 10 * (dpt + 1) + eng.W)

        def run_t2(n, eng=eng):
            for _ in range(n):
                res = eng._cycle_jit(box["st"], kv_limit=lim)
                box["st"] = res.state
            int(np.asarray(res.n_out)[0])

        run_t2(1)
        per = _time_slope(run_t2, 2, 8)
        rows.append({"test": f"tree2-cycle b{bm} d{dpt} n{nv}",
                     "ms/cycle": round(per * 1e3, 2)})

    # -- continuous-batching serving bench ------------------------------------
    # The batched-bench counterpart (examples/batched-bench): R requests with
    # staggered arrival (a new request is admitted whenever a slot frees)
    # through the real scheduler — dense slots or the paged pool — measuring
    # END-TO-END serving throughput including chunked prefill, the speculative
    # cycle, host scheduling, and (paged) page mapping.
    if args.serve:
        from ..runtime.scheduler import ContinuousBatcher
        from ..runtime.speculative import EagleChainEngine

        b = args.serve_batch
        dcfg = dataclasses.replace(cfg, n_layers=1, is_eagle=True)
        dparams = synth_eagle_params(dcfg, seed=1, packed=True,
                                     scale_dtype=sdt, embed_dtype=cdt)
        dparams = jax.tree_util.tree_map(jnp.asarray, dparams)
        eng = EagleChainEngine(params, dparams, cfg, dcfg,
                               n_draft=args.n_draft, max_seq=args.max_seq,
                               batch=b, backend=args.backend, compute_dtype=cdt,
                               kv_dtype=cdt,
                               draft_backend=args.draft_backend, eos_id=-1)
        if args.paged:
            from ..runtime.paged_batcher import PagedBatcher

            mp = -(-args.max_seq // args.page_size)
            # match the dense row's prefill chunking by default (PagedBatcher
            # defaults to page_size chunks — at pp128/page32 that is 4x the
            # scheduler steps, each a full host<->device sync via the relay)
            chunk = args.serve_chunk or (
                max(args.serve_pp // args.page_size, 1) * args.page_size)
            batcher = PagedBatcher(
                eng, n_pages=args.serve_pages or b * mp,
                page_size=args.page_size, prefill_chunk=chunk,
                prefix_cache=not args.no_prefix_cache,
            )
        else:
            batcher = ContinuousBatcher(eng, prefill_chunk=args.serve_pp)
        rng = np.random.default_rng(0)
        shared = rng.integers(0, cfg.vocab_size, size=args.serve_prefix).tolist()
        prompts = [shared + rng.integers(
                       0, cfg.vocab_size,
                       size=args.serve_pp - args.serve_prefix).tolist()
                   for _ in range(args.serve)]
        t_first: dict[int, float] = {}
        t_done: dict[int, float] = {}
        t_tok1: dict[int, float] = {}  # first emitted token (TTFT end)

        def _first_tok_cb(i):
            def cb(_tok):
                t_tok1.setdefault(i, time.time())
            return cb

        t_arr: dict[int, float] = {}  # arrival (enters pend; TTFT start)

        def run_serve(warm: bool):
            tag = "w" if warm else "m"
            pend = list(enumerate(prompts if not warm else prompts[:b]))
            submitted: set = set()
            done: set = set()
            t0 = time.time()
            if not warm:  # all requests "arrive" at t0; TTFT is arrival-based
                for i, _ in pend:
                    t_arr[i] = t0
            while pend or batcher.n_active or batcher.n_pending:
                while pend:
                    i, p = pend[0]
                    rid = f"{tag}{i}"
                    s = batcher.submit(p, max_new_tokens=args.serve_tg,
                                       stop_at_eos=False, request_id=rid,
                                       on_token=None if warm else _first_tok_cb(i))
                    if s is None:
                        break
                    pend.pop(0)
                    submitted.add(rid)
                    if not warm:
                        t_first[i] = time.time()
                batcher.step()
                for s in batcher.slots:
                    if s.state == "free" and s.request_id in submitted \
                            and s.request_id not in done:
                        done.add(s.request_id)
                        if not warm:
                            t_done[int(s.request_id[1:])] = time.time()
            return time.time() - t0

        run_serve(warm=True)  # compile prefill-chunk + cycle programs
        wall = run_serve(warm=False)
        total_tokens = args.serve * args.serve_tg
        per_req = [
            args.serve_tg / (t_done[i] - t_first[i]) for i in range(args.serve)
        ]
        mode = "paged" if args.paged else "dense"
        ttft = sorted(t_tok1[i] - t_arr[i] for i in t_tok1)
        row = {
            "test": f"serve {mode} b{b} r{args.serve} pp{args.serve_pp} tg{args.serve_tg}",
            "t/s": round(total_tokens / wall, 1),
            "per-req t/s": round(float(np.mean(per_req)), 1),
            # arrival -> first emitted token, over all requests (BASELINE.md's
            # p50 TTFT target row); includes time queued in the bench's pend
            # list before submit() admits the request AND queueing behind
            # busy slots after admission
            "ttft_p50_ms": round(1e3 * ttft[len(ttft) // 2], 1),
            "ttft_p95_ms": round(1e3 * ttft[int(len(ttft) * 0.95)], 1),
        }
        if args.paged:
            row["prefix_hits"] = batcher.stats["prefix_hits"]
            row["prefill_skipped"] = batcher.stats["prefill_tokens_skipped"]
            row["pages"] = args.serve_pages or "full"
        rows.append(row)
        print(f"# {rows[-1]}", file=sys.stderr, flush=True)

    if args.json:
        print(json.dumps(rows))
    else:
        for r in rows:
            print(" | ".join(f"{k}: {v}" for k, v in r.items()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
