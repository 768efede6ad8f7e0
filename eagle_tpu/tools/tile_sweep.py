"""Per-shape (tile_n, tile_k) sweep for the stacked qmm kernel on TPU.

Calibrates the kernel-time model used by ops.pallas_qmm._pick_tiles_2d:

    t = bytes/BW_stream + first_block_bytes/BW_stream (ramp) + C_STEP*steps + C_FIX

The ramp term exists because the first weight block's DMA cannot overlap any
compute; grid steps after that are double-buffered. Minimizing *steps* (the
round-1 objective) makes blocks huge and the ramp dominate — the measured
"2-step pipeline bubble" on the down projection (NOTES.md).

Usage: python -m eagle_tpu.tools.tile_sweep [--shapes qkv,wo,gu,down]
"""

from __future__ import annotations

import argparse
import pathlib
import time


SHAPES = {
    "qkv": (4096, 12288),
    "wo": (4096, 4096),
    "gu": (4096, 22016),
    "down": (11008, 4096),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="qkv,wo,gu,down")
    ap.add_argument("--kn", action="append", default=[], metavar="K,N",
                    help="extra custom shapes, e.g. --kn 5120,27648 (13B gu)")
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--group", type=int, default=32)
    ap.add_argument("--small", type=int, default=64)
    ap.add_argument("--big", type=int, default=512)
    ap.add_argument("--coded", action="store_true",
                    help="sweep the coded-scales serving layout (u8 codes + "
                    "f32 super-scales) instead of bf16 products")
    ap.add_argument("--top", type=int, default=0,
                    help="prune to the kernel-time model's TOP ranked "
                    "candidates (+ whole-K variants); 0 = sweep everything")
    ap.add_argument("--cand", action="append", default=[], metavar="TN,TK",
                    help="sweep ONLY these explicit candidates (refinement "
                    "runs around a previous sweep's winners); skipped for "
                    "shapes they don't divide")
    args = ap.parse_args(argv)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ..ops.pallas_qmm import _valid_tiles, qmatmul_pallas_stacked
    from ..quant.qtensor import QTensor

    B, G = args.b, args.group
    rng = np.random.default_rng(0)

    shapes = {n: SHAPES[n] for n in args.shapes.split(",") if n}
    for kn in args.kn:
        k, n = (int(v) for v in kn.split(","))
        shapes[f"{k}x{n}"] = (k, n)
    for shape_name, (K, N) in shapes.items():
        q_codes = rng.integers(0, 16, size=(K, N), dtype=np.int8)
        half = G // 2
        q_np = q_codes.astype(np.uint8).reshape(K // G, G, N)
        packed = (q_np[:, :half] | (q_np[:, half:] << 4)).reshape(K // 2, N)
        if args.coded:
            # serving layout: u8 sub-scale codes + f32 per-256 super-scales
            scodes = rng.integers(1, 64, size=(K // G, N)).astype(np.int8)
            mcodes = rng.integers(0, 64, size=(K // G, N)).astype(np.int8)
            sup = (rng.uniform(0.5, 1.5, (K // 256, N)) * 3e-4).astype(np.float32)
            supm = (-rng.uniform(0.5, 1.5, (K // 256, N)) * 3e-4).astype(np.float32)
            qt = QTensor(
                q=jnp.asarray(np.stack([packed.view(np.int8)] * 2)),
                scale=jnp.asarray(np.stack([scodes] * 2)),
                bias=jnp.asarray(np.stack([mcodes] * 2)),
                sup=jnp.asarray(np.stack([sup] * 2)),
                sup_min=jnp.asarray(np.stack([supm] * 2)),
                group=G, layout="kn", packed=True,
            )
            bytes_q4 = K * N // 2 + (K // G) * N * 2 + (K // 256) * N * 4 * 2
        else:
            scale = (rng.standard_normal((K // G, N)) * 0.01).astype(np.float32)
            bias = (rng.standard_normal((K // G, N)) * 0.001).astype(np.float32)
            qt = QTensor(
                q=jnp.asarray(np.stack([packed.view(np.int8)] * 2)),
                scale=jnp.asarray(np.stack([scale] * 2), jnp.bfloat16),
                bias=jnp.asarray(np.stack([bias] * 2), jnp.bfloat16),
                group=G, layout="kn", packed=True,
            )
            bytes_q4 = K * N // 2 + (K // G) * N * 2 * 2
        x0 = jnp.asarray(rng.standard_normal((B, K)) * 0.1, jnp.float32)

        # candidate tiles: every (tn, tk) with ramp-friendly blocks <= ~8MB
        tns = _valid_tiles(N)
        tks = [t for t in _valid_tiles(K, 128)
               if t % G == 0 and ((t // G) % 8 == 0 or t == K)
               and (not args.coded or t % 256 == 0 or t == K)]
        cands = []
        for tn in tns:
            for tk in tks:
                qb = tk * tn // 2
                steps = (N // tn) * (K // tk)
                if qb > 9_000_000 or qb < 250_000 or steps > 64:
                    continue
                cands.append((tn, tk))
        if args.cand:
            want = [tuple(int(v) for v in c.split(",")) for c in args.cand]
            cands = [
                (tn, tk) for tn, tk in dict.fromkeys(want)
                if N % tn == 0 and K % tk == 0 and tk % G == 0
                and ((tk // G) % 8 == 0 or tk == K)
                and (not args.coded or tk % 256 == 0 or tk == K)
            ]
        elif args.top:
            from ..ops.pallas_qmm import _score_tiles_2d

            ranked = [c for _, c in _score_tiles_2d(
                K, N, G, True, B, coded=args.coded, has_bias=True)]
            keep = [c for c in ranked if c in cands][: args.top]
            # + the best whole-K variant by model rank (the old forced path)
            whole = next((c for c in ranked if c[1] == K), None)
            if whole and whole not in keep:
                keep.append(whole)
            cands = keep

        def chain(n_steps, tn, tk):
            def run(x, w):
                def step(x, i):
                    out = qmatmul_pallas_stacked(x, w, i % 2, tile_n=tn, tile_k=tk)
                    return x + jnp.tanh(jnp.sum(out, -1, keepdims=True)) * 1e-3, None

                x, _ = jax.lax.scan(step, x, jnp.arange(n_steps, dtype=jnp.int32))
                return jnp.sum(x)

            return jax.jit(run)

        print(f"== {shape_name} K={K} N={N} ({bytes_q4/1e6:.1f} MB) ==", flush=True)
        results = []
        for tn, tk in cands:
            try:
                fs = chain(args.small, tn, tk)
                fb = chain(args.big, tn, tk)
                np.asarray(fs(x0, qt)); np.asarray(fb(x0, qt))
                ts, tb = [], []
                for _ in range(3):
                    t0 = time.time(); np.asarray(fs(x0, qt)); ts.append(time.time() - t0)
                    t0 = time.time(); np.asarray(fb(x0, qt)); tb.append(time.time() - t0)
                per = (min(tb) - min(ts)) / (args.big - args.small)
                gbs = bytes_q4 / per / 1e9
                steps = (N // tn) * (K // tk)
                results.append((per, tn, tk))
                print(f"  tn={tn:>6} tk={tk:>6} steps={steps:>3}: "
                      f"{per*1e6:7.1f} us  {gbs:6.1f} GB/s", flush=True)
            except Exception as e:  # noqa: BLE001 — sweep must survive bad tiles
                print(f"  tn={tn:>6} tk={tk:>6}: FAILED {type(e).__name__}", flush=True)
        if results:
            per, tn, tk = min(results)
            print(f"  BEST: tn={tn} tk={tk} {per*1e6:.1f} us "
                  f"({bytes_q4/per/1e9:.1f} GB/s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
