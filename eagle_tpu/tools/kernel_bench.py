"""Quantized-matmul kernel microbenchmarks (decode roofline study).

Separates the three candidate costs of the fused dequant-matmul on the decode
path: HBM streaming (roofline), VPU dequantization work (shift/mask/convert/
scale per weight), and per-pallas-call fixed overhead. Each variant runs the
same logical matmul x[B,K] @ W[K,N] chained n times inside ONE jitted scan
(weights threaded as arguments, never closure constants) so relay sync cost
cancels in the slope.

Usage: python -m eagle_tpu.tools.kernel_bench [--variants v1,v2,...]
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=11008)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--group", type=int, default=32)
    ap.add_argument("--small", type=int, default=64)
    ap.add_argument("--big", type=int, default=512)
    ap.add_argument("--variants", default="packed,int8,int4,dense,split4")
    args = ap.parse_args(argv)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from ..ops.pallas_qmm import qmatmul_pallas_2d
    from ..quant.qtensor import QTensor

    K, N, B, G = args.k, args.n, args.b, args.group
    rng = np.random.default_rng(0)

    q_codes = rng.integers(0, 16, size=(K, N), dtype=np.int8)
    scale = (rng.standard_normal((K // G, N)) * 0.01).astype(np.float32)
    bias = (rng.standard_normal((K // G, N)) * 0.001).astype(np.float32)

    # ALL packing in numpy first; upload each buffer exactly once (the relay
    # moves ~20 MB/s and device->host downloads are worse — never round-trip)
    scale_bf = jnp.asarray(scale.astype(np.float32), jnp.bfloat16)
    bias_bf = jnp.asarray(bias.astype(np.float32), jnp.bfloat16)
    qt_int8 = QTensor(q=jnp.asarray(q_codes), scale=scale_bf, bias=bias_bf,
                      group=G, layout="kn")
    half = G // 2
    q_np = q_codes.astype(np.uint8).reshape(K // G, G, N)
    packed_np = (q_np[:, :half] | (q_np[:, half:] << 4)).reshape(K // 2, N)
    qt_packed = QTensor(q=jnp.asarray(packed_np.view(np.int8)), scale=scale_bf,
                        bias=bias_bf, group=G, layout="kn", packed=True)
    # int4 dtype variant: hardware does the nibble unpack in the convert.
    # (convert to int4 on device — the relay's host int4 path recurses)
    q_i4 = jax.jit(lambda a: (a - 8).astype(jnp.int4))(qt_int8.q)
    qt_i4 = QTensor(q=q_i4, scale=scale_bf, bias=bias_bf, group=G, layout="kn")
    w_dense = jnp.asarray((rng.standard_normal((K, N)) * 0.01).astype(np.float32),
                          jnp.bfloat16)

    x0 = jnp.asarray(rng.standard_normal((B, K)) * 0.1, jnp.float32)

    def chain(matmul_fn, n_steps, prepare=None, with_step=False):
        # weights are jit ARGUMENTS (closure capture would bake GB-scale
        # constants into the program and force host transfers)
        def run(x, *weights):
            if prepare is not None:  # one-time transform, amortized over scan
                weights = prepare(*weights)

            def step(x, i):
                out = matmul_fn(x, i, *weights) if with_step else matmul_fn(x, *weights)
                # fold output back: depends on every output element, bounded
                x = x + jnp.tanh(jnp.sum(out, axis=-1, keepdims=True)) * 1e-3
                return x, None

            x, _ = jax.lax.scan(step, x, jnp.arange(n_steps, dtype=jnp.int32))
            return jnp.sum(x)

        return run

    def bench(name, matmul_fn, weights, bytes_per_call, prepare=None, with_step=False):
        fns = {}
        for n_steps in (args.small, args.big):
            fns[n_steps] = jax.jit(chain(matmul_fn, n_steps, prepare, with_step))
        times = {args.small: [], args.big: []}
        for n_steps, f in fns.items():  # compile both first
            np.asarray(f(x0, *weights))
        for _ in range(3):
            for n_steps, f in fns.items():
                t0 = time.time()
                np.asarray(f(x0, *weights))
                times[n_steps].append(time.time() - t0)
        per = (min(times[args.big]) - min(times[args.small])) / (args.big - args.small)
        gbs = bytes_per_call / per / 1e9
        print(f"{name:>10}: {per*1e6:8.1f} us/call  {gbs:7.1f} GB/s effective", flush=True)
        return per

    sdt = 2  # bf16 scales+bias
    bytes_q4 = K * N // 2 + (K // G) * N * sdt * 2
    bytes_q8 = K * N + (K // G) * N * sdt * 2
    bytes_dense = K * N * 2

    variants = args.variants.split(",")
    if "dense" in variants:
        bench("dense-bf16",
              lambda x, w: jax.lax.dot_general(
                  x.astype(jnp.bfloat16), w,
                  dimension_numbers=(((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32),
              (w_dense,), bytes_dense)
    if "packed" in variants:
        bench("q4-packed", lambda x, w: qmatmul_pallas_2d(x, w), (qt_packed,), bytes_q4)
    if "nosplit" in variants:
        # concat-based dequant (the default; split-dot is an opt-in dead end
        # — EAGLE_TPU_QMM_SPLIT=1, measured slower, see BENCHMARKS.md)
        bench("q4-nosplit", lambda x, w: qmatmul_pallas_2d(x, w, split=False),
              (qt_packed,), bytes_q4)
    if "split" in variants:
        bench("q4-split", lambda x, w: qmatmul_pallas_2d(x, w, split=True),
              (qt_packed,), bytes_q4)
    if {"coded", "codedsplit", "codedres"} & set(variants):
        # coded-scales (bit-exact) mode: u8 codes + f32 super-scales; K must be
        # a multiple of 256 (Q4_K super-blocks)
        codes = rng.integers(1, 64, size=(K // G, N)).astype(np.int8)
        mcodes = rng.integers(0, 64, size=(K // G, N)).astype(np.int8)
        sup = (np.abs(rng.standard_normal((K // 256, N))) * 0.01 + 1e-3).astype(np.float32)
        supm = (np.abs(rng.standard_normal((K // 256, N))) * 1e-3).astype(np.float32)
        qt_coded = QTensor(q=jnp.asarray(packed_np.view(np.int8)),
                           scale=jnp.asarray(codes), bias=jnp.asarray(mcodes),
                           group=G, layout="kn", packed=True,
                           sup=jnp.asarray(sup), sup_min=jnp.asarray(supm))
        bytes_coded = K * N // 2 + (K // G) * N * 2 + (K // 256) * N * 8
        if "coded" in variants:
            bench("q4-coded", lambda x, w: qmatmul_pallas_2d(x, w, split=False),
                  (qt_coded,), bytes_coded)
        if "codedres" in variants:
            # resident-bias coded variant: one full-K bias reconstruct+dot
            # per tile column instead of a per-step streamed side-dot
            bench("q4-codedres",
                  lambda x, w: qmatmul_pallas_2d(x, w, split=False,
                                                 coded_resident=True),
                  (qt_coded,), bytes_coded)
        if "codedsplit" in variants:
            bench("q4-codedsp", lambda x, w: qmatmul_pallas_2d(x, w, split=True),
                  (qt_coded,), bytes_coded)
    if "int8" in variants:
        bench("q4-int8", lambda x, w: qmatmul_pallas_2d(x, w), (qt_int8,), bytes_q8)
    if "int4" in variants:
        from ..ops.pallas_qmm import qmatmul_pallas_2d_i4

        # the relay cannot pass S4 jit arguments (device_put recursion); ship
        # int8 codes and convert once inside the jit — amortized over the scan
        bench(
            "q4-int4dt",
            lambda x, wq: qmatmul_pallas_2d_i4(x, wq),
            (qt_int8,), bytes_q4,
            prepare=lambda w8: (
                QTensor(q=(w8.q - 8).astype(jnp.int4), scale=w8.scale,
                        bias=w8.bias, group=G, layout="kn"),
            ),
        )
    if "stacked" in variants:
        # the decode path's layer-indexed scalar-prefetch kernel, L=2 stack,
        # alternating layer per step — isolates the prefetch-vs-2d cost
        from ..ops.pallas_qmm import qmatmul_pallas_stacked

        q2 = np.stack([packed_np.view(np.int8)] * 2)
        s2 = np.stack([scale] * 2).astype(np.float32)
        b2 = np.stack([bias] * 2).astype(np.float32)
        qt_st = QTensor(q=jnp.asarray(q2), scale=jnp.asarray(s2, jnp.bfloat16),
                        bias=jnp.asarray(b2, jnp.bfloat16), group=G, layout="kn",
                        packed=True)
        bench("q4-stacked",
              lambda x, i, w: qmatmul_pallas_stacked(x, w, i % 2),
              (qt_st,), bytes_q4, with_step=True)
    if "i4stacked" in variants:
        from ..ops.pallas_qmm import qmatmul_pallas_stacked_i4

        q8_2 = np.stack([q_codes] * 2)
        s2 = np.stack([scale] * 2).astype(np.float32)
        # fold the -8 zero-point into the bias (w = s*(c-8) + (b+8s))
        b2 = np.stack([bias + 8.0 * scale] * 2).astype(np.float32)
        # the relay can't pass S4 jit arguments (device_put recursion): ship
        # int8 codes and convert once inside the jit, amortized over the scan
        qt_i8st = QTensor(q=jnp.asarray(q8_2), scale=jnp.asarray(s2, jnp.bfloat16),
                          bias=jnp.asarray(b2, jnp.bfloat16), group=G, layout="kn")
        bench("q4-i4stack",
              lambda x, i, w: qmatmul_pallas_stacked_i4(x, w, i % 2),
              (qt_i8st,), bytes_q4, with_step=True,
              prepare=lambda w8: (QTensor(
                  q=(w8.q - 8).astype(jnp.int4), scale=w8.scale, bias=w8.bias,
                  group=G, layout="kn"),))
    if "tiles" in variants:
        # tile-size sweep on the packed kernel: fewer/larger grid steps won
        # in the split4 probe — find the sweet spot
        # valid tile_n for N=11008 (divisor + 128-multiple): 256, 5504, 11008
        for tn, tk in ((256, 2048), (256, 4096), (5504, 512), (5504, 1024),
                       (5504, 2048)):
            try:
                bench(f"q4 tn={tn} tk={tk}",
                      lambda x, w, tn=tn, tk=tk: qmatmul_pallas_2d(
                          x, w, tile_n=tn, tile_k=tk),
                      (qt_packed,), bytes_q4)
            except Exception as e:
                print(f"q4 tn={tn} tk={tk}: FAILED {type(e).__name__}", flush=True)
    if "split4" in variants:
        # pre-slice ON DEVICE once; the 4 sub-tensors are separate jit args so
        # each scan step launches 4 pallas calls over quarter-width weights
        quarters = tuple(
            QTensor(
                q=jax.jit(lambda q, i=i: q[:, i * N // 4:(i + 1) * N // 4])(qt_packed.q),
                scale=jax.jit(lambda s, i=i: s[:, i * N // 4:(i + 1) * N // 4])(qt_packed.scale),
                bias=jax.jit(lambda b, i=i: b[:, i * N // 4:(i + 1) * N // 4])(qt_packed.bias),
                group=G, layout="kn", packed=True,
            )
            for i in range(4)
        )
        bench(
            "q4-split4",
            lambda x, *ws: jnp.concatenate(
                [qmatmul_pallas_2d(x, w) for w in ws], axis=-1
            ),
            quarters, bytes_q4,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
