"""Fused dequant + matmul Pallas kernels.

The TPU replacement for ggml's fused quant vec_dot kernels
(ggml-cpu-quants.c:6266 ggml_vec_dot_q4_K_q8_K and the CUDA mmq/mmvq family):
weights stream HBM->VMEM in quantized form, dequantize on the VPU inside the
kernel (never materialized in HBM), and feed the MXU.

Layout: QTensor "kn" — q [K, N] int8, scale/bias [K/G, N] f32. The group
broadcast then splits the sublane (K) axis by G (free when G % 8 == 0), and
the MXU contracts K directly: no transposes, no lane shuffles.

Decode (small B) is HBM-bandwidth-bound: the roofline is set by bytes of q +
scale streamed per token. Grid is (N tiles, K tiles); K tiles accumulate into
the f32 output block (revisited output, Pallas keeps it in VMEM across the
inner grid dimension)."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.qtensor import QTensor

#: split-dot dequant for nibble-packed weights: instead of concatenating the
#: lo/hi nibble planes along sublanes, scale each plane in place and contract
#: each against the matching half of x in its own MXU dot. MEASURED DEAD END
#: on v5e (2026-08-20, kernel_bench nosplit vs split at 4096x11008 b8):
#: 548.6 vs 444.9 GB/s effective (coded: 488.3 vs 362.6) — the two scale
#: broadcasts + double dot issue cost more than the concat relayout Mosaic
#: was apparently already folding. Kept for the record; off by default.
_SPLIT_DEFAULT = os.environ.get("EAGLE_TPU_QMM_SPLIT", "0") not in ("0", "false")

#: coded-scales bias handling: per-step streamed code blocks + transposed
#: group-sum side-dot (0, the shipping default) vs full-K RESIDENT min-code /
#: super-min blocks with ONE reconstruct+dot on the first K step (1) — the
#: resident layout mirrors the non-coded bias path (the mcodes byte stream is
#: tiny: K/G x TILE_N u8), trading a little VMEM residency for fewer DMA
#: streams and one bias dot per tile column instead of one per K step.
_CODED_RESIDENT_BIAS = os.environ.get(
    "EAGLE_TPU_CODED_RESIDENT_BIAS", "0") not in ("0", "false")


def _split_x_halves(x: jax.Array, g: int) -> jax.Array:
    """[B, K] -> [2B, K/2]: rows 0..B hold the lo-nibble positions of every
    group (k % g < g/2), rows B..2B the hi positions — matching the packed
    nibble layout (QTensor.pack_nibbles: packed row j of a group holds values
    (j, j + g/2) in (lo, hi))."""
    b, k = x.shape
    half = g // 2
    xg = x.reshape(b, k // g, g)
    return jnp.concatenate(
        [xg[:, :, :half].reshape(b, k // 2), xg[:, :, half:].reshape(b, k // 2)], axis=0
    )


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tile(dim: int, target: int, multiple_of: int = 1) -> int:
    """Largest divisor of `dim` that is <= target and a multiple of `multiple_of`."""
    best = multiple_of
    d = multiple_of
    while d <= min(dim, target):
        if dim % d == 0:
            best = d
        d += multiple_of
    return best


def _valid_tiles(dim: int, multiple_of: int = 128) -> list[int]:
    """Divisors of `dim` that are multiples of `multiple_of` (plus dim itself)."""
    out = [d for d in range(multiple_of, dim + 1, multiple_of) if dim % d == 0]
    if dim not in out:
        out.append(dim)
    return out


#: v5e has 128 MiB of VMEM; XLA's default *scoped* limit is only 16 MiB, so
#: every qmm pallas_call raises it explicitly (CompilerParams.vmem_limit_bytes)
#: to match the tile budget below. Leaving ~2x headroom over the budget keeps
#: the compiler's own stack allocations (staged full outputs etc.) safe.
_VMEM_BUDGET = 30_000_000
_VMEM_LIMIT = 2 * _VMEM_BUDGET


#: EAGLE_TPU_DIMSEM=1: declare the qmm grid's N dimension "parallel" (output
#: tiles independent) and K "arbitrary" (accumulating) so Mosaic may
#: reorder/overlap across N tiles — a calibrated experiment for the 13B
#: in-situ-vs-isolated kernel gap (BENCHMARKS.md round-5 13B analysis)
_DIMSEM = os.environ.get("EAGLE_TPU_DIMSEM", "0") not in ("0", "false")


def _compiler_params():
    if _DIMSEM:
        return pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "arbitrary"),
        )
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


#: kernel-time model constants, calibrated against a (tile_n, tile_k) sweep
#: on v5e (tools/tile_sweep.py, 2026-08-18): achievable stream bandwidth for
#: the fused dequant-matmul, per-grid-step overhead, and the extra cost of a
#: K-split revisiting its output block (accumulate read-modify-write + the
#: pl.when branch). Sum of picked-config times across the four 7B decode
#: shapes lands within 3.1 us of the sweep's true optima (vs +35 us/layer for
#: the round-1 minimize-steps objective, which chose single-step grids whose
#: first-block DMA ramp was unoverlapped — the "down 2-step bubble").
_BW_STREAM = 600e9
_C_STEP = 0.1e-6
_C_KREV = 0.3e-6


def _score_tiles_2d(k: int, n: int, g: int, packed: bool, b: int = 8,
                    coded: bool = False, has_bias: bool = True
                    ) -> list[tuple[float, tuple[int, int]]]:
    """All legal (tile_n, tile_k) candidates with their MODELED kernel time,
    ascending (see _pick_tiles_2d). Used by the picker and by
    tools/tile_sweep.py to prune measured sweeps to the model's top ranks."""
    n_tiles = _valid_tiles(n) if n % 128 == 0 else [n]
    if k % 128 == 0 and (128 % g == 0 or k % 128 == 0):
        # the scale/bias blocks have sublane extent tile_k/g — Mosaic requires
        # it divisible by 8 unless the block spans the whole array; coded mode
        # additionally slices the resident super-scale by tile_k/256 rows
        k_tiles = [
            t for t in _valid_tiles(k)
            if t % g == 0 and ((t // g) % 8 == 0 or t == k)
            # coded: per-step codes reshape to (t/256, 256/g, tn) -> t must
            # cover whole 256-blocks; the sup slice itself is alignment-free
            # (aligned dynamic slice when t % 2048 == 0, one-hot matmul
            # fallback otherwise — _qmm_kernel._step_rows)
            and (not coded or t % 256 == 0 or t == k)
        ] or [k]
    else:
        k_tiles = [k]
    budget = _VMEM_BUDGET
    # XLA may stage the kernel's FULL output on the vmem stack when it fits
    # (observed at prefill b=128: f32[128,22016] stack-allocated) — account
    # for it or the kernel blocks must shrink accordingly
    full_out = b * n * 4
    staged_out = full_out if full_out <= 12_000_000 else 0
    scored = []
    fallback = None
    for tn in n_tiles:
        for tk in k_tiles:
            qb = tk * tn * (1 if not packed else 0.5)
            if coded:
                # u8 codes per group (x2 with min codes) + f16 super-scales
                # resident per n-tile + per-step transposed group-sums
                sb = (tk // g) * tn * (2 if has_bias else 1)
                sb += (k // 256) * tn * 4 * (2 if has_bias else 1) / max(k // tk, 1)
                sb += (tk // g) * b * 4 if has_bias else 0
            else:
                sb = (tk // g) * tn * 2 * (2 if has_bias else 1)  # bf16 products
            xb = b * tk * 4
            ob = b * tn * 4
            vmem = 2 * (qb + sb + xb) + 2 * ob + staged_out
            steps = (n // tn) * (k // tk)
            k_revisits = (n // tn) * (k // tk - 1)
            w_traffic = (qb + sb) * steps
            x_traffic = b * 4 * k * (n // tn)
            score = (
                (w_traffic + x_traffic + b * n * 4 + qb + sb + xb) / _BW_STREAM
                + _C_STEP * steps
                + _C_KREV * k_revisits
            )
            if fallback is None or (qb + sb + xb + ob) < fallback[0]:
                fallback = (qb + sb + xb + ob, (tn, tk))
            if vmem > budget:
                continue
            scored.append((score, (tn, tk)))
    if not scored:  # nothing fits the model: smallest-footprint blocks
        return [(float("inf"), fallback[1])]
    return sorted(scored)


#: measured overrides: (k, n, g, packed, b, coded, has_bias) -> (tn, tk).
#: Filled from tools/tile_sweep.py runs where the calibrated model's pick
#: measurably loses to a swept configuration on real hardware.
#: 13B decode shapes (v5e, 2026-08-21, tile_sweep_13b_r5{,b}.log, coded
#: serving layout, b=8): narrow-N/deep-K tiles beat the model's picks by
#: 10-35% — qkv 73.5us vs 87.1, wo 22.9 vs 30.8, gate_up 131.6 vs 141.7,
#: down 75.1 vs 93.2 (the model's 7B-calibrated ramp/step constants do not
#: transfer to these shapes).
_TILE_OVERRIDES: dict[tuple, tuple[int, int]] = {
    (5120, 15360, 32, True, 8, True, True): (1024, 5120),   # 13B wqkv
    (5120, 5120, 32, True, 8, True, True): (5120, 1280),    # 13B wo
    (5120, 27648, 32, True, 8, True, True): (512, 5120),    # 13B gate_up
    (13824, 5120, 32, True, 8, True, True): (512, 13824),   # 13B down
}


@functools.lru_cache(maxsize=None)
def _pick_tiles_2d(k: int, n: int, g: int, packed: bool, b: int = 8,
                   coded: bool = False, has_bias: bool = True) -> tuple[int, int]:
    """Choose (tile_n, tile_k) minimizing MODELED kernel time under a VMEM
    budget:

        t = (weight + x + out traffic)/BW        -- streaming
          + first_block/BW                       -- pipeline ramp (unoverlapped)
          + C_STEP * steps + C_KREV * k_revisits -- per-step overheads

    x is re-fetched once per n-tile (its block index cycles with the K grid
    dim), so large b (prefill) pushes toward wide tile_n; the ramp term pushes
    toward ~1-3 MB blocks instead of the budget-filling single-step grids the
    round-1 picker chose.  Measured sweep overrides take precedence."""
    if os.environ.get("EAGLE_TPU_TILE_OVERRIDES", "1") not in ("0", "false"):
        ov = _TILE_OVERRIDES.get((k, n, g, packed, b, coded, has_bias))
        if ov is not None:
            return ov
    return _score_tiles_2d(k, n, g, packed, b, coded, has_bias)[0][1]


def _qmm_kernel(x_ref, q_ref, s_ref, b_ref, o_ref, *, group: int, compute_dtype,
                packed: bool, xs_ref=None, sup_ref=None, supmin_ref=None,
                xst_ref=None, split: bool = False):
    """One (TILE_K, TILE_N) weight tile: dequant on VPU, matmul on MXU.

    x: [B, TILE_K]; q: [TILE_K, TILE_N] int8 (or [TILE_K/2, TILE_N] nibble-
    packed); s, b: [TILE_K/G, TILE_N] f32; o: [B, TILE_N] f32 (accumulated
    across the K grid dim).

    The per-group bias never touches the per-weight dequant: since b is
    constant within a group, x @ broadcast(b) == xsum_g @ b with
    xsum_g[b, g] = sum of x over group g — a [B, TK/G] x [TK/G, TN] side dot
    (xs_ref, computed outside the kernel). That removes one add and one
    sublane-broadcast per weight from the VPU hot loop, which is the measured
    wall (NOTES.md round-2 kernel findings).

    Coded-scale mode (sup_ref given): s/b blocks carry raw u8 sub-scale codes
    (HALF the HBM bytes of bf16 products) and the f32 scale is reconstructed
    here as  sup[k//256] * code[k//G]  — per-GROUP work, 1/G of the per-weight
    dequant, and bit-exact with ggml's f32 d*sc. sup_ref/supmin_ref are tiny
    full-K resident blocks sliced by the K grid step; the bias side-dot runs
    per step against xst_ref ([TILE_K/G, B] transposed group-sums, streamed
    per step — lane-dim rules forbid slicing the [B, K/G] layout)."""
    lo = hi = None
    if packed:
        tkp, tn = q_ref.shape
        tk = 2 * tkp
        half = group // 2
        # Mosaic lacks i8 shifts; widen to i32 for the nibble extraction
        p = q_ref[:].reshape(tk // group, half, tn).astype(jnp.int32)
        lo = p & 0xF  # 0..15
        hi = (p >> 4) & 0xF  # mask kills the sign-extension of the arith shift
        if not split:
            w = jnp.concatenate([lo, hi], axis=1).astype(jnp.float32)
    else:
        tk, tn = q_ref.shape
        w = q_ref[:].astype(jnp.float32).reshape(tk // group, group, tn)
    if sup_ref is not None:
        rows = tk // 256
        per = 256 // group
        j = pl.program_id(1)

        def _step_rows(ref):
            """This K step's [rows, TN] slice of a resident full-K per-256
            block. Mosaic only accepts dynamic sublane offsets it can prove
            8-aligned, so when rows % 8 != 0 (tile_k % 2048 != 0 — the 13B
            K=5120/13824 shapes have no 2048-multiple divisors) the slice is
            realized as a one-hot matmul instead: sel[r, rf] = (rf == j*rows
            + r), sel @ block — rows x rows_full x TN MACs, noise next to the
            tile dot, and it lifts the old K % 2048 tile restriction."""
            if ref.shape[0] == rows:  # single K step: whole block, static
                return ref[:].astype(jnp.float32)
            if rows % 8 == 0:  # provably aligned dynamic slice
                return ref[pl.ds(pl.multiple_of(j * rows, 8), rows)].astype(
                    jnp.float32)
            rows_full = ref.shape[0]
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (rows, rows_full), 0)
                + j * rows
                == jax.lax.broadcasted_iota(jnp.int32, (rows, rows_full), 1)
            ).astype(jnp.float32)
            return jax.lax.dot_general(
                sel, ref[:].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        sup = _step_rows(sup_ref)
        codes = s_ref[:].astype(jnp.float32).reshape(rows, per, tn)
        scale = (sup[:, None, :] * codes).reshape(tk // group, tn)
    else:
        scale = s_ref[:].astype(jnp.float32)
    if packed and split:
        # split-dot path: x_ref is [2B, TK/2] (lo rows then hi rows, prepared
        # by _split_x_halves); scale each nibble plane and contract without
        # ever materializing the concatenated weight tile
        sc = scale[:, None, :]
        wlo = (lo.astype(jnp.float32) * sc).reshape(tkp, tn).astype(compute_dtype)
        whi = (hi.astype(jnp.float32) * sc).reshape(tkp, tn).astype(compute_dtype)
        nb = o_ref.shape[0]
        xs2 = x_ref[:].astype(compute_dtype)
        acc = jax.lax.dot_general(
            xs2[:nb], wlo,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            xs2[nb:], whi,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        w = w * scale[:, None, :]
        w = w.reshape(tk, tn).astype(compute_dtype)
        acc = jax.lax.dot_general(
            x_ref[:].astype(compute_dtype),
            w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if sup_ref is not None and b_ref is not None and xs_ref is not None:
        # RESIDENT coded bias (EAGLE_TPU_CODED_RESIDENT_BIAS=1): min codes +
        # super-mins stay resident over the FULL K extent (tiny: K/G x TN u8
        # + K/256 x TN f32), so the bias matrix is reconstructed ONCE and
        # folded with one whole-K dot on the first K step — the non-coded
        # bias path's shape, with the in-kernel reconstruct standing in for
        # the f32 product stream.
        kg_full = b_ref.shape[0]
        rows_full = supmin_ref.shape[0]

        @pl.when(pl.program_id(1) == 0)
        def _():
            supm_f = supmin_ref[:].astype(jnp.float32)
            mcodes_f = b_ref[:].astype(jnp.float32).reshape(
                rows_full, kg_full // rows_full, tn)
            bias_full = (supm_f[:, None, :] * mcodes_f).reshape(kg_full, tn)
            o_ref[:] = acc + jax.lax.dot_general(
                xs_ref[:].astype(compute_dtype),
                bias_full.astype(compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(pl.program_id(1) != 0)
        def _():
            o_ref[:] = o_ref[:] + acc
    elif sup_ref is not None and b_ref is not None:
        # coded bias: reconstruct this tile's [TK/G, TN] bias and fold it via
        # a per-step side-dot (streams 1 byte/group/step; the resident
        # variant above is the measured alternative)
        supm = _step_rows(supmin_ref)
        mcodes = b_ref[:].astype(jnp.float32).reshape(rows, per, tn)
        bias_mat = (supm[:, None, :] * mcodes).reshape(tk // group, tn)
        acc = acc + jax.lax.dot_general(
            xst_ref[:].astype(compute_dtype),
            bias_mat.astype(compute_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(pl.program_id(1) == 0)
        def _():
            o_ref[:] = acc

        @pl.when(pl.program_id(1) != 0)
        def _():
            o_ref[:] = o_ref[:] + acc
    elif b_ref is not None:
        # xs_ref and b_ref carry the FULL K/G group extent (K/G is rarely
        # 128-aligned, so neither can be block-split along it; both blocks
        # stay resident across the K grid steps). One whole-K bias dot on the
        # first K step covers every group.
        @pl.when(pl.program_id(1) == 0)
        def _():
            o_ref[:] = acc + jax.lax.dot_general(
                xs_ref[:].astype(compute_dtype),
                b_ref[:].astype(compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(pl.program_id(1) != 0)
        def _():
            o_ref[:] = o_ref[:] + acc
    else:
        @pl.when(pl.program_id(1) == 0)
        def _():
            o_ref[:] = acc

        @pl.when(pl.program_id(1) != 0)
        def _():
            o_ref[:] = o_ref[:] + acc


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "tile_n", "tile_k",
                              "split", "coded_resident")
)
def qmatmul_pallas_2d(
    x: jax.Array,  # [B, K]
    w: QTensor,  # layout "kn"
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    tile_n: int | None = None,
    tile_k: int | None = None,
    split: bool | None = None,
    coded_resident: bool | None = None,
) -> jax.Array:
    assert w.layout == "kn", "pallas qmatmul requires K-major layout"
    g = w.group
    if w.packed:
        kq, n = w.q.shape
        k = 2 * kq
    else:
        k, n = w.q.shape
    b = x.shape[0]
    coded = w.sup is not None
    has_bias = w.bias is not None
    split = (_SPLIT_DEFAULT if split is None else split) and w.packed
    resident = _CODED_RESIDENT_BIAS if coded_resident is None else coded_resident

    # Mosaic: block last dims must be multiples of (8-ish, 128) or span the
    # whole array; tile_k also must divide into whole quant groups.
    if tile_n is None and tile_k is None:
        tile_n, tile_k = _pick_tiles_2d(k, n, g, w.packed, b, coded, has_bias)
    else:
        tile_n = _pick_tile(n, tile_n or 256, 128) if n % 128 == 0 else n
        tile_k = _pick_tile(k, tile_k or 2048, 128) if k % 128 == 0 and (128 % g == 0 or k % 128 == 0) else k
    if tile_k % g != 0 or (coded and tile_k % 256 != 0 and tile_k != k):
        tile_k = k
    assert n % tile_n == 0 and k % tile_k == 0 and tile_k % g == 0, (n, k, tile_n, tile_k, g)

    grid = (n // tile_n, k // tile_k)

    q_block = (tile_k // 2, tile_n) if w.packed else (tile_k, tile_n)
    x_block = (
        pl.BlockSpec((2 * b, tile_k // 2), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        if split
        else pl.BlockSpec((b, tile_k), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    )
    in_specs = [
        x_block,
        pl.BlockSpec(q_block, lambda i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_k // g, tile_n), lambda i, j: (j, i), memory_space=pltpu.VMEM),
    ]
    args = [_split_x_halves(x, g) if split else x, w.q, w.scale]
    if coded:
        # resident full-K super-scales (tiny), per-step code blocks, per-step
        # TRANSPOSED group-sums for the bias side-dot (see _qmm_kernel); the
        # resident-bias variant instead keeps min codes + group-sums full-K
        in_specs.append(
            pl.BlockSpec((k // 256, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(w.sup)
        if has_bias and resident:
            in_specs.append(
                pl.BlockSpec((k // g, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM)
            )
            args.append(w.bias)
            in_specs.append(
                pl.BlockSpec((k // 256, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM)
            )
            args.append(w.sup_min)
            in_specs.append(
                pl.BlockSpec((b, k // g), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
            )
            args.append(x.reshape(b, k // g, g).sum(axis=-1))
        elif has_bias:
            in_specs.append(
                pl.BlockSpec((tile_k // g, tile_n), lambda i, j: (j, i), memory_space=pltpu.VMEM)
            )
            args.append(w.bias)
            in_specs.append(
                pl.BlockSpec((k // 256, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM)
            )
            args.append(w.sup_min)
            in_specs.append(
                pl.BlockSpec((tile_k // g, b), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
            )
            args.append(x.reshape(b, k // g, g).sum(axis=-1).T)
    elif has_bias:
        # full-K bias block (resident across K steps; see _qmm_kernel)
        in_specs.append(
            pl.BlockSpec((k // g, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(w.bias)
        # per-group sums of x for the factored-out bias dot (see _qmm_kernel);
        # whole-array block — K/G lane extents aren't 128-aligned in general
        in_specs.append(
            pl.BlockSpec((b, k // g), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(x.reshape(b, k // g, g).sum(axis=-1))

    def kernel(x_ref, q_ref, s_ref, *rest):
        sup_ref = supmin_ref = xst_ref = b_ref = xs_ref = None
        rest = list(rest)
        if coded:
            sup_ref = rest.pop(0)
            if has_bias and resident:
                b_ref, supmin_ref, xs_ref = rest[:3]
                rest = rest[3:]
            elif has_bias:
                b_ref, supmin_ref, xst_ref = rest[:3]
                rest = rest[3:]
        elif has_bias:
            b_ref, xs_ref = rest[:2]
            rest = rest[2:]
        (o_ref,) = rest
        _qmm_kernel(x_ref, q_ref, s_ref, b_ref, o_ref, group=g,
                    compute_dtype=compute_dtype, packed=w.packed, xs_ref=xs_ref,
                    sup_ref=sup_ref, supmin_ref=supmin_ref, xst_ref=xst_ref,
                    split=split)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=k * n + (k // g) * n * 4 * (2 if w.bias is not None else 1) + b * k * 4,
            transcendentals=0,
        ),
    )(*args)
    return out


def _qmm_kernel_i4(x_ref, q_ref, s_ref, b_ref, o_ref, *, group: int, compute_dtype):
    """int4-dtype variant: the nibble unpack is a hardware convert (i4 -> bf16)
    instead of widen/shift/mask/concat on the VPU.

    MEASURED SLOWER than the packed-int8 kernel on v5e (264 vs 383 GB/s
    effective, tools/kernel_bench.py) — the S4 loads/converts don't beat the
    manual dequant on this toolchain. Kept for the record."""
    tk, tn = q_ref.shape
    w = q_ref[:].astype(compute_dtype).reshape(tk // group, group, tn)
    w = w * s_ref[:].astype(compute_dtype)[:, None, :]
    if b_ref is not None:
        w = w + b_ref[:].astype(compute_dtype)[:, None, :]
    w = w.reshape(tk, tn)
    acc = jax.lax.dot_general(
        x_ref[:].astype(compute_dtype),
        w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = acc

    @pl.when(pl.program_id(1) != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "tile_n", "tile_k")
)
def qmatmul_pallas_2d_i4(
    x: jax.Array,  # [B, K]
    w: QTensor,  # layout "kn", q dtype int4
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    tile_n: int = 256,
    tile_k: int = 2048,
) -> jax.Array:
    assert w.layout == "kn" and w.q.dtype == jnp.int4
    g = w.group
    k, n = w.q.shape
    b = x.shape[0]
    tile_n = _pick_tile(n, tile_n, 128) if n % 128 == 0 else n
    tile_k = _pick_tile(k, tile_k, 128) if k % 128 == 0 and (128 % g == 0 or k % 128 == 0) else k
    if tile_k % g != 0:
        tile_k = k
    grid = (n // tile_n, k // tile_k)
    in_specs = [
        pl.BlockSpec((b, tile_k), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_k, tile_n), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_k // g, tile_n), lambda i, j: (j, i), memory_space=pltpu.VMEM),
    ]
    args = [x, w.q, w.scale]
    has_bias = w.bias is not None
    if has_bias:
        in_specs.append(
            pl.BlockSpec((tile_k // g, tile_n), lambda i, j: (j, i), memory_space=pltpu.VMEM)
        )
        args.append(w.bias)

    def kernel(x_ref, q_ref, s_ref, *rest):
        if has_bias:
            b_ref, o_ref = rest
        else:
            (o_ref,) = rest
            b_ref = None
        _qmm_kernel_i4(x_ref, q_ref, s_ref, b_ref, o_ref, group=g, compute_dtype=compute_dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=k * n // 2 + (k // g) * n * 2 * (2 if has_bias else 1) + b * k * 4,
            transcendentals=0,
        ),
    )(*args)


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "tile_n", "tile_k",
                              "split", "coded_resident")
)
def qmatmul_pallas_stacked(
    x: jax.Array,  # [B, K]
    w: QTensor,  # layout "kn", stacked: q [L, K(
    layer: jax.Array,  # scalar int32 — which layer's weights to use
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    tile_n: int | None = None,
    tile_k: int | None = None,
    split: bool | None = None,
    coded_resident: bool | None = None,
) -> jax.Array:
    """Layer-indexed matmul over layer-stacked weights.

    Inside lax.scan over layers, `stacked_weights[l]` becomes an XLA
    dynamic-slice that MATERIALIZES a copy of the whole layer (3x HBM traffic
    on the decode critical path — measured at +6.5ms/token on 7B). Here the
    layer index is a scalar-prefetch argument and the BlockSpec index_map
    addresses the stacked array directly: the kernel streams from the original
    buffer, no copy."""
    assert w.layout == "kn"
    g = w.group
    L = w.q.shape[0]
    if w.packed:
        _, kq, n = w.q.shape
        k = 2 * kq
    else:
        _, k, n = w.q.shape
    b = x.shape[0]
    coded = w.sup is not None
    has_bias = w.bias is not None
    split = (_SPLIT_DEFAULT if split is None else split) and w.packed
    resident = _CODED_RESIDENT_BIAS if coded_resident is None else coded_resident

    if tile_n is None and tile_k is None:
        tile_n, tile_k = _pick_tiles_2d(k, n, g, w.packed, b, coded, has_bias)
    else:
        tile_n = _pick_tile(n, tile_n or 256, 128) if n % 128 == 0 else n
        tile_k = _pick_tile(k, tile_k or 2048, 128) if k % 128 == 0 and (128 % g == 0 or k % 128 == 0) else k
    if tile_k % g != 0 or (coded and tile_k % 256 != 0 and tile_k != k):
        tile_k = k
    assert n % tile_n == 0 and k % tile_k == 0 and tile_k % g == 0

    grid = (n // tile_n, k // tile_k)
    q_block = (1, tile_k // 2, tile_n) if w.packed else (1, tile_k, tile_n)

    x_block = (
        pl.BlockSpec((2 * b, tile_k // 2), lambda i, j, l: (0, j), memory_space=pltpu.VMEM)
        if split
        else pl.BlockSpec((b, tile_k), lambda i, j, l: (0, j), memory_space=pltpu.VMEM)
    )
    # index_map signature: (*grid_ids, *scalar_prefetch_refs)
    in_specs = [
        x_block,
        pl.BlockSpec(q_block, lambda i, j, l: (l[0], j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_k // g, tile_n), lambda i, j, l: (l[0], j, i), memory_space=pltpu.VMEM),
    ]
    args = [_split_x_halves(x, g) if split else x, w.q, w.scale]
    if coded:
        in_specs.append(
            pl.BlockSpec((1, k // 256, tile_n), lambda i, j, l: (l[0], 0, i), memory_space=pltpu.VMEM)
        )
        args.append(w.sup)
        if has_bias and resident:
            in_specs.append(
                pl.BlockSpec((1, k // g, tile_n), lambda i, j, l: (l[0], 0, i), memory_space=pltpu.VMEM)
            )
            args.append(w.bias)
            in_specs.append(
                pl.BlockSpec((1, k // 256, tile_n), lambda i, j, l: (l[0], 0, i), memory_space=pltpu.VMEM)
            )
            args.append(w.sup_min)
            in_specs.append(
                pl.BlockSpec((b, k // g), lambda i, j, l: (0, 0), memory_space=pltpu.VMEM)
            )
            args.append(x.reshape(b, k // g, g).sum(axis=-1))
        elif has_bias:
            in_specs.append(
                pl.BlockSpec((1, tile_k // g, tile_n), lambda i, j, l: (l[0], j, i), memory_space=pltpu.VMEM)
            )
            args.append(w.bias)
            in_specs.append(
                pl.BlockSpec((1, k // 256, tile_n), lambda i, j, l: (l[0], 0, i), memory_space=pltpu.VMEM)
            )
            args.append(w.sup_min)
            in_specs.append(
                pl.BlockSpec((tile_k // g, b), lambda i, j, l: (j, 0), memory_space=pltpu.VMEM)
            )
            args.append(x.reshape(b, k // g, g).sum(axis=-1).T)
    elif has_bias:
        # full-K bias block (resident across K steps; see _qmm_kernel)
        in_specs.append(
            pl.BlockSpec((1, k // g, tile_n), lambda i, j, l: (l[0], 0, i), memory_space=pltpu.VMEM)
        )
        args.append(w.bias)
        in_specs.append(
            pl.BlockSpec((b, k // g), lambda i, j, l: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(x.reshape(b, k // g, g).sum(axis=-1))

    def kernel(l_ref, x_ref, q_ref, s_ref, *rest):
        sup_ref = supmin_ref = xst_ref = b_ref = xs_ref = None
        rest = list(rest)
        if coded:
            sup_ref = _squeeze_lead(rest.pop(0))
            if has_bias and resident:
                b_ref = _squeeze_lead(rest.pop(0))
                supmin_ref = _squeeze_lead(rest.pop(0))
                xs_ref = rest.pop(0)
            elif has_bias:
                b_ref = _squeeze_lead(rest.pop(0))
                supmin_ref = _squeeze_lead(rest.pop(0))
                xst_ref = rest.pop(0)
        elif has_bias:
            b_ref = _squeeze_lead(rest.pop(0))
            xs_ref = rest.pop(0)
        (o_ref,) = rest
        _qmm_kernel(
            x_ref,
            _squeeze_lead(q_ref),
            _squeeze_lead(s_ref),
            b_ref,
            o_ref,
            group=g,
            compute_dtype=compute_dtype,
            packed=w.packed,
            xs_ref=xs_ref,
            sup_ref=sup_ref,
            supmin_ref=supmin_ref,
            xst_ref=xst_ref,
            split=split,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, tile_n), lambda i, j, l: (0, i), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=(k // (2 if w.packed else 1)) * n + (k // g) * n * 4 + b * k * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), *args)
    return out


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "tile_n", "tile_k")
)
def qmatmul_pallas_stacked_i4(
    x: jax.Array,  # [B, K]
    w: QTensor,  # layout "kn", stacked q [L, K, N] int4
    layer: jax.Array,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    tile_n: int | None = None,
    tile_k: int | None = None,
) -> jax.Array:
    """Layer-indexed matmul over int4-dtype stacked weights.

    MEASURED DEAD END on v5e (tools/kernel_bench.py, 2026-08-18): the
    hardware int4->bf16 convert path runs at 217 GB/s effective vs 374 GB/s
    for the nibble-packed int8 kernel — the S4 vector loads/converts are
    slower than the manual widen/shift/mask dequant. Kept for the record and
    for future toolchains where the S4 path improves."""
    assert w.layout == "kn" and w.q.dtype == jnp.int4
    g = w.group
    L, k, n = w.q.shape
    b = x.shape[0]
    if tile_n is None and tile_k is None:
        tile_n, tile_k = _pick_tiles_2d(k, n, g, True, b)
    else:
        tile_n = _pick_tile(n, tile_n or 256, 128) if n % 128 == 0 else n
        tile_k = _pick_tile(k, tile_k or 2048, 128) if k % 128 == 0 and (128 % g == 0 or k % 128 == 0) else k
    if tile_k % g != 0:
        tile_k = k
    grid = (n // tile_n, k // tile_k)
    in_specs = [
        pl.BlockSpec((b, tile_k), lambda i, j, l: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_k, tile_n), lambda i, j, l: (l[0], j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_k // g, tile_n), lambda i, j, l: (l[0], j, i), memory_space=pltpu.VMEM),
    ]
    args = [x, w.q, w.scale]
    has_bias = w.bias is not None
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, tile_k // g, tile_n), lambda i, j, l: (l[0], j, i), memory_space=pltpu.VMEM)
        )
        args.append(w.bias)

    def kernel(l_ref, x_ref, q_ref, s_ref, *rest):
        if has_bias:
            b_ref, o_ref = rest
        else:
            (o_ref,) = rest
            b_ref = None
        _qmm_kernel_i4(
            x_ref,
            _squeeze_lead(q_ref),
            _squeeze_lead(s_ref),
            None if b_ref is None else _squeeze_lead(b_ref),
            o_ref,
            group=g,
            compute_dtype=compute_dtype,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, tile_n), lambda i, j, l: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=k * n // 2 + (k // g) * n * 4 + b * k * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, *args[1:])


class _SqueezedRef:
    """View of a Ref with a leading length-1 dim dropped (for the stacked
    kernels to reuse _qmm_kernel unchanged)."""

    def __init__(self, ref):
        self._ref = ref
        self.shape = ref.shape[1:]

    def __getitem__(self, idx):
        if idx == slice(None):
            return self._ref[0]
        return self._ref[(0,) + (idx if isinstance(idx, tuple) else (idx,))]


def _squeeze_lead(ref):
    return _SqueezedRef(ref)


def qmatmul_pallas(
    x: jax.Array, w: QTensor, compute_dtype=jnp.bfloat16, interpret: bool = False,
    split: bool | None = None, coded_resident: bool | None = None,
) -> jax.Array:
    """x [..., K] @ dequant(w)[N, K]^T -> [..., N]; flattens leading dims."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    xb = x.reshape(-1, k)
    b = xb.shape[0]
    # pad batch to the f32 sublane tile
    bp = _round_up(max(b, 8), 8)
    if bp != b:
        xb = jnp.pad(xb, ((0, bp - b), (0, 0)))
    out = qmatmul_pallas_2d(xb, w, compute_dtype=compute_dtype, interpret=interpret,
                            split=split, coded_resident=coded_resident)
    if bp != b:
        out = out[:b]
    return out.reshape(*lead, -1)


def qmatmul_pallas_stacked_nd(
    x: jax.Array, w: QTensor, layer: jax.Array, compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Leading-dims wrapper over qmatmul_pallas_stacked."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    xb = x.reshape(-1, k)
    b = xb.shape[0]
    bp = _round_up(max(b, 8), 8)
    if bp != b:
        xb = jnp.pad(xb, ((0, bp - b), (0, 0)))
    out = qmatmul_pallas_stacked(xb, w, layer, compute_dtype=compute_dtype, interpret=interpret)
    if bp != b:
        out = out[:b]
    return out.reshape(*lead, -1)
