"""Fused per-layer FFN block: three back-to-back Pallas kernels with the
elementwise epilogues (residual add, RMSNorm, SiLU/GELU-gate) computed in VMEM
instead of separate XLA ops.

Replaces, on the decode/verify critical path, the XLA composition

    attn_out = attn @ Wo          x = resid + attn_out
    h = rms_norm(x) * w           gate,up = h @ Wgate_up
    out = (act(gate)*up) @ Wdown + x

with kernels that (1) stream Wo / Wgate_up / Wdown back-to-back with no
XLA elementwise ops (and their relayouts) between them, and (2) keep every
intermediate except the tiny [R, D]/[R, F] handoffs in VMEM. The dequant
inner loop is the proven `_qmm_kernel` from pallas_qmm (packed-int4 + factored
group-bias side-dot, NOTES.md round-2 kernel findings); each kernel tiles K
only — the full output row stays resident as the accumulator, and the
epilogue fires on the last K step.

This is the TPU replacement for the reference's fused mmq epilogues
(ggml/src/ggml-cuda/mmq.cu fuses dequant+matmul; llama.cpp's norm/activation
ops remain separate graph nodes — here they cost zero extra HBM traffic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.qtensor import QTensor
from .pallas_qmm import (
    _BW_STREAM,
    _C_KREV,
    _C_STEP,
    _VMEM_BUDGET,
    _compiler_params,
    _qmm_kernel,
    _squeeze_lead,
    _valid_tiles,
)
from .matmul import qmatmul_layer


def supports_ffn_block(layers: dict, cfg) -> bool:
    """The fused block covers the plain pre-norm llama/qwen FFN shape only:
    fused gate_up, no sandwich norms (gemma2), no MoE router, quantized
    K-major stacked weights with 128-aligned extents."""
    if any(k in layers for k in ("post_attn_norm", "post_ffn_norm", "ffn_gate_inp")):
        return False
    if "ffn_norm" not in layers or "w_gate_up" not in layers:
        return False
    if getattr(cfg, "act", "silu") not in ("silu", "gelu"):
        return False
    ws = [layers.get("wo"), layers.get("w_gate_up"), layers.get("w_down")]
    for w in ws:
        if not isinstance(w, QTensor) or w.layout != "kn" or w.q.ndim != 3:
            return False
        if w.sup is not None:  # coded scales: not wired into the fused stages
            return False
        k = w.q.shape[1] * (2 if w.packed else 1)
        n = w.q.shape[2]
        if n % 128 != 0 or k % (2 * w.group if w.packed else w.group) != 0:
            return False
        if w.group % 8 != 0:
            return False
    # gate/up split needs an even, 128-aligned fused width
    if ws[1].q.shape[2] % 256 != 0:
        return False
    return True


@functools.lru_cache(maxsize=None)
def _pick_tile_k(k: int, n: int, g: int, packed: bool, r: int, resident: int) -> int:
    """tile_k for a K-only grid with the full [R, N] row resident as the
    accumulator. Same calibrated time model as pallas_qmm._pick_tiles_2d
    (stream + unoverlapped first-block ramp + per-step + revisit costs) with
    tile_n pinned to N; `resident` carries the accumulator/extra-output/bias
    VMEM that stays allocated for the whole kernel."""
    cands = [
        t for t in _valid_tiles(k)
        if t % g == 0 and ((t // g) % 8 == 0 or t == k)
    ] or [k]
    best = None
    fallback = None
    for tk in cands:
        qb = tk * n // (2 if packed else 1)
        sb = (tk // g) * n * 2
        xb = r * tk * 4
        vmem = 2 * (qb + sb + xb) + resident
        steps = k // tk
        score = (
            (qb + sb) / _BW_STREAM  # first-block DMA ramp
            + ((qb + sb) * steps + r * 4 * (k + n)) / _BW_STREAM
            + _C_STEP * steps
            + _C_KREV * (steps - 1)
        )
        if fallback is None or qb + sb + xb < fallback[0]:
            fallback = (qb + sb + xb, tk)
        if vmem > _VMEM_BUDGET:
            continue
        if best is None or score < best[0]:
            best = (score, tk)
    return best[1] if best is not None else fallback[1]


def _fused_qmm_call(
    x: jax.Array,  # [R, K]
    w: QTensor,  # stacked kn [L, K(/2), N]
    layer: jax.Array,
    extras: list[jax.Array],  # full-block side inputs (constant index)
    epilogue,  # fn(o_ref, extra_refs, aux_out_refs) run on the last K step
    aux_out_shapes: list[jax.ShapeDtypeStruct],
    *,
    compute_dtype,
    interpret: bool,
):
    """One fused matmul+epilogue stage. Grid is (1, K/tile_k) so the inner
    dequant kernel's program_id(1) K-accumulation logic is reused verbatim;
    the [R, N] accumulator block is revisited on every step (VMEM-resident)."""
    assert w.layout == "kn" and w.q.ndim == 3
    g = w.group
    L = w.q.shape[0]
    if w.packed:
        _, kq, n = w.q.shape
        k = 2 * kq
    else:
        _, k, n = w.q.shape
    r = x.shape[0]
    has_bias = w.bias is not None

    if L == 1:
        # static slice is free; the scalar-prefetch path triggers pathological
        # Mosaic compiles inside single-layer (EAGLE draft) scans — see
        # ops/matmul.py qmatmul_layer
        w = jax.tree_util.tree_map(lambda a: a[0], w)
        stacked = False
    else:
        stacked = True

    aux_bytes = sum(
        s.size * jnp.dtype(s.dtype).itemsize for s in aux_out_shapes
    )
    resident = r * n * 4 + aux_bytes + (
        (k // g) * n * 2 + r * (k // g) * 4 if has_bias else 0
    ) + sum(e.size * jnp.dtype(e.dtype).itemsize for e in extras)
    tile_k = _pick_tile_k(k, n, g, w.packed, r, resident)
    steps = k // tile_k
    grid = (1, steps)

    q_block = (tile_k // 2, n) if w.packed else (tile_k, n)
    if stacked:
        in_specs = [
            pl.BlockSpec((r, tile_k), lambda i, j, l: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + q_block, lambda i, j, l: (l[0], j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k // g, n), lambda i, j, l: (l[0], j, 0), memory_space=pltpu.VMEM),
        ]
    else:
        in_specs = [
            pl.BlockSpec((r, tile_k), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(q_block, lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k // g, n), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ]
    args = [x, w.q, w.scale]
    if has_bias:
        # full-K bias block + per-group x sums for the factored side-dot
        # (resident across the K steps; see pallas_qmm._qmm_kernel)
        if stacked:
            in_specs.append(
                pl.BlockSpec((1, k // g, n), lambda i, j, l: (l[0], 0, 0), memory_space=pltpu.VMEM)
            )
        else:
            in_specs.append(
                pl.BlockSpec((k // g, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
            )
        args.append(w.bias)
        in_specs.append(
            pl.BlockSpec(
                (r, k // g),
                (lambda i, j, l: (0, 0)) if stacked else (lambda i, j: (0, 0)),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(x.astype(jnp.float32).reshape(r, k // g, g).sum(axis=-1))
    for e in extras:
        in_specs.append(
            pl.BlockSpec(
                e.shape,
                (lambda i, j, l, nd=e.ndim: (0,) * nd) if stacked
                else (lambda i, j, nd=e.ndim: (0,) * nd),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(e)
    n_extras = len(extras)

    out_shapes = list(aux_out_shapes)
    out_specs = [
        pl.BlockSpec(
            s.shape,
            (lambda i, j, l, nd=len(s.shape): (0,) * nd) if stacked
            else (lambda i, j, nd=len(s.shape): (0,) * nd),
            memory_space=pltpu.VMEM,
        )
        for s in aux_out_shapes
    ]
    out_shapes.insert(0, jax.ShapeDtypeStruct((r, n), jnp.float32))
    out_specs.insert(
        0,
        pl.BlockSpec(
            (r, n),
            (lambda i, j, l: (0, 0)) if stacked else (lambda i, j: (0, 0)),
            memory_space=pltpu.VMEM,
        ),
    )

    def kernel(*refs):
        refs = list(refs)
        if stacked:
            refs.pop(0)  # scalar-prefetch layer index (consumed by index maps)
        x_ref, q_ref, s_ref = refs[:3]
        refs = refs[3:]
        if has_bias:
            b_ref, xs_ref = refs[:2]
            refs = refs[2:]
        else:
            b_ref = xs_ref = None
        extra_refs = refs[:n_extras]
        o_ref = refs[n_extras]
        aux_refs = refs[n_extras + 1:]
        sq = _squeeze_lead if stacked else (lambda ref: ref)
        _qmm_kernel(
            x_ref, sq(q_ref), sq(s_ref),
            None if b_ref is None else sq(b_ref),
            o_ref, group=g, compute_dtype=compute_dtype, packed=w.packed,
            xs_ref=xs_ref,
        )

        @pl.when(pl.program_id(1) == steps - 1)
        def _():
            epilogue(o_ref, extra_refs, aux_refs)

    cost = pl.CostEstimate(
        flops=2 * r * k * n,
        bytes_accessed=(k // (2 if w.packed else 1)) * n + (k // g) * n * 2 + r * (k + n) * 4,
        transcendentals=0,
    )
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
        )
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=None if interpret else _compiler_params(),
            cost_estimate=cost,
        )(jnp.asarray(layer, jnp.int32).reshape(1), *args)
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
        cost_estimate=cost,
    )(*args)


@functools.lru_cache(maxsize=None)
def _pick_tiles_pair(k: int, f: int, g: int, packed: bool, r: int) -> tuple[int, int]:
    """(tile_n, tile_k) for the paired gate/up kernel: each grid step streams
    TWO weight blocks (the gate tile and the matching up tile), so the VMEM
    and traffic terms double relative to pallas_qmm._pick_tiles_2d."""
    n_tiles = _valid_tiles(f) if f % 128 == 0 else [f]
    k_tiles = [
        t for t in _valid_tiles(k)
        if t % g == 0 and ((t // g) % 8 == 0 or t == k)
    ] or [k]
    best = fallback = None
    for tn in n_tiles:
        for tk in k_tiles:
            qb = 2 * tk * tn * (0.5 if packed else 1)
            sb = 2 * (tk // g) * tn * 2 * 2
            xb = r * tk * 4
            ob = r * tn * 2
            acc = 2 * r * tn * 4  # two f32 accumulators live across K steps
            vmem = 2 * (qb + sb + xb) + 2 * ob + acc
            steps = (f // tn) * (k // tk)
            score = (
                ((qb + sb) * steps + r * 4 * k * (f // tn) + r * f * 2 + qb + sb + xb) / _BW_STREAM
                + _C_STEP * steps
                + _C_KREV * (f // tn) * (k // tk - 1)
            )
            if fallback is None or (qb + sb + xb + ob) < fallback[0]:
                fallback = (qb + sb + xb + ob, (tn, tk))
            if vmem > _VMEM_BUDGET:
                continue
            if best is None or score < best[0]:
                best = (score, (tn, tk))
    return best[1] if best is not None else fallback[1]


def _gate_up_act_2d(
    h: jax.Array,  # [R, K]
    w: QTensor,  # stacked kn [L, K(/2), 2F] — gate cols [0,F), up cols [F,2F)
    layer: jax.Array,
    *,
    act,
    compute_dtype,
    interpret: bool,
):
    """act(h @ Wgate) * (h @ Wup) with free 2D tiling: every grid step streams
    the gate tile AND its paired up tile (same array, offset index map), the
    two f32 accumulators live in scratch, and the activation epilogue fires on
    the last K step per N tile. Unlike a full-row accumulator this keeps the
    calibrated tile picker's shape freedom (the K-only fused down kernel
    measured +7 us/layer from forced 43-step grids)."""
    assert w.layout == "kn" and w.q.ndim == 3
    g = w.group
    L = w.q.shape[0]
    if w.packed:
        _, kq, two_f = w.q.shape
        k = 2 * kq
    else:
        _, k, two_f = w.q.shape
    f = two_f // 2
    r = h.shape[0]
    has_bias = w.bias is not None
    if L == 1:
        w = jax.tree_util.tree_map(lambda a: a[0], w)
        stacked = False
    else:
        stacked = True

    tn, tk = _pick_tiles_pair(k, f, g, w.packed, r)
    steps_k = k // tk
    f_tiles = f // tn
    grid = (f_tiles, steps_k)
    q_block = (tk // 2, tn) if w.packed else (tk, tn)

    def spec(block, imap):
        if stacked:
            return pl.BlockSpec((1,) + block, lambda i, j, l, m=imap: (l[0],) + m(i, j),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(block, lambda i, j, m=imap: m(i, j), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((r, tk), (lambda i, j, l: (0, j)) if stacked else (lambda i, j: (0, j)),
                     memory_space=pltpu.VMEM),
        spec(q_block, lambda i, j: (j, i)),  # gate tile
        spec(q_block, lambda i, j: (j, i + f_tiles)),  # paired up tile
        spec((tk // g, tn), lambda i, j: (j, i)),
        spec((tk // g, tn), lambda i, j: (j, i + f_tiles)),
    ]
    args = [h, w.q, w.q, w.scale, w.scale]
    if has_bias:
        in_specs.append(spec((k // g, tn), lambda i, j: (0, i)))
        in_specs.append(spec((k // g, tn), lambda i, j: (0, i + f_tiles)))
        args += [w.bias, w.bias]
        in_specs.append(
            pl.BlockSpec((r, k // g), (lambda i, j, l: (0, 0)) if stacked else (lambda i, j: (0, 0)),
                         memory_space=pltpu.VMEM)
        )
        args.append(h.astype(jnp.float32).reshape(r, k // g, g).sum(axis=-1))

    def kernel(*refs):
        refs = list(refs)
        if stacked:
            refs.pop(0)
        x_ref, qg_ref, qu_ref, sg_ref, su_ref = refs[:5]
        refs = refs[5:]
        if has_bias:
            bg_ref, bu_ref, xs_ref = refs[:3]
            refs = refs[3:]
        else:
            bg_ref = bu_ref = xs_ref = None
        o_ref, accg, accu = refs
        sq = _squeeze_lead if stacked else (lambda ref: ref)
        _qmm_kernel(x_ref, sq(qg_ref), sq(sg_ref),
                    None if bg_ref is None else sq(bg_ref), accg,
                    group=g, compute_dtype=compute_dtype, packed=w.packed, xs_ref=xs_ref)
        _qmm_kernel(x_ref, sq(qu_ref), sq(su_ref),
                    None if bu_ref is None else sq(bu_ref), accu,
                    group=g, compute_dtype=compute_dtype, packed=w.packed, xs_ref=xs_ref)

        @pl.when(pl.program_id(1) == steps_k - 1)
        def _():
            o_ref[:] = (act(accg[:]) * accu[:]).astype(o_ref.dtype)

    out_spec = pl.BlockSpec(
        (r, tn), (lambda i, j, l: (0, i)) if stacked else (lambda i, j: (0, i)),
        memory_space=pltpu.VMEM,
    )
    scratch = [pltpu.VMEM((r, tn), jnp.float32), pltpu.VMEM((r, tn), jnp.float32)]
    cost = pl.CostEstimate(
        flops=2 * r * k * two_f,
        bytes_accessed=(k // (2 if w.packed else 1)) * two_f + (k // g) * two_f * 2 + r * (k + f) * 4,
        transcendentals=r * f,
    )
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_spec, scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((r, f), compute_dtype),
            grid_spec=grid_spec, interpret=interpret,
            compiler_params=None if interpret else _compiler_params(),
            cost_estimate=cost,
        )(jnp.asarray(layer, jnp.int32).reshape(1), *args)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((r, f), compute_dtype),
        grid=grid, in_specs=in_specs, out_specs=out_spec, scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
        cost_estimate=cost,
    )(*args)


def ffn_block_pallas(
    attn: jax.Array,  # [R, H*Dh] attention output rows (R % 8 == 0)
    resid: jax.Array,  # [R, D] residual stream entering the layer
    norm_w: jax.Array,  # [D] ffn_norm weight for this layer
    wo: QTensor,  # stacked [L, H*Dh, D]
    w_gate_up: QTensor,  # stacked [L, D, 2F]
    w_down: QTensor,  # stacked [L, F, D]
    layer: jax.Array,
    *,
    rms_eps: float,
    act_fn: str = "silu",
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    stages: str = "all",  # "all" | "wo" (fuse only the wo+resid+norm stage)
) -> jax.Array:
    """resid + FFN(rms_norm(resid + attn @ Wo)) for one layer, fused.

    Returns the next residual stream [R, D] (f32, matching the XLA path's
    f32 matmul accumulation into the residual)."""
    r = attn.shape[0]
    d = resid.shape[-1]
    act = jax.nn.silu if act_fn == "silu" else functools.partial(
        jax.nn.gelu, approximate=True
    )

    nw = norm_w.astype(jnp.float32).reshape(1, d)

    # stage 1: x = resid + attn @ Wo ; h = rms_norm(x) * w  (h in compute dtype
    # — identical to what the XLA path's matmul input cast produces)
    def epi_out_norm(o_ref, extra_refs, aux_refs):
        r_ref, nw_ref = extra_refs
        (h_ref,) = aux_refs
        xv = o_ref[:] + r_ref[:].astype(jnp.float32)
        o_ref[:] = xv
        ms = jnp.mean(xv * xv, axis=-1, keepdims=True)
        h_ref[:] = (xv * jax.lax.rsqrt(ms + rms_eps) * nw_ref[:]).astype(compute_dtype)

    x, h = _fused_qmm_call(
        attn, wo, layer, [resid, nw], epi_out_norm,
        [jax.ShapeDtypeStruct((r, d), compute_dtype)],
        compute_dtype=compute_dtype, interpret=interpret,
    )

    def _mm(inp, w):
        if interpret:
            # qmatmul_layer's pallas path doesn't thread interpret; use the
            # exact XLA dequant matmul for CPU tests (numerics identical)
            w_l = jax.tree_util.tree_map(lambda t: t[layer], w)
            from .matmul import qmatmul

            return qmatmul(inp, w_l, backend="xla", compute_dtype=compute_dtype)
        return qmatmul_layer(inp, w, layer, backend="pallas", compute_dtype=compute_dtype)

    if stages == "wo":
        # only stage 1 fused (it measured a net win: 20.2 us incl. resid+norm
        # vs 19.5 + ~3 us of XLA fusions); gate_up/down stay on the standard
        # kernels whose XLA interleaving hides launch gaps
        gate, up = jnp.split(_mm(h, w_gate_up), 2, axis=-1)
        a = (act(gate) * up).astype(compute_dtype)
    else:
        # stage 2: a = act(gate) * up — paired-tile kernel, VMEM accumulators
        a = _gate_up_act_2d(
            h, w_gate_up, layer, act=act, compute_dtype=compute_dtype,
            interpret=interpret,
        )

    # stage 3: out = a @ Wdown + x. Left on the standard 2D-tiled kernel — the
    # K-only fused variant forces a 43-step grid at F=11008 (measured
    # +7 us/layer on TPU); the residual add is a single cheap XLA fusion.
    return _mm(a, w_down) + x
