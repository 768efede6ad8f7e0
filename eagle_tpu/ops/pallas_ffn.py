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
    acc_is_output: bool,  # False: accumulator lives in scratch, not HBM
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
    scratch_shapes = []
    if acc_is_output:
        out_shapes.insert(0, jax.ShapeDtypeStruct((r, n), jnp.float32))
        out_specs.insert(
            0,
            pl.BlockSpec(
                (r, n),
                (lambda i, j, l: (0, 0)) if stacked else (lambda i, j: (0, 0)),
                memory_space=pltpu.VMEM,
            ),
        )
    else:
        scratch_shapes.append(pltpu.VMEM((r, n), jnp.float32))

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
        refs = refs[n_extras:]
        if acc_is_output:
            o_ref = refs[0]
            aux_refs = refs[1:]
        else:
            o_ref = refs[-1]  # scratch comes after outputs
            aux_refs = refs[:-1]
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
            scratch_shapes=scratch_shapes,
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
        scratch_shapes=scratch_shapes,
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
) -> jax.Array:
    """resid + FFN(rms_norm(resid + attn @ Wo)) for one layer, fused.

    Returns the next residual stream [R, D] (f32, matching the XLA path's
    f32 matmul accumulation into the residual)."""
    r = attn.shape[0]
    d = resid.shape[-1]
    two_f = w_gate_up.shape[0]
    f = two_f // 2
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
        acc_is_output=True, compute_dtype=compute_dtype, interpret=interpret,
    )

    # stage 2: a = act(gate) * up, gate/up the two halves of h @ Wgate_up.
    # The [R, 2F] accumulator never leaves VMEM (scratch, not an output).
    def epi_act(o_ref, extra_refs, aux_refs):
        (a_ref,) = aux_refs
        t = o_ref[:]
        a_ref[:] = (act(t[:, :f]) * t[:, f:]).astype(compute_dtype)

    (a,) = _fused_qmm_call(
        h, w_gate_up, layer, [], epi_act,
        [jax.ShapeDtypeStruct((r, f), compute_dtype)],
        acc_is_output=False, compute_dtype=compute_dtype, interpret=interpret,
    )

    # stage 3: out = a @ Wdown + x
    def epi_resid(o_ref, extra_refs, aux_refs):
        (x_ref,) = extra_refs
        o_ref[:] = o_ref[:] + x_ref[:]

    (out,) = _fused_qmm_call(
        a, w_down, layer, [x], epi_resid, [],
        acc_is_output=True, compute_dtype=compute_dtype, interpret=interpret,
    )
    return out
