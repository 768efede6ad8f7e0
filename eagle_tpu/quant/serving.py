"""Serving-layout preparation for loaded weights.

The GGUF loader (models/loader.py) emits QTensors in the repacked int8-codes
+ f32-product-scales form — bit-exact and convenient, but not the layout the
decode kernels are fastest on. This pass converts eligible tensors, one-time
at engine build:

- **nibble packing** (4-bit formats: Q4_0/Q4_1/Q4_K): two codes per byte —
  true 4-bit HBM traffic, ~2x decode throughput on weight-bound shapes
  (ops/pallas_qmm.py unpacks in VMEM).
- **scale mode**:
    "f32"  — keep exact f32 d*sc products (ggml's dequant math verbatim).
    "bf16" — round products to bf16: half the scale-stream bytes. The
             measured quality study (tools/scale_mode_study.py, results in
             BENCHMARKS.md, 2026-08-20): output KLD is ~1% of the Q4_K
             quantization effect and dPPL ~3% of it, but top-1 agreement is
             98.1% — BELOW the 99.5% gate. bf16 products are therefore NOT
             the serving default; the loader's coded-scales layout
             (models/loader.py) delivers bit-exactness at comparable speed.

The transform is value-preserving in "f32" mode and runs on whatever device
the params live on (packing is a cheap one-time elementwise op)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from .qtensor import QTensor

#: formats whose codes fit [0, 16) after repack — nibble-packable
PACKABLE_TYPES = (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K)


def _pack_q(q, group: int):
    """[..., K, N] int8 codes in [0,16) -> [..., K/2, N] packed bytes, with
    the kernel's per-group (j, j+G/2) -> (lo, hi) layout (QTensor.pack_nibbles
    semantics, generalized to layer-stacked arrays)."""
    half = group // 2
    shp = q.shape
    k = shp[-2]
    if isinstance(q, np.ndarray):
        qg = q.astype(np.uint8).reshape(*shp[:-2], k // group, group, shp[-1])
        p = qg[..., :half, :] | (qg[..., half:, :] << 4)
        return p.reshape(*shp[:-2], k // 2, shp[-1]).view(np.int8)
    qg = q.astype(jnp.uint8).reshape(*shp[:-2], k // group, group, shp[-1])
    p = qg[..., :half, :] | (qg[..., half:, :] << 4)
    p = p.reshape(*shp[:-2], k // 2, shp[-1])
    return jax.lax.bitcast_convert_type(p, jnp.int8)


def prepare_qtensor(t: QTensor, scale_mode: str = "f32", pack: bool = True) -> QTensor:
    if t.sup is not None:
        # coded scales (the loader's bit-exact k-quant layout): the scale
        # stream is final, but 4-bit codes still nibble-pack
        if (
            pack
            and t.layout == "kn"
            and not t.packed
            and GGMLType(t.ggml_type) in PACKABLE_TYPES
        ):
            return dataclasses.replace(t, q=_pack_q(t.q, t.group), packed=True)
        return t
    out = t
    if (
        pack
        and out.layout == "kn"
        and not out.packed
        and GGMLType(out.ggml_type) in PACKABLE_TYPES
    ):
        out = dataclasses.replace(out, q=_pack_q(out.q, out.group), packed=True)
    if scale_mode == "bf16":
        xp = jnp if not isinstance(out.scale, np.ndarray) else np
        if out.scale.dtype != jnp.bfloat16:
            out = dataclasses.replace(
                out,
                scale=out.scale.astype(jnp.bfloat16) if xp is jnp
                else out.scale.astype(np.dtype(jnp.bfloat16)),
                bias=None if out.bias is None else (
                    out.bias.astype(jnp.bfloat16) if xp is jnp
                    else out.bias.astype(np.dtype(jnp.bfloat16))
                ),
            )
    return out


def prepare_params_for_serving(params, scale_mode: str = "f32", pack: bool = True):
    # default matches EngineConfig.scale_mode ("f32", value-preserving):
    # lossy bf16 scale rounding is always an explicit opt-in
    """Walk a params pytree and convert every eligible QTensor (see module
    docstring). Non-QTensor leaves pass through untouched."""
    return jax.tree_util.tree_map(
        lambda t: prepare_qtensor(t, scale_mode, pack) if isinstance(t, QTensor) else t,
        params,
        is_leaf=lambda x: isinstance(x, QTensor),
    )
