"""QTensor — the device-side representation of group-quantized weights.

Every supported GGUF block format repacks *exactly* onto the uniform affine
model

    w[n, k] = scale[n, k // G] * q[n, k] + bias[n, k // G]

with q a small integer. This is the TPU-friendly layout: `q` feeds the MXU as
(packed) integers, `scale`/`bias` are per-group epilogue constants living in
VMEM. The repacking replaces ggml's byte-interleaved block structs
(ggml/src/ggml-common.h) whose layout only makes sense for CPU SIMD; the
numerical reconstruction is bit-identical to ggml's dequant (see
tests/test_repack.py).

Format mapping (dequant semantics from ggml/src/ggml-quants.c):
    Q4_0:  G=32,  q in [0,15],   scale=d,      bias=-8*d
    Q8_0:  G=32,  q in [-127,127], scale=d,    bias=0
    Q4_K:  G=32,  q in [0,15],   scale=d*sc6,  bias=-dmin*m6
    Q5_K:  G=32,  q in [0,31],   scale=d*sc6,  bias=-dmin*m6
    Q6_K:  G=16,  q in [-32,31], scale=d*sc8,  bias=0
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType, QK_K
from . import blocks as _b


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QTensor:
    """Group-quantized 2-D weight, logically [N, K] (out-features, in-features).

    Two physical layouts:
      - "nk": q [N, K], scale/bias [N, K/G] — gather-friendly (embedding tables)
      - "kn": q [K, N], scale/bias [K/G, N] — matmul-friendly on TPU: the MXU
        contracts the sublane (K) axis directly and the per-group scale
        broadcast splits sublanes by G (a free relayout since G % 8 == 0),
        never the 128-lane axis.
    """

    q: jax.Array
    scale: jax.Array
    bias: jax.Array | None
    group: int = dataclasses.field(metadata=dict(static=True), default=32)
    ggml_type: int = dataclasses.field(metadata=dict(static=True), default=int(GGMLType.Q8_0))
    layout: str = dataclasses.field(metadata=dict(static=True), default="nk")
    #: 4-bit nibble packing along K ("kn" layout only): within each group of G
    #: K-rows, packed row j holds values (j, j+G/2) in (lo, hi) nibbles — so
    #: unpacking is two contiguous sublane blocks per group, no interleave.
    packed: bool = dataclasses.field(metadata=dict(static=True), default=False)
    #: coded scales (k-quant super-block factorization kept on-chip): when
    #: `sup` is set, `scale` holds the raw u8/i8 sub-scale CODES and the
    #: effective scale is  sup[k//256] * scale[k//G]  (f32 product computed in
    #: the kernel — ~HALF the scale stream of materialized bf16 products, and
    #: bit-exact with ggml's d*sc f32 math, which a bf16 product is not).
    #: sup/sup_min are f32: the GGUF f16 d/dmin promote losslessly and Mosaic
    #: has no f16 vector type; at 1 f32 per 256 weights the stream is noise.
    #: Likewise `sup_min` (stored NEGATED: -dmin) with `bias` holding min
    #: codes: bias = sup_min[k//256] * bias[k//G].
    sup: jax.Array | None = None
    sup_min: jax.Array | None = None

    @property
    def shape(self):
        """Logical (N, K) shape regardless of layout."""
        return self.q.shape if self.layout == "nk" else self.q.shape[::-1]

    def transpose(self) -> "QTensor":
        """Switch physical layout (host-side, one-time at load)."""
        return dataclasses.replace(
            self,
            q=self.q.T,
            scale=self.scale.T,
            bias=None if self.bias is None else self.bias.T,
            sup=None if self.sup is None else self.sup.T,
            sup_min=None if self.sup_min is None else self.sup_min.T,
            layout="kn" if self.layout == "nk" else "nk",
        )

    def effective_scale_bias(self):
        """Materialized f32 (scale [.., K/G], bias|None) regardless of coding.
        Group axis is -1 for "nk", -2 for "kn"."""
        import jax.numpy as _jnp

        if self.sup is None:
            s = self.scale.astype(_jnp.float32)
            b = None if self.bias is None else self.bias.astype(_jnp.float32)
            return s, b
        ax = -1 if self.layout == "nk" else -2
        per = self.scale.shape[ax] // self.sup.shape[ax]

        def expand(sup, codes):
            supx = _jnp.repeat(sup.astype(_jnp.float32), per, axis=ax)
            return supx * codes.astype(_jnp.float32)

        s = expand(self.sup, self.scale)
        b = None if self.bias is None else expand(self.sup_min, self.bias)
        return s, b

    def unpack(self) -> "QTensor":
        """Expand nibble packing back to one int8 per value ("kn" only)."""
        if not self.packed:
            return self
        assert self.layout == "kn"
        g = self.group
        kp, n = self.q.shape  # kp = K/2
        p = self.q.astype(jnp.uint8).reshape(kp // (g // 2), g // 2, n)
        lo = (p & 0xF).astype(jnp.int8)
        hi = (p >> 4).astype(jnp.int8)
        q = jnp.concatenate([lo, hi], axis=1).reshape(2 * kp, n)
        return dataclasses.replace(self, q=q, packed=False)

    def pack_nibbles(self) -> "QTensor":
        """Pack 4-bit codes two-per-byte (requires 0 <= q < 16, "kn" layout)."""
        if self.packed:
            return self
        assert self.layout == "kn"
        g = self.group
        k, n = self.q.shape
        q = np.asarray(self.q).astype(np.uint8).reshape(k // g, g, n)
        half = g // 2
        packed = (q[:, :half] | (q[:, half:] << 4)).reshape(k // 2, n)
        return dataclasses.replace(self, q=jnp.asarray(packed.view(np.int8)), packed=True)

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Materialize dense [N, K] weights (reference path; fused kernels avoid this)."""
        if self.packed:
            return self.unpack().dequantize(dtype)
        g = self.group
        scale, bias = self.effective_scale_bias()
        if self.layout == "nk":
            n, k = self.q.shape
            w = self.q.astype(jnp.float32).reshape(n, k // g, g)
            w = w * scale[:, :, None]
            if bias is not None:
                w = w + bias[:, :, None]
            return w.reshape(n, k).astype(dtype)
        k, n = self.q.shape
        w = self.q.astype(jnp.float32).reshape(k // g, g, n)
        w = w * scale[:, None, :]
        if bias is not None:
            w = w + bias[:, None, :]
        return w.reshape(k, n).T.astype(dtype)


# ---------------------------------------------------------------------------
# numpy repacking: GGUF packed block bytes -> (q, scale, bias, group)
# ---------------------------------------------------------------------------


def _repack_q8_0(data: np.ndarray, n: int, k: int):
    bl = data.reshape(-1, 34)
    d = _b._f16_bytes_to_f32(bl[:, :2])
    q = bl[:, 2:].view(np.int8)
    return q.reshape(n, k), d.reshape(n, k // 32), None, 32


def _repack_q4_0(data: np.ndarray, n: int, k: int):
    bl = data.reshape(-1, 18)
    d = _b._f16_bytes_to_f32(bl[:, :2])
    qs = bl[:, 2:]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.int8)  # block order lo|hi
    return (
        q.reshape(n, k),
        d.reshape(n, k // 32),
        (-8.0 * d).reshape(n, k // 32).astype(np.float32),
        32,
    )


def _repack_q4_k(data: np.ndarray, n: int, k: int):
    bl = data.reshape(-1, 144)
    nb = bl.shape[0]
    d = _b._f16_bytes_to_f32(bl[:, 0:2])
    dmin = _b._f16_bytes_to_f32(bl[:, 2:4])
    sc, m = _b._unpack_scale_min_k4(bl[:, 4:16])
    qs = bl[:, 16:].reshape(nb, 4, 32)
    q = np.stack([qs & 0xF, qs >> 4], axis=2).reshape(nb, 256).astype(np.int8)
    scale = (d[:, None] * sc.astype(np.float32)).astype(np.float32)
    bias = (-(dmin[:, None] * m.astype(np.float32))).astype(np.float32)
    return q.reshape(n, k), scale.reshape(n, k // 32), bias.reshape(n, k // 32), 32


def _repack_q4_k_coded(data: np.ndarray, n: int, k: int):
    """Q4_K keeping the super-block factorization ON-CHIP: raw 6-bit sub-scale
    /min codes + f32 per-256 super-scales (d, -dmin), instead of materialized
    f32 products. Bit-exact with the product form (the kernel's f32
    sup*code multiply is the same operation repack would have precomputed)
    at ~half the scale-stream HBM bytes."""
    bl = data.reshape(-1, 144)
    nb = bl.shape[0]
    d = _b._f16_bytes_to_f32(bl[:, 0:2])
    dmin = _b._f16_bytes_to_f32(bl[:, 2:4])
    sc, m = _b._unpack_scale_min_k4(bl[:, 4:16])
    qs = bl[:, 16:].reshape(nb, 4, 32)
    q = np.stack([qs & 0xF, qs >> 4], axis=2).reshape(nb, 256).astype(np.int8)
    return (
        q.reshape(n, k),
        sc.astype(np.int8).reshape(n, k // 32),
        m.astype(np.int8).reshape(n, k // 32),
        32,
        d.astype(np.float32).reshape(n, k // 256),
        (-dmin.astype(np.float32)).reshape(n, k // 256),
    )


def _repack_q6_k_coded(data: np.ndarray, n: int, k: int):
    """Q6_K coded: int8 sub-scale codes (16 per super-block) + f32 d."""
    bl = data.reshape(-1, 210)
    nb = bl.shape[0]
    ql = bl[:, 0:128].reshape(nb, 2, 64)
    qh = bl[:, 128:192].reshape(nb, 2, 32)
    sc = bl[:, 192:208].view(np.int8)
    d = _b._f16_bytes_to_f32(bl[:, 208:210])
    q1 = (ql[:, :, :32] & 0xF) | ((qh & 0x3) << 4)
    q2 = (ql[:, :, 32:] & 0xF) | (((qh >> 2) & 0x3) << 4)
    q3 = (ql[:, :, :32] >> 4) | (((qh >> 4) & 0x3) << 4)
    q4 = (ql[:, :, 32:] >> 4) | (((qh >> 6) & 0x3) << 4)
    q = (np.concatenate([q1, q2, q3, q4], axis=2).astype(np.int16) - 32).astype(np.int8)
    return (
        q.reshape(n, k),
        np.ascontiguousarray(sc).reshape(n, k // 16),
        None,
        16,
        d.astype(np.float32).reshape(n, k // 256),
        None,
    )


def _repack_q5_k_coded(data: np.ndarray, n: int, k: int):
    q, _, _, group = _repack_q5_k(data, n, k)
    bl = data.reshape(-1, 176)
    d = _b._f16_bytes_to_f32(bl[:, 0:2])
    dmin = _b._f16_bytes_to_f32(bl[:, 2:4])
    sc, m = _b._unpack_scale_min_k4(bl[:, 4:16])
    return (
        q,
        sc.astype(np.int8).reshape(n, k // 32),
        m.astype(np.int8).reshape(n, k // 32),
        group,
        d.astype(np.float32).reshape(n, k // 256),
        (-dmin.astype(np.float32)).reshape(n, k // 256),
    )


def _repack_q5_k(data: np.ndarray, n: int, k: int):
    bl = data.reshape(-1, 176)
    nb = bl.shape[0]
    d = _b._f16_bytes_to_f32(bl[:, 0:2])
    dmin = _b._f16_bytes_to_f32(bl[:, 2:4])
    sc, m = _b._unpack_scale_min_k4(bl[:, 4:16])
    qh = bl[:, 16:48]
    ql = bl[:, 48:].reshape(nb, 4, 32)
    groups = []
    for c in range(4):
        groups.append((ql[:, c] & 0xF) + (((qh >> (2 * c)) & 1) << 4))
        groups.append((ql[:, c] >> 4) + (((qh >> (2 * c + 1)) & 1) << 4))
    q = np.stack(groups, axis=1).reshape(nb, 256).astype(np.int8)
    scale = (d[:, None] * sc.astype(np.float32)).astype(np.float32)
    bias = (-(dmin[:, None] * m.astype(np.float32))).astype(np.float32)
    return q.reshape(n, k), scale.reshape(n, k // 32), bias.reshape(n, k // 32), 32


def _repack_q6_k(data: np.ndarray, n: int, k: int):
    bl = data.reshape(-1, 210)
    nb = bl.shape[0]
    ql = bl[:, 0:128].reshape(nb, 2, 64)
    qh = bl[:, 128:192].reshape(nb, 2, 32)
    sc = bl[:, 192:208].view(np.int8)
    d = _b._f16_bytes_to_f32(bl[:, 208:210])
    q1 = (ql[:, :, :32] & 0xF) | ((qh & 0x3) << 4)
    q2 = (ql[:, :, 32:] & 0xF) | (((qh >> 2) & 0x3) << 4)
    q3 = (ql[:, :, :32] >> 4) | (((qh >> 4) & 0x3) << 4)
    q4 = (ql[:, :, 32:] >> 4) | (((qh >> 6) & 0x3) << 4)
    q = (np.concatenate([q1, q2, q3, q4], axis=2).astype(np.int16) - 32).astype(np.int8)
    scale = (d[:, None] * sc.astype(np.float32)).astype(np.float32)  # (nb, 16)
    return q.reshape(n, k), scale.reshape(n, k // 16), None, 16


def _repack_q4_1(data: np.ndarray, n: int, k: int):
    bl = data.reshape(-1, 20)
    d = _b._f16_bytes_to_f32(bl[:, 0:2])
    m = _b._f16_bytes_to_f32(bl[:, 2:4])
    qs = bl[:, 4:]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.int8)
    return q.reshape(n, k), d.reshape(n, k // 32), m.reshape(n, k // 32).astype(np.float32), 32


def _repack_q5_0(data: np.ndarray, n: int, k: int):
    bl = data.reshape(-1, 22)
    d = _b._f16_bytes_to_f32(bl[:, 0:2])
    q = _b._q5_unpack(bl[:, 6:], bl[:, 2:6]).astype(np.int8)  # [0, 31]
    return (
        q.reshape(n, k),
        d.reshape(n, k // 32),
        (-16.0 * d).reshape(n, k // 32).astype(np.float32),
        32,
    )


def _repack_q5_1(data: np.ndarray, n: int, k: int):
    bl = data.reshape(-1, 24)
    d = _b._f16_bytes_to_f32(bl[:, 0:2])
    m = _b._f16_bytes_to_f32(bl[:, 2:4])
    q = _b._q5_unpack(bl[:, 8:], bl[:, 4:8]).astype(np.int8)
    return q.reshape(n, k), d.reshape(n, k // 32), m.reshape(n, k // 32).astype(np.float32), 32


def _repack_q8_1(data: np.ndarray, n: int, k: int):
    bl = data.reshape(-1, 36)
    d = _b._f16_bytes_to_f32(bl[:, 0:2])
    q = bl[:, 4:].view(np.int8)
    return q.reshape(n, k), d.reshape(n, k // 32), None, 32


def _repack_q2_k(data: np.ndarray, n: int, k: int):
    bl = data.reshape(-1, 84)
    d = _b._f16_bytes_to_f32(bl[:, 80:82])
    dmin = _b._f16_bytes_to_f32(bl[:, 82:84])
    sc = bl[:, 0:16]
    q = _b._kq_chunked_unpack2(bl[:, 16:80]).astype(np.int8)  # (nb, 16, 16)
    scale = (d[:, None] * (sc & 0xF).astype(np.float32)).astype(np.float32)
    bias = (-(dmin[:, None] * (sc >> 4).astype(np.float32))).astype(np.float32)
    return q.reshape(n, k), scale.reshape(n, k // 16), bias.reshape(n, k // 16), 16


def _repack_q3_k(data: np.ndarray, n: int, k: int):
    bl = data.reshape(-1, 110)
    nb = bl.shape[0]
    hm = bl[:, 0:32]
    q2 = _b._kq_chunked_unpack2(bl[:, 32:96])
    sc = _b._q3k_unpack_scales(bl[:, 96:108]).astype(np.int32) - 32
    d = _b._f16_bytes_to_f32(bl[:, 108:110])
    hb = np.empty((nb, 16, 16), dtype=np.uint8)
    gi = 0
    for c in range(2):
        for j in range(4):
            hb[:, gi] = (hm[:, :16] >> (4 * c + j)) & 1
            hb[:, gi + 1] = (hm[:, 16:] >> (4 * c + j)) & 1
            gi += 2
    q = (q2.astype(np.int16) - np.where(hb == 1, 0, 4)).astype(np.int8)
    scale = (d[:, None] * sc.astype(np.float32)).astype(np.float32)
    return q.reshape(n, k), scale.reshape(n, k // 16), None, 16


def _repack_iq4_nl(data: np.ndarray, n: int, k: int):
    bl = data.reshape(-1, 18)
    d = _b._f16_bytes_to_f32(bl[:, 0:2])
    qs = bl[:, 2:]
    # codebook applied at repack: codes become plain int8 affine values
    q = np.concatenate([_b.KVALUES_IQ4NL[qs & 0xF], _b.KVALUES_IQ4NL[qs >> 4]], axis=1)
    return q.reshape(n, k), d.reshape(n, k // 32), None, 32


def _repack_iq4_xs(data: np.ndarray, n: int, k: int):
    bl = data.reshape(-1, 136)
    nb = bl.shape[0]
    d = _b._f16_bytes_to_f32(bl[:, 0:2])
    scales_h = np.ascontiguousarray(bl[:, 2:4]).view("<u2").reshape(nb).astype(np.int32)
    scales_l = bl[:, 4:8]
    ib = np.arange(8)
    ls_lo = np.where(ib % 2 == 0, scales_l[:, ib // 2] & 0xF, scales_l[:, ib // 2] >> 4)
    ls = (ls_lo.astype(np.int32) | (((scales_h[:, None] >> (2 * ib)) & 3) << 4)) - 32
    qs = bl[:, 8:].reshape(nb, 8, 16)
    q = np.concatenate([_b.KVALUES_IQ4NL[qs & 0xF], _b.KVALUES_IQ4NL[qs >> 4]], axis=2)
    scale = (d[:, None] * ls.astype(np.float32)).astype(np.float32)
    return q.reshape(n, k), scale.reshape(n, k // 32), None, 32


_REPACKERS = {
    GGMLType.Q8_0: _repack_q8_0,
    GGMLType.Q8_1: _repack_q8_1,
    GGMLType.Q4_0: _repack_q4_0,
    GGMLType.Q4_1: _repack_q4_1,
    GGMLType.Q5_0: _repack_q5_0,
    GGMLType.Q5_1: _repack_q5_1,
    GGMLType.Q2_K: _repack_q2_k,
    GGMLType.Q3_K: _repack_q3_k,
    GGMLType.Q4_K: _repack_q4_k,
    GGMLType.Q5_K: _repack_q5_k,
    GGMLType.Q6_K: _repack_q6_k,
    GGMLType.IQ4_NL: _repack_iq4_nl,
    GGMLType.IQ4_XS: _repack_iq4_xs,
}

# codebook formats collapse onto the same affine model after the grid lookup
# (quant/iq_blocks.py) — the TPU runtime never sees a codebook
from .iq_blocks import IQ_REPACKERS as _IQ_REPACKERS  # noqa: E402

_REPACKERS.update(_IQ_REPACKERS)

REPACKABLE_TYPES = tuple(sorted(_REPACKERS, key=int))

#: k-quant formats whose super-block factorization the loader keeps on-chip
#: (QTensor.sup coded scales — the bit-exact serving mode; see quant/serving)
_CODED_REPACKERS = {
    GGMLType.Q4_K: _repack_q4_k_coded,
    GGMLType.Q5_K: _repack_q5_k_coded,
    GGMLType.Q6_K: _repack_q6_k_coded,
}
CODED_TYPES = tuple(sorted(_CODED_REPACKERS, key=int))


def repack_coded_numpy(data: np.ndarray, ggml_type: GGMLType, shape: tuple[int, ...]):
    """GGUF packed bytes -> (q, sub-scale codes, min codes|None, G,
    super-scale f32 [N, K/256], -super-min|None) for CODED_TYPES."""
    ggml_type = GGMLType(ggml_type)
    if len(shape) != 2:
        n, k = int(np.prod(shape[:-1])), shape[-1]
    else:
        n, k = shape
    return _CODED_REPACKERS[ggml_type](
        np.ascontiguousarray(data, dtype=np.uint8), n, k
    )


def repack_numpy(data: np.ndarray, ggml_type: GGMLType, shape: tuple[int, ...], use_native: bool = True):
    """GGUF packed bytes -> (q int8 [N,K], scale f32 [N,K/G], bias|None, G).

    `shape` is numpy-convention (N, K) with K contiguous. Uses the C++
    repacker (quant/native.py) when available; numpy otherwise (bit-identical).
    """
    ggml_type = GGMLType(ggml_type)
    if len(shape) != 2:
        n, k = int(np.prod(shape[:-1])), shape[-1]
    else:
        n, k = shape
    if use_native:
        from .native import repack_native

        out = repack_native(data, ggml_type, n, k)
        if out is not None:
            return out
    return _REPACKERS[ggml_type](np.ascontiguousarray(data, dtype=np.uint8), n, k)


def qtensor_from_gguf(
    data: np.ndarray,
    ggml_type: GGMLType,
    shape: tuple[int, ...],
    scale_dtype=jnp.float32,
    device_put=jnp.asarray,
    layout: str = "nk",
) -> QTensor:
    q, scale, bias, group = repack_numpy(data, ggml_type, shape)
    if layout == "kn":
        q, scale = np.ascontiguousarray(q.T), np.ascontiguousarray(scale.T)
        bias = None if bias is None else np.ascontiguousarray(bias.T)
    if scale_dtype != jnp.float32:
        scale = scale.astype(np.dtype(scale_dtype))
    return QTensor(
        q=device_put(q),
        scale=device_put(scale),
        bias=None if bias is None else device_put(bias),
        group=group,
        ggml_type=int(ggml_type),
        layout=layout,
    )


def concat_qtensors(tensors: list, axis_n: bool = True):
    """Concatenate QTensors (or dense arrays) along the logical N axis —
    used to fuse qkv / gate+up projections into single MXU calls."""
    first = tensors[0]
    if not isinstance(first, QTensor):
        return np.concatenate([np.asarray(t) for t in tensors], axis=-2)  # dense [.., N, K]
    assert all(t.layout == first.layout and t.group == first.group and t.packed == first.packed for t in tensors)
    # coded-scale layout must be uniform: a mixed concat would misread one
    # side's codes as products (or vice versa)
    assert all((t.sup is None) == (first.sup is None) for t in tensors)
    xp = jnp if isinstance(first.q, jax.Array) else np
    ax = -1 if first.layout == "kn" else -2

    def cat(field):
        vals = [getattr(t, field) for t in tensors]
        return None if vals[0] is None else xp.concatenate(vals, axis=ax)

    return QTensor(
        q=cat("q"),
        scale=cat("scale"),
        bias=cat("bias"),
        group=first.group,
        ggml_type=first.ggml_type,
        layout=first.layout,
        packed=first.packed,
        sup=cat("sup"),
        sup_min=cat("sup_min"),
    )


def quantize_array(w: np.ndarray, ggml_type: GGMLType, layout: str = "nk") -> QTensor:
    """Quantize a dense float [N, K] array straight to a QTensor (tests, on-the-fly
    quantization of HF checkpoints)."""
    packed = _b.quantize(np.asarray(w, dtype=np.float32), ggml_type)
    return qtensor_from_gguf(packed, ggml_type, tuple(w.shape), layout=layout)
