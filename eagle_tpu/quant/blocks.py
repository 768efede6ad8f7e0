"""Block quantization formats — vectorized numpy reference implementation.

Bit-layout compatible with ggml's block formats so GGUF files interchange with
llama.cpp (layout facts: ggml/src/ggml-common.h:160-340; dequant semantics:
ggml/src/ggml-quants.c dequantize_row_*). Dequantization here is bit-exact with
the ggml CPU reference; quantization uses straightforward min/max or absmax
scale selection (valid blocks, simpler search than ggml's iterative quantizers —
see eagle_tpu/quant/kquant_search.py for the higher-quality encoder).

This module is the golden reference that device (XLA / Pallas) paths are tested
against, mirroring the reference's test-backend-ops strategy
(tests/test-backend-ops.cpp:306-562: every device kernel is compared to a CPU
golden implementation).
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGML_TYPE_TRAITS, K_SCALE_SIZE, QK_K, GGMLType

__all__ = ["quantize", "dequantize", "SUPPORTED_QUANT_TYPES"]


def _f16(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float16)


def _f16_bytes_to_f32(b: np.ndarray) -> np.ndarray:
    """Decode little-endian f16 bytes: (..., 2k) uint8 -> (..., k) float32,
    with the k axis dropped when k == 1."""
    k = b.shape[-1] // 2
    out = np.ascontiguousarray(b).view("<f2").astype(np.float32)
    return out.reshape(b.shape[:-1]) if k == 1 else out


def _nearest_int(x: np.ndarray) -> np.ndarray:
    """ggml's nearest_int rounds half-to-even (via the +2^23 float trick);
    np.rint matches."""
    return np.rint(x).astype(np.int32)


# ---------------------------------------------------------------------------
# Q8_0 — 32-value blocks, f16 scale + int8 quants (absmax symmetric)
# ---------------------------------------------------------------------------


def _quantize_q8_0(x: np.ndarray) -> np.ndarray:
    nb = x.size // 32
    xb = x.reshape(nb, 32).astype(np.float32)
    amax = np.abs(xb).max(axis=1)
    d = amax / 127.0
    id_ = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    q = _nearest_int(xb * id_[:, None]).clip(-127, 127).astype(np.int8)
    out = np.empty((nb, 34), dtype=np.uint8)
    out[:, :2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def _dequantize_q8_0(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 34)
    d = _f16_bytes_to_f32(blocks[:, :2])
    q = blocks[:, 2:].view(np.int8).astype(np.float32)
    return (q * d[:, None]).reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Q4_0 — 32-value blocks, f16 scale, 4-bit quants offset by 8
# ---------------------------------------------------------------------------


def _quantize_q4_0(x: np.ndarray) -> np.ndarray:
    nb = x.size // 32
    xb = x.reshape(nb, 32).astype(np.float32)
    # scale from the signed max-|value| element, mapped to -8
    idx = np.abs(xb).argmax(axis=1)
    maxv = xb[np.arange(nb), idx]
    d = maxv / -8.0
    id_ = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    # C: (int8_t)(x*id + 8.5f) truncates toward zero; arg is >= 0 here so floor
    xi = np.minimum(15, np.floor(xb * id_[:, None] + 8.5).clip(0)).astype(np.uint8)
    lo, hi = xi[:, :16], xi[:, 16:]
    out = np.empty((nb, 18), dtype=np.uint8)
    out[:, :2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:] = lo | (hi << 4)
    return out.reshape(-1)


def _dequantize_q4_0(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 18)
    d = _f16_bytes_to_f32(blocks[:, :2])
    qs = blocks[:, 2:]
    lo = (qs & 0xF).astype(np.int32) - 8
    hi = (qs >> 4).astype(np.int32) - 8
    vals = np.concatenate([lo, hi], axis=1).astype(np.float32) * d[:, None]
    return vals.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# K-quant scale packing (Q4_K / Q5_K): 8 6-bit scales + 8 6-bit mins in 12 bytes
# (ggml-quants.c:631 get_scale_min_k4)
# ---------------------------------------------------------------------------


def _unpack_scale_min_k4(scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """scales: (nb, 12) uint8 -> (sc, m): (nb, 8) uint8 each."""
    s = scales.astype(np.uint8)
    sc = np.empty(s.shape[:-1] + (8,), dtype=np.uint8)
    m = np.empty_like(sc)
    sc[..., :4] = s[..., 0:4] & 63
    m[..., :4] = s[..., 4:8] & 63
    sc[..., 4:] = (s[..., 8:12] & 0xF) | ((s[..., 0:4] >> 6) << 4)
    m[..., 4:] = (s[..., 8:12] >> 4) | ((s[..., 4:8] >> 6) << 4)
    return sc, m


def _pack_scale_min_k4(sc: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Inverse of _unpack_scale_min_k4. sc, m: (nb, 8) uint8 in [0, 63]."""
    nb = sc.shape[0]
    out = np.zeros((nb, 12), dtype=np.uint8)
    out[:, 0:4] = (sc[:, :4] & 63) | ((sc[:, 4:] >> 4) << 6)
    out[:, 4:8] = (m[:, :4] & 63) | ((m[:, 4:] >> 4) << 6)
    out[:, 8:12] = (sc[:, 4:] & 0xF) | ((m[:, 4:] & 0xF) << 4)
    return out


def _kquant_group_scales(xg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-32-value-group scale/min for Q4_K-style asymmetric quant.

    xg: (nb, 8, 32) float32. Returns (scales, mins) both (nb, 8) float32 with
    mins >= 0 (value model: x = scale*q - min_offset, q unsigned).
    """
    gmin = np.minimum(xg.min(axis=2), 0.0)
    gmax = np.maximum(xg.max(axis=2), 0.0)
    scales = (gmax - gmin) / 15.0
    mins = -gmin
    return scales, mins


def _quantize_q4_k(x: np.ndarray) -> np.ndarray:
    nb = x.size // QK_K
    xb = x.reshape(nb, 8, 32).astype(np.float32)
    scales, mins = _kquant_group_scales(xb)
    d = scales.max(axis=1) / 63.0
    dmin = mins.max(axis=1) / 63.0
    d16 = _f16(d).astype(np.float32)
    dmin16 = _f16(dmin).astype(np.float32)
    inv_d = np.where(d16 > 0, 1.0 / np.where(d16 == 0, 1.0, d16), 0.0)
    inv_m = np.where(dmin16 > 0, 1.0 / np.where(dmin16 == 0, 1.0, dmin16), 0.0)
    ls = _nearest_int(scales * inv_d[:, None]).clip(0, 63).astype(np.uint8)
    lm = _nearest_int(mins * inv_m[:, None]).clip(0, 63).astype(np.uint8)
    # effective quantization params after scale rounding
    eff_d = d16[:, None] * ls
    eff_m = dmin16[:, None] * lm
    inv_eff = np.where(eff_d > 0, 1.0 / np.where(eff_d == 0, 1.0, eff_d), 0.0)
    q = _nearest_int((xb + eff_m[:, :, None]) * inv_eff[:, :, None]).clip(0, 15)
    q = q.astype(np.uint8).reshape(nb, 4, 2, 32)  # chunk, lo/hi, lane
    qs = q[:, :, 0, :] | (q[:, :, 1, :] << 4)  # (nb, 4, 32)
    out = np.empty((nb, 144), dtype=np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = _f16(dmin).view(np.uint8).reshape(nb, 2)
    out[:, 4:16] = _pack_scale_min_k4(ls, lm)
    out[:, 16:] = qs.reshape(nb, 128)
    return out.reshape(-1)


def _dequantize_q4_k(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 144)
    nb = blocks.shape[0]
    d = _f16_bytes_to_f32(blocks[:, 0:2])
    dmin = _f16_bytes_to_f32(blocks[:, 2:4])
    sc, m = _unpack_scale_min_k4(blocks[:, 4:16])
    qs = blocks[:, 16:].reshape(nb, 4, 32)
    lo = qs & 0xF
    hi = qs >> 4
    q = np.stack([lo, hi], axis=2).reshape(nb, 8, 32).astype(np.float32)
    scale = d[:, None] * sc.astype(np.float32)  # (nb, 8)
    off = dmin[:, None] * m.astype(np.float32)
    vals = scale[:, :, None] * q - off[:, :, None]
    return vals.reshape(-1)[:n]


def _quantize_q5_k(x: np.ndarray) -> np.ndarray:
    nb = x.size // QK_K
    xb = x.reshape(nb, 8, 32).astype(np.float32)
    gmin = np.minimum(xb.min(axis=2), 0.0)
    gmax = np.maximum(xb.max(axis=2), 0.0)
    scales = (gmax - gmin) / 31.0
    mins = -gmin
    d = scales.max(axis=1) / 63.0
    dmin = mins.max(axis=1) / 63.0
    d16 = _f16(d).astype(np.float32)
    dmin16 = _f16(dmin).astype(np.float32)
    inv_d = np.where(d16 > 0, 1.0 / np.where(d16 == 0, 1.0, d16), 0.0)
    inv_m = np.where(dmin16 > 0, 1.0 / np.where(dmin16 == 0, 1.0, dmin16), 0.0)
    ls = _nearest_int(scales * inv_d[:, None]).clip(0, 63).astype(np.uint8)
    lm = _nearest_int(mins * inv_m[:, None]).clip(0, 63).astype(np.uint8)
    eff_d = d16[:, None] * ls
    eff_m = dmin16[:, None] * lm
    inv_eff = np.where(eff_d > 0, 1.0 / np.where(eff_d == 0, 1.0, eff_d), 0.0)
    q = _nearest_int((xb + eff_m[:, :, None]) * inv_eff[:, :, None]).clip(0, 31)
    q = q.astype(np.uint8).reshape(nb, 4, 2, 32)  # chunk, lo-group/hi-group, lane
    ql = (q[:, :, 0, :] & 0xF) | ((q[:, :, 1, :] & 0xF) << 4)  # (nb, 4, 32)
    # qh: bit 2c from group 2c (low nibble set), bit 2c+1 from group 2c+1
    qh = np.zeros((nb, 32), dtype=np.uint8)
    for c in range(4):
        qh |= ((q[:, c, 0, :] >> 4) & 1) << (2 * c)
        qh |= ((q[:, c, 1, :] >> 4) & 1) << (2 * c + 1)
    out = np.empty((nb, 176), dtype=np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = _f16(dmin).view(np.uint8).reshape(nb, 2)
    out[:, 4:16] = _pack_scale_min_k4(ls, lm)
    out[:, 16:48] = qh
    out[:, 48:] = ql.reshape(nb, 128)
    return out.reshape(-1)


def _dequantize_q5_k(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 176)
    nb = blocks.shape[0]
    d = _f16_bytes_to_f32(blocks[:, 0:2])
    dmin = _f16_bytes_to_f32(blocks[:, 2:4])
    sc, m = _unpack_scale_min_k4(blocks[:, 4:16])
    qh = blocks[:, 16:48]  # (nb, 32)
    ql = blocks[:, 48:].reshape(nb, 4, 32)
    groups = []
    for c in range(4):
        lo = (ql[:, c] & 0xF) + (((qh >> (2 * c)) & 1) << 4)
        hi = (ql[:, c] >> 4) + (((qh >> (2 * c + 1)) & 1) << 4)
        groups.append(lo)
        groups.append(hi)
    q = np.stack(groups, axis=1).astype(np.float32)  # (nb, 8, 32)
    scale = d[:, None] * sc.astype(np.float32)
    off = dmin[:, None] * m.astype(np.float32)
    vals = scale[:, :, None] * q - off[:, :, None]
    return vals.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Q6_K — 16 groups of 16, int8 group scales, f16 super scale, 6-bit quants
# ---------------------------------------------------------------------------


def _quantize_q6_k(x: np.ndarray) -> np.ndarray:
    nb = x.size // QK_K
    xg = x.reshape(nb, 16, 16).astype(np.float32)
    absmax = np.abs(xg).max(axis=2)
    gscale = absmax / 31.0  # q-32 in [-32, 31]; use 31 symmetric budget
    smax = gscale.max(axis=1)
    d = smax / 127.0
    d16 = _f16(d).astype(np.float32)
    inv_d = np.where(d16 > 0, 1.0 / np.where(d16 == 0, 1.0, d16), 0.0)
    sc = _nearest_int(gscale * inv_d[:, None]).clip(-128, 127).astype(np.int8)
    eff = d16[:, None] * sc.astype(np.float32)
    inv_eff = np.where(eff != 0, 1.0 / np.where(eff == 0, 1.0, eff), 0.0)
    q = _nearest_int(xg * inv_eff[:, :, None]).clip(-32, 31) + 32
    q = q.astype(np.uint8).reshape(nb, 2, 128)  # two 128-value chunks
    q4 = q.reshape(nb, 2, 4, 32)  # chunk, quarter, lane
    ql = np.empty((nb, 2, 64), dtype=np.uint8)
    ql[:, :, :32] = (q4[:, :, 0] & 0xF) | ((q4[:, :, 2] & 0xF) << 4)
    ql[:, :, 32:] = (q4[:, :, 1] & 0xF) | ((q4[:, :, 3] & 0xF) << 4)
    qh = (
        (q4[:, :, 0] >> 4)
        | ((q4[:, :, 1] >> 4) << 2)
        | ((q4[:, :, 2] >> 4) << 4)
        | ((q4[:, :, 3] >> 4) << 6)
    ).astype(np.uint8)  # (nb, 2, 32)
    out = np.empty((nb, 210), dtype=np.uint8)
    out[:, 0:128] = ql.reshape(nb, 128)
    out[:, 128:192] = qh.reshape(nb, 64)
    out[:, 192:208] = sc.view(np.uint8)
    out[:, 208:210] = _f16(d).view(np.uint8).reshape(nb, 2)
    return out.reshape(-1)


def _dequantize_q6_k(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 210)
    nb = blocks.shape[0]
    ql = blocks[:, 0:128].reshape(nb, 2, 64)
    qh = blocks[:, 128:192].reshape(nb, 2, 32)
    sc = blocks[:, 192:208].view(np.int8).astype(np.float32)  # (nb, 16)
    d = _f16_bytes_to_f32(blocks[:, 208:210])
    q1 = (ql[:, :, :32] & 0xF) | ((qh & 0x3) << 4)
    q2 = (ql[:, :, 32:] & 0xF) | (((qh >> 2) & 0x3) << 4)
    q3 = (ql[:, :, :32] >> 4) | (((qh >> 4) & 0x3) << 4)
    q4 = (ql[:, :, 32:] >> 4) | (((qh >> 6) & 0x3) << 4)
    q = np.concatenate([q1, q2, q3, q4], axis=2).astype(np.int32) - 32  # (nb,2,128)
    q = q.reshape(nb, 16, 16).astype(np.float32)
    vals = d[:, None, None] * sc[:, :, None] * q
    return vals.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Float passthrough types
# ---------------------------------------------------------------------------


def _quantize_f32(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x, dtype="<f4").view(np.uint8).reshape(-1)


def _dequantize_f32(data: np.ndarray, n: int) -> np.ndarray:
    return data.view("<f4")[:n].astype(np.float32)


def _quantize_f16(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x, dtype="<f4").astype("<f2").view(np.uint8).reshape(-1)


def _dequantize_f16(data: np.ndarray, n: int) -> np.ndarray:
    return data.view("<f2")[:n].astype(np.float32)


def _quantize_bf16(x: np.ndarray) -> np.ndarray:
    xf = np.ascontiguousarray(x, dtype="<f4")
    u = xf.view("<u4")
    # round-to-nearest-even on the truncated mantissa
    rounded = ((u + 0x7FFF + ((u >> 16) & 1)) >> 16).astype("<u2")
    rounded = np.where(np.isnan(xf), np.uint16(0x7FC0), rounded)
    return rounded.view(np.uint8).reshape(-1)


def _dequantize_bf16(data: np.ndarray, n: int) -> np.ndarray:
    u = data.view("<u2")[:n].astype("<u4") << 16
    return u.view("<f4").astype(np.float32)


_QUANTIZERS = {
    GGMLType.F32: _quantize_f32,
    GGMLType.F16: _quantize_f16,
    GGMLType.BF16: _quantize_bf16,
    GGMLType.Q4_0: _quantize_q4_0,
    GGMLType.Q8_0: _quantize_q8_0,
    GGMLType.Q4_K: _quantize_q4_k,
    GGMLType.Q5_K: _quantize_q5_k,
    GGMLType.Q6_K: _quantize_q6_k,
}

_DEQUANTIZERS = {
    GGMLType.F32: _dequantize_f32,
    GGMLType.F16: _dequantize_f16,
    GGMLType.BF16: _dequantize_bf16,
    GGMLType.Q4_0: _dequantize_q4_0,
    GGMLType.Q8_0: _dequantize_q8_0,
    GGMLType.Q4_K: _dequantize_q4_k,
    GGMLType.Q5_K: _dequantize_q5_k,
    GGMLType.Q6_K: _dequantize_q6_k,
}

SUPPORTED_QUANT_TYPES = tuple(sorted(_QUANTIZERS, key=int))


def quantize(values: np.ndarray, ggml_type: GGMLType) -> np.ndarray:
    """Quantize a float array to packed bytes (uint8 array).

    The trailing axis of `values` is the contiguous ("row") dimension and must
    be a multiple of the block size.
    """
    ggml_type = GGMLType(ggml_type)
    tr = GGML_TYPE_TRAITS[ggml_type]
    if values.shape[-1] % tr.block_size != 0:
        raise ValueError(
            f"{ggml_type.name}: row length {values.shape[-1]} not a multiple of {tr.block_size}"
        )
    return _QUANTIZERS[ggml_type](np.ascontiguousarray(values, dtype=np.float32).reshape(-1))


def dequantize(data: np.ndarray, ggml_type: GGMLType, shape: tuple[int, ...]) -> np.ndarray:
    """Dequantize packed bytes back to float32 with the given logical shape."""
    ggml_type = GGMLType(ggml_type)
    n = int(np.prod(shape)) if shape else 1
    flat = _DEQUANTIZERS[ggml_type](np.ascontiguousarray(data, dtype=np.uint8).reshape(-1), n)
    return flat.reshape(shape)
