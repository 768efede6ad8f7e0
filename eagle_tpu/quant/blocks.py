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
# Q4_1 / Q5_0 / Q5_1 / Q8_1 — 32-value legacy blocks
# (layouts: ggml/src/ggml-common.h:167-221; dequant: ggml-quants.c
#  dequantize_row_q4_1/q5_0/q5_1)
# ---------------------------------------------------------------------------


def _quantize_q4_1(x: np.ndarray) -> np.ndarray:
    nb = x.size // 32
    xb = x.reshape(nb, 32).astype(np.float32)
    mn = xb.min(axis=1)
    mx = xb.max(axis=1)
    d = (mx - mn) / 15.0
    id_ = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    xi = np.minimum(15, np.floor((xb - mn[:, None]) * id_[:, None] + 0.5)).astype(np.uint8)
    out = np.empty((nb, 20), dtype=np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = _f16(mn).view(np.uint8).reshape(nb, 2)
    out[:, 4:] = xi[:, :16] | (xi[:, 16:] << 4)
    return out.reshape(-1)


def _dequantize_q4_1(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 20)
    d = _f16_bytes_to_f32(blocks[:, 0:2])
    m = _f16_bytes_to_f32(blocks[:, 2:4])
    qs = blocks[:, 4:]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.float32)
    return (q * d[:, None] + m[:, None]).reshape(-1)[:n]


def _q5_high_bits(xi: np.ndarray) -> np.ndarray:
    """5-bit values (nb, 32) -> little-endian qh bytes (nb, 4); bit i of the
    u32 is the 5th bit of element i."""
    bits = (xi >> 4) & 1  # (nb, 32)
    weights = (1 << np.arange(32, dtype=np.uint32))[None, :]
    qh = (bits.astype(np.uint32) * weights).sum(axis=1, dtype=np.uint32)
    return qh.astype("<u4").view(np.uint8).reshape(-1, 4)


def _q5_unpack(qs: np.ndarray, qh_bytes: np.ndarray) -> np.ndarray:
    """(nb,16) nibbles + (nb,4) qh bytes -> (nb,32) 5-bit values in block order."""
    qh = np.ascontiguousarray(qh_bytes).view("<u4").reshape(-1)
    j = np.arange(16)
    lo = (qs & 0xF) | ((((qh[:, None] >> j) & 1) << 4).astype(np.uint8))
    hi = (qs >> 4) | ((((qh[:, None] >> (j + 16)) & 1) << 4).astype(np.uint8))
    return np.concatenate([lo, hi], axis=1)


def _quantize_q5_0(x: np.ndarray) -> np.ndarray:
    nb = x.size // 32
    xb = x.reshape(nb, 32).astype(np.float32)
    idx = np.abs(xb).argmax(axis=1)
    maxv = xb[np.arange(nb), idx]
    d = maxv / -16.0
    id_ = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    xi = np.minimum(31, np.floor(xb * id_[:, None] + 16.5).clip(0)).astype(np.uint8)
    out = np.empty((nb, 22), dtype=np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:6] = _q5_high_bits(xi)
    out[:, 6:] = (xi[:, :16] & 0xF) | ((xi[:, 16:] & 0xF) << 4)
    return out.reshape(-1)


def _dequantize_q5_0(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 22)
    d = _f16_bytes_to_f32(blocks[:, 0:2])
    q = _q5_unpack(blocks[:, 6:], blocks[:, 2:6]).astype(np.int32) - 16
    return (q.astype(np.float32) * d[:, None]).reshape(-1)[:n]


def _quantize_q5_1(x: np.ndarray) -> np.ndarray:
    nb = x.size // 32
    xb = x.reshape(nb, 32).astype(np.float32)
    mn = xb.min(axis=1)
    mx = xb.max(axis=1)
    d = (mx - mn) / 31.0
    id_ = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    xi = np.minimum(31, np.floor((xb - mn[:, None]) * id_[:, None] + 0.5)).astype(np.uint8)
    out = np.empty((nb, 24), dtype=np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = _f16(mn).view(np.uint8).reshape(nb, 2)
    out[:, 4:8] = _q5_high_bits(xi)
    out[:, 8:] = (xi[:, :16] & 0xF) | ((xi[:, 16:] & 0xF) << 4)
    return out.reshape(-1)


def _dequantize_q5_1(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 24)
    d = _f16_bytes_to_f32(blocks[:, 0:2])
    m = _f16_bytes_to_f32(blocks[:, 2:4])
    q = _q5_unpack(blocks[:, 8:], blocks[:, 4:8]).astype(np.float32)
    return (q * d[:, None] + m[:, None]).reshape(-1)[:n]


def _quantize_q8_1(x: np.ndarray) -> np.ndarray:
    nb = x.size // 32
    xb = x.reshape(nb, 32).astype(np.float32)
    amax = np.abs(xb).max(axis=1)
    d = amax / 127.0
    id_ = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    q = _nearest_int(xb * id_[:, None]).clip(-127, 127).astype(np.int8)
    s = d * q.sum(axis=1, dtype=np.int32)
    out = np.empty((nb, 36), dtype=np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = _f16(s).view(np.uint8).reshape(nb, 2)
    out[:, 4:] = q.view(np.uint8)
    return out.reshape(-1)


def _dequantize_q8_1(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 36)
    d = _f16_bytes_to_f32(blocks[:, 0:2])
    q = blocks[:, 4:].view(np.int8).astype(np.float32)
    return (q * d[:, None]).reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Q2_K — 16 groups of 16, 4-bit scale + 4-bit min per group, 2-bit quants
# (layout ggml-common.h:246-261; dequant ggml-quants.c dequantize_row_q2_K)
# ---------------------------------------------------------------------------

# qs byte layout shared by Q2_K/Q3_K low bits: two 128-value chunks; within a
# chunk, 4 shift levels x 32 bytes; group pair (2j, 2j+1) = bytes [0:16],
# [16:32] at shift 2j.


def _kq_chunked_unpack2(qs: np.ndarray) -> np.ndarray:
    """(nb, 64) 2-bit packed -> (nb, 16, 16) group-ordered values."""
    nb = qs.shape[0]
    ch = qs.reshape(nb, 2, 32)  # chunk, byte
    groups = []
    for c in range(2):
        for j in range(4):
            blk = (ch[:, c] >> (2 * j)) & 3
            groups.append(blk[:, :16])
            groups.append(blk[:, 16:])
    return np.stack(groups, axis=1)  # (nb, 16, 16)


def _kq_chunked_pack2(q: np.ndarray) -> np.ndarray:
    """(nb, 16, 16) group-ordered 2-bit values -> (nb, 64) packed."""
    nb = q.shape[0]
    out = np.zeros((nb, 2, 32), dtype=np.uint8)
    gi = 0
    for c in range(2):
        for j in range(4):
            out[:, c, :16] |= (q[:, gi] & 3) << (2 * j)
            out[:, c, 16:] |= (q[:, gi + 1] & 3) << (2 * j)
            gi += 2
    return out.reshape(nb, 64)


def _quantize_q2_k(x: np.ndarray) -> np.ndarray:
    nb = x.size // QK_K
    xg = x.reshape(nb, 16, 16).astype(np.float32)
    gmin = np.minimum(xg.min(axis=2), 0.0)
    gmax = np.maximum(xg.max(axis=2), 0.0)
    scales = (gmax - gmin) / 3.0
    mins = -gmin
    d = scales.max(axis=1) / 15.0
    dmin = mins.max(axis=1) / 15.0
    d16 = _f16(d).astype(np.float32)
    dmin16 = _f16(dmin).astype(np.float32)
    inv_d = np.where(d16 > 0, 1.0 / np.where(d16 == 0, 1.0, d16), 0.0)
    inv_m = np.where(dmin16 > 0, 1.0 / np.where(dmin16 == 0, 1.0, dmin16), 0.0)
    ls = _nearest_int(scales * inv_d[:, None]).clip(0, 15).astype(np.uint8)
    lm = _nearest_int(mins * inv_m[:, None]).clip(0, 15).astype(np.uint8)
    eff_d = d16[:, None] * ls
    eff_m = dmin16[:, None] * lm
    inv_eff = np.where(eff_d > 0, 1.0 / np.where(eff_d == 0, 1.0, eff_d), 0.0)
    q = _nearest_int((xg + eff_m[:, :, None]) * inv_eff[:, :, None]).clip(0, 3).astype(np.uint8)
    out = np.empty((nb, 84), dtype=np.uint8)
    out[:, 0:16] = ls | (lm << 4)
    out[:, 16:80] = _kq_chunked_pack2(q)
    out[:, 80:82] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 82:84] = _f16(dmin).view(np.uint8).reshape(nb, 2)
    return out.reshape(-1)


def _dequantize_q2_k(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 84)
    d = _f16_bytes_to_f32(blocks[:, 80:82])
    dmin = _f16_bytes_to_f32(blocks[:, 82:84])
    sc = blocks[:, 0:16]
    q = _kq_chunked_unpack2(blocks[:, 16:80]).astype(np.float32)  # (nb,16,16)
    dl = d[:, None] * (sc & 0xF).astype(np.float32)
    ml = dmin[:, None] * (sc >> 4).astype(np.float32)
    vals = dl[:, :, None] * q - ml[:, :, None]
    return vals.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Q3_K — 16 groups of 16, 6-bit signed scales, 3-bit quants (2-bit low in qs +
# high bit in hmask, hbit clear => subtract 4)
# (layout ggml-common.h:263-273; dequant ggml-quants.c dequantize_row_q3_K)
# ---------------------------------------------------------------------------


def _q3k_unpack_scales(scales: np.ndarray) -> np.ndarray:
    """(nb, 12) -> (nb, 16) int8 6-bit scales (pre-bias, i.e. 0..63)."""
    s = scales.astype(np.uint8)
    out = np.empty(s.shape[:-1] + (16,), dtype=np.uint8)
    hi = s[..., 8:12]  # 2-bit fields: scale i gets bits (2*(i//4)) of byte i%4
    out[..., 0:4] = (s[..., 0:4] & 0xF) | (((hi >> 0) & 3) << 4)
    out[..., 4:8] = (s[..., 4:8] & 0xF) | (((hi >> 2) & 3) << 4)
    out[..., 8:12] = (s[..., 0:4] >> 4) | (((hi >> 4) & 3) << 4)
    out[..., 12:16] = (s[..., 4:8] >> 4) | (((hi >> 6) & 3) << 4)
    return out


def _q3k_pack_scales(sc: np.ndarray) -> np.ndarray:
    """(nb, 16) 6-bit values -> (nb, 12) packed."""
    nb = sc.shape[0]
    out = np.zeros((nb, 12), dtype=np.uint8)
    out[:, 0:4] = (sc[:, 0:4] & 0xF) | ((sc[:, 8:12] & 0xF) << 4)
    out[:, 4:8] = (sc[:, 4:8] & 0xF) | ((sc[:, 12:16] & 0xF) << 4)
    out[:, 8:12] = (
        ((sc[:, 0:4] >> 4) & 3)
        | (((sc[:, 4:8] >> 4) & 3) << 2)
        | (((sc[:, 8:12] >> 4) & 3) << 4)
        | (((sc[:, 12:16] >> 4) & 3) << 6)
    )
    return out


def _quantize_q3_k(x: np.ndarray) -> np.ndarray:
    nb = x.size // QK_K
    xg = x.reshape(nb, 16, 16).astype(np.float32)
    absmax = np.abs(xg).max(axis=2)
    gscale = absmax / 4.0  # q in [-4, 3]
    smax = gscale.max(axis=1)
    d = smax / 31.0  # 6-bit signed scale, positive half
    d16 = _f16(d).astype(np.float32)
    inv_d = np.where(d16 > 0, 1.0 / np.where(d16 == 0, 1.0, d16), 0.0)
    sc = _nearest_int(gscale * inv_d[:, None]).clip(-32, 31)
    eff = d16[:, None] * sc.astype(np.float32)
    inv_eff = np.where(eff != 0, 1.0 / np.where(eff == 0, 1.0, eff), 0.0)
    q = _nearest_int(xg * inv_eff[:, :, None]).clip(-4, 3) + 4  # [0, 7]
    hbit = (q >> 2).astype(np.uint8)  # 1 => no subtraction
    q2 = (q & 3).astype(np.uint8)
    out = np.empty((nb, 110), dtype=np.uint8)
    # hmask: bit (4*chunk + j) of hmask byte l covers group pair at that shift
    hm = np.zeros((nb, 32), dtype=np.uint8)
    gi = 0
    for c in range(2):
        for j in range(4):
            hm[:, :16] |= hbit[:, gi] << (4 * c + j)
            hm[:, 16:] |= hbit[:, gi + 1] << (4 * c + j)
            gi += 2
    out[:, 0:32] = hm
    out[:, 32:96] = _kq_chunked_pack2(q2.reshape(nb, 16, 16))
    out[:, 96:108] = _q3k_pack_scales(((sc + 32).astype(np.uint8)))
    out[:, 108:110] = _f16(d).view(np.uint8).reshape(nb, 2)
    return out.reshape(-1)


def _dequantize_q3_k(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 110)
    nb = blocks.shape[0]
    hm = blocks[:, 0:32]
    q2 = _kq_chunked_unpack2(blocks[:, 32:96])  # (nb, 16, 16)
    sc = _q3k_unpack_scales(blocks[:, 96:108]).astype(np.int32) - 32
    d = _f16_bytes_to_f32(blocks[:, 108:110])
    # rebuild high bits in group order
    hb = np.empty((nb, 16, 16), dtype=np.uint8)
    gi = 0
    for c in range(2):
        for j in range(4):
            hb[:, gi] = (hm[:, :16] >> (4 * c + j)) & 1
            hb[:, gi + 1] = (hm[:, 16:] >> (4 * c + j)) & 1
            gi += 2
    q = q2.astype(np.int32) - np.where(hb == 1, 0, 4)
    vals = d[:, None, None] * sc[:, :, None].astype(np.float32) * q.astype(np.float32)
    return vals.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# IQ4_NL / IQ4_XS — 4-bit codes into a fixed non-linear codebook
# (table ggml-quants.c:2434 kvalues_iq4nl; dequant :2436-2466,4733)
# ---------------------------------------------------------------------------

KVALUES_IQ4NL = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113],
    dtype=np.int8,
)


def _iq4_encode(scaled: np.ndarray) -> np.ndarray:
    """Nearest-codebook-index encode of already-scaled values."""
    kv = KVALUES_IQ4NL.astype(np.float32)
    mid = (kv[:-1] + kv[1:]) / 2.0
    return np.searchsorted(mid, scaled).astype(np.uint8)


def _quantize_iq4_nl(x: np.ndarray) -> np.ndarray:
    nb = x.size // 32
    xb = x.reshape(nb, 32).astype(np.float32)
    maxpos = np.maximum(xb.max(axis=1), 0.0)
    maxneg = np.maximum(-xb.min(axis=1), 0.0)
    d = np.maximum(maxpos / 113.0, maxneg / 127.0)
    d16 = _f16(d).astype(np.float32)
    id_ = np.where(d16 > 0, 1.0 / np.where(d16 == 0, 1.0, d16), 0.0)
    qi = _iq4_encode(xb * id_[:, None])
    out = np.empty((nb, 18), dtype=np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:] = qi[:, :16] | (qi[:, 16:] << 4)
    return out.reshape(-1)


def _dequantize_iq4_nl(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 18)
    d = _f16_bytes_to_f32(blocks[:, 0:2])
    qs = blocks[:, 2:]
    q = np.concatenate(
        [KVALUES_IQ4NL[qs & 0xF], KVALUES_IQ4NL[qs >> 4]], axis=1
    ).astype(np.float32)
    return (q * d[:, None]).reshape(-1)[:n]


def _quantize_iq4_xs(x: np.ndarray) -> np.ndarray:
    nb = x.size // QK_K
    xg = x.reshape(nb, 8, 32).astype(np.float32)
    maxpos = np.maximum(xg.max(axis=2), 0.0)
    maxneg = np.maximum(-xg.min(axis=2), 0.0)
    gscale = np.maximum(maxpos / 113.0, maxneg / 127.0)
    d = gscale.max(axis=1) / 31.0
    d16 = _f16(d).astype(np.float32)
    inv_d = np.where(d16 > 0, 1.0 / np.where(d16 == 0, 1.0, d16), 0.0)
    ls = _nearest_int(gscale * inv_d[:, None]).clip(-32, 31)
    eff = d16[:, None] * ls.astype(np.float32)
    inv_eff = np.where(eff != 0, 1.0 / np.where(eff == 0, 1.0, eff), 0.0)
    qi = _iq4_encode(xg * inv_eff[:, :, None]).reshape(nb, 8, 32)
    ls_u = (ls + 32).astype(np.uint16)  # [0, 63]
    out = np.empty((nb, 136), dtype=np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(nb, 2)
    scales_h = np.zeros(nb, dtype=np.uint16)
    for ib in range(8):
        scales_h |= ((ls_u[:, ib] >> 4) & 3) << (2 * ib)
    out[:, 2:4] = scales_h.astype("<u2").view(np.uint8).reshape(nb, 2)
    out[:, 4:8] = ((ls_u[:, 0::2] & 0xF) | ((ls_u[:, 1::2] & 0xF) << 4)).astype(np.uint8)
    out[:, 8:] = (qi[:, :, :16] | (qi[:, :, 16:] << 4)).reshape(nb, 128)
    return out.reshape(-1)


def _dequantize_iq4_xs(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 136)
    nb = blocks.shape[0]
    d = _f16_bytes_to_f32(blocks[:, 0:2])
    scales_h = np.ascontiguousarray(blocks[:, 2:4]).view("<u2").reshape(nb).astype(np.int32)
    scales_l = blocks[:, 4:8]
    ib = np.arange(8)
    ls_lo = np.where(ib % 2 == 0, scales_l[:, ib // 2] & 0xF, scales_l[:, ib // 2] >> 4)
    ls = (ls_lo.astype(np.int32) | (((scales_h[:, None] >> (2 * ib)) & 3) << 4)) - 32
    qs = blocks[:, 8:].reshape(nb, 8, 16)
    q = np.concatenate(
        [KVALUES_IQ4NL[qs & 0xF], KVALUES_IQ4NL[qs >> 4]], axis=2
    ).astype(np.float32)
    vals = d[:, None, None] * ls[:, :, None].astype(np.float32) * q
    return vals.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Q8_K — activation quantization for integer dot products (f32 scale, int8
# quants, per-16 sums). Never a GGUF storage type; used on-device for the
# int8 MXU path. (layout ggml-common.h:325-330)
# ---------------------------------------------------------------------------


def _quantize_q8_k(x: np.ndarray) -> np.ndarray:
    nb = x.size // QK_K
    xb = x.reshape(nb, QK_K).astype(np.float32)
    amax = np.abs(xb).max(axis=1)
    d = amax / 127.0
    id_ = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    q = _nearest_int(xb * id_[:, None]).clip(-127, 127).astype(np.int8)
    bsums = q.reshape(nb, 16, 16).sum(axis=2, dtype=np.int16)
    out = np.empty((nb, 292), dtype=np.uint8)
    out[:, 0:4] = d.astype("<f4").view(np.uint8).reshape(nb, 4)
    out[:, 4:260] = q.view(np.uint8)
    out[:, 260:] = bsums.astype("<i2").view(np.uint8).reshape(nb, 32)
    return out.reshape(-1)


def _dequantize_q8_k(data: np.ndarray, n: int) -> np.ndarray:
    blocks = data.reshape(-1, 292)
    d = np.ascontiguousarray(blocks[:, 0:4]).view("<f4").reshape(-1)
    q = blocks[:, 4:260].view(np.int8).astype(np.float32)
    return (q * d[:, None]).reshape(-1)[:n]


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


# ---------------------------------------------------------------------------
# TQ1_0 / TQ2_0 — ternary (bitnet b1.58) 256-value blocks, trailing f16 absmax
# scale; values in {-1, 0, 1}. TQ1_0 packs 5 values/byte base-3 with the
# fixed-point "q*3>>8" digit extraction trick, TQ2_0 is plain 2-bit
# (ggml-quants.c quantize_row_tq1_0_ref:*, dequantize_row_tq1_0:2137).
# ---------------------------------------------------------------------------


def _lround(x: np.ndarray) -> np.ndarray:
    """C lroundf: round half AWAY from zero (np.rint is half-even)."""
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int32)


def _quantize_tq2_0(x: np.ndarray) -> np.ndarray:
    nb = x.size // QK_K
    xb = x.reshape(nb, QK_K).astype(np.float32)
    d = np.abs(xb).max(axis=1)
    id_ = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    q = (_lround(xb * id_[:, None]) + 1).astype(np.uint8)  # 0,1,2
    # element (c*128 + n*32 + m) -> bits 2n of byte c*32+m
    q4 = q.reshape(nb, 2, 4, 32)
    qs = np.zeros((nb, 2, 32), np.uint8)
    for n in range(4):
        qs |= (q4[:, :, n] << (2 * n)).astype(np.uint8)
    out = np.empty((nb, 66), np.uint8)
    out[:, :64] = qs.reshape(nb, 64)
    out[:, 64:] = _f16(d).view(np.uint8).reshape(nb, 2)
    return out.reshape(-1)


def _dequantize_tq2_0(data: np.ndarray, n: int) -> np.ndarray:
    nb = n // QK_K
    blocks = data[: nb * 66].reshape(nb, 66)
    d = _f16_bytes_to_f32(blocks[:, 64:66])
    qs = blocks[:, :64].reshape(nb, 2, 32)
    vals = np.empty((nb, 2, 4, 32), np.int8)
    for l in range(4):
        vals[:, :, l] = ((qs >> (2 * l)) & 3).astype(np.int8) - 1
    return (vals.reshape(nb, QK_K).astype(np.float32) * d[:, None]).reshape(-1)[:n]


def _tq1_pack(q: np.ndarray, denom: int) -> np.ndarray:
    """Pack base-3 digit groups [..., n_digits] MSB-first into bytes with the
    ceiling-division fixed-point encoding (quantize_row_tq1_0_ref)."""
    val = np.zeros(q.shape[:-1], np.uint16)
    for i in range(q.shape[-1]):
        val = val * 3 + q[..., i]
    return ((val.astype(np.uint32) * 256 + (denom - 1)) // denom).astype(np.uint8)


def _tq1_unpack(b: np.ndarray, count: int) -> np.ndarray:
    """Extract `count` digits [..., count] from the fixed-point bytes
    (dequantize_row_tq1_0: q = byte * 3^n (mod 256); digit = (q*3) >> 8)."""
    out = np.empty(b.shape + (count,), np.int8)
    for nd in range(count):
        qn = (b.astype(np.uint32) * (3 ** nd)) & 0xFF
        out[..., nd] = ((qn * 3) >> 8).astype(np.int8) - 1
    return out


def _quantize_tq1_0(x: np.ndarray) -> np.ndarray:
    nb = x.size // QK_K
    xb = x.reshape(nb, QK_K).astype(np.float32)
    d = np.abs(xb).max(axis=1)
    id_ = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    q = (_lround(xb * id_[:, None]) + 1).astype(np.uint16)  # 0,1,2
    # 160 elems -> 32 bytes (5/byte, digit n at element n*32+m)
    qa = _tq1_pack(q[:, :160].reshape(nb, 5, 32).transpose(0, 2, 1), 243)
    # 80 elems -> 16 bytes (digit n at element 160 + n*16 + m)
    qb = _tq1_pack(q[:, 160:240].reshape(nb, 5, 16).transpose(0, 2, 1), 243)
    # 16 elems -> qh 4 bytes (digit m at element 240 + j + m*4)
    qh = _tq1_pack(q[:, 240:].reshape(nb, 4, 4).transpose(0, 2, 1), 81)
    out = np.empty((nb, 54), np.uint8)
    out[:, :32] = qa
    out[:, 32:48] = qb
    out[:, 48:52] = qh
    out[:, 52:] = _f16(d).view(np.uint8).reshape(nb, 2)
    return out.reshape(-1)


def _dequantize_tq1_0(data: np.ndarray, n: int) -> np.ndarray:
    nb = n // QK_K
    blocks = data[: nb * 54].reshape(nb, 54)
    d = _f16_bytes_to_f32(blocks[:, 52:54])
    vals = np.empty((nb, QK_K), np.int8)
    # [nb, 32, 5] -> element n*32+m
    vals[:, :160] = _tq1_unpack(blocks[:, :32], 5).transpose(0, 2, 1).reshape(nb, 160)
    vals[:, 160:240] = _tq1_unpack(blocks[:, 32:48], 5).transpose(0, 2, 1).reshape(nb, 80)
    vals[:, 240:] = _tq1_unpack(blocks[:, 48:52], 4).transpose(0, 2, 1).reshape(nb, 16)
    return (vals.astype(np.float32) * d[:, None]).reshape(-1)[:n]


_QUANTIZERS = {
    GGMLType.F32: _quantize_f32,
    GGMLType.F16: _quantize_f16,
    GGMLType.BF16: _quantize_bf16,
    GGMLType.Q4_0: _quantize_q4_0,
    GGMLType.Q4_1: _quantize_q4_1,
    GGMLType.Q5_0: _quantize_q5_0,
    GGMLType.Q5_1: _quantize_q5_1,
    GGMLType.Q8_0: _quantize_q8_0,
    GGMLType.Q8_1: _quantize_q8_1,
    GGMLType.Q2_K: _quantize_q2_k,
    GGMLType.Q3_K: _quantize_q3_k,
    GGMLType.Q4_K: _quantize_q4_k,
    GGMLType.Q5_K: _quantize_q5_k,
    GGMLType.Q6_K: _quantize_q6_k,
    GGMLType.Q8_K: _quantize_q8_k,
    GGMLType.IQ4_NL: _quantize_iq4_nl,
    GGMLType.IQ4_XS: _quantize_iq4_xs,
    GGMLType.TQ1_0: _quantize_tq1_0,
    GGMLType.TQ2_0: _quantize_tq2_0,
}

_DEQUANTIZERS = {
    GGMLType.F32: _dequantize_f32,
    GGMLType.F16: _dequantize_f16,
    GGMLType.BF16: _dequantize_bf16,
    GGMLType.Q4_0: _dequantize_q4_0,
    GGMLType.Q4_1: _dequantize_q4_1,
    GGMLType.Q5_0: _dequantize_q5_0,
    GGMLType.Q5_1: _dequantize_q5_1,
    GGMLType.Q8_0: _dequantize_q8_0,
    GGMLType.Q8_1: _dequantize_q8_1,
    GGMLType.Q2_K: _dequantize_q2_k,
    GGMLType.Q3_K: _dequantize_q3_k,
    GGMLType.Q4_K: _dequantize_q4_k,
    GGMLType.Q5_K: _dequantize_q5_k,
    GGMLType.Q6_K: _dequantize_q6_k,
    GGMLType.Q8_K: _dequantize_q8_k,
    GGMLType.IQ4_NL: _dequantize_iq4_nl,
    GGMLType.IQ4_XS: _dequantize_iq4_xs,
    GGMLType.TQ1_0: _dequantize_tq1_0,
    GGMLType.TQ2_0: _dequantize_tq2_0,
}

# codebook formats (decode-only, like gguf-py — see quant/iq_blocks.py)
from .iq_blocks import IQ_DEQUANTIZERS as _IQ_DEQUANTIZERS  # noqa: E402

_DEQUANTIZERS.update(_IQ_DEQUANTIZERS)

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
