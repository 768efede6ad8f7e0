"""IQ codebook quant formats — IQ1_S/IQ1_M/IQ2_XXS/IQ2_XS/IQ2_S/IQ3_XXS/IQ3_S.

These formats store weights as indices into fixed E8-lattice / sign-grid
codebooks plus per-sub-block scales (block structs: ggml-common.h:334-390;
dequant semantics: ggml-quants.c dequantize_row_iq*). Unlike the affine
formats, a value is  scale * grid[index] * sign  (IQ2/IQ3) or
scale * (grid[index] + delta)  (IQ1) — but after looking up the codebook both
shapes collapse EXACTLY onto the uniform affine QTensor model:

    IQ2/IQ3:  q = sign * grid_byte  (|q| <= 62 -> int8), bias = 0
    IQ1:      q = grid in {-1,0,1},  bias = scale * (+-0.125)

so every decoder here produces (q int8, scale f32, bias|None, group) directly
and dequantization is  scale*q + bias  — bit-identical to ggml's float op
order (the sign flip and the +-delta splits are exact in f32; verified against
the reference gguf-py in tests/test_quant_blocks.py).

The codebooks themselves are format-defining interoperability data (same
category as the GGUF enums and k-quant bit layouts) extracted once from the
format's canonical tables into iq_grids.npz — see tools/extract_iq_grids.py.

Encoders are intentionally absent, matching gguf-py: IQ quantization is a
codebook-search driven by an importance matrix; files are produced by
llama-quantize. We load/serve them (and can transcode to k-quants)."""

from __future__ import annotations

import functools
from pathlib import Path

import numpy as np

from ..gguf.constants import QK_K

_NPZ = Path(__file__).parent / "iq_grids.npz"


@functools.lru_cache(maxsize=None)
def _grids():
    z = np.load(_NPZ)
    g = {k: z[k] for k in z.files}
    # uint64/uint32 rows -> little-endian byte rows, matching the C reads
    # (const uint8_t *)(iqX_grid + index)
    out = {
        "iq2xxs": g["iq2xxs_grid"].astype("<u8").view(np.uint8).reshape(256, 8),
        "iq2xs": g["iq2xs_grid"].astype("<u8").view(np.uint8).reshape(512, 8),
        "iq2s": g["iq2s_grid"].astype("<u8").view(np.uint8).reshape(1024, 8),
        "iq3xxs": g["iq3xxs_grid"].astype("<u4").view(np.uint8).reshape(256, 4),
        "iq3s": g["iq3s_grid"].astype("<u4").view(np.uint8).reshape(512, 4),
        "iq1s": g["iq1s_grid"].astype("<u8").view(np.int8).reshape(2048, 8),
    }
    # ksigns_iq2xs (ggml-common.h:465) is derivable: byte i carries the 7
    # stored sign bits plus odd-parity of them in bit 7 (the 8th sign)
    i = np.arange(128, dtype=np.uint8)
    parity = i.copy()
    parity ^= parity >> 4
    parity ^= parity >> 2
    parity ^= parity >> 1
    out["ksigns"] = (i | ((parity & 1) << 7)).astype(np.uint8)
    return out


def _f16le(b: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(b).view("<f2").astype(np.float32).reshape(b.shape[0])


def _sign_bits(sign_bytes: np.ndarray) -> np.ndarray:
    """uint8 [...] -> [...,8] of {0,1} (bit j = sign of the j-th grid value)."""
    return (sign_bytes[..., None] >> np.arange(8, dtype=np.uint8)) & 1


def _signed(grid_vals: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """Apply sign bits to unsigned grid magnitudes -> int8 codes."""
    g = grid_vals.astype(np.int16)
    return np.where(bits == 1, -g, g).astype(np.int8)


# --- IQ2_XXS: 8 sub-blocks of 32; 4 grid rows + packed signs/scale per sub ---


def _decode_iq2_xxs(bl: np.ndarray):
    G = _grids()
    nb = bl.shape[0]
    d = _f16le(bl[:, :2])
    sub = bl[:, 2:].reshape(nb, 8, 8)
    inds = sub[:, :, :4]
    aux = np.ascontiguousarray(sub[:, :, 4:]).view("<u4")[..., 0]  # [nb, 8]
    scale = d[:, None] * (0.5 + (aux >> 28).astype(np.float32)) * 0.25
    sidx = (aux[..., None] >> (7 * np.arange(4, dtype=np.uint32))).astype(np.uint8) & 0x7F
    bits = _sign_bits(G["ksigns"][sidx])  # [nb, 8, 4, 8]
    q = _signed(G["iq2xxs"][inds], bits)
    return q.reshape(nb, QK_K), scale, None, 32


# --- IQ2_XS: 32 uint16 = 9-bit grid index + 7-bit sign index; 4-bit scales ---


def _decode_iq2_xs(bl: np.ndarray):
    G = _grids()
    nb = bl.shape[0]
    d = _f16le(bl[:, :2])
    qs = np.ascontiguousarray(bl[:, 2:66]).view("<u2")  # [nb, 32]
    sc = bl[:, 66:74]
    ls = np.stack([sc & 0xF, sc >> 4], axis=-1).reshape(nb, 16).astype(np.float32)
    scale = d[:, None] * (0.5 + ls) * 0.25  # per 16 values
    bits = _sign_bits(G["ksigns"][(qs >> 9).astype(np.uint8)])
    q = _signed(G["iq2xs"][qs & 511], bits)
    return q.reshape(nb, QK_K), scale, None, 16


# --- IQ2_S: 8-bit grid index + 2 high bits in qh; raw sign bytes ------------


def _decode_iq2_s(bl: np.ndarray):
    G = _grids()
    nb = bl.shape[0]
    d = _f16le(bl[:, :2])
    qs = bl[:, 2:34].astype(np.uint16)
    signs = bl[:, 34:66]
    qh = bl[:, 66:74]
    sc = bl[:, 74:82]
    l = np.arange(32)
    idx = qs | (((qh[:, l // 4] >> (2 * (l % 4))) & 3).astype(np.uint16) << 8)
    ls = np.stack([sc & 0xF, sc >> 4], axis=-1).reshape(nb, 16).astype(np.float32)
    scale = d[:, None] * (0.5 + ls) * 0.25
    q = _signed(G["iq2s"][idx], _sign_bits(signs))
    return q.reshape(nb, QK_K), scale, None, 16


# --- IQ3_XXS: 4-value grid rows; packed signs/scale per 32-value sub --------


def _decode_iq3_xxs(bl: np.ndarray):
    G = _grids()
    nb = bl.shape[0]
    d = _f16le(bl[:, :2])
    qs = bl[:, 2:66]
    aux = np.ascontiguousarray(bl[:, 66:98]).view("<u4")  # [nb, 8]
    scale = d[:, None] * (0.5 + (aux >> 28).astype(np.float32)) * 0.5
    sidx = (aux[..., None] >> (7 * np.arange(4, dtype=np.uint32))).astype(np.uint8) & 0x7F
    bits = _sign_bits(G["ksigns"][sidx]).reshape(nb, 8, 32)
    vals = G["iq3xxs"][qs].reshape(nb, 8, 32)  # 8 rows of 4 per sub-block
    q = _signed(vals, bits)
    return q.reshape(nb, QK_K), scale, None, 32


# --- IQ3_S: 8-bit grid index + 1 high bit in qh; raw signs; 4-bit scales ----


def _decode_iq3_s(bl: np.ndarray):
    G = _grids()
    nb = bl.shape[0]
    d = _f16le(bl[:, :2])
    qs = bl[:, 2:66].reshape(nb, 8, 8).astype(np.uint16)
    qh = bl[:, 66:74]
    signs = bl[:, 74:106]
    sc = bl[:, 106:110]
    idx = qs | ((((qh[:, :, None] >> np.arange(8)) & 1)).astype(np.uint16) << 8)
    vals = G["iq3s"][idx].reshape(nb, 8, 32)
    bits = _sign_bits(signs).reshape(nb, 8, 32)
    q = _signed(vals, bits)
    ls = np.stack([sc & 0xF, sc >> 4], axis=-1).reshape(nb, 8).astype(np.float32)
    scale = d[:, None] * (1.0 + 2.0 * ls)
    return q.reshape(nb, QK_K), scale, None, 32


# --- IQ1_S: {-1,0,1} grid + per-sub +-delta (the bias slot) -----------------

_IQ1_DELTA = np.float32(0.125)  # IQ1S_DELTA / IQ1M_DELTA, ggml-quants.c


def _decode_iq1_s(bl: np.ndarray):
    G = _grids()
    nb = bl.shape[0]
    d = _f16le(bl[:, :2])
    qs = bl[:, 2:34].reshape(nb, 8, 4).astype(np.uint16)
    qh = np.ascontiguousarray(bl[:, 34:50]).view("<u2")  # [nb, 8]
    idx = qs | (((qh[:, :, None] >> (3 * np.arange(4))) & 7).astype(np.uint16) << 8)
    q = G["iq1s"][idx].reshape(nb, QK_K)  # already signed {-1,0,1}
    dl = d[:, None] * (2.0 * ((qh >> 12) & 7).astype(np.float32) + 1.0)
    delta = np.where((qh & 0x8000) != 0, -_IQ1_DELTA, _IQ1_DELTA)
    return q, dl, (dl * delta).astype(np.float32), 32


def _decode_iq1_m(bl: np.ndarray):
    G = _grids()
    nb = bl.shape[0]
    qs = bl[:, 0:32].astype(np.uint16)
    qh = bl[:, 32:48]
    sc16 = np.ascontiguousarray(bl[:, 48:56]).view("<u2")  # [nb, 4]
    # the f16 super-scale hides in the top 4 bits of the four scale words
    dbits = (sc16 & np.uint16(0xF000)) >> np.array([12, 8, 4, 0], dtype=np.uint16)
    d = (dbits[:, 0] | dbits[:, 1] | dbits[:, 2] | dbits[:, 3]).astype("<u2")
    d = d.view("<f2").astype(np.float32)
    ls = ((sc16[:, :, None] >> np.array([0, 3, 6, 9], dtype=np.uint16)) & 7)
    dl = d[:, None] * (2.0 * ls.reshape(nb, 16).astype(np.float32) + 1.0)  # per 16
    qhn = np.stack([qh & 0xF, qh >> 4], axis=-1).reshape(nb, 32)  # nibble per 8
    idx = qs | ((qhn & 7).astype(np.uint16) << 8)
    q = G["iq1s"][idx].reshape(nb, QK_K)
    delta = np.where((qhn & 8) != 0, -_IQ1_DELTA, _IQ1_DELTA)  # per 8 values
    scale8 = np.repeat(dl, 2, axis=1)  # per-16 scale -> group 8
    return q, scale8, (scale8 * delta).astype(np.float32), 8


_DECODERS = {}  # GGMLType -> (blocks[nb, bytes]) -> (q, scale, bias, group)


def _register():
    from ..gguf.constants import GGML_TYPE_TRAITS, GGMLType

    for t, fn in (
        (GGMLType.IQ2_XXS, _decode_iq2_xxs),
        (GGMLType.IQ2_XS, _decode_iq2_xs),
        (GGMLType.IQ2_S, _decode_iq2_s),
        (GGMLType.IQ3_XXS, _decode_iq3_xxs),
        (GGMLType.IQ3_S, _decode_iq3_s),
        (GGMLType.IQ1_S, _decode_iq1_s),
        (GGMLType.IQ1_M, _decode_iq1_m),
    ):
        _DECODERS[t] = (fn, GGML_TYPE_TRAITS[t].type_size)


_register()


def _dequant(fn, bsize):
    def dq(data: np.ndarray, n: int) -> np.ndarray:
        q, scale, bias, g = fn(data.reshape(-1, bsize))
        vals = scale.repeat(g, axis=1) * q.astype(np.float32)
        if bias is not None:
            vals = vals + bias.repeat(g, axis=1)
        return vals.reshape(-1)[:n]

    return dq


def _repack(fn, bsize):
    def rp(data: np.ndarray, n: int, k: int):
        q, scale, bias, g = fn(data.reshape(-1, bsize))
        return (
            q.reshape(n, k),
            scale.reshape(n, k // g),
            None if bias is None else bias.reshape(n, k // g),
            g,
        )

    return rp


IQ_DEQUANTIZERS = {t: _dequant(fn, bs) for t, (fn, bs) in _DECODERS.items()}
IQ_REPACKERS = {t: _repack(fn, bs) for t, (fn, bs) in _DECODERS.items()}
