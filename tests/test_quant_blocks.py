"""Quant format tests: round-trip error bounds + bit-exact decode parity against
the reference's gguf-py numpy implementation (independent oracle, mirrors the
reference's quantize round-trip tests tests/test-quantize-fns.cpp)."""

import numpy as np
import pytest

from eagle_tpu.gguf.constants import GGML_TYPE_TRAITS, GGMLType
from eagle_tpu.quant import blocks

QTYPES = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
]

# max acceptable round-trip RMSE relative to data std (thresholds in the spirit
# of tests/test-quantize-fns.cpp MAX_QUANTIZATION_TOTAL_ERROR)
# NOTE: bounds sized for the simple min/max encoder in quant/blocks.py; the
# iterative-search encoder (kquant_search) is held to tighter bounds.
# (the synthetic data's 8x outliers inflate per-block absmax, so these are far
# above the pure-gaussian floor for every format — including in ggml itself)
RTOL = {
    GGMLType.Q4_0: 0.15,
    GGMLType.Q4_1: 0.12,
    GGMLType.Q5_0: 0.08,
    GGMLType.Q5_1: 0.06,
    GGMLType.Q8_0: 0.03,
    GGMLType.Q2_K: 0.40,
    GGMLType.Q3_K: 0.26,
    GGMLType.Q4_K: 0.11,
    GGMLType.Q5_K: 0.06,
    GGMLType.Q6_K: 0.09,
    GGMLType.IQ4_NL: 0.13,
    GGMLType.IQ4_XS: 0.13,
}


def synthetic(rng, n):
    # mixture resembling weight distributions: mostly gaussian + outliers
    x = rng.standard_normal(n).astype(np.float32)
    x[rng.integers(0, n, size=n // 100)] *= 8.0
    return x


@pytest.mark.parametrize("qtype", QTYPES)
def test_round_trip_error(rng, qtype):
    n = 256 * 16
    x = synthetic(rng, n)
    packed = blocks.quantize(x, qtype)
    tr = GGML_TYPE_TRAITS[qtype]
    assert packed.nbytes == n // tr.block_size * tr.type_size
    y = blocks.dequantize(packed, qtype, (n,))
    rmse = np.sqrt(np.mean((x - y) ** 2)) / np.std(x)
    assert rmse < RTOL[qtype], f"{qtype.name}: rmse {rmse}"


@pytest.mark.parametrize("qtype", QTYPES)
def test_decode_matches_oracle_on_our_encoding(rng, qtype, reference_gguf_py):
    """Our packed bytes must decode identically under gguf-py (same bit layout)."""
    n = 256 * 8
    x = synthetic(rng, n)
    packed = blocks.quantize(x, qtype)
    ours = blocks.dequantize(packed, qtype, (n,))
    oracle = reference_gguf_py.quants.dequantize(
        packed.reshape(1, -1), reference_gguf_py.GGMLQuantizationType(int(qtype))
    ).reshape(-1)
    np.testing.assert_array_equal(ours, oracle)


@pytest.mark.parametrize("qtype", QTYPES)
def test_decode_oracle_encoding(rng, qtype, reference_gguf_py):
    """Bytes produced by gguf-py's (ggml-equivalent) encoder must decode
    identically under our decoder."""
    n = 256 * 8
    x = synthetic(rng, n).reshape(8, -1)
    try:
        packed = reference_gguf_py.quants.quantize(
            x, reference_gguf_py.GGMLQuantizationType(int(qtype))
        )
    except NotImplementedError:
        pytest.skip(f"oracle has no {qtype.name} encoder")
    ours = blocks.dequantize(packed.reshape(-1), qtype, x.shape)
    oracle = reference_gguf_py.quants.dequantize(
        packed, reference_gguf_py.GGMLQuantizationType(int(qtype))
    )
    np.testing.assert_array_equal(ours, oracle)


@pytest.mark.parametrize("ftype", [GGMLType.F32, GGMLType.F16, GGMLType.BF16])
def test_float_passthrough(rng, ftype):
    x = rng.standard_normal(512).astype(np.float32)
    packed = blocks.quantize(x, ftype)
    y = blocks.dequantize(packed, ftype, (512,))
    if ftype == GGMLType.F32:
        np.testing.assert_array_equal(x, y)
    elif ftype == GGMLType.F16:
        np.testing.assert_array_equal(x.astype(np.float16).astype(np.float32), y)
    else:
        assert np.abs(x - y).max() < 0.02


def test_q8_k_round_trip(rng):
    """Q8_K is the activation-quant format for integer dot products (never a
    GGUF storage type, ggml-common.h:325-330) — round-trip + bsum invariants."""
    n = 256 * 4
    x = synthetic(rng, n)
    packed = blocks.quantize(x, GGMLType.Q8_K)
    y = blocks.dequantize(packed, GGMLType.Q8_K, (n,))
    rmse = np.sqrt(np.mean((x - y) ** 2)) / np.std(x)
    assert rmse < 0.03
    bl = packed.reshape(-1, 292)
    q = bl[:, 4:260].view(np.int8).astype(np.int32)
    bsums = np.ascontiguousarray(bl[:, 260:]).view("<i2").reshape(-1, 16)
    np.testing.assert_array_equal(q.reshape(-1, 16, 16).sum(axis=2), bsums)


def test_q8_0_exact_small_ints():
    x = np.arange(-16, 16, dtype=np.float32)
    packed = blocks.quantize(x, GGMLType.Q8_0)
    y = blocks.dequantize(packed, GGMLType.Q8_0, (32,))
    # max error: half a quantization step (d/2 = 16/127/2) plus the f16
    # rounding of the stored scale amplified by |q| <= 127
    assert np.abs(x - y).max() <= 16.0 / 127.0 / 2.0 + 0.01


# ---------------------------------------------------------------------------
# IQ codebook formats (decode-only): random-but-valid block bytes must decode
# bit-identically to the reference gguf-py oracle, and the affine repack
# (quant/iq_blocks.py) must reconstruct the same values.
# ---------------------------------------------------------------------------

IQ_CODEBOOK_TYPES = [
    GGMLType.IQ2_XXS,
    GGMLType.IQ2_XS,
    GGMLType.IQ2_S,
    GGMLType.IQ3_XXS,
    GGMLType.IQ3_S,
    GGMLType.IQ1_S,
    GGMLType.IQ1_M,
]


def _random_iq_blocks(rng, qtype, n_blocks):
    """Random block bytes with the f16 super-scale forced finite. Every index
    field is valid by construction (the grids have power-of-two sizes)."""
    tr = GGML_TYPE_TRAITS[qtype]
    data = rng.integers(0, 256, size=(n_blocks, tr.type_size), dtype=np.uint8)
    if qtype != GGMLType.IQ1_M:
        d = (rng.uniform(0.001, 0.1, n_blocks).astype(np.float16)).view(np.uint8)
        data[:, :2] = d.reshape(n_blocks, 2)
    else:
        # IQ1_M packs the f16 scale in the top nibbles of the 4 scale words;
        # random nibbles give a finite-but-wild f16 — clamp the exponent bits
        sc = data[:, 48:56].view("<u2")
        sc = (sc & 0x0FFF) | (np.uint16(0x3) << 12)
        data[:, 48:56] = sc.view(np.uint8)
    return data


@pytest.mark.parametrize("qtype", IQ_CODEBOOK_TYPES)
def test_iq_decode_matches_oracle(rng, qtype, reference_gguf_py):
    tr = GGML_TYPE_TRAITS[qtype]
    data = _random_iq_blocks(rng, qtype, 16)
    n = 16 * tr.block_size
    ours = blocks.dequantize(data.reshape(-1), qtype, (n,))
    oracle = reference_gguf_py.quants.dequantize(
        data.reshape(1, -1), reference_gguf_py.GGMLQuantizationType(int(qtype))
    ).reshape(-1)
    np.testing.assert_array_equal(ours, oracle, err_msg=qtype.name)


@pytest.mark.parametrize("qtype", IQ_CODEBOOK_TYPES)
def test_iq_repack_affine_exact(rng, qtype):
    """scale*q + bias from the repacker reproduces the decoder exactly, and the
    codes fit int8 (so the TPU qmm kernels can stream them unchanged)."""
    from eagle_tpu.quant.qtensor import repack_numpy

    tr = GGML_TYPE_TRAITS[qtype]
    n_rows, k = 4, 4 * tr.block_size
    data = _random_iq_blocks(rng, qtype, n_rows * 4)
    q, scale, bias, g = repack_numpy(data.reshape(-1), qtype, (n_rows, k), use_native=False)
    assert q.dtype == np.int8 and q.shape == (n_rows, k)
    assert scale.shape == (n_rows, k // g)
    vals = scale.repeat(g, axis=1) * q.astype(np.float32)
    if bias is not None:
        vals = vals + bias.repeat(g, axis=1)
    want = blocks.dequantize(data.reshape(-1), qtype, (n_rows, k))
    np.testing.assert_array_equal(vals, want, err_msg=qtype.name)


TQ_TYPES = [GGMLType.TQ1_0, GGMLType.TQ2_0]


@pytest.mark.parametrize("qtype", TQ_TYPES)
def test_tq_bit_exact_vs_oracle(rng, qtype, reference_gguf_py):
    """Ternary formats (bitnet b1.58): quantize AND dequantize bit-exact vs
    gguf-py (quantize_row_tq1_0_ref / dequantize_row_tq1_0 semantics incl.
    the base-3 fixed-point packing and uint8 overflow digit extraction)."""
    from gguf.quants import dequantize as ref_dq
    from gguf.quants import quantize as ref_q

    x = rng.standard_normal((4, 512)).astype(np.float32)
    x = (np.sign(x) * (np.abs(x) > 0.8)).astype(np.float32) * 0.05

    ours_q = blocks.quantize(x, qtype)
    ref_name = getattr(reference_gguf_py.GGMLQuantizationType, qtype.name)
    ref_bytes = np.asarray(ref_q(x, ref_name)).reshape(-1).view(np.uint8)
    assert np.array_equal(ours_q, ref_bytes)

    ours_d = blocks.dequantize(ours_q, qtype, x.shape)
    ref_d = np.asarray(ref_dq(ref_bytes.reshape(4, -1), ref_name), dtype=np.float32)
    assert np.array_equal(ours_d, ref_d)
    # pure ternary data round-trips up to the f16 storage of the block scale
    np.testing.assert_allclose(ours_d, x, atol=0, rtol=1e-3)


@pytest.mark.parametrize("qtype", TQ_TYPES)
def test_tq_gguf_roundtrip(rng, qtype, tmp_path):
    """TQ tensors ride the GGUF writer/reader and dense-dequant load path."""
    from eagle_tpu.gguf.reader import GGUFReader
    from eagle_tpu.gguf.writer import GGUFWriter

    x = (rng.integers(-1, 2, size=(8, 256)).astype(np.float32)) * 0.125
    w = GGUFWriter(tmp_path / "tq.gguf")
    w.add("general.architecture", "llama")
    w.add_tensor("t.weight", x, qtype)
    w.write()
    r = GGUFReader(tmp_path / "tq.gguf")
    assert r.tensors["t.weight"].ggml_type == int(qtype)
    np.testing.assert_array_equal(r.tensor_f32("t.weight"), x)
