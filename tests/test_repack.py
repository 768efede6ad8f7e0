"""Repacked QTensor must reconstruct bit-identically to the block dequant
reference, and qmatmul must match a dense numpy matmul."""

import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.ops.matmul import qmatmul
from eagle_tpu.quant import blocks
from eagle_tpu.quant.qtensor import REPACKABLE_TYPES, quantize_array, repack_numpy

# these tests ENCODE first; the IQ codebook formats are decode-only (their
# random-block decode parity lives in test_quant_blocks.py)
ENCODABLE = [t for t in REPACKABLE_TYPES if t in blocks.SUPPORTED_QUANT_TYPES]

SHAPES = [(8, 256), (16, 512)]


@pytest.mark.parametrize("qtype", ENCODABLE)
@pytest.mark.parametrize("shape", SHAPES)
def test_repack_reconstruction_exact(rng, qtype, shape):
    w = rng.standard_normal(shape).astype(np.float32)
    packed = blocks.quantize(w, qtype)
    golden = blocks.dequantize(packed, qtype, shape)

    q, scale, bias, g = repack_numpy(packed, qtype, shape)
    n, k = shape
    recon = q.astype(np.float32).reshape(n, k // g, g) * scale[:, :, None]
    if bias is not None:
        recon = recon + bias[:, :, None]
    np.testing.assert_array_equal(recon.reshape(shape), golden)


@pytest.mark.parametrize("qtype", ENCODABLE)
def test_qtensor_dequantize_matches_reference(rng, qtype):
    shape = (8, 256)
    w = rng.standard_normal(shape).astype(np.float32)
    packed = blocks.quantize(w, qtype)
    golden = blocks.dequantize(packed, qtype, shape)
    qt = quantize_array(w, qtype)
    np.testing.assert_allclose(np.asarray(qt.dequantize()), golden, rtol=0, atol=0)


@pytest.mark.parametrize("qtype", ENCODABLE)
def test_qmatmul_xla_close_to_dense(rng, qtype):
    n, k, b = 64, 512, 4
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    x = rng.standard_normal((b, k)).astype(np.float32)
    qt = quantize_array(w, qtype)
    wd = np.asarray(qt.dequantize())  # exact decoded weights
    want = x @ wd.T
    got = np.asarray(qmatmul(jnp.asarray(x), qt))
    # bf16 weight/act rounding inside the MXU path
    err = np.abs(got - want) / (np.abs(want).max() + 1e-6)
    assert err.max() < 0.03, err.max()


def test_qmatmul_dense_fallback(rng):
    w = rng.standard_normal((32, 128)).astype(np.float32)
    x = rng.standard_normal((2, 128)).astype(np.float32)
    got = np.asarray(qmatmul(jnp.asarray(x), jnp.asarray(w)))
    want = x @ w.T
    assert np.abs(got - want).max() / np.abs(want).max() < 0.02


@pytest.mark.parametrize("qtype", ENCODABLE)
def test_kn_layout_dequantize_matches(rng, qtype):
    shape = (64, 512)
    w = rng.standard_normal(shape).astype(np.float32)
    a = quantize_array(w, qtype, layout="nk")
    b = quantize_array(w, qtype, layout="kn")
    np.testing.assert_array_equal(np.asarray(a.dequantize()), np.asarray(b.dequantize()))


@pytest.mark.parametrize("qtype", ENCODABLE)
def test_qmatmul_xla_kn_equals_nk(rng, qtype):
    n, k, b = 64, 512, 4
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    x = rng.standard_normal((b, k)).astype(np.float32)
    got_nk = np.asarray(qmatmul(jnp.asarray(x), quantize_array(w, qtype, "nk")))
    got_kn = np.asarray(qmatmul(jnp.asarray(x), quantize_array(w, qtype, "kn")))
    np.testing.assert_allclose(got_nk, got_kn, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("qtype", ENCODABLE)
@pytest.mark.parametrize("bsz", [1, 8])
def test_pallas_kernel_interpret_matches_xla(rng, qtype, bsz):
    """Dual execution: pallas (interpreter) vs the XLA dequant path, f32 compute
    so results are near-exact (ref pattern: test-backend-ops.cpp NMSE gate)."""
    from eagle_tpu.ops.pallas_qmm import qmatmul_pallas

    n, k = 128, 512
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    x = rng.standard_normal((bsz, k)).astype(np.float32)
    qt = quantize_array(w, qtype, layout="kn")
    want = np.asarray(qmatmul(jnp.asarray(x), qt, backend="xla", compute_dtype=jnp.float32))
    got = np.asarray(
        qmatmul_pallas(jnp.asarray(x), qt, compute_dtype=jnp.float32, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q4_0])
def test_nibble_pack_roundtrip(rng, qtype):
    w = (rng.standard_normal((64, 512)) * 0.05).astype(np.float32)
    qt = quantize_array(w, qtype, layout="kn")
    packed = qt.pack_nibbles()
    assert packed.q.shape == (256, 64)
    np.testing.assert_array_equal(
        np.asarray(packed.unpack().q), np.asarray(qt.q)
    )
    np.testing.assert_array_equal(
        np.asarray(packed.dequantize()), np.asarray(qt.dequantize())
    )


@pytest.mark.parametrize("split", [False, True])
@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q4_0])
def test_pallas_packed_matches_unpacked(rng, qtype, split):
    from eagle_tpu.ops.pallas_qmm import qmatmul_pallas

    n, k = 128, 512
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    x = rng.standard_normal((4, k)).astype(np.float32)
    qt = quantize_array(w, qtype, layout="kn")
    want = np.asarray(qmatmul_pallas(jnp.asarray(x), qt, compute_dtype=jnp.float32, interpret=True))
    got = np.asarray(
        qmatmul_pallas(jnp.asarray(x), qt.pack_nibbles(), compute_dtype=jnp.float32,
                       interpret=True, split=split)
    )
    if split:
        # the opt-in split-dot path (EAGLE_TPU_QMM_SPLIT=1, measured slower —
        # kept for the record) sums the lo/hi nibble planes in a different
        # order than the unpacked single dot — identical dequant values,
        # reordered f32 accumulation
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    else:
        # default concat path: identical accumulation order — exact
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_xla_path_handles_packed(rng):
    w = (rng.standard_normal((64, 256)) * 0.05).astype(np.float32)
    x = rng.standard_normal((2, 256)).astype(np.float32)
    qt = quantize_array(w, GGMLType.Q4_K, layout="kn")
    a = np.asarray(qmatmul(jnp.asarray(x), qt, backend="xla"))
    b = np.asarray(qmatmul(jnp.asarray(x), qt.pack_nibbles(), backend="xla"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("packed", [False, True])
def test_pallas_stacked_matches_sliced(rng, packed):
    """Scalar-prefetched layer indexing must equal slicing then matmul."""
    from eagle_tpu.ops.pallas_qmm import qmatmul_pallas, qmatmul_pallas_stacked_nd

    L, n, k = 3, 128, 512
    ws = [(rng.standard_normal((n, k)) * 0.05).astype(np.float32) for _ in range(L)]
    qts = [quantize_array(w, GGMLType.Q4_K, layout="kn") for w in ws]
    if packed:
        qts = [q.pack_nibbles() for q in qts]
    import dataclasses

    stacked = dataclasses.replace(
        qts[0],
        q=jnp.stack([t.q for t in qts]),
        scale=jnp.stack([t.scale for t in qts]),
        bias=jnp.stack([t.bias for t in qts]),
    )
    x = rng.standard_normal((2, k)).astype(np.float32)
    for li in range(L):
        want = np.asarray(
            qmatmul_pallas(jnp.asarray(x), qts[li], compute_dtype=jnp.float32, interpret=True)
        )
        got = np.asarray(
            qmatmul_pallas_stacked_nd(
                jnp.asarray(x), stacked, jnp.int32(li), compute_dtype=jnp.float32,
                interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
