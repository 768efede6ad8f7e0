"""Native (C++) repacker must be bit-identical to the numpy reference."""

import numpy as np
import pytest

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.quant import blocks
from eagle_tpu.quant.native import get_lib, repack_native, transpose_native
from eagle_tpu.quant.qtensor import repack_numpy

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")

QTYPES = [GGMLType.Q4_0, GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K]


@pytest.mark.parametrize("qtype", QTYPES)
def test_native_matches_numpy(rng, qtype):
    n, k = 16, 512
    w = rng.standard_normal((n, k)).astype(np.float32)
    w[rng.integers(0, n), rng.integers(0, k)] *= 50
    packed = blocks.quantize(w, qtype)
    q_n, s_n, b_n, g_n = repack_native(packed, qtype, n, k)
    q_p, s_p, b_p, g_p = repack_numpy(packed, qtype, (n, k), use_native=False)
    assert g_n == g_p
    np.testing.assert_array_equal(q_n, q_p)
    np.testing.assert_array_equal(s_n, s_p)
    if b_p is None:
        assert b_n is None
    else:
        np.testing.assert_array_equal(b_n, b_p)


def test_native_f16_decode_edge_cases():
    """f16 decode covers subnormals/inf/nan identically to numpy."""
    from eagle_tpu.quant.blocks import _f16_bytes_to_f32

    vals = np.array(
        [0x0000, 0x8000, 0x0001, 0x03FF, 0x0400, 0x7BFF, 0x7C00, 0xFC00, 0x3C00, 0xC000],
        dtype=np.uint16,
    )
    # route through Q8_0 blocks whose d is each value
    want = vals.view(np.float16).astype(np.float32)
    for v, w in zip(vals, want):
        block = np.zeros(34, np.uint8)
        block[:2] = np.array([v], dtype="<u2").view(np.uint8)
        block[2] = 1  # one quant = 1
        q, s, _, _ = repack_native(block, GGMLType.Q8_0, 1, 32)
        if np.isnan(w):
            assert np.isnan(s[0, 0])
        else:
            assert s[0, 0] == w


def test_native_transpose(rng):
    a = rng.integers(-100, 100, size=(130, 260)).astype(np.int8)
    t = transpose_native(a)
    np.testing.assert_array_equal(t, a.T)
    f = rng.standard_normal((67, 130)).astype(np.float32)
    np.testing.assert_array_equal(transpose_native(f), f.T)
