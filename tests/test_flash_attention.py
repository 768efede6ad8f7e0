"""Flash decode-attention kernel (interpret mode) vs the einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.ops.attention import gqa_attention
from eagle_tpu.ops.pallas_attention import flash_attention_cached, supports_flash


@pytest.mark.parametrize("t,h,hkv", [(1, 4, 4), (1, 8, 2), (6, 4, 2), (8, 8, 8)])
def test_flash_matches_einsum(rng, t, h, hkv):
    b, s, d, L = 2, 256, 128, 3
    li = 1
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k_cache = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)).astype(np.float32))
    v_cache = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)).astype(np.float32))
    # random visibility with at least one visible slot per row
    mask = rng.random((b, t, s)) < 0.5
    mask[:, :, 0] = True
    mask = jnp.asarray(mask)

    want = np.asarray(gqa_attention(q, k_cache[li], v_cache[li], mask))
    got = np.asarray(
        flash_attention_cached(q, k_cache, v_cache, mask, jnp.int32(li), interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_s_limit_reads_prefix_only(rng):
    """s_limit bounds the grid: result equals einsum attention over the cache
    prefix, independent of whatever garbage sits past the limit."""
    b, t, h, hkv, s, d, L, li, lim = 2, 1, 8, 2, 512, 128, 3, 1, 256
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k_cache = rng.standard_normal((L, b, hkv, s, d)).astype(np.float32)
    v_cache = rng.standard_normal((L, b, hkv, s, d)).astype(np.float32)
    k_cache[:, :, :, lim:] = np.nan  # poison past-limit slots: must not be read
    v_cache[:, :, :, lim:] = np.nan
    mask = rng.random((b, t, lim)) < 0.5
    mask[:, :, 0] = True
    mask = jnp.asarray(mask)
    want = np.asarray(
        gqa_attention(q, jnp.asarray(k_cache[li, :, :, :lim]),
                      jnp.asarray(v_cache[li, :, :, :lim]), mask)
    )
    got = np.asarray(
        flash_attention_cached(q, jnp.asarray(k_cache), jnp.asarray(v_cache),
                               mask, jnp.int32(li), interpret=True, s_limit=lim)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_supports_flash_gates():
    assert not supports_flash(1, 4, 4, 100, 128)  # S not 128-multiple
    assert not supports_flash(1, 4, 4, 256, 64)  # D not 128-multiple
    assert not supports_flash(8, 32, 32, 256, 128)  # XLA wins at very short S
    assert supports_flash(8, 32, 32, 1024, 128)  # head-blocked grid wins here
    assert supports_flash(8, 32, 32, 4096, 128)
