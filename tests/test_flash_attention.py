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


def test_flash_prefill_matches_einsum(rng):
    """Prefill flash kernel (Q-row + S-column tiling, tag mask computed in
    VMEM) vs the einsum reference with causal_mask_from_tags."""
    from eagle_tpu.ops.pallas_attention import flash_attention_prefill
    from eagle_tpu.runtime.kvcache import causal_mask_from_tags

    b, t, h, hkv, s, d, L, li = 1, 64, 8, 8, 256, 128, 2, 1
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k_cache = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)).astype(np.float32))
    v_cache = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)).astype(np.float32))
    # tags: a 40-token prior context + this 64-token chunk; rest empty
    slot_pos = np.full((b, s), -1, np.int32)
    slot_pos[:, :40] = np.arange(40)
    q_pos = np.tile(np.arange(40, 40 + t, dtype=np.int32), (b, 1))
    slot_pos[:, 40:40 + t] = q_pos
    slot_pos = jnp.asarray(slot_pos)
    q_pos = jnp.asarray(q_pos)

    mask = causal_mask_from_tags(slot_pos, q_pos)
    want = np.asarray(gqa_attention(q, k_cache[li], v_cache[li], mask))
    got = np.asarray(
        flash_attention_prefill(q, k_cache, v_cache, q_pos, slot_pos,
                                jnp.int32(li), interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_prefill_generator_equivalence(rng):
    """End-to-end: a Generator prefill with the flash-prefill flag produces
    the same logits as the XLA path (CPU interpret can't run pallas, so this
    checks the flag plumbs through without changing the XLA result)."""
    from eagle_tpu.models.config import ModelConfig
    from eagle_tpu.models.llama import llama_forward
    from eagle_tpu.models.synth import synth_llama_params
    from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags

    cfg = ModelConfig(vocab_size=128, n_embd=64, n_layers=2, n_heads=8,
                      n_kv_heads=8, head_dim=8, n_ff=128, rope_dim=8,
                      n_ctx_train=128)
    params = synth_llama_params(cfg, seed=0)
    tokens = jnp.asarray(rng.integers(0, 128, size=(1, 16)).astype(np.int32))
    pos = jnp.tile(jnp.arange(16, dtype=jnp.int32), (1, 1))
    kv = KVCache.create(2, 1, 64, 8, 8, jnp.float32)
    kv = kv.with_tags(pos, pos)
    mask = causal_mask_from_tags(kv.slot_pos, pos)
    a = llama_forward(params, cfg, tokens, pos, kv, pos, mask,
                      compute_dtype=jnp.float32).logits
    b2 = llama_forward(params, cfg, tokens, pos, kv, pos, mask,
                       compute_dtype=jnp.float32,
                       causal_tags_prefill=True).logits
    np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=1e-5)
