"""int8 KV cache (the reference's type_k/type_v, src/llama-kv-cache.h:49-50):
per-vector absmax scales threaded through the cache, the forward pass, context
shift, and the speculative engines. Quantization error must stay small enough
that greedy token streams match the bf16 cache on a real (HF-initialized)
tiny model, and the draft-on == draft-off invariant must hold with int8 KV."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.runtime.generate import Generator
from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags, quantize_kv_vec, dequantize_kv


@pytest.fixture(scope="module")
def tiny():
    from eagle_tpu.models.hf_convert import params_from_hf_llama

    torch.manual_seed(11)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, mcfg = params_from_hf_llama(model)
    return params, mcfg


def test_quantize_round_trip(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 5, 16)).astype(np.float32))
    codes, scale = quantize_kv_vec(x)
    y = dequantize_kv(codes, scale, jnp.float32)
    err = np.abs(np.asarray(y) - np.asarray(x)).max()
    amax = np.abs(np.asarray(x)).max()
    assert err <= amax / 127.0 + 1e-6


def test_create_int8_cache():
    kv = KVCache.create(2, 1, 16, 4, 8, dtype=jnp.int8)
    assert kv.quantized and kv.k.dtype == jnp.int8
    assert kv.k_scale.shape == (2, 1, 4, 16)


def test_greedy_stream_matches_bf16(tiny, rng):
    params, mcfg = tiny
    prompt = rng.integers(0, 128, size=10).tolist()
    gen16 = Generator(params, mcfg, max_seq=128, compute_dtype=jnp.float32,
                      kv_dtype=jnp.float32, eos_id=-1)
    ref = gen16.generate(prompt, max_new_tokens=16, stop_at_eos=False)
    gen8 = Generator(params, mcfg, max_seq=128, compute_dtype=jnp.float32,
                     kv_dtype=jnp.int8, eos_id=-1)
    got = gen8.generate(prompt, max_new_tokens=16, stop_at_eos=False)
    assert got == ref


def test_speculative_equivalence_with_int8_kv(tiny, rng):
    """draft-on == draft-off with kv_dtype=int8 (the reference's
    test_speculative.py:24-40 invariant, crossed with KV quantization)."""
    from eagle_tpu.models.eagle import random_eagle_params
    from eagle_tpu.runtime.speculative import EagleChainEngine
    import jax

    params, mcfg = tiny
    dcfg = dataclasses.replace(mcfg, n_layers=1, is_eagle=True)
    dparams = random_eagle_params(jax.random.PRNGKey(5), dcfg)
    prompt = rng.integers(0, 128, size=8).tolist()

    gen = Generator(params, mcfg, max_seq=128, compute_dtype=jnp.float32,
                    kv_dtype=jnp.int8, eos_id=-1)
    plain = gen.generate(prompt, max_new_tokens=12, stop_at_eos=False)

    eng = EagleChainEngine(params, dparams, mcfg, dcfg, n_draft=3, max_seq=128,
                           kv_dtype=jnp.int8, compute_dtype=jnp.float32, eos_id=-1)
    spec, _ = eng.generate(prompt, max_new_tokens=12, stop_at_eos=False)
    assert spec[:12] == plain[:12]


def test_context_shift_int8(tiny, rng):
    """Shifted int8 cache ≈ cache built from shifted positions directly
    (same tolerance shape as the bf16 context-shift equivalence test)."""
    from eagle_tpu.models.llama import llama_forward
    from eagle_tpu.ops.rope import rope_freqs
    from eagle_tpu.runtime.kvcache import context_shift

    params, mcfg = tiny
    tokens = jnp.asarray(rng.integers(0, 128, size=(1, 16)), jnp.int32)
    pos = jnp.arange(16, dtype=jnp.int32)[None, :]
    kv = KVCache.create(mcfg.n_layers, 1, 32, mcfg.n_kv_heads, mcfg.head_dim,
                        dtype=jnp.int8)
    kv = kv.with_tags(pos, pos)
    mask = causal_mask_from_tags(kv.slot_pos, pos)
    out = llama_forward(params, mcfg, tokens, pos, kv, pos, mask,
                        compute_dtype=jnp.float32)
    inv_freq = rope_freqs(mcfg.rope_dim, mcfg.rope_base)
    shifted = context_shift(out.kv, inv_freq, n_keep=4, n_discard=4)

    # reference: decode the same tokens with positions already shifted
    toks2 = jnp.concatenate([tokens[:, :4], tokens[:, 8:]], axis=1)
    pos2 = jnp.arange(12, dtype=jnp.int32)[None, :]
    kv2 = KVCache.create(mcfg.n_layers, 1, 32, mcfg.n_kv_heads, mcfg.head_dim,
                         dtype=jnp.int8)
    kv2 = kv2.with_tags(pos2, pos2)
    mask2 = causal_mask_from_tags(kv2.slot_pos, pos2)
    out2 = llama_forward(params, mcfg, toks2, pos2, kv2, pos2, mask2,
                         compute_dtype=jnp.float32)

    a = dequantize_kv(shifted.k, shifted.k_scale, jnp.float32)[:, :, :, :12]
    b = dequantize_kv(out2.kv.k, out2.kv.k_scale, jnp.float32)[:, :, :, :12]
    # K entries for kept prefix identical; shifted tail equals re-roped keys
    # up to int8 requantization noise
    np.testing.assert_allclose(np.asarray(a[:, :, :, :4]), np.asarray(b[:, :, :, :4]),
                               atol=2e-2)
    assert shifted.slot_pos[0, 11] == 11 and shifted.slot_pos[0, 12] == -1
