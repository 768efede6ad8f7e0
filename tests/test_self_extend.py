"""Self-Extend group attention (main.cpp:452,590-608; examples/passkey):
position compression via the seq_add/seq_div/seq_add triple + K re-rope,
keeping rope positions inside the training window while the cache keeps one
slot per token."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.ops.rope import apply_rope, rope_freqs
from eagle_tpu.runtime.kvcache import KVCache, self_extend_shift


def llama_cpp_sim(positions, n_past, ga_i, ga_n, ga_w):
    """Pure-python replay of the reference's three seq ops on a position
    list (llama_kv_cache_seq_add/div semantics, applied sequentially)."""
    ib = (ga_n * ga_i) // ga_w
    bd = (ga_w // ga_n) * (ga_n - 1)
    dd = (ga_w // ga_n) - ib * bd - ga_w
    pos = list(positions)
    for i, p in enumerate(pos):
        if p >= ga_i and p < n_past:
            pos[i] = p + ib * bd
    lo = ga_i + ib * bd
    for i, p in enumerate(pos):
        if pos[i] >= 0 and lo <= pos[i] < lo + ga_w:
            pos[i] = pos[i] // ga_n
    for i, p in enumerate(pos):
        if pos[i] >= 0 and lo + ga_w <= pos[i] < n_past + ib * bd:
            pos[i] = pos[i] + dd
    return pos, n_past - bd, ga_i + ga_w // ga_n


@pytest.mark.parametrize("ga_n,ga_w", [(2, 4), (4, 8), (2, 8)])
def test_positions_match_reference_arithmetic(ga_n, ga_w):
    S = 32
    inv_freq = rope_freqs(8, 10000.0)
    n_past, ga_i = 16, 0
    kv = KVCache.create(1, 1, S, 2, 8, jnp.float32)
    tags = jnp.where(jnp.arange(S) < n_past, jnp.arange(S), -1)[None, :]
    kv = dataclasses.replace(kv, slot_pos=tags.astype(jnp.int32))
    # iterate the shift loop exactly as main.cpp does
    want = np.asarray(tags[0]).tolist()
    while n_past >= ga_i + ga_w:
        kv2, n_past2, ga_i2 = self_extend_shift(kv, inv_freq, n_past, ga_i, ga_n, ga_w)
        want, n_want, ga_want = llama_cpp_sim(want, n_past, ga_i, ga_n, ga_w)
        assert np.asarray(kv2.slot_pos[0]).tolist() == want
        assert (n_past2, ga_i2) == (n_want, ga_want)
        kv, n_past, ga_i = kv2, n_past2, ga_i2


def test_k_rerope_matches_fresh_rope():
    """After compression, cached K must equal K roped at the NEW positions."""
    S, H, D = 16, 2, 8
    rng = np.random.default_rng(0)
    inv_freq = rope_freqs(D, 10000.0)
    raw_k = jnp.asarray(rng.standard_normal((1, 8, H, D)).astype(np.float32))
    pos0 = jnp.arange(8, dtype=jnp.int32)[None, :]
    k_roped = apply_rope(raw_k, pos0, inv_freq)  # [B, T, H, D]

    kv = KVCache.create(1, 1, S, H, D, jnp.float32)
    kv = dataclasses.replace(
        kv,
        k=kv.k.at[0, 0, :, :8].set(k_roped.transpose(0, 2, 1, 3)[0]),
        slot_pos=kv.slot_pos.at[0, :8].set(jnp.arange(8, dtype=jnp.int32)),
    )
    kv2, n_past2, _ = self_extend_shift(kv, inv_freq, 8, 0, ga_n=2, ga_w=4)
    new_pos = kv2.slot_pos[0, :8]
    want = apply_rope(raw_k, new_pos[None, :], inv_freq).transpose(0, 2, 1, 3)[0]
    np.testing.assert_allclose(
        np.asarray(kv2.k[0, 0, :, :8]), np.asarray(want), atol=1e-5
    )


def test_generation_with_self_extend():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from eagle_tpu.models.hf_convert import params_from_hf_llama
    from eagle_tpu.runtime.generate import Generator

    torch.manual_seed(3)
    model = transformers.LlamaForCausalLM(
        transformers.LlamaConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            max_position_embeddings=32, attn_implementation="eager",
        )
    ).eval()
    params, cfg = params_from_hf_llama(model)
    prompt = list(range(10))

    base = Generator(params, cfg, max_seq=128, compute_dtype=jnp.float32, eos_id=-1)
    plain = base.generate(prompt, max_new_tokens=40, stop_at_eos=False)

    gen = Generator(params, cfg, max_seq=128, compute_dtype=jnp.float32, eos_id=-1)
    ext = gen.generate(prompt, max_new_tokens=40, stop_at_eos=False,
                       grp_attn_n=2, grp_attn_w=16)
    # identical until the first compression can alter attention
    assert ext[:6] == plain[:6]
    assert len(ext) == 40
    # rope positions stayed compressed: every tag < uncompressed count
    tags = np.asarray(gen.kv.slot_pos[0])
    n_tokens = 10 + 40
    assert tags.max() < n_tokens - 1
