"""Sampler chain tests (deterministic-distribution style of
tests/test-sampling.cpp in the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.runtime.sampling import (
    SamplerConfig,
    apply_penalties,
    min_p_mask,
    sample,
    top_k_mask,
    top_p_mask,
    transform_logits,
    typical_mask,
)


def logits_from_probs(probs):
    return jnp.log(jnp.asarray(probs, jnp.float32))


def test_greedy_picks_argmax():
    l = logits_from_probs([0.1, 0.2, 0.4, 0.3])
    tok = sample(l, jax.random.PRNGKey(0), SamplerConfig(greedy=True))
    assert int(tok) == 2


def test_top_k():
    l = jnp.asarray([1.0, 3.0, 2.0, 0.0])
    masked = np.asarray(top_k_mask(l, 2))
    assert masked[1] == 3.0 and masked[2] == 2.0
    assert masked[0] < -1e29 and masked[3] < -1e29


def test_top_p():
    # probs 0.4, 0.3, 0.2, 0.1 ; p=0.6 keeps {0.4, 0.3}
    l = logits_from_probs([0.4, 0.3, 0.2, 0.1])
    masked = np.asarray(top_p_mask(l, 0.6))
    assert np.isfinite(masked[0]) and masked[0] > -1e29
    assert masked[1] > -1e29
    assert masked[2] < -1e29 and masked[3] < -1e29


def test_top_p_always_keeps_best():
    l = logits_from_probs([0.99, 0.005, 0.005])
    masked = np.asarray(top_p_mask(l, 0.001))
    assert masked[0] > -1e29
    assert masked[1] < -1e29


def test_min_p():
    l = logits_from_probs([0.5, 0.3, 0.1, 0.1])
    masked = np.asarray(min_p_mask(l, 0.25))  # cutoff 0.125
    assert (masked[:2] > -1e29).all() and (masked[2:] < -1e29).all()


def test_typical_keeps_mass():
    l = logits_from_probs([0.25, 0.25, 0.25, 0.25])
    masked = np.asarray(typical_mask(l, 0.5))
    # uniform distribution: everything equally typical; at least ceil-fraction kept
    assert (masked > -1e29).sum() >= 2


def test_penalties_repeat():
    l = jnp.asarray([2.0, -2.0, 1.0])
    counts = jnp.asarray([1.0, 1.0, 0.0])
    cfg = SamplerConfig(penalty_repeat=2.0)
    out = np.asarray(apply_penalties(l, counts, cfg))
    assert out[0] == pytest.approx(1.0)  # positive divided
    assert out[1] == pytest.approx(-4.0)  # negative multiplied
    assert out[2] == pytest.approx(1.0)  # unseen untouched


def test_categorical_distribution_follows_probs():
    l = logits_from_probs([0.7, 0.2, 0.1])
    cfg = SamplerConfig(temperature=1.0, top_k=0, top_p=1.0, min_p=0.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    toks = jax.vmap(lambda k: sample(l, k, cfg))(keys)
    freq = np.bincount(np.asarray(toks), minlength=3) / 2000
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.05)


def test_transform_batched():
    l = jnp.tile(logits_from_probs([0.4, 0.3, 0.2, 0.1]), (3, 1))
    out = transform_logits(l, SamplerConfig(top_k=2, temperature=0.5))
    assert out.shape == (3, 4)
    assert (np.asarray(out)[:, 2:] < -1e28).all()


def test_logit_bias():
    from eagle_tpu.runtime.sampling import apply_logit_bias

    l = jnp.zeros(8)
    out = np.asarray(apply_logit_bias(l, ((2, 5.0), (4, -1e9))))
    assert out[2] == 5.0 and out[4] < -1e8 and out[0] == 0


def test_top_n_sigma():
    from eagle_tpu.runtime.sampling import top_n_sigma_mask

    l = jnp.asarray([10.0, 9.5, 0.0, -1.0])
    out = np.asarray(top_n_sigma_mask(l, 1.0))
    assert out[0] > -1e29 and out[1] > -1e29
    assert out[2] < -1e29 and out[3] < -1e29


def test_xtc_removes_top_choices():
    from eagle_tpu.runtime.sampling import xtc_mask

    l = logits_from_probs([0.5, 0.3, 0.15, 0.05])
    out = np.asarray(xtc_mask(l, jax.random.PRNGKey(0), prob=1.0, threshold=0.2))
    # 0.5 and 0.3 are above threshold; only the least likely of them (0.3) kept
    assert out[0] < -1e29
    assert out[1] > -1e29 and out[2] > -1e29 and out[3] > -1e29


def test_xtc_disabled_when_single_candidate():
    from eagle_tpu.runtime.sampling import xtc_mask

    l = logits_from_probs([0.9, 0.05, 0.05])
    out = np.asarray(xtc_mask(l, jax.random.PRNGKey(0), prob=1.0, threshold=0.2))
    assert out[0] > -1e29  # only one above threshold -> untouched


def test_sample_stateful_penalties_suppress_repeats():
    from eagle_tpu.runtime.sampling import SamplerConfig, SamplerState, sample_stateful

    cfg = SamplerConfig(greedy=True, penalty_repeat=2.0)
    state = SamplerState.create(1, 4)
    l = jnp.asarray([[2.0, 1.9, 0.0, -1.0]])
    t1, state = sample_stateful(l, jax.random.PRNGKey(0), cfg, state)
    assert int(t1[0]) == 0
    # token 0 now penalized (2.0 -> 1.0) so 1.9 wins
    t2, state = sample_stateful(l, jax.random.PRNGKey(0), cfg, state)
    assert int(t2[0]) == 1


def test_mirostat_v2_adapts_mu():
    from eagle_tpu.runtime.sampling import SamplerConfig, SamplerState, sample_stateful

    cfg = SamplerConfig(temperature=1.0, mirostat=2, mirostat_tau=3.0, mirostat_eta=0.5)
    state = SamplerState.create(1, 16, tau=3.0)
    l = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16)).astype(np.float32))
    mus = [float(state.mu[0])]
    for i in range(5):
        tok, state = sample_stateful(l, jax.random.PRNGKey(i), cfg, state)
        mus.append(float(state.mu[0]))
        assert 0 <= int(tok[0]) < 16
    assert mus[0] != mus[-1]  # mu adapted


def test_generator_with_penalties_runs():
    import pytest
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from eagle_tpu.models.hf_convert import params_from_hf_llama
    from eagle_tpu.runtime.generate import Generator

    torch.manual_seed(2)
    hf = transformers.LlamaForCausalLM(
        transformers.LlamaConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
            attn_implementation="eager",
        )
    ).eval()
    params, cfg = params_from_hf_llama(hf)
    gen = Generator(params, cfg, max_seq=64, compute_dtype=jnp.float32, eos_id=-1)
    scfg = SamplerConfig(greedy=True, penalty_repeat=1.5)
    out = gen.generate([1, 2, 3], max_new_tokens=8, sampler=scfg, stop_at_eos=False)
    assert len(out) == 8


def test_dry_penalizes_repetition_extension():
    """Window '...A B C x A B' -> candidate C extends the 2-long repeated
    sequence 'A B' and must be penalized; unrelated tokens untouched."""
    from eagle_tpu.runtime.sampling import dry_penalty

    A, B, C, X = 3, 4, 5, 9
    recent = jnp.asarray([-1, -1, A, B, C, X, A, B], jnp.int32)
    logits = jnp.zeros((16,), jnp.float32)
    cfg = SamplerConfig(dry_multiplier=2.0, dry_base=1.75, dry_allowed_length=2)
    out = np.asarray(dry_penalty(logits, recent, cfg))
    assert out[C] < 0  # extends "A B" match of length 2 -> penalty 2*1.75^0
    np.testing.assert_allclose(out[C], -2.0, rtol=1e-5)
    assert out[X] == 0 and out[7] == 0


def test_dry_longer_matches_penalized_harder():
    from eagle_tpu.runtime.sampling import dry_penalty

    A, B, C, D = 1, 2, 3, 4
    recent = jnp.asarray([A, B, C, D, 9, A, B, C], jnp.int32)
    logits = jnp.zeros((16,), jnp.float32)
    cfg = SamplerConfig(dry_multiplier=1.0, dry_base=2.0, dry_allowed_length=2)
    out = np.asarray(dry_penalty(logits, recent, cfg))
    # D extends "A B C" (len 3): penalty = 1.0 * 2^(3-2) = 2
    np.testing.assert_allclose(out[D], -2.0, rtol=1e-5)


def test_dry_sequence_breakers_reset_matching():
    from eagle_tpu.runtime.sampling import dry_penalty

    A, B, C, BRK = 1, 2, 3, 7
    recent = jnp.asarray([A, B, C, 9, A, BRK, A, B], jnp.int32)
    logits = jnp.zeros((16,), jnp.float32)
    cfg = SamplerConfig(dry_multiplier=1.0, dry_base=2.0, dry_allowed_length=2,
                        dry_sequence_breakers=(BRK,))
    out = np.asarray(dry_penalty(logits, recent, cfg))
    # "A B" matches at position 0-1 -> C penalized (len 2, allowed 2 -> -1.0)
    np.testing.assert_allclose(out[C], -1.0, rtol=1e-5)
    # but nothing may match THROUGH the breaker: drop the early occurrence and
    # the breaker-adjacent context must yield no penalty
    recent2 = jnp.asarray([-1, -1, -1, 9, A, BRK, A, B], jnp.int32)
    out2 = np.asarray(dry_penalty(logits, recent2, cfg))
    assert (out2 == 0).all()


def test_dry_in_stateful_chain_reduces_loops():
    from eagle_tpu.runtime.sampling import SamplerState, sample_stateful

    cfg = SamplerConfig(greedy=True, dry_multiplier=10.0, dry_base=2.0,
                        dry_allowed_length=1)
    state = SamplerState.create(1, 8, window=16)
    # logits that always prefer token 2 -> greedy would loop "2 2 2 ..."
    logits = jnp.zeros((1, 8), jnp.float32).at[0, 2].set(5.0).at[0, 3].set(4.0)
    toks = []
    key = jax.random.PRNGKey(0)
    for i in range(6):
        key, sub = jax.random.split(key)
        tok, state = sample_stateful(logits, sub, cfg, state)
        toks.append(int(tok[0]))
    assert 3 in toks  # DRY broke the 2-loop


def test_mirostat_v1_adapts_and_samples():
    from eagle_tpu.runtime.sampling import SamplerState, sample_stateful

    rngk = jax.random.PRNGKey(0)
    cfg = SamplerConfig(mirostat=1, mirostat_tau=4.0, temperature=1.0)
    state = SamplerState.create(2, 128)
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((2, 128)) * 3,
                         jnp.float32)
    mus = []
    for i in range(8):
        rngk, sub = jax.random.split(rngk)
        tok, state = sample_stateful(logits, sub, cfg, state)
        mus.append(float(state.mu[0]))
        assert 0 <= int(tok[0]) < 128
    assert mus[0] != mus[-1]
