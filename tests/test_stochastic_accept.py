"""Stochastic speculative-sampling acceptance (min(1, p/q) + residual
resample — the reference's speculative-eagle.cpp:294-320 scheme, batched and
branch-free in sampling.speculative_accept).

The two properties that make the scheme correct and worth having:
1. the emitted stream is distributed EXACTLY as sampling from the target's
   transformed distribution p (speculative sampling theorem);
2. acceptance at temperature is sum_x min(p(x), q(x)) per position — far
   above exact-match-vs-argmax-draft's p(argmax q) when the draft is good."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.runtime.sampling import (
    BatchedSamplerParams,
    SamplerConfig,
    speculative_accept,
    transformed_probs_batched,
)


def _rand_dist(rng, v, temp=1.0):
    l = rng.standard_normal(v) * temp
    p = np.exp(l - l.max())
    return (p / p.sum()).astype(np.float32)


def test_marginal_preserves_target():
    """Monte-Carlo: the FIRST emitted token's marginal must equal p0 exactly
    (up to sampling noise) regardless of how bad the draft q is."""
    rng = np.random.default_rng(0)
    v, k, n = 16, 2, 40000
    p0, p1, p2 = _rand_dist(rng, v, 2.0), _rand_dist(rng, v), _rand_dist(rng, v)
    q0, q1 = _rand_dist(rng, v, 2.0), _rand_dist(rng, v)

    key = jax.random.PRNGKey(1)
    dk0, dk1, ak = jax.random.split(key, 3)
    drafts = jnp.stack([
        jax.random.categorical(dk0, jnp.log(jnp.asarray(q0))[None].repeat(n, 0)),
        jax.random.categorical(dk1, jnp.log(jnp.asarray(q1))[None].repeat(n, 0)),
    ], axis=1).astype(jnp.int32)  # [N, K]
    q_probs = jnp.broadcast_to(jnp.stack([q0, q1]), (n, k, v))
    p_probs = jnp.broadcast_to(jnp.stack([p0, p1, p2]), (n, k + 1, v))
    tokens, n_acc = speculative_accept(
        drafts, q_probs, p_probs,
        spec_k=jnp.full((n,), k, jnp.int32),
        greedy=jnp.zeros((n,), bool), key=ak,
    )
    first = np.asarray(tokens[:, 0])
    emp = np.bincount(first, minlength=v) / n
    tv = 0.5 * np.abs(emp - p0).sum()
    assert tv < 0.02, tv
    # sanity: both accepts and rejections actually occurred
    na = np.asarray(n_acc)
    assert (na == 0).any() and (na >= 1).any()


def test_acceptance_rate_beats_exact_match():
    """With a good draft (q == p), stochastic acceptance accepts almost
    everything; exact-match sampling accepts with prob sum p^2 < 1."""
    rng = np.random.default_rng(3)
    v, k, n = 32, 4, 20000
    ps = [_rand_dist(rng, v) for _ in range(k + 1)]
    key = jax.random.PRNGKey(2)
    dks = jax.random.split(key, k + 1)
    drafts = jnp.stack([
        jax.random.categorical(dks[i], jnp.log(jnp.asarray(ps[i]))[None].repeat(n, 0))
        for i in range(k)
    ], axis=1).astype(jnp.int32)
    q_probs = jnp.broadcast_to(jnp.stack(ps[:k]), (n, k, v))
    p_probs = jnp.broadcast_to(jnp.stack(ps), (n, k + 1, v))
    _, n_acc = speculative_accept(
        drafts, q_probs, p_probs, jnp.full((n,), k, jnp.int32),
        jnp.zeros((n,), bool), dks[k],
    )
    mean_acc = float(np.asarray(n_acc).mean())
    assert mean_acc > 0.95 * k, mean_acc  # q == p -> accept ~ everything
    # exact-match on the same dists: accept prob per position = sum p^2
    exact_per_pos = [float((p * p).sum()) for p in ps[:k]]
    exact_mean = 0.0
    run = 1.0
    for a in exact_per_pos:
        run *= a
        exact_mean += run
    assert mean_acc > exact_mean + 1.0  # strictly, decisively better


def test_greedy_rows_reduce_to_exact_match():
    """One-hot p/q rows must accept exactly the matching prefix and emit the
    target argmax as correction — byte-identical to the greedy walk."""
    rng = np.random.default_rng(5)
    v, k, b = 8, 3, 64
    t_arg = rng.integers(0, v, (b, k + 1))
    d_arg = np.where(rng.random((b, k)) < 0.6, t_arg[:, :k], rng.integers(0, v, (b, k)))
    p_probs = jnp.asarray(np.eye(v, dtype=np.float32)[t_arg])  # [B, K+1, V]
    q_probs = jnp.asarray(np.eye(v, dtype=np.float32)[d_arg])
    tokens, n_acc = speculative_accept(
        jnp.asarray(d_arg, jnp.int32), q_probs, p_probs,
        jnp.full((b,), k, jnp.int32), jnp.ones((b,), bool),
        jax.random.PRNGKey(0),
    )
    tokens, n_acc = np.asarray(tokens), np.asarray(n_acc)
    for i in range(b):
        want = 0
        while want < k and d_arg[i, want] == t_arg[i, want]:
            want += 1
        assert n_acc[i] == want
        assert (tokens[i, :want] == d_arg[i, :want]).all()
        assert tokens[i, want] == t_arg[i, want]  # correction = target argmax


def test_spec_k_cap_truncates():
    v, k, b = 8, 4, 32
    p = jnp.broadcast_to(jnp.eye(v, dtype=jnp.float32)[1], (b, k + 1, v))
    q = jnp.broadcast_to(jnp.eye(v, dtype=jnp.float32)[1], (b, k, v))
    drafts = jnp.ones((b, k), jnp.int32)
    _, n_acc = speculative_accept(
        drafts, q, p, jnp.full((b,), 2, jnp.int32), jnp.ones((b,), bool),
        jax.random.PRNGKey(0),
    )
    assert (np.asarray(n_acc) == 2).all()


def test_transformed_probs_greedy_one_hot():
    bp = BatchedSamplerParams.create(2, SamplerConfig(greedy=True))
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16)), jnp.float32)
    p = np.asarray(transformed_probs_batched(logits, bp))
    assert (p.argmax(-1) == np.asarray(logits).argmax(-1)).all()
    assert np.allclose(p.max(-1), 1.0)
    assert np.allclose(p.sum(-1), 1.0)


# ---- engine level ---------------------------------------------------------

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def setup():
    from eagle_tpu.models.eagle import random_eagle_params
    from eagle_tpu.models.hf_convert import params_from_hf_llama

    torch.manual_seed(3)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(cfg).eval()
    tparams, tcfg = params_from_hf_llama(model)
    dcfg = dataclasses.replace(tcfg, n_layers=1, is_eagle=True)
    dparams = random_eagle_params(jax.random.PRNGKey(5), dcfg)
    return tparams, dparams, tcfg, dcfg


def test_sampled_chain_reproducible_and_valid(setup, rng):
    from eagle_tpu.runtime.speculative import EagleChainEngine

    tparams, dparams, tcfg, dcfg = setup
    prompt = rng.integers(0, 128, size=7).tolist()
    scfg = SamplerConfig(temperature=0.9, top_k=40)

    def run():
        eng = EagleChainEngine(
            tparams, dparams, tcfg, dcfg, n_draft=3, max_seq=128,
            compute_dtype=jnp.float32, kv_dtype=jnp.float32, eos_id=-1,
            sampler=scfg,
        )
        return eng.generate(prompt, max_new_tokens=12, seed=11, stop_at_eos=False)

    (a, sa), (b, sb) = run(), run()
    assert a == b and sa == sb
    assert all(0 <= t < 128 for t in a)


def test_greedy_unchanged_by_stochastic_path(setup, rng):
    """fast_greedy engines must still match plain greedy decoding exactly."""
    from eagle_tpu.runtime.generate import Generator
    from eagle_tpu.runtime.speculative import EagleChainEngine

    tparams, dparams, tcfg, dcfg = setup
    prompt = rng.integers(0, 128, size=8).tolist()
    gen = Generator(tparams, tcfg, max_seq=128, compute_dtype=jnp.float32,
                    kv_dtype=jnp.float32, eos_id=-1)
    want = list(gen.generate(prompt, max_new_tokens=10))[:10]
    eng = EagleChainEngine(
        tparams, dparams, tcfg, dcfg, n_draft=3, max_seq=128,
        compute_dtype=jnp.float32, kv_dtype=jnp.float32, eos_id=-1,
    )
    out, _ = eng.generate(prompt, max_new_tokens=10, stop_at_eos=False)
    assert out[:10] == want
