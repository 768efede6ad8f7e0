"""EAGLE tree speculation tests: the same draft-on == draft-off invariant as
the chain engine, plus tree-specific structure checks."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.models.eagle import random_eagle_params
from eagle_tpu.runtime.generate import Generator
from eagle_tpu.runtime.tree import EagleTreeEngine, TreeSpec


@pytest.fixture(scope="module")
def target():
    from eagle_tpu.models.hf_convert import params_from_hf_llama

    torch.manual_seed(3)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, mcfg = params_from_hf_llama(model)
    return params, mcfg


@pytest.fixture(scope="module")
def draft(target):
    _, tcfg = target
    dcfg = dataclasses.replace(tcfg, n_layers=1, is_eagle=True)
    return random_eagle_params(jax.random.PRNGKey(5), dcfg), dcfg


def test_tree_spec_topology():
    t = TreeSpec((3, 2))
    assert t.n_nodes == 1 + 3 + 6
    assert t.levels == [[0], [1, 2, 3], [4, 5, 6, 7, 8, 9]]
    assert t.parent[4] == 1 and t.parent[9] == 3
    assert t.ancestor[9, 3] and t.ancestor[9, 0] and not t.ancestor[9, 1]
    assert (t.depth == [0, 1, 1, 1, 2, 2, 2, 2, 2, 2]).all()


@pytest.mark.parametrize("branching", [(2,), (3, 2), (2, 2, 1)])
def test_tree_equals_plain_greedy(target, draft, rng, branching):
    tparams, tcfg = target
    dparams, dcfg = draft
    prompt = rng.integers(0, 128, size=9).tolist()

    plain = Generator(tparams, tcfg, max_seq=256, compute_dtype=jnp.float32, eos_id=-1)
    want = plain.generate(prompt, max_new_tokens=14, stop_at_eos=False)

    eng = EagleTreeEngine(
        tparams, dparams, tcfg, dcfg, tree=TreeSpec(branching), max_seq=256,
        compute_dtype=jnp.float32, kv_dtype=jnp.float32, eos_id=-1,
    )
    got, stats = eng.generate(prompt, max_new_tokens=14, stop_at_eos=False)
    assert got == want, (got, want, stats)


def test_tree_with_target_as_oracle_accepts(target, rng):
    """Make the draft (almost) perfect by checking a wide tree accepts > 0
    drafts overall on at least some cycles with a random head — statistically
    the top-4 single-level tree should occasionally hit with tiny vocab."""
    tparams, tcfg = target
    dcfg = dataclasses.replace(tcfg, n_layers=1, is_eagle=True)
    dparams = random_eagle_params(jax.random.PRNGKey(1), dcfg)
    eng = EagleTreeEngine(
        tparams, dparams, tcfg, dcfg, tree=TreeSpec((8,)), max_seq=256,
        compute_dtype=jnp.float32, kv_dtype=jnp.float32, eos_id=-1,
    )
    prompt = rng.integers(0, 128, size=6).tolist()
    out, stats = eng.generate(prompt, max_new_tokens=20, stop_at_eos=False)
    assert len(out) >= 20 or stats["n_cycles"] > 0
    assert stats["n_accepted"] >= 0


def test_tree_sampled_acceptance_reproducible(target, draft, rng):
    """Stochastic tree acceptance: reproducible with a seed, and emits valid
    token streams."""
    from eagle_tpu.runtime.sampling import SamplerConfig

    tparams, tcfg = target
    dparams, dcfg = draft
    prompt = rng.integers(0, 128, size=7).tolist()
    scfg = SamplerConfig(temperature=1.0, top_k=20)

    def run():
        eng = EagleTreeEngine(
            tparams, dparams, tcfg, dcfg, tree=TreeSpec((2, 2)), max_seq=256,
            compute_dtype=jnp.float32, kv_dtype=jnp.float32, eos_id=-1, sampler=scfg,
        )
        out, _ = eng.generate(prompt, max_new_tokens=10, seed=7, stop_at_eos=False)
        return out

    a, b = run(), run()
    assert a == b
    assert all(0 <= t < 128 for t in a)
