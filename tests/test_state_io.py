"""State save/load: resuming a speculation session must continue identically
(the reference's save-load-state example + slot save tests)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.models.eagle import random_eagle_params
from eagle_tpu.runtime.speculative import EagleChainEngine
from eagle_tpu.runtime.state_io import load_state, save_state


@pytest.fixture(scope="module")
def setup():
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


def make_engine(setup):
    tparams, dparams, tcfg, dcfg = setup
    return EagleChainEngine(
        tparams, dparams, tcfg, dcfg, n_draft=3, max_seq=128,
        compute_dtype=jnp.float32, kv_dtype=jnp.float32, eos_id=-1,
    )


def test_save_load_resumes_identically(setup, rng, tmp_path):
    prompt = rng.integers(0, 128, size=8).tolist()

    # run 1: full generation
    eng = make_engine(setup)
    full, _ = eng.generate(prompt, max_new_tokens=16, stop_at_eos=False)

    # run 2: prefill + a few cycles, save, reload into a fresh engine, continue
    eng_a = make_engine(setup)
    state = eng_a.fresh_state()
    state = dataclasses.replace(state, key=jax.random.PRNGKey(0))
    padded = np.zeros((1, 16), np.int32)
    padded[0, : len(prompt)] = prompt
    state = eng_a._prefill_jit(state, jnp.asarray(padded), jnp.asarray([len(prompt)], np.int32), t=16)
    out = [int(np.asarray(state.last_token)[0])]
    for _ in range(2):
        res = eng_a._cycle_jit(state)
        state = res.state
        k = int(np.asarray(res.n_out)[0])
        out += np.asarray(res.tokens)[0][:k].tolist()

    path = tmp_path / "session.state"
    save_state(state, path, extra={"n_out": len(out)})

    eng_b = make_engine(setup)
    restored, extra = load_state(eng_b.fresh_state(), path)
    assert extra["n_out"] == len(out)
    out_b = list(out)
    while len(out_b) < 17:
        res = eng_b._cycle_jit(restored)
        restored = res.state
        k = int(np.asarray(res.n_out)[0])
        out_b += np.asarray(res.tokens)[0][:k].tolist()

    assert out_b[:16] == full[:16]


def test_load_rejects_bad_file(tmp_path, setup):
    p = tmp_path / "junk.state"
    p.write_bytes(b"not a state file")
    eng = make_engine(setup)
    with pytest.raises(Exception):
        load_state(eng.fresh_state(), p)
