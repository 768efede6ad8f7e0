"""CLI prompt-cache sessions (main.cpp:235-253 --prompt-cache): a second run
with the same prompt must reuse the cached KV (measurably fewer prefill
calls), produce identical output, and extend correctly when the prompt grows
past the cached prefix."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.runtime.generate import Generator


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
    return params_from_hf_llama(model)


def make_gen(setup, **kw):
    params, cfg = setup
    kw.setdefault("kv_dtype", jnp.float32)
    return Generator(params, cfg, max_seq=128, compute_dtype=jnp.float32,
                     eos_id=-1, **kw)


def _count_calls(gen):
    counts = {"prefill": 0, "extend": 0}
    pj, ej = gen._prefill_jit, gen._extend_jit

    def cp(*a, **k):
        counts["prefill"] += 1
        return pj(*a, **k)

    def ce(*a, **k):
        counts["extend"] += 1
        return ej(*a, **k)

    gen._prefill_jit, gen._extend_jit = cp, ce
    return counts


def test_session_skips_prefill_identical_output(setup, tmp_path, rng):
    sess = str(tmp_path / "sess.bin")
    prompt = rng.integers(0, 128, size=24).tolist()

    g1 = make_gen(setup)
    c1 = _count_calls(g1)
    out1 = g1.generate(prompt, max_new_tokens=8, stop_at_eos=False,
                       session_path=sess)
    assert c1 == {"prefill": 1, "extend": 0}
    assert g1.session_prefix_reused == 0

    g2 = make_gen(setup)
    c2 = _count_calls(g2)
    out2 = g2.generate(prompt, max_new_tokens=8, stop_at_eos=False,
                       session_path=sess)
    # only the final prompt token is re-evaluated, through ONE extend call
    assert c2 == {"prefill": 0, "extend": 1}
    assert g2.session_prefix_reused == len(prompt) - 1
    assert out2 == out1


def test_session_extends_grown_prompt(setup, tmp_path, rng):
    sess = str(tmp_path / "sess.bin")
    base = rng.integers(0, 128, size=20).tolist()
    grown = base + rng.integers(0, 128, size=6).tolist()
    want = make_gen(setup).generate(grown, max_new_tokens=6, stop_at_eos=False)

    make_gen(setup).generate(base, max_new_tokens=4, stop_at_eos=False,
                             session_path=sess)
    g = make_gen(setup)
    out = g.generate(grown, max_new_tokens=6, stop_at_eos=False,
                     session_path=sess)
    assert g.session_prefix_reused == len(base)
    assert out == want


def test_session_cache_all_reuses_continuation(setup, tmp_path, rng):
    """--prompt-cache-all: the generated continuation is cached too, so a
    follow-up prompt = prompt + output reuses beyond the original prompt."""
    sess = str(tmp_path / "sess.bin")
    prompt = rng.integers(0, 128, size=16).tolist()
    g1 = make_gen(setup)
    out1 = g1.generate(prompt, max_new_tokens=8, stop_at_eos=False,
                       session_path=sess, session_cache_all=True)
    followup = prompt + out1
    want = make_gen(setup).generate(followup, max_new_tokens=4, stop_at_eos=False)
    g2 = make_gen(setup)
    got = g2.generate(followup, max_new_tokens=4, stop_at_eos=False,
                      session_path=sess)
    # everything but the unfed last token was cached
    assert g2.session_prefix_reused == len(followup) - 1
    assert got == want


def test_session_divergent_prompt_partial_reuse(setup, tmp_path, rng):
    sess = str(tmp_path / "sess.bin")
    a = rng.integers(0, 128, size=24).tolist()
    b = a[:10] + rng.integers(0, 128, size=14).tolist()
    want = make_gen(setup).generate(b, max_new_tokens=6, stop_at_eos=False)
    make_gen(setup).generate(a, max_new_tokens=4, stop_at_eos=False, session_path=sess)
    g = make_gen(setup)
    out = g.generate(b, max_new_tokens=6, stop_at_eos=False, session_path=sess)
    assert g.session_prefix_reused == 10
    assert out == want


def test_session_bad_file_ignored(setup, tmp_path, rng):
    sess = tmp_path / "sess.bin"
    sess.write_bytes(b"not a session")
    prompt = rng.integers(0, 128, size=12).tolist()
    want = make_gen(setup).generate(prompt, max_new_tokens=4, stop_at_eos=False)
    g = make_gen(setup)
    out = g.generate(prompt, max_new_tokens=4, stop_at_eos=False,
                     session_path=str(sess))
    assert g.session_prefix_reused == 0
    assert out == want
    # and the run rewrote a valid session
    g2 = make_gen(setup)
    out2 = g2.generate(prompt, max_new_tokens=4, stop_at_eos=False,
                       session_path=str(sess))
    assert g2.session_prefix_reused == len(prompt) - 1
    assert out2 == want


def test_session_int8_kv_roundtrip(setup, tmp_path, rng):
    sess = str(tmp_path / "sess.bin")
    prompt = rng.integers(0, 128, size=20).tolist()
    g1 = make_gen(setup, kv_dtype=jnp.int8)
    # int8 caches: use the default kv path but int8 quantized
    out1 = g1.generate(prompt, max_new_tokens=6, stop_at_eos=False,
                       session_path=sess)
    g2 = make_gen(setup, kv_dtype=jnp.int8)
    out2 = g2.generate(prompt, max_new_tokens=6, stop_at_eos=False,
                       session_path=sess)
    assert g2.session_prefix_reused == len(prompt) - 1
    assert out2 == out1
