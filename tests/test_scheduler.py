"""Continuous batching: per-slot outputs must be identical to single-sequence
generation (slot isolation), across staggered submissions."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.models.eagle import random_eagle_params
from eagle_tpu.runtime.scheduler import ContinuousBatcher
from eagle_tpu.runtime.speculative import EagleChainEngine


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


def make_engine(setup, batch=1):
    tparams, dparams, tcfg, dcfg = setup
    return EagleChainEngine(
        tparams, dparams, tcfg, dcfg, n_draft=2, max_seq=128, batch=batch,
        compute_dtype=jnp.float32, kv_dtype=jnp.float32, eos_id=-1,
    )


def single_ref(setup, prompt, n):
    eng = make_engine(setup, batch=1)
    out, _ = eng.generate(prompt, max_new_tokens=n, stop_at_eos=False)
    return out[:n]


def test_batched_matches_single(setup, rng):
    prompts = [rng.integers(0, 128, size=np.random.randint(4, 12)).tolist() for _ in range(3)]
    want = [single_ref(setup, p, 10) for p in prompts]

    batcher = ContinuousBatcher(make_engine(setup, batch=4))
    slots = [batcher.submit(p, max_new_tokens=10, stop_at_eos=False) for p in prompts]
    assert all(s is not None for s in slots)
    batcher.run_until_done(max_steps=100)
    got = [s.generated[:10] for s in slots]
    assert got == want


def test_staggered_submission(setup, rng):
    p1 = rng.integers(0, 128, size=6).tolist()
    p2 = rng.integers(0, 128, size=9).tolist()
    want1 = single_ref(setup, p1, 12)
    want2 = single_ref(setup, p2, 8)

    batcher = ContinuousBatcher(make_engine(setup, batch=2))
    s1 = batcher.submit(p1, max_new_tokens=12, stop_at_eos=False)
    # run a few cycles before the second arrives
    for _ in range(2):
        batcher.step()
    s2 = batcher.submit(p2, max_new_tokens=8, stop_at_eos=False)
    batcher.run_until_done(max_steps=100)
    assert s1.generated[:12] == want1
    assert s2.generated[:8] == want2


def test_slot_reuse_after_completion(setup, rng):
    batcher = ContinuousBatcher(make_engine(setup, batch=2))
    p = rng.integers(0, 128, size=5).tolist()
    s1 = batcher.submit(p, max_new_tokens=4, stop_at_eos=False)
    batcher.run_until_done(max_steps=50)
    assert s1.state == "free"
    # slot is reusable and produces the right output again
    want = single_ref(setup, p, 4)
    s2 = batcher.submit(p, max_new_tokens=4, stop_at_eos=False)
    batcher.run_until_done(max_steps=50)
    assert s2.generated[:4] == want


def test_saturation_returns_none(setup, rng):
    batcher = ContinuousBatcher(make_engine(setup, batch=1))
    p = rng.integers(0, 128, size=4).tolist()
    assert batcher.submit(p, max_new_tokens=20, stop_at_eos=False) is not None
    assert batcher.submit(p, max_new_tokens=20, stop_at_eos=False) is None


def test_chunked_prefill_interleaves_decode(setup, rng):
    """A long prompt is admitted in chunks while the other slot keeps
    emitting tokens at every step (VERDICT #4: no whole-prompt stall)."""
    p_short = rng.integers(0, 128, size=4).tolist()
    p_long = rng.integers(0, 128, size=100).tolist()
    want_short = single_ref(setup, p_short, 20)
    want_long = single_ref(setup, p_long, 6)

    batcher = ContinuousBatcher(make_engine(setup, batch=2), prefill_chunk=16)
    s1 = batcher.submit(p_short, max_new_tokens=20, stop_at_eos=False)
    batcher.step()  # short prompt fully admitted (4 < 16)
    assert s1.state == "generating"
    progress = []
    s2 = batcher.submit(p_long, max_new_tokens=6, stop_at_eos=False)
    for _ in range(7):  # 100/16 -> 7 chunks
        n_before = len(s1.generated)
        batcher.step()
        progress.append(len(s1.generated) - n_before)
    # decode progressed during the long admission (interleaving, not stalling)
    assert sum(progress[:6]) > 0
    batcher.run_until_done(max_steps=100)
    assert s1.generated[:20] == want_short
    assert s2.generated[:6] == want_long


def test_per_slot_sampler_configs(setup, rng):
    """Greedy and high-temperature requests in the SAME batch: the greedy
    slot must match single-sequence greedy output exactly, proving row-wise
    sampler params take effect in the batched path (server.cpp:272-278)."""
    from eagle_tpu.runtime.sampling import SamplerConfig

    p1 = rng.integers(0, 128, size=6).tolist()
    p2 = rng.integers(0, 128, size=6).tolist()
    want1 = single_ref(setup, p1, 10)

    batcher = ContinuousBatcher(make_engine(setup, batch=2))
    s1 = batcher.submit(p1, max_new_tokens=10, stop_at_eos=False,
                        sampler=SamplerConfig(greedy=True))
    s2 = batcher.submit(p2, max_new_tokens=10, stop_at_eos=False,
                        sampler=SamplerConfig(greedy=False, temperature=5.0,
                                              top_k=0, top_p=1.0, min_p=0.0))
    batcher.run_until_done(max_steps=100)
    assert s1.generated[:10] == want1
    assert len(s2.generated) == 10


def test_abort_releases_slot(setup, rng):
    batcher = ContinuousBatcher(make_engine(setup, batch=1))
    p = rng.integers(0, 128, size=6).tolist()
    s = batcher.submit(p, max_new_tokens=1000, stop_at_eos=False,
                       request_id="r1")
    for _ in range(3):
        batcher.step()
    assert s.state == "generating"
    assert batcher.abort("r1")
    assert s.state == "free" and batcher.n_active == 0
    # slot is reusable afterwards
    want = single_ref(setup, p, 5)
    s2 = batcher.submit(p, max_new_tokens=5, stop_at_eos=False)
    batcher.run_until_done(max_steps=60)
    assert s2.generated[:5] == want


def test_spec_k_override_caps_acceptance(setup, rng):
    """Per-request speculative cap: with spec_k=0, every cycle emits exactly
    one token (pure verification, no accepted drafts)."""
    p = rng.integers(0, 128, size=5).tolist()
    want = single_ref(setup, p, 8)
    batcher = ContinuousBatcher(make_engine(setup, batch=1))
    s = batcher.submit(p, max_new_tokens=8, stop_at_eos=False, spec_k=0)
    batcher.step()  # prefill + first cycle
    n_after_first_cycle = len(s.generated)
    assert n_after_first_cycle <= 3  # first token + one cycle of <= 1+1
    batcher.run_until_done(max_steps=100)
    assert s.generated[:8] == want


def test_slot_save_restore_resume(setup, rng, tmp_path):
    """The reference's test_slot_save.py scenario: save a slot mid-generation,
    restore it into a FRESH batcher, resume — the continued stream must equal
    uninterrupted generation (prompt-cache-across-restarts semantics)."""
    p = rng.integers(0, 128, size=6).tolist()
    want = single_ref(setup, p, 14)

    b1 = ContinuousBatcher(make_engine(setup, batch=2))
    s = b1.submit(p, max_new_tokens=6, stop_at_eos=False)
    b1.run_until_done(max_steps=50)
    got_first = list(s.generated)[:6]
    assert got_first == want[:6]
    b1.save_slot(s.id, tmp_path / "slot.bin")

    b2 = ContinuousBatcher(make_engine(setup, batch=2))
    s2 = b2.restore_slot(tmp_path / "slot.bin", slot_id=1)  # different slot
    assert s2.state == "restored" and s2.generated[:6] == got_first
    b2.resume_slot(1, max_new_tokens=14)
    b2.run_until_done(max_steps=60)
    assert s2.generated[:14] == want
