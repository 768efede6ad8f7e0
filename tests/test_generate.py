"""End-to-end generation engine tests on a tiny random model: the compiled
decode loop must produce token-for-token the same stream as a naive eager
re-implementation (greedy), the analogue of the reference's deterministic
llama-cli --temp 0 parity gate."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.runtime.generate import Generator, pad_bucket
from eagle_tpu.runtime.sampling import SamplerConfig


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
    return model, params, mcfg


def hf_greedy(model, prompt, n):
    import torch

    ids = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(
            ids, max_new_tokens=n, do_sample=False, num_beams=1,
            pad_token_id=0, eos_token_id=None,
        )
    return out[0, len(prompt):].tolist()


def test_pad_bucket():
    assert pad_bucket(1) == 16
    assert pad_bucket(16) == 16
    assert pad_bucket(17) == 32
    assert pad_bucket(100) == 128


def test_greedy_generation_matches_hf(tiny, rng):
    model, params, mcfg = tiny
    gen = Generator(params, mcfg, max_seq=128, compute_dtype=jnp.float32, eos_id=-1)
    prompt = rng.integers(0, 128, size=10).tolist()
    ours = gen.generate(prompt, max_new_tokens=12, stop_at_eos=False, chunk=5)
    theirs = hf_greedy(model, prompt, 12)
    assert ours == theirs


def test_generation_is_deterministic_across_chunking(tiny, rng):
    _, params, mcfg = tiny
    prompt = rng.integers(0, 128, size=7).tolist()
    a = Generator(params, mcfg, max_seq=128, compute_dtype=jnp.float32, eos_id=-1).generate(
        prompt, max_new_tokens=10, stop_at_eos=False, chunk=3
    )
    b = Generator(params, mcfg, max_seq=128, compute_dtype=jnp.float32, eos_id=-1).generate(
        prompt, max_new_tokens=10, stop_at_eos=False, chunk=10
    )
    assert a == b


def test_sampled_generation_reproducible(tiny, rng):
    _, params, mcfg = tiny
    prompt = rng.integers(0, 128, size=5).tolist()
    scfg = SamplerConfig(temperature=1.0, top_k=20)
    g1 = Generator(params, mcfg, max_seq=128, compute_dtype=jnp.float32, eos_id=-1)
    g2 = Generator(params, mcfg, max_seq=128, compute_dtype=jnp.float32, eos_id=-1)
    a = g1.generate(prompt, max_new_tokens=8, sampler=scfg, seed=42, stop_at_eos=False)
    b = g2.generate(prompt, max_new_tokens=8, sampler=scfg, seed=42, stop_at_eos=False)
    assert a == b
