"""llama-3.1 rope scaling: the converter emits rope_freqs.weight divisors
(reference LlamaModel.generate_extra_tensors) and the forward divides the
inverse frequencies by them (ggml_rope_ext freq_factors). Parity vs HF's
Llama3 rotary."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.hf_convert import (
    config_from_hf,
    convert_hf_to_gguf,
    llama3_rope_factors,
)
from eagle_tpu.models.llama import llama_forward
from eagle_tpu.models.loader import load_llama_params
from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags


def test_llama31_rope_factors_parity(tmp_path, rng):
    torch.manual_seed(121)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attn_implementation="eager",
        tie_word_embeddings=False,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 32},
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    factors = llama3_rope_factors(hf_cfg)
    assert factors is not None and factors.shape == (4,)
    assert factors.max() > 1.0  # the low-frequency tail is actually scaled

    path = tmp_path / "llama31.gguf"
    convert_hf_to_gguf(model.state_dict(), config_from_hf(hf_cfg), path,
                       qtype=GGMLType.F32, rope_factors=factors)
    params, cfg, _ = load_llama_params(path)
    assert "rope_factors" in params

    # long enough that scaled frequencies change the answer (T > original/4)
    tokens = rng.integers(0, 128, size=(1, 48)).astype(np.int32)
    b, t = tokens.shape
    kv = KVCache.create(cfg.n_layers, b, 64, cfg.n_kv_heads, cfg.head_dim,
                        jnp.float32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    kv = kv.with_tags(pos, pos)
    mask = causal_mask_from_tags(kv.slot_pos, pos)
    ours = np.asarray(
        llama_forward(params, cfg, jnp.asarray(tokens), pos, kv, pos, mask,
                      compute_dtype=jnp.float32).logits
    )
    with torch.no_grad():
        ref = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=1e-2)

    # and WITHOUT factors the logits differ (the scaling actually matters)
    path2 = tmp_path / "plain.gguf"
    convert_hf_to_gguf(model.state_dict(), config_from_hf(hf_cfg), path2,
                       qtype=GGMLType.F32)
    p2, c2, _ = load_llama_params(path2)
    plain = np.asarray(
        llama_forward(p2, c2, jnp.asarray(tokens), pos, kv, pos, mask,
                      compute_dtype=jnp.float32).logits
    )
    # the factors measurably change the forward, and the scaled version is
    # strictly closer to HF than the unscaled one
    assert np.abs(plain - ours).max() > 1e-4
    assert np.abs(ours - ref).max() < np.abs(plain - ref).max()
