"""Additional model-family support: qwen2 (attention biases) parity vs
transformers, SWA masking."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.models.config import ModelConfig
from eagle_tpu.models.llama import llama_forward
from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags


def run_fwd(params, cfg, tokens, swa=0):
    b, t = tokens.shape
    kv = KVCache.create(cfg.n_layers, b, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    kv = kv.with_tags(pos, pos)
    mask = causal_mask_from_tags(kv.slot_pos, pos, swa_window=swa)
    return np.asarray(
        llama_forward(params, cfg, jnp.asarray(tokens), pos, kv, pos, mask,
                      compute_dtype=jnp.float32).logits
    )


def test_qwen2_bias_parity(tmp_path, rng):
    """Qwen2 tiny model through GGUF (with biases) vs transformers."""
    torch.manual_seed(5)
    hf_cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    assert model.model.layers[0].self_attn.q_proj.bias is not None

    from eagle_tpu.models.hf_convert import config_from_hf, convert_hf_to_gguf
    from eagle_tpu.models.loader import load_llama_params

    cfg = config_from_hf(hf_cfg)
    import dataclasses

    cfg = dataclasses.replace(cfg, arch="qwen2", attn_bias=True)
    path = tmp_path / "qwen2.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=None or __import__("eagle_tpu.gguf.constants", fromlist=["GGMLType"]).GGMLType.F32, arch="qwen2")
    params, lcfg, _ = load_llama_params(path)
    assert "bqkv" in params["layers"]

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, lcfg, tokens)
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_swa_mask_limits_attention():
    slot_pos = jnp.asarray([[0, 1, 2, 3, 4, -1]])
    q_pos = jnp.asarray([[4]])
    full = np.asarray(causal_mask_from_tags(slot_pos, q_pos))
    swa = np.asarray(causal_mask_from_tags(slot_pos, q_pos, swa_window=2))
    assert full[0, 0].tolist() == [True, True, True, True, True, False]
    assert swa[0, 0].tolist() == [False, False, False, True, True, False]
