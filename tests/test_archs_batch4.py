"""Arch batch 4: olmo (non-parametric norms + clamp_kqv), cohere2 (3-of-4
sliding-window layers, rope only when sliding), chatglm/glm-4 (partial
interleaved rotary, fused-SWIGLU ffn_up), minicpm (llama graph + emb/resid/
logit scales), xverse (llama graph, its own GGUF arch tag).

Graph semantics: build_olmo (src/llama.cpp:5820), build_cohere2 (:5683),
build_chatglm (:7567); minicpm/xverse route to build_llama (:8573-8578).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.config import ModelConfig
from eagle_tpu.models.hf_convert import config_from_hf, convert_hf_to_gguf
from eagle_tpu.models.llama import llama_forward
from eagle_tpu.models.loader import load_llama_params
from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags


def run_fwd(params, cfg, tokens, swa=0):
    b, t = tokens.shape
    kv = KVCache.create(cfg.n_layers, b, 32, cfg.n_kv_heads, cfg.head_dim,
                        jnp.float32, v_head_dim=cfg.v_dim)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    kv = kv.with_tags(pos, pos)
    mask = causal_mask_from_tags(kv.slot_pos, pos, swa_window=swa)
    return np.asarray(
        llama_forward(params, cfg, jnp.asarray(tokens), pos, kv, pos, mask,
                      compute_dtype=jnp.float32).logits
    )


def roundtrip(model, cfg, tmp_path, arch):
    path = tmp_path / f"{arch}.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32, arch=arch)
    return load_llama_params(path)


def hf_logits(model, tokens):
    with torch.no_grad():
        return model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()


def test_olmo_parity(tmp_path, rng):
    """OLMo v1: non-parametric LayerNorms (no norm tensors in the GGUF at
    all) + qkv clamping (hparams.f_clamp_kqv)."""
    torch.manual_seed(11)
    hf_cfg = transformers.OlmoConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        clip_qkv=0.25, tie_word_embeddings=False,
        max_position_embeddings=128, attn_implementation="eager",
    )
    model = transformers.OlmoForCausalLM(hf_cfg).eval()

    cfg = dataclasses.replace(
        config_from_hf_safe(hf_cfg), arch="olmo", rms_eps=1e-5,
        clamp_kqv=0.25, norm_type="layer", nonparam_norms=True,
    )
    params, lcfg, _ = roundtrip(model, cfg, tmp_path, "olmo")
    assert lcfg.nonparam_norms and lcfg.clamp_kqv == 0.25
    assert lcfg.norm_type == "layer"
    assert "attn_norm" not in params["layers"] and "output_norm" not in params

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, lcfg, tokens)
    np.testing.assert_allclose(ours, hf_logits(model, tokens), atol=3e-3, rtol=1e-2)


def config_from_hf_safe(hf_cfg):
    """config_from_hf for configs without rms_norm_eps."""
    if not hasattr(hf_cfg, "rms_norm_eps"):
        hf_cfg.rms_norm_eps = getattr(hf_cfg, "layer_norm_eps", 1e-5)
    return config_from_hf(hf_cfg)


def test_cohere2_parity(tmp_path, rng):
    """Cohere2 (Command R7B): parallel blocks + LayerNorm like command-r,
    but 3-of-4 layers sliding-window and rope ONLY on sliding layers
    (build_cohere2's sliding_window_pattern / is_sliding gate)."""
    torch.manual_seed(12)
    hf_cfg = transformers.Cohere2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=8, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=4, sliding_window_pattern=4, logit_scale=0.25,
        layer_norm_eps=1e-5, max_position_embeddings=128,
        attn_implementation="eager", tie_word_embeddings=True,
        rope_theta=10000.0,
    )
    model = transformers.Cohere2ForCausalLM(hf_cfg).eval()
    # every 4th layer must be full attention in the oracle too
    assert hf_cfg.layer_types[3] == "full_attention"
    assert hf_cfg.layer_types[0] == "sliding_attention"

    cfg = dataclasses.replace(
        config_from_hf_safe(hf_cfg), arch="cohere2", rms_eps=1e-5,
        norm_type="layer", parallel_blocks=True, logit_scale=0.25,
        swa_window=4, swa_full_every=4, rope_swa_only=True,
    )
    params, lcfg, _ = roundtrip(model, cfg, tmp_path, "cohere2")
    assert lcfg.swa_full_every == 4 and lcfg.rope_swa_only
    assert lcfg.parallel_blocks and lcfg.norm_type == "layer"
    assert "ffn_norm" not in params["layers"]  # shared input norm

    # T long enough that the sliding window actually masks (T=12 > window 4)
    tokens = rng.integers(0, 128, size=(1, 12)).astype(np.int32)
    ours = run_fwd(params, lcfg, tokens)
    np.testing.assert_allclose(ours, hf_logits(model, tokens), atol=3e-3, rtol=1e-2)


def test_glm_parity(tmp_path, rng):
    """GLM-4 (chatglm arch, split-qkv form): RMSNorm, q/k/v biases, partial
    INTERLEAVED rotary (NORM rope on the first n_rot dims), fused-SWIGLU
    ffn_up split in half (LLM_FFN_SWIGLU)."""
    torch.manual_seed(13)
    hf_cfg = transformers.GlmConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=128, attn_implementation="eager",
        tie_word_embeddings=False, pad_token_id=0, eos_token_id=1,
    )
    model = transformers.GlmForCausalLM(hf_cfg).eval()
    assert model.model.layers[0].self_attn.q_proj.bias is not None

    cfg = dataclasses.replace(
        config_from_hf_safe(hf_cfg), arch="chatglm", rope_dim=4,
    )
    params, lcfg, _ = roundtrip(model, cfg, tmp_path, "chatglm")
    assert lcfg.rope_dim == 4 and lcfg.head_dim == 8
    assert "w_gate_up" in params["layers"] and "w_gate" not in params["layers"]
    assert "bqkv" in params["layers"]

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, lcfg, tokens)
    np.testing.assert_allclose(ours, hf_logits(model, tokens), atol=3e-3, rtol=1e-2)


def test_minicpm_scales(tmp_path, rng):
    """minicpm routes to build_llama with embedding/residual/logit scales
    (MiniCPMModel.set_gguf_parameters). Oracle: GraniteForCausalLM with the
    same weights and multipliers — the identical graph semantics."""
    torch.manual_seed(14)
    emb_s, res_s, logit_s = 4.0, 0.7, 0.5
    hf_cfg = transformers.GraniteConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        embedding_multiplier=emb_s, residual_multiplier=res_s,
        logits_scaling=1.0 / logit_s,  # granite DIVIDES by logits_scaling
        attention_multiplier=(32 // 4) ** -0.5,  # = default 1/sqrt(head_dim)
        max_position_embeddings=128, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = transformers.GraniteForCausalLM(hf_cfg).eval()

    cfg = dataclasses.replace(
        config_from_hf_safe(hf_cfg), arch="minicpm",
        embd_scale=emb_s, resid_scale=res_s, logit_scale=logit_s,
    )
    params, lcfg, _ = roundtrip(model, cfg, tmp_path, "minicpm")
    assert lcfg.embd_scale == pytest.approx(emb_s)
    assert lcfg.resid_scale == pytest.approx(res_s, abs=1e-6)
    assert lcfg.logit_scale == pytest.approx(logit_s)

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, lcfg, tokens)
    np.testing.assert_allclose(ours, hf_logits(model, tokens), atol=3e-3, rtol=1e-2)


def test_xverse_is_llama_graph(tmp_path, rng):
    """xverse routes to build_llama with llama HF naming; converting llama
    weights under the xverse arch tag must reproduce the llama logits."""
    torch.manual_seed(15)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(config_from_hf(hf_cfg), arch="xverse")
    params, lcfg, _ = roundtrip(model, cfg, tmp_path, "xverse")
    assert lcfg.arch == "xverse"

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, lcfg, tokens)
    np.testing.assert_allclose(ours, hf_logits(model, tokens), atol=3e-3, rtol=1e-2)
