"""MoE arch batch: dbrx (LayerNorm + fused clamped qkv + mixtral-gated MoE,
build_dbrx src/llama.cpp:2679) and granitemoe (granite scales + JetMoe-style
fused input_linear experts, routed to build_llama's MoE branch;
GraniteMoeModel converter splits gate/up).
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


def run_fwd(params, cfg, tokens):
    b, t = tokens.shape
    kv = KVCache.create(cfg.n_layers, b, 32, cfg.n_kv_heads, cfg.head_dim,
                        jnp.float32, v_head_dim=cfg.v_dim)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    kv = kv.with_tags(pos, pos)
    mask = causal_mask_from_tags(kv.slot_pos, pos)
    return np.asarray(
        llama_forward(params, cfg, jnp.asarray(tokens), pos, kv, pos, mask,
                      compute_dtype=jnp.float32).logits
    )


def hf_logits(model, tokens):
    with torch.no_grad():
        return model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()


def test_dbrx_parity(tmp_path, rng):
    torch.manual_seed(21)
    hf_cfg = transformers.DbrxConfig(
        d_model=32, n_heads=4, n_layers=2, max_seq_len=128, vocab_size=128,
        attn_config={"kv_n_heads": 2, "clip_qkv": 0.4, "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": 48, "moe_num_experts": 4, "moe_top_k": 2},
        attn_implementation="eager",
    )
    model = transformers.DbrxForCausalLM(hf_cfg).eval()

    cfg = ModelConfig(
        arch="dbrx", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
        n_kv_heads=2, head_dim=8, n_ff=48, rms_eps=1e-5, rope_dim=8,
        n_ctx_train=128, clamp_kqv=0.4, n_expert=4, n_expert_used=2,
        norm_type="layer",
    )
    path = tmp_path / "dbrx.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32, arch="dbrx")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.norm_type == "layer" and lcfg.clamp_kqv == pytest.approx(0.4)
    assert "wqkv" in params["layers"] and "ffn_gate_inp" in params["layers"]
    assert "ffn_norm" in params["layers"]  # loaded from attn_output_norm

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, lcfg, tokens)
    np.testing.assert_allclose(ours, hf_logits(model, tokens), atol=3e-3, rtol=1e-2)


def test_granitemoe_parity(tmp_path, rng):
    torch.manual_seed(22)
    emb_s, res_s, att_m, logit_div = 3.0, 0.8, 0.35355339059327373, 2.0
    hf_cfg = transformers.GraniteMoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=emb_s, residual_multiplier=res_s,
        attention_multiplier=att_m, logits_scaling=logit_div,
        max_position_embeddings=128, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = transformers.GraniteMoeForCausalLM(hf_cfg).eval()

    cfg = dataclasses.replace(
        config_from_hf(hf_cfg), arch="granitemoe",
        n_expert=4, n_expert_used=2,
        embd_scale=emb_s, resid_scale=res_s, attn_scale=att_m,
        logit_scale=1.0 / logit_div,  # granite DIVIDES by logits_scaling
    )
    path = tmp_path / "granitemoe.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32,
                       arch="granitemoe")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.attn_scale == pytest.approx(att_m)
    assert lcfg.embd_scale == pytest.approx(emb_s)
    assert "w_gate_exps" in params["layers"]

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, lcfg, tokens)
    np.testing.assert_allclose(ours, hf_logits(model, tokens), atol=3e-3, rtol=1e-2)
