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


# --------------------------------------------------------------------------
# deepseek v1 + arctic: no transformers class; literal torch oracles below
# implement build_deepseek / build_arctic semantics independently.


def _rms_t(x, w, eps=1e-5):
    x32 = x.double()
    out = (x32 / (x32.pow(2).mean(-1, keepdim=True) + eps).sqrt()).float()
    return out * w


def _attn_t(x, L, h, hk, dh):
    """llama attention, HF half-split rope (converter permutes, loader
    unpermutes -> net HF semantics)."""
    b, t, d = x.shape
    q = (x @ L["wq"].T).view(b, t, h, dh)
    k = (x @ L["wk"].T).view(b, t, hk, dh)
    v = (x @ L["wv"].T).view(b, t, hk, dh)

    pos = torch.arange(t, dtype=torch.float64)
    j = torch.arange(dh // 2, dtype=torch.float64)
    fr = pos[:, None] * (10000.0 ** (-2.0 * j / dh))[None, :]
    cos, sin = fr.cos().float()[None, :, None, :], fr.sin().float()[None, :, None, :]

    def rope(z):
        a, b2 = z[..., : dh // 2], z[..., dh // 2:]
        return torch.cat([a * cos - b2 * sin, a * sin + b2 * cos], dim=-1)

    q, k = rope(q), rope(k)
    rep = h // hk
    k, v = k.repeat_interleave(rep, 2), v.repeat_interleave(rep, 2)
    sc = torch.einsum("bthd,bshd->bhts", q, k) / math.sqrt(dh)
    sc = sc.masked_fill(~torch.tril(torch.ones(t, t, dtype=torch.bool))[None, None],
                        float("-inf"))
    at = torch.einsum("bhts,bshd->bthd", sc.softmax(-1), v)
    return at.reshape(b, t, h * dh) @ L["wo"].T


def _gated(x, wg, wu, wd):
    return (torch.nn.functional.silu(x @ wg.T) * (x @ wu.T)) @ wd.T


import math  # noqa: E402


def test_deepseek_v1_parity(tmp_path, rng):
    """deepseek v1: leading dense layer, then MoE with softmax-all routing
    (norm_w=false), top-k zeroing WITHOUT renorm, plus shared experts."""
    torch.manual_seed(41)
    d, ff, ffe, h, hk, dh, V, E, K = 32, 64, 24, 4, 2, 8, 128, 4, 2

    def r(*s):
        return torch.randn(*s) * 0.1

    sd, oracle = {}, {}
    sd["model.embed_tokens.weight"] = r(V, d)
    sd["model.norm.weight"] = 1 + 0.1 * torch.randn(d)
    sd["lm_head.weight"] = r(V, d)
    for i in range(2):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = 1 + 0.1 * torch.randn(d)
        sd[f"{p}.post_attention_layernorm.weight"] = 1 + 0.1 * torch.randn(d)
        sd[f"{p}.self_attn.q_proj.weight"] = r(h * dh, d)
        sd[f"{p}.self_attn.k_proj.weight"] = r(hk * dh, d)
        sd[f"{p}.self_attn.v_proj.weight"] = r(hk * dh, d)
        sd[f"{p}.self_attn.o_proj.weight"] = r(d, h * dh)
    # layer 0 dense, layer 1 moe + shared
    sd["model.layers.0.mlp.gate_proj.weight"] = r(ff, d)
    sd["model.layers.0.mlp.up_proj.weight"] = r(ff, d)
    sd["model.layers.0.mlp.down_proj.weight"] = r(d, ff)
    sd["model.layers.1.mlp.gate.weight"] = r(E, d)
    for e in range(E):
        sd[f"model.layers.1.mlp.experts.{e}.gate_proj.weight"] = r(ffe, d)
        sd[f"model.layers.1.mlp.experts.{e}.up_proj.weight"] = r(ffe, d)
        sd[f"model.layers.1.mlp.experts.{e}.down_proj.weight"] = r(d, ffe)
    sd["model.layers.1.mlp.shared_experts.gate_proj.weight"] = r(ffe, d)
    sd["model.layers.1.mlp.shared_experts.up_proj.weight"] = r(ffe, d)
    sd["model.layers.1.mlp.shared_experts.down_proj.weight"] = r(d, ffe)

    cfg = ModelConfig(
        arch="deepseek", vocab_size=V, n_embd=d, n_layers=2, n_heads=h,
        n_kv_heads=hk, head_dim=dh, n_ff=ff, rope_dim=dh, n_ctx_train=128,
        n_expert=E, n_expert_used=K, n_dense_layers=1, n_shared_experts=1,
        n_ff_exp=ffe, moe_softmax_all=True,
    )
    path = tmp_path / "deepseek.gguf"
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="deepseek")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.moe_softmax_all and lcfg.n_dense_layers == 1
    assert "layers_dense" in params and "w_gate_shexp" in params["layers"]

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    with torch.no_grad():
        x = sd["model.embed_tokens.weight"][torch.tensor(tokens, dtype=torch.long)]
        for i in range(2):
            p = f"model.layers.{i}"
            L = {k.split(".")[-2][0] + k.split(".")[-2][1:]: None for k in ()}
            L = {
                "wq": sd[f"{p}.self_attn.q_proj.weight"],
                "wk": sd[f"{p}.self_attn.k_proj.weight"],
                "wv": sd[f"{p}.self_attn.v_proj.weight"],
                "wo": sd[f"{p}.self_attn.o_proj.weight"],
            }
            x = x + _attn_t(_rms_t(x, sd[f"{p}.input_layernorm.weight"]), L, h, hk, dh)
            hN = _rms_t(x, sd[f"{p}.post_attention_layernorm.weight"])
            if i == 0:
                x = x + _gated(hN, sd[f"{p}.mlp.gate_proj.weight"],
                               sd[f"{p}.mlp.up_proj.weight"],
                               sd[f"{p}.mlp.down_proj.weight"])
            else:
                logits = hN @ sd[f"{p}.mlp.gate.weight"].T
                probs = logits.softmax(-1)
                kth = probs.topk(K, dim=-1).values[..., -1:]
                pz = torch.where(probs >= kth, probs, torch.zeros(()))
                moe = torch.zeros_like(x)
                for e in range(E):
                    moe = moe + pz[..., e:e + 1] * _gated(
                        hN, sd[f"{p}.mlp.experts.{e}.gate_proj.weight"],
                        sd[f"{p}.mlp.experts.{e}.up_proj.weight"],
                        sd[f"{p}.mlp.experts.{e}.down_proj.weight"])
                moe = moe + _gated(
                    hN, sd[f"{p}.mlp.shared_experts.gate_proj.weight"],
                    sd[f"{p}.mlp.shared_experts.up_proj.weight"],
                    sd[f"{p}.mlp.shared_experts.down_proj.weight"])
                x = x + moe
        x = _rms_t(x, sd["model.norm.weight"])
        ref = (x @ sd["lm_head.weight"].T).numpy()

    np.testing.assert_allclose(run_fwd(params, lcfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)


def test_arctic_parity(tmp_path, rng):
    """arctic: dense residual_mlp FFN in sequence + a PARALLEL residual MoE
    whose input is the LAYER INPUT normed with ffn_norm_exps (build_arctic)."""
    torch.manual_seed(42)
    d, ff, ffe, h, hk, dh, V, E, K = 32, 48, 24, 4, 2, 8, 128, 4, 2

    def r(*s):
        return torch.randn(*s) * 0.1

    sd = {}
    sd["model.embed_tokens.weight"] = r(V, d)
    sd["model.norm.weight"] = 1 + 0.1 * torch.randn(d)
    sd["lm_head.weight"] = r(V, d)
    for i in range(2):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = 1 + 0.1 * torch.randn(d)
        sd[f"{p}.residual_layernorm.weight"] = 1 + 0.1 * torch.randn(d)
        sd[f"{p}.post_attention_layernorm.weight"] = 1 + 0.1 * torch.randn(d)
        sd[f"{p}.self_attn.q_proj.weight"] = r(h * dh, d)
        sd[f"{p}.self_attn.k_proj.weight"] = r(hk * dh, d)
        sd[f"{p}.self_attn.v_proj.weight"] = r(hk * dh, d)
        sd[f"{p}.self_attn.o_proj.weight"] = r(d, h * dh)
        sd[f"{p}.residual_mlp.w1.weight"] = r(ff, d)
        sd[f"{p}.residual_mlp.w3.weight"] = r(ff, d)
        sd[f"{p}.residual_mlp.w2.weight"] = r(d, ff)
        sd[f"{p}.block_sparse_moe.gate.weight"] = r(E, d)
        for e in range(E):
            sd[f"{p}.block_sparse_moe.experts.{e}.w1.weight"] = r(ffe, d)
            sd[f"{p}.block_sparse_moe.experts.{e}.w3.weight"] = r(ffe, d)
            sd[f"{p}.block_sparse_moe.experts.{e}.w2.weight"] = r(d, ffe)

    cfg = ModelConfig(
        arch="arctic", vocab_size=V, n_embd=d, n_layers=2, n_heads=h,
        n_kv_heads=hk, head_dim=dh, n_ff=ff, rope_dim=dh, n_ctx_train=128,
        n_expert=E, n_expert_used=K,
    )
    path = tmp_path / "arctic.gguf"
    # keep a pristine copy: the converter's arctic pre-pass mutates names
    sd_orig = dict(sd)
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="arctic")
    params, lcfg, _ = load_llama_params(path)
    assert "ffn_norm_exps" in params["layers"]
    assert "w_gate_up" in params["layers"]  # dense FFN kept alongside experts

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    sd = sd_orig
    with torch.no_grad():
        x = sd["model.embed_tokens.weight"][torch.tensor(tokens, dtype=torch.long)]
        for i in range(2):
            p = f"model.layers.{i}"
            L = {
                "wq": sd[f"{p}.self_attn.q_proj.weight"],
                "wk": sd[f"{p}.self_attn.k_proj.weight"],
                "wv": sd[f"{p}.self_attn.v_proj.weight"],
                "wo": sd[f"{p}.self_attn.o_proj.weight"],
            }
            x_in = x
            x = x + _attn_t(_rms_t(x, sd[f"{p}.input_layernorm.weight"]), L, h, hk, dh)
            dense_in = _rms_t(x, sd[f"{p}.residual_layernorm.weight"])
            x = x + _gated(dense_in, sd[f"{p}.residual_mlp.w1.weight"],
                           sd[f"{p}.residual_mlp.w3.weight"],
                           sd[f"{p}.residual_mlp.w2.weight"])
            moe_in = _rms_t(x_in, sd[f"{p}.post_attention_layernorm.weight"])
            logits = moe_in @ sd[f"{p}.block_sparse_moe.gate.weight"].T
            top = logits.topk(K, dim=-1).values[..., -1:]
            masked = torch.where(logits >= top, logits,
                                 torch.full((), float("-inf")))
            pz = masked.softmax(-1)
            moe = torch.zeros_like(x)
            for e in range(E):
                moe = moe + pz[..., e:e + 1] * _gated(
                    moe_in, sd[f"{p}.block_sparse_moe.experts.{e}.w1.weight"],
                    sd[f"{p}.block_sparse_moe.experts.{e}.w3.weight"],
                    sd[f"{p}.block_sparse_moe.experts.{e}.w2.weight"])
            x = x + moe
        x = _rms_t(x, sd["model.norm.weight"])
        ref = (x @ sd["lm_head.weight"].T).numpy()

    np.testing.assert_allclose(run_fwd(params, lcfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)
