"""Arch batch 6: jais (gpt2-style LN + ALiBi + muP scales + gated FFN with
biases, build_jais), chameleon (per-head LayerNorm q/k norms in permuted
order + optional swin post-norms, build_chameleon), minicpm3 (MLA with NEOX
rope + hardcoded minicpm scales, build_minicpm3).
"""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.config import ModelConfig
from eagle_tpu.models.hf_convert import convert_hf_to_gguf
from eagle_tpu.models.llama import llama_forward
from eagle_tpu.models.loader import load_llama_params
from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags
from tests.test_archs_batch5 import _oracle_forward, _r


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


def test_jais_parity(tmp_path, rng):
    torch.manual_seed(51)
    d, ff, h, hk, dh, L, V = 32, 64, 4, 4, 8, 2, 128
    emb_s, logit_s = 9.0, 0.4
    sd, layers = {}, []
    sd["transformer.wte.weight"] = _r(V, d)
    sd["transformer.ln_f.weight"] = 1 + 0.1 * torch.randn(d)
    sd["transformer.ln_f.bias"] = 0.1 * torch.randn(d)
    sd["lm_head.weight"] = _r(V, d)
    for i in range(L):
        p = f"transformer.h.{i}"
        t = {
            "an": 1 + 0.1 * torch.randn(d), "anb": 0.1 * torch.randn(d),
            "wqkv": _r(3 * d, d), "bqkv": 0.1 * torch.randn(3 * d),
            "wo": _r(d, d), "bo": 0.1 * torch.randn(d),
            "fn": 1 + 0.1 * torch.randn(d), "fnb": 0.1 * torch.randn(d),
            "wg": _r(ff, d), "bg": 0.1 * torch.randn(ff),
            "wu": _r(ff, d), "bu": 0.1 * torch.randn(ff),
            "wd": _r(d, ff), "bd": 0.1 * torch.randn(d),
        }
        layers.append(t)
        sd[f"{p}.ln_1.weight"], sd[f"{p}.ln_1.bias"] = t["an"], t["anb"]
        # JAIS is gpt2-based: Conv1D weights stored [in, out]
        sd[f"{p}.attn.c_attn.weight"] = t["wqkv"].T.contiguous()
        sd[f"{p}.attn.c_attn.bias"] = t["bqkv"]
        sd[f"{p}.attn.c_proj.weight"] = t["wo"].T.contiguous()
        sd[f"{p}.attn.c_proj.bias"] = t["bo"]
        sd[f"{p}.ln_2.weight"], sd[f"{p}.ln_2.bias"] = t["fn"], t["fnb"]
        sd[f"{p}.mlp.c_fc2.weight"] = t["wg"].T.contiguous()
        sd[f"{p}.mlp.c_fc2.bias"] = t["bg"]
        sd[f"{p}.mlp.c_fc.weight"] = t["wu"].T.contiguous()
        sd[f"{p}.mlp.c_fc.bias"] = t["bu"]
        sd[f"{p}.mlp.c_proj.weight"] = t["wd"].T.contiguous()
        sd[f"{p}.mlp.c_proj.bias"] = t["bd"]
    cfg = ModelConfig(arch="jais", vocab_size=V, n_embd=d, n_layers=L,
                      n_heads=h, n_kv_heads=hk, head_dim=dh, n_ff=ff,
                      rope_dim=0, n_ctx_train=128, norm_type="layer",
                      use_alibi=True, embd_scale=emb_s, logit_scale=logit_s)
    path = tmp_path / "jais.gguf"
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="jais")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.attn_scale == pytest.approx(1.0 / dh)  # muP 1/d_head
    assert lcfg.use_alibi and lcfg.norm_type == "layer"
    assert lcfg.embd_scale == pytest.approx(emb_s)
    assert "b_gate_up" in params["layers"]

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    with torch.no_grad():
        ref = _oracle_forward(
            {"emb": sd["transformer.wte.weight"], "layers": layers,
             "on": sd["transformer.ln_f.weight"],
             "onb": sd["transformer.ln_f.bias"], "head": sd["lm_head.weight"]},
            torch.tensor(tokens, dtype=torch.long),
            n_heads=h, n_kv_heads=hk, head_dim=dh, norm="layer", rope_dim=0,
            alibi=True, attn_scale=1.0 / dh, embd_scale=emb_s,
            logit_scale=logit_s,
        )
    np.testing.assert_allclose(run_fwd(params, lcfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)


def _tiny_chameleon(swin, seed):
    torch.manual_seed(seed)
    hf_cfg = transformers.ChameleonConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, swin_norm=swin,
        attn_implementation="eager", tie_word_embeddings=False,
        vocabulary_map={"<image>": 127},
        vq_config=dict(embed_dim=32, num_embeddings=8, base_channels=32,
                       channel_multiplier=[1, 1], num_res_blocks=1,
                       resolution=32, latent_channels=32, in_channels=3,
                       out_channels=3),
    )
    model = transformers.ChameleonForConditionalGeneration(hf_cfg).eval()
    # q/k norms init to (1, 0); set nontrivial HEAD-IDENTICAL values (the
    # GGUF layout keeps one copy per projection, like the reference converter)
    with torch.no_grad():
        for lyr in model.model.layers:
            lyr.self_attn.q_norm.weight.copy_(
                (1 + 0.2 * torch.randn(8)).expand(4, 8))
            lyr.self_attn.q_norm.bias.copy_((0.1 * torch.randn(8)).expand(4, 8))
            lyr.self_attn.k_norm.weight.copy_(
                (1 + 0.2 * torch.randn(8)).expand(2, 8))
            lyr.self_attn.k_norm.bias.copy_((0.1 * torch.randn(8)).expand(2, 8))
    return model, hf_cfg


@pytest.mark.parametrize("swin", [False, True])
def test_chameleon_parity(tmp_path, rng, swin):
    model, hf_cfg = _tiny_chameleon(swin, 52 + swin)
    sd = {k: v for k, v in model.state_dict().items()
          if not k.startswith("model.vqmodel")}
    cfg = ModelConfig(
        arch="chameleon", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
        n_kv_heads=2, head_dim=8, n_ff=64, rope_dim=8, n_ctx_train=128,
        rms_eps=hf_cfg.rms_norm_eps, swin_norm=swin,
    )
    path = tmp_path / f"chameleon{swin}.gguf"
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="chameleon")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.swin_norm == swin
    assert "attn_q_norm_b" in params["layers"]
    if swin:
        assert "post_attn_norm" in params["layers"]
        assert "attn_norm" not in params["layers"]

    tokens = rng.integers(0, 120, size=(1, 10)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(run_fwd(params, lcfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)


def test_minicpm3_mla_parity(tmp_path, rng):
    """minicpm3: deepseek2's MLA but NEOX rope (no row permutes) and the
    hardcoded minicpm scale set (embd x12, resid x1.4/sqrt(L), lm-head
    x256/n_embd) — build_minicpm3."""
    torch.manual_seed(53)
    d, ff, h, L, V = 32, 64, 4, 2, 128
    nope, rope, vdim, kvl, ql = 8, 4, 8, 16, 12
    dh = nope + rope

    def r(*s):
        return torch.randn(*s) * 0.1

    sd = {}
    sd["model.embed_tokens.weight"] = r(V, d)
    sd["model.norm.weight"] = 1 + 0.1 * torch.randn(d)
    sd["lm_head.weight"] = r(V, d)
    for i in range(L):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = 1 + 0.1 * torch.randn(d)
        sd[f"{p}.post_attention_layernorm.weight"] = 1 + 0.1 * torch.randn(d)
        sd[f"{p}.self_attn.q_a_proj.weight"] = r(ql, d)
        sd[f"{p}.self_attn.q_a_layernorm.weight"] = 1 + 0.1 * torch.randn(ql)
        sd[f"{p}.self_attn.q_b_proj.weight"] = r(h * dh, ql)
        sd[f"{p}.self_attn.kv_a_proj_with_mqa.weight"] = r(kvl + rope, d)
        sd[f"{p}.self_attn.kv_a_layernorm.weight"] = 1 + 0.1 * torch.randn(kvl)
        sd[f"{p}.self_attn.kv_b_proj.weight"] = r(h * (nope + vdim), kvl)
        sd[f"{p}.self_attn.o_proj.weight"] = r(d, h * vdim)
        sd[f"{p}.mlp.gate_proj.weight"] = r(ff, d)
        sd[f"{p}.mlp.up_proj.weight"] = r(ff, d)
        sd[f"{p}.mlp.down_proj.weight"] = r(d, ff)

    cfg = ModelConfig(
        arch="minicpm3", vocab_size=V, n_embd=d, n_layers=L, n_heads=h,
        n_kv_heads=h, head_dim=dh, n_ff=ff, rope_dim=rope, n_ctx_train=128,
        kv_lora_rank=kvl, q_lora_rank=ql, v_head_dim=vdim,
    )
    path = tmp_path / "minicpm3.gguf"
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="minicpm3")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.embd_scale == pytest.approx(12.0)
    assert lcfg.resid_scale == pytest.approx(1.4 / math.sqrt(L))
    assert lcfg.logit_scale == pytest.approx(256.0 / d)
    assert "wq_a" in params["layers"]

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)

    def rms(x, w, eps=1e-5):
        x32 = x.double()
        return (x32 / (x32.pow(2).mean(-1, keepdim=True) + eps).sqrt()).float() * w

    def rope_half(z, rd):  # NEOX half-split on the trailing rope dims
        b, t, hh, _ = z.shape
        pos = torch.arange(t, dtype=torch.float64)
        j = torch.arange(rd // 2, dtype=torch.float64)
        fr = pos[:, None] * (10000.0 ** (-2.0 * j / rd))[None, :]
        cos = fr.cos().float()[None, :, None, :]
        sin = fr.sin().float()[None, :, None, :]
        a, b2 = z[..., : rd // 2], z[..., rd // 2:]
        return torch.cat([a * cos - b2 * sin, a * sin + b2 * cos], dim=-1)

    res_s = 1.4 / math.sqrt(L)
    with torch.no_grad():
        tk = torch.tensor(tokens, dtype=torch.long)
        x = sd["model.embed_tokens.weight"][tk] * 12.0
        b, t = tk.shape
        for i in range(L):
            p = f"model.layers.{i}"
            hN = rms(x, sd[f"{p}.input_layernorm.weight"])
            cq = rms(hN @ sd[f"{p}.self_attn.q_a_proj.weight"].T,
                     sd[f"{p}.self_attn.q_a_layernorm.weight"])
            q = (cq @ sd[f"{p}.self_attn.q_b_proj.weight"].T).view(b, t, h, dh)
            q_nope, q_pe = q[..., :nope], rope_half(q[..., nope:], rope)
            ckv = hN @ sd[f"{p}.self_attn.kv_a_proj_with_mqa.weight"].T
            c_kv, k_pe = ckv[..., :kvl], ckv[..., kvl:]
            c_kv = rms(c_kv, sd[f"{p}.self_attn.kv_a_layernorm.weight"])
            kvb = (c_kv @ sd[f"{p}.self_attn.kv_b_proj.weight"].T).view(
                b, t, h, nope + vdim)
            k_nope, v = kvb[..., :nope], kvb[..., nope:]
            k_pe = rope_half(k_pe[:, :, None, :], rope).expand(b, t, h, rope)
            qf = torch.cat([q_nope, q_pe], -1)
            kf = torch.cat([k_nope, k_pe], -1)
            sc = torch.einsum("bthd,bshd->bhts", qf, kf) / math.sqrt(dh)
            sc = sc.masked_fill(
                ~torch.tril(torch.ones(t, t, dtype=torch.bool))[None, None],
                float("-inf"))
            at = torch.einsum("bhts,bshd->bthd", sc.softmax(-1), v)
            attn_out = at.reshape(b, t, h * vdim) @ sd[f"{p}.self_attn.o_proj.weight"].T
            x = x + attn_out * res_s
            h2 = rms(x, sd[f"{p}.post_attention_layernorm.weight"])
            ffn = (torch.nn.functional.silu(h2 @ sd[f"{p}.mlp.gate_proj.weight"].T)
                   * (h2 @ sd[f"{p}.mlp.up_proj.weight"].T)) @ sd[f"{p}.mlp.down_proj.weight"].T
            x = x + ffn * res_s
        x = rms(x, sd["model.norm.weight"])
        ref = (x @ sd["lm_head.weight"].T * (256.0 / d)).numpy()

    np.testing.assert_allclose(run_fwd(params, lcfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)
