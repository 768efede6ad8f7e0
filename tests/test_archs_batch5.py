"""Arch batch 5: baichuan (fused W_pack split), internlm2 (kv-grouped fused
wqkv split), exaone / qwen v1 (renamed llama/qwen2 graphs), plamo (shared-norm
parallel RMS block), codeshell (gpt2-style LN block + rotary), refact (RMS +
MQA + ALiBi), orion (LayerNorm+bias llama block, interleaved rope).

Oracles: where the graph is identical to a transformers class, the weights
are renamed/fused from that class and its logits are the oracle. For archs
with no transformers class (plamo/codeshell/refact/orion) a literal torch
block oracle below implements the reference graph semantics (build_plamo
src/llama.cpp, build_codeshell, build_refact, build_orion) independently.
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
from eagle_tpu.models.hf_convert import config_from_hf, convert_hf_to_gguf
from eagle_tpu.models.llama import alibi_slopes, llama_forward
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


def _tiny_llama(seed):
    torch.manual_seed(seed)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    return transformers.LlamaForCausalLM(hf_cfg).eval(), hf_cfg


def test_baichuan_wpack_split(tmp_path, rng):
    """Fuse a llama model's q/k/v into baichuan's W_pack; the converter must
    split + permute back to the identical llama graph (build_baichuan 7B)."""
    model, hf_cfg = _tiny_llama(31)
    # baichuan is MHA in both real sizes; GQA would change W_pack layout
    hf_cfg.num_key_value_heads = 4
    torch.manual_seed(31)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.clone() for k, v in model.state_dict().items()}
    for i in range(hf_cfg.num_hidden_layers):
        p = f"model.layers.{i}.self_attn"
        sd[f"{p}.W_pack.weight"] = torch.cat(
            [sd.pop(f"{p}.q_proj.weight"), sd.pop(f"{p}.k_proj.weight"),
             sd.pop(f"{p}.v_proj.weight")]
        )
    cfg = dataclasses.replace(config_from_hf(hf_cfg), arch="baichuan")
    path = tmp_path / "baichuan.gguf"
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="baichuan")
    params, lcfg, _ = load_llama_params(path)

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    np.testing.assert_allclose(
        run_fwd(params, lcfg, tokens), hf_logits(model, tokens),
        atol=3e-3, rtol=1e-2,
    )


def test_internlm2_grouped_qkv_split(tmp_path, rng):
    """Fuse a llama model's q/k/v into internlm2's kv-head-GROUPED wqkv and
    rename to internlm2 tensor names; the converter must de-group + permute
    (reference InternLM2Model.modify_tensors)."""
    model, hf_cfg = _tiny_llama(32)
    h, h_kv = hf_cfg.num_attention_heads, hf_cfg.num_key_value_heads
    dh = hf_cfg.hidden_size // h
    qpk = h // h_kv
    sd = {}
    for name, t in model.state_dict().items():
        sd[name] = t.clone()
    out = {
        "model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
        "model.norm.weight": sd["model.norm.weight"],
        "output.weight": sd["lm_head.weight"],
    }
    for i in range(hf_cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        q = sd[f"{p}.self_attn.q_proj.weight"].reshape(h_kv, qpk, dh, -1)
        k = sd[f"{p}.self_attn.k_proj.weight"].reshape(h_kv, 1, dh, -1)
        v = sd[f"{p}.self_attn.v_proj.weight"].reshape(h_kv, 1, dh, -1)
        out[f"{p}.attention.wqkv.weight"] = torch.cat([q, k, v], dim=1).reshape(
            -1, hf_cfg.hidden_size
        )
        out[f"{p}.attention.wo.weight"] = sd[f"{p}.self_attn.o_proj.weight"]
        out[f"{p}.attention_norm.weight"] = sd[f"{p}.input_layernorm.weight"]
        out[f"{p}.ffn_norm.weight"] = sd[f"{p}.post_attention_layernorm.weight"]
        out[f"{p}.feed_forward.w1.weight"] = sd[f"{p}.mlp.gate_proj.weight"]
        out[f"{p}.feed_forward.w3.weight"] = sd[f"{p}.mlp.up_proj.weight"]
        out[f"{p}.feed_forward.w2.weight"] = sd[f"{p}.mlp.down_proj.weight"]
    cfg = dataclasses.replace(config_from_hf(hf_cfg), arch="internlm2")
    path = tmp_path / "internlm2.gguf"
    convert_hf_to_gguf(out, cfg, path, qtype=GGMLType.F32, arch="internlm2")
    params, lcfg, _ = load_llama_params(path)

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    np.testing.assert_allclose(
        run_fwd(params, lcfg, tokens), hf_logits(model, tokens),
        atol=3e-3, rtol=1e-2,
    )


def test_exaone_renamed_llama(tmp_path, rng):
    """exaone = llama graph under its transformer.h/attn.attention naming;
    NEOX rope means NO permute anywhere (rows stay HF half-split)."""
    model, hf_cfg = _tiny_llama(33)
    sd = model.state_dict()
    out = {
        "transformer.wte.weight": sd["model.embed_tokens.weight"],
        "transformer.ln_f.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    for i in range(hf_cfg.num_hidden_layers):
        src, dst = f"model.layers.{i}", f"transformer.h.{i}"
        out[f"{dst}.ln_1.weight"] = sd[f"{src}.input_layernorm.weight"]
        out[f"{dst}.attn.attention.q_proj.weight"] = sd[f"{src}.self_attn.q_proj.weight"]
        out[f"{dst}.attn.attention.k_proj.weight"] = sd[f"{src}.self_attn.k_proj.weight"]
        out[f"{dst}.attn.attention.v_proj.weight"] = sd[f"{src}.self_attn.v_proj.weight"]
        out[f"{dst}.attn.attention.out_proj.weight"] = sd[f"{src}.self_attn.o_proj.weight"]
        out[f"{dst}.ln_2.weight"] = sd[f"{src}.post_attention_layernorm.weight"]
        out[f"{dst}.mlp.c_fc_0.weight"] = sd[f"{src}.mlp.gate_proj.weight"]
        out[f"{dst}.mlp.c_fc_1.weight"] = sd[f"{src}.mlp.up_proj.weight"]
        out[f"{dst}.mlp.c_proj.weight"] = sd[f"{src}.mlp.down_proj.weight"]
    cfg = dataclasses.replace(config_from_hf(hf_cfg), arch="exaone")
    path = tmp_path / "exaone.gguf"
    convert_hf_to_gguf(out, cfg, path, qtype=GGMLType.F32, arch="exaone")
    params, lcfg, _ = load_llama_params(path)

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    np.testing.assert_allclose(
        run_fwd(params, lcfg, tokens), hf_logits(model, tokens),
        atol=3e-3, rtol=1e-2,
    )


def test_qwen_v1_fused_cattn(tmp_path, rng):
    """qwen v1 = MHA qwen2 with the q/k/v (+biases) fused into c_attn and
    gpt2-ish naming; oracle is the qwen2 model the weights came from."""
    torch.manual_seed(34)
    hf_cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    sd = model.state_dict()
    out = {
        "transformer.wte.weight": sd["model.embed_tokens.weight"],
        "transformer.ln_f.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    for i in range(hf_cfg.num_hidden_layers):
        src, dst = f"model.layers.{i}", f"transformer.h.{i}"
        out[f"{dst}.ln_1.weight"] = sd[f"{src}.input_layernorm.weight"]
        out[f"{dst}.attn.c_attn.weight"] = torch.cat(
            [sd[f"{src}.self_attn.q_proj.weight"],
             sd[f"{src}.self_attn.k_proj.weight"],
             sd[f"{src}.self_attn.v_proj.weight"]]
        )
        out[f"{dst}.attn.c_attn.bias"] = torch.cat(
            [sd[f"{src}.self_attn.q_proj.bias"],
             sd[f"{src}.self_attn.k_proj.bias"],
             sd[f"{src}.self_attn.v_proj.bias"]]
        )
        out[f"{dst}.attn.c_proj.weight"] = sd[f"{src}.self_attn.o_proj.weight"]
        out[f"{dst}.ln_2.weight"] = sd[f"{src}.post_attention_layernorm.weight"]
        out[f"{dst}.mlp.w2.weight"] = sd[f"{src}.mlp.gate_proj.weight"]
        out[f"{dst}.mlp.w1.weight"] = sd[f"{src}.mlp.up_proj.weight"]
        out[f"{dst}.mlp.c_proj.weight"] = sd[f"{src}.mlp.down_proj.weight"]
    cfg = dataclasses.replace(config_from_hf(hf_cfg), arch="qwen")
    path = tmp_path / "qwen.gguf"
    convert_hf_to_gguf(out, cfg, path, qtype=GGMLType.F32, arch="qwen")
    params, lcfg, _ = load_llama_params(path)
    assert "wqkv" in params["layers"] and "bqkv" in params["layers"]

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    np.testing.assert_allclose(
        run_fwd(params, lcfg, tokens), hf_logits(model, tokens),
        atol=3e-3, rtol=1e-2,
    )


# --------------------------------------------------------------------------
# literal torch oracle for archs with no transformers class


def _rope_torch(x, rd, base, interleaved):
    """x [B,T,H,Dh]; rotate first rd dims. interleaved = ggml NORM layout
    (pairs (2j,2j+1)); otherwise HF half-split (pairs (j, j+rd/2))."""
    b, t, h, dh = x.shape
    pos = torch.arange(t, dtype=torch.float64)
    j = torch.arange(rd // 2, dtype=torch.float64)
    freqs = pos[:, None] * (base ** (-2.0 * j / rd))[None, :]  # [T, rd/2]
    cos, sin = freqs.cos().float(), freqs.sin().float()
    xr, xp = x[..., :rd], x[..., rd:]
    if interleaved:
        a, b2 = xr[..., 0::2], xr[..., 1::2]
    else:
        a, b2 = xr[..., : rd // 2], xr[..., rd // 2:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    ra, rb = a * c - b2 * s, a * s + b2 * c
    if interleaved:
        rot = torch.stack([ra, rb], dim=-1).flatten(-2)
    else:
        rot = torch.cat([ra, rb], dim=-1)
    return torch.cat([rot, xp], dim=-1)


def _oracle_forward(
    W, tokens, *, n_heads, n_kv_heads, head_dim, norm="rms", eps=1e-5,
    rope_dim=0, rope_base=10000.0, interleaved=False, parallel=False,
    alibi=False, act="silu", gated=True, attn_scale=None, embd_scale=1.0,
    logit_scale=1.0,
):
    """Literal per-layer torch forward implementing the reference block
    graphs (build_plamo/build_codeshell/build_refact/build_orion)."""

    def nrm(x, w, b):
        x32 = x.double()
        if norm == "layer":
            mu = x32.mean(-1, keepdim=True)
            xc = x32 - mu
            out = xc / (xc.pow(2).mean(-1, keepdim=True) + eps).sqrt()
        else:
            out = x32 / (x32.pow(2).mean(-1, keepdim=True) + eps).sqrt()
        out = out.float()
        if w is not None:
            out = out * w
        if b is not None:
            out = out + b
        return out

    x = W["emb"][tokens] * embd_scale
    b, t = tokens.shape
    h, hk, dh = n_heads, n_kv_heads, head_dim
    mask = torch.tril(torch.ones(t, t, dtype=torch.bool))
    slopes = torch.tensor(alibi_slopes(h)) if alibi else None
    for L in W["layers"]:
        h_in = nrm(x, L.get("an"), L.get("anb"))
        if "wqkv" in L:
            qkv = h_in @ L["wqkv"].T
            if "bqkv" in L:
                qkv = qkv + L["bqkv"]
            q, k, v = qkv.split([h * dh, hk * dh, hk * dh], dim=-1)
        else:
            q, k, v = h_in @ L["wq"].T, h_in @ L["wk"].T, h_in @ L["wv"].T
        q = q.view(b, t, h, dh)
        k = k.view(b, t, hk, dh)
        v = v.view(b, t, hk, dh)
        if rope_dim > 0:
            q = _rope_torch(q, rope_dim, rope_base, interleaved)
            k = _rope_torch(k, rope_dim, rope_base, interleaved)
        rep = h // hk
        k = k.repeat_interleave(rep, dim=2)
        v = v.repeat_interleave(rep, dim=2)
        scores = torch.einsum("bthd,bshd->bhts", q, k) * (
            attn_scale if attn_scale is not None else 1.0 / math.sqrt(dh)
        )
        if alibi:
            # ggml/HF alibi: bias slope_h * key_position (row-constant shift
            # is softmax-invariant, matching our q_pos-relative form)
            scores = scores + slopes[None, :, None, None] * torch.arange(
                t, dtype=torch.float32
            )[None, None, None, :]
        scores = scores.masked_fill(~mask[None, None], float("-inf"))
        attn = torch.einsum("bhts,bshd->bthd", scores.softmax(-1), v)
        attn_out = attn.reshape(b, t, h * dh) @ L["wo"].T
        if "bo" in L:
            attn_out = attn_out + L["bo"]
        actf = torch.nn.functional.silu if act == "silu" else (
            lambda z: torch.nn.functional.gelu(z, approximate="tanh")
        )

        def ffn(z):
            if gated:
                g = z @ L["wg"].T
                u = z @ L["wu"].T
                if "bg" in L:
                    g, u = g + L["bg"], u + L["bu"]
                out = actf(g) * u @ L["wd"].T
                if "bd" in L:
                    out = out + L["bd"]
                return out
            up = z @ L["wu"].T
            if "bu" in L:
                up = up + L["bu"]
            out = actf(up) @ L["wd"].T
            if "bd" in L:
                out = out + L["bd"]
            return out

        if parallel:
            x = x + attn_out + ffn(h_in)
        else:
            x = x + attn_out
            h2 = nrm(x, L.get("fn"), L.get("fnb"))
            x = x + ffn(h2)
    x = nrm(x, W.get("on"), W.get("onb"))
    return (x @ W["head"].T * logit_scale).numpy()


def _r(*shape):
    return torch.randn(*shape) * 0.1


def test_plamo_parity(tmp_path, rng):
    """plamo: ONE shared RMS norm feeds attention and FFN, x+attn+ffn
    parallel residual, interleaved (NORM) rope."""
    torch.manual_seed(35)
    d, ff, h, hk, dh, L, V = 32, 64, 4, 4, 8, 2, 128
    sd, layers = {}, []
    sd["model.embed_tokens.weight"] = _r(V, d)
    sd["model.norm.weight"] = 1 + 0.1 * torch.randn(d)
    sd["lm_head.weight"] = _r(V, d)
    for i in range(L):
        p = f"model.layers.layers.{i}"
        t = {
            "an": 1 + 0.1 * torch.randn(d),
            "wq": _r(h * dh, d), "wk": _r(hk * dh, d), "wv": _r(hk * dh, d),
            "wo": _r(d, h * dh), "wg": _r(ff, d), "wu": _r(ff, d),
            "wd": _r(d, ff),
        }
        layers.append(t)
        sd[f"{p}.norm.weight"] = t["an"]
        sd[f"{p}.self_attn.q_proj.weight"] = t["wq"]
        sd[f"{p}.self_attn.k_proj.weight"] = t["wk"]
        sd[f"{p}.self_attn.v_proj.weight"] = t["wv"]
        sd[f"{p}.self_attn.o_proj.weight"] = t["wo"]
        sd[f"{p}.mlp.gate_proj.weight"] = t["wg"]
        sd[f"{p}.mlp.up_proj.weight"] = t["wu"]
        sd[f"{p}.mlp.down_proj.weight"] = t["wd"]
    cfg = ModelConfig(arch="plamo", vocab_size=V, n_embd=d, n_layers=L,
                      n_heads=h, n_kv_heads=hk, head_dim=dh, n_ff=ff,
                      rope_dim=dh, n_ctx_train=128)
    path = tmp_path / "plamo.gguf"
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="plamo")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.parallel_blocks and "ffn_norm" not in params["layers"]

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    with torch.no_grad():
        ref = _oracle_forward(
            {"emb": sd["model.embed_tokens.weight"], "layers": layers,
             "on": sd["model.norm.weight"], "head": sd["lm_head.weight"]},
            torch.tensor(tokens, dtype=torch.long),
            n_heads=h, n_kv_heads=hk, head_dim=dh, rope_dim=dh,
            interleaved=True, parallel=True,
        )
    np.testing.assert_allclose(run_fwd(params, lcfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)


def test_codeshell_parity(tmp_path, rng):
    """codeshell: gpt2-style LayerNorm block (fused qkv + biases, no-gate
    gelu FFN) but NEOX rotary instead of learned positions (build_codeshell)."""
    torch.manual_seed(36)
    d, ff, h, hk, dh, L, V = 32, 64, 4, 1, 8, 2, 128
    sd, layers = {}, []
    sd["transformer.wte.weight"] = _r(V, d)
    sd["transformer.ln_f.weight"] = 1 + 0.1 * torch.randn(d)
    sd["transformer.ln_f.bias"] = 0.1 * torch.randn(d)
    sd["lm_head.weight"] = _r(V, d)
    for i in range(L):
        p = f"transformer.h.{i}"
        t = {
            "an": 1 + 0.1 * torch.randn(d), "anb": 0.1 * torch.randn(d),
            "wqkv": _r((h + 2 * hk) * dh, d), "bqkv": 0.1 * torch.randn((h + 2 * hk) * dh),
            "wo": _r(d, h * dh), "bo": 0.1 * torch.randn(d),
            "fn": 1 + 0.1 * torch.randn(d), "fnb": 0.1 * torch.randn(d),
            "wu": _r(ff, d), "bu": 0.1 * torch.randn(ff),
            "wd": _r(d, ff), "bd": 0.1 * torch.randn(d),
        }
        layers.append(t)
        sd[f"{p}.ln_1.weight"], sd[f"{p}.ln_1.bias"] = t["an"], t["anb"]
        sd[f"{p}.attn.c_attn.weight"], sd[f"{p}.attn.c_attn.bias"] = t["wqkv"], t["bqkv"]
        sd[f"{p}.attn.c_proj.weight"], sd[f"{p}.attn.c_proj.bias"] = t["wo"], t["bo"]
        sd[f"{p}.ln_2.weight"], sd[f"{p}.ln_2.bias"] = t["fn"], t["fnb"]
        sd[f"{p}.mlp.c_fc.weight"], sd[f"{p}.mlp.c_fc.bias"] = t["wu"], t["bu"]
        sd[f"{p}.mlp.c_proj.weight"], sd[f"{p}.mlp.c_proj.bias"] = t["wd"], t["bd"]
    cfg = ModelConfig(arch="codeshell", vocab_size=V, n_embd=d, n_layers=L,
                      n_heads=h, n_kv_heads=hk, head_dim=dh, n_ff=ff,
                      rope_dim=dh, n_ctx_train=128, norm_type="layer")
    path = tmp_path / "codeshell.gguf"
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="codeshell")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.norm_type == "layer" and lcfg.act == "gelu"

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    with torch.no_grad():
        ref = _oracle_forward(
            {"emb": sd["transformer.wte.weight"], "layers": layers,
             "on": sd["transformer.ln_f.weight"],
             "onb": sd["transformer.ln_f.bias"],
             "head": sd["lm_head.weight"]},
            torch.tensor(tokens, dtype=torch.long),
            n_heads=h, n_kv_heads=hk, head_dim=dh, norm="layer",
            rope_dim=dh, interleaved=False, act="gelu", gated=False,
        )
    np.testing.assert_allclose(run_fwd(params, lcfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)


def test_refact_parity(tmp_path, rng):
    """refact: RMS norms + separate-q/k/v MQA + ALiBi (no rope) + silu-gated
    linear_1/linear_3 FFN (build_refact)."""
    torch.manual_seed(37)
    d, ff, h, hk, dh, L, V = 32, 64, 4, 1, 8, 2, 128
    sd, layers = {}, []
    sd["transformer.wte.weight"] = _r(V, d)
    sd["transformer.ln_f.weight"] = 1 + 0.1 * torch.randn(d)
    sd["lm_head.weight"] = _r(V, d)
    for i in range(L):
        p = f"transformer.h.{i}"
        t = {
            "an": 1 + 0.1 * torch.randn(d),
            "wq": _r(h * dh, d), "wk": _r(hk * dh, d), "wv": _r(hk * dh, d),
            "wo": _r(d, h * dh),
            "fn": 1 + 0.1 * torch.randn(d),
            "wg": _r(ff, d), "wu": _r(ff, d), "wd": _r(d, ff),
        }
        layers.append(t)
        sd[f"{p}.ln_1.weight"] = t["an"]
        sd[f"{p}.attn.q.weight"] = t["wq"]
        sd[f"{p}.attn.k.weight"] = t["wk"]
        sd[f"{p}.attn.v.weight"] = t["wv"]
        sd[f"{p}.attn.c_proj.weight"] = t["wo"]
        sd[f"{p}.ln_2.weight"] = t["fn"]
        sd[f"{p}.mlp.linear_1.weight"] = t["wg"]
        sd[f"{p}.mlp.linear_3.weight"] = t["wu"]
        sd[f"{p}.mlp.c_proj.weight"] = t["wd"]
    cfg = ModelConfig(arch="refact", vocab_size=V, n_embd=d, n_layers=L,
                      n_heads=h, n_kv_heads=hk, head_dim=dh, n_ff=ff,
                      rope_dim=0, n_ctx_train=128, use_alibi=True)
    path = tmp_path / "refact.gguf"
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="refact")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.use_alibi and lcfg.rope_dim == 0 and lcfg.norm_type == "rms"

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    with torch.no_grad():
        ref = _oracle_forward(
            {"emb": sd["transformer.wte.weight"], "layers": layers,
             "on": sd["transformer.ln_f.weight"], "head": sd["lm_head.weight"]},
            torch.tensor(tokens, dtype=torch.long),
            n_heads=h, n_kv_heads=hk, head_dim=dh, rope_dim=0, alibi=True,
        )
    np.testing.assert_allclose(run_fwd(params, lcfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)


def test_orion_parity(tmp_path, rng):
    """orion: llama-shaped block but mean-subtracted LayerNorm WITH biases
    and interleaved (NORM) rope on unpermuted rows (build_orion; the
    reference converter does not permute)."""
    torch.manual_seed(38)
    d, ff, h, hk, dh, L, V = 32, 64, 4, 2, 8, 2, 128
    sd, layers = {}, []
    sd["model.embed_tokens.weight"] = _r(V, d)
    sd["model.norm.weight"] = 1 + 0.1 * torch.randn(d)
    sd["model.norm.bias"] = 0.1 * torch.randn(d)
    sd["lm_head.weight"] = _r(V, d)
    for i in range(L):
        p = f"model.layers.{i}"
        t = {
            "an": 1 + 0.1 * torch.randn(d), "anb": 0.1 * torch.randn(d),
            "wq": _r(h * dh, d), "wk": _r(hk * dh, d), "wv": _r(hk * dh, d),
            "wo": _r(d, h * dh),
            "fn": 1 + 0.1 * torch.randn(d), "fnb": 0.1 * torch.randn(d),
            "wg": _r(ff, d), "wu": _r(ff, d), "wd": _r(d, ff),
        }
        layers.append(t)
        sd[f"{p}.input_layernorm.weight"] = t["an"]
        sd[f"{p}.input_layernorm.bias"] = t["anb"]
        sd[f"{p}.self_attn.q_proj.weight"] = t["wq"]
        sd[f"{p}.self_attn.k_proj.weight"] = t["wk"]
        sd[f"{p}.self_attn.v_proj.weight"] = t["wv"]
        sd[f"{p}.self_attn.o_proj.weight"] = t["wo"]
        sd[f"{p}.post_attention_layernorm.weight"] = t["fn"]
        sd[f"{p}.post_attention_layernorm.bias"] = t["fnb"]
        sd[f"{p}.mlp.gate_proj.weight"] = t["wg"]
        sd[f"{p}.mlp.up_proj.weight"] = t["wu"]
        sd[f"{p}.mlp.down_proj.weight"] = t["wd"]
    cfg = ModelConfig(arch="orion", vocab_size=V, n_embd=d, n_layers=L,
                      n_heads=h, n_kv_heads=hk, head_dim=dh, n_ff=ff,
                      rope_dim=dh, n_ctx_train=128, norm_type="layer")
    path = tmp_path / "orion.gguf"
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="orion")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.norm_type == "layer"

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    with torch.no_grad():
        ref = _oracle_forward(
            {"emb": sd["model.embed_tokens.weight"], "layers": layers,
             "on": sd["model.norm.weight"], "onb": sd["model.norm.bias"],
             "head": sd["lm_head.weight"]},
            torch.tensor(tokens, dtype=torch.long),
            n_heads=h, n_kv_heads=hk, head_dim=dh, norm="layer",
            rope_dim=dh, interleaved=True,
        )
    np.testing.assert_allclose(run_fwd(params, lcfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)
