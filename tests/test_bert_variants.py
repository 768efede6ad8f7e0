"""nomic-bert (NEOX rope, fused biasless qkv, silu-gated FFN) and
jina-bert-v2 (ALiBi, gelu-gated FFN with down bias) — build_bert's variant
arms (src/llama.cpp:3005-3196). No transformers classes exist (remote code
upstream); literal torch oracles below implement the block math."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.bert import bert_forward
from eagle_tpu.models.config import ModelConfig
from eagle_tpu.models.hf_convert import convert_hf_to_gguf
from eagle_tpu.models.llama import alibi_slopes
from eagle_tpu.models.loader import load_llama_params

D, FF, H, DH, L, V = 32, 64, 4, 8, 2, 128


def _r(*s):
    return torch.randn(*s) * 0.1


def _ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdim=True)
    xc = x - mu
    return xc / (xc.pow(2).mean(-1, keepdim=True) + eps).sqrt() * w + b


def _rope_half(z, base=10000.0):
    b, t, h, dh = z.shape
    pos = torch.arange(t, dtype=torch.float64)
    j = torch.arange(dh // 2, dtype=torch.float64)
    fr = pos[:, None] * (base ** (-2.0 * j / dh))[None, :]
    cos = fr.cos().float()[None, :, None, :]
    sin = fr.sin().float()[None, :, None, :]
    a, b2 = z[..., : dh // 2], z[..., dh // 2:]
    return torch.cat([a * cos - b2 * sin, a * sin + b2 * cos], dim=-1)


def _attn(q, k, v, alibi=None):
    b, t = q.shape[:2]
    sc = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(DH)
    if alibi is not None:
        sc = sc + alibi[None, :, None, None] * torch.arange(t).float()[None, None, None, :]
    at = torch.einsum("bhqk,bkhd->bqhd", sc.softmax(-1), v)
    return at.reshape(b, t, D)


def test_nomic_bert_parity(tmp_path, rng):
    torch.manual_seed(91)
    sd = {
        "embeddings.word_embeddings.weight": _r(V, D),
        "embeddings.token_type_embeddings.weight": _r(2, D),
        "emb_ln.weight": 1 + 0.1 * torch.randn(D),
        "emb_ln.bias": 0.1 * torch.randn(D),
    }
    for i in range(L):
        p = f"encoder.layers.{i}"
        sd[f"{p}.attn.Wqkv.weight"] = _r(3 * D, D)
        sd[f"{p}.attn.out_proj.weight"] = _r(D, D)
        sd[f"{p}.norm1.weight"] = 1 + 0.1 * torch.randn(D)
        sd[f"{p}.norm1.bias"] = 0.1 * torch.randn(D)
        sd[f"{p}.mlp.fc11.weight"] = _r(FF, D)  # up
        sd[f"{p}.mlp.fc12.weight"] = _r(FF, D)  # gate
        sd[f"{p}.mlp.fc2.weight"] = _r(D, FF)
        sd[f"{p}.norm2.weight"] = 1 + 0.1 * torch.randn(D)
        sd[f"{p}.norm2.bias"] = 0.1 * torch.randn(D)
    cfg = ModelConfig(arch="nomic-bert", vocab_size=V, n_embd=D, n_layers=L,
                      n_heads=H, n_kv_heads=H, head_dim=DH, n_ff=FF,
                      rope_dim=DH, n_ctx_train=256, norm_type="layer")
    path = tmp_path / "nomic.gguf"
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="nomic-bert")
    params, lcfg, _ = load_llama_params(path)
    assert "wqkv" in params["layers"] and "pos_embd" not in params

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    out = bert_forward(params, lcfg, jnp.asarray(tokens),
                       jnp.asarray([9], jnp.int32), pooling="none")

    with torch.no_grad():
        tk = torch.tensor(tokens, dtype=torch.long)
        x = sd["embeddings.word_embeddings.weight"][tk]
        x = x + sd["embeddings.token_type_embeddings.weight"][0]
        x = _ln(x, sd["emb_ln.weight"], sd["emb_ln.bias"])
        b, t = tk.shape
        for i in range(L):
            p = f"encoder.layers.{i}"
            qkv = x @ sd[f"{p}.attn.Wqkv.weight"].T
            q, k, v = qkv.split(D, dim=-1)
            q = _rope_half(q.view(b, t, H, DH))
            k = _rope_half(k.view(b, t, H, DH))
            ao = _attn(q, k, v.view(b, t, H, DH)) @ sd[f"{p}.attn.out_proj.weight"].T
            x = _ln(x + ao, sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"])
            ffn = (torch.nn.functional.silu(x @ sd[f"{p}.mlp.fc12.weight"].T)
                   * (x @ sd[f"{p}.mlp.fc11.weight"].T)) @ sd[f"{p}.mlp.fc2.weight"].T
            x = _ln(x + ffn, sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"])
        ref = x.numpy()
    np.testing.assert_allclose(np.asarray(out.hidden), ref, atol=3e-3, rtol=1e-2)


def test_jina_bert_v2_parity(tmp_path, rng):
    torch.manual_seed(92)
    sd = {
        "embeddings.word_embeddings.weight": _r(V, D),
        "embeddings.token_type_embeddings.weight": _r(2, D),
        "embeddings.LayerNorm.weight": 1 + 0.1 * torch.randn(D),
        "embeddings.LayerNorm.bias": 0.1 * torch.randn(D),
    }
    for i in range(L):
        p = f"encoder.layer.{i}"
        for nm in ("query", "key", "value"):
            sd[f"{p}.attention.self.{nm}.weight"] = _r(D, D)
            sd[f"{p}.attention.self.{nm}.bias"] = 0.1 * torch.randn(D)
        sd[f"{p}.attention.output.dense.weight"] = _r(D, D)
        sd[f"{p}.attention.output.dense.bias"] = 0.1 * torch.randn(D)
        sd[f"{p}.attention.output.LayerNorm.weight"] = 1 + 0.1 * torch.randn(D)
        sd[f"{p}.attention.output.LayerNorm.bias"] = 0.1 * torch.randn(D)
        sd[f"{p}.mlp.gated_layers_w.weight"] = _r(FF, D)  # gate
        sd[f"{p}.mlp.gated_layers_v.weight"] = _r(FF, D)  # up
        sd[f"{p}.mlp.wo.weight"] = _r(D, FF)
        sd[f"{p}.mlp.wo.bias"] = 0.1 * torch.randn(D)
        sd[f"{p}.mlp.layernorm.weight"] = 1 + 0.1 * torch.randn(D)
        sd[f"{p}.mlp.layernorm.bias"] = 0.1 * torch.randn(D)
    cfg = ModelConfig(arch="jina-bert-v2", vocab_size=V, n_embd=D, n_layers=L,
                      n_heads=H, n_kv_heads=H, head_dim=DH, n_ff=FF,
                      rope_dim=0, n_ctx_train=256, norm_type="layer",
                      use_alibi=True, act="gelu")
    path = tmp_path / "jina.gguf"
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="jina-bert-v2")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.use_alibi and lcfg.act == "gelu"
    assert "w_gate" in params["layers"] and "b_down" in params["layers"]

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    out = bert_forward(params, lcfg, jnp.asarray(tokens),
                       jnp.asarray([9], jnp.int32), pooling="none")

    slopes = torch.tensor(alibi_slopes(H))
    with torch.no_grad():
        tk = torch.tensor(tokens, dtype=torch.long)
        x = sd["embeddings.word_embeddings.weight"][tk]
        x = x + sd["embeddings.token_type_embeddings.weight"][0]
        x = _ln(x, sd["embeddings.LayerNorm.weight"], sd["embeddings.LayerNorm.bias"])
        b, t = tk.shape
        for i in range(L):
            p = f"encoder.layer.{i}"
            q = (x @ sd[f"{p}.attention.self.query.weight"].T
                 + sd[f"{p}.attention.self.query.bias"]).view(b, t, H, DH)
            k = (x @ sd[f"{p}.attention.self.key.weight"].T
                 + sd[f"{p}.attention.self.key.bias"]).view(b, t, H, DH)
            v = (x @ sd[f"{p}.attention.self.value.weight"].T
                 + sd[f"{p}.attention.self.value.bias"]).view(b, t, H, DH)
            ao = _attn(q, k, v, alibi=slopes) @ sd[f"{p}.attention.output.dense.weight"].T
            ao = ao + sd[f"{p}.attention.output.dense.bias"]
            x = _ln(x + ao, sd[f"{p}.attention.output.LayerNorm.weight"],
                    sd[f"{p}.attention.output.LayerNorm.bias"])
            ffn = (torch.nn.functional.gelu(x @ sd[f"{p}.mlp.gated_layers_w.weight"].T)
                   * (x @ sd[f"{p}.mlp.gated_layers_v.weight"].T)) @ sd[f"{p}.mlp.wo.weight"].T
            ffn = ffn + sd[f"{p}.mlp.wo.bias"]
            x = _ln(x + ffn, sd[f"{p}.mlp.layernorm.weight"],
                    sd[f"{p}.mlp.layernorm.bias"])
        ref = x.numpy()
    np.testing.assert_allclose(np.asarray(out.hidden), ref, atol=3e-3, rtol=1e-2)
