"""Heterogeneous-layer archs: openelm (per-layer NAS head counts + FFN
widths, fused qkv, per-head q/k RMS norms — build_openelm) and deci
(per-layer GQA incl. Nemotron-51B's attention-free and linear-attention
layers — build_deci). Layers run as per-layer groups over a max-width KV
cache. Literal torch oracles (no transformers classes for either)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from eagle_tpu.gguf.constants import Keys
from eagle_tpu.gguf.writer import GGUFWriter
from eagle_tpu.models.loader import load_llama_params
from tests.test_archs_batch7 import _attn_neox, _r
from tests.test_archs_moe import _gated, _rms_t, run_fwd


def _hdr(w, arch, *, d, L, hs, kvs, dh, ffs, V):
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, "t")
    w.add(Keys.LLM.CONTEXT_LENGTH.format(arch=arch), 128)
    w.add(Keys.LLM.EMBEDDING_LENGTH.format(arch=arch), d)
    w.add(Keys.LLM.BLOCK_COUNT.format(arch=arch), L)
    w.add(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=arch), list(ffs))
    w.add(Keys.LLM.VOCAB_SIZE.format(arch=arch), V)
    w.add(Keys.Attention.HEAD_COUNT.format(arch=arch), list(hs))
    w.add(Keys.Attention.HEAD_COUNT_KV.format(arch=arch), list(kvs))
    w.add(Keys.Attention.KEY_LENGTH.format(arch=arch), dh)
    w.add(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=arch), 1e-5)
    w.add(Keys.Rope.DIMENSION_COUNT.format(arch=arch), dh)
    w.add(Keys.Rope.FREQ_BASE.format(arch=arch), 10000.0)


def test_openelm_hetero_parity(tmp_path, rng):
    torch.manual_seed(111)
    d, dh, L, V = 32, 8, 2, 128
    hs, kvs, ffs = [2, 4], [1, 2], [48, 64]
    path = tmp_path / "openelm.gguf"
    w = GGUFWriter(path)
    _hdr(w, "openelm", d=d, L=L, hs=hs, kvs=kvs, dh=dh, ffs=ffs, V=V)
    sd = {}

    def put(name, t):
        sd[name] = t
        w.add_tensor(name, t.numpy().astype(np.float32))

    put("token_embd.weight", _r(V, d))
    put("output_norm.weight", 1 + 0.1 * torch.randn(d))
    for i in range(L):
        b, h, hk, ff = f"blk.{i}", hs[i], kvs[i], ffs[i]
        put(f"{b}.attn_norm.weight", 1 + 0.1 * torch.randn(d))
        put(f"{b}.attn_qkv.weight", _r((h + 2 * hk) * dh, d))
        put(f"{b}.attn_q_norm.weight", 1 + 0.2 * torch.randn(dh))
        put(f"{b}.attn_k_norm.weight", 1 + 0.2 * torch.randn(dh))
        put(f"{b}.attn_output.weight", _r(d, h * dh))
        put(f"{b}.ffn_norm.weight", 1 + 0.1 * torch.randn(d))
        put(f"{b}.ffn_gate.weight", _r(ff, d))
        put(f"{b}.ffn_up.weight", _r(ff, d))
        put(f"{b}.ffn_down.weight", _r(d, ff))
    w.write()

    params, cfg, _ = load_llama_params(path)
    assert cfg.head_counts == (2, 4) and cfg.kv_head_counts == (1, 2)
    assert cfg.n_heads == 4 and cfg.n_kv_heads == 2  # max (cache alloc)
    assert "hetero" in params and "wqkv" in params["hetero"][0]

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    with torch.no_grad():
        tk = torch.tensor(tokens, dtype=torch.long)
        x = sd["token_embd.weight"][tk]
        for i in range(L):
            b, h, hk = f"blk.{i}", hs[i], kvs[i]
            hN = _rms_t(x, sd[f"{b}.attn_norm.weight"])
            qkv = hN @ sd[f"{b}.attn_qkv.weight"].T
            q, k, v = qkv.split([h * dh, hk * dh, hk * dh], dim=-1)
            B, T = tk.shape
            q = _rms_t(q.view(B, T, h, dh), sd[f"{b}.attn_q_norm.weight"])
            k = _rms_t(k.view(B, T, hk, dh), sd[f"{b}.attn_k_norm.weight"])
            # NEOX rope (same freqs as _attn_neox)
            pos = torch.arange(T, dtype=torch.float64)
            j = torch.arange(dh // 2, dtype=torch.float64)
            fr = pos[:, None] * (10000.0 ** (-2.0 * j / dh))[None, :]
            cos = fr.cos().float()[None, :, None, :]
            sin = fr.sin().float()[None, :, None, :]

            def rope(z):
                a, b2 = z[..., : dh // 2], z[..., dh // 2:]
                return torch.cat([a * cos - b2 * sin, a * sin + b2 * cos], -1)

            q, k = rope(q), rope(k)
            k = k.repeat_interleave(h // hk, 2)
            vv = v.view(B, T, hk, dh).repeat_interleave(h // hk, 2)
            sc = torch.einsum("bthd,bshd->bhts", q, k) / math.sqrt(dh)
            sc = sc.masked_fill(
                ~torch.tril(torch.ones(T, T, dtype=torch.bool))[None, None],
                float("-inf"))
            at = torch.einsum("bhts,bshd->bthd", sc.softmax(-1), vv)
            x = x + at.reshape(B, T, h * dh) @ sd[f"{b}.attn_output.weight"].T
            hN = _rms_t(x, sd[f"{b}.ffn_norm.weight"])
            x = x + _gated(hN, sd[f"{b}.ffn_gate.weight"], sd[f"{b}.ffn_up.weight"],
                           sd[f"{b}.ffn_down.weight"])
        x = _rms_t(x, sd["output_norm.weight"])
        ref = (x @ sd["token_embd.weight"].T).numpy()  # tied head

    np.testing.assert_allclose(run_fwd(params, cfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)


def test_deci_hetero_parity(tmp_path, rng):
    """deci layer zoo: layer0 normal GQA, layer1 attention-free (heads 0),
    layer2 linear attention (kv 0, wo only) — build_deci's three arms."""
    torch.manual_seed(112)
    d, dh, L, V = 32, 8, 3, 128
    hs, kvs, ffs = [4, 0, 4], [2, 0, 0], [48, 64, 48]
    path = tmp_path / "deci.gguf"
    w = GGUFWriter(path)
    _hdr(w, "deci", d=d, L=L, hs=hs, kvs=kvs, dh=dh, ffs=ffs, V=V)
    sd = {}

    def put(name, t):
        sd[name] = t
        w.add_tensor(name, t.numpy().astype(np.float32))

    put("token_embd.weight", _r(V, d))
    put("output_norm.weight", 1 + 0.1 * torch.randn(d))
    put("output.weight", _r(V, d))
    for i in range(L):
        b, h, hk, ff = f"blk.{i}", hs[i], kvs[i], ffs[i]
        if h > 0:
            put(f"{b}.attn_norm.weight", 1 + 0.1 * torch.randn(d))
            put(f"{b}.attn_output.weight",
                _r(d, h * dh) if hk > 0 else _r(d, d))
        if h > 0 and hk > 0:
            # deci permutes q/k rows like llama (NORM rope): store permuted
            from eagle_tpu.models.hf_convert import permute_rows

            wq = _r(h * dh, d)
            wk = _r(hk * dh, d)
            sd[f"{b}.attn_q.weight.orig"] = wq
            sd[f"{b}.attn_k.weight.orig"] = wk
            put(f"{b}.attn_q.weight",
                torch.tensor(wq.numpy()[permute_rows(h * dh, h)]))
            put(f"{b}.attn_k.weight",
                torch.tensor(wk.numpy()[permute_rows(hk * dh, hk)]))
            put(f"{b}.attn_v.weight", _r(hk * dh, d))
        put(f"{b}.ffn_norm.weight", 1 + 0.1 * torch.randn(d))
        put(f"{b}.ffn_gate.weight", _r(ff, d))
        put(f"{b}.ffn_up.weight", _r(ff, d))
        put(f"{b}.ffn_down.weight", _r(d, ff))
    w.write()

    params, cfg, _ = load_llama_params(path)
    assert cfg.head_counts == (4, 0, 4) and cfg.kv_head_counts == (2, 0, 0)
    assert "wq" not in params["hetero"][1]  # attention-free layer

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    with torch.no_grad():
        tk = torch.tensor(tokens, dtype=torch.long)
        x = sd["token_embd.weight"][tk]
        B, T = tk.shape
        for i in range(L):
            b, h, hk, ff = f"blk.{i}", hs[i], kvs[i], ffs[i]
            if h > 0 and hk > 0:
                hN = _rms_t(x, sd[f"{b}.attn_norm.weight"])
                at = _attn_neox(  # loader unpermutes -> HF half-split rope
                    hN, sd[f"{b}.attn_q.weight.orig"],
                    sd[f"{b}.attn_k.weight.orig"], sd[f"{b}.attn_v.weight"],
                    h, hk, dh, scale=1 / math.sqrt(dh))
                x = x + at @ sd[f"{b}.attn_output.weight"].T
            elif h > 0:  # linear attention
                hN = _rms_t(x, sd[f"{b}.attn_norm.weight"])
                x = x + hN @ sd[f"{b}.attn_output.weight"].T
            hN = _rms_t(x, sd[f"{b}.ffn_norm.weight"])
            x = x + _gated(hN, sd[f"{b}.ffn_gate.weight"], sd[f"{b}.ffn_up.weight"],
                           sd[f"{b}.ffn_down.weight"])
        x = _rms_t(x, sd["output_norm.weight"])
        ref = (x @ sd["output.weight"].T).numpy()

    np.testing.assert_allclose(run_fwd(params, cfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)
