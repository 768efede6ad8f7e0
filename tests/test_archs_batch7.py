"""Arch batch 7: grok (78.38x embeddings, 0.0884 attention multiplier into a
30*tanh softcap, gelu MoE, post-attention/post-MoE out-norms, 0.577x logits
— build_grok src/llama.cpp) and bitnet (per-tensor ternary weight scales +
RMS sub-norms before wo / ffn_down, tied head — build_bitnet). Neither has a
usable transformers oracle (grok-1 is remote code; transformers' BitNet class
is the newer b1.58-2B-4T variant, not the fork's arch) — literal torch
oracles below implement the fork's graphs; GGUFs are written directly in the
reference tensor layout."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from eagle_tpu.gguf.constants import Keys
from eagle_tpu.gguf.writer import GGUFWriter
from eagle_tpu.models.loader import load_llama_params
from tests.test_archs_moe import _gated, _rms_t, run_fwd


def _hdr(w, arch, *, d, L, h, hk, dh, ff, V, extra=()):
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, "t")
    w.add(Keys.LLM.CONTEXT_LENGTH.format(arch=arch), 128)
    w.add(Keys.LLM.EMBEDDING_LENGTH.format(arch=arch), d)
    w.add(Keys.LLM.BLOCK_COUNT.format(arch=arch), L)
    w.add(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=arch), ff)
    w.add(Keys.LLM.VOCAB_SIZE.format(arch=arch), V)
    w.add(Keys.Attention.HEAD_COUNT.format(arch=arch), h)
    w.add(Keys.Attention.HEAD_COUNT_KV.format(arch=arch), hk)
    w.add(Keys.Attention.KEY_LENGTH.format(arch=arch), dh)
    w.add(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=arch), 1e-5)
    w.add(Keys.Rope.DIMENSION_COUNT.format(arch=arch), dh)
    w.add(Keys.Rope.FREQ_BASE.format(arch=arch), 10000.0)
    for key, val in extra:
        w.add(key, val)


def _r(*s):
    return torch.randn(*s) * 0.1


def _attn_neox(x, wq, wk, wv, h, hk, dh, scale, softcap=0.0):
    """NEOX (half-split, unpermuted) rope attention for direct-GGUF archs."""
    b, t, _ = x.shape
    q = (x @ wq.T).view(b, t, h, dh)
    k = (x @ wk.T).view(b, t, hk, dh)
    v = (x @ wv.T).view(b, t, hk, dh)
    pos = torch.arange(t, dtype=torch.float64)
    j = torch.arange(dh // 2, dtype=torch.float64)
    fr = pos[:, None] * (10000.0 ** (-2.0 * j / dh))[None, :]
    cos = fr.cos().float()[None, :, None, :]
    sin = fr.sin().float()[None, :, None, :]

    def rope(z):
        a, b2 = z[..., : dh // 2], z[..., dh // 2:]
        return torch.cat([a * cos - b2 * sin, a * sin + b2 * cos], dim=-1)

    q, k = rope(q), rope(k)
    k = k.repeat_interleave(h // hk, 2)
    v = v.repeat_interleave(h // hk, 2)
    sc = torch.einsum("bthd,bshd->bhts", q, k) * scale
    if softcap:
        sc = softcap * torch.tanh(sc / softcap)
    sc = sc.masked_fill(~torch.tril(torch.ones(sc.shape[-2:], dtype=torch.bool))[None, None],
                        float("-inf"))
    at = torch.einsum("bhts,bshd->bthd", sc.softmax(-1), v)
    return at.reshape(b, t, h * dh)


def test_grok_parity(tmp_path, rng):
    torch.manual_seed(101)
    d, ff, h, hk, dh, L, V, E, K = 32, 48, 4, 2, 8, 2, 128, 4, 2
    path = tmp_path / "grok.gguf"
    w = GGUFWriter(path)
    _hdr(w, "grok", d=d, L=L, h=h, hk=hk, dh=dh, ff=ff, V=V,
         extra=[("grok.expert_count", E), ("grok.expert_used_count", K)])
    sd = {}

    def put(name, t):
        sd[name] = t
        w.add_tensor(name, t.numpy().astype(np.float32))

    put("token_embd.weight", _r(V, d))
    put("output_norm.weight", 1 + 0.1 * torch.randn(d))
    put("output.weight", _r(V, d))
    for i in range(L):
        b = f"blk.{i}"
        put(f"{b}.attn_norm.weight", 1 + 0.1 * torch.randn(d))
        put(f"{b}.attn_q.weight", _r(h * dh, d))
        put(f"{b}.attn_k.weight", _r(hk * dh, d))
        put(f"{b}.attn_v.weight", _r(hk * dh, d))
        put(f"{b}.attn_output.weight", _r(d, h * dh))
        put(f"{b}.attn_output_norm.weight", 1 + 0.1 * torch.randn(d))
        put(f"{b}.ffn_norm.weight", 1 + 0.1 * torch.randn(d))
        put(f"{b}.layer_output_norm.weight", 1 + 0.1 * torch.randn(d))
        put(f"{b}.ffn_gate_inp.weight", _r(E, d))
        put(f"{b}.ffn_gate_exps.weight", _r(E, ff, d))
        put(f"{b}.ffn_up_exps.weight", _r(E, ff, d))
        put(f"{b}.ffn_down_exps.weight", _r(E, d, ff))
    w.write()

    params, cfg, _ = load_llama_params(path)
    assert cfg.attn_softcap == 30.0
    assert cfg.embd_scale == pytest.approx(78.38367176906169)
    assert cfg.logit_scale == pytest.approx(0.5773502691896257)
    assert cfg.act == "gelu"
    assert "post_attn_norm" in params["layers"]

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    with torch.no_grad():
        tk = torch.tensor(tokens, dtype=torch.long)
        x = sd["token_embd.weight"][tk] * 78.38367176906169
        gelu = lambda z: torch.nn.functional.gelu(z, approximate="tanh")
        for i in range(L):
            b = f"blk.{i}"
            hN = _rms_t(x, sd[f"{b}.attn_norm.weight"])
            at = _attn_neox(hN, sd[f"{b}.attn_q.weight"], sd[f"{b}.attn_k.weight"],
                            sd[f"{b}.attn_v.weight"], h, hk, dh,
                            scale=0.08838834764831845, softcap=30.0)
            ao = at @ sd[f"{b}.attn_output.weight"].T
            ao = _rms_t(ao, sd[f"{b}.attn_output_norm.weight"])
            x = x + ao
            hN = _rms_t(x, sd[f"{b}.ffn_norm.weight"])
            logits = hN @ sd[f"{b}.ffn_gate_inp.weight"].T
            top = logits.topk(K, dim=-1).values[..., -1:]
            pz = torch.where(logits >= top, logits,
                             torch.full((), float("-inf"))).softmax(-1)
            moe = torch.zeros_like(x)
            for e in range(E):
                moe = moe + pz[..., e:e + 1] * (
                    (gelu(hN @ sd[f"{b}.ffn_gate_exps.weight"][e].T)
                     * (hN @ sd[f"{b}.ffn_up_exps.weight"][e].T))
                    @ sd[f"{b}.ffn_down_exps.weight"][e].T)
            moe = _rms_t(moe, sd[f"{b}.layer_output_norm.weight"])
            x = x + moe
        x = _rms_t(x, sd["output_norm.weight"])
        ref = (x @ sd["output.weight"].T * 0.5773502691896257).numpy()

    np.testing.assert_allclose(run_fwd(params, cfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)


def test_bitnet_parity(tmp_path, rng):
    torch.manual_seed(102)
    d, ff, h, hk, dh, L, V = 32, 48, 4, 2, 8, 2, 128
    path = tmp_path / "bitnet.gguf"
    w = GGUFWriter(path)
    _hdr(w, "bitnet", d=d, L=L, h=h, hk=hk, dh=dh, ff=ff, V=V)
    sd = {}

    def put(name, t):
        sd[name] = t
        w.add_tensor(name, t.numpy().astype(np.float32))

    put("token_embd.weight", _r(V, d))
    put("output_norm.weight", 1 + 0.1 * torch.randn(d))
    # bitnet ties the head (build_bitnet uses tok_embd)
    for i in range(L):
        b = f"blk.{i}"
        put(f"{b}.attn_norm.weight", 1 + 0.1 * torch.randn(d))
        # ternary-ish weights with per-tensor scales
        put(f"{b}.attn_q.weight", torch.randint(-1, 2, (h * dh, d)).float())
        put(f"{b}.attn_q.scale", torch.tensor([0.03]))
        put(f"{b}.attn_k.weight", torch.randint(-1, 2, (hk * dh, d)).float())
        put(f"{b}.attn_k.scale", torch.tensor([0.04]))
        put(f"{b}.attn_v.weight", torch.randint(-1, 2, (hk * dh, d)).float())
        put(f"{b}.attn_v.scale", torch.tensor([0.05]))
        put(f"{b}.attn_sub_norm.weight", 1 + 0.1 * torch.randn(h * dh))
        put(f"{b}.attn_output.weight", torch.randint(-1, 2, (d, h * dh)).float())
        put(f"{b}.attn_output.scale", torch.tensor([0.06]))
        put(f"{b}.ffn_norm.weight", 1 + 0.1 * torch.randn(d))
        put(f"{b}.ffn_gate.weight", torch.randint(-1, 2, (ff, d)).float())
        put(f"{b}.ffn_gate.scale", torch.tensor([0.07]))
        put(f"{b}.ffn_up.weight", torch.randint(-1, 2, (ff, d)).float())
        put(f"{b}.ffn_up.scale", torch.tensor([0.08]))
        put(f"{b}.ffn_sub_norm.weight", 1 + 0.1 * torch.randn(ff))
        put(f"{b}.ffn_down.weight", torch.randint(-1, 2, (d, ff)).float())
        put(f"{b}.ffn_down.scale", torch.tensor([0.09]))
    w.write()

    params, cfg, _ = load_llama_params(path)
    assert "attn_sub_norm" in params["layers"]
    assert "wq_s" in params["layers"] and "w_down_s" in params["layers"]

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    with torch.no_grad():
        tk = torch.tensor(tokens, dtype=torch.long)
        x = sd["token_embd.weight"][tk]
        for i in range(L):
            b = f"blk.{i}"
            hN = _rms_t(x, sd[f"{b}.attn_norm.weight"])
            at = _attn_neox(hN, sd[f"{b}.attn_q.weight"] * 0.03,
                            sd[f"{b}.attn_k.weight"] * 0.04,
                            sd[f"{b}.attn_v.weight"] * 0.05,
                            h, hk, dh, scale=1 / math.sqrt(dh))
            at = _rms_t(at, sd[f"{b}.attn_sub_norm.weight"])
            x = x + (at @ sd[f"{b}.attn_output.weight"].T) * 0.06
            hN = _rms_t(x, sd[f"{b}.ffn_norm.weight"])
            hidden = (torch.nn.functional.silu(hN @ sd[f"{b}.ffn_gate.weight"].T * 0.07)
                      * (hN @ sd[f"{b}.ffn_up.weight"].T * 0.08))
            hidden = _rms_t(hidden, sd[f"{b}.ffn_sub_norm.weight"])
            x = x + (hidden @ sd[f"{b}.ffn_down.weight"].T) * 0.09
        x = _rms_t(x, sd["output_norm.weight"])
        ref = (x @ sd["token_embd.weight"].T).numpy()

    np.testing.assert_allclose(run_fwd(params, cfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)


def test_phimoe_parity(tmp_path, rng):
    """phimoe routes to build_phi3's MoE branch in the reference
    (llama-arch.cpp:594 table) — but the fork's mixtral softmax-topk routing
    is an approximation: HF Phimoe routes with sparsemixer
    (modeling_phimoe.sparsemixer), which this implementation matches exactly;
    the oracle below calls the transformers sparsemixer itself. (Norm
    structure still follows the fork: RMS rather than HF's LayerNorm.)"""
    torch.manual_seed(103)
    d, ffe, h, hk, dh, L, V, E, K = 32, 24, 4, 2, 8, 2, 128, 4, 2
    path = tmp_path / "phimoe.gguf"
    w = GGUFWriter(path)
    _hdr(w, "phimoe", d=d, L=L, h=h, hk=hk, dh=dh, ff=ffe, V=V,
         extra=[("phimoe.expert_count", E), ("phimoe.expert_used_count", K)])
    sd = {}

    def put(name, t):
        sd[name] = t
        w.add_tensor(name, t.numpy().astype(np.float32))

    put("token_embd.weight", _r(V, d))
    put("output_norm.weight", 1 + 0.1 * torch.randn(d))
    put("output.weight", _r(V, d))
    for i in range(L):
        b = f"blk.{i}"
        put(f"{b}.attn_norm.weight", 1 + 0.1 * torch.randn(d))
        put(f"{b}.attn_q.weight", _r(h * dh, d))
        put(f"{b}.attn_k.weight", _r(hk * dh, d))
        put(f"{b}.attn_v.weight", _r(hk * dh, d))
        put(f"{b}.attn_output.weight", _r(d, h * dh))
        put(f"{b}.ffn_norm.weight", 1 + 0.1 * torch.randn(d))
        put(f"{b}.ffn_gate_inp.weight", _r(E, d))
        put(f"{b}.ffn_gate_exps.weight", _r(E, ffe, d))
        put(f"{b}.ffn_up_exps.weight", _r(E, ffe, d))
        put(f"{b}.ffn_down_exps.weight", _r(E, d, ffe))
    w.write()

    params, cfg, _ = load_llama_params(path)
    assert cfg.moe_sparsemixer and cfg.router_jitter == 0.01

    tokens = rng.integers(0, V, size=(1, 9)).astype(np.int32)
    with torch.no_grad():
        tk = torch.tensor(tokens, dtype=torch.long)
        x = sd["token_embd.weight"][tk]
        for i in range(L):
            b = f"blk.{i}"
            hN = _rms_t(x, sd[f"{b}.attn_norm.weight"])
            at = _attn_neox(hN, sd[f"{b}.attn_q.weight"], sd[f"{b}.attn_k.weight"],
                            sd[f"{b}.attn_v.weight"], h, hk, dh,
                            scale=1 / math.sqrt(dh))
            x = x + at @ sd[f"{b}.attn_output.weight"].T
            hN = _rms_t(x, sd[f"{b}.ffn_norm.weight"])
            logits = hN @ sd[f"{b}.ffn_gate_inp.weight"].T
            from transformers.models.phimoe.modeling_phimoe import sparsemixer
            mult, sel = sparsemixer(logits, jitter_eps=0.01, training=False)
            pz = torch.zeros_like(logits).scatter(-1, sel, mult)
            moe = torch.zeros_like(x)
            for e in range(E):
                moe = moe + pz[..., e:e + 1] * _gated(
                    hN, sd[f"{b}.ffn_gate_exps.weight"][e],
                    sd[f"{b}.ffn_up_exps.weight"][e],
                    sd[f"{b}.ffn_down_exps.weight"][e])
            x = x + moe
        x = _rms_t(x, sd["output_norm.weight"])
        ref = (x @ sd["output.weight"].T).numpy()

    np.testing.assert_allclose(run_fwd(params, cfg, tokens), ref,
                               atol=3e-3, rtol=1e-2)


def test_sparsemixer_probs_matches_transformers(rng):
    """_sparsemixer_probs == transformers sparsemixer (inference path) on
    fuzzed scores, including near-tie rows where the 2*jitter_eps mask
    actually retains competitors (the branch that distinguishes sparsemixer
    from mixtral's softmax-over-top-k)."""
    from eagle_tpu.models.llama import _sparsemixer_probs

    from transformers.models.phimoe.modeling_phimoe import sparsemixer

    E = 16
    base = rng.standard_normal((64, E)).astype(np.float32)
    ties = base.copy()
    # force near-ties: second expert within jitter range of the max
    mx = ties.max(-1)
    ties[np.arange(64), rng.integers(0, E, 64)] = mx * (1 - 1e-3)
    for scores in (base, ties, 0.01 * base):
        t = torch.tensor(scores)
        mult, sel = sparsemixer(t, jitter_eps=0.01, training=False)
        ref = torch.zeros_like(t).scatter(-1, sel, mult).numpy()
        got = np.asarray(_sparsemixer_probs(jnp.asarray(scores), 2, 0.01))
        np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-5)
