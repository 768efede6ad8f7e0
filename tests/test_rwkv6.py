"""RWKV6 (Finch): parity vs a literal torch implementation of the official
rwkv6 block math, through the GGUF converter + loader (reference
build_rwkv6 / llm_build_rwkv6_time_mix / wkv6 kernel semantics,
src/llama.cpp:7942,1034 and ggml-cpu.c:12059). Also checks the constant-size
state handoff (chunked prefill == full prefill) and the rescale-every
fp16 trick's mathematical neutrality."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.config import ModelConfig
from eagle_tpu.models.hf_convert import convert_hf_to_gguf
from eagle_tpu.models.loader import load_llama_params
from eagle_tpu.models.rwkv6 import Rwkv6State, rwkv6_forward

D, FF, DH, H, L, V = 32, 96, 8, 4, 3, 128
EXT, EXT2 = 8, 16


def _make_sd(seed):
    torch.manual_seed(seed)

    def r(*s):
        return torch.randn(*s) * 0.1

    sd = {"rwkv.embeddings.weight": r(V, D),
          "rwkv.ln_out.weight": 1 + 0.1 * torch.randn(D),
          "rwkv.ln_out.bias": 0.1 * torch.randn(D),
          "head.weight": r(V, D),
          "rwkv.blocks.0.pre_ln.weight": 1 + 0.1 * torch.randn(D),
          "rwkv.blocks.0.pre_ln.bias": 0.1 * torch.randn(D)}
    for i in range(L):
        p = f"rwkv.blocks.{i}"
        sd[f"{p}.ln1.weight"] = 1 + 0.1 * torch.randn(D)
        sd[f"{p}.ln1.bias"] = 0.1 * torch.randn(D)
        sd[f"{p}.ln2.weight"] = 1 + 0.1 * torch.randn(D)
        sd[f"{p}.ln2.bias"] = 0.1 * torch.randn(D)
        a = f"{p}.attention"
        sd[f"{a}.time_maa_x"] = 0.5 + 0.1 * torch.randn(1, 1, D)
        for part in "wkvrg":
            sd[f"{a}.time_maa_{part}"] = 0.5 + 0.1 * torch.randn(1, 1, D)
        sd[f"{a}.time_maa_w1"] = r(D, 5 * EXT)
        sd[f"{a}.time_maa_w2"] = r(5, EXT, D)
        sd[f"{a}.time_decay"] = 0.5 * torch.randn(1, 1, D)
        sd[f"{a}.time_decay_w1"] = r(D, EXT2)
        sd[f"{a}.time_decay_w2"] = r(EXT2, D)
        sd[f"{a}.time_faaaa"] = 0.3 * torch.randn(H, DH)
        for nm in ("key", "value", "receptance", "gate", "output"):
            sd[f"{a}.{nm}.weight"] = r(D, D)
        sd[f"{a}.ln_x.weight"] = 1 + 0.1 * torch.randn(D)
        sd[f"{a}.ln_x.bias"] = 0.1 * torch.randn(D)
        f = f"{p}.feed_forward"
        sd[f"{f}.time_maa_k"] = 0.5 + 0.1 * torch.randn(1, 1, D)
        sd[f"{f}.time_maa_r"] = 0.5 + 0.1 * torch.randn(1, 1, D)
        sd[f"{f}.key.weight"] = r(FF, D)
        sd[f"{f}.receptance.weight"] = r(D, D)
        sd[f"{f}.value.weight"] = r(D, FF)
    return sd


def _ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdim=True)
    xc = x - mu
    return xc / (xc.pow(2).mean(-1, keepdim=True) + eps).sqrt() * w + b


def _oracle(sd, tokens):
    """Official rwkv6 inference math (no rescale trick), float64-free torch."""
    tk = torch.tensor(tokens, dtype=torch.long)
    x = sd["rwkv.embeddings.weight"][tk]
    x = _ln(x, sd["rwkv.blocks.0.pre_ln.weight"], sd["rwkv.blocks.0.pre_ln.bias"])
    B, T = tk.shape
    for i in range(L):
        p = f"rwkv.blocks.{i}"
        a = f"{p}.attention"
        xa = _ln(x, sd[f"{p}.ln1.weight"], sd[f"{p}.ln1.bias"])
        prev = torch.cat([torch.zeros(B, 1, D), xa[:, :-1]], dim=1)
        sx = prev - xa
        xxx = xa + sx * sd[f"{a}.time_maa_x"]
        inner = torch.tanh(xxx @ sd[f"{a}.time_maa_w1"]).view(B, T, 5, EXT)
        mixed = {}
        for j, part in enumerate("wkvrg"):
            delta = inner[:, :, j] @ sd[f"{a}.time_maa_w2"][j]
            mixed[part] = xa + sx * (sd[f"{a}.time_maa_{part}"] + delta)
        r = (mixed["r"] @ sd[f"{a}.receptance.weight"].T).view(B, T, H, DH)
        k = (mixed["k"] @ sd[f"{a}.key.weight"].T).view(B, T, H, DH)
        v = (mixed["v"] @ sd[f"{a}.value.weight"].T).view(B, T, H, DH)
        g = torch.nn.functional.silu(mixed["g"] @ sd[f"{a}.gate.weight"].T)
        w = sd[f"{a}.time_decay"] + torch.tanh(
            mixed["w"] @ sd[f"{a}.time_decay_w1"]) @ sd[f"{a}.time_decay_w2"]
        w = torch.exp(-torch.exp(w)).view(B, T, H, DH)
        u = sd[f"{a}.time_faaaa"]
        S = torch.zeros(B, H, DH, DH)
        ys = []
        for t in range(T):
            kv = k[:, t, :, :, None] * v[:, t, :, None, :]  # [B,H,dh,dh]
            y = ((S + u[None, :, :, None] * kv) * r[:, t, :, :, None]).sum(-2)
            S = S * w[:, t, :, :, None] + kv
            ys.append(y)
        y = torch.stack(ys, dim=1).reshape(B, T, D)
        # GroupNorm(H groups, eps 64e-5) + ln_x affine
        yh = y.view(B, T, H, DH)
        mu = yh.mean(-1, keepdim=True)
        yc = yh - mu
        yh = yc / (yc.pow(2).mean(-1, keepdim=True) + 64e-5).sqrt()
        y = yh.reshape(B, T, D) * sd[f"{a}.ln_x.weight"] + sd[f"{a}.ln_x.bias"]
        x = x + (y * g) @ sd[f"{a}.output.weight"].T

        f = f"{p}.feed_forward"
        xf = _ln(x, sd[f"{p}.ln2.weight"], sd[f"{p}.ln2.bias"])
        prev = torch.cat([torch.zeros(B, 1, D), xf[:, :-1]], dim=1)
        sx = prev - xf
        xk = xf + sx * sd[f"{f}.time_maa_k"]
        xr = xf + sx * sd[f"{f}.time_maa_r"]
        rr = torch.sigmoid(xr @ sd[f"{f}.receptance.weight"].T)
        kk = torch.relu(xk @ sd[f"{f}.key.weight"].T).pow(2)
        x = x + rr * (kk @ sd[f"{f}.value.weight"].T)
    x = _ln(x, sd["rwkv.ln_out.weight"], sd["rwkv.ln_out.bias"])
    return (x @ sd["head.weight"].T).numpy()


def _cfg(rescale=0):
    return ModelConfig(
        arch="rwkv6", vocab_size=V, n_embd=D, n_layers=L, n_heads=0,
        n_kv_heads=0, head_dim=DH, n_ff=FF, rope_dim=0, n_ctx_train=1 << 20,
        wkv_head_size=DH, rescale_every=rescale, norm_type="layer",
    )


@pytest.fixture(scope="module")
def rwkv_gguf(tmp_path_factory):
    sd = _make_sd(61)
    path = tmp_path_factory.mktemp("rwkv") / "rwkv6.gguf"
    convert_hf_to_gguf({k: v.numpy() for k, v in sd.items()}, _cfg(), path,
                       qtype=GGMLType.F32, arch="rwkv6")
    return sd, str(path)


def test_rwkv6_parity(rwkv_gguf, rng):
    sd, path = rwkv_gguf
    params, cfg, _ = load_llama_params(path)
    assert cfg.wkv_head_size == DH and cfg.is_recurrent

    tokens = rng.integers(0, V, size=(2, 11)).astype(np.int32)
    state = Rwkv6State.create(cfg, 2)
    out = rwkv6_forward(params, cfg, jnp.asarray(tokens), state)
    with torch.no_grad():
        ref = _oracle(sd, tokens)
    np.testing.assert_allclose(np.asarray(out.logits), ref, atol=3e-3, rtol=1e-2)


def test_rwkv6_state_handoff(rwkv_gguf, rng):
    """Chunked prefill with carried state must equal one full forward —
    the recurrent-family invariant the generator relies on."""
    sd, path = rwkv_gguf
    params, cfg, _ = load_llama_params(path)
    tokens = rng.integers(0, V, size=(1, 12)).astype(np.int32)

    full = rwkv6_forward(params, cfg, jnp.asarray(tokens), Rwkv6State.create(cfg, 1))
    st = Rwkv6State.create(cfg, 1)
    outs = []
    for lo, hi in ((0, 5), (5, 9), (9, 12)):
        o = rwkv6_forward(params, cfg, jnp.asarray(tokens[:, lo:hi]), st)
        st = o.state
        outs.append(np.asarray(o.logits))
    np.testing.assert_allclose(
        np.concatenate(outs, axis=1), np.asarray(full.logits), atol=1e-4, rtol=1e-4
    )
    for leaf_a, leaf_b in zip(
        (st.shift_att, st.shift_ffn, st.wkv),
        (full.state.shift_att, full.state.shift_ffn, full.state.wkv),
    ):
        np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b),
                                   atol=1e-4, rtol=1e-4)


def test_rwkv6_rescale_is_neutral(tmp_path, rng):
    """rescale_every pre-divides output weights and halves activations —
    a pure fp-range trick; logits must match the unscaled math."""
    sd = _make_sd(62)
    path = tmp_path / "rwkv6_rescale.gguf"
    convert_hf_to_gguf({k: v.numpy() for k, v in sd.items()}, _cfg(rescale=2),
                       path, qtype=GGMLType.F32, arch="rwkv6")
    params, cfg, _ = load_llama_params(path)
    assert cfg.rescale_every == 2

    tokens = rng.integers(0, V, size=(1, 7)).astype(np.int32)
    out = rwkv6_forward(params, cfg, jnp.asarray(tokens), Rwkv6State.create(cfg, 1))
    with torch.no_grad():
        ref = _oracle(sd, tokens)
    # the residual stream is rescaled 1/2^(l//2); the FINAL LayerNorm removes
    # the overall scale, so logits match the plain math
    np.testing.assert_allclose(np.asarray(out.logits), ref, atol=3e-3, rtol=1e-2)


def test_rwkv6qwen2_hybrid(tmp_path, rng):
    """rwkv6qwen2 (build_rwkv6qwen2): qwen2 RMS/gated-FFN structure with the
    time-mix in qrwkv mode — no time_first u (gated linear attention with
    dh^-0.5 scaling), sigmoid gate, k*(1-w), GQA kv repeat, r/k/v biases, no
    group norm. GGUF written directly (the reference's RWKV6Qwen2 converter
    is commented out upstream; runtime support is the parity surface)."""
    from eagle_tpu.gguf.writer import GGUFWriter
    from eagle_tpu.gguf.constants import Keys

    torch.manual_seed(63)
    d, dh, hq, hkv, ff, nl, vv = 32, 8, 4, 2, 64, 2, 128

    def r(*s):
        return torch.randn(*s) * 0.1

    arch = "rwkv6qwen2"
    path = tmp_path / "rwkv6qwen2.gguf"
    w = GGUFWriter(path)
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, "t")
    w.add(Keys.LLM.CONTEXT_LENGTH.format(arch=arch), 1 << 20)
    w.add(Keys.LLM.EMBEDDING_LENGTH.format(arch=arch), d)
    w.add(Keys.LLM.BLOCK_COUNT.format(arch=arch), nl)
    w.add(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=arch), ff)
    w.add(Keys.LLM.VOCAB_SIZE.format(arch=arch), vv)
    w.add(Keys.Attention.HEAD_COUNT.format(arch=arch), hq)
    w.add(Keys.Attention.HEAD_COUNT_KV.format(arch=arch), hkv)
    w.add(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=arch), 1e-5)
    w.add(f"{arch}.wkv.head_size", dh)

    sd = {}

    def put(name, t, dense=False):
        sd[name] = t
        w.add_tensor(name, t.numpy().astype(np.float32))

    put("token_embd.weight", r(vv, d))
    put("output_norm.weight", 1 + 0.1 * torch.randn(d))
    put("output.weight", r(vv, d))
    for i in range(nl):
        b = f"blk.{i}"
        put(f"{b}.attn_norm.weight", 1 + 0.1 * torch.randn(d))
        put(f"{b}.time_mix_lerp_x.weight", 0.5 + 0.1 * torch.randn(d))
        put(f"{b}.time_mix_lerp_fused.weight", 0.5 + 0.1 * torch.randn(5, d))
        put(f"{b}.time_mix_w1.weight", r(5 * EXT, d))
        put(f"{b}.time_mix_w2.weight", r(5, d, EXT))
        put(f"{b}.time_mix_decay.weight", 0.5 * torch.randn(d))
        put(f"{b}.time_mix_decay_w1.weight", r(EXT2, d))
        put(f"{b}.time_mix_decay_w2.weight", r(d, EXT2))
        put(f"{b}.time_mix_receptance.weight", r(hq * dh, d))
        put(f"{b}.time_mix_receptance.bias", 0.1 * torch.randn(hq * dh))
        put(f"{b}.time_mix_key.weight", r(hkv * dh, d))
        put(f"{b}.time_mix_key.bias", 0.1 * torch.randn(hkv * dh))
        put(f"{b}.time_mix_value.weight", r(hkv * dh, d))
        put(f"{b}.time_mix_value.bias", 0.1 * torch.randn(hkv * dh))
        put(f"{b}.time_mix_gate.weight", r(hq * dh, d))
        put(f"{b}.time_mix_output.weight", r(d, hq * dh))
        put(f"{b}.ffn_norm.weight", 1 + 0.1 * torch.randn(d))
        put(f"{b}.ffn_gate.weight", r(ff, d))
        put(f"{b}.ffn_up.weight", r(ff, d))
        put(f"{b}.ffn_down.weight", r(d, ff))
    w.write()

    params, cfg, _ = load_llama_params(path)
    assert cfg.arch == "rwkv6qwen2" and cfg.wkv_head_size == dh
    assert "tm_first" not in params["layers"]  # qrwkv mode

    tokens = rng.integers(0, vv, size=(1, 9)).astype(np.int32)
    out = rwkv6_forward(params, cfg, jnp.asarray(tokens), Rwkv6State.create(cfg, 1))

    # literal torch oracle (gla semantics)
    def rmst(x, wt, eps=1e-5):
        return x / (x.pow(2).mean(-1, keepdim=True) + eps).sqrt() * wt

    with torch.no_grad():
        tkn = torch.tensor(tokens, dtype=torch.long)
        x = sd["token_embd.weight"][tkn]
        B, T = tkn.shape
        for i in range(nl):
            b = f"blk.{i}"
            xa = rmst(x, sd[f"{b}.attn_norm.weight"])
            prev = torch.cat([torch.zeros(B, 1, d), xa[:, :-1]], dim=1)
            sx = prev - xa
            xxx = xa + sx * sd[f"{b}.time_mix_lerp_x.weight"]
            inner = torch.tanh(xxx @ sd[f"{b}.time_mix_w1.weight"].T).view(B, T, 5, EXT)
            mixed = []
            for j in range(5):
                delta = inner[:, :, j] @ sd[f"{b}.time_mix_w2.weight"][j].T
                mixed.append(xa + sx * (sd[f"{b}.time_mix_lerp_fused.weight"][j] + delta))
            xw, xk, xv, xr, xg = mixed
            rr = (xr @ sd[f"{b}.time_mix_receptance.weight"].T
                  + sd[f"{b}.time_mix_receptance.bias"]).view(B, T, hq, dh)
            kk = (xk @ sd[f"{b}.time_mix_key.weight"].T
                  + sd[f"{b}.time_mix_key.bias"]).view(B, T, hkv, dh)
            vv2 = (xv @ sd[f"{b}.time_mix_value.weight"].T
                   + sd[f"{b}.time_mix_value.bias"]).view(B, T, hkv, dh)
            g = torch.sigmoid(xg @ sd[f"{b}.time_mix_gate.weight"].T)
            wdec = sd[f"{b}.time_mix_decay.weight"] + torch.tanh(
                xw @ sd[f"{b}.time_mix_decay_w1.weight"].T
            ) @ sd[f"{b}.time_mix_decay_w2.weight"].T
            wdec = torch.exp(-torch.exp(wdec)).view(B, T, hq, dh)
            kk = kk.repeat_interleave(hq // hkv, dim=2)
            vv2 = vv2.repeat_interleave(hq // hkv, dim=2)
            kk = kk * (1.0 - wdec)
            S = torch.zeros(B, hq, dh, dh)
            ys = []
            for t in range(T):
                kv = kk[:, t, :, :, None] * vv2[:, t, :, None, :]
                y = ((S + kv) * (rr[:, t] * dh ** -0.5)[..., :, None]).sum(-2)
                S = S * wdec[:, t, :, :, None] + kv
                ys.append(y)
            y = torch.stack(ys, 1).reshape(B, T, d) * g
            x = x + y @ sd[f"{b}.time_mix_output.weight"].T
            xf = rmst(x, sd[f"{b}.ffn_norm.weight"])
            ffn = (torch.nn.functional.silu(xf @ sd[f"{b}.ffn_gate.weight"].T)
                   * (xf @ sd[f"{b}.ffn_up.weight"].T)) @ sd[f"{b}.ffn_down.weight"].T
            x = x + ffn
        x = rmst(x, sd["output_norm.weight"])
        ref = (x @ sd["output.weight"].T).numpy()

    np.testing.assert_allclose(np.asarray(out.logits), ref, atol=3e-3, rtol=1e-2)
