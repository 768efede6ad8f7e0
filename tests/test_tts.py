"""TTS stack tests: WavTokenizer decoder parity vs an independent torch
oracle, the ISTFT spectral ops vs a literal port of the reference loops
(tts.cpp:106-270), and OuteTTS text normalization (tts.cpp:285-410)."""

import numpy as np
import pytest

from eagle_tpu.models.wavtokenizer import (
    WavTokConfig,
    load_wavtok_params,
    wavtok_forward,
    write_wavtok_gguf,
)
from eagle_tpu.tools.tts import (
    embd_to_audio,
    hann_window,
    number_to_words,
    process_text,
    save_wav16,
)

TINY = WavTokConfig(
    vocab_size=64,
    n_embd_features=16,
    posnet_embd=32,
    posnet_layers=6,
    convnext_embd=32,
    convnext_layers=2,
    n_ff=48,
    n_embd=34,  # -> n_fft 32
    n_groups=4,
)


def _rand_sd(cfg: WavTokConfig, seed=0):
    """Random state dict keyed by the reference tensor names
    (src/llama-model.cpp:3403-3500 schema, torch layouts)."""
    rng = np.random.default_rng(seed)

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.2

    C = cfg.posnet_embd
    sd = {
        "token_embd.weight": r(cfg.vocab_size, cfg.n_embd_features),
        "conv1d.weight": r(C, cfg.n_embd_features, 7),
        "conv1d.bias": r(C),
        "token_embd_norm.weight": 1 + r(C),
        "token_embd_norm.bias": r(C),
        "output_norm.weight": 1 + r(C),
        "output_norm.bias": r(C),
        "output.weight": r(cfg.n_embd, C),
        "output.bias": r(cfg.n_embd),
    }
    for i in range(cfg.posnet_layers):
        if i == cfg.posnet_layers - 1:
            sd[f"posnet.{i}.attn_norm.weight"] = 1 + r(C)
            sd[f"posnet.{i}.attn_norm.bias"] = r(C)
        elif i == (cfg.posnet_layers - 2) // 2:
            sd[f"posnet.{i}.attn_norm.weight"] = 1 + r(C)
            sd[f"posnet.{i}.attn_norm.bias"] = r(C)
            for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
                sd[f"posnet.{i}.{nm}.weight"] = r(C, C, 1)
                sd[f"posnet.{i}.{nm}.bias"] = r(C)
        else:
            for nm in ("norm1", "norm2"):
                sd[f"posnet.{i}.{nm}.weight"] = 1 + r(C)
                sd[f"posnet.{i}.{nm}.bias"] = r(C)
            for nm in ("conv1", "conv2"):
                sd[f"posnet.{i}.{nm}.weight"] = r(C, C, 3)
                sd[f"posnet.{i}.{nm}.bias"] = r(C)
    for i in range(cfg.convnext_layers):
        sd[f"convnext.{i}.dw.weight"] = r(C, 1, 7)
        sd[f"convnext.{i}.dw.bias"] = r(C)
        sd[f"convnext.{i}.norm.weight"] = 1 + r(C)
        sd[f"convnext.{i}.norm.bias"] = r(C)
        sd[f"convnext.{i}.pw1.weight"] = r(cfg.n_ff, C)
        sd[f"convnext.{i}.pw1.bias"] = r(cfg.n_ff)
        sd[f"convnext.{i}.pw2.weight"] = r(C, cfg.n_ff)
        sd[f"convnext.{i}.pw2.bias"] = r(C)
        sd[f"convnext.{i}.gamma"] = 1 + r(C)
    return sd


def _torch_forward(sd, cfg: WavTokConfig, codes):
    """Independent oracle: the same decoder graph in torch ops."""
    torch = pytest.importorskip("torch")
    F = torch.nn.functional

    def T(name):
        return torch.from_numpy(np.asarray(sd[name]))

    x = T("token_embd.weight")[torch.from_numpy(codes.astype(np.int64))]
    x = x.T[None]  # [1, C_feat, T]
    x = F.conv1d(x, T("conv1d.weight"), T("conv1d.bias"), padding=3)

    def gn(h, pre):
        return F.group_norm(h, cfg.n_groups, T(pre + ".weight"), T(pre + ".bias"),
                            eps=cfg.group_eps)

    for i in range(cfg.posnet_layers):
        if i == cfg.posnet_layers - 1:
            x = gn(x, f"posnet.{i}.attn_norm")
        elif i == (cfg.posnet_layers - 2) // 2:
            h = gn(x, f"posnet.{i}.attn_norm")
            q = F.conv1d(h, T(f"posnet.{i}.attn_q.weight"), T(f"posnet.{i}.attn_q.bias"))
            k = F.conv1d(h, T(f"posnet.{i}.attn_k.weight"), T(f"posnet.{i}.attn_k.bias"))
            v = F.conv1d(h, T(f"posnet.{i}.attn_v.weight"), T(f"posnet.{i}.attn_v.bias"))
            scores = (q[0].T @ k[0]) / np.sqrt(cfg.posnet_embd)
            h = (torch.softmax(scores, dim=-1) @ v[0].T).T[None]
            h = F.conv1d(h, T(f"posnet.{i}.attn_output.weight"),
                         T(f"posnet.{i}.attn_output.bias"))
            x = x + h
        else:
            h = gn(x, f"posnet.{i}.norm1")
            h = h * torch.sigmoid(h)
            h = F.conv1d(h, T(f"posnet.{i}.conv1.weight"), T(f"posnet.{i}.conv1.bias"), padding=1)
            h = gn(h, f"posnet.{i}.norm2")
            h = h * torch.sigmoid(h)
            h = F.conv1d(h, T(f"posnet.{i}.conv2.weight"), T(f"posnet.{i}.conv2.bias"), padding=1)
            x = x + h

    x = x[0].T  # [T, C]
    x = F.layer_norm(x, (cfg.posnet_embd,), T("token_embd_norm.weight"),
                     T("token_embd_norm.bias"), eps=cfg.norm_eps)
    for i in range(cfg.convnext_layers):
        h = F.conv1d(x.T[None], T(f"convnext.{i}.dw.weight"), T(f"convnext.{i}.dw.bias"),
                     padding=3, groups=cfg.convnext_embd)[0].T
        h = F.layer_norm(h, (cfg.convnext_embd,), T(f"convnext.{i}.norm.weight"),
                         T(f"convnext.{i}.norm.bias"), eps=cfg.norm_eps)
        h = h @ T(f"convnext.{i}.pw1.weight").T + T(f"convnext.{i}.pw1.bias")
        h = F.gelu(h, approximate="tanh")
        h = h @ T(f"convnext.{i}.pw2.weight").T + T(f"convnext.{i}.pw2.bias")
        h = h * T(f"convnext.{i}.gamma")
        x = x + h
    x = F.layer_norm(x, (cfg.posnet_embd,), T("output_norm.weight"),
                     T("output_norm.bias"), eps=cfg.norm_eps)
    x = x @ T("output.weight").T + T("output.bias")
    return x.numpy()


def test_wavtok_gguf_roundtrip_and_torch_parity(tmp_path):
    sd = _rand_sd(TINY)
    path = tmp_path / "wavtok.gguf"
    write_wavtok_gguf(sd, TINY, path)

    params, cfg = load_wavtok_params(path)
    # eps round-trips through f32 GGUF metadata
    import dataclasses

    assert dataclasses.replace(cfg, norm_eps=TINY.norm_eps, group_eps=TINY.group_eps) == TINY
    assert cfg.norm_eps == pytest.approx(TINY.norm_eps)

    codes = np.asarray([0, 5, 17, 63, 4, 9, 30, 2], np.int32)
    ours = np.asarray(wavtok_forward(params, cfg, codes))
    oracle = _torch_forward(sd, TINY, codes)
    assert ours.shape == (len(codes), TINY.n_embd)
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# spectral ops
# ---------------------------------------------------------------------------


def _embd_to_audio_literal(embd, n_fft, n_hop):
    """Literal port of tts.cpp:123-270 (irfft + fold loops), as the oracle."""
    n_codes, n_embd = embd.shape
    half = n_embd // 2
    N = n_fft // 2 + 1
    hann = hann_window(n_fft)
    # S: interleaved complex spec per frame
    res = np.zeros((n_codes, n_fft))
    hann2 = np.zeros((n_codes, n_fft))
    for l in range(n_codes):  # noqa: E741
        inp = np.zeros(2 * N)
        for k in range(half):
            mag = min(np.exp(embd[l, k]), 1e2)
            phi = embd[l, k + half]
            inp[2 * k] = mag * np.cos(phi)
            inp[2 * k + 1] = mag * np.sin(phi)
        # irfft (tts.cpp:123-153)
        re_in = inp[0::2][:N]
        im_in = inp[1::2][:N]
        for k in range(n_fft):
            ang = 2 * np.pi * k * np.arange(N) / n_fft
            res[l, k] = np.sum(re_in * np.cos(ang) - im_in * np.sin(ang)) / N
        res[l] *= hann
        hann2[l] = hann * hann

    n_win = n_fft
    n_pad = (n_win - n_hop) // 2
    n_out = (n_codes - 1) * n_hop + n_win

    def fold(data):
        out = np.zeros(n_out)
        for l in range(n_codes):  # noqa: E741
            start = l * n_hop - n_pad
            for j in range(n_win):
                w = start + j
                if 0 <= w < n_out:
                    out[w] += data[l, j]
        return out[: n_out - 2 * n_pad]

    audio = fold(res)
    env = fold(hann2)
    return audio / np.maximum(env, 1e-12)


def test_embd_to_audio_matches_reference_loops():
    rng = np.random.default_rng(0)
    n_fft, hop = 32, 8
    frames = rng.standard_normal((6, n_fft + 2)).astype(np.float32) * 0.5
    fast = embd_to_audio(frames, n_fft=n_fft, n_hop=hop)
    slow = _embd_to_audio_literal(np.asarray(frames, np.float64), n_fft, hop)
    assert fast.shape == slow.shape
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)


def test_wav_writer(tmp_path):
    audio = np.sin(np.linspace(0, 440 * 2 * np.pi, 2400)).astype(np.float32)
    path = tmp_path / "t.wav"
    save_wav16(str(path), audio, 24000)
    raw = path.read_bytes()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    assert len(raw) == 44 + 2 * len(audio)


# ---------------------------------------------------------------------------
# text normalization
# ---------------------------------------------------------------------------


def test_number_to_words():
    assert number_to_words("0") == "zero"
    assert number_to_words("42") == "forty-two"
    assert number_to_words("135") == "one hundred thirty-five"
    assert number_to_words("1000") == "one thousand "
    assert number_to_words("3.14") == "three point one four"


def test_process_text():
    assert process_text("Hello, World!") == "hello<|text_sep|>world"
    assert (process_text("I have 3 cats.")
            == "i<|text_sep|>have<|text_sep|>three<|text_sep|>cats")
    # punctuation-to-space then non-alpha strip, multi-space collapse
    assert process_text("a - b _ c / d") == (
        "a<|text_sep|>b<|text_sep|>c<|text_sep|>d")
