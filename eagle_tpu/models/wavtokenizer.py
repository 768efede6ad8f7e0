"""WavTokenizer decoder (codes -> audio spectrogram) — the TTS vocoder.

Reference: llama.cpp arch "wavtokenizer-dec" — graph build_wavtokenizer_dec
(src/llama.cpp:8341-8491), tensor schema src/llama-model.cpp:3403-3500,
hparams keys src/llama-model.cpp:416-424 + :1247-1253. Used by the OuteTTS
pipeline (examples/tts/tts.cpp): an LLM emits audio-codebook tokens, this
model decodes them to a 1282-dim (mag||phase) spectrogram frame per code,
and an ISTFT (tools/tts.py embd_to_audio) renders waveform samples.

TPU-native rewrite: one jitted function over dense arrays in the natural
[T, C] layout (the model is ~50M params — no quantized streaming needed).
Convolutions run through lax.conv_general_dilated in NWC; the kernel-size-1
attention "convs" collapse to plain matmuls on the MXU.

Structure (posnet block_count=6, convnext block_count=12 for the published
WavTokenizer-large):
  embed -> conv1d(k=7, same) -> posnet [res, res, attn, res, res, gnorm]
  -> layernorm -> convnext blocks (dwconv k=7 + LN + pw1/gelu/pw2 * gamma)
  -> layernorm -> output head [C -> n_embd] (+ bias) = spectrogram frames
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WavTokConfig:
    vocab_size: int = 4096
    n_embd_features: int = 512  # code-embedding width (features_length)
    posnet_embd: int = 768
    posnet_layers: int = 6
    convnext_embd: int = 768
    convnext_layers: int = 12
    n_ff: int = 2304
    n_embd: int = 1282  # output spectrogram dim: n_fft/2+1 mags + phases
    n_groups: int = 32  # groupnorm groups (attention.groupnorm_groups)
    norm_eps: float = 1e-6
    group_eps: float = 1e-6


# ---------------------------------------------------------------------------
# building blocks ([T, C] layout)
# ---------------------------------------------------------------------------


def _conv1d(x, w, b, *, groups: int = 1):
    """Same-padded 1-D conv. x [T, C_in]; w [K, C_in/groups, C_out]; b [C_out]."""
    k = w.shape[0]
    out = jax.lax.conv_general_dilated(
        x[None],  # [1, T, C]
        w,
        window_strides=(1,),
        padding=[(k // 2, k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )[0]
    return out + b


def _group_norm(x, w, b, groups: int, eps: float):
    """ggml_group_norm semantics: per group, stats over (T, C/group).

    x [T, C]; w, b [C]."""
    t, c = x.shape
    xg = x.reshape(t, groups, c // groups)
    mu = xg.mean(axis=(0, 2), keepdims=True)
    var = ((xg - mu) ** 2).mean(axis=(0, 2), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    return xg.reshape(t, c) * w + b


def _layer_norm(x, w, b, eps: float):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _swish(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def wavtok_forward(params: dict, cfg: WavTokConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """codes [T] int32 -> spectrogram frames [T, cfg.n_embd] f32.

    Mirrors build_wavtokenizer_dec (src/llama.cpp:8341) with the posnet
    layer-role switch (resnet at 0,1,3,4; attention at 2; group-norm at 5).
    """
    x = params["tok_embd"][codes]  # [T, feat]
    x = _conv1d(x, *params["conv_in"])

    for i, lp in enumerate(params["posnet"]):
        role = _posnet_role(i, cfg.posnet_layers)
        if role == "resnet":
            h = _group_norm(x, *lp["norm1"], cfg.n_groups, cfg.group_eps)
            h = _swish(h)
            h = _conv1d(h, *lp["conv1"])
            h = _group_norm(h, *lp["norm2"], cfg.n_groups, cfg.group_eps)
            h = _swish(h)
            h = _conv1d(h, *lp["conv2"])
            x = x + h
        elif role == "attn":
            h = _group_norm(x, *lp["attn_norm"], cfg.n_groups, cfg.group_eps)
            # k=1 convs == linear projections; single head over full width
            q = h @ lp["attn_q"][0] + lp["attn_q"][1]
            k = h @ lp["attn_k"][0] + lp["attn_k"][1]
            v = h @ lp["attn_v"][0] + lp["attn_v"][1]
            scores = (q @ k.T) / jnp.sqrt(jnp.float32(cfg.posnet_embd))
            h = jax.nn.softmax(scores, axis=-1) @ v
            h = h @ lp["attn_o"][0] + lp["attn_o"][1]
            x = x + h
        else:  # final group norm
            x = _group_norm(x, *lp["norm"], cfg.n_groups, cfg.group_eps)

    x = _layer_norm(x, *params["tok_norm"], cfg.norm_eps)

    for lp in params["convnext"]:
        h = _conv1d(x, *lp["dw"], groups=cfg.convnext_embd)
        h = _layer_norm(h, *lp["norm"], cfg.norm_eps)
        h = h @ lp["pw1"][0] + lp["pw1"][1]
        h = jax.nn.gelu(h, approximate=True)  # ggml_gelu = tanh approximation
        h = h @ lp["pw2"][0] + lp["pw2"][1]
        h = h * lp["gamma"]
        x = x + h

    x = _layer_norm(x, *params["out_norm"], cfg.norm_eps)
    return x @ params["output"][0] + params["output"][1]


# ---------------------------------------------------------------------------
# GGUF load / write
# ---------------------------------------------------------------------------


def _posnet_role(i: int, n: int) -> str:
    # src/llama-model.cpp:3425 switch: attn in the middle, norm last
    if i == n - 1:
        return "norm"
    if i == (n - 2) // 2:  # layer 2 of 6
        return "attn"
    return "resnet"


def load_wavtok_params(path) -> tuple[dict[str, Any], WavTokConfig]:
    """Load a wavtokenizer-dec GGUF into [T, C]-layout dense params."""
    from ..gguf.reader import GGUFReader

    r = GGUFReader(path)
    md = r.metadata
    a = "wavtokenizer-dec"
    cfg = WavTokConfig(
        vocab_size=int(md[f"{a}.vocab_size"]),
        n_embd_features=int(md[f"{a}.features_length"]),
        posnet_embd=int(md[f"{a}.posnet.embedding_length"]),
        posnet_layers=int(md[f"{a}.posnet.block_count"]),
        convnext_embd=int(md[f"{a}.convnext.embedding_length"]),
        convnext_layers=int(md[f"{a}.convnext.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_groups=int(md.get(f"{a}.attention.group_norm_groups", 32)),
        norm_eps=float(md.get(f"{a}.attention.layer_norm_epsilon", 1e-6)),
        group_eps=float(md.get(f"{a}.attention.group_norm_epsilon", 1e-6)),
    )

    def t(name):
        return np.asarray(r.tensor_f32(name), np.float32)

    def conv(name):
        # stored (out, in, k) torch-style -> WIO (k, in, out)
        w = t(f"{name}.weight")
        b = t(f"{name}.bias").reshape(-1)
        return w.transpose(2, 1, 0), b

    def lin(name):
        # stored (out, in) -> (in, out) for x @ w
        return t(f"{name}.weight").T, t(f"{name}.bias").reshape(-1)

    def norm(name):
        return t(f"{name}.weight").reshape(-1), t(f"{name}.bias").reshape(-1)

    p: dict[str, Any] = {
        "tok_embd": t("token_embd.weight"),
        "conv_in": conv("conv1d"),
        "tok_norm": norm("token_embd_norm"),
        "out_norm": norm("output_norm"),
        "output": lin("output"),
    }
    posnet = []
    for i in range(cfg.posnet_layers):
        role = _posnet_role(i, cfg.posnet_layers)
        lp: dict[str, Any] = {}
        if role == "resnet":
            lp["norm1"] = norm(f"posnet.{i}.norm1")
            lp["conv1"] = conv(f"posnet.{i}.conv1")
            lp["norm2"] = norm(f"posnet.{i}.norm2")
            lp["conv2"] = conv(f"posnet.{i}.conv2")
        elif role == "attn":
            lp["attn_norm"] = norm(f"posnet.{i}.attn_norm")
            for nm in ("attn_q", "attn_k", "attn_v"):
                w, b = conv(f"posnet.{i}.{nm}")
                lp[nm] = (w[0], b)  # k=1 conv -> [C_in, C_out] matmul
            w, b = conv(f"posnet.{i}.attn_output")
            lp["attn_o"] = (w[0], b)
        else:
            lp["norm"] = norm(f"posnet.{i}.attn_norm")  # llama-model.cpp:3464
        posnet.append(lp)
    p["posnet"] = posnet
    convnext = []
    for i in range(cfg.convnext_layers):
        convnext.append({
            "dw": conv(f"convnext.{i}.dw"),
            "norm": norm(f"convnext.{i}.norm"),
            "pw1": lin(f"convnext.{i}.pw1"),
            "pw2": lin(f"convnext.{i}.pw2"),
            "gamma": t(f"convnext.{i}.gamma").reshape(-1),
        })
    p["convnext"] = convnext
    r.close()
    return p, cfg


def write_wavtok_gguf(sd: dict[str, np.ndarray], cfg: WavTokConfig, path):
    """Write a wavtokenizer-dec GGUF from a torch-layout state dict keyed by
    the reference tensor names (token_embd.weight, conv1d.weight, posnet.N.*,
    convnext.N.*, ...) — the convert_hf_to_gguf WavTokenizerDecModel shape."""
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter

    a = "wavtokenizer-dec"
    w = GGUFWriter(path)
    w.add("general.architecture", a)
    w.add(f"{a}.vocab_size", cfg.vocab_size)
    w.add(f"{a}.context_length", 8192)
    w.add(f"{a}.block_count", max(cfg.posnet_layers, cfg.convnext_layers))
    w.add(f"{a}.features_length", cfg.n_embd_features)
    w.add(f"{a}.embedding_length", cfg.n_embd)
    w.add(f"{a}.feed_forward_length", cfg.n_ff)
    w.add(f"{a}.posnet.embedding_length", cfg.posnet_embd)
    w.add(f"{a}.posnet.block_count", cfg.posnet_layers)
    w.add(f"{a}.convnext.embedding_length", cfg.convnext_embd)
    w.add(f"{a}.convnext.block_count", cfg.convnext_layers)
    w.add(f"{a}.attention.group_norm_groups", cfg.n_groups)
    w.add(f"{a}.attention.group_norm_epsilon", cfg.group_eps)
    w.add(f"{a}.attention.layer_norm_epsilon", cfg.norm_eps)
    w.add(f"{a}.attention.causal", False)
    for name, arr in sd.items():
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)
    w.write()


#: HF WavTokenizer checkpoint name -> GGUF name (the reference's
#: gguf-py/gguf/tensor_mapping.py wavtokenizer rows). Suffix .weight/.bias
#: is preserved; {i} is the block index.
_HF_MAP = [
    ("feature_extractor.encodec.quantizer.vq.layers.0._codebook.embed", "token_embd"),
    ("backbone.embed", "conv1d"),
    ("backbone.norm", "token_embd_norm"),
    ("backbone.final_layer_norm", "output_norm"),
    ("head.out", "output"),
    ("backbone.posnet.{i}.norm1", "posnet.{i}.norm1"),
    ("backbone.posnet.{i}.conv1", "posnet.{i}.conv1"),
    ("backbone.posnet.{i}.norm2", "posnet.{i}.norm2"),
    ("backbone.posnet.{i}.conv2", "posnet.{i}.conv2"),
    ("backbone.posnet.{i}.norm", "posnet.{i}.attn_norm"),
    ("backbone.posnet.{i}.q", "posnet.{i}.attn_q"),
    ("backbone.posnet.{i}.k", "posnet.{i}.attn_k"),
    ("backbone.posnet.{i}.v", "posnet.{i}.attn_v"),
    ("backbone.posnet.{i}.proj_out", "posnet.{i}.attn_output"),
    ("backbone.convnext.{i}.dwconv", "convnext.{i}.dw"),
    ("backbone.convnext.{i}.norm", "convnext.{i}.norm"),
    ("backbone.convnext.{i}.pwconv1", "convnext.{i}.pw1"),
    ("backbone.convnext.{i}.pwconv2", "convnext.{i}.pw2"),
    ("backbone.convnext.{i}.gamma", "convnext.{i}.gamma"),
]


def map_hf_state_dict(hf_sd: dict, n_blocks: int = 16) -> dict:
    """Rename an HF WavTokenizer decoder state dict to the reference GGUF
    tensor names accepted by write_wavtok_gguf (convert_hf_to_gguf.py:2362
    WavTokenizerDecModel.modify_tensors + tensor_mapping.py rows)."""
    out = {}
    skip = ("codebook.cluster_size", "codebook.embed_avg", "codebook.inited")
    expand = []
    for hf, ours in _HF_MAP:
        if "{i}" in hf:
            expand += [(hf.replace("{i}", str(i)), ours.replace("{i}", str(i)))
                       for i in range(n_blocks)]
        else:
            expand.append((hf, ours))
    lut = dict(expand)
    for name, arr in hf_sd.items():
        if name.endswith(skip):
            continue
        base, dot, kind = name.rpartition(".")
        if kind in ("weight", "bias") and base in lut:
            out[lut[base] + dot + kind] = arr
        elif name in lut:  # e.g. gamma / codebook embed (no suffix)
            out[lut[name] + (".weight" if "embed" in name else "")] = arr
    return out
