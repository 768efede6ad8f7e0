"""MiniCPM-V perceiver resampler + SigLIP tower loading — the reference's
PROJECTOR_TYPE_RESAMPLER path (examples/llava/clip.cpp:1063-1135 graph,
clip.cpp:1648-1676 tensor load, minicpmv-convert-image-encoder-to-gguf.py
schema, driven by minicpmv-cli.cpp).

The projector is a single cross-attention block: `num_query` learned queries
attend over the ViT patch features, compressing any grid to a fixed number of
LLM-embedding rows:

    q = ln_q(query)                       # [Q, D]
    v = ln_kv(kv_proj @ patches)          # [P, D]
    k = v + pos_embed_2d(grid)            # 2D sincos, computed per grid
    out = proj @ ln_post(MHA(q, k, v))    # [Q, D_llm]

head_dim is fixed at 128 (clip.cpp:1090: n_head = hidden_size / 128).

The vision tower is SigLIP-shaped (no class token, no pre-LN, tanh-gelu —
clip.cpp:598-599/1543-1553 detect this by tensor presence) and reuses
`clip_vision_forward`; this module adds the resampler forward, the 2D sincos
position table, the mmproj GGUF load/convert, and the image entry point."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .clip import ClipVisionConfig, _ln, clip_vision_forward, load_clip_params, preprocess_image

#: MiniCPM-V preprocessing normalizes to mean/std 0.5 (converter default when
#: no processor is present; stored in clip.vision.image_mean/std)
MINICPMV_MEAN = np.asarray([0.5, 0.5, 0.5], np.float32)
MINICPMV_STD = np.asarray([0.5, 0.5, 0.5], np.float32)


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    num_query: int  # 96 (v2) / 64 (v3, v4)
    embed_dim: int  # LLM hidden: 4096 (v2) / 3584 (v3, v4)
    kv_dim: int  # ViT hidden (1152)
    version: int = 3
    eps: float = 1e-6

    @property
    def n_heads(self) -> int:
        return self.embed_dim // 128  # clip.cpp:1090 fixes d_head = 128


def get_2d_sincos_pos_embed(embed_dim: int, grid_hw: tuple[int, int]) -> np.ndarray:
    """[H*W, embed_dim] 2D sincos table, row-major over (h, w); per patch the
    first D/2 lanes encode its W coordinate, the last D/2 its H coordinate —
    the MAE recipe the converter bakes into `resampler.pos_embed_k`
    (minicpmv-convert-image-encoder-to-gguf.py:668-706: meshgrid(w, h) puts
    the W mesh in grid[0]).  clip.cpp's runtime generator (clip.cpp:2536-2578)
    encodes H first but also flattens transposed (pos[w*H+h] = emb[h][w]); for
    the square grids MiniCPM-V slices produce the two cancel into this same
    table (pinned by tests against a literal port of the C++ loops)."""
    h, w = grid_hw
    half = embed_dim // 2
    omega = 1.0 / (10000.0 ** (np.arange(half // 2, dtype=np.float64) / (half / 2)))

    def enc(pos):  # [...,] -> [..., half]
        out = np.einsum("p,d->pd", pos.reshape(-1).astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    ww = np.tile(np.arange(w, dtype=np.float64), h)  # row-major (h outer)
    hh = np.repeat(np.arange(h, dtype=np.float64), w)
    return np.concatenate([enc(ww), enc(hh)], axis=-1).astype(np.float32)


def load_minicpmv_mmproj(path) -> tuple[dict[str, Any], ResamplerConfig, ClipVisionConfig]:
    """Load a MiniCPM-V mmproj GGUF: SigLIP tower params (via the shared clip
    loader) + resampler params under params['resampler']."""
    from ..gguf.reader import GGUFReader

    params, cfg = load_clip_params(path)
    r = GGUFReader(path)

    def t(name):
        return np.asarray(r.tensor_f32(name), np.float32)

    rp = {
        "query": t("resampler.query"),
        "kv_proj": t("resampler.kv.weight"),
        # stored pre-transposed by the converter (proj: v.transpose(-1,-2))
        "proj": t("resampler.proj.weight"),
        "ln_q": (t("resampler.ln_q.weight"), t("resampler.ln_q.bias")),
        "ln_kv": (t("resampler.ln_kv.weight"), t("resampler.ln_kv.bias")),
        "ln_post": (t("resampler.ln_post.weight"), t("resampler.ln_post.bias")),
        "attn_q": (t("resampler.attn.q.weight"), t("resampler.attn.q.bias")),
        "attn_k": (t("resampler.attn.k.weight"), t("resampler.attn.k.bias")),
        "attn_v": (t("resampler.attn.v.weight"), t("resampler.attn.v.bias")),
        "attn_out": (t("resampler.attn.out.weight"), t("resampler.attn.out.bias")),
        "pos_embed_k": t("resampler.pos_embed_k"),
    }
    params["resampler"] = rp
    rcfg = ResamplerConfig(
        num_query=rp["query"].shape[0],
        embed_dim=rp["query"].shape[1],
        kv_dim=rp["kv_proj"].shape[1],
        version=int(r.metadata.get("clip.minicpmv_version", 3)),
    )
    return params, rcfg, cfg


@partial(jax.jit, static_argnames=("rcfg",))
def resampler_forward(rp: dict, rcfg: ResamplerConfig, hidden: jnp.ndarray,
                      pos_embed: jnp.ndarray) -> jnp.ndarray:
    """[P, kv_dim] patch features -> [num_query, embed_dim] LLM rows
    (clip.cpp:1066-1133)."""
    eps = rcfg.eps
    q = _ln(rp["query"], *rp["ln_q"], eps)  # [Q, D]
    v = hidden @ rp["kv_proj"].T  # [P, D] (kv_proj has no bias)
    v = _ln(v, *rp["ln_kv"], eps)
    k = v + pos_embed  # [P, D]

    h, dh = rcfg.n_heads, 128
    Q = (q @ rp["attn_q"][0].T + rp["attn_q"][1]).reshape(-1, h, dh).transpose(1, 0, 2)
    K = (k @ rp["attn_k"][0].T + rp["attn_k"][1]).reshape(-1, h, dh).transpose(1, 0, 2)
    V = (v @ rp["attn_v"][0].T + rp["attn_v"][1]).reshape(-1, h, dh).transpose(1, 0, 2)
    scores = jnp.einsum("hqd,hkd->hqk", Q, K) / jnp.sqrt(jnp.float32(dh))
    attn = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(scores, axis=-1), V)
    x = attn.transpose(1, 0, 2).reshape(-1, rcfg.embed_dim)
    x = x @ rp["attn_out"][0].T + rp["attn_out"][1]
    x = _ln(x, *rp["ln_post"], eps)
    return x @ rp["proj"].T  # proj stored transposed: (x @ Wt.T) == x @ W


def encode_image_minicpmv(params: dict, rcfg: ResamplerConfig,
                          cfg: ClipVisionConfig, img: np.ndarray) -> jnp.ndarray:
    """Image (uint8 HWC) -> [num_query, embed_dim] rows to splice into the LLM
    prompt (minicpmv-cli.cpp single-image path)."""
    pixels = preprocess_image(img, cfg, mean=MINICPMV_MEAN, std=MINICPMV_STD)
    hidden = clip_vision_forward(params, cfg, pixels)  # [P, kv_dim]
    side = cfg.image_size // cfg.patch_size
    pos = jnp.asarray(get_2d_sincos_pos_embed(rcfg.embed_dim, (side, side)))
    return resampler_forward(params["resampler"], rcfg, hidden, pos)


# ---------------------------------------------------------------------------
# HF -> mmproj GGUF (minicpmv-convert-image-encoder-to-gguf.py equivalent)
# ---------------------------------------------------------------------------


def convert_minicpmv_mmproj(vision_sd: dict, resampler_sd: dict, hf_cfg, path,
                            version: int = 3, emb_dim: int | None = None):
    """Write a MiniCPM-V mmproj GGUF from a SiglipVisionTransformer state_dict
    (the `minicpmv.clip` surgery artifact) + the resampler state_dict (the
    `minicpmv.projector` artifact).  Mirrors the reference converter's
    renames: attn.in_proj_* chunks into q/k/v, proj stored transposed,
    pos_embed_k baked as the 70x70 sincos table."""
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter

    def np32(sd, tname):
        v = sd[tname]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    if emb_dim is None:
        emb_dim = resampler_sd["query"].shape[-1] if hasattr(
            resampler_sd["query"], "shape") else len(resampler_sd["query"][0])
        emb_dim = int(emb_dim)
    n_layers = hf_cfg.num_hidden_layers
    w = GGUFWriter(path)
    w.add("general.architecture", "clip")
    w.add("clip.has_text_encoder", False)
    w.add("clip.has_vision_encoder", True)
    w.add("clip.has_minicpmv_projector", True)
    w.add("clip.projector_type", "resampler")
    w.add("clip.minicpmv_version", version)
    w.add("clip.use_gelu", True)  # SigLIP MLP: tanh-approx gelu
    w.add("clip.vision.image_size", hf_cfg.image_size)
    w.add("clip.vision.patch_size", hf_cfg.patch_size)
    w.add("clip.vision.embedding_length", hf_cfg.hidden_size)
    w.add("clip.vision.feed_forward_length", hf_cfg.intermediate_size)
    w.add("clip.vision.attention.head_count", hf_cfg.num_attention_heads)
    w.add("clip.vision.attention.layer_norm_epsilon", float(hf_cfg.layer_norm_eps))
    w.add("clip.vision.block_count", n_layers)
    w.add("clip.vision.image_mean", [0.5, 0.5, 0.5])
    w.add("clip.vision.image_std", [0.5, 0.5, 0.5])

    # --- SigLIP tower (no class token, no pre-LN) ---
    pre = "embeddings."
    w.add_tensor("v.patch_embd.weight", np32(vision_sd, pre + "patch_embedding.weight"), GGMLType.F32)
    w.add_tensor("v.patch_embd.bias", np32(vision_sd, pre + "patch_embedding.bias"), GGMLType.F32)
    w.add_tensor("v.position_embd.weight", np32(vision_sd, pre + "position_embedding.weight"), GGMLType.F32)
    name_map = {
        "attn_q": "self_attn.q_proj", "attn_k": "self_attn.k_proj",
        "attn_v": "self_attn.v_proj", "attn_out": "self_attn.out_proj",
        "ln1": "layer_norm1", "ln2": "layer_norm2",
        # the reference's inverted ffn naming (ffn_down holds HF fc1)
        "ffn_down": "mlp.fc1", "ffn_up": "mlp.fc2",
    }
    for i in range(n_layers):
        for ours, hf in name_map.items():
            for kind in ("weight", "bias"):
                w.add_tensor(
                    f"v.blk.{i}.{ours}.{kind}",
                    np32(vision_sd, f"encoder.layers.{i}.{hf}.{kind}"),
                    GGMLType.F32,
                )
    w.add_tensor("v.post_ln.weight", np32(vision_sd, "post_layernorm.weight"), GGMLType.F32)
    w.add_tensor("v.post_ln.bias", np32(vision_sd, "post_layernorm.bias"), GGMLType.F32)

    # --- resampler (converter renames, converter:707-723) ---
    w.add_tensor("resampler.query", np32(resampler_sd, "query"), GGMLType.F32)
    w.add_tensor("resampler.kv.weight", np32(resampler_sd, "kv_proj.weight"), GGMLType.F32)
    w.add_tensor("resampler.proj.weight",
                 np32(resampler_sd, "proj").T.copy(), GGMLType.F32)
    w.add_tensor("resampler.pos_embed_k",
                 get_2d_sincos_pos_embed(emb_dim, (70, 70)), GGMLType.F32)
    in_w = np32(resampler_sd, "attn.in_proj_weight")
    in_b = np32(resampler_sd, "attn.in_proj_bias")
    for i, nm in enumerate(("q", "k", "v")):
        d = in_w.shape[0] // 3
        w.add_tensor(f"resampler.attn.{nm}.weight", in_w[i * d:(i + 1) * d], GGMLType.F32)
        w.add_tensor(f"resampler.attn.{nm}.bias", in_b[i * d:(i + 1) * d], GGMLType.F32)
    w.add_tensor("resampler.attn.out.weight", np32(resampler_sd, "attn.out_proj.weight"), GGMLType.F32)
    w.add_tensor("resampler.attn.out.bias", np32(resampler_sd, "attn.out_proj.bias"), GGMLType.F32)
    for ln in ("ln_q", "ln_kv", "ln_post"):
        for kind in ("weight", "bias"):
            w.add_tensor(f"resampler.{ln}.{kind}", np32(resampler_sd, f"{ln}.{kind}"), GGMLType.F32)
    w.write()
