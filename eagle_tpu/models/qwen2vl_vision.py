"""Qwen2-VL / Qwen2.5-VL vision tower + merger — the examples/llava
qwen2vl-cli.cpp vision side (graph: clip.cpp:641-875 qwen2vl_merger branch;
2D vision rope: ggml_rope_multi GGML_ROPE_TYPE_VISION, clip.cpp:794-805;
merger projector: clip.cpp:1163-1175; native-resolution preprocessing:
clip.cpp:2203-2219; position fill: clip.cpp:2723-2740).

TPU-native design: one jitted function over dense arrays. The temporal-patch
Conv3d is a flatten + single matmul onto the MXU (patches arrive pre-
flattened in the HF pixel layout, which already orders 2x2 spatial merge
blocks consecutively — the ordering clip.cpp reconstructs in-graph with its
permute/reshape chain, clip.cpp:688-699). The 2D rope rotates the first half
of each head with the patch's ROW position and the second half with its
COLUMN position.

Variants:
  - "qwen2vl":  LayerNorm blocks, QuickGELU MLP, FULL attention every layer.
  - "qwen25vl": RMSNorm blocks, SwiGLU MLP, WINDOWED attention — tokens are
    regrouped into window_size^2-pixel windows and attend within their
    window, except `fullatt_block_indexes` layers which attend globally
    (HF Qwen2_5_VLVisionTransformer.get_window_index semantics).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

#: Qwen2VL image normalization (same CLIP constants as the reference)
from .clip import CLIP_MEAN, CLIP_STD, _lin, _ln


@dataclasses.dataclass(frozen=True)
class Qwen2VLVisionConfig:
    d: int = 1280  # hidden_size / embed_dim
    n_layers: int = 32
    n_heads: int = 16
    d_out: int = 3584  # LLM embedding width (merger output)
    n_ff: int = 5120  # v1: mlp_hidden_dim; 2.5: intermediate_size
    patch_size: int = 14
    temporal_patch_size: int = 2
    merge_size: int = 2
    eps: float = 1e-6
    theta: float = 10000.0
    variant: str = "qwen2vl"  # "qwen2vl" | "qwen25vl"
    window_size: int = 112  # 2.5 only (pixels per attention window side)
    fullatt_block_indexes: tuple[int, ...] = (7, 15, 23, 31)

    @property
    def head_dim(self) -> int:
        return self.d // self.n_heads

    @property
    def patch_dim(self) -> int:
        return 3 * self.temporal_patch_size * self.patch_size ** 2


def rot_pos_ids(grid_h: int, grid_w: int, merge: int = 2) -> np.ndarray:
    """Per-patch (row, col) positions in the HF/mmproj token order: 2x2 merge
    blocks are consecutive (clip.cpp:2723-2740 fills positions y+dy/x+dx in
    exactly this walk)."""
    h = np.arange(grid_h)[:, None] * np.ones((1, grid_w), np.int64)
    w = np.ones((grid_h, 1), np.int64) * np.arange(grid_w)[None, :]

    def blocked(a):
        return (
            a.reshape(grid_h // merge, merge, grid_w // merge, merge)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )

    return np.stack([blocked(h), blocked(w)], axis=1)  # [N, 2]


def _vision_rope(x: jax.Array, pos: jax.Array, cfg: Qwen2VLVisionConfig):
    """x [N, H, Dh]; pos [N, 2] (row, col). First Dh/2 features rotate with
    the row position, second Dh/2 with the column (ggml_rope_multi VISION
    sections {Dh/4 x4} over channels [y, x, y, x] == HF's h/w freq concat)."""
    dh = cfg.head_dim
    inv = 1.0 / cfg.theta ** (np.arange(0, dh // 2, 2, dtype=np.float32) / (dh // 2))
    inv = jnp.asarray(inv)  # [Dh/4]
    fh = pos[:, 0:1].astype(jnp.float32) * inv[None, :]  # [N, Dh/4]
    fw = pos[:, 1:2].astype(jnp.float32) * inv[None, :]
    freqs = jnp.concatenate([fh, fw], axis=-1)  # [N, Dh/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [N, Dh]
    cos, sin = jnp.cos(emb)[:, None, :], jnp.sin(emb)[:, None, :]
    x1, x2 = x[..., : dh // 2], x[..., dh // 2 :]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rot * sin


def _rms(x, w, eps):
    v = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(v + eps)) * w


def window_order(grid_h: int, grid_w: int, cfg: Qwen2VLVisionConfig):
    """Qwen2.5-VL window regrouping (HF get_window_index): returns
    (order [N_merged] permutation of merged positions, win_id [N_merged]
    window id per REORDERED merged position). Patches move in groups of
    merge_size^2."""
    m = cfg.merge_size
    lh, lw = grid_h // m, grid_w // m
    ws = cfg.window_size // cfg.patch_size // m  # merged positions per window side
    idx = np.arange(lh * lw).reshape(lh, lw)
    ph, pw = (-lh) % ws, (-lw) % ws
    idx = np.pad(idx, ((0, ph), (0, pw)), constant_values=-1)
    nh, nw = idx.shape[0] // ws, idx.shape[1] // ws
    wins = idx.reshape(nh, ws, nw, ws).transpose(0, 2, 1, 3).reshape(nh * nw, -1)
    order, win_id = [], []
    for wi, row in enumerate(wins):
        keep = row[row >= 0]
        order.extend(keep.tolist())
        win_id.extend([wi] * len(keep))
    return np.asarray(order, np.int64), np.asarray(win_id, np.int64)


@partial(jax.jit, static_argnames=("cfg",))
def _tower(params: dict, cfg: Qwen2VLVisionConfig, x: jax.Array,
           pos: jax.Array, attn_mask_win: jax.Array | None):
    """x [N, D] patch embeddings in (possibly window-reordered) token order;
    pos [N, 2] matching positions; attn_mask_win [N, N] bool or None (full)."""
    h, dh, d = cfg.n_heads, cfg.head_dim, cfg.d
    v25 = cfg.variant == "qwen25vl"
    n = x.shape[0]
    for li, lp in enumerate(params["layers"]):
        r = x
        x = _rms(x, lp["ln1"][0], cfg.eps) if v25 else _ln(x, *lp["ln1"], cfg.eps)
        qkv = _lin(x, lp["attn_qkv"]).reshape(n, 3, h, dh)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = _vision_rope(q, pos, cfg)
        k = _vision_rope(k, pos, cfg)
        scores = jnp.einsum("qhd,khd->hqk", q, k) / jnp.sqrt(jnp.float32(dh))
        if v25 and attn_mask_win is not None and li not in cfg.fullatt_block_indexes:
            scores = jnp.where(attn_mask_win[None], scores, -jnp.inf)
        attn = jnp.einsum("hqk,khd->qhd", jax.nn.softmax(scores, axis=-1),
                          v.astype(jnp.float32))
        x = _lin(attn.reshape(n, d), lp["attn_out"]) + r
        r = x
        x = _rms(x, lp["ln2"][0], cfg.eps) if v25 else _ln(x, *lp["ln2"], cfg.eps)
        if v25:  # SwiGLU
            g = _lin(x, lp["ffn_gate"])
            u = _lin(x, lp["ffn_up"])
            x = _lin(jax.nn.silu(g) * u, lp["ffn_down"]) + r
        else:  # QuickGELU MLP
            y = _lin(x, lp["ffn_up"])
            y = y * jax.nn.sigmoid(1.702 * y)
            x = _lin(y, lp["ffn_down"]) + r
    # merger (clip.cpp:1163-1175 + post_ln==ln_q): LN/RMS -> 2x2 concat ->
    # Linear -> GELU -> Linear
    x = _rms(x, params["ln_q"][0], cfg.eps) if v25 else _ln(x, *params["ln_q"], cfg.eps)
    x = x.reshape(-1, d * cfg.merge_size ** 2)
    x = _lin(x, params["mm.0"])
    x = jax.nn.gelu(x, approximate=False)
    return _lin(x, params["mm.1"])  # [N/4, d_out]


def qwen2vl_vision_forward(params: dict, cfg: Qwen2VLVisionConfig,
                           pixel_values, grid_h: int, grid_w: int) -> jax.Array:
    """pixel_values [N, 3*tps*ps*ps] (HF pixel layout, N = grid_h*grid_w)
    -> [N / merge^2, d_out] embedding rows for the LLM, in row-major order of
    the MERGED grid (what get_rope_index / our mrope path consumes)."""
    x = jnp.asarray(pixel_values, jnp.float32) @ params["patch_embd"].T
    pos = rot_pos_ids(grid_h, grid_w, cfg.merge_size)
    mask = None
    if cfg.variant == "qwen25vl":
        m2 = cfg.merge_size ** 2
        order, win_id = window_order(grid_h, grid_w, cfg)
        # patch-level permutation: merged group i moves as a block of m2
        perm = (order[:, None] * m2 + np.arange(m2)[None, :]).reshape(-1)
        x = x[jnp.asarray(perm)]
        pos = pos[perm]
        wid_patch = np.repeat(win_id, m2)
        mask = jnp.asarray(wid_patch[:, None] == wid_patch[None, :])
        out = _tower(params, cfg, x, jnp.asarray(pos), mask)
        # undo the window regrouping on merged rows
        inv = np.argsort(order)
        return out[jnp.asarray(inv)]
    return _tower(params, cfg, x, jnp.asarray(pos), None)


# ---------------------------------------------------------------------------
# preprocessing — native resolution, multiples of the merged patch
# (clip.cpp:2203-2219: bicubic resize to ceil-multiples of patch*2)
# ---------------------------------------------------------------------------


def smart_resize(h: int, w: int, factor: int = 28,
                 min_pixels: int = 56 * 56, max_pixels: int = 14 * 14 * 4 * 1280):
    """HF Qwen2VL smart_resize: round to multiples of `factor`, keep area in
    [min_pixels, max_pixels], preserve aspect ratio."""
    import math

    hb = max(factor, round(h / factor) * factor)
    wb = max(factor, round(w / factor) * factor)
    if hb * wb > max_pixels:
        beta = math.sqrt((h * w) / max_pixels)
        hb = math.floor(h / beta / factor) * factor
        wb = math.floor(w / beta / factor) * factor
    elif hb * wb < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        hb = math.ceil(h * beta / factor) * factor
        wb = math.ceil(w * beta / factor) * factor
    return hb, wb


def preprocess_qwen2vl(img: np.ndarray, cfg: Qwen2VLVisionConfig,
                       max_pixels: int | None = None):
    """uint8/float HWC image -> (pixel_values [N, patch_dim], grid_h, grid_w)
    in the HF patch layout (2x2 merge blocks consecutive; the temporal pair
    is the same frame twice for still images)."""
    x = np.asarray(img, np.float32)
    if x.max() > 1.5:
        x = x / 255.0
    hh, ww = smart_resize(
        x.shape[0], x.shape[1], cfg.patch_size * cfg.merge_size,
        max_pixels=max_pixels or 14 * 14 * 4 * 1280,
    )
    x = np.asarray(jax.image.resize(jnp.asarray(x), (hh, ww, 3), "bicubic"))
    x = (x - CLIP_MEAN) / CLIP_STD
    ps, m, tps = cfg.patch_size, cfg.merge_size, cfg.temporal_patch_size
    gh, gw = hh // ps, ww // ps
    x = x.transpose(2, 0, 1)  # [3, H, W]
    x = np.tile(x[None], (tps, 1, 1, 1))  # temporal pair = repeated frame
    # -> [gh/m, m, gw/m, m, 3, tps, ps, ps] flattened with merge blocks
    # consecutive, channel-major within a patch (HF layout)
    x = x.reshape(tps, 3, gh // m, m, ps, gw // m, m, ps)
    x = x.transpose(2, 5, 3, 6, 1, 0, 4, 7)  # [gh/m, gw/m, m, m, 3, tps, ps, ps]
    return x.reshape(gh * gw, cfg.patch_dim).astype(np.float32), gh, gw


# ---------------------------------------------------------------------------
# HF conversion + mmproj GGUF (qwen2vl_merger projector type)
# ---------------------------------------------------------------------------


def params_from_hf_qwen2vl_vision(sd: dict, hf_cfg) -> tuple[dict, Qwen2VLVisionConfig]:
    """transformers Qwen2VL/Qwen2_5_VL `visual` state_dict -> our params."""

    def np32(name):
        t = sd[name]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                          np.float32)

    v25 = "blocks.0.norm1.weight" in sd and "blocks.0.mlp.gate_proj.weight" in sd
    d = int(getattr(hf_cfg, "embed_dim", 0) or getattr(hf_cfg, "hidden_size"))
    cfg = Qwen2VLVisionConfig(
        d=d,
        n_layers=int(hf_cfg.depth),
        n_heads=int(getattr(hf_cfg, "num_heads", 0) or hf_cfg.num_attention_heads),
        d_out=int(getattr(hf_cfg, "out_hidden_size", 0) or hf_cfg.hidden_size),
        n_ff=int(getattr(hf_cfg, "intermediate_size", 0)
                 or int(d * getattr(hf_cfg, "mlp_ratio", 4))),
        patch_size=int(hf_cfg.patch_size),
        temporal_patch_size=int(hf_cfg.temporal_patch_size),
        merge_size=int(hf_cfg.spatial_merge_size),
        variant="qwen25vl" if v25 else "qwen2vl",
        window_size=int(getattr(hf_cfg, "window_size", 112)),
        fullatt_block_indexes=tuple(getattr(hf_cfg, "fullatt_block_indexes",
                                            (7, 15, 23, 31))),
    )
    p: dict[str, Any] = {
        "patch_embd": np32("patch_embed.proj.weight").reshape(cfg.d, cfg.patch_dim),
    }
    layers = []
    for i in range(cfg.n_layers):
        b = f"blocks.{i}."
        lp = {
            "attn_qkv": (np32(b + "attn.qkv.weight"), np32(b + "attn.qkv.bias")),
            "attn_out": (np32(b + "attn.proj.weight"), np32(b + "attn.proj.bias")),
        }
        if v25:
            lp["ln1"] = (np32(b + "norm1.weight"),)
            lp["ln2"] = (np32(b + "norm2.weight"),)
            lp["ffn_gate"] = (np32(b + "mlp.gate_proj.weight"), np32(b + "mlp.gate_proj.bias"))
            lp["ffn_up"] = (np32(b + "mlp.up_proj.weight"), np32(b + "mlp.up_proj.bias"))
            lp["ffn_down"] = (np32(b + "mlp.down_proj.weight"), np32(b + "mlp.down_proj.bias"))
        else:
            lp["ln1"] = (np32(b + "norm1.weight"), np32(b + "norm1.bias"))
            lp["ln2"] = (np32(b + "norm2.weight"), np32(b + "norm2.bias"))
            lp["ffn_up"] = (np32(b + "mlp.fc1.weight"), np32(b + "mlp.fc1.bias"))
            lp["ffn_down"] = (np32(b + "mlp.fc2.weight"), np32(b + "mlp.fc2.bias"))
        layers.append(lp)
    p["layers"] = layers
    if v25:
        p["ln_q"] = (np32("merger.ln_q.weight"),)
    else:
        p["ln_q"] = (np32("merger.ln_q.weight"), np32("merger.ln_q.bias"))
    p["mm.0"] = (np32("merger.mlp.0.weight"), np32("merger.mlp.0.bias"))
    p["mm.1"] = (np32("merger.mlp.2.weight"), np32("merger.mlp.2.bias"))
    return p, cfg


def convert_qwen2vl_to_mmproj(sd: dict, hf_cfg, path):
    """Write a qwen2vl mmproj GGUF (the qwen2vl surgery +
    convert_image_encoder layout: clip.has_qwen2vl_merger,
    projector_type qwen2vl_merger, split q/k/v like the reference)."""
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter

    p, cfg = params_from_hf_qwen2vl_vision(sd, hf_cfg)
    w = GGUFWriter(path)
    w.add("general.architecture", "clip")
    w.add("clip.has_text_encoder", False)
    w.add("clip.has_vision_encoder", True)
    w.add("clip.has_qwen2vl_merger", True)
    w.add("clip.projector_type", "qwen2vl_merger")
    w.add("clip.vision.image_size", 560)  # native-resolution models: nominal
    w.add("clip.vision.patch_size", cfg.patch_size)
    w.add("clip.vision.embedding_length", cfg.d)
    w.add("clip.vision.projection_dim", cfg.d_out)
    w.add("clip.vision.feed_forward_length", cfg.n_ff)
    w.add("clip.vision.attention.head_count", cfg.n_heads)
    w.add("clip.vision.attention.layer_norm_epsilon", cfg.eps)
    w.add("clip.vision.block_count", cfg.n_layers)
    w.add("clip.vision.qwen2vl.variant", cfg.variant)
    w.add("clip.vision.qwen2vl.window_size", cfg.window_size)
    w.add("clip.vision.qwen2vl.fullatt_block_indexes",
          list(cfg.fullatt_block_indexes))
    w.add("clip.vision.qwen2vl.merge_size", cfg.merge_size)
    w.add("clip.vision.qwen2vl.temporal_patch_size", cfg.temporal_patch_size)

    def put(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    put("v.patch_embd.weight", p["patch_embd"])
    for i, lp in enumerate(p["layers"]):
        pre = f"v.blk.{i}"
        # the reference splits qkv into q/k/v tensors (qwen2vl surgery)
        qkv_w, qkv_b = lp["attn_qkv"]
        d = cfg.d
        for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
            put(f"{pre}.{nm}.weight", qkv_w[j * d : (j + 1) * d])
            put(f"{pre}.{nm}.bias", qkv_b[j * d : (j + 1) * d])
        for nm in ("attn_out", "ln1", "ln2", "ffn_up", "ffn_down") + (
            ("ffn_gate",) if cfg.variant == "qwen25vl" else ()
        ):
            tensors = lp[nm]
            put(f"{pre}.{nm}.weight", tensors[0])
            if len(tensors) > 1:
                put(f"{pre}.{nm}.bias", tensors[1])
    put("v.post_ln.weight", p["ln_q"][0])
    if len(p["ln_q"]) > 1:
        put("v.post_ln.bias", p["ln_q"][1])
    put("mm.0.weight", p["mm.0"][0])
    put("mm.0.bias", p["mm.0"][1])
    put("mm.1.weight", p["mm.1"][0])
    put("mm.1.bias", p["mm.1"][1])
    w.write()


def load_qwen2vl_mmproj(path) -> tuple[dict, Qwen2VLVisionConfig]:
    from ..gguf.reader import GGUFReader

    r = GGUFReader(path)
    md = r.metadata

    def t(name):
        return np.asarray(r.tensor_f32(name), np.float32)

    variant = str(md.get("clip.vision.qwen2vl.variant", "qwen2vl"))
    cfg = Qwen2VLVisionConfig(
        d=int(md["clip.vision.embedding_length"]),
        n_layers=int(md["clip.vision.block_count"]),
        n_heads=int(md["clip.vision.attention.head_count"]),
        d_out=int(md["clip.vision.projection_dim"]),
        n_ff=int(md["clip.vision.feed_forward_length"]),
        patch_size=int(md["clip.vision.patch_size"]),
        temporal_patch_size=int(md.get("clip.vision.qwen2vl.temporal_patch_size", 2)),
        merge_size=int(md.get("clip.vision.qwen2vl.merge_size", 2)),
        eps=float(md.get("clip.vision.attention.layer_norm_epsilon", 1e-6)),
        variant=variant,
        window_size=int(md.get("clip.vision.qwen2vl.window_size", 112)),
        fullatt_block_indexes=tuple(
            int(x) for x in md.get("clip.vision.qwen2vl.fullatt_block_indexes",
                                   (7, 15, 23, 31))
        ),
    )
    v25 = variant == "qwen25vl"
    p: dict[str, Any] = {"patch_embd": t("v.patch_embd.weight").reshape(cfg.d, -1)}
    layers = []
    for i in range(cfg.n_layers):
        pre = f"v.blk.{i}"
        qkv_w = np.concatenate([t(f"{pre}.attn_{x}.weight") for x in "qkv"], 0)
        qkv_b = np.concatenate([t(f"{pre}.attn_{x}.bias") for x in "qkv"], 0)
        lp = {
            "attn_qkv": (qkv_w, qkv_b),
            "attn_out": (t(f"{pre}.attn_out.weight"), t(f"{pre}.attn_out.bias")),
        }
        for nm in ("ln1", "ln2", "ffn_up", "ffn_down") + (
            ("ffn_gate",) if v25 else ()
        ):
            if f"{pre}.{nm}.bias" in r.tensors:
                lp[nm] = (t(f"{pre}.{nm}.weight"), t(f"{pre}.{nm}.bias"))
            else:
                lp[nm] = (t(f"{pre}.{nm}.weight"),)
        layers.append(lp)
    p["layers"] = layers
    p["ln_q"] = (
        (t("v.post_ln.weight"),) if "v.post_ln.bias" not in r.tensors
        else (t("v.post_ln.weight"), t("v.post_ln.bias"))
    )
    p["mm.0"] = (t("mm.0.weight"), t("mm.0.bias"))
    p["mm.1"] = (t("mm.1.weight"), t("mm.1.bias"))
    return p, cfg


def encode_image(params: dict, cfg: Qwen2VLVisionConfig, img: np.ndarray,
                 max_pixels: int | None = None):
    """Image -> ([n_merged, d_out] embedding rows, (grid_h, grid_w)) — the
    rows splice into the LLM's input_embeds between the vision markers, and
    the grid feeds mrope position construction (get_rope_index)."""
    pixels, gh, gw = preprocess_qwen2vl(img, cfg, max_pixels=max_pixels)
    out = qwen2vl_vision_forward(params, cfg, pixels, gh, gw)
    return out, (gh, gw)
