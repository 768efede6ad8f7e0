"""CLIP ViT vision encoder + LLaVA projector — the examples/llava/clip.cpp
equivalent (graph: clip.cpp:617-910; mmproj GGUF schema:
convert_image_encoder_to_gguf.py:196-330).

TPU-native rewrite: the whole encoder is one jitted function over dense
arrays (vision towers are small — ~300M params — so no quantized streaming
needed); the patch "conv" is the stride=patch convolution, expressed as a
patchify-reshape + single matmul onto the MXU instead of a conv kernel.

mmproj tensor names (clip.cpp:136-156; note the reference's historical
naming INVERSION: `v.blk.i.ffn_down` holds HF's fc1 — the UP projection —
and `ffn_up` holds fc2):
  v.patch_embd.weight [D, 3, P, P], v.patch_embd.bias?
  v.class_embd [D], v.position_embd.weight [n_pos, D]
  v.pre_ln.{weight,bias}, v.post_ln.{weight,bias}?
  v.blk.{i}.{attn_q,attn_k,attn_v,attn_out,ln1,ln2,ffn_down,ffn_up}.{weight,bias}
  mm.0.{weight,bias}, mm.2.{weight,bias}  (MLP projector, PROJECTOR_TYPE_MLP)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# OpenAI CLIP normalization (clip.cpp defaults / HF CLIPImageProcessor)
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    d: int = 1024
    n_layers: int = 23  # llava mmproj files drop the last layer (feature -2)
    n_heads: int = 16
    n_ff: int = 4096
    eps: float = 1e-5
    use_quick_gelu: bool = True  # original CLIP ViT activation
    has_post_norm: bool = False  # llava projector path skips post_ln
    #: SigLIP-style towers (MiniCPM-V) have neither a class token nor a
    #: pre-layernorm (clip.cpp:598-599 detects both by tensor presence)
    has_class_embd: bool = True
    has_pre_ln: bool = True

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def load_clip_params(path) -> tuple[dict[str, Any], ClipVisionConfig]:
    """Load an mmproj GGUF (vision tower + projector) to dense f32 arrays."""
    from ..gguf.reader import GGUFReader

    r = GGUFReader(path)
    md = r.metadata

    def t(name):
        return np.asarray(r.tensor_f32(name), np.float32)

    n_layers = int(md["clip.vision.block_count"])
    cfg = ClipVisionConfig(
        image_size=int(md["clip.vision.image_size"]),
        patch_size=int(md["clip.vision.patch_size"]),
        d=int(md["clip.vision.embedding_length"]),
        n_layers=n_layers,
        n_heads=int(md["clip.vision.attention.head_count"]),
        n_ff=int(md["clip.vision.feed_forward_length"]),
        eps=float(md.get("clip.vision.attention.layer_norm_epsilon", 1e-5)),
        has_post_norm=any(n == "v.post_ln.weight" for n in r.tensors),
        has_class_embd="v.class_embd" in r.tensors,
        has_pre_ln="v.pre_ln.weight" in r.tensors,
        use_quick_gelu=not bool(md.get("clip.use_gelu", False)),
    )
    p: dict[str, Any] = {
        "patch_embd": t("v.patch_embd.weight").reshape(cfg.d, 3, cfg.patch_size, cfg.patch_size),
        "pos_embd": t("v.position_embd.weight"),
    }
    if cfg.has_class_embd:
        p["class_embd"] = t("v.class_embd")
    if cfg.has_pre_ln:
        p["pre_ln"] = (t("v.pre_ln.weight"), t("v.pre_ln.bias"))
    if "v.patch_embd.bias" in r.tensors:
        p["patch_bias"] = t("v.patch_embd.bias")
    if cfg.has_post_norm:
        p["post_ln"] = (t("v.post_ln.weight"), t("v.post_ln.bias"))
    layers = []
    for i in range(n_layers):
        pre = f"v.blk.{i}"
        layers.append({
            name: (t(f"{pre}.{name}.weight"), t(f"{pre}.{name}.bias"))
            for name in ("attn_q", "attn_k", "attn_v", "attn_out", "ln1", "ln2",
                         "ffn_down", "ffn_up")
        })
    p["layers"] = layers
    for mm in ("mm.0", "mm.2"):
        if f"{mm}.weight" in r.tensors:
            p[mm] = (t(f"{mm}.weight"), t(f"{mm}.bias"))
    if "adapter.conv.weight" in r.tensors:  # GLM-Edge adapter (clip.cpp:166-173)
        p["adapter"] = {
            "conv": (t("adapter.conv.weight"), t("adapter.conv.bias")),
            "linear": t("adapter.linear.linear.weight"),
            "norm1": (t("adapter.linear.norm1.weight"), t("adapter.linear.norm1.bias")),
            "h_to_4h": t("adapter.linear.dense_h_to_4h.weight"),
            "gate": t("adapter.linear.gate.weight"),
            "4h_to_h": t("adapter.linear.dense_4h_to_h.weight"),
            "boi": t("adapter.boi"),
            "eoi": t("adapter.eoi"),
        }
    return p, cfg


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _lin(x, wb):
    w, b = wb
    return x @ w.T + b


def preprocess_image(img: np.ndarray, cfg: ClipVisionConfig,
                     mean: np.ndarray = CLIP_MEAN,
                     std: np.ndarray = CLIP_STD) -> jnp.ndarray:
    """uint8/float HWC image -> normalized [H, W, 3] f32 at the model's
    resolution (bilinear, like CLIPImageProcessor's default resample≈)."""
    x = jnp.asarray(img, jnp.float32)
    if x.max() > 1.5:
        x = x / 255.0
    x = jax.image.resize(x, (cfg.image_size, cfg.image_size, 3), "bilinear")
    return (x - mean) / std


@partial(jax.jit, static_argnames=("cfg",))
def clip_vision_forward(params: dict, cfg: ClipVisionConfig, pixels: jnp.ndarray):
    """pixels [H, W, 3] normalized -> hidden states [1 + n_patches, D]
    (class token first), after the layer stack (+ optional post_ln)."""
    P, D = cfg.patch_size, cfg.d
    n_side = cfg.image_size // P
    # stride=P conv == per-patch flatten + matmul (clip.cpp:681 ggml_conv_2d)
    patches = pixels.reshape(n_side, P, n_side, P, 3).transpose(0, 2, 4, 1, 3)
    patches = patches.reshape(n_side * n_side, 3 * P * P)
    w = params["patch_embd"].reshape(D, 3 * P * P)
    x = patches @ w.T  # [n_patches, D]
    if "patch_bias" in params:
        x = x + params["patch_bias"]
    if cfg.has_class_embd:
        x = jnp.concatenate([params["class_embd"][None, :], x], axis=0)
    x = x + params["pos_embd"][: x.shape[0]]
    if cfg.has_pre_ln:
        x = _ln(x, *params["pre_ln"], cfg.eps)

    h, dh = cfg.n_heads, D // cfg.n_heads
    act = (lambda v: v * jax.nn.sigmoid(1.702 * v)) if cfg.use_quick_gelu else jax.nn.gelu
    for lp in params["layers"]:
        r = x
        x = _ln(x, *lp["ln1"], cfg.eps)
        n = x.shape[0]
        q = _lin(x, lp["attn_q"]).reshape(n, h, dh).transpose(1, 0, 2)
        k = _lin(x, lp["attn_k"]).reshape(n, h, dh).transpose(1, 0, 2)
        v = _lin(x, lp["attn_v"]).reshape(n, h, dh).transpose(1, 0, 2)
        scores = jnp.einsum("hqd,hkd->hqk", q, k) / jnp.sqrt(jnp.float32(dh))
        attn = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(scores, axis=-1), v)
        x = _lin(attn.transpose(1, 0, 2).reshape(n, D), lp["attn_out"]) + r
        r = x
        x = _ln(x, *lp["ln2"], cfg.eps)
        # NOTE the reference naming inversion: ffn_down == HF fc1 (up-proj)
        x = _lin(act(_lin(x, lp["ffn_down"])), lp["ffn_up"]) + r
    if cfg.has_post_norm and "post_ln" in params:
        x = _ln(x, *params["post_ln"], cfg.eps)
    return x


def llava_project(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """MLP projector (PROJECTOR_TYPE_MLP, clip.cpp:896-903): patch features
    (class token dropped) -> LLM embedding space."""
    x = hidden[1:]  # drop class token (llava uses patch features)
    x = _lin(x, params["mm.0"])
    x = jax.nn.gelu(x, approximate=True)  # ggml_gelu is the tanh approximation
    return _lin(x, params["mm.2"])


def glmedge_project(params: dict, hidden: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """GLM-Edge adapter (PROJECTOR_TYPE_GLM_EDGE, clip.cpp:1138-1160): a
    2x2/stride-2 conv downsamples the patch grid 4:1, then a gated GLU block
    (gelu -> silu(gate) * up -> down); boi/eoi rows bracket the output
    (clip_image_encode pads 2 extra rows, clip.cpp:2420,2603)."""
    a = params["adapter"]
    P, D = hidden.shape
    g = int(round(P ** 0.5))
    cw, cb = a["conv"]  # [Do, Di, 2, 2]
    do = cw.shape[0]
    # stride-2 2x2 conv == 2x2-patchify + matmul, flatten order (ci, dy, dx)
    x = hidden.reshape(g // 2, 2, g // 2, 2, D).transpose(0, 2, 4, 1, 3)
    x = x.reshape((g // 2) * (g // 2), D * 4)
    x = x @ cw.reshape(do, D * 4).T + cb
    x = x @ a["linear"].T
    x = _ln(x, *a["norm1"], eps)
    x = jax.nn.gelu(x, approximate=True)  # ggml_gelu = tanh approximation
    h = jax.nn.silu(x @ a["gate"].T) * (x @ a["h_to_4h"].T)
    out = h @ a["4h_to_h"].T
    return jnp.concatenate([a["boi"][None] if a["boi"].ndim == 1 else a["boi"],
                            out,
                            a["eoi"][None] if a["eoi"].ndim == 1 else a["eoi"]])


def encode_image_glmedge(params: dict, cfg: ClipVisionConfig, img: np.ndarray) -> jnp.ndarray:
    """Image -> [1 + n_patches/4 + 1, n_embd_llm] rows (boi ... eoi)."""
    pixels = preprocess_image(img, cfg)
    hidden = clip_vision_forward(params, cfg, pixels)
    if cfg.has_class_embd:
        hidden = hidden[1:]
    return glmedge_project(params, hidden)


def encode_image(params: dict, cfg: ClipVisionConfig, img: np.ndarray) -> jnp.ndarray:
    """Image (uint8 HWC) -> [n_patches, n_embd_llm] embedding rows to splice
    into the LLM prompt (llava_image_embed_make_*, llava.cpp)."""
    pixels = preprocess_image(img, cfg)
    hidden = clip_vision_forward(params, cfg, pixels)
    return llava_project(params, hidden)


# ---------------------------------------------------------------------------
# HF -> mmproj GGUF conversion (convert_image_encoder_to_gguf.py equivalent)
# ---------------------------------------------------------------------------


def convert_clip_to_mmproj(vision_sd: dict, projector_sd: dict, hf_cfg,
                           path, n_drop_layers: int = 1):
    """Write an mmproj GGUF from a transformers CLIPVisionModel state_dict +
    llava projector weights (linear_1/linear_2). Drops the last
    `n_drop_layers` encoder layers like llava surgery (vision_feature_layer
    -2)."""
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter

    def np32(tname):
        return np.asarray(vision_sd[tname].detach().cpu().numpy()
                          if hasattr(vision_sd[tname], "detach") else vision_sd[tname],
                          np.float32)

    n_layers = hf_cfg.num_hidden_layers - n_drop_layers
    w = GGUFWriter(path)
    w.add("general.architecture", "clip")
    w.add("clip.has_text_encoder", False)
    w.add("clip.has_vision_encoder", True)
    w.add("clip.has_llava_projector", True)
    w.add("clip.projector_type", "mlp")
    w.add("clip.vision.image_size", hf_cfg.image_size)
    w.add("clip.vision.patch_size", hf_cfg.patch_size)
    w.add("clip.vision.embedding_length", hf_cfg.hidden_size)
    w.add("clip.vision.feed_forward_length", hf_cfg.intermediate_size)
    w.add("clip.vision.attention.head_count", hf_cfg.num_attention_heads)
    w.add("clip.vision.attention.layer_norm_epsilon", float(hf_cfg.layer_norm_eps))
    w.add("clip.vision.block_count", n_layers)

    pre = "vision_model.embeddings."
    w.add_tensor("v.patch_embd.weight", np32(pre + "patch_embedding.weight"), GGMLType.F32)
    w.add_tensor("v.class_embd", np32(pre + "class_embedding"), GGMLType.F32)
    w.add_tensor("v.position_embd.weight", np32(pre + "position_embedding.weight"), GGMLType.F32)
    w.add_tensor("v.pre_ln.weight", np32("vision_model.pre_layrnorm.weight"), GGMLType.F32)
    w.add_tensor("v.pre_ln.bias", np32("vision_model.pre_layrnorm.bias"), GGMLType.F32)
    name_map = {
        "attn_q": "self_attn.q_proj", "attn_k": "self_attn.k_proj",
        "attn_v": "self_attn.v_proj", "attn_out": "self_attn.out_proj",
        "ln1": "layer_norm1", "ln2": "layer_norm2",
        # the reference's inverted ffn naming (get_tensor_name, converter:60)
        "ffn_down": "mlp.fc1", "ffn_up": "mlp.fc2",
    }
    for i in range(n_layers):
        for ours, hf in name_map.items():
            for kind in ("weight", "bias"):
                w.add_tensor(
                    f"v.blk.{i}.{ours}.{kind}",
                    np32(f"vision_model.encoder.layers.{i}.{hf}.{kind}"),
                    GGMLType.F32,
                )
    for ours, hf in (("mm.0", "linear_1"), ("mm.2", "linear_2")):
        for kind in ("weight", "bias"):
            v = projector_sd[f"{hf}.{kind}"]
            v = v.detach().cpu().numpy() if hasattr(v, "detach") else v
            w.add_tensor(f"{ours}.{kind}", np.asarray(v, np.float32), GGMLType.F32)
    w.write()


def convert_glmedge_mmproj(vision_sd: dict, adapter_sd: dict, hf_cfg, path):
    """Write a GLM-Edge mmproj GGUF (glmedge-convert-image-encoder-to-gguf.py
    schema): tower under v.*, adapter tensors pass through under their
    surgery names (adapter.conv/linear/boi/eoi — glmedge-surgery.py strips
    the `vision.` prefix)."""
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter

    def np32(sd, tname):
        v = sd[tname]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    n_layers = hf_cfg.num_hidden_layers
    w = GGUFWriter(path)
    w.add("general.architecture", "clip")
    w.add("clip.has_text_encoder", False)
    w.add("clip.has_vision_encoder", True)
    w.add("clip.has_glm_projector", True)
    w.add("clip.projector_type", "adapter")
    w.add("clip.use_gelu", True)
    w.add("clip.vision.image_size", hf_cfg.image_size)
    w.add("clip.vision.patch_size", hf_cfg.patch_size)
    w.add("clip.vision.embedding_length", hf_cfg.hidden_size)
    w.add("clip.vision.feed_forward_length", hf_cfg.intermediate_size)
    w.add("clip.vision.attention.head_count", hf_cfg.num_attention_heads)
    w.add("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add("clip.vision.block_count", n_layers)

    pre = "vision_model.embeddings."
    w.add_tensor("v.patch_embd.weight", np32(vision_sd, pre + "patch_embedding.weight"), GGMLType.F32)
    if pre + "patch_embedding.bias" in vision_sd:
        w.add_tensor("v.patch_embd.bias", np32(vision_sd, pre + "patch_embedding.bias"), GGMLType.F32)
    if pre + "class_embedding" in vision_sd:
        w.add_tensor("v.class_embd", np32(vision_sd, pre + "class_embedding"), GGMLType.F32)
    w.add_tensor("v.position_embd.weight", np32(vision_sd, pre + "position_embedding.weight"), GGMLType.F32)
    name_map = {
        "attn_q": "self_attn.q_proj", "attn_k": "self_attn.k_proj",
        "attn_v": "self_attn.v_proj", "attn_out": "self_attn.out_proj",
        "ln1": "layer_norm1", "ln2": "layer_norm2",
        "ffn_down": "mlp.fc1", "ffn_up": "mlp.fc2",
    }
    for i in range(n_layers):
        for ours, hf in name_map.items():
            for kind in ("weight", "bias"):
                w.add_tensor(
                    f"v.blk.{i}.{ours}.{kind}",
                    np32(vision_sd, f"vision_model.encoder.layers.{i}.{hf}.{kind}"),
                    GGMLType.F32,
                )
    if "vision_model.post_layernorm.weight" in vision_sd:
        w.add_tensor("v.post_ln.weight", np32(vision_sd, "vision_model.post_layernorm.weight"), GGMLType.F32)
        w.add_tensor("v.post_ln.bias", np32(vision_sd, "vision_model.post_layernorm.bias"), GGMLType.F32)
    for name in ("adapter.conv.weight", "adapter.conv.bias",
                 "adapter.linear.linear.weight", "adapter.linear.norm1.weight",
                 "adapter.linear.norm1.bias", "adapter.linear.dense_h_to_4h.weight",
                 "adapter.linear.gate.weight", "adapter.linear.dense_4h_to_h.weight",
                 "adapter.boi", "adapter.eoi"):
        w.add_tensor(name, np32(adapter_sd, name), GGMLType.F32)
    w.write()
