"""MiniCPM-V resampler projector: torch-oracle parity, SigLIP tower parity,
2D sincos position table pinned to the reference's generator, mmproj GGUF
round-trip, and the llava_cli autodetect path.

Reference: examples/llava/clip.cpp:1063-1135 (resampler graph),
clip.cpp:2492-2578 (pos embed), minicpmv-convert-image-encoder-to-gguf.py
(schema), minicpmv-cli.cpp (driver).  The attention oracle is
torch.nn.MultiheadAttention — the exact module the HF resampler uses — so
the parity check is independent of our jnp implementation."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from eagle_tpu.models.clip import clip_vision_forward, load_clip_params, preprocess_image
from eagle_tpu.models.minicpmv import (
    MINICPMV_MEAN,
    MINICPMV_STD,
    ResamplerConfig,
    convert_minicpmv_mmproj,
    encode_image_minicpmv,
    get_2d_sincos_pos_embed,
    load_minicpmv_mmproj,
    resampler_forward,
)

D_EMB = 256  # resampler dim (head_dim fixed at 128 -> 2 heads)
NQ = 8  # num_query


class TorchResampler(torch.nn.Module):
    """Literal port of the HF MiniCPM-V Resampler (single cross-attention
    block with learned queries and 2D sincos K positions)."""

    def __init__(self, num_queries, embed_dim, kv_dim):
        super().__init__()
        self.query = torch.nn.Parameter(torch.randn(num_queries, embed_dim) * 0.2)
        self.kv_proj = torch.nn.Linear(kv_dim, embed_dim, bias=False)
        self.attn = torch.nn.MultiheadAttention(embed_dim, embed_dim // 128)
        self.ln_q = torch.nn.LayerNorm(embed_dim, eps=1e-6)
        self.ln_kv = torch.nn.LayerNorm(embed_dim, eps=1e-6)
        self.ln_post = torch.nn.LayerNorm(embed_dim, eps=1e-6)
        self.proj = torch.nn.Parameter(torch.randn(embed_dim, embed_dim) * embed_dim ** -0.5)

    def forward(self, x, grid_hw):
        # x: [P, kv_dim]
        pos = torch.from_numpy(get_2d_sincos_pos_embed(self.query.shape[1], grid_hw))
        v = self.ln_kv(self.kv_proj(x))  # [P, D]
        q = self.ln_q(self.query)  # [Q, D]
        out, _ = self.attn(q[:, None], (v + pos)[:, None], v[:, None])
        return self.ln_post(out[:, 0]) @ self.proj


@pytest.fixture(scope="module")
def tiny_minicpmv(tmp_path_factory):
    torch.manual_seed(11)
    vcfg = transformers.SiglipVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        layer_norm_eps=1e-6, hidden_act="gelu_pytorch_tanh",
    )
    tower = transformers.SiglipVisionModel(vcfg).eval().vision_model
    res = TorchResampler(NQ, D_EMB, vcfg.hidden_size).eval()
    rsd = dict(res.state_dict())
    # the surgery artifact names the MHA params like the converter expects
    rsd["attn.in_proj_weight"] = rsd.pop("attn.in_proj_weight")
    path = tmp_path_factory.mktemp("mm") / "mmproj-minicpmv.gguf"
    convert_minicpmv_mmproj(tower.state_dict(), rsd, vcfg, path, version=3,
                            emb_dim=D_EMB)
    return path, tower, res, vcfg


def test_pos_embed_matches_reference_loops():
    """Vectorized table == a literal transliteration of clip.cpp's
    get_2d_sincos_pos_embed loops (2492-2578, incl. its transposed flatten)
    on a square grid."""
    dim, H, W = 32, 3, 3
    half = dim // 2
    omega = [1.0 / (10000.0 ** (i / (half / 2))) for i in range(half // 2)]

    def enc1d(p):  # clip.cpp get_1d_sincos_..._new, one position
        out = [0.0] * half
        for d in range(half // 2):
            out[d] = math.sin(p * omega[d])
            out[d + half // 2] = math.cos(p * omega[d])
        return out

    ref = np.zeros((H * W, dim), np.float32)
    for h in range(H):
        for w in range(W):
            # emb[h][w] = [h-encode | w-encode]; flattened at [w*H + h]
            ref[w * H + h] = enc1d(h) + enc1d(w)

    ours = get_2d_sincos_pos_embed(dim, (H, W))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_resampler_matches_torch_oracle(tiny_minicpmv):
    path, _, res, vcfg = tiny_minicpmv
    params, rcfg, _ = load_minicpmv_mmproj(path)
    assert rcfg.num_query == NQ and rcfg.embed_dim == D_EMB
    assert rcfg.kv_dim == vcfg.hidden_size and rcfg.n_heads == 2

    rng = np.random.default_rng(3)
    P = 4  # 2x2 grid
    hidden = rng.normal(0, 1, (P, vcfg.hidden_size)).astype(np.float32)
    pos = jnp.asarray(get_2d_sincos_pos_embed(D_EMB, (2, 2)))
    ours = np.asarray(resampler_forward(params["resampler"], rcfg,
                                        jnp.asarray(hidden), pos))
    with torch.no_grad():
        ref = res(torch.from_numpy(hidden), (2, 2)).numpy()
    assert ours.shape == (NQ, D_EMB)
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_siglip_tower_matches_transformers(tiny_minicpmv):
    path, tower, _, vcfg = tiny_minicpmv
    params, ccfg = load_clip_params(path)
    assert not ccfg.has_class_embd and not ccfg.has_pre_ln
    assert ccfg.has_post_norm and not ccfg.use_quick_gelu

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (28, 28, 3)).astype(np.float32)
    pixels = preprocess_image(img, ccfg, MINICPMV_MEAN, MINICPMV_STD)
    ours = np.asarray(clip_vision_forward(params, ccfg, pixels))
    with torch.no_grad():
        pt = torch.from_numpy(np.asarray(pixels)).permute(2, 0, 1)[None]
        ref = tower(pt).last_hidden_state[0].numpy()  # incl. post_layernorm
    assert ours.shape == ref.shape  # [n_patches, hidden] — no class token
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_encode_image_end_to_end(tiny_minicpmv):
    path, tower, res, vcfg = tiny_minicpmv
    params, rcfg, ccfg = load_minicpmv_mmproj(path)
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (40, 52, 3)).astype(np.uint8)
    emb = np.asarray(encode_image_minicpmv(params, rcfg, ccfg, img))
    assert emb.shape == (NQ, D_EMB)
    assert np.isfinite(emb).all()
    # full-pipeline oracle: tower then resampler in torch
    pixels = preprocess_image(img, ccfg, MINICPMV_MEAN, MINICPMV_STD)
    with torch.no_grad():
        pt = torch.from_numpy(np.asarray(pixels)).permute(2, 0, 1)[None]
        hid = tower(pt).last_hidden_state[0]
        ref = res(hid, (2, 2)).numpy()
    np.testing.assert_allclose(emb, ref, atol=5e-4)


def test_llava_cli_autodetects_minicpmv(tiny_minicpmv, tmp_path):
    """The CLI routes an mmproj with clip.has_minicpmv_projector through the
    resampler and splices NQ rows into the prompt."""
    from eagle_tpu.gguf.reader import GGUFReader

    path, _, _, _ = tiny_minicpmv
    md = GGUFReader(path).metadata
    assert bool(md["clip.has_minicpmv_projector"]) is True
    assert md["clip.projector_type"] == "resampler"


# ---------------------------------------------------------------------------
# GLM-Edge adapter (PROJECTOR_TYPE_GLM_EDGE, clip.cpp:1138-1160)
# ---------------------------------------------------------------------------


class TorchGlmAdapter(torch.nn.Module):
    """Literal port of GLM-Edge's vision adapter (conv downsample + GLU)."""

    def __init__(self, d_in, d_llm):
        super().__init__()
        self.conv = torch.nn.Conv2d(d_in, d_llm, 2, stride=2)
        self.linear = torch.nn.Linear(d_llm, d_llm, bias=False)
        self.norm1 = torch.nn.LayerNorm(d_llm, eps=1e-5)
        self.h_to_4h = torch.nn.Linear(d_llm, 2 * d_llm, bias=False)
        self.gate = torch.nn.Linear(d_llm, 2 * d_llm, bias=False)
        self.h4_to_h = torch.nn.Linear(2 * d_llm, d_llm, bias=False)

    def forward(self, x, grid):
        # x [P, d_in] row-major patches
        g = grid
        x = x.reshape(g, g, -1).permute(2, 0, 1)[None]  # [1, C, H, W]
        x = self.conv(x)[0].permute(1, 2, 0).reshape(-1, self.conv.out_channels)
        x = self.linear(x)
        x = torch.nn.functional.gelu(self.norm1(x), approximate="tanh")
        h = torch.nn.functional.silu(self.gate(x)) * self.h_to_4h(x)
        return self.h4_to_h(h)


def test_glmedge_adapter_matches_torch(tmp_path):
    torch.manual_seed(21)
    vcfg = transformers.SiglipVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        layer_norm_eps=1e-6, hidden_act="gelu_pytorch_tanh",
    )
    tower = transformers.SiglipVisionModel(vcfg).eval().vision_model
    d_llm = 40
    ad = TorchGlmAdapter(vcfg.hidden_size, d_llm).eval()
    boi = torch.randn(d_llm) * 0.1
    eoi = torch.randn(d_llm) * 0.1
    adapter_sd = {
        "adapter.conv.weight": ad.conv.weight,
        "adapter.conv.bias": ad.conv.bias,
        "adapter.linear.linear.weight": ad.linear.weight,
        "adapter.linear.norm1.weight": ad.norm1.weight,
        "adapter.linear.norm1.bias": ad.norm1.bias,
        "adapter.linear.dense_h_to_4h.weight": ad.h_to_4h.weight,
        "adapter.linear.gate.weight": ad.gate.weight,
        "adapter.linear.dense_4h_to_h.weight": ad.h4_to_h.weight,
        "adapter.boi": boi,
        "adapter.eoi": eoi,
    }
    from eagle_tpu.models.clip import convert_glmedge_mmproj, encode_image_glmedge

    vsd = {"vision_model." + k: v for k, v in tower.state_dict().items()}
    path = tmp_path / "mmproj-glmedge.gguf"
    convert_glmedge_mmproj(vsd, adapter_sd, vcfg, path)

    params, ccfg = load_clip_params(path)
    assert "adapter" in params and not ccfg.use_quick_gelu
    rng = np.random.default_rng(9)
    img = rng.uniform(0, 255, (56, 56, 3)).astype(np.float32)
    emb = np.asarray(encode_image_glmedge(params, ccfg, img))
    # 4x4 grid -> 2x2 downsample = 4 rows, plus boi/eoi brackets
    assert emb.shape == (1 + 4 + 1, d_llm)
    np.testing.assert_allclose(emb[0], boi.numpy(), atol=1e-6)
    np.testing.assert_allclose(emb[-1], eoi.numpy(), atol=1e-6)
    pixels = preprocess_image(img, ccfg)
    with torch.no_grad():
        pt = torch.from_numpy(np.asarray(pixels).copy()).permute(2, 0, 1)[None]
        hid = tower(pt).last_hidden_state[0]
        ref = ad(hid, 4).numpy()
    np.testing.assert_allclose(emb[1:-1], ref, atol=3e-4)
