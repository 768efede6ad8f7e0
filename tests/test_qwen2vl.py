"""qwen2vl m-rope: section-cyclic rotary frequencies (build_qwen2vl /
GGML_ROPE_TYPE_MROPE, src/llama.cpp:3814). Text-only parity vs
Qwen2VLForConditionalGeneration, plus a direct check of apply_mrope against
HF's apply_multimodal_rotary_pos_emb with DISTINCT t/h/w positions (the case
that distinguishes m-rope from plain rope)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.config import ModelConfig
from eagle_tpu.models.hf_convert import convert_hf_to_gguf
from eagle_tpu.models.llama import llama_forward
from eagle_tpu.models.loader import load_llama_params
from eagle_tpu.ops.rope import apply_mrope, mrope_section_ids, rope_freqs
from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags


def test_apply_mrope_matches_hf(rng):
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        apply_multimodal_rotary_pos_emb,
    )

    b, t, h, dh = 1, 6, 2, 8
    sections = (2, 1, 1)  # sums to dh/2
    q = torch.randn(b, h, t, dh)
    k = torch.randn(b, h, t, dh)
    pos3 = torch.tensor(np.stack([
        rng.integers(0, 32, size=(b, t)) for _ in range(3)
    ])).long()  # DISTINCT per-section positions

    inv = 1.0 / (10000.0 ** (torch.arange(0, dh, 2).float() / dh))
    freqs = pos3[..., None].float() * inv  # [3,B,T,dh/2]
    emb = torch.cat((freqs, freqs), dim=-1)
    cos, sin = emb.cos(), emb.sin()
    q_hf, k_hf = apply_multimodal_rotary_pos_emb(q, k, cos, sin, list(sections))

    sec = mrope_section_ids(sections, dh // 2)
    inv_j = np.asarray(rope_freqs(dh, 10000.0))
    ours_q = apply_mrope(
        jnp.asarray(q.permute(0, 2, 1, 3).numpy()),  # [B,T,H,dh]
        jnp.asarray(pos3.numpy()), jnp.asarray(inv_j), sec,
    )
    np.testing.assert_allclose(
        np.asarray(ours_q), q_hf.permute(0, 2, 1, 3).numpy(), atol=1e-5, rtol=1e-5
    )


def test_qwen2vl_text_parity(tmp_path, rng):
    torch.manual_seed(81)
    hf_cfg = transformers.Qwen2VLConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        attn_implementation="eager", tie_word_embeddings=False,
        vision_config=dict(depth=1, embed_dim=32, hidden_size=32, num_heads=2,
                           in_chans=3, spatial_merge_size=1, patch_size=4,
                           temporal_patch_size=1),
    )
    model = transformers.Qwen2VLForConditionalGeneration(hf_cfg).eval()
    sd = {
        k.replace("model.language_model.", "model."): v
        for k, v in model.state_dict().items()
        if not k.startswith("model.visual")
    }

    cfg = ModelConfig(
        arch="qwen2vl", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
        n_kv_heads=2, head_dim=8, n_ff=64, rope_dim=8, n_ctx_train=128,
        rms_eps=hf_cfg.rms_norm_eps, rope_base=hf_cfg.rope_theta,
        attn_bias=True, mrope_sections=(2, 1, 1),
    )
    path = tmp_path / "qwen2vl.gguf"
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="qwen2vl")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.mrope_sections == (2, 1, 1)
    assert "bqkv" in params["layers"]

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    b, t = tokens.shape
    kv = KVCache.create(lcfg.n_layers, b, 32, lcfg.n_kv_heads, lcfg.head_dim,
                        jnp.float32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    kv = kv.with_tags(pos, pos)
    mask = causal_mask_from_tags(kv.slot_pos, pos)
    ours = np.asarray(
        llama_forward(params, lcfg, jnp.asarray(tokens), pos, kv, pos, mask,
                      compute_dtype=jnp.float32).logits
    )
    with torch.no_grad():
        ref = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=1e-2)
