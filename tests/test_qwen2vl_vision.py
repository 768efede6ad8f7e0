"""Qwen2-VL / Qwen2.5-VL vision tower parity vs transformers.

The HF implementations (Qwen2VisionTransformerPretrainedModel /
Qwen2_5_VisionTransformerPretrainedModel) are the oracle for the full
pipeline: pixel patch layout, 2D vision rope, (windowed) attention, merger.
Reference graph being matched: examples/llava/clip.cpp:641-875 (qwen2vl
branch) + clip.cpp:1163-1175 (merger) + clip.cpp:2723-2740 (positions)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.models.qwen2vl_vision import (
    Qwen2VLVisionConfig,
    encode_image,
    load_qwen2vl_mmproj,
    params_from_hf_qwen2vl_vision,
    preprocess_qwen2vl,
    qwen2vl_vision_forward,
    rot_pos_ids,
)


def _hf_v1(depth=2):
    from transformers.models.qwen2_vl.configuration_qwen2_vl import Qwen2VLVisionConfig as HFCfg
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VisionTransformerPretrainedModel,
    )

    cfg = HFCfg(
        depth=depth, embed_dim=64, hidden_size=48, num_heads=4, mlp_ratio=2,
        patch_size=14, temporal_patch_size=2, spatial_merge_size=2, in_channels=3,
    )
    torch.manual_seed(0)
    return Qwen2VisionTransformerPretrainedModel._from_config(cfg).eval(), cfg


def _hf_v25(depth=4):
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig as HFCfg,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    cfg = HFCfg(
        depth=depth, hidden_size=64, out_hidden_size=48, num_heads=4,
        intermediate_size=96, patch_size=14, temporal_patch_size=2,
        spatial_merge_size=2, in_channels=3, window_size=56,
        fullatt_block_indexes=[2],
    )
    torch.manual_seed(1)
    return Qwen2_5_VisionTransformerPretrainedModel._from_config(cfg).eval(), cfg


def _grid_pixels(rng, gh, gw, patch_dim):
    return rng.standard_normal((gh * gw, patch_dim)).astype(np.float32) * 0.5


def test_qwen2vl_v1_tower_matches_hf(rng):
    model, hf_cfg = _hf_v1()
    params, cfg = params_from_hf_qwen2vl_vision(model.state_dict(), hf_cfg)
    assert cfg.variant == "qwen2vl"
    gh, gw = 6, 4
    px = _grid_pixels(rng, gh, gw, cfg.patch_dim)
    with torch.no_grad():
        want = model(
            torch.from_numpy(px),
            grid_thw=torch.tensor([[1, gh, gw]]),
        ).numpy()
    got = np.asarray(qwen2vl_vision_forward(params, cfg, px, gh, gw))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_qwen25vl_windowed_tower_matches_hf(rng):
    """Windowed attention, RMSNorm, SwiGLU — with a non-window-aligned grid
    (exercises the -100 padding path) and one full-attention block."""
    model, hf_cfg = _hf_v25()
    params, cfg = params_from_hf_qwen2vl_vision(model.state_dict(), hf_cfg)
    assert cfg.variant == "qwen25vl"
    gh, gw = 6, 10  # llm grid 3x5, window side 2 -> padding needed
    px = _grid_pixels(rng, gh, gw, cfg.patch_dim)
    with torch.no_grad():
        want = model(
            torch.from_numpy(px),
            grid_thw=torch.tensor([[1, gh, gw]]),
        ).numpy()
    got = np.asarray(qwen2vl_vision_forward(params, cfg, px, gh, gw))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_rot_pos_ids_match_hf_order():
    model, _ = _hf_v1(depth=1)
    gh, gw = 4, 6
    want = model.rot_pos_emb(torch.tensor([[1, gh, gw]]))
    # reconstruct our freqs the same way and compare the underlying positions
    ours = rot_pos_ids(gh, gw, 2)
    import torch as _t

    hpos = _t.arange(gh).unsqueeze(1).expand(-1, gw)
    hpos = hpos.reshape(gh // 2, 2, gw // 2, 2).permute(0, 2, 1, 3).flatten()
    wpos = _t.arange(gw).unsqueeze(0).expand(gh, -1)
    wpos = wpos.reshape(gh // 2, 2, gw // 2, 2).permute(0, 2, 1, 3).flatten()
    np.testing.assert_array_equal(ours[:, 0], hpos.numpy())
    np.testing.assert_array_equal(ours[:, 1], wpos.numpy())
    assert want.shape[0] == gh * gw


def test_preprocess_matches_hf_processor(rng):
    """Our patchify must produce the HF image processor's pixel layout."""
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )

    img = (rng.random((56, 112, 3)) * 255).astype(np.uint8)
    proc = Qwen2VLImageProcessor(
        do_resize=False, do_rescale=True, do_normalize=True,
        patch_size=14, temporal_patch_size=2, merge_size=2,
    )
    # bypass smart-resize (do_resize=False upstream): patchify directly
    x = img.astype(np.float32) / 255.0
    from eagle_tpu.models.clip import CLIP_MEAN, CLIP_STD

    x = (x - CLIP_MEAN) / CLIP_STD
    ps, m, tps = 14, 2, 2
    gh, gw = 56 // ps, 112 // ps
    xx = x.transpose(2, 0, 1)
    xx = np.tile(xx[None], (tps, 1, 1, 1))
    xx = xx.reshape(tps, 3, gh // m, m, ps, gw // m, m, ps)
    ours = xx.transpose(2, 5, 3, 6, 1, 0, 4, 7).reshape(gh * gw, -1)
    want = proc(images=[img], return_tensors="np")
    np.testing.assert_allclose(ours, want["pixel_values"], rtol=1e-5, atol=1e-5)
    assert tuple(want["image_grid_thw"][0]) == (1, gh, gw)


def test_mmproj_gguf_roundtrip(tmp_path, rng):
    model, hf_cfg = _hf_v25(depth=3)
    sd = model.state_dict()
    path = tmp_path / "mmproj.gguf"
    from eagle_tpu.models.qwen2vl_vision import convert_qwen2vl_to_mmproj

    convert_qwen2vl_to_mmproj(sd, hf_cfg, path)
    p2, cfg2 = load_qwen2vl_mmproj(path)
    p1, cfg1 = params_from_hf_qwen2vl_vision(sd, hf_cfg)
    import dataclasses as _dc

    assert abs(cfg1.eps - cfg2.eps) < 1e-9  # GGUF stores f32
    assert _dc.replace(cfg1, eps=0.0) == _dc.replace(cfg2, eps=0.0)
    gh, gw = 4, 4
    px = _grid_pixels(rng, gh, gw, cfg1.patch_dim)
    a = np.asarray(qwen2vl_vision_forward(p1, cfg1, px, gh, gw))
    b = np.asarray(qwen2vl_vision_forward(p2, cfg2, px, gh, gw))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_encode_image_shapes(rng):
    model, hf_cfg = _hf_v1(depth=1)
    params, cfg = params_from_hf_qwen2vl_vision(model.state_dict(), hf_cfg)
    img = (rng.random((100, 150, 3)) * 255).astype(np.uint8)
    rows, (gh, gw) = encode_image(params, cfg, img)
    assert rows.shape == (gh * gw // 4, cfg.d_out)
    assert gh % 2 == 0 and gw % 2 == 0


def test_end_to_end_image_generation_matches_hf(tmp_path, rng):
    """Full pipeline vs HF Qwen2VLForConditionalGeneration.generate: tiny
    text model converted through the GGUF path, vision rows spliced with
    m-rope positions — greedy continuations must be token-identical."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from eagle_tpu.gguf.constants import GGMLType
    from eagle_tpu.models.config import ModelConfig
    from eagle_tpu.models.hf_convert import convert_hf_to_gguf
    from eagle_tpu.models.loader import load_llama_params
    from eagle_tpu.tools.llava_cli import qwen2vl_generate_ids

    torch.manual_seed(17)
    hf_cfg = transformers.Qwen2VLConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        attn_implementation="eager", tie_word_embeddings=False,
        image_token_id=126, vision_start_token_id=124, vision_end_token_id=125,
        vision_config=dict(
            depth=2, embed_dim=24, hidden_size=32, num_heads=2, in_chans=3,
            spatial_merge_size=2, patch_size=4, temporal_patch_size=2,
        ),
    )
    model = transformers.Qwen2VLForConditionalGeneration(hf_cfg).eval()

    # text side -> GGUF -> our params
    sd = {
        k.replace("model.language_model.", "model."): v
        for k, v in model.state_dict().items()
        if not k.startswith("model.visual") and not k.startswith("visual")
    }
    cfg = ModelConfig(
        arch="qwen2vl", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
        n_kv_heads=2, head_dim=8, n_ff=64, rope_dim=8, n_ctx_train=256,
        rms_eps=hf_cfg.rms_norm_eps, rope_base=hf_cfg.rope_theta,
        attn_bias=True, mrope_sections=(2, 1, 1),
    )
    path = tmp_path / "qwen2vl.gguf"
    convert_hf_to_gguf(sd, cfg, path, qtype=GGMLType.F32, arch="qwen2vl")
    params, lcfg, _ = load_llama_params(path)

    # vision side
    visual_sd = {
        k.split("visual.", 1)[1]: v
        for k, v in model.state_dict().items() if "visual." in k
    }
    vparams, vcfg = params_from_hf_qwen2vl_vision(visual_sd, hf_cfg.vision_config)

    gh, gw = 4, 8  # llm grid 2x4 -> 8 image rows
    px = rng.standard_normal((gh * gw, vcfg.patch_dim)).astype(np.float32) * 0.5
    img_rows = np.asarray(qwen2vl_vision_forward(vparams, vcfg, px, gh, gw))

    ids_a = [3, 5, 124]  # ... vision_start
    ids_b = [125, 9, 11]  # vision_end ...
    n_rows = gh * gw // 4
    input_ids = ids_a + [126] * n_rows + ids_b
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([input_ids]),
            pixel_values=torch.from_numpy(px),
            image_grid_thw=torch.tensor([[1, gh, gw]]),
            max_new_tokens=8, do_sample=False,
        )[0, len(input_ids):].tolist()

    class Eng:  # minimal engine facade for qwen2vl_generate_ids
        model_cfg = lcfg
        params_ = params

    eng = Eng()
    eng.params = params
    eng.model_cfg = lcfg
    from types import SimpleNamespace

    eng.cfg = SimpleNamespace(max_seq=128, backend=None,
                              compute_dtype=jnp.float32, kv_dtype=jnp.float32)
    eng.tokenizer = SimpleNamespace(eos_id=-1)
    ours = qwen2vl_generate_ids(
        eng, ids_a, ids_b, img_rows, gh // 2, gw // 2, max_new_tokens=8,
    )
    assert ours == hf_out
