"""CLIP vision encoder + LLaVA projector: transformers parity, mmproj GGUF
round-trip, and end-to-end multimodal generation (examples/llava parity)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from eagle_tpu.models.clip import (
    ClipVisionConfig,
    clip_vision_forward,
    convert_clip_to_mmproj,
    encode_image,
    llava_project,
    load_clip_params,
    preprocess_image,
)


@pytest.fixture(scope="module")
def tiny_clip():
    torch.manual_seed(7)
    cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="quick_gelu",
    )
    model = transformers.CLIPVisionModel(cfg).eval()
    return model, cfg


@pytest.fixture(scope="module")
def mmproj_gguf(tiny_clip, tmp_path_factory):
    model, cfg = tiny_clip
    torch.manual_seed(8)
    d_llm = 32
    proj = {
        "linear_1.weight": torch.randn(48, cfg.hidden_size) * 0.5,
        "linear_1.bias": torch.zeros(48),
        "linear_2.weight": torch.randn(d_llm, 48) * 0.5,
        "linear_2.bias": torch.zeros(d_llm),
    }
    path = tmp_path_factory.mktemp("mm") / "mmproj.gguf"
    convert_clip_to_mmproj(model.state_dict(), proj, cfg, path, n_drop_layers=1)
    return path, model, cfg, proj


def test_clip_forward_matches_transformers(mmproj_gguf):
    """Our encoder over the mmproj file == transformers CLIPVisionModel
    hidden_states at the selected feature layer (-2, like llava)."""
    path, model, cfg, _ = mmproj_gguf
    params, ccfg = load_clip_params(path)
    assert ccfg.n_layers == cfg.num_hidden_layers - 1

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (28, 28, 3)).astype(np.float32)
    pixels = preprocess_image(img, ccfg)
    ours = np.asarray(clip_vision_forward(params, ccfg, pixels))

    with torch.no_grad():
        pt_pixels = torch.from_numpy(np.asarray(pixels)).permute(2, 0, 1)[None]
        hf = model(pt_pixels, output_hidden_states=True)
        # hidden_states[-2] == output after layer n-1 (the llava feature layer)
        ref = hf.hidden_states[-2][0].numpy()
    assert np.allclose(ours, ref, atol=2e-4), np.abs(ours - ref).max()


def test_projector_and_encode_image(mmproj_gguf):
    path, model, cfg, proj = mmproj_gguf
    params, ccfg = load_clip_params(path)
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (40, 52, 3)).astype(np.uint8)  # non-square resize path
    emb = np.asarray(encode_image(params, ccfg, img))
    assert emb.shape == (ccfg.n_patches, 32)
    assert np.isfinite(emb).all()


def test_llava_generate_end_to_end(mmproj_gguf, tmp_path):
    """Full multimodal generation against a tiny llama target: image rows
    spliced at <image> change the output vs an unrelated image."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_server import _vocab_metadata

    from eagle_tpu.api import Engine, EngineConfig
    from eagle_tpu.gguf.constants import GGMLType
    from eagle_tpu.models.hf_convert import config_from_hf, convert_hf_to_gguf
    from eagle_tpu.tools.llava_cli import generate_with_image

    md, vocab = _vocab_metadata()
    torch.manual_seed(9)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attn_implementation="eager",
    )
    lm = transformers.LlamaForCausalLM(hf_cfg).eval()
    tgt = tmp_path / "t.gguf"
    convert_hf_to_gguf(lm.state_dict(), config_from_hf(hf_cfg), tgt,
                       qtype=GGMLType.F32, metadata=md)
    eng = Engine(EngineConfig(model_path=tgt, max_seq=256,
                              compute_dtype=jnp.float32, kv_dtype=jnp.float32))

    path, _, _, _ = mmproj_gguf
    clip_params, ccfg = load_clip_params(path)
    rng = np.random.default_rng(2)
    img1 = rng.uniform(0, 255, (28, 28, 3)).astype(np.uint8)
    img2 = np.zeros((28, 28, 3), np.uint8)
    # marker last: the first generated token is directly image-conditioned
    out1 = generate_with_image(eng, clip_params, ccfg,
                               "USER: hello <image>", img1, max_new_tokens=8)
    out2 = generate_with_image(eng, clip_params, ccfg,
                               "USER: hello <image>", img2, max_new_tokens=8)
    assert isinstance(out1, str) and isinstance(out2, str)
    assert out1 != out2  # the image conditions the generation
