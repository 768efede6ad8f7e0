"""llama-3.1 rope scaling: the converter emits rope_freqs.weight divisors
(reference LlamaModel.generate_extra_tensors) and the forward divides the
inverse frequencies by them (ggml_rope_ext freq_factors). Parity vs HF's
Llama3 rotary."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.hf_convert import (
    config_from_hf,
    convert_hf_to_gguf,
    llama3_rope_factors,
)
from eagle_tpu.models.llama import llama_forward
from eagle_tpu.models.loader import load_llama_params
from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags


def test_llama31_rope_factors_parity(tmp_path, rng):
    torch.manual_seed(121)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attn_implementation="eager",
        tie_word_embeddings=False,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 32},
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    factors = llama3_rope_factors(hf_cfg)
    assert factors is not None and factors.shape == (4,)
    assert factors.max() > 1.0  # the low-frequency tail is actually scaled

    path = tmp_path / "llama31.gguf"
    convert_hf_to_gguf(model.state_dict(), config_from_hf(hf_cfg), path,
                       qtype=GGMLType.F32, rope_factors=factors)
    params, cfg, _ = load_llama_params(path)
    assert "rope_factors" in params

    # long enough that scaled frequencies change the answer (T > original/4)
    tokens = rng.integers(0, 128, size=(1, 48)).astype(np.int32)
    b, t = tokens.shape
    kv = KVCache.create(cfg.n_layers, b, 64, cfg.n_kv_heads, cfg.head_dim,
                        jnp.float32)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    kv = kv.with_tags(pos, pos)
    mask = causal_mask_from_tags(kv.slot_pos, pos)
    ours = np.asarray(
        llama_forward(params, cfg, jnp.asarray(tokens), pos, kv, pos, mask,
                      compute_dtype=jnp.float32).logits
    )
    with torch.no_grad():
        ref = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=1e-2)

    # and WITHOUT factors the logits differ (the scaling actually matters)
    path2 = tmp_path / "plain.gguf"
    convert_hf_to_gguf(model.state_dict(), config_from_hf(hf_cfg), path2,
                       qtype=GGMLType.F32)
    p2, c2, _ = load_llama_params(path2)
    plain = np.asarray(
        llama_forward(p2, c2, jnp.asarray(tokens), pos, kv, pos, mask,
                      compute_dtype=jnp.float32).logits
    )
    # the factors measurably change the forward, and the scaled version is
    # strictly closer to HF than the unscaled one
    assert np.abs(plain - ours).max() > 1e-4
    assert np.abs(ours - ref).max() < np.abs(plain - ref).max()


# ---------------------------------------------------------------------------
# YaRN (rope.scaling.type = yarn)


def _ggml_rope_yarn_oracle(pos, head_dim, base, freq_scale, n_ctx_orig,
                           ext_factor, attn_factor, beta_fast, beta_slow):
    """Literal numpy port of ggml's rope_yarn per-dim loop
    (ggml/src/ggml-cpu/ggml-cpu.c:9351-9390, ggml.c:3699-3711): returns
    (cos, sin) arrays [len(pos), head_dim/2]."""
    import math

    def corr_dim(n_rot):
        return (head_dim * math.log(n_ctx_orig / (n_rot * 2 * math.pi))
                / (2 * math.log(base)))

    low = max(0.0, math.floor(corr_dim(beta_fast)))
    high = min(head_dim - 1.0, math.ceil(corr_dim(beta_slow)))
    cos = np.empty((len(pos), head_dim // 2), np.float64)
    sin = np.empty_like(cos)
    theta_scale = base ** (-2.0 / head_dim)
    # theta advances per dim pair exactly as ggml_rope_cache_init does
    for pi, p in enumerate(pos):
        theta = float(p)
        for i0 in range(0, head_dim, 2):
            theta_extrap = theta
            theta_interp = freq_scale * theta_extrap
            th = theta_interp
            mscale = attn_factor
            if ext_factor != 0.0:
                ramp = 1.0 - min(1.0, max(0.0, (i0 / 2 - low) / max(0.001, high - low)))
                mix = ramp * ext_factor
                th = theta_interp * (1 - mix) + theta_extrap * mix
                mscale *= 1.0 + 0.1 * math.log(1.0 / freq_scale)
            cos[pi, i0 // 2] = math.cos(th) * mscale
            sin[pi, i0 // 2] = math.sin(th) * mscale
            theta *= theta_scale
    return cos, sin


@pytest.mark.parametrize("factor,orig_ctx,attn_factor", [
    (4.0, 64, 1.0),
    (8.0, 128, 1.3),
    (2.0, 32, 1.0),
])
def test_yarn_freqs_match_ggml_rope_yarn(factor, orig_ctx, attn_factor):
    """rope_freqs_cfg's static blended inv_freq + mscale reproduce ggml's
    per-dim rope_yarn loop exactly."""
    import dataclasses

    from eagle_tpu.models.config import ModelConfig
    from eagle_tpu.ops.rope import rope_freqs_cfg

    head_dim, base = 64, 10000.0
    cfg = ModelConfig(
        arch="llama", vocab_size=1, n_embd=head_dim, n_layers=1, n_heads=1,
        n_kv_heads=1, head_dim=head_dim, n_ff=1, rope_dim=head_dim,
        rope_base=base, rope_scaling="yarn", rope_scale_factor=factor,
        rope_orig_ctx=orig_ctx, rope_attn_factor=attn_factor,
    )
    inv_freq, mscale = rope_freqs_cfg(cfg)
    pos = np.array([0, 1, 17, orig_ctx - 1, orig_ctx * 2, orig_ctx * 4 - 3])
    angles = pos[:, None] * np.asarray(inv_freq, np.float64)[None, :]
    ours_cos, ours_sin = np.cos(angles) * mscale, np.sin(angles) * mscale
    ref_cos, ref_sin = _ggml_rope_yarn_oracle(
        pos, head_dim, base, 1.0 / factor, orig_ctx, 1.0, attn_factor, 32.0, 1.0)
    np.testing.assert_allclose(ours_cos, ref_cos, atol=1e-4)
    np.testing.assert_allclose(ours_sin, ref_sin, atol=1e-4)

    # ext_factor resolves to 0 when scaling type is linear -> pure 1/factor
    cfg_lin = dataclasses.replace(cfg, rope_scaling="linear")
    inv_lin, ms_lin = rope_freqs_cfg(cfg_lin)
    base_freqs = 1.0 / (base ** (np.arange(0, head_dim, 2) / head_dim))
    np.testing.assert_allclose(np.asarray(inv_lin), base_freqs / factor,
                               rtol=1e-6)
    assert ms_lin == attn_factor


def test_yarn_llama_hf_parity(tmp_path, rng):
    """End-to-end: HF Llama with rope_scaling type=yarn -> GGUF (scaling keys
    written by the converter) -> our forward matches HF logits at positions
    beyond the original context."""
    torch.manual_seed(212)
    orig = 32
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attn_implementation="eager",
        tie_word_embeddings=False,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": orig},
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.rope_scaling == "yarn" and cfg.rope_scale_factor == 4.0
    assert cfg.rope_orig_ctx == orig

    path = tmp_path / "yarn.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32)
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.rope_scaling == "yarn" and lcfg.rope_orig_ctx == orig

    tokens = rng.integers(0, 128, size=(1, 3 * orig)).astype(np.int32)
    b, t = tokens.shape
    kv = KVCache.create(lcfg.n_layers, b, 128, lcfg.n_kv_heads, lcfg.head_dim,
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

    # the blend actually differs from plain linear scaling
    plain_cfg = dataclasses.replace(cfg, rope_scaling="linear")
    path2 = tmp_path / "lin.gguf"
    convert_hf_to_gguf(model.state_dict(), plain_cfg, path2, qtype=GGMLType.F32)
    p2, c2, _ = load_llama_params(path2)
    lin = np.asarray(
        llama_forward(p2, c2, jnp.asarray(tokens), pos, kv, pos, mask,
                      compute_dtype=jnp.float32).logits
    )
    assert np.abs(lin - ours).max() > 1e-3
    assert np.abs(ours - ref).max() < np.abs(lin - ref).max()


def test_deepseek2_yarn_kq_scale():
    """deepseek2 folds the YaRN mscale into kq_scale = mscale^2/sqrt(d) and
    cancels the rope-side mscale (build_deepseek2, llama.cpp:6764-6768)."""
    import math

    from eagle_tpu.gguf.constants import Keys
    from eagle_tpu.models.config import ModelConfig
    from eagle_tpu.ops.rope import rope_mscale_cfg

    arch, factor, log_mul, attn_f = "deepseek2", 40.0, 0.1, 1.0
    md = {
        "general.architecture": arch,
        f"{arch}.embedding_length": 64, f"{arch}.block_count": 1,
        f"{arch}.attention.head_count": 4, f"{arch}.attention.head_count_kv": 4,
        f"{arch}.feed_forward_length": 64, f"{arch}.vocab_size": 16,
        f"{arch}.rope.dimension_count": 16,
        Keys.Rope.SCALING_TYPE.format(arch=arch): "yarn",
        Keys.Rope.SCALING_FACTOR.format(arch=arch): factor,
        Keys.Rope.SCALING_ORIG_CTX.format(arch=arch): 4096,
        Keys.Rope.SCALING_ATTN_FACTOR.format(arch=arch): attn_f,
        Keys.Rope.SCALING_YARN_LOG_MUL.format(arch=arch): log_mul,
    }
    cfg = ModelConfig.from_gguf_metadata(md)
    mscale = attn_f * (1.0 + log_mul * math.log(factor))
    head_dim = 64 // 4
    assert cfg.attn_scale is not None
    np.testing.assert_allclose(cfg.attn_scale,
                               mscale * mscale / math.sqrt(head_dim), rtol=1e-6)
    # and the rope side must NOT apply the 0.1*ln correction again
    assert rope_mscale_cfg(cfg) == attn_f
