"""Golden-model parity: our functional llama vs transformers' CPU f32
LlamaForCausalLM (random tiny weights — no downloads). This is the analogue of
the reference's CPU-golden dual-execution tests (tests/test-backend-ops.cpp)
plus its token-for-token greedy parity gate (SURVEY.md §7 stage 3)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.config import ModelConfig
from eagle_tpu.models.hf_convert import config_from_hf, convert_hf_to_gguf, params_from_hf_llama
from eagle_tpu.models.llama import llama_forward
from eagle_tpu.models.loader import load_llama_params
from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags


@pytest.fixture(scope="module")
def tiny_hf():
    torch.manual_seed(7)
    cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=256,  # multiple of 256 so K-quants apply
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


def run_ours(params, cfg: ModelConfig, tokens_np, compute_dtype=jnp.float32, backend=None):
    b, t = tokens_np.shape
    s = 64
    kv = KVCache.create(cfg.n_layers, b, s, cfg.n_kv_heads, cfg.head_dim, dtype=jnp.float32)
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    slots = positions
    kv = kv.with_tags(slots, positions)
    mask = causal_mask_from_tags(kv.slot_pos, positions)
    out = llama_forward(
        params, cfg, jnp.asarray(tokens_np), positions, kv, slots, mask,
        compute_dtype=compute_dtype, backend=backend,
    )
    return np.asarray(out.logits), np.asarray(out.hidden), out.kv


def test_dense_logit_parity(tiny_hf, rng):
    params, cfg = params_from_hf_llama(tiny_hf)
    tokens = rng.integers(0, 256, size=(2, 12)).astype(np.int32)
    ours, _, _ = run_ours(params, cfg, tokens)
    with torch.no_grad():
        theirs = tiny_hf(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_greedy_next_token_parity(tiny_hf, rng):
    params, cfg = params_from_hf_llama(tiny_hf)
    tokens = rng.integers(0, 256, size=(1, 20)).astype(np.int32)
    ours, _, _ = run_ours(params, cfg, tokens)
    with torch.no_grad():
        theirs = tiny_hf(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_array_equal(ours[0, -1].argmax(), theirs[0, -1].argmax())


def test_incremental_decode_matches_prefill(tiny_hf, rng):
    """Prefill-then-decode must produce the same logits as one-shot prefill
    (KV cache correctness)."""
    params, cfg = params_from_hf_llama(tiny_hf)
    tokens = rng.integers(0, 256, size=(1, 10)).astype(np.int32)
    full, _, _ = run_ours(params, cfg, tokens)

    b, s = 1, 64
    kv = KVCache.create(cfg.n_layers, b, s, cfg.n_kv_heads, cfg.head_dim, dtype=jnp.float32)
    # prefill first 6
    pos = jnp.arange(6, dtype=jnp.int32)[None, :]
    kv = kv.with_tags(pos, pos)
    mask = causal_mask_from_tags(kv.slot_pos, pos)
    kv = llama_forward(
        params, cfg, jnp.asarray(tokens[:, :6]), pos, kv, pos, mask, compute_dtype=jnp.float32
    ).kv
    # decode 4 single tokens
    outs = []
    for i in range(6, 10):
        p = jnp.full((1, 1), i, jnp.int32)
        kv = kv.with_tags(p, p)
        mask = causal_mask_from_tags(kv.slot_pos, p)
        fo = llama_forward(
            params, cfg, jnp.asarray(tokens[:, i : i + 1]), p, kv, p, mask,
            compute_dtype=jnp.float32,
        )
        kv = fo.kv
        outs.append(np.asarray(fo.logits)[:, 0])
    np.testing.assert_allclose(np.stack(outs, axis=1), full[:, 6:], atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("qtype", [GGMLType.Q8_0, GGMLType.Q4_K])
def test_quantized_forward_close(tiny_hf, rng, qtype):
    """Quantized pipeline sanity: logits stay correlated with the f32 model."""
    params_q, cfg = params_from_hf_llama(tiny_hf, quant_type=qtype)
    tokens = rng.integers(0, 256, size=(1, 8)).astype(np.int32)
    ours_q, _, _ = run_ours(params_q, cfg, tokens)
    params_f, _ = params_from_hf_llama(tiny_hf)
    ours_f, _, _ = run_ours(params_f, cfg, tokens)
    # correlation of final-position logits
    a, b = ours_q[0, -1], ours_f[0, -1]
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr


def test_gguf_roundtrip_forward(tiny_hf, rng, tmp_path):
    """HF -> GGUF (with llama.cpp's row permutation) -> loader -> forward must
    equal the direct HF path."""
    path = tmp_path / "tiny.gguf"
    hf_cfg = config_from_hf(tiny_hf.config)
    convert_hf_to_gguf(tiny_hf.state_dict(), hf_cfg, path, qtype=GGMLType.F32)
    params_g, cfg_g, _ = load_llama_params(path)
    params_d, cfg_d = params_from_hf_llama(tiny_hf)
    assert cfg_g.n_layers == cfg_d.n_layers
    tokens = rng.integers(0, 256, size=(1, 9)).astype(np.int32)
    lg_g, _, _ = run_ours(params_g, cfg_g, tokens)
    lg_d, _, _ = run_ours(params_d, cfg_d, tokens)
    np.testing.assert_allclose(lg_g, lg_d, atol=1e-4, rtol=1e-4)
