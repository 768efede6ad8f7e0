"""T5 / t5encoder parity vs transformers through the GGUF converter+loader
(build_t5_enc / build_t5_dec, src/llama.cpp:7138,7270): relative-position
bucket bias, unscaled attention, cross-attention, tied-head d^-0.5 scaling,
and the flan-style gated-gelu FFN."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.config import ModelConfig
from eagle_tpu.models.hf_convert import convert_hf_to_gguf
from eagle_tpu.models.loader import load_llama_params
from eagle_tpu.models.t5 import T5Generator, t5_decode, t5_encode


def _mk(seed, gated=False):
    torch.manual_seed(seed)
    hf_cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu" if gated else "relu",
        decoder_start_token_id=0, eos_token_id=1, pad_token_id=0,
        tie_word_embeddings=True,
    )
    model = transformers.T5ForConditionalGeneration(hf_cfg).eval()
    cfg = ModelConfig(
        arch="t5", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
        n_kv_heads=4, head_dim=8, n_ff=64, rope_dim=0, n_ctx_train=512,
        rel_buckets=32, decoder_start_id=0, rms_eps=hf_cfg.layer_norm_epsilon,
    )
    return model, cfg


@pytest.mark.parametrize("gated", [False, True])
def test_t5_parity(tmp_path, rng, gated):
    model, cfg = _mk(71 + gated, gated)
    path = tmp_path / f"t5_{gated}.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32, arch="t5")
    params, lcfg, _ = load_llama_params(path)
    assert params["tied_head"] and lcfg.rel_buckets == 32
    if gated:
        assert "w_gate" in params["dec"]["layers"] or "w_gate_up" in params["dec"]["layers"]

    src = rng.integers(2, 128, size=(1, 11)).astype(np.int32)
    tgt = rng.integers(2, 128, size=(1, 7)).astype(np.int32)
    tgt[0, 0] = 0  # decoder start

    enc_h = t5_encode(params, lcfg, jnp.asarray(src))
    logits = t5_decode(params, lcfg, jnp.asarray(tgt), enc_h, tied_head=True)

    with torch.no_grad():
        hf = model(input_ids=torch.tensor(src, dtype=torch.long),
                   decoder_input_ids=torch.tensor(tgt, dtype=torch.long))
        enc_ref = model.encoder(torch.tensor(src, dtype=torch.long))[0].numpy()
    np.testing.assert_allclose(np.asarray(enc_h), enc_ref, atol=3e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(logits), hf.logits.numpy(),
                               atol=3e-3, rtol=1e-2)


def test_t5_generator_matches_hf_greedy(tmp_path, rng):
    model, cfg = _mk(73)
    path = tmp_path / "t5gen.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32, arch="t5")
    params, lcfg, _ = load_llama_params(path)

    src = rng.integers(2, 128, size=(9,)).astype(np.int32)
    gen = T5Generator(params, lcfg, eos_id=1)
    ours, _ = gen.generate(src, max_new_tokens=8, decoder_start_id=0,
                           stop_at_eos=False)
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor(src[None], dtype=torch.long), max_new_tokens=8,
            do_sample=False, min_new_tokens=8,
        )[0].tolist()
    assert ours == hf_out[1:1 + len(ours)]


def test_t5encoder_parity(tmp_path, rng):
    torch.manual_seed(75)
    hf_cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32, dropout_rate=0.0,
        feed_forward_proj="relu", pad_token_id=0,
    )
    model = transformers.T5EncoderModel(hf_cfg).eval()
    cfg = ModelConfig(
        arch="t5encoder", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
        n_kv_heads=4, head_dim=8, n_ff=64, rope_dim=0, n_ctx_train=512,
        rel_buckets=32, rms_eps=hf_cfg.layer_norm_epsilon,
    )
    path = tmp_path / "t5enc.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32,
                       arch="t5encoder")
    params, lcfg, _ = load_llama_params(path)
    assert "dec" not in params

    src = rng.integers(2, 128, size=(2, 10)).astype(np.int32)
    enc_h = t5_encode(params, lcfg, jnp.asarray(src))
    with torch.no_grad():
        ref = model(torch.tensor(src, dtype=torch.long)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(enc_h), ref, atol=3e-3, rtol=1e-2)
