"""BERT encoder embeddings: parity vs transformers BertModel + GGUF
round-trip (build_bert semantics: post-norm blocks, token types, learned
positions, bidirectional masking over valid tokens)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.bert import bert_forward
from eagle_tpu.models.config import ModelConfig
from eagle_tpu.models.hf_convert import convert_hf_to_gguf
from eagle_tpu.models.loader import load_llama_params


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(9)
    cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", layer_norm_eps=1e-12, attn_implementation="eager",
    )
    return transformers.BertModel(cfg).eval()


def _cfg(model) -> ModelConfig:
    hc = model.config
    return dataclasses.replace(
        ModelConfig(
            arch="bert", vocab_size=hc.vocab_size, n_embd=hc.hidden_size,
            n_layers=hc.num_hidden_layers, n_heads=hc.num_attention_heads,
            n_kv_heads=hc.num_attention_heads,
            head_dim=hc.hidden_size // hc.num_attention_heads,
            n_ff=hc.intermediate_size, rms_eps=hc.layer_norm_eps, rope_dim=0,
            n_ctx_train=hc.max_position_embeddings,
        ),
        norm_type="layer", act="gelu",
    )


def test_bert_round_trip_parity(hf_model, tmp_path):
    cfg = _cfg(hf_model)
    path = tmp_path / "bert.gguf"
    convert_hf_to_gguf(hf_model.state_dict(), cfg, path, qtype=GGMLType.F32, arch="bert")
    params, lcfg, _ = load_llama_params(path)

    rng = np.random.default_rng(3)
    ids = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    out = bert_forward(params, lcfg, jnp.asarray(ids), jnp.asarray([10], np.int32))
    with torch.no_grad():
        theirs = hf_model(torch.tensor(ids, dtype=torch.long)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(out.hidden), theirs, atol=3e-3, rtol=1e-2)


def test_bert_padding_invariance(hf_model, tmp_path):
    """right padding must not change the valid tokens' embeddings or the mean
    pooling (bidirectional mask restricted to valid positions)."""
    cfg = _cfg(hf_model)
    path = tmp_path / "bert.gguf"
    convert_hf_to_gguf(hf_model.state_dict(), cfg, path, qtype=GGMLType.F32, arch="bert")
    params, lcfg, _ = load_llama_params(path)

    rng = np.random.default_rng(4)
    ids = rng.integers(1, 128, size=(1, 6)).astype(np.int32)
    padded = np.zeros((1, 12), np.int32)
    padded[0, :6] = ids[0]
    o1 = bert_forward(params, lcfg, jnp.asarray(ids), jnp.asarray([6], np.int32))
    o2 = bert_forward(params, lcfg, jnp.asarray(padded), jnp.asarray([6], np.int32))
    np.testing.assert_allclose(
        np.asarray(o2.hidden[:, :6]), np.asarray(o1.hidden), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(o2.pooled), np.asarray(o1.pooled), atol=1e-5, rtol=1e-5
    )
