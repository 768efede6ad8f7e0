"""Perplexity / KLD / quantize tool tests on tiny models."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.gguf.reader import GGUFReader
from eagle_tpu.models.hf_convert import config_from_hf, convert_hf_to_gguf, params_from_hf_llama
from eagle_tpu.tools.perplexity import kl_divergence, perplexity
from eagle_tpu.tools.quantize import pick_type, quantize_gguf


@pytest.fixture(scope="module")
def tiny():
    torch.manual_seed(21)
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(cfg).eval()
    return model


def test_perplexity_matches_torch(tiny, rng):
    params, cfg = params_from_hf_llama(tiny)
    tokens = rng.integers(0, 256, size=128).astype(np.int32)
    ours = perplexity(params, cfg, tokens, n_ctx=64, compute_dtype=jnp.float32)

    # torch reference: NLL over the same positions
    n_ctx, first = 64, 32
    nll, count = 0.0, 0
    with torch.no_grad():
        for c in range(2):
            chunk = torch.tensor(tokens[c * n_ctx : (c + 1) * n_ctx][None, :], dtype=torch.long)
            lp = torch.log_softmax(tiny(chunk).logits.float(), dim=-1)[0]
            targets = chunk[0, first + 1 :]
            nll -= lp[first:-1].gather(1, targets[:, None]).sum().item()
            count += len(targets)
    want = np.exp(nll / count)
    assert ours["ppl"] == pytest.approx(want, rel=1e-3)


def test_kld_q8_small_q4_bigger(tiny, rng):
    params_f, cfg = params_from_hf_llama(tiny)
    tokens = rng.integers(0, 256, size=128).astype(np.int32)
    params_q8, _ = params_from_hf_llama(tiny, quant_type=GGMLType.Q8_0)
    params_q4, _ = params_from_hf_llama(tiny, quant_type=GGMLType.Q4_K)
    kld8 = kl_divergence(params_f, params_q8, cfg, tokens, n_ctx=64,
                         compute_dtype_test=jnp.float32)
    kld4 = kl_divergence(params_f, params_q4, cfg, tokens, n_ctx=64,
                         compute_dtype_test=jnp.float32)
    assert kld8["mean_kld"] < kld4["mean_kld"]
    assert kld8["mean_kld"] < 0.05
    assert kld8["same_top_frac"] > 0.9


def test_quantize_tool_roundtrip(tiny, tmp_path):
    src = tmp_path / "f32.gguf"
    dst = tmp_path / "q4.gguf"
    cfg = config_from_hf(tiny.config)
    convert_hf_to_gguf(tiny.state_dict(), cfg, src, qtype=GGMLType.F32)
    stats = quantize_gguf(src, dst, "Q4_K_M")
    assert stats["bytes_out"] < stats["bytes_in"] * 0.55
    r = GGUFReader(dst)
    assert r.metadata["general.file_type"] == 15
    # norms stayed f32, big mats quantized
    assert r.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLType.F32
    # rows of 64 can't hold K-quants -> fell back to Q8_0
    assert r.tensors["output.weight"].ggml_type == GGMLType.Q8_0
    assert r.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.Q8_0
    # rows of 256 hold Q4_K fine
    assert r.tensors["blk.0.ffn_down.weight"].ggml_type == GGMLType.Q4_K


def test_pick_type_rules():
    assert pick_type("output.weight", (256, 256), "Q4_K_M") == GGMLType.Q6_K
    assert pick_type("blk.0.attn_norm.weight", (64,), "Q4_K_M") == GGMLType.F32
    assert pick_type("blk.0.attn_v.weight", (256, 256), "Q4_K_M") == GGMLType.Q6_K
    assert pick_type("blk.0.ffn_up.weight", (512, 256), "Q4_K_M") == GGMLType.Q4_K


def test_search_quantizer_beats_simple_kld(tiny, rng):
    """The search encoder must yield lower KLD than the simple encoder."""
    import numpy as np

    from eagle_tpu.quant import blocks
    from eagle_tpu.quant.kquant_search import quantize_q4_k_search

    w = tiny.model.layers[0].mlp.down_proj.weight.detach().numpy().astype(np.float32)
    simple = blocks.dequantize(blocks.quantize(w, GGMLType.Q4_K), GGMLType.Q4_K, w.shape)
    srch = blocks.dequantize(quantize_q4_k_search(w), GGMLType.Q4_K, w.shape)
    assert np.mean((srch - w) ** 2) < np.mean((simple - w) ** 2)


def test_imatrix_collection_and_weighted_quant(tiny, rng, tmp_path):
    from eagle_tpu.models.hf_convert import params_from_hf_llama
    from eagle_tpu.tools.imatrix import collect_imatrix, imatrix_for, load_imatrix, save_imatrix

    params, cfg = params_from_hf_llama(tiny)
    # fuse like the loader does
    from eagle_tpu.models.loader import fuse_layer_weights

    params = dict(params, layers=fuse_layer_weights(params["layers"]))
    chunks = [rng.integers(0, 256, size=32).astype(np.int32) for _ in range(2)]
    im = collect_imatrix(params, cfg, chunks)
    assert "blk.0.ffn_down.weight" in im and "output.weight" in im
    assert im["blk.0.ffn_down.weight"].shape == (cfg.n_ff,)
    assert (im["blk.0.ffn_down.weight"] >= 0).all()
    p = tmp_path / "im.npz"
    save_imatrix(im, p)
    im2 = load_imatrix(p)
    np.testing.assert_array_equal(im2["output.weight"], im["output.weight"])
    # alias: attn_v shares attn_q's input stats
    assert imatrix_for("blk.1.attn_v.weight", im) is not None


def test_quantize_gguf_with_search(tiny, tmp_path):
    from eagle_tpu.models.hf_convert import config_from_hf, convert_hf_to_gguf

    src = tmp_path / "f32s.gguf"
    dst = tmp_path / "q4s.gguf"
    convert_hf_to_gguf(tiny.state_dict(), config_from_hf(tiny.config), src, qtype=GGMLType.F32)
    stats = quantize_gguf(src, dst, "Q4_K_M", search=True)
    assert stats["tensors"] > 0
    r = GGUFReader(dst)
    assert r.tensors["blk.0.ffn_down.weight"].ggml_type == GGMLType.Q4_K


def test_trace_forward_records(rng):
    """eval-callback equivalent: one record per layer + embd/norm/logits,
    stats finite, callback invoked (eval-callback.cpp:161 pattern)."""
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from eagle_tpu.models.hf_convert import params_from_hf_llama
    from eagle_tpu.tools.trace import trace_forward

    torch.manual_seed(4)
    model = transformers.LlamaForCausalLM(
        transformers.LlamaConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            attn_implementation="eager",
        )
    ).eval()
    params, cfg = params_from_hf_llama(model)
    seen = []
    recs = trace_forward(params, cfg, rng.integers(0, 64, size=6),
                         callback=seen.append)
    names = [r["name"] for r in recs]
    assert names == ["token_embd", "blk.0.out", "blk.1.out", "result_norm",
                     "result_output"]
    assert len(seen) == len(recs)
    assert not any(r["has_nan"] for r in recs)
    assert recs[-1]["shape"] == (1, 6, 64)


def test_multiple_choice_score_matches_torch(tiny, rng):
    """HellaSwag-style scorer: choice by mean ending log-prob must agree with
    the same math computed directly in torch (perplexity.cpp:964-979)."""
    import torch as _torch

    from eagle_tpu.models.hf_convert import params_from_hf_llama
    from eagle_tpu.tools.perplexity import multiple_choice_score

    params, cfg = params_from_hf_llama(tiny)
    tasks = []
    for i in range(4):
        ctx = rng.integers(0, cfg.vocab_size, size=6).tolist()
        endings = [rng.integers(0, cfg.vocab_size, size=rng.integers(2, 5)).tolist()
                   for _ in range(4)]
        tasks.append({"context": ctx, "endings": endings, "gold": i % 4})
    res = multiple_choice_score(params, cfg, tasks)

    # torch oracle
    for task, det in zip(tasks, res["details"]):
        want = []
        for ending in task["endings"]:
            seq = _torch.tensor([task["context"] + ending], dtype=_torch.long)
            with _torch.no_grad():
                lp = _torch.log_softmax(tiny(seq).logits, dim=-1)[0]
            pos = list(range(len(task["context"]) - 1, seq.shape[1] - 1))
            want.append(float(np.mean([lp[p, seq[0, p + 1]].item() for p in pos])))
        assert int(np.argmax(want)) == det["pick"]
        np.testing.assert_allclose(det["scores"], want, atol=2e-3, rtol=1e-2)
