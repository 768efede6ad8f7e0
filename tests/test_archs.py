"""Additional model-family support: qwen2 (attention biases) parity vs
transformers, SWA masking."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.models.config import ModelConfig
from eagle_tpu.models.llama import llama_forward
from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags


def run_fwd(params, cfg, tokens, swa=0):
    b, t = tokens.shape
    kv = KVCache.create(cfg.n_layers, b, 32, cfg.n_kv_heads, cfg.head_dim, jnp.float32,
                        v_head_dim=cfg.v_dim)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    kv = kv.with_tags(pos, pos)
    mask = causal_mask_from_tags(kv.slot_pos, pos, swa_window=swa)
    return np.asarray(
        llama_forward(params, cfg, jnp.asarray(tokens), pos, kv, pos, mask,
                      compute_dtype=jnp.float32).logits
    )


def test_qwen2_bias_parity(tmp_path, rng):
    """Qwen2 tiny model through GGUF (with biases) vs transformers."""
    torch.manual_seed(5)
    hf_cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    assert model.model.layers[0].self_attn.q_proj.bias is not None

    from eagle_tpu.models.hf_convert import config_from_hf, convert_hf_to_gguf
    from eagle_tpu.models.loader import load_llama_params

    cfg = config_from_hf(hf_cfg)
    import dataclasses

    cfg = dataclasses.replace(cfg, arch="qwen2", attn_bias=True)
    path = tmp_path / "qwen2.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=None or __import__("eagle_tpu.gguf.constants", fromlist=["GGMLType"]).GGMLType.F32, arch="qwen2")
    params, lcfg, _ = load_llama_params(path)
    assert "bqkv" in params["layers"]

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, lcfg, tokens)
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_swa_mask_limits_attention():
    slot_pos = jnp.asarray([[0, 1, 2, 3, 4, -1]])
    q_pos = jnp.asarray([[4]])
    full = np.asarray(causal_mask_from_tags(slot_pos, q_pos))
    swa = np.asarray(causal_mask_from_tags(slot_pos, q_pos, swa_window=2))
    assert full[0, 0].tolist() == [True, True, True, True, True, False]
    assert swa[0, 0].tolist() == [False, False, False, True, True, False]


def test_mixtral_moe_parity(rng):
    """Mixtral tiny model (MoE top-2 of 4 experts) vs transformers — exercises
    the router/top-k/all-expert-combine path (llm_build_moe_ffn,
    src/llama.cpp:1976)."""
    from eagle_tpu.models.hf_convert import params_from_hf_mixtral

    torch.manual_seed(7)
    hf_cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, attn_implementation="eager",
    )
    model = transformers.MixtralForCausalLM(hf_cfg).eval()
    params, cfg = params_from_hf_mixtral(model)
    assert cfg.n_expert == 4 and cfg.n_expert_used == 2
    assert "ffn_gate_inp" in params["layers"]

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, cfg, tokens)
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_gemma2_parity(rng):
    """Gemma2 tiny model vs transformers — sandwich norms, (1+w) rmsnorm,
    logit softcapping, sqrt(d) embedding scale, query_pre_attn_scalar, and
    alternating sliding-window layers (build_gemma2 in the reference)."""
    from eagle_tpu.models.hf_convert import params_from_hf_gemma2

    torch.manual_seed(9)
    hf_cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, query_pre_attn_scalar=8, sliding_window=4,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        max_position_embeddings=128, attn_implementation="eager",
    )
    model = transformers.Gemma2ForCausalLM(hf_cfg).eval()
    params, cfg = params_from_hf_gemma2(model)
    assert cfg.post_norms and cfg.attn_softcap == 50.0 and cfg.swa_every == 2

    tokens = rng.integers(0, 128, size=(1, 12)).astype(np.int32)
    ours = run_fwd(params, cfg, tokens)
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_phi3_parity(rng):
    """Phi3 tiny model vs transformers — fused qkv/gate_up unpacking."""
    from eagle_tpu.models.hf_convert import params_from_hf_phi3

    torch.manual_seed(11)
    hf_cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    model = transformers.Phi3ForCausalLM(hf_cfg).eval()
    params, cfg = params_from_hf_phi3(model)

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, cfg, tokens)
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_mixtral_gguf_round_trip(tmp_path, rng):
    """Mixtral through GGUF (_exps stacked expert tensors) -> loader ->
    forward matches the direct-conversion path."""
    from eagle_tpu.gguf.constants import GGMLType
    from eagle_tpu.models.hf_convert import (
        convert_hf_to_gguf, params_from_hf_mixtral,
    )
    from eagle_tpu.models.loader import load_llama_params

    torch.manual_seed(7)
    hf_cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, attn_implementation="eager",
    )
    model = transformers.MixtralForCausalLM(hf_cfg).eval()
    direct, cfg = params_from_hf_mixtral(model)
    path = tmp_path / "mixtral.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32,
                       arch="mixtral")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.n_expert == 4 and lcfg.n_expert_used == 2
    assert "w_gate_exps" in params["layers"]

    tokens = rng.integers(0, 128, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        run_fwd(params, lcfg, tokens), run_fwd(direct, cfg, tokens),
        atol=1e-4, rtol=1e-4,
    )


def test_gemma2_gguf_round_trip(tmp_path, rng):
    from eagle_tpu.gguf.constants import GGMLType
    from eagle_tpu.models.hf_convert import (
        convert_hf_to_gguf, params_from_hf_gemma2,
    )
    from eagle_tpu.models.loader import load_llama_params

    torch.manual_seed(9)
    hf_cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, query_pre_attn_scalar=8, sliding_window=4,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        max_position_embeddings=128, attn_implementation="eager",
    )
    model = transformers.Gemma2ForCausalLM(hf_cfg).eval()
    direct, cfg = params_from_hf_gemma2(model)
    path = tmp_path / "gemma2.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32,
                       arch="gemma2")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.post_norms and abs(lcfg.attn_softcap - 50.0) < 1e-6
    assert lcfg.swa_window == 4 and lcfg.swa_every == 2
    assert abs(lcfg.attn_scale - 8 ** -0.5) < 1e-6
    assert "post_attn_norm" in params["layers"]

    tokens = rng.integers(0, 128, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        run_fwd(params, lcfg, tokens), run_fwd(direct, cfg, tokens),
        atol=1e-4, rtol=1e-4,
    )


def test_qwen3_parity(rng):
    """Qwen3 tiny model vs transformers — per-head q/k rms norms before rope
    (attn_q_norm/attn_k_norm [head_dim]), decoupled head_dim (build_qwen3 in
    upstream llama.cpp)."""
    from eagle_tpu.models.hf_convert import params_from_hf_qwen3

    torch.manual_seed(13)
    hf_cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16,  # decoupled: 4*16 != 32
        max_position_embeddings=128, attn_implementation="eager",
    )
    model = transformers.Qwen3ForCausalLM(hf_cfg).eval()
    params, cfg = params_from_hf_qwen3(model)
    assert cfg.head_dim == 16
    assert params["layers"]["attn_q_norm"].shape[-1] == 16

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, cfg, tokens)
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_qwen3_gguf_round_trip(tmp_path, rng):
    """Qwen3 through GGUF: q/k norm tensors + NEOX (unpermuted) q/k rows —
    the reference stores qwen-family rows in the HF half-split layout."""
    from eagle_tpu.gguf.constants import GGMLType
    from eagle_tpu.models.hf_convert import convert_hf_to_gguf, params_from_hf_qwen3
    from eagle_tpu.models.loader import load_llama_params

    torch.manual_seed(13)
    hf_cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, attn_implementation="eager",
    )
    model = transformers.Qwen3ForCausalLM(hf_cfg).eval()
    direct, cfg = params_from_hf_qwen3(model)
    path = tmp_path / "qwen3.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32, arch="qwen3")
    params, lcfg, _ = load_llama_params(path)
    assert "attn_q_norm" in params["layers"]

    tokens = rng.integers(0, 128, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        run_fwd(params, lcfg, tokens), run_fwd(direct, cfg, tokens),
        atol=1e-4, rtol=1e-4,
    )


def test_olmo2_parity(rng):
    """OLMo-2 tiny model vs transformers — post-norm-only blocks and FLAT
    q/k rms norms over the whole projection (build_olmo2 in upstream
    llama.cpp)."""
    from eagle_tpu.models.hf_convert import params_from_hf_olmo2

    torch.manual_seed(17)
    hf_cfg = transformers.Olmo2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
    )
    model = transformers.Olmo2ForCausalLM(hf_cfg).eval()
    params, cfg = params_from_hf_olmo2(model)
    assert "attn_norm" not in params["layers"]  # post-norm-only
    assert "ffn_norm" not in params["layers"]
    assert params["layers"]["attn_q_norm"].shape[-1] == 32  # flat [H*Dh]

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, cfg, tokens)
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_olmo2_gguf_round_trip(tmp_path, rng):
    from eagle_tpu.gguf.constants import GGMLType
    from eagle_tpu.models.hf_convert import convert_hf_to_gguf, params_from_hf_olmo2
    from eagle_tpu.models.loader import load_llama_params

    torch.manual_seed(17)
    hf_cfg = transformers.Olmo2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
    )
    model = transformers.Olmo2ForCausalLM(hf_cfg).eval()
    direct, cfg = params_from_hf_olmo2(model)
    path = tmp_path / "olmo2.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32, arch="olmo2")
    params, lcfg, _ = load_llama_params(path)
    assert "attn_norm" not in params["layers"]
    assert "post_attn_norm" in params["layers"]

    tokens = rng.integers(0, 128, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        run_fwd(params, lcfg, tokens), run_fwd(direct, cfg, tokens),
        atol=1e-4, rtol=1e-4,
    )


def test_qwen2moe_parity(rng):
    """Qwen2-MoE tiny model vs transformers — softmax-all router without
    top-k renorm + shared expert gated by a sigmoid (build_qwen2moe)."""
    from eagle_tpu.models.hf_convert import params_from_hf_qwen2moe

    torch.manual_seed(19)
    hf_cfg = transformers.Qwen2MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=48, shared_expert_intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=128, attn_implementation="eager",
    )
    model = transformers.Qwen2MoeForCausalLM(hf_cfg).eval()
    params, cfg = params_from_hf_qwen2moe(model)
    assert cfg.moe_softmax_all and cfg.n_expert == 4
    assert "w_gate_shexp" in params["layers"]

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, cfg, tokens)
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_qwen2moe_gguf_round_trip(tmp_path, rng):
    from eagle_tpu.gguf.constants import GGMLType
    from eagle_tpu.models.hf_convert import (
        convert_hf_to_gguf, params_from_hf_qwen2moe,
    )
    from eagle_tpu.models.loader import load_llama_params

    torch.manual_seed(19)
    hf_cfg = transformers.Qwen2MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=48, shared_expert_intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=128, attn_implementation="eager",
    )
    model = transformers.Qwen2MoeForCausalLM(hf_cfg).eval()
    direct, cfg = params_from_hf_qwen2moe(model)
    path = tmp_path / "qwen2moe.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32,
                       arch="qwen2moe")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.moe_softmax_all and lcfg.attn_bias
    assert "ffn_gate_inp_shexp" in params["layers"]
    assert "bqkv" in params["layers"]

    tokens = rng.integers(0, 128, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        run_fwd(params, lcfg, tokens), run_fwd(direct, cfg, tokens),
        atol=1e-4, rtol=1e-4,
    )


def test_gemma1_parity(rng):
    """Gemma v1 tiny model vs transformers — gelu FFN, sqrt(d) embedding
    scale, (1+w) rms norms, tied lm_head (build_gemma in the reference)."""
    from eagle_tpu.models.hf_convert import params_from_hf_gemma

    torch.manual_seed(23)
    hf_cfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, attn_implementation="eager",
    )
    model = transformers.GemmaForCausalLM(hf_cfg).eval()
    params, cfg = params_from_hf_gemma(model)
    assert cfg.act == "gelu" and abs(cfg.embd_scale - 32 ** 0.5) < 1e-6

    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, cfg, tokens)
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_gemma1_gguf_round_trip(tmp_path, rng):
    from eagle_tpu.gguf.constants import GGMLType
    from eagle_tpu.models.hf_convert import convert_hf_to_gguf, params_from_hf_gemma
    from eagle_tpu.models.loader import load_llama_params

    torch.manual_seed(23)
    hf_cfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, attn_implementation="eager",
    )
    model = transformers.GemmaForCausalLM(hf_cfg).eval()
    direct, cfg = params_from_hf_gemma(model)
    path = tmp_path / "gemma.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32, arch="gemma")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.act == "gelu" and abs(lcfg.embd_scale - 32 ** 0.5) < 1e-6

    tokens = rng.integers(0, 128, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        run_fwd(params, lcfg, tokens), run_fwd(direct, cfg, tokens),
        atol=1e-4, rtol=1e-4,
    )


# ---------------------------------------------------------------------------
# LayerNorm-family archs (LLM_NORM path): command-r, starcoder2, gpt2, phi2
# ---------------------------------------------------------------------------

import dataclasses

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.hf_convert import convert_hf_to_gguf
from eagle_tpu.models.loader import load_llama_params


def _round_trip(model, cfg, arch, tmp_path, tokens):
    path = tmp_path / f"{arch}.gguf"
    convert_hf_to_gguf(model.state_dict(), cfg, path, qtype=GGMLType.F32, arch=arch)
    params, lcfg, _ = load_llama_params(path)
    ours = run_fwd(params, lcfg, tokens)
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    return ours, theirs


def test_command_r_parity(tmp_path, rng):
    """Cohere/command-r: LayerNorm (no bias), parallel attn+FFN residual,
    logit_scale, interleaved (NORM) rope — build_command_r."""
    torch.manual_seed(11)
    hf_cfg = transformers.CohereConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, logit_scale=0.25,
        layer_norm_eps=1e-5, attn_implementation="eager", use_qk_norm=False,
    )
    model = transformers.CohereForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(
        ModelConfig(
            arch="command-r", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
            n_kv_heads=4, head_dim=8, n_ff=64, rms_eps=1e-5, rope_dim=8,
            n_ctx_train=128,
        ),
        norm_type="layer", parallel_blocks=True, logit_scale=0.25,
    )
    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours, theirs = _round_trip(model, cfg, "command-r", tmp_path, tokens)
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_starcoder2_parity(tmp_path, rng):
    """starcoder2: LayerNorm with biases everywhere, no-gate gelu FFN with
    biases, attention biases."""
    torch.manual_seed(12)
    hf_cfg = transformers.Starcoder2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, norm_epsilon=1e-5, use_bias=True,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    model = transformers.Starcoder2ForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(
        ModelConfig(
            arch="starcoder2", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
            n_kv_heads=2, head_dim=8, n_ff=64, rms_eps=1e-5, rope_dim=8,
            n_ctx_train=128,
        ),
        norm_type="layer", act="gelu", attn_bias=True,
    )
    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours, theirs = _round_trip(model, cfg, "starcoder2", tmp_path, tokens)
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_gpt2_parity(tmp_path, rng):
    """gpt2: learned absolute positions (wpe), fused Conv1D qkv, LayerNorm
    with biases, no rope, tied lm_head — build_gpt2."""
    torch.manual_seed(13)
    hf_cfg = transformers.GPT2Config(
        vocab_size=128, n_embd=32, n_layer=2, n_head=4, n_positions=128,
        n_inner=None, attn_implementation="eager",
    )
    model = transformers.GPT2LMHeadModel(hf_cfg).eval()
    cfg = dataclasses.replace(
        ModelConfig(
            arch="gpt2", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
            n_kv_heads=4, head_dim=8, n_ff=128, rms_eps=1e-5, rope_dim=0,
            n_ctx_train=128,
        ),
        norm_type="layer", act="gelu", has_pos_embd=True,
    )
    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours, theirs = _round_trip(model, cfg, "gpt2", tmp_path, tokens)
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_phi2_parity(tmp_path, rng):
    """phi2: parallel attn+FFN from ONE shared LayerNorm, partial rotary
    (rot_pct), biases incl. lm_head bias — build_phi2."""
    torch.manual_seed(14)
    hf_cfg = transformers.PhiConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, partial_rotary_factor=0.5,
        layer_norm_eps=1e-5, attn_implementation="eager",
        qk_layernorm=False,
    )
    model = transformers.PhiForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(
        ModelConfig(
            arch="phi2", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
            n_kv_heads=4, head_dim=8, n_ff=64, rms_eps=1e-5, rope_dim=4,
            n_ctx_train=128,
        ),
        norm_type="layer", act="gelu", parallel_blocks=True, attn_bias=True,
    )
    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours, theirs = _round_trip(model, cfg, "phi2", tmp_path, tokens)
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


# ---------------------------------------------------------------------------
# deepseek2: MLA attention + leading-dense MoE (build_deepseek2)
# ---------------------------------------------------------------------------


def _deepseek_cfg(q_lora):
    return transformers.AutoConfig.for_model(
        "deepseek_v2",
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, kv_lora_rank=16, q_lora_rank=q_lora,
        qk_nope_head_dim=8, qk_rope_head_dim=4, v_head_dim=8,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, topk_method="greedy", n_group=1, topk_group=1,
        routed_scaling_factor=2.0, norm_topk_prob=False, scoring_func="softmax",
        max_position_embeddings=128, attn_implementation="eager",
        rms_norm_eps=1e-6, tie_word_embeddings=False,
    )


@pytest.mark.parametrize("q_lora", [None, 12])
def test_deepseek2_parity(tmp_path, rng, q_lora):
    torch.manual_seed(21)
    hf_cfg = _deepseek_cfg(q_lora)
    model = transformers.AutoModelForCausalLM.from_config(hf_cfg).eval()
    cfg = dataclasses.replace(
        ModelConfig(
            arch="deepseek2", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
            n_kv_heads=4, head_dim=12, n_ff=64, rms_eps=1e-6, rope_dim=4,
            n_ctx_train=128, n_expert=4, n_expert_used=2, moe_softmax_all=True,
        ),
        kv_lora_rank=16, q_lora_rank=q_lora or 0, v_head_dim=8,
        n_dense_layers=1, n_shared_experts=1, n_ff_exp=32,
        expert_weights_scale=2.0, expert_weights_norm=False,
    )
    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours, theirs = _round_trip(model, cfg, "deepseek2", tmp_path, tokens)
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


# ---------------------------------------------------------------------------
# round-3 arch batch: stablelm / gptneox / nemotron / starcoder(bigcode) /
# bloom / mpt (ALiBi) / olmoe
# ---------------------------------------------------------------------------


def test_stablelm_parity(tmp_path, rng):
    """stablelm: LayerNorm+biases, partial NEOX rope, qkv biases, gated silu
    FFN (build_stablelm)."""
    torch.manual_seed(31)
    hf_cfg = transformers.StableLmConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.25, use_qkv_bias=True, qk_layernorm=False,
        use_parallel_residual=False, layer_norm_eps=1e-5,
        max_position_embeddings=128, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = transformers.StableLmForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(
        ModelConfig(
            arch="stablelm", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
            n_kv_heads=2, head_dim=8, n_ff=64, rms_eps=1e-5, rope_dim=2,
            n_ctx_train=128,
        ),
        norm_type="layer", attn_bias=True,
    )
    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours, theirs = _round_trip(model, cfg, "stablelm", tmp_path, tokens)
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


@pytest.mark.parametrize("parallel", [True, False])
def test_gptneox_parity(tmp_path, rng, parallel):
    """gpt-neox: fused head-interleaved qkv (de-interleaved at convert, like
    the reference's GPTNeoXModel), optional parallel residual with its OWN
    ffn norm, partial rope, no-gate gelu."""
    torch.manual_seed(32)
    hf_cfg = transformers.GPTNeoXConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, rotary_pct=0.25,
        use_parallel_residual=parallel, layer_norm_eps=1e-5,
        hidden_act="gelu_new", max_position_embeddings=128,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    model = transformers.GPTNeoXForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(
        ModelConfig(
            arch="gptneox", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
            n_kv_heads=4, head_dim=8, n_ff=64, rms_eps=1e-5, rope_dim=2,
            n_ctx_train=128,
        ),
        norm_type="layer", act="gelu", parallel_blocks=parallel,
    )
    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours, theirs = _round_trip(model, cfg, "gptneox", tmp_path, tokens)
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_nemotron_parity(tmp_path, rng):
    """nemotron: LayerNorm1P folded to (1+w) at convert, squared-relu no-gate
    FFN, partial NEOX rope (build_nemotron / reference NemotronModel)."""
    torch.manual_seed(33)
    hf_cfg = transformers.NemotronConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        hidden_act="relu2", partial_rotary_factor=0.5, norm_eps=1e-5,
        max_position_embeddings=128, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = transformers.NemotronForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(
        ModelConfig(
            arch="nemotron", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
            n_kv_heads=2, head_dim=8, n_ff=64, rms_eps=1e-5, rope_dim=4,
            n_ctx_train=128,
        ),
        norm_type="layer", act="relu2",
    )
    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours, theirs = _round_trip(model, cfg, "nemotron", tmp_path, tokens)
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_starcoder_parity(tmp_path, rng):
    """starcoder (gpt_bigcode): MQA (one kv head) fused qkv, learned absolute
    positions, LayerNorm+biases, no-gate gelu (build_starcoder)."""
    torch.manual_seed(34)
    hf_cfg = transformers.GPTBigCodeConfig(
        vocab_size=128, n_embd=32, n_layer=2, n_head=4, n_inner=64,
        n_positions=128, multi_query=True, layer_norm_epsilon=1e-5,
        activation_function="gelu_pytorch_tanh", attn_implementation="eager",
    )
    model = transformers.GPTBigCodeForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(
        ModelConfig(
            arch="starcoder", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
            n_kv_heads=1, head_dim=8, n_ff=64, rms_eps=1e-5, rope_dim=0,
            n_ctx_train=128,
        ),
        norm_type="layer", act="gelu", has_pos_embd=True,
    )
    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours, theirs = _round_trip(model, cfg, "starcoder", tmp_path, tokens)
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_bloom_parity(tmp_path, rng):
    """bloom: ALiBi attention bias (no rope), word-embedding LayerNorm, fused
    head-interleaved qkv (build_bloom)."""
    torch.manual_seed(35)
    hf_cfg = transformers.BloomConfig(
        vocab_size=128, hidden_size=32, n_layer=2, n_head=4,
        layer_norm_epsilon=1e-5, attn_implementation="eager",
        tie_word_embeddings=True,
    )
    model = transformers.BloomForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(
        ModelConfig(
            arch="bloom", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
            n_kv_heads=4, head_dim=8, n_ff=128, rms_eps=1e-5, rope_dim=0,
            n_ctx_train=128,
        ),
        norm_type="layer", act="gelu", use_alibi=True,
    )
    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours, theirs = _round_trip(model, cfg, "bloom", tmp_path, tokens)
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_mpt_parity(tmp_path, rng):
    """mpt: ALiBi, fused plain-order Wqkv, bias-free LayerNorm (build_mpt)."""
    torch.manual_seed(36)
    hf_cfg = transformers.MptConfig(
        d_model=32, n_heads=4, n_layers=2, expansion_ratio=2, vocab_size=128,
        max_seq_len=128, attn_config={"alibi": True, "alibi_bias_max": 8, "attn_impl": "torch"},
        learned_pos_emb=False, no_bias=True, layer_norm_epsilon=1e-5,
        attn_implementation="eager",
    )
    model = transformers.MptForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(
        ModelConfig(
            arch="mpt", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
            n_kv_heads=4, head_dim=8, n_ff=64, rms_eps=1e-5, rope_dim=0,
            n_ctx_train=128,
        ),
        norm_type="layer", act="gelu", use_alibi=True,
    )
    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours, theirs = _round_trip(model, cfg, "mpt", tmp_path, tokens)
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_olmoe_parity(tmp_path, rng):
    """olmoe: MoE with softmax-over-all router + flat q/k RMS norms, NEOX
    rope (build_olmoe) — rides the qwen2moe converter/loader machinery."""
    torch.manual_seed(37)
    hf_cfg = transformers.OlmoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        rms_norm_eps=1e-6, max_position_embeddings=128,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    model = transformers.OlmoeForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(
        ModelConfig(
            arch="olmoe", vocab_size=128, n_embd=32, n_layers=2, n_heads=4,
            n_kv_heads=2, head_dim=8, n_ff=32, rms_eps=1e-6, rope_dim=8,
            n_ctx_train=128, n_expert=4, n_expert_used=2, moe_softmax_all=True,
        ),
    )
    tokens = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    ours, theirs = _round_trip(model, cfg, "olmoe", tmp_path, tokens)
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)


def test_permute_matches_reference_llama_permute():
    """Interop regression: our GGUF row permutation must BE the reference's
    LlamaModel.permute (convert_hf_to_gguf.py:1596), and the loader must
    invert it. Round-1 had the forward/inverse maps swapped — an involution
    only at head_dim 4, so writer/loader self-consistency masked it while any
    real reference-converted GGUF would have loaded with scrambled rope
    pairs."""
    from eagle_tpu.models.hf_convert import permute_rows
    from eagle_tpu.models.loader import unpermute_rows

    def ref_permute(w, n_head):
        return (
            w.reshape(n_head, 2, w.shape[0] // n_head // 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(w.shape)
        )

    for hr, h in [(8, 1), (16, 2), (128, 4)]:
        hf = np.arange(hr * h)
        assert (hf[permute_rows(hr * h, h)] == ref_permute(hf, h)).all()
        assert (ref_permute(hf, h)[unpermute_rows(hr * h, h)] == hf).all()
