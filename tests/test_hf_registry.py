"""HF config.json -> ModelConfig registry (the reference's @Model.register
classes in convert_hf_to_gguf.py): arch detection from `architectures`, and
per-family config-key extraction, validated against REAL transformers config
dicts and cross-checked with the GGUF metadata round-trip."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.hf_registry import (
    HF_ARCH_MAP,
    config_from_hf_dict,
    detect_arch,
)


def _cfgdict(cfg, arch_name=None) -> dict:
    """Simulate a real checkpoint's config.json (save_pretrained always
    records `architectures`; bare Config() instances do not)."""
    d = json.loads(cfg.to_json_string())
    if arch_name:
        d["architectures"] = [arch_name]
    return d


def _cfgdict_a(arch_name, cfg) -> dict:
    return _cfgdict(cfg, arch_name)


def test_detect_arch_known_and_unknown():
    assert detect_arch({"architectures": ["MistralForCausalLM"]}) == "llama"
    assert detect_arch({"architectures": ["Gemma2ForCausalLM"]}) == "gemma2"
    assert detect_arch({}) == "llama"  # default like the reference
    with pytest.raises(ValueError):
        detect_arch({"architectures": ["TotallyNovelForCausalLM"]})


def test_llama_generic_fields():
    hf = _cfgdict_a("LlamaForCausalLM", transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=50000.0))
    c = config_from_hf_dict(hf)
    assert (c.arch, c.n_embd, c.n_layers, c.n_heads, c.n_kv_heads) == \
        ("llama", 32, 2, 4, 2)
    assert c.head_dim == 8 and c.rope_dim == 8 and c.n_ff == 64
    assert c.rms_eps == pytest.approx(1e-6)
    assert c.rope_base == pytest.approx(50000.0)
    assert c.n_ctx_train == 256


def test_gpt2_keys():
    hf = _cfgdict_a("GPT2LMHeadModel", transformers.GPT2Config(
        vocab_size=128, n_embd=32, n_layer=2, n_head=4, n_positions=96,
        n_inner=None))
    c = config_from_hf_dict(hf)
    assert c.arch == "gpt2"
    assert (c.n_embd, c.n_layers, c.n_heads, c.n_ff) == (32, 2, 4, 128)
    assert c.rope_dim == 0  # learned positions
    assert c.n_ctx_train == 96


def test_gptneox_rotary_pct():
    hf = _cfgdict_a("GPTNeoXForCausalLM", transformers.GPTNeoXConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.5,
        max_position_embeddings=128, layer_norm_eps=1e-5))
    c = config_from_hf_dict(hf)
    assert c.arch == "gptneox" and c.rope_dim == 4  # 0.5 * head_dim 8


def test_falcon_kv_heads():
    hf = _cfgdict_a("FalconForCausalLM", transformers.FalconConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, new_decoder_architecture=True, num_kv_heads=2))
    c = config_from_hf_dict(hf)
    assert c.arch == "falcon" and c.n_kv_heads == 2 and c.n_ff == 128
    hf = _cfgdict_a("FalconForCausalLM", transformers.FalconConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, new_decoder_architecture=False,
        multi_query=True))
    assert config_from_hf_dict(hf).n_kv_heads == 1


def test_mpt_nested_attn_config():
    hf = _cfgdict_a("MPTForCausalLM", transformers.MptConfig(
        vocab_size=128, d_model=32, n_layers=2, n_heads=4, max_seq_len=192,
        expansion_ratio=3,
        attn_config=transformers.models.mpt.configuration_mpt.MptAttentionConfig(
            clip_qkv=6.0)))
    c = config_from_hf_dict(hf)
    assert c.arch == "mpt" and c.n_ff == 96 and c.n_ctx_train == 192
    assert c.clamp_kqv == pytest.approx(6.0) and c.rope_dim == 0


def test_gemma2_scales_and_softcaps():
    hf = _cfgdict_a("Gemma2ForCausalLM", transformers.Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, sliding_window=64))
    c = config_from_hf_dict(hf)
    assert c.arch == "gemma2" and c.head_dim == 16
    assert c.attn_scale == pytest.approx(16 ** -0.5)
    assert c.attn_softcap == 50.0 and c.final_softcap == 30.0
    assert c.swa_window == 64


def test_mixtral_and_qwen2moe_experts():
    hf = _cfgdict_a("MixtralForCausalLM", transformers.MixtralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=8, num_experts_per_tok=2))
    c = config_from_hf_dict(hf)
    assert c.arch == "mixtral" and (c.n_expert, c.n_expert_used) == (8, 2)

    hf = _cfgdict_a("Qwen2MoeForCausalLM", transformers.Qwen2MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=48, shared_expert_intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2))
    c = config_from_hf_dict(hf)
    assert c.arch == "qwen2moe" and (c.n_expert, c.n_expert_used) == (4, 2)
    assert c.n_ff_exp == 48 and c.n_shared_experts == 1


def test_granite_multipliers():
    hf = _cfgdict_a("GraniteForCausalLM", transformers.GraniteConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        embedding_multiplier=3.0, residual_multiplier=0.8,
        attention_multiplier=0.25, logits_scaling=2.0))
    c = config_from_hf_dict(hf)
    assert c.arch == "granite"
    assert c.embd_scale == 3.0 and c.resid_scale == 0.8
    assert c.attn_scale == 0.25 and c.logit_scale == 0.5


def test_minicpm_scales():
    hf = {
        "architectures": ["MiniCPMForCausalLM"], "vocab_size": 128,
        "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 4,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "rms_norm_eps": 1e-5, "scale_emb": 12.0, "scale_depth": 1.4,
        "dim_model_base": 16, "max_position_embeddings": 128,
    }
    c = config_from_hf_dict(hf)
    assert c.arch == "minicpm"
    assert c.embd_scale == 12.0
    assert c.resid_scale == pytest.approx(1.4 / 2.0)  # /sqrt(L=4)
    assert c.logit_scale == pytest.approx(16 / 32)  # dim_model_base/hidden


def test_deepseek2_mla_dims():
    # real DeepSeek-V2 config.json key shapes
    hf = {
        "architectures": ["DeepseekV2ForCausalLM"], "vocab_size": 128,
        "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 4,
        "qk_nope_head_dim": 8, "qk_rope_head_dim": 4, "v_head_dim": 8,
        "kv_lora_rank": 16, "q_lora_rank": 12, "rms_norm_eps": 1e-6,
        "n_routed_experts": 4, "num_experts_per_tok": 2,
        "n_shared_experts": 1, "first_k_dense_replace": 1,
        "moe_intermediate_size": 32, "routed_scaling_factor": 2.0,
        "norm_topk_prob": False, "max_position_embeddings": 128,
        "rope_scaling": {
            "type": "yarn", "factor": 4.0, "mscale_all_dim": 1.0,
            "original_max_position_embeddings": 32,
        },
    }
    c = config_from_hf_dict(hf)
    assert c.arch == "deepseek2"
    assert c.head_dim == 12 and c.rope_dim == 4 and c.v_head_dim == 8
    assert c.kv_lora_rank == 16 and c.q_lora_rank == 12
    assert (c.n_expert, c.n_expert_used, c.n_ff_exp) == (4, 2, 32)
    assert c.n_dense_layers == 1 and c.n_shared_experts == 1
    assert c.expert_weights_scale == 2.0
    assert c.rope_yarn_log_mul == pytest.approx(0.1)
    assert c.rope_scaling == "yarn" and c.rope_scale_factor == 4.0


def test_mamba_and_rwkv6_recurrent():
    hf = _cfgdict_a("MambaForCausalLM", transformers.MambaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, state_size=8,
        conv_kernel=4, expand=2))
    c = config_from_hf_dict(hf)
    assert c.arch == "mamba" and c.is_recurrent
    assert c.ssm_d_inner == 64 and c.ssm_d_state == 8 and c.ssm_d_conv == 4
    assert c.ssm_dt_rank == 2  # ceil(32/16)

    hf = {
        "architectures": ["Rwkv6ForCausalLM"], "vocab_size": 128,
        "hidden_size": 32, "num_hidden_layers": 2, "head_size": 8,
        "intermediate_size": 112, "layer_norm_epsilon": 1e-5,
        "rescale_every": 6, "attention_hidden_size": 32,
    }
    c = config_from_hf_dict(hf)
    assert c.arch == "rwkv6" and c.wkv_head_size == 8 and c.rescale_every == 6


def test_t5_keys():
    hf = _cfgdict_a("T5ForConditionalGeneration", transformers.T5Config(
        vocab_size=128, d_model=32, num_layers=2, num_heads=4, d_kv=8,
        d_ff=64, relative_attention_num_buckets=8,
        decoder_start_token_id=5))
    c = config_from_hf_dict(hf)
    assert c.arch == "t5" and c.head_dim == 8 and c.n_ff == 64
    assert c.rel_buckets == 8 and c.decoder_start_id == 5


def test_every_mapped_arch_is_loadable():
    """Every registry target is an arch this framework builds a graph for."""
    known = {
        "llama", "mixtral", "deci", "qwen", "qwen2", "qwen2moe", "qwen2vl",
        "qwen3", "qwen3moe", "gemma", "gemma2", "phi2", "phi3", "phimoe",
        "gpt2", "gptneox", "falcon", "stablelm", "starcoder", "starcoder2",
        "refact", "codeshell", "bloom", "mpt", "mamba", "rwkv6", "rwkv6qwen2",
        "t5", "t5encoder", "bert", "nomic-bert", "jina-bert-v2", "command-r",
        "cohere2", "olmo", "olmo2", "olmoe", "granite", "granitemoe",
        "internlm2", "minicpm", "minicpm3", "deepseek", "deepseek2",
        "chatglm", "bitnet", "jais", "nemotron", "exaone", "baichuan",
        "orion", "plamo", "xverse", "arctic", "dbrx", "grok", "chameleon",
    }
    assert set(HF_ARCH_MAP.values()) <= known


# ---------------------------------------------------------------------------
# end-to-end: HF dir -> convert CLI -> Engine -> logits parity


def _write_tokenizer_json(d, vocab_size):
    from eagle_tpu.tokenizer.bpe import _BYTE_ENC

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for b in range(256):
        vocab[_BYTE_ENC[b]] = 3 + b
    while len(vocab) < vocab_size:
        vocab[f"<pad{len(vocab)}>"] = len(vocab)
    tj = {"model": {"type": "BPE", "vocab": vocab, "merges": []},
          "added_tokens": [{"id": 1, "special": True, "content": "<s>"},
                           {"id": 2, "special": True, "content": "</s>"}]}
    (d / "tokenizer.json").write_text(json.dumps(tj))


@pytest.mark.parametrize("family", ["gpt2", "gemma2", "mixtral"])
def test_convert_cli_end_to_end(tmp_path, family):
    """save_pretrained -> convert CLI (registry detection) -> our loader ->
    logits match transformers, for three structurally distinct families."""
    import jax.numpy as jnp

    from eagle_tpu.models.llama import llama_forward
    from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags

    def run_fwd(params, cfg, tokens):
        b, t = tokens.shape
        kv = KVCache.create(cfg.n_layers, b, 32, cfg.n_kv_heads, cfg.head_dim,
                            jnp.float32, v_head_dim=cfg.v_dim)
        pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
        kv = kv.with_tags(pos, pos)
        mask = causal_mask_from_tags(kv.slot_pos, pos)
        return np.asarray(
            llama_forward(params, cfg, jnp.asarray(tokens), pos, kv, pos,
                          mask, compute_dtype=jnp.float32).logits)

    torch.manual_seed(5)
    if family == "gpt2":
        hf_cfg = transformers.GPT2Config(
            vocab_size=300, n_embd=32, n_layer=2, n_head=4, n_positions=128,
            attn_implementation="eager")
        model = transformers.GPT2LMHeadModel(hf_cfg).eval()
    elif family == "gemma2":
        hf_cfg = transformers.Gemma2Config(
            vocab_size=300, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, query_pre_attn_scalar=8, attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0, sliding_window=64,
            max_position_embeddings=128, attn_implementation="eager")
        model = transformers.Gemma2ForCausalLM(hf_cfg).eval()
    else:
        hf_cfg = transformers.MixtralConfig(
            vocab_size=300, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            num_local_experts=4, num_experts_per_tok=2,
            max_position_embeddings=128, attn_implementation="eager",
            tie_word_embeddings=False)
        model = transformers.MixtralForCausalLM(hf_cfg).eval()

    d = tmp_path / "hf"
    model.save_pretrained(d, safe_serialization=True)
    _write_tokenizer_json(d, 300)

    from eagle_tpu.models.loader import load_llama_params
    from eagle_tpu.tools.convert import main

    out = tmp_path / "m.gguf"
    assert main([str(d), str(out), "--qtype=F32"]) == 0
    params, cfg, _ = load_llama_params(out)
    assert cfg.arch == family

    tokens = np.random.default_rng(0).integers(0, 300, size=(1, 10)).astype(np.int32)
    ours = run_fwd(params, cfg, tokens)
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)
