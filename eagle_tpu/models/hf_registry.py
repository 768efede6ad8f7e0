"""HF `config.json` -> (arch, ModelConfig) for the convert CLI — the registry
role of the reference's `@Model.register` classes (convert_hf_to_gguf.py:927-
4966, one class per HF architecture string).

Only the NUMERIC / structural fields that `convert_hf_to_gguf` serializes to
GGUF metadata are extracted here; arch-derived graph flags (norm type,
activation, ALiBi, parallel residual, ...) are reconstructed from the arch
name by `ModelConfig.from_gguf_metadata` at load, exactly as the reference's
`llm_load_hparams` keys them on `LLM_ARCH_*`.

The architecture-string map and the per-family config-key choices are interop
data (they must match what HF checkpoints actually contain)."""

from __future__ import annotations

import math
from types import SimpleNamespace
from typing import Any

from .config import ModelConfig

#: HF `architectures[0]` -> GGUF arch — the union of the reference converter's
#: @Model.register names for every family this framework builds a graph for.
HF_ARCH_MAP: dict[str, str] = {
    "LlamaForCausalLM": "llama",
    "LLaMAForCausalLM": "llama",
    "MistralForCausalLM": "llama",
    "InternLM3ForCausalLM": "llama",
    "MixtralForCausalLM": "mixtral",
    "DeciLMForCausalLM": "deci",
    "Qwen2ForCausalLM": "qwen2",
    "Qwen2MoeForCausalLM": "qwen2moe",
    "Qwen2VLForConditionalGeneration": "qwen2vl",
    "Qwen3ForCausalLM": "qwen3",
    "Qwen3MoeForCausalLM": "qwen3moe",
    "QWenLMHeadModel": "qwen",
    "GemmaForCausalLM": "gemma",
    "Gemma2ForCausalLM": "gemma2",
    "PhiForCausalLM": "phi2",
    "Phi3ForCausalLM": "phi3",
    "PhiMoEForCausalLM": "phimoe",
    "GPT2LMHeadModel": "gpt2",
    "GPTNeoXForCausalLM": "gptneox",
    "FalconForCausalLM": "falcon",
    "RWForCausalLM": "falcon",
    "StableLmForCausalLM": "stablelm",
    "StableLMEpochForCausalLM": "stablelm",
    "GPTBigCodeForCausalLM": "starcoder",
    "Starcoder2ForCausalLM": "starcoder2",
    "GPTRefactForCausalLM": "refact",
    "CodeShellForCausalLM": "codeshell",
    "BloomForCausalLM": "bloom",
    "BloomModel": "bloom",
    "MPTForCausalLM": "mpt",
    "MambaForCausalLM": "mamba",
    "MambaLMHeadModel": "mamba",
    "FalconMambaForCausalLM": "mamba",
    "Rwkv6ForCausalLM": "rwkv6",
    "RWKV6Qwen2ForCausalLM": "rwkv6qwen2",
    "T5ForConditionalGeneration": "t5",
    "T5WithLMHeadModel": "t5",
    "MT5ForConditionalGeneration": "t5",
    "UMT5ForConditionalGeneration": "t5",
    "T5EncoderModel": "t5encoder",
    "BertModel": "bert",
    "BertForMaskedLM": "bert",
    "CamembertModel": "bert",
    "RobertaModel": "bert",
    "XLMRobertaModel": "bert",
    "NomicBertModel": "nomic-bert",
    "JinaBertModel": "jina-bert-v2",
    "JinaBertForMaskedLM": "jina-bert-v2",
    "CohereForCausalLM": "command-r",
    "Cohere2ForCausalLM": "cohere2",
    "OlmoForCausalLM": "olmo",
    "OLMoForCausalLM": "olmo",
    "Olmo2ForCausalLM": "olmo2",
    "OlmoeForCausalLM": "olmoe",
    "GraniteForCausalLM": "granite",
    "GraniteMoeForCausalLM": "granitemoe",
    "InternLM2ForCausalLM": "internlm2",
    "MiniCPMForCausalLM": "minicpm",
    "MiniCPM3ForCausalLM": "minicpm3",
    "DeepseekForCausalLM": "deepseek",
    "DeepseekV2ForCausalLM": "deepseek2",
    "DeepseekV3ForCausalLM": "deepseek2",
    "GlmForCausalLM": "chatglm",
    "ChatGLMModel": "chatglm",
    "ChatGLMForConditionalGeneration": "chatglm",
    "BitnetForCausalLM": "bitnet",
    "JAISLMHeadModel": "jais",
    "NemotronForCausalLM": "nemotron",
    "ExaoneForCausalLM": "exaone",
    "BaichuanForCausalLM": "baichuan",
    "BaiChuanForCausalLM": "baichuan",
    "OrionForCausalLM": "orion",
    "PlamoForCausalLM": "plamo",
    "XverseForCausalLM": "xverse",
    "ArcticForCausalLM": "arctic",
    "DbrxForCausalLM": "dbrx",
    "GrokForCausalLM": "grok",
    "Grok1ForCausalLM": "grok",
    "ChameleonForConditionalGeneration": "chameleon",
    "ChameleonForCausalLM": "chameleon",
}

#: archs whose HF dirs need hand-written layout handling the CLI does not do
#: (per-layer NAS arrays / audio codec / vision tower)
CLI_UNSUPPORTED = frozenset({"openelm", "deci", "wavtokenizer-dec"})


_MISSING = object()


def _g(d: dict, *names, default=_MISSING):
    """First present (non-None) key among aliases."""
    for n in names:
        if d.get(n) is not None:
            return d[n]
    if default is _MISSING:
        raise KeyError(f"config.json has none of {names}")
    return default


def detect_arch(hf: dict[str, Any]) -> str:
    archs = hf.get("architectures") or ["LlamaForCausalLM"]
    name = archs[0]
    if name in HF_ARCH_MAP:
        return HF_ARCH_MAP[name]
    # the reference falls back by suffix heuristics for *ForCausalLM clones
    raise ValueError(
        f"unknown HF architecture {name!r}; pass --arch=<gguf-arch> explicitly"
    )


def config_from_hf_dict(hf: dict[str, Any], arch: str | None = None) -> ModelConfig:
    """Build the ModelConfig the converter serializes, from a raw config.json
    dict. Per-family key choices follow the reference's set_gguf_parameters
    for each registered class."""
    from .hf_convert import _rope_scaling_from_hf

    arch = arch or detect_arch(hf)
    if arch in CLI_UNSUPPORTED:
        raise ValueError(f"{arch}: convert this family via the library API")

    # ---- family-specific layouts that share almost no keys ----------------
    if arch == "mamba":
        d_model = int(_g(hf, "hidden_size", "d_model"))
        dt_rank = _g(hf, "time_step_rank", "dt_rank", default="auto")
        return ModelConfig(
            arch=arch,
            vocab_size=int(_g(hf, "vocab_size")),
            n_embd=d_model,
            n_layers=int(_g(hf, "num_hidden_layers", "n_layer")),
            n_heads=0, n_kv_heads=0, head_dim=0, rope_dim=0,
            n_ff=0,
            rms_eps=float(_g(hf, "layer_norm_epsilon", "rms_norm_eps",
                             default=1e-5)),
            n_ctx_train=int(_g(hf, "max_position_embeddings", default=2048)),
            ssm_d_conv=int(_g(hf, "conv_kernel", "d_conv", default=4)),
            ssm_d_inner=int(_g(hf, "intermediate_size", "d_inner",
                               default=2 * d_model)),
            ssm_d_state=int(_g(hf, "state_size", "d_state", default=16)),
            ssm_dt_rank=(
                math.ceil(d_model / 16) if dt_rank == "auto" else int(dt_rank)
            ),
            ssm_dt_b_c_rms=bool(_g(hf, "mixer_rms_eps", default=False)),
        )
    if arch in ("rwkv6", "rwkv6qwen2"):
        d = int(_g(hf, "hidden_size"))
        return ModelConfig(
            arch=arch,
            vocab_size=int(_g(hf, "vocab_size")),
            n_embd=d,
            n_layers=int(_g(hf, "num_hidden_layers")),
            n_heads=0, n_kv_heads=0, head_dim=0, rope_dim=0,
            n_ff=int(_g(hf, "intermediate_size",
                        default=int(3.5 * d) // 32 * 32)),
            rms_eps=float(_g(hf, "layer_norm_epsilon", "rms_norm_eps",
                             default=1e-5)),
            n_ctx_train=int(_g(hf, "max_position_embeddings", default=1048576)),
            wkv_head_size=int(_g(hf, "head_size", default=64)),
            rescale_every=int(_g(hf, "rescale_every", default=0) or 0),
        )
    if arch in ("t5", "t5encoder"):
        return ModelConfig(
            arch=arch,
            vocab_size=int(_g(hf, "vocab_size")),
            n_embd=int(_g(hf, "d_model")),
            n_layers=int(_g(hf, "num_layers")),
            n_heads=int(_g(hf, "num_heads")),
            n_kv_heads=int(_g(hf, "num_heads")),
            head_dim=int(_g(hf, "d_kv", default=64)),
            rope_dim=0,
            n_ff=int(_g(hf, "d_ff")),
            rms_eps=float(_g(hf, "layer_norm_epsilon", default=1e-6)),
            n_ctx_train=int(_g(hf, "n_positions", default=512)),
            rel_buckets=int(_g(hf, "relative_attention_num_buckets",
                               default=32)),
            decoder_start_id=int(_g(hf, "decoder_start_token_id", default=0)),
        )

    # ---- decoder-family generic keys (alias chains cover the gpt2-style
    # n_embd/n_head/n_layer configs and the mpt/dbrx d_model/n_heads ones) ---
    n_embd = int(_g(hf, "hidden_size", "n_embd", "d_model", "n_embed"))
    n_heads = int(_g(hf, "num_attention_heads", "n_head", "n_heads",
                     "num_heads"))
    n_layers = int(_g(hf, "num_hidden_layers", "n_layer", "n_layers",
                      "num_layers"))
    n_kv = int(_g(hf, "num_key_value_heads", "n_head_kv", "num_kv_heads",
                  "multi_query_group_num", "num_query_groups",
                  default=n_heads))
    head_dim = int(_g(hf, "head_dim", default=n_embd // n_heads))
    n_ff = int(_g(hf, "intermediate_size", "n_inner", "ffn_hidden_size",
                  "encoder_ffn_dim", default=4 * n_embd) or 4 * n_embd)
    n_ctx = int(_g(hf, "max_position_embeddings", "n_positions", "n_ctx",
                   "max_seq_len", "seq_length", "max_sequence_length",
                   "model_max_length", default=2048))
    eps = float(_g(hf, "rms_norm_eps", "layer_norm_epsilon", "layer_norm_eps",
                   "layernorm_epsilon", "norm_epsilon", "norm_eps",
                   default=1e-5))
    rope_base = float(_g(hf, "rope_theta", "rotary_emb_base", default=10000.0))
    kw: dict[str, Any] = dict(
        arch=arch,
        vocab_size=int(_g(hf, "vocab_size", "padded_vocab_size")),
        n_embd=n_embd, n_layers=n_layers, n_heads=n_heads, n_kv_heads=n_kv,
        head_dim=head_dim, n_ff=n_ff, rms_eps=eps, rope_base=rope_base,
        rope_dim=head_dim, n_ctx_train=n_ctx,
        **_rope_scaling_from_hf(SimpleNamespace(**hf)),
    )

    # MoE counts (MixtralModel/Qwen2MoeModel/OlmoeModel/GraniteMoeModel/
    # DeepseekModel set_gguf_parameters key choices)
    n_expert = int(_g(hf, "num_local_experts", "num_experts",
                      "n_routed_experts", default=0) or 0)
    if n_expert:
        kw["n_expert"] = n_expert
        kw["n_expert_used"] = int(_g(hf, "num_experts_per_tok", "moe_top_k",
                                     default=2))
        ff_exp = _g(hf, "moe_intermediate_size", default=0)
        if ff_exp:
            kw["n_ff_exp"] = int(ff_exp)

    # partial rotary (gptneox rotary_pct; stablelm/phi2/nemotron/glm
    # partial_rotary_factor)
    pct = _g(hf, "rotary_pct", "partial_rotary_factor", "rotary_factor",
             default=None)
    if pct is not None:
        kw["rope_dim"] = int(float(pct) * head_dim)

    if arch in ("gpt2", "starcoder", "refact", "jais", "bloom", "mpt",
                "chameleon"):
        kw["rope_dim"] = 0  # learned positions / ALiBi
    if arch == "starcoder" and hf.get("multi_query", True):
        kw["n_kv_heads"] = 1
    if arch == "refact":
        kw["n_kv_heads"] = 1  # MQA (build_refact)
    if arch == "falcon":
        kw["n_kv_heads"] = (
            int(_g(hf, "num_kv_heads", "n_head_kv", default=1))
            if hf.get("new_decoder_architecture") else 1
        )
    if arch == "mpt":
        attn_cfg = hf.get("attn_config") or {}
        if attn_cfg.get("kv_n_heads"):
            kw["n_kv_heads"] = int(attn_cfg["kv_n_heads"])
        if attn_cfg.get("clip_qkv"):
            kw["clamp_kqv"] = float(attn_cfg["clip_qkv"])
        ratio = _g(hf, "expansion_ratio", default=4)
        kw["n_ff"] = int(ratio * n_embd)
    if arch == "dbrx":  # DbrxModel: nested attn_config/ffn_config
        attn_cfg = hf.get("attn_config") or {}
        ffn_cfg = hf.get("ffn_config") or {}
        kw["n_kv_heads"] = int(attn_cfg.get("kv_n_heads", n_heads))
        kw["clamp_kqv"] = float(attn_cfg.get("clip_qkv", 0.0) or 0.0)
        kw["rope_base"] = float(attn_cfg.get("rope_theta", 10000.0))
        kw["n_ff"] = int(ffn_cfg.get("ffn_hidden_size", 4 * n_embd))
        kw["n_expert"] = int(ffn_cfg.get("moe_num_experts", 0) or 0)
        kw["n_expert_used"] = int(ffn_cfg.get("moe_top_k", 0) or 0)
    if arch == "qwen":  # QWenModel: intermediate_size is the doubled w1+w2
        kw["n_ff"] = n_ff // 2
    if arch == "qwen2vl":  # Qwen2VLModel: rope_scaling.mrope_section
        rs = hf.get("rope_scaling") or {}
        if rs.get("mrope_section"):
            kw["mrope_sections"] = tuple(int(v) for v in rs["mrope_section"])
            kw.pop("rope_scaling", None)
            kw.pop("rope_scale_factor", None)
    if arch == "qwen2moe":  # shared expert width rides n_shared_experts=1
        kw["n_shared_experts"] = 1 if hf.get(
            "shared_expert_intermediate_size") else 0
    if arch == "gemma2":  # Gemma2Model softcaps + pre-attn scalar + SWA
        kw["attn_softcap"] = float(_g(hf, "attn_logit_softcapping",
                                      default=0.0) or 0.0)
        kw["final_softcap"] = float(_g(hf, "final_logit_softcapping",
                                       default=0.0) or 0.0)
        kw["swa_window"] = int(_g(hf, "sliding_window", default=4096))
        qpas = _g(hf, "query_pre_attn_scalar", default=None)
        if qpas:
            kw["attn_scale"] = float(qpas) ** -0.5
    if arch in ("phi3", "phimoe"):
        sw = _g(hf, "sliding_window", default=None)
        if sw:
            kw["swa_window"] = int(sw)
        orig = _g(hf, "original_max_position_embeddings", default=0)
        if orig:
            kw["rope_orig_ctx"] = int(orig)
    if arch == "phimoe":  # HF-exact sparsemixer routing (modeling_phimoe)
        kw["moe_sparsemixer"] = True
        _rj = _g(hf, "router_jitter_noise", default=None)
        kw["router_jitter"] = 0.01 if _rj is None else float(_rj)
    if arch in ("command-r", "cohere2"):
        kw["logit_scale"] = float(_g(hf, "logit_scale", default=1.0))
        if arch == "cohere2":
            kw["swa_window"] = int(_g(hf, "sliding_window", default=4096))
    if arch == "olmo":
        clip = _g(hf, "clip_qkv", default=None)
        if clip:
            kw["clamp_kqv"] = float(clip)
    if arch in ("granite", "granitemoe"):  # GraniteModel multiplier keys
        kw["embd_scale"] = float(_g(hf, "embedding_multiplier", default=1.0))
        kw["resid_scale"] = float(_g(hf, "residual_multiplier", default=1.0))
        kw["attn_scale"] = float(_g(hf, "attention_multiplier",
                                    default=head_dim ** -0.5))
        kw["logit_scale"] = 1.0 / float(_g(hf, "logits_scaling", default=1.0))
    if arch == "minicpm":  # MiniCPMModel: scale_emb/scale_depth/dim_model_base
        kw["embd_scale"] = float(_g(hf, "scale_emb", default=1.0))
        kw["resid_scale"] = (
            float(_g(hf, "scale_depth", default=n_layers ** 0.5))
            / n_layers ** 0.5
        )
        kw["logit_scale"] = (
            float(_g(hf, "dim_model_base", default=n_embd)) / n_embd
        )
    if arch in ("deepseek", "deepseek2"):
        kw["n_dense_layers"] = int(_g(hf, "first_k_dense_replace", default=0))
        kw["n_shared_experts"] = int(_g(hf, "n_shared_experts", default=0)
                                     or 0)
        kw["expert_weights_scale"] = float(
            _g(hf, "routed_scaling_factor", default=1.0))
        kw["expert_weights_norm"] = bool(_g(hf, "norm_topk_prob",
                                            default=False))
    if arch == "deepseek2":  # DeepseekV2Model MLA dims
        nope = int(_g(hf, "qk_nope_head_dim"))
        rope = int(_g(hf, "qk_rope_head_dim"))
        kw["head_dim"] = nope + rope
        kw["rope_dim"] = rope
        kw["v_head_dim"] = int(_g(hf, "v_head_dim"))
        kw["kv_lora_rank"] = int(_g(hf, "kv_lora_rank", default=0) or 0)
        kw["q_lora_rank"] = int(_g(hf, "q_lora_rank", default=0) or 0)
        rs = hf.get("rope_scaling") or {}
        if str(rs.get("type", rs.get("rope_type", ""))).lower() == "yarn":
            kw["rope_yarn_log_mul"] = 0.1 * float(
                rs.get("mscale_all_dim", 0.0))
    if arch == "chatglm" and "padded_vocab_size" in hf:
        # legacy ChatGLMModel config: kv_channels is the head dim, rotary
        # covers half of it (ChatGLMModel.set_gguf_parameters)
        kw["head_dim"] = int(_g(hf, "kv_channels", default=head_dim))
        kw["rope_dim"] = kw["head_dim"] // 2
        kw["rope_base"] = 10000.0 * float(_g(hf, "rope_ratio", default=1.0))
        kw["n_layers"] = int(_g(hf, "num_layers"))
    if arch == "jais":  # muP scales (JaisModel set_gguf_parameters)
        kw["embd_scale"] = float(_g(hf, "mup_embeddings_scale",
                                    "embeddings_scale", default=1.0))
        kw["logit_scale"] = float(
            _g(hf, "mup_output_alpha", "width_scale", default=1.0)
        ) * float(_g(hf, "mup_width_scale", default=1.0))
    if arch == "bert":
        kw["rope_dim"] = 0
    return ModelConfig(**kw)
