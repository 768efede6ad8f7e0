"""Model hyperparameters, populated from GGUF metadata.

Mirrors the fields llama.cpp reads in llama_model::load_hparams
(src/llama-model.cpp) for the llama/eagle families."""

from __future__ import annotations

import dataclasses
from typing import Any

from ..gguf.constants import Keys


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    arch: str = "llama"
    vocab_size: int = 32000
    n_embd: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    head_dim: int = 128
    n_ff: int = 11008
    rms_eps: float = 1e-5
    rope_base: float = 10000.0
    rope_dim: int = 128  # rotary dims per head
    n_ctx_train: int = 2048
    rope_scaling: str | None = None
    rope_scale_factor: float = 1.0
    # YaRN long-context rope scaling (rope.scaling.* GGUF keys; cparams
    # defaults per llama.cpp:11273-11277 / :11562-11564):
    # original (pre-finetune) context the correction range is computed for
    rope_orig_ctx: int = 0
    # cos/sin magnitude multiplier (rope.scaling.attn_factor; phi3 longrope)
    rope_attn_factor: float = 1.0
    # extrapolation mix: <0 = auto (1.0 when scaling type is yarn, else 0)
    rope_ext_factor: float = -1.0
    rope_beta_fast: float = 32.0
    rope_beta_slow: float = 1.0
    # deepseek2: 0.1*mscale_all_dim — rope-side mscale is cancelled and
    # attn_scale carries mscale² instead (build_deepseek2, llama.cpp:6766)
    rope_yarn_log_mul: float = 0.0
    # EAGLE draft head (LLM_ARCH_EAGLE, src/llama-arch.h:69): single decoder
    # layer fed by ReLU(FC([embed; hidden])), no attn_norm / output_norm weight,
    # lm_head borrowed from the target model.
    is_eagle: bool = False
    # qwen2-style attention q/k/v biases
    attn_bias: bool = False
    # sliding-window attention (mistral-v1/gemma2 style); 0 = disabled
    swa_window: int = 0
    #: layers where SWA applies: 0 = all layers (when swa_window > 0);
    #: n > 0 = every n-th layer starting at 0 (gemma2 alternates, n=2)
    swa_every: int = 0
    # MoE (mixtral family): expert count / experts used per token
    # (llm_build_moe_ffn, src/llama.cpp:1976)
    n_expert: int = 0
    n_expert_used: int = 0
    # gemma2: logit softcapping (build_gemma2, src/llama.cpp)
    attn_softcap: float = 0.0
    final_softcap: float = 0.0
    # gemma2: post-attention / post-ffn norms (sandwich norms)
    post_norms: bool = False
    # gemma: embeddings scaled by sqrt(n_embd)
    embd_scale: float = 1.0
    # attention score scale override (gemma2 query_pre_attn_scalar);
    # None = 1/sqrt(head_dim)
    attn_scale: float | None = None
    # FFN activation: "silu" (llama) | "gelu" (gemma)
    act: str = "silu"
    # MoE router weighting: False = softmax over the selected top-k only
    # (mixtral); True = softmax over ALL experts, then top-k without
    # renormalization (qwen2moe — build_qwen2moe, src/llama.cpp)
    moe_softmax_all: bool = False
    # phimoe HF-exact sparsemixer routing (modeling_phimoe.sparsemixer,
    # inference path): k sequential argmax rounds, each expert weighted by its
    # softmax probability over that round's jitter-masked scores. The
    # reference fork approximates phimoe with the mixtral softmax-top-k rule
    # (build_phi3's MoE branch); HF differs — this matches HF.
    # router_jitter is HF config.router_jitter_noise (0.01 for Phi-3.5-MoE).
    moe_sparsemixer: bool = False
    router_jitter: float = 0.01
    # LLM_NORM (mean-subtracted LayerNorm) vs LLM_NORM_RMS (llm_build_norm):
    # gpt2/starcoder2/command-r/phi2/falcon/gpt-neox use "layer"
    norm_type: str = "rms"
    # parallel residual: x + attn(norm(x)) + ffn(norm(x)) with ONE shared input
    # norm (command-r/phi2/falcon/gpt-neox — build_command_r, build_phi2)
    parallel_blocks: bool = False
    # final-logit multiplier (command-r/granite LLM_KV_LOGIT_SCALE)
    logit_scale: float = 1.0
    # learned absolute position embeddings added to the token embedding
    # (gpt2 position_embd — build_gpt2); rope_dim == 0 disables rope
    has_pos_embd: bool = False
    # ALiBi linear attention bias in place of rope (bloom/mpt/refact —
    # build_bloom; slopes 2^(-8h/H) as in ggml's alibi)
    use_alibi: bool = False
    # Mamba selective SSM (llm_build_mamba, src/llama.cpp:899): recurrent
    # state instead of a KV cache. ssm_d_inner > 0 marks a recurrent arch.
    ssm_d_conv: int = 0
    ssm_d_inner: int = 0
    ssm_d_state: int = 0
    ssm_dt_rank: int = 0
    ssm_dt_b_c_rms: bool = False  # falcon-mamba RMS on dt/B/C
    # rwkv6: per-head linear-attention state width (LLM_KV_WKV_HEAD_SIZE);
    # > 0 marks the rwkv recurrent family
    wkv_head_size: int = 0
    # rwkv6: halve activations every n layers (output weights pre-divided at
    # conversion — LLM_KV_RESCALE_EVERY_N_LAYERS)
    rescale_every: int = 0
    # t5: relative-position bucket count (LLM_KV_ATTENTION_RELATIVE_BUCKETS)
    # and the decoder bootstrap token (LLM_KV_DECODER_START_TOKEN_ID)
    rel_buckets: int = 0
    decoder_start_id: int = 0
    # qwen2vl: m-rope frequency sections (t/h/w[,extra] —
    # LLM_KV_ROPE_DIMENSION_SECTIONS); empty = standard rope
    mrope_sections: tuple = ()
    # heterogeneous per-layer head counts (openelm/deci store arrays under
    # the head-count keys; n_heads/n_kv_heads then hold the MAXIMUM — the KV
    # cache allocation size). deci: head 0 = attention-free layer, kv 0 with
    # heads > 0 = the Nemotron-51B "linear attention" (build_deci)
    head_counts: tuple = ()
    kv_head_counts: tuple = ()

    @property
    def is_recurrent(self) -> bool:
        return self.ssm_d_inner > 0 or self.wkv_head_size > 0
    # granite: residual_scale multiplies each block's output before the add
    resid_scale: float = 1.0
    # deepseek2 MLA (build_deepseek2, src/llama.cpp): low-rank kv compression.
    # kv_lora_rank > 0 switches the attention to q/[c_kv;k_pe]/kv_b form;
    # head_dim is then the QK head dim (nope+rope) and v_head_dim differs.
    kv_lora_rank: int = 0
    q_lora_rank: int = 0
    v_head_dim: int = 0  # 0 = same as head_dim
    # deepseek2 MoE: leading dense layers, shared experts, per-expert FFN
    # width, router weight scale/renorm (LLM_KV_EXPERT_* keys)
    n_dense_layers: int = 0
    n_shared_experts: int = 0
    n_ff_exp: int = 0
    expert_weights_scale: float = 1.0
    expert_weights_norm: bool = False
    # olmo: clamp q/k/v projections to ±clamp_kqv (build_olmo,
    # hparams.f_clamp_kqv; 0 = disabled)
    clamp_kqv: float = 0.0
    # cohere2 sliding-window pattern: every n-th layer (il % n == n-1) is
    # GLOBAL attention, the others sliding (build_cohere2's
    # sliding_window_pattern = 4). Mutually exclusive with swa_every.
    swa_full_every: int = 0
    # cohere2: rope applies ONLY on sliding-window layers; global layers are
    # NoPE (build_cohere2's is_sliding rope gate)
    rope_swa_only: bool = False
    # olmo: non-parametric LayerNorm — norm applies with no weight/bias even
    # though no norm tensors exist (build_olmo passes NULL, NULL to
    # llm_build_norm)
    nonparam_norms: bool = False
    # chameleon: swin-style norms — attn_norm/ffn_norm apply to the block
    # OUTPUTS instead of inputs (build_chameleon's hparams.swin_norm)
    swin_norm: bool = False

    @property
    def v_dim(self) -> int:
        """Per-head value width (differs from the QK head_dim only for MLA)."""
        return self.v_head_dim or self.head_dim

    @property
    def n_q_dim(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def n_kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim

    @staticmethod
    def from_gguf_metadata(md: dict[str, Any]) -> "ModelConfig":
        arch = md[Keys.General.ARCHITECTURE]

        def k(pattern: str, default=None):
            v = md.get(pattern.format(arch=arch), default)
            if v is None:
                raise KeyError(f"missing GGUF key {pattern.format(arch=arch)}")
            return v

        n_embd = int(k(Keys.LLM.EMBEDDING_LENGTH))
        def _is_arr(v):
            return hasattr(v, "__len__") and not isinstance(v, (str, bytes))

        hc_raw = k(Keys.Attention.HEAD_COUNT)
        if _is_arr(hc_raw):  # openelm/deci per-layer arrays
            head_counts = tuple(int(v) for v in hc_raw)
            n_heads = max(head_counts)
        else:
            head_counts = ()
            n_heads = int(hc_raw)
        kvc_raw = k(Keys.Attention.HEAD_COUNT_KV, n_heads)
        if _is_arr(kvc_raw):
            kv_head_counts = tuple(int(v) for v in kvc_raw)
            n_kv_heads = max(kv_head_counts)
        else:
            kv_head_counts = ()
            n_kv_heads = int(kvc_raw)
        # recurrent archs (mamba) store head_count == 0 (MambaModel converter)
        head_dim = int(k(Keys.Attention.KEY_LENGTH, n_embd // max(n_heads, 1)))
        vocab_size = md.get(Keys.LLM.VOCAB_SIZE.format(arch=arch))
        if vocab_size is None:
            vocab_size = len(md[Keys.Tokenizer.LIST])
        n_layers = int(k(Keys.LLM.BLOCK_COUNT))
        is_gemma2 = arch == "gemma2"
        # LLM_NORM (LayerNorm) archs store layer_norm_epsilon; RMS archs store
        # layer_norm_rms_epsilon (llama-arch.cpp LLM_KV_ATTENTION_LAYERNORM_*)
        ln_arch = arch in LAYERNORM_ARCHS
        eps_key = Keys.Attention.LAYERNORM_EPS if ln_arch else Keys.Attention.LAYERNORM_RMS_EPS
        return ModelConfig(
            arch=arch,
            vocab_size=int(vocab_size),
            n_embd=n_embd,
            n_layers=n_layers,
            n_heads=n_heads,
            n_kv_heads=n_kv_heads,
            head_dim=head_dim,
            n_ff=(
                # openelm stores a per-layer array; weights carry exact sizes
                max(int(v) for v in k(Keys.LLM.FEED_FORWARD_LENGTH))
                if _is_arr(k(Keys.LLM.FEED_FORWARD_LENGTH))
                else int(k(Keys.LLM.FEED_FORWARD_LENGTH))
            ),
            head_counts=head_counts,
            kv_head_counts=kv_head_counts,
            rms_eps=float(k(eps_key, 1e-5)),
            rope_base=float(md.get(Keys.Rope.FREQ_BASE.format(arch=arch), 10000.0)),
            rope_dim=(
                0 if arch in NO_ROPE_ARCHS
                # baichuan-13B is the ALiBi variant (llm_load_hparams keys the
                # 7B/13B split on n_layer; build_baichuan cases MODEL_13B)
                or (arch == "baichuan" and n_layers == 40)
                else int(md.get(Keys.Rope.DIMENSION_COUNT.format(arch=arch), head_dim))
            ),
            n_ctx_train=int(k(Keys.LLM.CONTEXT_LENGTH, 2048)),
            rope_scaling=md.get(Keys.Rope.SCALING_TYPE.format(arch=arch)),
            rope_scale_factor=float(md.get(Keys.Rope.SCALING_FACTOR.format(arch=arch), 1.0)),
            rope_orig_ctx=int(
                md.get(Keys.Rope.SCALING_ORIG_CTX.format(arch=arch), 0) or 0
            ),
            rope_attn_factor=float(
                md.get(Keys.Rope.SCALING_ATTN_FACTOR.format(arch=arch), 1.0) or 1.0
            ),
            rope_yarn_log_mul=float(
                md.get(Keys.Rope.SCALING_YARN_LOG_MUL.format(arch=arch), 0.0) or 0.0
            ),
            is_eagle=(arch == "eagle"),
            attn_bias=(arch in ("qwen2", "qwen2moe", "starcoder2")),
            swa_window=int(md.get(f"{arch}.attention.sliding_window", 0) or 0),
            swa_every=2 if is_gemma2 else 0,
            swa_full_every=4 if arch == "cohere2" else 0,
            rope_swa_only=(arch == "cohere2"),
            clamp_kqv=float(md.get(f"{arch}.attention.clamp_kqv", 0.0) or 0.0),
            nonparam_norms=(arch in NONPARAM_NORM_ARCHS),
            n_expert=int(md.get(Keys.LLM.EXPERT_COUNT.format(arch=arch), 0) or 0),
            n_expert_used=int(md.get(Keys.LLM.EXPERT_USED_COUNT.format(arch=arch), 0) or 0),
            attn_softcap=float(
                md.get(f"{arch}.attn_logit_softcapping", 0.0)
                or (30.0 if arch == "grok" else 0.0)  # build_grok's 30*tanh
            ),
            final_softcap=float(md.get(f"{arch}.final_logit_softcapping", 0.0) or 0.0),
            post_norms=is_gemma2,
            embd_scale=(
                float(md.get(f"{arch}.embedding_scale", 0.0) or 0.0)  # minicpm/granite/jais
                or (
                    float(n_embd) ** 0.5 if arch.startswith("gemma")
                    else 12.0 if arch == "minicpm3"  # hardcoded (build_minicpm3)
                    else 78.38367176906169 if arch == "grok"  # build_grok
                    else 1.0
                )
            ),
            attn_scale=(
                # granite/granitemoe store the multiplier directly
                # (LLM_KV_ATTENTION_SCALE); gemma2 stores query_pre_attn_scalar;
                # jais hardcodes 1/d_head (muP — build_jais kq_scale)
                float(md[f"{arch}.attention.scale"])
                if f"{arch}.attention.scale" in md
                else float(md[f"{arch}.attention.query_pre_attn_scalar"]) ** -0.5
                if f"{arch}.attention.query_pre_attn_scalar" in md
                else 1.0 / head_dim if arch == "jais"
                # grok's attn_output_multiplyer feeding 30*tanh (build_grok)
                else 0.08838834764831845 if arch == "grok"
                # deepseek2 YaRN: kq_scale = mscale²/sqrt(d) with mscale =
                # attn_factor*(1 + yarn_log_mul*ln(factor)); the rope-side
                # mscale is cancelled (build_deepseek2, llama.cpp:6764-6768)
                else _ds2_yarn_kq_scale(md, arch, head_dim)
                if md.get(Keys.Rope.SCALING_YARN_LOG_MUL.format(arch=arch))
                else None
            ),
            act=(
                "relu2" if arch == "nemotron"  # squared relu (build_nemotron)
                else "gelu" if arch.startswith("gemma") or arch in GELU_ARCHS
                else "silu"
            ),
            moe_softmax_all=(
                arch in ("qwen2moe", "qwen3moe", "deepseek", "deepseek2", "olmoe")
            ),
            moe_sparsemixer=(arch == "phimoe"),
            # missing-vs-zero matters: router_jitter_noise=0 is a valid
            # stored value (tie-mask width 0) and must not fall back to 0.01
            router_jitter=(
                0.01 if md.get(f"{arch}.router_jitter") is None
                else float(md.get(f"{arch}.router_jitter"))
            ),
            norm_type="layer" if ln_arch else "rms",
            parallel_blocks=(
                arch in PARALLEL_BLOCK_ARCHS
                or bool(md.get(f"{arch}.use_parallel_residual", False))
            ),
            logit_scale=float(
                md.get(f"{arch}.logit_scale", 0.0)
                # build_minicpm3 scales the lm-head input by 256/n_embd
                or (256.0 / n_embd if arch == "minicpm3"
                    else 0.5773502691896257 if arch == "grok"  # build_grok
                    else 1.0)
            ),
            swin_norm=bool(md.get(f"{arch}.swin_norm", False)),
            has_pos_embd=(arch in POS_EMBD_ARCHS),
            use_alibi=(
                arch in ALIBI_ARCHS or (arch == "baichuan" and n_layers == 40)
            ),
            ssm_d_conv=int(md.get(Keys.SSM.CONV_KERNEL.format(arch=arch), 0) or 0),
            ssm_d_inner=int(md.get(Keys.SSM.INNER_SIZE.format(arch=arch), 0) or 0),
            ssm_d_state=int(md.get(Keys.SSM.STATE_SIZE.format(arch=arch), 0) or 0),
            ssm_dt_rank=int(md.get(Keys.SSM.TIME_STEP_RANK.format(arch=arch), 0) or 0),
            ssm_dt_b_c_rms=bool(md.get(Keys.SSM.DT_B_C_RMS.format(arch=arch), False)),
            wkv_head_size=int(md.get(f"{arch}.wkv.head_size", 0) or 0),
            rel_buckets=int(
                md.get(f"{arch}.attention.relative_buckets_count", 0) or 0
            ),
            decoder_start_id=int(md.get(f"{arch}.decoder_start_token_id", 0) or 0),
            mrope_sections=tuple(
                int(v) for v in md.get(f"{arch}.rope.dimension_sections", ())
            ),
            rescale_every=int(md.get(f"{arch}.rescale_every_n_layers", 0) or 0),
            resid_scale=float(
                md.get(f"{arch}.residual_scale", 0.0)
                # build_minicpm3 hardcodes scale_depth/sqrt(n_layer)
                or (1.4 / n_layers ** 0.5 if arch == "minicpm3" else 1.0)
            ),
            kv_lora_rank=int(md.get(f"{arch}.attention.kv_lora_rank", 0) or 0),
            q_lora_rank=int(md.get(f"{arch}.attention.q_lora_rank", 0) or 0),
            v_head_dim=int(md.get(Keys.Attention.VALUE_LENGTH.format(arch=arch), 0) or 0),
            n_dense_layers=int(md.get(f"{arch}.leading_dense_block_count", 0) or 0),
            n_shared_experts=int(md.get(f"{arch}.expert_shared_count", 0) or 0),
            n_ff_exp=int(md.get(f"{arch}.expert_feed_forward_length", 0) or 0),
            expert_weights_scale=float(md.get(f"{arch}.expert_weights_scale", 1.0) or 1.0),
            expert_weights_norm=bool(md.get(f"{arch}.expert_weights_norm", False)),
        )


#: archs whose GGUF q/k rows carry the adjacent-pair rope permutation
#: (reference convert_hf_to_gguf.py LlamaModel.permute; rope type NORM in
#: src/llama-model.cpp). NEOX-rope archs (qwen*, gemma*, phi3, olmo2, ...)
#: store rows in the HF half-split layout and must NOT be (un)permuted.
PERMUTED_ROPE_ARCHS = frozenset(
    {"llama", "mixtral", "eagle", "vicuna", "command-r", "granite",
     # rope type NORM table (src/llama-model.cpp:3963-3983). For archs whose
     # reference converter does NOT permute (cohere2/orion/chatglm), GGUF rows
     # are the HF interleaved-rotary layout, and the interleave->half map the
     # loader applies equals the same inverse permutation. chatglm's partial
     # rotary permutes only the first rope_dim dims per head (loader handles).
     "olmo", "minicpm", "xverse", "baichuan", "orion", "internlm2", "plamo",
     "cohere2", "chatglm", "arctic", "deepseek", "deepseek2", "granitemoe",
     "chameleon", "deci"}
)

#: archs on the mean-subtracted LayerNorm path (LLM_NORM in llm_build_norm)
LAYERNORM_ARCHS = frozenset(
    {"gpt2", "starcoder2", "command-r", "phi2", "falcon", "gptneox",
     "stablelm", "starcoder", "bloom", "mpt", "gptj", "nemotron", "bert",
     "olmo", "orion", "cohere2", "jais", "dbrx", "codeshell", "rwkv6",
     "nomic-bert", "jina-bert-v2"}
)

#: parallel-residual archs: one shared input norm feeds BOTH attention and the
#: FFN, summed into the residual (build_command_r/build_phi2/build_falcon/
#: build_gptj). gptneox/stablelm opt in per-checkpoint via the
#: `{arch}.use_parallel_residual` metadata key (llama-arch.cpp); when their
#: FFN norm tensor exists the FFN branch norms with it instead of sharing.
PARALLEL_BLOCK_ARCHS = frozenset({"command-r", "phi2", "falcon", "gptj",
                                  "cohere2", "plamo"})

#: archs with no rotary embedding at all (learned/ALiBi positions instead)
def _ds2_yarn_kq_scale(md: dict, arch: str, head_dim: int) -> float:
    """deepseek2/minicpm-family YaRN attention scale: the reference folds the
    YaRN magnitude correction into kq_scale = mscale²/sqrt(n_embd_head_k) with
    mscale = attn_factor*(1 + rope_yarn_log_mul*ln(1/freq_scale)) and cancels
    the rope-side mscale (build_deepseek2, src/llama.cpp:6764-6768)."""
    import math

    factor = float(md.get(Keys.Rope.SCALING_FACTOR.format(arch=arch), 1.0) or 1.0)
    attn_factor = float(
        md.get(Keys.Rope.SCALING_ATTN_FACTOR.format(arch=arch), 1.0) or 1.0
    )
    log_mul = float(md.get(Keys.Rope.SCALING_YARN_LOG_MUL.format(arch=arch), 0.0))
    mscale = attn_factor * (1.0 + log_mul * math.log(factor))
    return mscale * mscale / math.sqrt(float(head_dim))


NO_ROPE_ARCHS = frozenset({"gpt2", "starcoder", "bloom", "mpt", "refact",
                           "jais"})

#: learned absolute position embeddings added to the token embedding
POS_EMBD_ARCHS = frozenset({"gpt2", "starcoder"})

#: ALiBi attention bias instead of rotary (build_bloom/build_mpt; slope
#: formula ggml_rope's alibi path / hparams.f_max_alibi_bias)
ALIBI_ARCHS = frozenset({"bloom", "mpt", "refact", "jais", "jina-bert-v2"})

#: no-gate gelu-family FFN / gelu act archs (beyond the gemma family)
GELU_ARCHS = frozenset(
    {"gpt2", "starcoder2", "phi2", "falcon", "gptneox", "starcoder",
     "bloom", "mpt", "gptj", "codeshell", "jina-bert-v2", "grok"}
)

#: archs whose norms are NON-PARAMETRIC: the norm applies with NULL
#: weight/bias and no norm tensors exist in the GGUF (build_olmo)
NONPARAM_NORM_ARCHS = frozenset({"olmo"})
