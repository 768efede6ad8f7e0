"""HuggingFace <-> eagle_tpu conversion.

Two jobs:
1. `params_from_hf_llama` — map a transformers Llama state_dict straight into
   the runtime params pytree (used by parity tests: transformers CPU f32 is our
   golden model, standing in for the reference's CPU backend in its
   test-backend-ops dual-execution pattern).
2. `convert_hf_to_gguf` — write a GGUF file (with the reference converter's q/k
   row permutation, convert_hf_to_gguf.py:1596, so files interchange with
   llama.cpp), the functional replacement for the reference's
   convert_hf_to_gguf.py for the llama + eagle families.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

from ..gguf.constants import GGMLType, Keys
from ..gguf.writer import GGUFWriter
from ..quant.qtensor import quantize_array
from .config import ModelConfig
from .loader import _stack, unpermute_rows


def permute_rows(n_rows: int, n_heads: int) -> np.ndarray:
    """Forward permutation (HF row order -> GGUF row order)."""
    inv = unpermute_rows(n_rows, n_heads)
    out = np.empty_like(inv)
    out[inv] = np.arange(len(inv))
    return out


_HF_LAYER_MAP = {
    "attn_norm": "input_layernorm.weight",
    "wq": "self_attn.q_proj.weight",
    "wk": "self_attn.k_proj.weight",
    "wv": "self_attn.v_proj.weight",
    "wo": "self_attn.o_proj.weight",
    "ffn_norm": "post_attention_layernorm.weight",
    "w_gate": "mlp.gate_proj.weight",
    "w_up": "mlp.up_proj.weight",
    "w_down": "mlp.down_proj.weight",
}


#: table-driven HF->GGUF tensor maps for archs whose block structure the
#: generic llama map doesn't cover (canonical GGUF names: src/llama-arch.cpp
#: tables; HF names: the corresponding transformers modeling files).
#: entry: (gguf_suffix, hf_suffix) or (gguf_suffix, hf_suffix, "conv1d") for
#: HF Conv1D weights stored transposed ([in, out] -> GGUF [out, in]).
GENERIC_HF_MAPS: dict[str, dict[str, Any]] = {
    "command-r": {  # CohereForCausalLM (build_command_r; LayerNorm, parallel)
        "prefix": "model.layers",
        "embed": "model.embed_tokens.weight",
        "final_norm": "model.norm.weight",
        "lm_head": "lm_head.weight",  # usually tied (absent)
        "layer": [
            ("attn_norm.weight", "input_layernorm.weight"),
            ("attn_q.weight", "self_attn.q_proj.weight"),
            ("attn_k.weight", "self_attn.k_proj.weight"),
            ("attn_v.weight", "self_attn.v_proj.weight"),
            ("attn_output.weight", "self_attn.o_proj.weight"),
            ("ffn_gate.weight", "mlp.gate_proj.weight"),
            ("ffn_up.weight", "mlp.up_proj.weight"),
            ("ffn_down.weight", "mlp.down_proj.weight"),
        ],
    },
    "cohere2": {  # Cohere2ForCausalLM (build_cohere2; LayerNorm, parallel
        # blocks, 3-of-4 sliding-window layers, rope only when sliding).
        # Rows stay in the HF interleaved-rotary layout (Cohere2Model has no
        # permute); the loader's interleave->half map restores half-split.
        "prefix": "model.layers",
        "embed": "model.embed_tokens.weight",
        "final_norm": "model.norm.weight",
        "lm_head": "lm_head.weight",  # usually tied (absent)
        "layer": [
            ("attn_norm.weight", "input_layernorm.weight"),
            ("attn_q.weight", "self_attn.q_proj.weight"),
            ("attn_k.weight", "self_attn.k_proj.weight"),
            ("attn_v.weight", "self_attn.v_proj.weight"),
            ("attn_output.weight", "self_attn.o_proj.weight"),
            ("ffn_gate.weight", "mlp.gate_proj.weight"),
            ("ffn_up.weight", "mlp.up_proj.weight"),
            ("ffn_down.weight", "mlp.down_proj.weight"),
        ],
    },
    "chatglm": {  # GlmForCausalLM (glm-4 split-qkv form of build_chatglm:
        # RMSNorm, q/k/v biases, partial interleaved rotary, fused-SWIGLU
        # ffn_up; ChatGLMModel keeps HF layout — no permute at write)
        "prefix": "model.layers",
        "embed": "model.embed_tokens.weight",
        "final_norm": "model.norm.weight",
        "lm_head": "lm_head.weight",
        "layer": [
            ("attn_norm.weight", "input_layernorm.weight"),
            ("attn_q.weight", "self_attn.q_proj.weight"),
            ("attn_q.bias", "self_attn.q_proj.bias"),
            ("attn_k.weight", "self_attn.k_proj.weight"),
            ("attn_k.bias", "self_attn.k_proj.bias"),
            ("attn_v.weight", "self_attn.v_proj.weight"),
            ("attn_v.bias", "self_attn.v_proj.bias"),
            ("attn_output.weight", "self_attn.o_proj.weight"),
            ("ffn_norm.weight", "post_attention_layernorm.weight"),
            ("ffn_up.weight", "mlp.gate_up_proj.weight"),
            ("ffn_down.weight", "mlp.down_proj.weight"),
        ],
    },
    "qwen": {  # QWenLMHeadModel (qwen v1: RMS, fused c_attn+bias MHA, NEOX
        # rope, silu; w2=gate / w1=up per the reference tensor map)
        "prefix": "transformer.h",
        "embed": "transformer.wte.weight",
        "final_norm": "transformer.ln_f.weight",
        "lm_head": "lm_head.weight",
        "layer": [
            ("attn_norm.weight", "ln_1.weight"),
            ("attn_qkv.weight", "attn.c_attn.weight"),
            ("attn_qkv.bias", "attn.c_attn.bias"),
            ("attn_output.weight", "attn.c_proj.weight"),
            ("ffn_norm.weight", "ln_2.weight"),
            ("ffn_gate.weight", "mlp.w2.weight"),
            ("ffn_up.weight", "mlp.w1.weight"),
            ("ffn_down.weight", "mlp.c_proj.weight"),
        ],
    },
    "exaone": {  # ExaoneForCausalLM (build_exaone: llama graph, NEOX rope,
        # transformer.h naming with attn.attention + c_fc_0/c_fc_1 FFN)
        "prefix": "transformer.h",
        "embed": "transformer.wte.weight",
        "final_norm": "transformer.ln_f.weight",
        "lm_head": "lm_head.weight",
        "layer": [
            ("attn_norm.weight", "ln_1.weight"),
            ("attn_q.weight", "attn.attention.q_proj.weight"),
            ("attn_k.weight", "attn.attention.k_proj.weight"),
            ("attn_v.weight", "attn.attention.v_proj.weight"),
            ("attn_output.weight", "attn.attention.out_proj.weight"),
            ("ffn_norm.weight", "ln_2.weight"),
            ("ffn_gate.weight", "mlp.c_fc_0.weight"),
            ("ffn_up.weight", "mlp.c_fc_1.weight"),
            ("ffn_down.weight", "mlp.c_proj.weight"),
        ],
    },
    "codeshell": {  # CodeShellForCausalLM (build_codeshell: gpt2-style LN +
        # biases + fused qkv MQA, but rotary instead of learned positions)
        "prefix": "transformer.h",
        "embed": "transformer.wte.weight",
        "final_norm": "transformer.ln_f.weight",
        "final_norm_b": "transformer.ln_f.bias",
        "lm_head": "lm_head.weight",
        "layer": [
            ("attn_norm.weight", "ln_1.weight"),
            ("attn_norm.bias", "ln_1.bias"),
            ("attn_qkv.weight", "attn.c_attn.weight"),
            ("attn_qkv.bias", "attn.c_attn.bias"),
            ("attn_output.weight", "attn.c_proj.weight"),
            ("attn_output.bias", "attn.c_proj.bias"),
            ("ffn_norm.weight", "ln_2.weight"),
            ("ffn_norm.bias", "ln_2.bias"),
            ("ffn_up.weight", "mlp.c_fc.weight"),
            ("ffn_up.bias", "mlp.c_fc.bias"),
            ("ffn_down.weight", "mlp.c_proj.weight"),
            ("ffn_down.bias", "mlp.c_proj.bias"),
        ],
    },
    "refact": {  # GPTRefactForCausalLM (build_refact: RMS norms, separate
        # q/k/v MQA, ALiBi instead of rope, silu-gated linear_1/linear_3 FFN)
        "prefix": "transformer.h",
        "embed": "transformer.wte.weight",
        "final_norm": "transformer.ln_f.weight",
        "lm_head": "lm_head.weight",
        "layer": [
            ("attn_norm.weight", "ln_1.weight"),
            ("attn_q.weight", "attn.q.weight"),
            ("attn_k.weight", "attn.k.weight"),
            ("attn_v.weight", "attn.v.weight"),
            ("attn_output.weight", "attn.c_proj.weight"),
            ("ffn_norm.weight", "ln_2.weight"),
            ("ffn_gate.weight", "mlp.linear_1.weight"),
            ("ffn_up.weight", "mlp.linear_3.weight"),
            ("ffn_down.weight", "mlp.c_proj.weight"),
        ],
    },
    "plamo": {  # PlamoForCausalLM (build_plamo: ONE shared RMS norm feeds
        # attention AND FFN, x + attn + ffn parallel residual; the doubly
        # nested model.layers.layers prefix is plamo's own naming)
        "prefix": "model.layers.layers",
        "embed": "model.embed_tokens.weight",
        "final_norm": "model.norm.weight",
        "lm_head": "lm_head.weight",
        "layer": [
            ("attn_norm.weight", "norm.weight"),
            ("attn_q.weight", "self_attn.q_proj.weight"),
            ("attn_k.weight", "self_attn.k_proj.weight"),
            ("attn_v.weight", "self_attn.v_proj.weight"),
            ("attn_output.weight", "self_attn.o_proj.weight"),
            ("ffn_gate.weight", "mlp.gate_proj.weight"),
            ("ffn_up.weight", "mlp.up_proj.weight"),
            ("ffn_down.weight", "mlp.down_proj.weight"),
        ],
    },
    "orion": {  # OrionForCausalLM (build_orion: LayerNorm with biases,
        # llama-shaped attention/FFN; converter keeps HF row layout)
        "prefix": "model.layers",
        "embed": "model.embed_tokens.weight",
        "final_norm": "model.norm.weight",
        "final_norm_b": "model.norm.bias",
        "lm_head": "lm_head.weight",
        "layer": [
            ("attn_norm.weight", "input_layernorm.weight"),
            ("attn_norm.bias", "input_layernorm.bias"),
            ("attn_q.weight", "self_attn.q_proj.weight"),
            ("attn_k.weight", "self_attn.k_proj.weight"),
            ("attn_v.weight", "self_attn.v_proj.weight"),
            ("attn_output.weight", "self_attn.o_proj.weight"),
            ("ffn_norm.weight", "post_attention_layernorm.weight"),
            ("ffn_norm.bias", "post_attention_layernorm.bias"),
            ("ffn_gate.weight", "mlp.gate_proj.weight"),
            ("ffn_up.weight", "mlp.up_proj.weight"),
            ("ffn_down.weight", "mlp.down_proj.weight"),
        ],
    },
    "jais": {  # JAISLMHeadModel (build_jais: gpt2-style LN + fused c_attn,
        # ALiBi, muP scales, SILU-gated c_fc2/c_fc FFN WITH biases)
        "prefix": "transformer.h",
        "embed": "transformer.wte.weight",
        "final_norm": "transformer.ln_f.weight",
        "final_norm_b": "transformer.ln_f.bias",
        "lm_head": "lm_head.weight",
        "layer": [
            ("attn_norm.weight", "ln_1.weight"),
            ("attn_norm.bias", "ln_1.bias"),
            ("attn_qkv.weight", "attn.c_attn.weight", "conv1d"),
            ("attn_qkv.bias", "attn.c_attn.bias"),
            ("attn_output.weight", "attn.c_proj.weight", "conv1d"),
            ("attn_output.bias", "attn.c_proj.bias"),
            ("ffn_norm.weight", "ln_2.weight"),
            ("ffn_norm.bias", "ln_2.bias"),
            ("ffn_gate.weight", "mlp.c_fc2.weight", "conv1d"),
            ("ffn_gate.bias", "mlp.c_fc2.bias"),
            ("ffn_up.weight", "mlp.c_fc.weight", "conv1d"),
            ("ffn_up.bias", "mlp.c_fc.bias"),
            ("ffn_down.weight", "mlp.c_proj.weight", "conv1d"),
            ("ffn_down.bias", "mlp.c_proj.bias"),
        ],
    },
    "starcoder2": {  # Starcoder2ForCausalLM (LayerNorm+biases, no-gate gelu)
        "prefix": "model.layers",
        "embed": "model.embed_tokens.weight",
        "final_norm": "model.norm.weight",
        "final_norm_b": "model.norm.bias",
        "lm_head": "lm_head.weight",  # absent (tied) in many checkpoints
        "layer": [
            ("attn_norm.weight", "input_layernorm.weight"),
            ("attn_norm.bias", "input_layernorm.bias"),
            ("attn_q.weight", "self_attn.q_proj.weight"),
            ("attn_q.bias", "self_attn.q_proj.bias"),
            ("attn_k.weight", "self_attn.k_proj.weight"),
            ("attn_k.bias", "self_attn.k_proj.bias"),
            ("attn_v.weight", "self_attn.v_proj.weight"),
            ("attn_v.bias", "self_attn.v_proj.bias"),
            ("attn_output.weight", "self_attn.o_proj.weight"),
            ("attn_output.bias", "self_attn.o_proj.bias"),
            ("ffn_norm.weight", "post_attention_layernorm.weight"),
            ("ffn_norm.bias", "post_attention_layernorm.bias"),
            ("ffn_up.weight", "mlp.c_fc.weight"),
            ("ffn_up.bias", "mlp.c_fc.bias"),
            ("ffn_down.weight", "mlp.c_proj.weight"),
            ("ffn_down.bias", "mlp.c_proj.bias"),
        ],
    },
    "gpt2": {  # GPT2LMHeadModel (wpe, fused Conv1D qkv, no rope — build_gpt2)
        "prefix": "transformer.h",
        "embed": "transformer.wte.weight",
        "pos_embd": "transformer.wpe.weight",
        "final_norm": "transformer.ln_f.weight",
        "final_norm_b": "transformer.ln_f.bias",
        "layer": [
            ("attn_norm.weight", "ln_1.weight"),
            ("attn_norm.bias", "ln_1.bias"),
            ("attn_qkv.weight", "attn.c_attn.weight", "conv1d"),
            ("attn_qkv.bias", "attn.c_attn.bias"),
            ("attn_output.weight", "attn.c_proj.weight", "conv1d"),
            ("attn_output.bias", "attn.c_proj.bias"),
            ("ffn_norm.weight", "ln_2.weight"),
            ("ffn_norm.bias", "ln_2.bias"),
            ("ffn_up.weight", "mlp.c_fc.weight", "conv1d"),
            ("ffn_up.bias", "mlp.c_fc.bias"),
            ("ffn_down.weight", "mlp.c_proj.weight", "conv1d"),
            ("ffn_down.bias", "mlp.c_proj.bias"),
        ],
    },
    "phi2": {  # PhiForCausalLM (parallel blocks, partial rotary, lm_head bias)
        "prefix": "model.layers",
        "embed": "model.embed_tokens.weight",
        "final_norm": "model.final_layernorm.weight",
        "final_norm_b": "model.final_layernorm.bias",
        "lm_head": "lm_head.weight",
        "lm_head_b": "lm_head.bias",
        "layer": [
            ("attn_norm.weight", "input_layernorm.weight"),
            ("attn_norm.bias", "input_layernorm.bias"),
            ("attn_q.weight", "self_attn.q_proj.weight"),
            ("attn_q.bias", "self_attn.q_proj.bias"),
            ("attn_k.weight", "self_attn.k_proj.weight"),
            ("attn_k.bias", "self_attn.k_proj.bias"),
            ("attn_v.weight", "self_attn.v_proj.weight"),
            ("attn_v.bias", "self_attn.v_proj.bias"),
            ("attn_output.weight", "self_attn.dense.weight"),
            ("attn_output.bias", "self_attn.dense.bias"),
            ("ffn_up.weight", "mlp.fc1.weight"),
            ("ffn_up.bias", "mlp.fc1.bias"),
            ("ffn_down.weight", "mlp.fc2.weight"),
            ("ffn_down.bias", "mlp.fc2.bias"),
        ],
    },
    "stablelm": {  # StableLmForCausalLM (LayerNorm+biases, partial NEOX rope)
        "prefix": "model.layers",
        "embed": "model.embed_tokens.weight",
        "final_norm": "model.norm.weight",
        "final_norm_b": "model.norm.bias",
        "lm_head": "lm_head.weight",
        "layer": [
            ("attn_norm.weight", "input_layernorm.weight"),
            ("attn_norm.bias", "input_layernorm.bias"),
            ("attn_q.weight", "self_attn.q_proj.weight"),
            ("attn_q.bias", "self_attn.q_proj.bias"),
            ("attn_k.weight", "self_attn.k_proj.weight"),
            ("attn_k.bias", "self_attn.k_proj.bias"),
            ("attn_v.weight", "self_attn.v_proj.weight"),
            ("attn_v.bias", "self_attn.v_proj.bias"),
            ("attn_output.weight", "self_attn.o_proj.weight"),
            ("ffn_norm.weight", "post_attention_layernorm.weight"),
            ("ffn_norm.bias", "post_attention_layernorm.bias"),
            ("ffn_gate.weight", "mlp.gate_proj.weight"),
            ("ffn_up.weight", "mlp.up_proj.weight"),
            ("ffn_down.weight", "mlp.down_proj.weight"),
        ],
    },
    "gptneox": {  # GPTNeoXForCausalLM (fused interleaved qkv, optional
        # parallel residual with its own ffn norm — GPTNeoXModel converter)
        "prefix": "gpt_neox.layers",
        "embed": "gpt_neox.embed_in.weight",
        "final_norm": "gpt_neox.final_layer_norm.weight",
        "final_norm_b": "gpt_neox.final_layer_norm.bias",
        "lm_head": "embed_out.weight",
        "layer": [
            ("attn_norm.weight", "input_layernorm.weight"),
            ("attn_norm.bias", "input_layernorm.bias"),
            ("attn_qkv.weight", "attention.query_key_value.weight", "neox_qkv"),
            ("attn_qkv.bias", "attention.query_key_value.bias", "neox_qkv_b"),
            ("attn_output.weight", "attention.dense.weight"),
            ("attn_output.bias", "attention.dense.bias"),
            ("ffn_norm.weight", "post_attention_layernorm.weight"),
            ("ffn_norm.bias", "post_attention_layernorm.bias"),
            ("ffn_up.weight", "mlp.dense_h_to_4h.weight"),
            ("ffn_up.bias", "mlp.dense_h_to_4h.bias"),
            ("ffn_down.weight", "mlp.dense_4h_to_h.weight"),
            ("ffn_down.bias", "mlp.dense_4h_to_h.bias"),
        ],
    },
    "nemotron": {  # NemotronForCausalLM (LayerNorm1p folded to w+1, relu^2
        # no-gate FFN, partial NEOX rope — reference NemotronModel)
        "prefix": "model.layers",
        "embed": "model.embed_tokens.weight",
        "final_norm": ("model.norm.weight", "add1"),
        "final_norm_b": "model.norm.bias",
        "lm_head": "lm_head.weight",
        "layer": [
            ("attn_norm.weight", "input_layernorm.weight", "add1"),
            ("attn_norm.bias", "input_layernorm.bias"),
            ("attn_q.weight", "self_attn.q_proj.weight"),
            ("attn_k.weight", "self_attn.k_proj.weight"),
            ("attn_v.weight", "self_attn.v_proj.weight"),
            ("attn_output.weight", "self_attn.o_proj.weight"),
            ("ffn_norm.weight", "post_attention_layernorm.weight", "add1"),
            ("ffn_norm.bias", "post_attention_layernorm.bias"),
            ("ffn_up.weight", "mlp.up_proj.weight"),
            ("ffn_down.weight", "mlp.down_proj.weight"),
        ],
    },
    "starcoder": {  # GPTBigCodeForCausalLM (MQA fused qkv Linear, learned
        # positions, LayerNorm+biases, no-gate gelu — build_starcoder)
        "prefix": "transformer.h",
        "embed": "transformer.wte.weight",
        "pos_embd": "transformer.wpe.weight",
        "final_norm": "transformer.ln_f.weight",
        "final_norm_b": "transformer.ln_f.bias",
        "layer": [
            ("attn_norm.weight", "ln_1.weight"),
            ("attn_norm.bias", "ln_1.bias"),
            ("attn_qkv.weight", "attn.c_attn.weight"),
            ("attn_qkv.bias", "attn.c_attn.bias"),
            ("attn_output.weight", "attn.c_proj.weight"),
            ("attn_output.bias", "attn.c_proj.bias"),
            ("ffn_norm.weight", "ln_2.weight"),
            ("ffn_norm.bias", "ln_2.bias"),
            ("ffn_up.weight", "mlp.c_fc.weight"),
            ("ffn_up.bias", "mlp.c_fc.bias"),
            ("ffn_down.weight", "mlp.c_proj.weight"),
            ("ffn_down.bias", "mlp.c_proj.bias"),
        ],
    },
    "bloom": {  # BloomForCausalLM (ALiBi, embedding LayerNorm, fused
        # interleaved qkv — reference BloomModel converter)
        "prefix": "transformer.h",
        "embed": "transformer.word_embeddings.weight",
        "embed_norm": "transformer.word_embeddings_layernorm.weight",
        "embed_norm_b": "transformer.word_embeddings_layernorm.bias",
        "final_norm": "transformer.ln_f.weight",
        "final_norm_b": "transformer.ln_f.bias",
        "layer": [
            ("attn_norm.weight", "input_layernorm.weight"),
            ("attn_norm.bias", "input_layernorm.bias"),
            ("attn_qkv.weight", "self_attention.query_key_value.weight", "neox_qkv"),
            ("attn_qkv.bias", "self_attention.query_key_value.bias", "neox_qkv_b"),
            ("attn_output.weight", "self_attention.dense.weight"),
            ("attn_output.bias", "self_attention.dense.bias"),
            ("ffn_norm.weight", "post_attention_layernorm.weight"),
            ("ffn_norm.bias", "post_attention_layernorm.bias"),
            ("ffn_up.weight", "mlp.dense_h_to_4h.weight"),
            ("ffn_up.bias", "mlp.dense_h_to_4h.bias"),
            ("ffn_down.weight", "mlp.dense_4h_to_h.weight"),
            ("ffn_down.bias", "mlp.dense_4h_to_h.bias"),
        ],
    },
    "bert": {  # BertModel (encoder embeddings — build_bert)
        "prefix": "encoder.layer",
        "embed": "embeddings.word_embeddings.weight",
        "token_types": "embeddings.token_type_embeddings.weight",
        "pos_embd": "embeddings.position_embeddings.weight",
        "embed_norm": "embeddings.LayerNorm.weight",
        "embed_norm_b": "embeddings.LayerNorm.bias",
        "final_norm": "\0absent",  # encoders have no final norm tensor
        "layer": [
            ("attn_q.weight", "attention.self.query.weight"),
            ("attn_q.bias", "attention.self.query.bias"),
            ("attn_k.weight", "attention.self.key.weight"),
            ("attn_k.bias", "attention.self.key.bias"),
            ("attn_v.weight", "attention.self.value.weight"),
            ("attn_v.bias", "attention.self.value.bias"),
            ("attn_output.weight", "attention.output.dense.weight"),
            ("attn_output.bias", "attention.output.dense.bias"),
            ("attn_output_norm.weight", "attention.output.LayerNorm.weight"),
            ("attn_output_norm.bias", "attention.output.LayerNorm.bias"),
            ("ffn_up.weight", "intermediate.dense.weight"),
            ("ffn_up.bias", "intermediate.dense.bias"),
            ("ffn_down.weight", "output.dense.weight"),
            ("ffn_down.bias", "output.dense.bias"),
            ("layer_output_norm.weight", "output.LayerNorm.weight"),
            ("layer_output_norm.bias", "output.LayerNorm.bias"),
        ],
    },
    "nomic-bert": {  # NomicBertModel (bert block + NEOX rope, fused qkv
        # without biases, silu-gated fc11/fc12 FFN — build_bert's nomic arm)
        "prefix": "encoder.layers",
        "embed": "embeddings.word_embeddings.weight",
        "token_types": "embeddings.token_type_embeddings.weight",
        "embed_norm": "emb_ln.weight",
        "embed_norm_b": "emb_ln.bias",
        "final_norm": "\0absent",
        "layer": [
            ("attn_qkv.weight", "attn.Wqkv.weight"),
            ("attn_output.weight", "attn.out_proj.weight"),
            ("attn_output_norm.weight", "norm1.weight"),
            ("attn_output_norm.bias", "norm1.bias"),
            ("ffn_up.weight", "mlp.fc11.weight"),
            ("ffn_gate.weight", "mlp.fc12.weight"),
            ("ffn_down.weight", "mlp.fc2.weight"),
            ("layer_output_norm.weight", "norm2.weight"),
            ("layer_output_norm.bias", "norm2.bias"),
        ],
    },
    "jina-bert-v2": {  # JinaBertModel (bert block + ALiBi, gelu-gated
        # gated_layers_w/v FFN with down bias — build_bert's jina arm)
        "prefix": "encoder.layer",
        "embed": "embeddings.word_embeddings.weight",
        "token_types": "embeddings.token_type_embeddings.weight",
        "embed_norm": "embeddings.LayerNorm.weight",
        "embed_norm_b": "embeddings.LayerNorm.bias",
        "final_norm": "\0absent",
        "layer": [
            ("attn_q.weight", "attention.self.query.weight"),
            ("attn_q.bias", "attention.self.query.bias"),
            ("attn_k.weight", "attention.self.key.weight"),
            ("attn_k.bias", "attention.self.key.bias"),
            ("attn_v.weight", "attention.self.value.weight"),
            ("attn_v.bias", "attention.self.value.bias"),
            ("attn_output.weight", "attention.output.dense.weight"),
            ("attn_output.bias", "attention.output.dense.bias"),
            ("attn_output_norm.weight", "attention.output.LayerNorm.weight"),
            ("attn_output_norm.bias", "attention.output.LayerNorm.bias"),
            ("ffn_gate.weight", "mlp.gated_layers_w.weight"),
            ("ffn_up.weight", "mlp.gated_layers_v.weight"),
            ("ffn_down.weight", "mlp.wo.weight"),
            ("ffn_down.bias", "mlp.wo.bias"),
            ("layer_output_norm.weight", "mlp.layernorm.weight"),
            ("layer_output_norm.bias", "mlp.layernorm.bias"),
        ],
    },
    "mpt": {  # MptForCausalLM (ALiBi, fused q;k;v Wqkv, no biases)
        "prefix": "transformer.blocks",
        "embed": "transformer.wte.weight",
        "final_norm": "transformer.norm_f.weight",
        "layer": [
            ("attn_norm.weight", "norm_1.weight"),
            ("attn_qkv.weight", "attn.Wqkv.weight"),
            ("attn_output.weight", "attn.out_proj.weight"),
            ("ffn_norm.weight", "norm_2.weight"),
            ("ffn_up.weight", "ffn.up_proj.weight"),
            ("ffn_down.weight", "ffn.down_proj.weight"),
        ],
    },
}


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().float().numpy() if hasattr(t, "detach") else t, np.float32)


def fallback_qtype(qtype: GGMLType, row_len: int) -> GGMLType:
    """K-quants need rows divisible by 256; fall back to Q8_0 (block 32) then
    F16 otherwise — same policy shape as llama_model_quantize's per-tensor
    fallbacks (src/llama-quant.cpp)."""
    from ..gguf.constants import GGML_TYPE_TRAITS

    if row_len % GGML_TYPE_TRAITS[qtype].block_size == 0:
        return qtype
    if row_len % 32 == 0:
        return GGMLType.Q8_0
    return GGMLType.F16


def _rope_scaling_from_hf(hf_config) -> dict:
    """ModelConfig rope-scaling fields from an HF rope_scaling dict.

    Mirrors the reference converter's yarn branch (convert_hf_to_gguf.py
    set_gguf_parameters: add_rope_scaling_type YARN/LINEAR + factor +
    orig_ctx_len); llama3 is handled separately via rope_freqs.weight
    divisors (llama3_rope_factors)."""
    rs = getattr(hf_config, "rope_scaling", None) or {}
    rtype = str(rs.get("rope_type", rs.get("type", ""))).lower()
    if rtype == "linear":
        return {"rope_scaling": "linear",
                "rope_scale_factor": float(rs.get("factor", 1.0))}
    if rtype == "yarn":
        out = {
            "rope_scaling": "yarn",
            "rope_scale_factor": float(rs.get("factor", 1.0)),
            "rope_orig_ctx": int(
                rs.get("original_max_position_embeddings", 0) or 0
            ),
        }
        # HF's attention_factor is the TOTAL cos/sin multiplier; ggml's
        # attn_factor is multiplied by (1 + 0.1*ln(factor)) inside rope_yarn
        # (ggml-cpu.c:9369) — divide it out so the end result matches
        af = rs.get("attention_factor")
        if af is not None:
            import math

            out["rope_attn_factor"] = float(af) / (
                1.0 + 0.1 * math.log(out["rope_scale_factor"])
            )
        if rs.get("beta_fast"):
            out["rope_beta_fast"] = float(rs["beta_fast"])
        if rs.get("beta_slow"):
            out["rope_beta_slow"] = float(rs["beta_slow"])
        return out
    return {}


def config_from_hf(hf_config) -> ModelConfig:
    return ModelConfig(
        **_rope_scaling_from_hf(hf_config),
        arch="llama",
        vocab_size=hf_config.vocab_size,
        n_embd=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=getattr(hf_config, "num_key_value_heads", hf_config.num_attention_heads),
        head_dim=getattr(hf_config, "head_dim", None)
        or hf_config.hidden_size // hf_config.num_attention_heads,
        n_ff=hf_config.intermediate_size,
        rms_eps=hf_config.rms_norm_eps,
        rope_base=getattr(hf_config, "rope_theta", 10000.0),
        rope_dim=getattr(hf_config, "head_dim", None)
        or hf_config.hidden_size // hf_config.num_attention_heads,
        n_ctx_train=getattr(hf_config, "max_position_embeddings", 2048),
    )


def params_from_hf_llama(model, quant_type: GGMLType | None = None) -> tuple[dict, ModelConfig]:
    """transformers LlamaForCausalLM -> runtime params pytree.

    With quant_type set, 2-D projection weights are quantized through the GGUF
    block format (quantize -> repack), exercising the full quant pipeline."""
    import jax.numpy as jnp

    cfg = config_from_hf(model.config)
    sd = {k: _to_np(v) for k, v in model.state_dict().items()}

    def wrap(w):
        if quant_type is None:
            return w
        return quantize_array(w, fallback_qtype(quant_type, w.shape[-1]), layout="kn")

    layers = {k: [] for k in _HF_LAYER_MAP}
    for i in range(cfg.n_layers):
        for ours, suffix in _HF_LAYER_MAP.items():
            w = sd[f"model.layers.{i}.{suffix}"]
            layers[ours].append(wrap(w) if w.ndim == 2 else w)

    params = {
        "tok_embd": sd["model.embed_tokens.weight"],
        "layers": {k: _stack(v) for k, v in layers.items()},
        "output_norm": sd["model.norm.weight"],
        "output": sd.get("lm_head.weight", sd["model.embed_tokens.weight"]),
    }
    import jax

    params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, cfg


def params_from_hf_mixtral(model, dtype=None) -> tuple[dict, ModelConfig]:
    """transformers MixtralForCausalLM -> runtime pytree (MoE FFN:
    block_sparse_moe gate + per-expert w1/w3/w2 stacked to [L, E, ...])."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    hc = model.config
    cfg = dataclasses.replace(
        config_from_hf(hc), arch="mixtral",
        n_expert=hc.num_local_experts, n_expert_used=hc.num_experts_per_tok,
    )
    sd = {k: _to_np(v) for k, v in model.state_dict().items()}
    L, E = cfg.n_layers, cfg.n_expert
    layers: dict[str, list] = {
        k: [] for k in ("attn_norm", "wq", "wk", "wv", "wo", "ffn_norm",
                        "ffn_gate_inp", "w_gate_exps", "w_up_exps", "w_down_exps")
    }
    for i in range(L):
        p = f"model.layers.{i}"
        layers["attn_norm"].append(sd[f"{p}.input_layernorm.weight"])
        layers["wq"].append(sd[f"{p}.self_attn.q_proj.weight"])
        layers["wk"].append(sd[f"{p}.self_attn.k_proj.weight"])
        layers["wv"].append(sd[f"{p}.self_attn.v_proj.weight"])
        layers["wo"].append(sd[f"{p}.self_attn.o_proj.weight"])
        layers["ffn_norm"].append(sd[f"{p}.post_attention_layernorm.weight"])
        layers["ffn_gate_inp"].append(sd[f"{p}.block_sparse_moe.gate.weight"])
        layers["w_gate_exps"].append(
            np.stack([sd[f"{p}.block_sparse_moe.experts.{e}.w1.weight"] for e in range(E)])
        )
        layers["w_up_exps"].append(
            np.stack([sd[f"{p}.block_sparse_moe.experts.{e}.w3.weight"] for e in range(E)])
        )
        layers["w_down_exps"].append(
            np.stack([sd[f"{p}.block_sparse_moe.experts.{e}.w2.weight"] for e in range(E)])
        )
    params = {
        "tok_embd": sd["model.embed_tokens.weight"],
        "layers": {k: np.stack(v) for k, v in layers.items()},
        "output_norm": sd["model.norm.weight"],
        "output": sd.get("lm_head.weight", sd["model.embed_tokens.weight"]),
    }
    return jax.tree_util.tree_map(jnp.asarray, params), cfg


def params_from_hf_gemma2(model) -> tuple[dict, ModelConfig]:
    """transformers Gemma2ForCausalLM -> runtime pytree: sandwich norms,
    (1+w) norm weights folded at conversion (the reference's converter does
    the same), softcaps/attn-scale/SWA-alternation in the config."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    hc = model.config
    cfg = dataclasses.replace(
        config_from_hf(hc), arch="gemma2",
        attn_softcap=float(getattr(hc, "attn_logit_softcapping", 0.0) or 0.0),
        final_softcap=float(getattr(hc, "final_logit_softcapping", 0.0) or 0.0),
        post_norms=True,
        embd_scale=float(hc.hidden_size) ** 0.5,
        attn_scale=float(hc.query_pre_attn_scalar) ** -0.5,
        swa_window=int(getattr(hc, "sliding_window", 0) or 0),
        swa_every=2,
        act="gelu",
    )
    sd = {k: _to_np(v) for k, v in model.state_dict().items()}

    def norm(name):  # gemma rmsnorm computes x_hat * (1 + w)
        return sd[name] + 1.0

    layers: dict[str, list] = {
        k: [] for k in ("attn_norm", "wq", "wk", "wv", "wo", "post_attn_norm",
                        "ffn_norm", "post_ffn_norm", "w_gate", "w_up", "w_down")
    }
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}"
        layers["attn_norm"].append(norm(f"{p}.input_layernorm.weight"))
        layers["wq"].append(sd[f"{p}.self_attn.q_proj.weight"])
        layers["wk"].append(sd[f"{p}.self_attn.k_proj.weight"])
        layers["wv"].append(sd[f"{p}.self_attn.v_proj.weight"])
        layers["wo"].append(sd[f"{p}.self_attn.o_proj.weight"])
        layers["post_attn_norm"].append(norm(f"{p}.post_attention_layernorm.weight"))
        layers["ffn_norm"].append(norm(f"{p}.pre_feedforward_layernorm.weight"))
        layers["post_ffn_norm"].append(norm(f"{p}.post_feedforward_layernorm.weight"))
        layers["w_gate"].append(sd[f"{p}.mlp.gate_proj.weight"])
        layers["w_up"].append(sd[f"{p}.mlp.up_proj.weight"])
        layers["w_down"].append(sd[f"{p}.mlp.down_proj.weight"])
    params = {
        "tok_embd": sd["model.embed_tokens.weight"],
        "layers": {k: np.stack(v) for k, v in layers.items()},
        "output_norm": norm("model.norm.weight"),
        "output": sd.get("lm_head.weight", sd["model.embed_tokens.weight"]),
    }
    return jax.tree_util.tree_map(jnp.asarray, params), cfg


def params_from_hf_gemma(model) -> tuple[dict, ModelConfig]:
    """transformers GemmaForCausalLM (v1) -> runtime pytree: llama dataflow
    with gelu FFN, sqrt(d) embedding scale, (1+w) rms norms, tied lm_head
    (build_gemma in the reference)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    hc = model.config
    cfg = dataclasses.replace(
        config_from_hf(hc), arch="gemma",
        embd_scale=float(hc.hidden_size) ** 0.5, act="gelu",
    )
    sd = {k: _to_np(v) for k, v in model.state_dict().items()}

    def norm(name):
        return sd[name] + 1.0

    layers: dict[str, list] = {
        k: [] for k in ("attn_norm", "wq", "wk", "wv", "wo", "ffn_norm",
                        "w_gate", "w_up", "w_down")
    }
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}"
        layers["attn_norm"].append(norm(f"{p}.input_layernorm.weight"))
        layers["wq"].append(sd[f"{p}.self_attn.q_proj.weight"])
        layers["wk"].append(sd[f"{p}.self_attn.k_proj.weight"])
        layers["wv"].append(sd[f"{p}.self_attn.v_proj.weight"])
        layers["wo"].append(sd[f"{p}.self_attn.o_proj.weight"])
        layers["ffn_norm"].append(norm(f"{p}.post_attention_layernorm.weight"))
        layers["w_gate"].append(sd[f"{p}.mlp.gate_proj.weight"])
        layers["w_up"].append(sd[f"{p}.mlp.up_proj.weight"])
        layers["w_down"].append(sd[f"{p}.mlp.down_proj.weight"])
    params = {
        "tok_embd": sd["model.embed_tokens.weight"],
        "layers": {k: np.stack(v) for k, v in layers.items()},
        "output_norm": norm("model.norm.weight"),
        "output": sd.get("lm_head.weight", sd["model.embed_tokens.weight"]),
    }
    return jax.tree_util.tree_map(jnp.asarray, params), cfg


def params_from_hf_phi3(model) -> tuple[dict, ModelConfig]:
    """transformers Phi3ForCausalLM -> runtime pytree (fused qkv_proj /
    gate_up_proj unfused into the canonical slots; same dataflow as llama)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    hc = model.config
    cfg = dataclasses.replace(config_from_hf(hc), arch="phi3")
    sd = {k: _to_np(v) for k, v in model.state_dict().items()}
    qd, kvd = cfg.n_q_dim, cfg.n_kv_dim
    layers: dict[str, list] = {
        k: [] for k in ("attn_norm", "wq", "wk", "wv", "wo", "ffn_norm",
                        "w_gate", "w_up", "w_down")
    }
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}"
        layers["attn_norm"].append(sd[f"{p}.input_layernorm.weight"])
        qkv = sd[f"{p}.self_attn.qkv_proj.weight"]
        layers["wq"].append(qkv[:qd])
        layers["wk"].append(qkv[qd:qd + kvd])
        layers["wv"].append(qkv[qd + kvd:])
        layers["wo"].append(sd[f"{p}.self_attn.o_proj.weight"])
        layers["ffn_norm"].append(sd[f"{p}.post_attention_layernorm.weight"])
        gu = sd[f"{p}.mlp.gate_up_proj.weight"]
        layers["w_gate"].append(gu[: cfg.n_ff])
        layers["w_up"].append(gu[cfg.n_ff:])
        layers["w_down"].append(sd[f"{p}.mlp.down_proj.weight"])
    params = {
        "tok_embd": sd["model.embed_tokens.weight"],
        "layers": {k: np.stack(v) for k, v in layers.items()},
        "output_norm": sd["model.norm.weight"],
        "output": sd.get("lm_head.weight", sd["model.embed_tokens.weight"]),
    }
    return jax.tree_util.tree_map(jnp.asarray, params), cfg


# ---------------------------------------------------------------------------
# HF -> GGUF conversion (tool path)
# ---------------------------------------------------------------------------


def params_from_hf_qwen3(model) -> tuple[dict, ModelConfig]:
    """transformers Qwen3ForCausalLM -> runtime pytree: per-head q/k rms norms
    (build_qwen3 in upstream llama.cpp; attn_q_norm/attn_k_norm [head_dim]),
    head_dim decoupled from n_embd/n_heads, no attention biases."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg = dataclasses.replace(config_from_hf(model.config), arch="qwen3")
    sd = {k: _to_np(v) for k, v in model.state_dict().items()}
    layers: dict[str, list] = {
        k: [] for k in ("attn_norm", "wq", "wk", "wv", "wo", "attn_q_norm",
                        "attn_k_norm", "ffn_norm", "w_gate", "w_up", "w_down")
    }
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}"
        layers["attn_norm"].append(sd[f"{p}.input_layernorm.weight"])
        layers["wq"].append(sd[f"{p}.self_attn.q_proj.weight"])
        layers["wk"].append(sd[f"{p}.self_attn.k_proj.weight"])
        layers["wv"].append(sd[f"{p}.self_attn.v_proj.weight"])
        layers["wo"].append(sd[f"{p}.self_attn.o_proj.weight"])
        layers["attn_q_norm"].append(sd[f"{p}.self_attn.q_norm.weight"])
        layers["attn_k_norm"].append(sd[f"{p}.self_attn.k_norm.weight"])
        layers["ffn_norm"].append(sd[f"{p}.post_attention_layernorm.weight"])
        layers["w_gate"].append(sd[f"{p}.mlp.gate_proj.weight"])
        layers["w_up"].append(sd[f"{p}.mlp.up_proj.weight"])
        layers["w_down"].append(sd[f"{p}.mlp.down_proj.weight"])
    params = {
        "tok_embd": sd["model.embed_tokens.weight"],
        "layers": {k: np.stack(v) for k, v in layers.items()},
        "output_norm": sd["model.norm.weight"],
        "output": sd.get("lm_head.weight", sd["model.embed_tokens.weight"]),
    }
    return jax.tree_util.tree_map(jnp.asarray, params), cfg


def params_from_hf_olmo2(model) -> tuple[dict, ModelConfig]:
    """transformers Olmo2ForCausalLM -> runtime pytree: post-norm-only blocks
    (x + attn_post_norm(attn(x)); no pre-norms — build_olmo2 in upstream
    llama.cpp) and FLAT q/k rms norms over the whole projection [H*Dh]."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg = dataclasses.replace(config_from_hf(model.config), arch="olmo2")
    sd = {k: _to_np(v) for k, v in model.state_dict().items()}
    layers: dict[str, list] = {
        k: [] for k in ("wq", "wk", "wv", "wo", "attn_q_norm", "attn_k_norm",
                        "post_attn_norm", "post_ffn_norm",
                        "w_gate", "w_up", "w_down")
    }
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}"
        layers["wq"].append(sd[f"{p}.self_attn.q_proj.weight"])
        layers["wk"].append(sd[f"{p}.self_attn.k_proj.weight"])
        layers["wv"].append(sd[f"{p}.self_attn.v_proj.weight"])
        layers["wo"].append(sd[f"{p}.self_attn.o_proj.weight"])
        layers["attn_q_norm"].append(sd[f"{p}.self_attn.q_norm.weight"])
        layers["attn_k_norm"].append(sd[f"{p}.self_attn.k_norm.weight"])
        layers["post_attn_norm"].append(sd[f"{p}.post_attention_layernorm.weight"])
        layers["post_ffn_norm"].append(sd[f"{p}.post_feedforward_layernorm.weight"])
        layers["w_gate"].append(sd[f"{p}.mlp.gate_proj.weight"])
        layers["w_up"].append(sd[f"{p}.mlp.up_proj.weight"])
        layers["w_down"].append(sd[f"{p}.mlp.down_proj.weight"])
    params = {
        "tok_embd": sd["model.embed_tokens.weight"],
        "layers": {k: np.stack(v) for k, v in layers.items()},
        "output_norm": sd["model.norm.weight"],
        "output": sd.get("lm_head.weight", sd["model.embed_tokens.weight"]),
    }
    return jax.tree_util.tree_map(jnp.asarray, params), cfg


def params_from_hf_qwen2moe(model) -> tuple[dict, ModelConfig]:
    """transformers Qwen2MoeForCausalLM -> runtime pytree: softmax-all router
    without top-k renorm + shared expert with sigmoid gate (build_qwen2moe,
    src/llama.cpp; tensors ffn_*_shexp / ffn_gate_inp_shexp)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    hc = model.config
    cfg = dataclasses.replace(
        config_from_hf(hc), arch="qwen2moe", attn_bias=True,
        n_expert=hc.num_experts, n_expert_used=hc.num_experts_per_tok,
        moe_softmax_all=True,
    )
    sd = {k: _to_np(v) for k, v in model.state_dict().items()}
    E = cfg.n_expert
    keys = ("attn_norm", "wq", "wk", "wv", "wo", "bqkv", "ffn_norm",
            "ffn_gate_inp", "w_gate_exps", "w_up_exps", "w_down_exps",
            "ffn_gate_inp_shexp", "w_gate_shexp", "w_up_shexp", "w_down_shexp")
    layers: dict[str, list] = {k: [] for k in keys}
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}"
        layers["attn_norm"].append(sd[f"{p}.input_layernorm.weight"])
        layers["wq"].append(sd[f"{p}.self_attn.q_proj.weight"])
        layers["wk"].append(sd[f"{p}.self_attn.k_proj.weight"])
        layers["wv"].append(sd[f"{p}.self_attn.v_proj.weight"])
        layers["wo"].append(sd[f"{p}.self_attn.o_proj.weight"])
        layers["bqkv"].append(np.concatenate([
            sd[f"{p}.self_attn.q_proj.bias"],
            sd[f"{p}.self_attn.k_proj.bias"],
            sd[f"{p}.self_attn.v_proj.bias"],
        ]))
        layers["ffn_norm"].append(sd[f"{p}.post_attention_layernorm.weight"])
        layers["ffn_gate_inp"].append(sd[f"{p}.mlp.gate.weight"])
        for ours, hf_w in (("w_gate_exps", "gate_proj"), ("w_up_exps", "up_proj"),
                           ("w_down_exps", "down_proj")):
            layers[ours].append(np.stack(
                [sd[f"{p}.mlp.experts.{e}.{hf_w}.weight"] for e in range(E)]
            ))
        layers["ffn_gate_inp_shexp"].append(sd[f"{p}.mlp.shared_expert_gate.weight"])
        layers["w_gate_shexp"].append(sd[f"{p}.mlp.shared_expert.gate_proj.weight"])
        layers["w_up_shexp"].append(sd[f"{p}.mlp.shared_expert.up_proj.weight"])
        layers["w_down_shexp"].append(sd[f"{p}.mlp.shared_expert.down_proj.weight"])
    params = {
        "tok_embd": sd["model.embed_tokens.weight"],
        "layers": {k: np.stack(v) for k, v in layers.items()},
        "output_norm": sd["model.norm.weight"],
        "output": sd.get("lm_head.weight", sd["model.embed_tokens.weight"]),
    }
    return jax.tree_util.tree_map(jnp.asarray, params), cfg


def llama3_rope_factors(hf_config) -> np.ndarray | None:
    """Per-frequency rope divisors for llama-3.1's smooth interpolation
    (reference LlamaModel.generate_extra_tensors -> rope_freqs.weight).
    Returns None when the config carries no llama3 rope_scaling."""
    import math

    rs = getattr(hf_config, "rope_scaling", None)
    if not rs or str(rs.get("rope_type", rs.get("type", ""))).lower() != "llama3":
        return None
    base = getattr(hf_config, "rope_theta", 10000.0)
    dim = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // hf_config.num_attention_heads
    )
    freqs = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    factor = rs.get("factor", 8.0)
    low_f = rs.get("low_freq_factor", 1.0)
    high_f = rs.get("high_freq_factor", 4.0)
    old_ctx = getattr(hf_config, "original_max_position_embeddings", None) or rs.get(
        "original_max_position_embeddings", 8192
    )
    low_wl = old_ctx / low_f
    high_wl = old_ctx / high_f
    out = []
    for f in freqs:
        wl = 2 * math.pi / f
        if wl < high_wl:
            out.append(1.0)
        elif wl > low_wl:
            out.append(factor)
        else:
            smooth = (old_ctx / wl - low_f) / (high_f - low_f)
            out.append(1.0 / ((1 - smooth) / factor + smooth))
    return np.asarray(out, np.float32)


def _default_qtype_for(name: str, w: np.ndarray, qtype: GGMLType) -> GGMLType:
    # 1-D tensors and norms stay f32 (same policy as llama_model_quantize's
    # default rules, src/llama-quant.cpp)
    if w.ndim != 2:
        return GGMLType.F32
    if qtype in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        return qtype
    return fallback_qtype(qtype, w.shape[-1])


def convert_hf_to_gguf(
    state_dict: dict[str, Any],
    cfg: ModelConfig,
    path: str | Path,
    qtype: GGMLType = GGMLType.F16,
    metadata: dict[str, Any] | None = None,
    arch: str | None = None,
    rope_factors: "np.ndarray | None" = None,  # llama3_rope_factors output
):
    """Write a llama/eagle-architecture GGUF from an HF-layout state_dict."""
    arch = arch or cfg.arch
    w = GGUFWriter(path)
    w.add(Keys.General.ARCHITECTURE, arch)
    w.add(Keys.General.NAME, metadata.get("name", "converted") if metadata else "converted")
    w.add(Keys.LLM.CONTEXT_LENGTH.format(arch=arch), cfg.n_ctx_train)
    w.add(Keys.LLM.EMBEDDING_LENGTH.format(arch=arch), cfg.n_embd)
    w.add(Keys.LLM.BLOCK_COUNT.format(arch=arch), cfg.n_layers)
    w.add(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=arch), cfg.n_ff)
    w.add(Keys.LLM.VOCAB_SIZE.format(arch=arch), cfg.vocab_size)
    w.add(Keys.Attention.HEAD_COUNT.format(arch=arch), cfg.n_heads)
    w.add(Keys.Attention.HEAD_COUNT_KV.format(arch=arch), cfg.n_kv_heads)
    w.add(Keys.Attention.KEY_LENGTH.format(arch=arch), cfg.head_dim)
    w.add(Keys.Attention.VALUE_LENGTH.format(arch=arch), cfg.v_dim)
    w.add(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=arch), cfg.rms_eps)
    w.add(Keys.Rope.DIMENSION_COUNT.format(arch=arch), cfg.rope_dim)
    w.add(Keys.Rope.FREQ_BASE.format(arch=arch), cfg.rope_base)
    if cfg.rope_scaling:  # linear/yarn (reference add_rope_scaling_type)
        w.add(Keys.Rope.SCALING_TYPE.format(arch=arch), cfg.rope_scaling)
        w.add(Keys.Rope.SCALING_FACTOR.format(arch=arch), cfg.rope_scale_factor)
        if cfg.rope_orig_ctx:
            w.add(Keys.Rope.SCALING_ORIG_CTX.format(arch=arch), cfg.rope_orig_ctx)
        if cfg.rope_attn_factor != 1.0:
            w.add(Keys.Rope.SCALING_ATTN_FACTOR.format(arch=arch), cfg.rope_attn_factor)
        if cfg.rope_yarn_log_mul:
            w.add(Keys.Rope.SCALING_YARN_LOG_MUL.format(arch=arch), cfg.rope_yarn_log_mul)
    if cfg.n_expert:
        w.add(Keys.LLM.EXPERT_COUNT.format(arch=arch), cfg.n_expert)
        w.add(Keys.LLM.EXPERT_USED_COUNT.format(arch=arch), cfg.n_expert_used)
    if cfg.kv_lora_rank:  # deepseek2 MLA hparams (llama-arch.cpp keys)
        w.add(f"{arch}.attention.kv_lora_rank", cfg.kv_lora_rank)
        if cfg.q_lora_rank:
            w.add(f"{arch}.attention.q_lora_rank", cfg.q_lora_rank)
    if cfg.kv_lora_rank or cfg.n_dense_layers or cfg.n_shared_experts:
        # deepseek v1/v2 MoE structure keys (build_deepseek/_deepseek2)
        w.add(f"{arch}.leading_dense_block_count", cfg.n_dense_layers)
        w.add(f"{arch}.expert_shared_count", cfg.n_shared_experts)
        w.add(f"{arch}.expert_feed_forward_length", cfg.n_ff_exp)
        w.add(f"{arch}.expert_weights_scale", cfg.expert_weights_scale)
        w.add(f"{arch}.expert_weights_norm", cfg.expert_weights_norm)
    if cfg.moe_sparsemixer:  # phimoe: HF router_jitter_noise (sparsemixer)
        w.add(f"{arch}.router_jitter", cfg.router_jitter)
    if cfg.attn_softcap:
        w.add(f"{arch}.attn_logit_softcapping", cfg.attn_softcap)
    if cfg.final_softcap:
        w.add(f"{arch}.final_logit_softcapping", cfg.final_softcap)
    if cfg.swa_window:
        w.add(f"{arch}.attention.sliding_window", cfg.swa_window)
    if cfg.attn_scale is not None:
        w.add(f"{arch}.attention.query_pre_attn_scalar", cfg.attn_scale ** -2.0)
    from .config import LAYERNORM_ARCHS

    if arch in LAYERNORM_ARCHS:
        # LLM_NORM archs store the eps under layer_norm_epsilon (llama-arch.cpp)
        w.add(Keys.Attention.LAYERNORM_EPS.format(arch=arch), cfg.rms_eps)
    if cfg.logit_scale != 1.0:
        w.add(f"{arch}.logit_scale", cfg.logit_scale)
    if cfg.clamp_kqv:  # olmo (OlmoModel.set_gguf_parameters add_clamp_kqv)
        w.add(f"{arch}.attention.clamp_kqv", cfg.clamp_kqv)
    if cfg.embd_scale != 1.0 and not arch.startswith("gemma"):
        # minicpm scale_emb / granite embedding_scale (LLM_KV_EMBEDDING_SCALE);
        # gemma's sqrt(d) scale is implied by the arch, never written
        w.add(f"{arch}.embedding_scale", cfg.embd_scale)
    if cfg.resid_scale != 1.0:  # minicpm scale_depth/sqrt(L), granite
        w.add(f"{arch}.residual_scale", cfg.resid_scale)
    if cfg.mrope_sections:  # qwen2vl (Qwen2VLModel rope_scaling.mrope_section)
        w.add(f"{arch}.rope.dimension_sections", list(cfg.mrope_sections))
    if metadata:
        for key, val in metadata.items():
            if key.startswith(("tokenizer.", "general.")) and key != "general.name":
                w.add(key, val)

    sd = {k: _to_np(v) for k, v in state_dict.items()}

    if rope_factors is not None:  # llama-3.1 smooth-interpolation divisors
        w.add_tensor("rope_freqs.weight", np.asarray(rope_factors, np.float32))

    if arch in ("t5", "t5encoder"):
        # T5Model / T5EncoderModel converters: enc./dec. prefixed stacks,
        # rel-bias table from block 0 (llama-arch.cpp LLM_ARCH_T5 names)
        w.add(f"{arch}.attention.relative_buckets_count", cfg.rel_buckets or 32)
        if cfg.decoder_start_id:
            w.add(f"{arch}.decoder_start_token_id", cfg.decoder_start_id)

        def tput(gguf_name, hf_name, qt=True):
            if hf_name not in sd:
                return
            t = sd[hf_name]
            if t.ndim == 2 and qt:
                w.add_tensor(gguf_name, t, _default_qtype_for(gguf_name, t, qtype))
            else:
                w.add_tensor(gguf_name, t.astype(np.float32))

        tput("token_embd.weight", "shared.weight")
        if "lm_head.weight" in sd and not np.array_equal(
            sd["lm_head.weight"], sd["shared.weight"]
        ):  # tied checkpoints materialize lm_head == shared; keep it tied so
            # the d^-0.5 tied-head scaling applies at inference
            tput("output.weight", "lm_head.weight")

        def put_stack(hf_side: str, gg: str, cross: bool):
            tput(f"{gg}.output_norm.weight", f"{hf_side}.final_layer_norm.weight",
                 qt=False)
            tput(f"{gg}.blk.0.attn_rel_b.weight",
                 f"{hf_side}.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
                 qt=False)
            ffn_layer = 2 if cross else 1
            for i in range(cfg.n_layers):
                pre = f"{hf_side}.block.{i}"
                blk = f"{gg}.blk.{i}"
                tput(f"{blk}.attn_norm.weight", f"{pre}.layer.0.layer_norm.weight",
                     qt=False)
                for nm in "qkvo":
                    tput(f"{blk}.attn_{nm}.weight",
                         f"{pre}.layer.0.SelfAttention.{nm}.weight")
                if cross:
                    tput(f"{blk}.cross_attn_norm.weight",
                         f"{pre}.layer.1.layer_norm.weight", qt=False)
                    for nm in "qkvo":
                        tput(f"{blk}.cross_attn_{nm}.weight",
                             f"{pre}.layer.1.EncDecAttention.{nm}.weight")
                fl = f"{pre}.layer.{ffn_layer}"
                tput(f"{blk}.ffn_norm.weight", f"{fl}.layer_norm.weight", qt=False)
                tput(f"{blk}.ffn_up.weight", f"{fl}.DenseReluDense.wi.weight")
                tput(f"{blk}.ffn_gate.weight", f"{fl}.DenseReluDense.wi_0.weight")
                if f"{fl}.DenseReluDense.wi_1.weight" in sd:  # gated (flan)
                    tput(f"{blk}.ffn_up.weight", f"{fl}.DenseReluDense.wi_1.weight")
                tput(f"{blk}.ffn_down.weight", f"{fl}.DenseReluDense.wo.weight")

        put_stack("encoder", "enc", cross=False)
        if arch == "t5":
            put_stack("decoder", "dec", cross=True)
        w.write()
        return

    if cfg.wkv_head_size:  # rwkv6 (reference Rwkv6Model converter semantics)
        w.add(f"{arch}.wkv.head_size", cfg.wkv_head_size)
        if cfg.rescale_every:
            w.add(f"{arch}.rescale_every_n_layers", cfg.rescale_every)

        def rput(gguf_name, t, qt=True):
            t = np.asarray(t)
            if t.ndim == 2 and qt:
                w.add_tensor(gguf_name, t, _default_qtype_for(gguf_name, t, qtype))
            else:
                w.add_tensor(gguf_name, t.astype(np.float32))

        rput("token_embd.weight", sd["rwkv.embeddings.weight"])
        if "rwkv.blocks.0.pre_ln.weight" in sd:
            rput("token_embd_norm.weight", sd["rwkv.blocks.0.pre_ln.weight"], qt=False)
            rput("token_embd_norm.bias", sd["rwkv.blocks.0.pre_ln.bias"], qt=False)
        rput("output_norm.weight", sd["rwkv.ln_out.weight"], qt=False)
        rput("output_norm.bias", sd["rwkv.ln_out.bias"], qt=False)
        rput("output.weight", sd["head.weight"])
        for i in range(cfg.n_layers):
            pre = f"rwkv.blocks.{i}"
            blk = f"blk.{i}"
            # the reference pre-divides rescaled layers' output weights
            div = 2.0 ** (i // cfg.rescale_every) if cfg.rescale_every else 1.0
            rput(f"{blk}.attn_norm.weight", sd[f"{pre}.ln1.weight"], qt=False)
            rput(f"{blk}.attn_norm.bias", sd[f"{pre}.ln1.bias"], qt=False)
            rput(f"{blk}.attn_norm_2.weight", sd[f"{pre}.ln2.weight"], qt=False)
            rput(f"{blk}.attn_norm_2.bias", sd[f"{pre}.ln2.bias"], qt=False)
            att = f"{pre}.attention"
            rput(f"{blk}.time_mix_lerp_x.weight",
                 np.asarray(sd[f"{att}.time_maa_x"]).reshape(-1), qt=False)
            fused = np.stack([
                np.asarray(sd[f"{att}.time_maa_{p}"]).reshape(-1)
                for p in ("w", "k", "v", "r", "g")
            ])
            rput(f"{blk}.time_mix_lerp_fused.weight", fused, qt=False)
            # time_maa_w1 [D, 5*ext] -> [5*ext, D]; w2 [5, ext, D] -> [5, D, ext]
            rput(f"{blk}.time_mix_w1.weight",
                 np.ascontiguousarray(np.asarray(sd[f"{att}.time_maa_w1"]).T))
            rput(f"{blk}.time_mix_w2.weight",
                 np.ascontiguousarray(np.asarray(sd[f"{att}.time_maa_w2"]).transpose(0, 2, 1)),
                 qt=False)
            rput(f"{blk}.time_mix_decay.weight",
                 np.asarray(sd[f"{att}.time_decay"]).reshape(-1), qt=False)
            rput(f"{blk}.time_mix_decay_w1.weight",
                 np.ascontiguousarray(np.asarray(sd[f"{att}.time_decay_w1"]).T))
            rput(f"{blk}.time_mix_decay_w2.weight",
                 np.ascontiguousarray(np.asarray(sd[f"{att}.time_decay_w2"]).T))
            rput(f"{blk}.time_mix_first.weight", sd[f"{att}.time_faaaa"], qt=False)
            rput(f"{blk}.time_mix_key.weight", sd[f"{att}.key.weight"])
            rput(f"{blk}.time_mix_value.weight", sd[f"{att}.value.weight"])
            rput(f"{blk}.time_mix_receptance.weight", sd[f"{att}.receptance.weight"])
            rput(f"{blk}.time_mix_gate.weight", sd[f"{att}.gate.weight"])
            rput(f"{blk}.time_mix_ln.weight", sd[f"{att}.ln_x.weight"], qt=False)
            rput(f"{blk}.time_mix_ln.bias", sd[f"{att}.ln_x.bias"], qt=False)
            rput(f"{blk}.time_mix_output.weight",
                 np.asarray(sd[f"{att}.output.weight"]) / div)
            ffn = f"{pre}.feed_forward"
            rput(f"{blk}.channel_mix_lerp_k.weight",
                 np.asarray(sd[f"{ffn}.time_maa_k"]).reshape(-1), qt=False)
            rput(f"{blk}.channel_mix_lerp_r.weight",
                 np.asarray(sd[f"{ffn}.time_maa_r"]).reshape(-1), qt=False)
            rput(f"{blk}.channel_mix_key.weight", sd[f"{ffn}.key.weight"])
            rput(f"{blk}.channel_mix_receptance.weight", sd[f"{ffn}.receptance.weight"])
            rput(f"{blk}.channel_mix_value.weight",
                 np.asarray(sd[f"{ffn}.value.weight"]) / div)
        w.write()
        return

    if cfg.is_recurrent:  # mamba (reference MambaModel converter semantics)
        w.add(Keys.SSM.CONV_KERNEL.format(arch=arch), cfg.ssm_d_conv)
        w.add(Keys.SSM.INNER_SIZE.format(arch=arch), cfg.ssm_d_inner)
        w.add(Keys.SSM.STATE_SIZE.format(arch=arch), cfg.ssm_d_state)
        w.add(Keys.SSM.TIME_STEP_RANK.format(arch=arch), cfg.ssm_dt_rank)
        if cfg.ssm_dt_b_c_rms:
            w.add(Keys.SSM.DT_B_C_RMS.format(arch=arch), True)

        def mput(gguf_name, hf_name, qt=True, transform=None):
            if hf_name not in sd:
                return
            t = sd[hf_name]
            if transform is not None:
                t = transform(t)
            if t.ndim == 2 and qt:
                w.add_tensor(gguf_name, t, _default_qtype_for(gguf_name, t, qtype))
            else:
                w.add_tensor(gguf_name, t.astype(np.float32))

        mput("token_embd.weight", "backbone.embeddings.weight")
        mput("output_norm.weight", "backbone.norm_f.weight", qt=False)
        emb = sd.get("backbone.embeddings.weight")
        lm = sd.get("lm_head.weight")
        if lm is not None and (emb is None or not np.array_equal(lm, emb)):
            mput("output.weight", "lm_head.weight")  # tied heads omitted
        for i in range(cfg.n_layers):
            pre = f"backbone.layers.{i}"
            mput(f"blk.{i}.attn_norm.weight", f"{pre}.norm.weight", qt=False)
            mput(f"blk.{i}.ssm_in.weight", f"{pre}.mixer.in_proj.weight")
            mput(f"blk.{i}.ssm_conv1d.weight", f"{pre}.mixer.conv1d.weight",
                 qt=False, transform=lambda t: t.reshape(t.shape[0], -1))
            mput(f"blk.{i}.ssm_conv1d.bias", f"{pre}.mixer.conv1d.bias", qt=False)
            mput(f"blk.{i}.ssm_x.weight", f"{pre}.mixer.x_proj.weight")
            mput(f"blk.{i}.ssm_dt.weight", f"{pre}.mixer.dt_proj.weight")
            mput(f"blk.{i}.ssm_dt.bias", f"{pre}.mixer.dt_proj.bias", qt=False)
            # A_log -> A = -exp(A_log) (reference MambaModel.modify_tensors)
            mput(f"blk.{i}.ssm_a", f"{pre}.mixer.A_log", qt=False,
                 transform=lambda t: -np.exp(t))
            mput(f"blk.{i}.ssm_d", f"{pre}.mixer.D", qt=False)
            mput(f"blk.{i}.ssm_out.weight", f"{pre}.mixer.out_proj.weight")
        w.write()
        return

    if arch == "dbrx":
        # DbrxForCausalLM (build_dbrx: LayerNorm, fused clamped qkv, NEOX
        # rope, mixtral-gated MoE; reference DbrxModel.modify_tensors views
        # the flat expert params as [E, ff, d] and transposes w2)
        E, ff, d = cfg.n_expert, cfg.n_ff, cfg.n_embd

        def bput(gguf_name, t, qt=True):
            if t.ndim >= 2 and qt:
                w.add_tensor(gguf_name, t, _default_qtype_for(gguf_name, t, qtype))
            else:
                w.add_tensor(gguf_name, t.astype(np.float32))

        bput("token_embd.weight", sd["transformer.wte.weight"])
        bput("output_norm.weight", sd["transformer.norm_f.weight"], qt=False)
        bput("output.weight", sd["lm_head.weight"])
        for i in range(cfg.n_layers):
            pre = f"transformer.blocks.{i}"
            bput(f"blk.{i}.attn_norm.weight",
                 sd[f"{pre}.norm_attn_norm.norm_1.weight"], qt=False)
            bput(f"blk.{i}.attn_qkv.weight", sd[f"{pre}.norm_attn_norm.attn.Wqkv.weight"])
            bput(f"blk.{i}.attn_output.weight",
                 sd[f"{pre}.norm_attn_norm.attn.out_proj.weight"])
            bput(f"blk.{i}.attn_output_norm.weight",
                 sd[f"{pre}.norm_attn_norm.norm_2.weight"], qt=False)
            bput(f"blk.{i}.ffn_gate_inp.weight", sd[f"{pre}.ffn.router.layer.weight"])
            w1 = sd[f"{pre}.ffn.experts.mlp.w1"].reshape(E, ff, d)
            v1 = sd[f"{pre}.ffn.experts.mlp.v1"].reshape(E, ff, d)
            w2 = sd[f"{pre}.ffn.experts.mlp.w2"].reshape(E, ff, d).transpose(0, 2, 1)
            w.add_tensor(f"blk.{i}.ffn_gate_exps.weight", np.ascontiguousarray(w1))
            w.add_tensor(f"blk.{i}.ffn_up_exps.weight", np.ascontiguousarray(v1))
            w.add_tensor(f"blk.{i}.ffn_down_exps.weight", np.ascontiguousarray(w2))
        w.write()
        return

    gmap = GENERIC_HF_MAPS.get(arch)
    if gmap is not None:
        lp = gmap["prefix"]
        if cfg.parallel_blocks:
            # gptneox/stablelm opt into parallel residual per checkpoint
            # (add_parallel_residual in the reference's GPTNeoXModel)
            w.add(f"{arch}.use_parallel_residual", True)

        def gput(gguf_name: str, hf_name, kind: str | None = None, qt: bool = True):
            if isinstance(hf_name, tuple):  # (name, kind) form in map values
                hf_name, kind = hf_name
            if hf_name not in sd:
                return
            t = sd[hf_name]
            if kind == "conv1d":  # HF Conv1D stores [in, out]
                t = np.ascontiguousarray(t.T)
            elif kind == "neox_qkv":
                # fused qkv stored head-interleaved [H, 3, Dh, K] -> GGUF's
                # q-block;k-block;v-block rows (reference GPTNeoXModel/
                # BloomModel modify_tensors)
                h = cfg.n_heads
                t = t.reshape(h, 3, t.shape[0] // h // 3, t.shape[1])
                t = np.concatenate([t[:, j].reshape(-1, t.shape[-1]) for j in range(3)])
            elif kind == "neox_qkv_b":
                h = cfg.n_heads
                t = t.reshape(h, 3, t.shape[0] // h // 3)
                t = np.concatenate([t[:, j].reshape(-1) for j in range(3)])
            elif kind == "add1":  # nemotron LayerNorm1P: fold (1 + w)
                t = t + 1.0
            if t.ndim == 2 and qt:
                w.add_tensor(gguf_name, t, _default_qtype_for(gguf_name, t, qtype))
            else:
                w.add_tensor(gguf_name, t.astype(np.float32))

        gput("token_embd.weight", gmap["embed"])
        if "pos_embd" in gmap:
            gput("position_embd.weight", gmap["pos_embd"], qt=False)
        if "embed_norm" in gmap:  # bloom/bert word-embedding LayerNorm
            gput("token_embd_norm.weight", gmap["embed_norm"], qt=False)
            gput("token_embd_norm.bias", gmap.get("embed_norm_b", "\0"), qt=False)
        if "token_types" in gmap:  # bert token-type embedding table
            gput("token_types.weight", gmap["token_types"], qt=False)
        gput("output_norm.weight", gmap["final_norm"], qt=False)
        if "final_norm_b" in gmap:
            gput("output_norm.bias", gmap["final_norm_b"], qt=False)
        if "lm_head" in gmap:
            gput("output.weight", gmap["lm_head"])
            if "lm_head_b" in gmap:
                gput("output.bias", gmap["lm_head_b"], qt=False)
        for i in range(cfg.n_layers):
            for entry in gmap["layer"]:
                kind = entry[2] if len(entry) > 2 else None
                gput(f"blk.{i}.{entry[0]}", f"{lp}.{i}.{entry[1]}", kind)
        w.write()
        return

    if cfg.kv_lora_rank:  # deepseek2: MLA tensors + leading-dense / MoE FFNs.
        # HF rows are already in the NORM (pair-interleaved) rope layout the
        # GGUF expects (same as the reference's DeepseekV2Model: no permute)
        def dput(gguf_name, hf_name, qt=True):
            if hf_name not in sd:
                return
            t = sd[hf_name]
            if t.ndim == 2 and qt:
                w.add_tensor(gguf_name, t, _default_qtype_for(gguf_name, t, qtype))
            else:
                w.add_tensor(gguf_name, t.astype(np.float32))

        dput("token_embd.weight", "model.embed_tokens.weight")
        dput("output_norm.weight", "model.norm.weight", qt=False)
        dput("output.weight", "lm_head.weight")
        for i in range(cfg.n_layers):
            pre = f"model.layers.{i}"
            dput(f"blk.{i}.attn_norm.weight", f"{pre}.input_layernorm.weight", qt=False)
            dput(f"blk.{i}.ffn_norm.weight", f"{pre}.post_attention_layernorm.weight", qt=False)
            if cfg.q_lora_rank:
                dput(f"blk.{i}.attn_q_a.weight", f"{pre}.self_attn.q_a_proj.weight")
                dput(f"blk.{i}.attn_q_a_norm.weight", f"{pre}.self_attn.q_a_layernorm.weight", qt=False)
                dput(f"blk.{i}.attn_q_b.weight", f"{pre}.self_attn.q_b_proj.weight")
            else:
                dput(f"blk.{i}.attn_q.weight", f"{pre}.self_attn.q_proj.weight")
            dput(f"blk.{i}.attn_kv_a_mqa.weight", f"{pre}.self_attn.kv_a_proj_with_mqa.weight")
            dput(f"blk.{i}.attn_kv_a_norm.weight", f"{pre}.self_attn.kv_a_layernorm.weight", qt=False)
            dput(f"blk.{i}.attn_kv_b.weight", f"{pre}.self_attn.kv_b_proj.weight")
            dput(f"blk.{i}.attn_output.weight", f"{pre}.self_attn.o_proj.weight")
            if f"{pre}.mlp.gate.weight" in sd:  # MoE layer
                w.add_tensor(f"blk.{i}.ffn_gate_inp.weight", sd[f"{pre}.mlp.gate.weight"])
                for gguf_name, hf_w in (("ffn_gate_exps", "gate_proj"),
                                        ("ffn_down_exps", "down_proj"),
                                        ("ffn_up_exps", "up_proj")):
                    stacked = np.stack([
                        sd[f"{pre}.mlp.experts.{e}.{hf_w}.weight"]
                        for e in range(cfg.n_expert)
                    ])
                    w.add_tensor(f"blk.{i}.{gguf_name}.weight", stacked)
                for gguf_name, hf_name in (("ffn_gate_shexp", "gate_proj"),
                                           ("ffn_up_shexp", "up_proj"),
                                           ("ffn_down_shexp", "down_proj")):
                    dput(f"blk.{i}.{gguf_name}.weight",
                         f"{pre}.mlp.shared_experts.{hf_name}.weight")
            else:  # leading dense layer
                dput(f"blk.{i}.ffn_gate.weight", f"{pre}.mlp.gate_proj.weight")
                dput(f"blk.{i}.ffn_up.weight", f"{pre}.mlp.up_proj.weight")
                dput(f"blk.{i}.ffn_down.weight", f"{pre}.mlp.down_proj.weight")
        w.write()
        return
    if arch == "deepseek":
        # deepseek v1 (build_deepseek): llama attention (permuted q/k) +
        # leading dense layers, then MoE with shared experts. HF naming is
        # deepseek2's minus the MLA tensors.
        q_perm1 = permute_rows(cfg.n_q_dim, cfg.n_heads)
        k_perm1 = permute_rows(cfg.n_kv_dim, cfg.n_kv_heads)

        def dsput(gguf_name, hf_name, perm=None, qt=True):
            if hf_name not in sd:
                return
            t = sd[hf_name]
            if perm is not None:
                t = t[perm]
            if t.ndim == 2 and qt:
                w.add_tensor(gguf_name, t, _default_qtype_for(gguf_name, t, qtype))
            else:
                w.add_tensor(gguf_name, t.astype(np.float32))

        dsput("token_embd.weight", "model.embed_tokens.weight")
        dsput("output_norm.weight", "model.norm.weight", qt=False)
        dsput("output.weight", "lm_head.weight")
        for i in range(cfg.n_layers):
            pre = f"model.layers.{i}"
            dsput(f"blk.{i}.attn_norm.weight", f"{pre}.input_layernorm.weight", qt=False)
            dsput(f"blk.{i}.ffn_norm.weight",
                  f"{pre}.post_attention_layernorm.weight", qt=False)
            dsput(f"blk.{i}.attn_q.weight", f"{pre}.self_attn.q_proj.weight", q_perm1)
            dsput(f"blk.{i}.attn_k.weight", f"{pre}.self_attn.k_proj.weight", k_perm1)
            dsput(f"blk.{i}.attn_v.weight", f"{pre}.self_attn.v_proj.weight")
            dsput(f"blk.{i}.attn_output.weight", f"{pre}.self_attn.o_proj.weight")
            if f"{pre}.mlp.gate.weight" in sd:  # MoE layer
                w.add_tensor(f"blk.{i}.ffn_gate_inp.weight", sd[f"{pre}.mlp.gate.weight"])
                for gguf_name, hf_w in (("ffn_gate_exps", "gate_proj"),
                                        ("ffn_down_exps", "down_proj"),
                                        ("ffn_up_exps", "up_proj")):
                    stacked = np.stack([
                        sd[f"{pre}.mlp.experts.{e}.{hf_w}.weight"]
                        for e in range(cfg.n_expert)
                    ])
                    w.add_tensor(f"blk.{i}.{gguf_name}.weight", stacked)
                for gguf_name, hf_name in (("ffn_gate_shexp", "gate_proj"),
                                           ("ffn_up_shexp", "up_proj"),
                                           ("ffn_down_shexp", "down_proj")):
                    dsput(f"blk.{i}.{gguf_name}.weight",
                          f"{pre}.mlp.shared_experts.{hf_name}.weight")
            else:  # leading dense layer
                dsput(f"blk.{i}.ffn_gate.weight", f"{pre}.mlp.gate_proj.weight")
                dsput(f"blk.{i}.ffn_up.weight", f"{pre}.mlp.up_proj.weight")
                dsput(f"blk.{i}.ffn_down.weight", f"{pre}.mlp.down_proj.weight")
        w.write()
        return

    if arch == "arctic":
        # arctic: the DENSE FFN comes from residual_mlp (+ its own
        # residual_layernorm); post_attention_layernorm is the MoE branch's
        # norm (ffn_norm_exps) — reference arch_block_mappings_cfg
        sd = dict(sd)
        for i in range(cfg.n_layers):
            p = f"model.layers.{i}"
            for old, new in (
                (f"{p}.post_attention_layernorm.weight", f"{p}.__norm_exps.weight"),
                (f"{p}.residual_layernorm.weight", f"{p}.post_attention_layernorm.weight"),
                (f"{p}.residual_mlp.w1.weight", f"{p}.mlp.gate_proj.weight"),
                (f"{p}.residual_mlp.w3.weight", f"{p}.mlp.up_proj.weight"),
                (f"{p}.residual_mlp.w2.weight", f"{p}.mlp.down_proj.weight"),
            ):
                if old in sd:
                    sd[new] = sd.pop(old)
    if arch == "chameleon":
        # chameleon q/k norms: HF ChameleonLayerNorm holds [H, Dh] params;
        # the GGUF layout takes head 0, re-orders its entries into the
        # rope-permuted (pair-interleaved) row order, and repeats per head
        # (reference ChameleonModel._reverse_hf_permute)
        sd = dict(sd)
        if cfg.swin_norm:
            w.add(f"{arch}.swin_norm", True)

        def _cham_norm(t, n_heads):
            v = t[0] if t.ndim == 2 else t
            dh = v.shape[-1]
            v = v.reshape(2, dh // 2).T.reshape(-1)
            return np.tile(v, n_heads)

        for key in list(sd):
            if key.endswith(("q_norm.weight", "q_norm.bias")):
                sd[key] = _cham_norm(sd[key], cfg.n_heads)
            elif key.endswith(("k_norm.weight", "k_norm.bias")):
                sd[key] = _cham_norm(sd[key], cfg.n_kv_heads)
    if arch == "baichuan":
        # split the fused W_pack into q/k/v thirds; the default llama path
        # below then permutes q/k (reference BaichuanModel.modify_tensors)
        sd = dict(sd)
        for i in range(cfg.n_layers):
            key = f"model.layers.{i}.self_attn.W_pack.weight"
            if key in sd:
                wp = sd.pop(key)
                d = cfg.n_embd
                sd[f"model.layers.{i}.self_attn.q_proj.weight"] = wp[:d]
                sd[f"model.layers.{i}.self_attn.k_proj.weight"] = wp[d:2 * d]
                sd[f"model.layers.{i}.self_attn.v_proj.weight"] = wp[2 * d:]
    if arch == "internlm2":
        # internlm2 stores qkv GROUPED by kv head: [G, q_per_kv+2, Dh, D]
        # (reference InternLM2Model.modify_tensors) — split and rename to the
        # llama layout; the default path permutes q/k
        renames = {
            "model.tok_embeddings.weight": "model.embed_tokens.weight",
            "model.norm.weight": "model.norm.weight",
            "output.weight": "lm_head.weight",
        }
        out_sd = {}
        h, h_kv, dh, d = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.n_embd
        qpk = h // h_kv
        for name, t in sd.items():
            if name in renames:
                out_sd[renames[name]] = t
                continue
            if ".attention.wqkv.weight" in name:
                i = name.split(".")[2]
                qkv = t.reshape(h_kv, qpk + 2, dh, d)
                pre = f"model.layers.{i}.self_attn"
                out_sd[f"{pre}.q_proj.weight"] = qkv[:, :qpk].reshape(-1, d)
                out_sd[f"{pre}.k_proj.weight"] = qkv[:, -2].reshape(-1, d)
                out_sd[f"{pre}.v_proj.weight"] = qkv[:, -1].reshape(-1, d)
                continue
            name = (
                name.replace(".attention_norm.", ".input_layernorm.")
                .replace(".attention.wo.", ".self_attn.o_proj.")
                .replace(".ffn_norm.", ".post_attention_layernorm.")
                .replace(".feed_forward.w1.", ".mlp.gate_proj.")
                .replace(".feed_forward.w3.", ".mlp.up_proj.")
                .replace(".feed_forward.w2.", ".mlp.down_proj.")
            )
            out_sd[name] = t
        sd = out_sd

    # only adjacent-pair-rope archs get LlamaModel.permute'd q/k rows in GGUF
    # (reference convert_hf_to_gguf.py:1596); NEOX-rope archs (qwen*, gemma*,
    # phi3, olmo2) keep the HF half-split layout
    from .config import PERMUTED_ROPE_ARCHS

    if arch in PERMUTED_ROPE_ARCHS:
        q_perm = permute_rows(cfg.n_q_dim, cfg.n_heads)
        k_perm = permute_rows(cfg.n_kv_dim, cfg.n_kv_heads)
    else:
        q_perm = k_perm = None

    def put(gguf_name: str, hf_name: str, perm: np.ndarray | None = None):
        if hf_name not in sd:
            return False
        t = sd[hf_name]
        if perm is not None:
            t = t[perm]
        w.add_tensor(gguf_name, t, _default_qtype_for(gguf_name, t, qtype))
        return True

    is_eagle = arch == "eagle"
    emb_key = "embed_tokens.weight" if is_eagle else "model.embed_tokens.weight"
    lp = "layers" if is_eagle else "model.layers"
    put("token_embd.weight", emb_key)
    if is_eagle:
        put("fc.weight", "fc.weight")
        put("fc.bias", "fc.bias")
    is_gemma = arch.startswith("gemma")  # (1+w) norm fold: gemma AND gemma2
    is_gemma2 = arch == "gemma2"

    def put_norm(gguf_name: str, hf_name: str):
        # gemma's rmsnorm applies (1 + w): fold the +1 at conversion, matching
        # the reference converter (convert_hf_to_gguf.py GemmaModel)
        if hf_name not in sd:
            return
        t = sd[hf_name] + (1.0 if is_gemma else 0.0)
        w.add_tensor(gguf_name, t.astype(np.float32))

    is_olmo2 = arch == "olmo2"
    for i in range(cfg.n_layers):
        for ours, suffix in _HF_LAYER_MAP.items():
            if is_eagle and ours == "attn_norm":
                continue
            from .loader import LayerKeyMap

            if is_gemma and ours in ("attn_norm", "ffn_norm"):
                continue  # handled below with the +1 fold
            if is_olmo2 and ours in ("attn_norm", "ffn_norm"):
                continue  # olmo2 is post-norm-only: HF post_attention_layernorm
                # is a REAL post-attn norm there, not llama's pre-FFN norm
            perm = q_perm if ours == "wq" else k_perm if ours == "wk" else None
            put(f"blk.{i}.{LayerKeyMap[ours]}", f"{lp}.{i}.{suffix}", perm)
        # qwen2-style attention biases
        put(f"blk.{i}.attn_q.bias", f"{lp}.{i}.self_attn.q_proj.bias", q_perm)
        put(f"blk.{i}.attn_k.bias", f"{lp}.{i}.self_attn.k_proj.bias", k_perm)
        put(f"blk.{i}.attn_v.bias", f"{lp}.{i}.self_attn.v_proj.bias")
        # q/k norms: qwen3 (per-head [Dh]) / olmo2 (flat [H*Dh]) — NEOX archs,
        # so never permuted
        put(f"blk.{i}.attn_q_norm.weight", f"{lp}.{i}.self_attn.q_norm.weight")
        put(f"blk.{i}.attn_k_norm.weight", f"{lp}.{i}.self_attn.k_norm.weight")
        # chameleon per-head LayerNorm biases
        put(f"blk.{i}.attn_q_norm.bias", f"{lp}.{i}.self_attn.q_norm.bias")
        put(f"blk.{i}.attn_k_norm.bias", f"{lp}.{i}.self_attn.k_norm.bias")
        put(f"blk.{i}.ffn_norm_exps.weight", f"{lp}.{i}.__norm_exps.weight")  # arctic
        if is_olmo2:
            put(f"blk.{i}.attn_post_norm.weight",
                f"{lp}.{i}.post_attention_layernorm.weight")
            put(f"blk.{i}.ffn_post_norm.weight",
                f"{lp}.{i}.post_feedforward_layernorm.weight")
        if f"{lp}.{i}.mlp.gate.weight" in sd:  # qwen2moe router + experts
            w.add_tensor(f"blk.{i}.ffn_gate_inp.weight", sd[f"{lp}.{i}.mlp.gate.weight"])
            for gguf_name, hf_w in (("ffn_gate_exps", "gate_proj"),
                                    ("ffn_down_exps", "down_proj"),
                                    ("ffn_up_exps", "up_proj")):
                stacked = np.stack([
                    sd[f"{lp}.{i}.mlp.experts.{e}.{hf_w}.weight"]
                    for e in range(cfg.n_expert)
                ])
                w.add_tensor(f"blk.{i}.{gguf_name}.weight", stacked)
            for gguf_name, hf_name in (
                ("ffn_gate_inp_shexp", "mlp.shared_expert_gate"),
                ("ffn_gate_shexp", "mlp.shared_expert.gate_proj"),
                ("ffn_up_shexp", "mlp.shared_expert.up_proj"),
                ("ffn_down_shexp", "mlp.shared_expert.down_proj"),
            ):
                put(f"blk.{i}.{gguf_name}.weight", f"{lp}.{i}.{hf_name}.weight")
        if is_gemma2:  # sandwich norms (gemma2 canonical names, llama-arch.cpp)
            put_norm(f"blk.{i}.attn_norm.weight", f"{lp}.{i}.input_layernorm.weight")
            put_norm(f"blk.{i}.attn_post_norm.weight",
                     f"{lp}.{i}.post_attention_layernorm.weight")
            put_norm(f"blk.{i}.ffn_norm.weight",
                     f"{lp}.{i}.pre_feedforward_layernorm.weight")
            put_norm(f"blk.{i}.ffn_post_norm.weight",
                     f"{lp}.{i}.post_feedforward_layernorm.weight")
        elif is_gemma:  # gemma v1: plain pre-norms, (1+w) folded
            put_norm(f"blk.{i}.attn_norm.weight", f"{lp}.{i}.input_layernorm.weight")
            put_norm(f"blk.{i}.ffn_norm.weight",
                     f"{lp}.{i}.post_attention_layernorm.weight")
        if f"{lp}.{i}.block_sparse_moe.input_linear.weight" in sd:
            # granitemoe: JetMoe-style parallel experts — input_linear fuses
            # [gate; up] along dim -2; pulled apart for mixtral-layout GGUF
            # (reference GraniteMoeModel.modify_tensors)
            w.add_tensor(f"blk.{i}.ffn_gate_inp.weight",
                         sd[f"{lp}.{i}.block_sparse_moe.router.layer.weight"])
            il_w = sd[f"{lp}.{i}.block_sparse_moe.input_linear.weight"]  # [E,2ff,d]
            ffd = il_w.shape[1] // 2
            w.add_tensor(f"blk.{i}.ffn_gate_exps.weight",
                         np.ascontiguousarray(il_w[:, :ffd, :]))
            w.add_tensor(f"blk.{i}.ffn_up_exps.weight",
                         np.ascontiguousarray(il_w[:, ffd:, :]))
            w.add_tensor(f"blk.{i}.ffn_down_exps.weight",
                         sd[f"{lp}.{i}.block_sparse_moe.output_linear.weight"])
        if f"{lp}.{i}.block_sparse_moe.gate.weight" in sd:  # mixtral MoE
            w.add_tensor(f"blk.{i}.ffn_gate_inp.weight",
                         sd[f"{lp}.{i}.block_sparse_moe.gate.weight"])
            n_exp = cfg.n_expert
            for gguf_name, hf_w in (("ffn_gate_exps", "w1"), ("ffn_down_exps", "w2"),
                                    ("ffn_up_exps", "w3")):
                stacked = np.stack([
                    sd[f"{lp}.{i}.block_sparse_moe.experts.{e}.{hf_w}.weight"]
                    for e in range(n_exp)
                ])
                w.add_tensor(f"blk.{i}.{gguf_name}.weight", stacked)
    if not is_eagle:
        if is_gemma:
            put_norm("output_norm.weight", "model.norm.weight")
        else:
            put("output_norm.weight", "model.norm.weight")
        put("output.weight", "lm_head.weight")
    w.write()
