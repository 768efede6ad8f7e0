"""Functional llama-family forward pass.

Graph semantics mirror llm_build_context::build_llama (src/llama.cpp:1647):
pre-norm RMSNorm, rotary GQA attention, SiLU-gated FFN — but expressed as pure
JAX functions over a pytree of (quantized) weights, traced once under jit, with
the KV cache threaded functionally. One function serves prefill, decode, and
speculative verify (the mask and positions make the difference) — llama.cpp
needs five decode variants for this (src/llama.cpp:9486-10757).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.attention import gqa_attention
from ..ops.matmul import qmatmul, qmatmul_layer
from ..ops.pallas_attention import (
    flash_attention_cached,
    flash_attention_prefill,
    supports_flash,
    supports_flash_prefill,
)
from ..ops.norms import layer_norm, rms_norm
from ..ops.rope import apply_rope, rope_freqs, rope_freqs_cfg, rope_mscale_cfg
from ..quant.qtensor import QTensor
from ..runtime.kvcache import KVCache
from .config import ModelConfig


class ForwardOutput(NamedTuple):
    logits: jax.Array | None  # [B, T, V]
    hidden: jax.Array  # [B, T, D] post-final-norm (the reference's result_norm)
    hidden_pre: jax.Array  # [B, T, D] last-layer output before the final norm
    kv: KVCache


def embed_lookup(tok_embd: QTensor | jax.Array, tokens: jax.Array) -> jax.Array:
    """Gather embedding rows; quantized tables are dequantized row-wise after
    the gather (keeps HBM traffic at quantized width)."""
    if isinstance(tok_embd, QTensor):
        g = tok_embd.group
        q = tok_embd.q[tokens].astype(jnp.float32)  # [..., D]
        scale = tok_embd.scale[tokens].astype(jnp.float32)  # [..., D/g]
        d = q.shape[-1]
        out = q.reshape(*q.shape[:-1], d // g, g) * scale[..., None]
        if tok_embd.bias is not None:
            out = out + tok_embd.bias[tokens].astype(jnp.float32)[..., None]
        return out.reshape(*q.shape)
    return tok_embd[tokens].astype(jnp.float32)


def _sparsemixer_probs(router: jax.Array, k: int, jitter: float) -> jax.Array:
    """HF phimoe sparsemixer routing, inference path (transformers
    modeling_phimoe.sparsemixer with training=False): k sequential argmax
    rounds; each round's selected expert is weighted by its softmax
    probability over that round's jitter-masked score vector, where entries
    with (round_max - score) / max(|score|, round_max) > 2*jitter are masked
    to -inf (numerator/denominator always use the ORIGINAL scores, per the HF
    code). Returns a dense [.., E] weight tensor (zeros off the selected
    experts) for the all-expert combine in _moe_ffn."""
    absr = jnp.abs(router)
    probs = jnp.zeros_like(router)
    masked = router
    for _ in range(k):
        m = masked.max(axis=-1, keepdims=True)
        e = jnp.argmax(masked, axis=-1)  # first max index, like torch .max
        sel = jax.nn.one_hot(e, router.shape[-1], dtype=jnp.bool_)
        drop = (m - router) / jnp.maximum(absr, m) > 2 * jitter
        gates = jax.nn.softmax(jnp.where(drop, -jnp.inf, masked), axis=-1)
        w = jnp.take_along_axis(gates, e[..., None], axis=-1)
        probs = probs + jnp.where(sel, w, 0.0)
        masked = jnp.where(sel, -jnp.inf, masked)
    return probs


def _moe_ffn(cfg: ModelConfig, layers, li, x, act, backend, compute_dtype):
    """Mixtral-style MoE FFN (llm_build_moe_ffn, src/llama.cpp:1976): softmax
    router over top-k experts.

    All experts are computed and combined with (zero-masked) router weights —
    on TPU the static all-expert einsum beats gather/scatter of expert
    weights, and under expert-parallel sharding each device runs only its
    local experts with a psum combine (the EP story, SURVEY §2.4)."""
    b, t, d = x.shape
    router = jnp.einsum(
        "btd,ed->bte", x.astype(compute_dtype),
        layers["ffn_gate_inp"][li].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )  # [B, T, E]
    k = max(cfg.n_expert_used, 1)
    if cfg.moe_sparsemixer:
        # phimoe: HF-exact sparsemixer weights (the fork approximates this
        # arch with the mixtral rule below; see _sparsemixer_probs)
        probs = _sparsemixer_probs(router, k, cfg.router_jitter)
    elif cfg.moe_softmax_all:
        kth = jax.lax.top_k(router, k)[0][..., -1:]
        # qwen2moe/deepseek2: probabilities over ALL experts, non-top-k zeroed;
        # deepseek2 optionally renormalizes the kept weights and applies the
        # routed scaling factor (build_deepseek2 / llm_build_moe_ffn)
        probs = jax.nn.softmax(router, axis=-1)
        probs = jnp.where(router >= kth, probs, 0.0)
        if cfg.expert_weights_norm:
            probs = probs / jnp.maximum(probs.sum(-1, keepdims=True), 1e-20)
        if cfg.expert_weights_scale != 1.0:
            probs = probs * cfg.expert_weights_scale
    else:
        # mixtral: softmax over the selected experts only (mask rest to -inf)
        kth = jax.lax.top_k(router, k)[0][..., -1:]
        masked = jnp.where(router >= kth, router, -jnp.inf)
        probs = jax.nn.softmax(masked, axis=-1)  # zeros for non-top-k

    xe = x.astype(compute_dtype)
    gate = jnp.einsum("btd,efd->btef", xe, layers["w_gate_exps"][li].astype(compute_dtype),
                      preferred_element_type=jnp.float32)
    up = jnp.einsum("btd,efd->btef", xe, layers["w_up_exps"][li].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
    h = (act(gate) * up).astype(compute_dtype)
    out = jnp.einsum("btef,edf->bted", h, layers["w_down_exps"][li].astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    moe = jnp.einsum("bted,bte->btd", out, probs.astype(out.dtype))

    if "w_gate_shexp" in layers:  # shared expert (qwen2moe gated / deepseek2 plain)
        g = jnp.einsum("btd,fd->btf", xe, layers["w_gate_shexp"][li].astype(compute_dtype),
                       preferred_element_type=jnp.float32)
        u = jnp.einsum("btd,fd->btf", xe, layers["w_up_shexp"][li].astype(compute_dtype),
                       preferred_element_type=jnp.float32)
        sh = jnp.einsum("btf,df->btd", (act(g) * u).astype(compute_dtype),
                        layers["w_down_shexp"][li].astype(compute_dtype),
                        preferred_element_type=jnp.float32)
        if "ffn_gate_inp_shexp" in layers:  # qwen2moe sigmoid gate on the shared expert
            gate_logit = jnp.einsum("btd,od->bto", xe,
                                    layers["ffn_gate_inp_shexp"][li].astype(compute_dtype),
                                    preferred_element_type=jnp.float32)
            sh = sh * jax.nn.sigmoid(gate_logit)
        moe = moe + sh
    return moe


def _relu2(x: jax.Array) -> jax.Array:
    """Squared ReLU (nemotron/refact FFN act — build_nemotron)."""
    r = jax.nn.relu(x)
    return r * r


def alibi_slopes(n_heads: int):
    """Per-head ALiBi slopes (Press et al.; matches HF/ggml's formula:
    geometric 2^(-8/n) over the largest power-of-two head count, interleaved
    2^(-4/n)-stepped slopes for the remainder)."""
    import math

    import numpy as np

    n = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-8.0 / n)
    slopes = [base ** (i + 1) for i in range(n)]
    if n < n_heads:
        base2 = 2.0 ** (-4.0 / n)
        slopes += [base2 ** (2 * i + 1) for i in range(n_heads - n)]
    return np.asarray(slopes, np.float32)


def _block_norm(cfg: ModelConfig, layers, key: str, x: jax.Array, li) -> jax.Array:
    """Per-arch block norm: RMSNorm (llama family) or mean-subtracted
    LayerNorm with optional bias (LLM_NORM archs — gpt2/starcoder2/command-r/
    phi2/falcon; llm_build_norm, src/llama.cpp)."""
    w = layers[key][li] if key in layers else None
    b = layers[key + "_b"][li] if key + "_b" in layers else None
    if cfg.norm_type == "layer":
        return layer_norm(x, w, b, cfg.rms_eps)
    return rms_norm(x, w, cfg.rms_eps)


def _ffn(cfg: ModelConfig, layers, li, ffn_in, act, backend, compute_dtype):
    """FFN variants: MoE router, fused/split gated (silu/gelu), or the no-gate
    MLP with biases (gpt2/phi2/starcoder2 c_fc/c_proj — build_gpt2)."""
    if "ffn_gate_inp" in layers and "ffn_norm_exps" not in layers:
        # arctic carries BOTH a dense FFN and a residual MoE; its MoE is
        # dispatched explicitly in _layer_step, so the dense path runs here
        return _moe_ffn(cfg, layers, li, ffn_in, act, backend, compute_dtype)
    if "w_gate_up" in layers:
        gate_up = qmatmul_layer(ffn_in, layers["w_gate_up"], li, backend, compute_dtype)
        if "b_gate_up" in layers:  # jais gated-FFN biases (build_jais)
            gate_up = gate_up + layers["b_gate_up"][li].astype(gate_up.dtype)
        gate, up = jnp.split(gate_up, 2, axis=-1)
    elif "w_gate" in layers:
        gate = qmatmul_layer(ffn_in, layers["w_gate"], li, backend, compute_dtype)
        up = qmatmul_layer(ffn_in, layers["w_up"], li, backend, compute_dtype)
        if "b_gate" in layers:
            gate = gate + layers["b_gate"][li].astype(gate.dtype)
            up = up + layers["b_up"][li].astype(up.dtype)
    else:
        up = qmatmul_layer(ffn_in, layers["w_up"], li, backend, compute_dtype)
        if "b_up" in layers:
            up = up + layers["b_up"][li].astype(up.dtype)
        out = qmatmul_layer(act(up), layers["w_down"], li, backend, compute_dtype)
        if "b_down" in layers:
            out = out + layers["b_down"][li].astype(out.dtype)
        return out
    if "w_gate_s" in layers:  # bitnet per-tensor ternary scales
        gate = gate * layers["w_gate_s"][li]
        up = up * layers["w_up_s"][li]
    h = act(gate) * up
    if "ffn_sub_norm" in layers:
        # bitnet: RMS sub-norm on the gated product BEFORE the down proj
        h = rms_norm(h, layers["ffn_sub_norm"][li], cfg.rms_eps)
    out = qmatmul_layer(h, layers["w_down"], li, backend, compute_dtype)
    if "w_down_s" in layers:  # bitnet
        out = out * layers["w_down_s"][li]
    if "b_down" in layers:
        out = out + layers["b_down"][li].astype(out.dtype)
    return out


def _layer_step(
    cfg: ModelConfig,
    inv_freq: jax.Array,
    positions: jax.Array,  # [B, T]
    slots: jax.Array,  # [B, T] cache slots to write
    mask: jax.Array,  # [B, T, S]
    compute_dtype,
    backend: str | None,
    x: jax.Array,  # [B, T, D] f32
    layers: dict[str, Any],  # LAYER-STACKED weights
    li: jax.Array,  # scalar layer index
    k_cache: jax.Array,  # [L, B, S, H_kv, Dh] — FULL stacked cache
    v_cache: jax.Array,
    k_scale: jax.Array | None = None,  # [L, B, H_kv, S] — int8 KV only
    v_scale: jax.Array | None = None,
    mask_swa: jax.Array | None = None,  # per-layer-alternating SWA (gemma2)
    kv_limit: int | None = None,  # static bound on attention reads (see llama_forward)
    slot_tags: jax.Array | None = None,  # [B, S<=lim] tags for flash prefill
    cache_li: jax.Array | None = None,  # ABSOLUTE layer id for cache addressing
    # (differs from the weight-stack index `li` when layers are scanned in
    # structural groups — deepseek2's dense prefix)
    slots_contiguous: bool = False,  # STATIC: per-row slots are start+arange(T)
    alibi: jax.Array | None = None,  # [H] per-head ALiBi slopes (bloom/mpt)
    mrope_pos: jax.Array | None = None,  # [3, B, T] qwen2vl t/h/w positions
    mrope_sec=None,  # [D/2] static section ids (qwen2vl mrope)
    page_table: jax.Array | None = None,  # [B, MP] paged pool indirection
    page_size: int = 0,  # STATIC page rows (paged caches only)
):
    """One transformer layer. Weights stay layer-stacked; matmuls address the
    stack through `li` (scalar-prefetched on the pallas backend so no
    dynamic-slice copies hit the decode path). The KV cache is likewise
    addressed in place ([li] scatter on write; the read slice fuses into the
    attention contraction) instead of being sliced through scan xs/ys, which
    would copy 2 x S x H x D bytes per layer per step."""
    b, t, _ = x.shape
    h, h_kv, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    cli = li if cache_li is None else cache_li
    x_in = x  # layer input (arctic's residual-MoE branch reads it)

    attn_in = (
        _block_norm(cfg, layers, "attn_norm", x, li)
        if ("attn_norm" in layers or cfg.nonparam_norms) else x
    )
    use_swa = None
    if mask_swa is not None:
        if cfg.swa_full_every > 0:
            # cohere2 pattern: every n-th layer is global, the rest sliding
            # (build_cohere2's `il % 4 < 3` sliding_window_pattern)
            n = jnp.int32(cfg.swa_full_every)
            use_swa = (cli % n) != (n - 1)
        else:
            # gemma2 alternation: even layers use the sliding-window mask
            use_swa = (cli % jnp.int32(max(cfg.swa_every, 1))) == 0
        mask = jax.lax.select(
            jnp.broadcast_to(use_swa, mask.shape), mask_swa, mask
        )

    if "wkv_a" in layers:
        # deepseek2 MLA (build_deepseek2, src/llama.cpp): per-head queries over
        # nope+rope dims; keys/values decompressed from the shared low-rank
        # c_kv; the rope part of K is MQA-style (one per position, broadcast
        # across heads). Naive (uncompressed) cache: K = [k_nope; k_pe].
        nope = dh - cfg.rope_dim
        vd = cfg.v_dim
        if "wq_a" in layers:  # optional query low-rank compression
            qc = qmatmul_layer(attn_in, layers["wq_a"], li, backend, compute_dtype)
            qc = rms_norm(qc, layers["q_a_norm"][li], cfg.rms_eps)
            q = qmatmul_layer(qc, layers["wq_b"], li, backend, compute_dtype)
        else:
            q = qmatmul_layer(attn_in, layers["wq"], li, backend, compute_dtype)
        q = q.reshape(b, t, h, dh)
        ckv = qmatmul_layer(attn_in, layers["wkv_a"], li, backend, compute_dtype)
        c_kv, k_pe = jnp.split(ckv, [cfg.kv_lora_rank], axis=-1)
        c_kv = rms_norm(c_kv, layers["kv_a_norm"][li], cfg.rms_eps)
        kvb = qmatmul_layer(c_kv, layers["wkv_b"], li, backend, compute_dtype)
        kvb = kvb.reshape(b, t, h, nope + vd)
        k_nope, v = jnp.split(kvb, [nope], axis=-1)
        q_nope, q_pe = jnp.split(q, [nope], axis=-1)
        ms = rope_mscale_cfg(cfg)
        q_pe = apply_rope(q_pe, positions, inv_freq, ms)
        k_pe = apply_rope(k_pe[:, :, None, :], positions, inv_freq, ms)
        q = jnp.concatenate([q_nope, q_pe], axis=-1)
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe, (*k_nope.shape[:-1], cfg.rope_dim))],
            axis=-1,
        )
    elif "wqkv" in layers:
        qkv = qmatmul_layer(attn_in, layers["wqkv"], li, backend, compute_dtype)
        if "bqkv" in layers:  # qwen2-style attention biases
            qkv = qkv + layers["bqkv"][li].astype(qkv.dtype)
        q, k, v = jnp.split(qkv, [h * dh, (h + h_kv) * dh], axis=-1)
        if "wq_s" in layers:  # bitnet per-tensor scales survive qkv fusion
            q = q * layers["wq_s"][li]
            k = k * layers["wk_s"][li]
            v = v * layers["wv_s"][li]
    else:
        q = qmatmul_layer(attn_in, layers["wq"], li, backend, compute_dtype)
        k = qmatmul_layer(attn_in, layers["wk"], li, backend, compute_dtype)
        v = qmatmul_layer(attn_in, layers["wv"], li, backend, compute_dtype)
        if "wq_s" in layers:  # bitnet per-tensor ternary scales (build_bitnet)
            q = q * layers["wq_s"][li]
            k = k * layers["wk_s"][li]
            v = v * layers["wv_s"][li]
        if "bqkv" in layers:
            bq, bk, bv = jnp.split(layers["bqkv"][li], [h * dh, (h + h_kv) * dh])
            q = q + bq.astype(q.dtype)
            k = k + bk.astype(k.dtype)
            v = v + bv.astype(v.dtype)
    if cfg.clamp_kqv > 0 and "wkv_a" not in layers:
        # olmo: clamp the q/k/v projections (build_olmo, hparams.f_clamp_kqv)
        c = jnp.asarray(cfg.clamp_kqv, q.dtype)
        q, k, v = jnp.clip(q, -c, c), jnp.clip(k, -c, c), jnp.clip(v, -c, c)
    if "wkv_a" not in layers:  # MLA already produced roped [B,T,H,*] q/k/v
        if "attn_q_norm" in layers and "attn_q_norm_b" not in layers:
            # olmo2: ONE rms norm across the flat projection (weight [H*Dh]);
            # chameleon's [H*Dh] weights carry biases and norm PER HEAD below
            qn, kn = layers["attn_q_norm"][li], layers["attn_k_norm"][li]
            if qn.shape[-1] == h * dh:
                q = rms_norm(q, qn, cfg.rms_eps)
                k = rms_norm(k, kn, cfg.rms_eps)
        q = q.reshape(b, t, h, dh)
        k = k.reshape(b, t, h_kv, dh)
        v = v.reshape(b, t, h_kv, dh)
        if "attn_q_norm" in layers:
            # qwen3: per-head rms norm (weight [Dh]), applied before rope
            qn, kn = layers["attn_q_norm"][li], layers["attn_k_norm"][li]
            if "attn_q_norm_b" in layers:
                # chameleon: per-head LayerNorm WITH bias on q/k (weights
                # stored [H*Dh], identical per head — build_chameleon)
                q = layer_norm(q, qn.reshape(h, dh),
                               layers["attn_q_norm_b"][li].reshape(h, dh),
                               cfg.rms_eps)
                k = layer_norm(k, kn.reshape(h_kv, dh),
                               layers["attn_k_norm_b"][li].reshape(h_kv, dh),
                               cfg.rms_eps)
            elif qn.shape[-1] == dh:
                q = rms_norm(q, qn, cfg.rms_eps)
                k = rms_norm(k, kn, cfg.rms_eps)

        if mrope_sec is not None:
            # qwen2vl multimodal rope: per-section t/h/w positions
            # (build_qwen2vl, GGML_ROPE_TYPE_MROPE)
            from ..ops.rope import apply_mrope

            ms = rope_mscale_cfg(cfg)
            q_r = apply_mrope(q, mrope_pos, inv_freq, mrope_sec, ms)
            k_r = apply_mrope(k, mrope_pos, inv_freq, mrope_sec, ms)
        elif cfg.rope_dim >= dh:
            ms = rope_mscale_cfg(cfg)
            q_r = apply_rope(q, positions, inv_freq, ms)
            k_r = apply_rope(k, positions, inv_freq, ms)
        elif cfg.rope_dim > 0:
            # partial rotary (phi2/stablelm/gpt-neox rot_pct): only the first
            # rope_dim features rotate (build_phi2, src/llama.cpp) — mscale
            # touches only the rotated slice, matching ggml_rope_ext
            rd = cfg.rope_dim
            ms = rope_mscale_cfg(cfg)
            q_r = jnp.concatenate([apply_rope(q[..., :rd], positions, inv_freq, ms), q[..., rd:]], axis=-1)
            k_r = jnp.concatenate([apply_rope(k[..., :rd], positions, inv_freq, ms), k[..., rd:]], axis=-1)
        else:
            # rope_dim == 0: no rotary at all (gpt2 — learned absolute pos)
            q_r, k_r = q, k
        if cfg.rope_swa_only and use_swa is not None:
            # cohere2: global-attention layers are NoPE — rope only applies
            # on sliding-window layers (build_cohere2's is_sliding gate)
            q = jnp.where(use_swa, q_r, q)
            k = jnp.where(use_swa, k_r, k)
        else:
            q, k = q_r, k_r

    b_idx = jnp.arange(b)[:, None, None]  # [B,1,1]
    h_idx = jnp.arange(h_kv)[None, :, None]  # [1,H,1]
    s_idx = slots[:, None, :]  # [B,1,T]
    k_hm = k.transpose(0, 2, 1, 3)  # [B, H_kv, T, D]
    v_hm = v.transpose(0, 2, 1, 3)

    if page_table is not None:
        # paged pool (runtime/paged_kv.py): caches are [L, P, H, page, D]
        # pools; logical slot s of row b lives at pool page
        # page_table[b, s // page], row s % page. Writes scatter through the
        # table (unmapped -> scratch page, see below); reads gather the mapped
        # pages into a contiguous per-slot view and run the same attention.
        # The serving path (PagedBatcher) maps every active row's write window
        # to a private page and copy-on-writes shared pages before reuse.
        from ..runtime.paged_kv import gather_pages

        ps = page_size
        pg = jnp.where(slots >= 0, slots // ps, 0)
        pg = jnp.minimum(pg, page_table.shape[1] - 1)
        phys = jnp.where(slots >= 0, jnp.take_along_axis(page_table, pg, axis=1), -1)
        rows_w = jnp.where(slots >= 0, slots % ps, 0)
        # unmapped writes (slot -1, or a -1 page-table entry of a parked/freed
        # row) route to the pool's reserved SCRATCH page (paged_kv.create
        # allocates it at physical index P-1; never read, never allocated) —
        # scatter would WRAP -1 to the last pool page and dus would CLAMP to
        # page 0, both of which are live pages possibly owned by another
        # sequence (silent cross-request KV corruption)
        scratch = k_cache.shape[1] - 1
        phys = jnp.where(phys < 0, scratch, phys)
        if t == 1 and b <= 16:
            # decode fast path: one dynamic_update_slice per row (the paged
            # counterpart of the dense dus promotion below)
            def _pwrite(cache, upd):  # upd [B, H, 1, ...]
                upd = upd.astype(cache.dtype)
                for bi in range(b):
                    idx = (cli, phys[bi, 0], 0, rows_w[bi, 0]) + (0,) * (cache.ndim - 4)
                    cache = jax.lax.dynamic_update_slice(cache, upd[bi][None, None], idx)
                return cache
        else:
            def _pwrite(cache, upd):  # scatter through the page table
                return cache.at[cli, phys[:, None, :], h_idx, rows_w[:, None, :]].set(
                    upd.astype(cache.dtype)
                )

        lim_p = kv_limit if kv_limit is not None else page_table.shape[1] * ps
        np_lim = max(1, -(-lim_p // ps))
        if k_scale is not None:
            from ..runtime.kvcache import dequantize_kv, quantize_kv_vec

            k_q, k_s = quantize_kv_vec(k_hm)
            v_q, v_s = quantize_kv_vec(v_hm)
            k_cache = _pwrite(k_cache, k_q)
            v_cache = _pwrite(v_cache, v_q)
            k_scale = _pwrite(k_scale, k_s)
            v_scale = _pwrite(v_scale, v_s)
            k_read = dequantize_kv(
                gather_pages(k_cache, cli, page_table, np_lim),
                gather_pages(k_scale, cli, page_table, np_lim), compute_dtype,
            )
            v_read = dequantize_kv(
                gather_pages(v_cache, cli, page_table, np_lim),
                gather_pages(v_scale, cli, page_table, np_lim), compute_dtype,
            )
        else:
            k_cache = _pwrite(k_cache, k_hm)
            v_cache = _pwrite(v_cache, v_hm)
            k_read = gather_pages(k_cache, cli, page_table, np_lim)
            v_read = gather_pages(v_cache, cli, page_table, np_lim)
        attn = gqa_attention(
            q, k_read[:, :h_kv], v_read[:, :h_kv],
            mask[..., : np_lim * ps],
            scale=cfg.attn_scale, softcap=cfg.attn_softcap,
            alibi=alibi, q_pos=positions,
        )
        # falls through to the shared wo/FFN tail below

    if page_table is None:
        # T == 1 is trivially a contiguous run, EXCEPT that scatter DROPS
        # out-of-bounds slots while dynamic_update_slice clamps them — so the
        # auto-promotion stays off when a caller could pass slot -1 (callers that
        # do — chunked prefill's shifted draft row — use scatter by not opting in)
        slots_contiguous = slots_contiguous or t == 1
        if slots_contiguous and b <= 16:
            # per-row slots are a contiguous run (slots[b] = slots[b,0] + arange):
            # write via dynamic_update_slice — the generic gather-indexed scatter
            # measured 16.4 us per cache write on v5e (2 per layer ≈ 1 ms per
            # 32-layer verify forward), the dus ~2 us. One dus per batch row (b is
            # static and small on the decode path; rows update disjoint [b] lanes).
            def _write(cache, upd):  # cache [L,B,H,S,...], upd [B,H,T,...]
                upd = upd.astype(cache.dtype)
                for bi in range(b):
                    idx = (cli, bi, 0, slots[bi, 0]) + (0,) * (upd.ndim - 3)
                    cache = jax.lax.dynamic_update_slice(
                        cache, upd[bi][None, None], idx
                    )
                return cache
        else:
            def _write(cache, upd):  # scatter: arbitrary per-row slot vectors
                return cache.at[cli, b_idx, h_idx, s_idx].set(upd.astype(cache.dtype))

        # attention reads cover cache slots [0, lim) only — `mask` arrives already
        # sliced to lim by llama_forward; writes above still address the full cache
        lim = kv_limit if kv_limit is not None else k_cache.shape[3]
        if k_scale is not None:  # int8 KV: per-vector absmax quantization on write
            from ..runtime.kvcache import dequantize_kv, quantize_kv_vec

            k_q, k_s = quantize_kv_vec(k_hm)
            v_q, v_s = quantize_kv_vec(v_hm)
            k_cache = _write(k_cache, k_q)
            v_cache = _write(v_cache, v_q)
            k_scale = _write(k_scale, k_s)
            v_scale = _write(v_scale, v_s)
            attn = gqa_attention(
                q,
                # :h_kv slices heterogeneous-GQA caches (openelm/deci) allocated
                # at the max kv-head count; a no-op for homogeneous models
                dequantize_kv(k_cache[cli, :, :h_kv, :lim], k_scale[cli, :, :h_kv, :lim]),
                dequantize_kv(v_cache[cli, :, :h_kv, :lim], v_scale[cli, :, :h_kv, :lim]),
                mask,
                scale=cfg.attn_scale,
                softcap=cfg.attn_softcap,
                alibi=alibi, q_pos=positions,
            )
        else:
            k_cache = _write(k_cache, k_hm)
            v_cache = _write(v_cache, v_hm)

            if (
                backend == "pallas"
                and slot_tags is not None  # caller vouches the mask is tag-causal
                and cfg.attn_softcap == 0.0
                and alibi is None
                and k_cache.shape[-1] == v_cache.shape[-1]
                and k_cache.shape[2] == h_kv
                and supports_flash_prefill(t, h, h_kv, lim, dh)
            ):
                attn = flash_attention_prefill(
                    q, k_cache, v_cache, positions, slot_tags, cli, s_limit=lim,
                    scale=cfg.attn_scale,
                )
            elif (
                backend == "pallas"
                and cfg.attn_softcap == 0.0
                and alibi is None
                and k_cache.shape[-1] == v_cache.shape[-1]  # MLA: Dv != Dk
                and k_cache.shape[2] == h_kv  # hetero GQA stays on the XLA path
                and supports_flash(t, h, h_kv, lim, dh)
            ):
                attn = flash_attention_cached(q, k_cache, v_cache, mask, cli, s_limit=lim)
            else:
                attn = gqa_attention(
                    q, k_cache[cli, :, :h_kv, :lim], v_cache[cli, :, :h_kv, :lim], mask,
                    scale=cfg.attn_scale, softcap=cfg.attn_softcap,
                    alibi=alibi, q_pos=positions,
                )
    attn_flat = attn.reshape(b, t, -1)  # H * Dv (Dv != Dh for MLA)
    if "attn_sub_norm" in layers:
        # bitnet: RMS sub-norm on the attention output BEFORE wo
        attn_flat = rms_norm(attn_flat, layers["attn_sub_norm"][li], cfg.rms_eps)

    from ..ops.pallas_ffn import ffn_block_pallas, supports_ffn_block

    d = x.shape[-1]
    rows = b * t
    import os

    fused_mode = os.environ.get("EAGLE_TPU_FUSED_FFN", "0")
    if (
        backend == "pallas"
        and rows <= 64  # decode/verify shapes; prefill scratch would blow VMEM
        and fused_mode in ("1", "all", "wo")
        and supports_ffn_block(layers, cfg)
    ):
        # fused attn-out + FFN block: three back-to-back pallas kernels
        # stream Wo, Wgate_up, Wdown with the resid/norm/act epilogues
        # computed in VMEM — no XLA elementwise ops between the matmuls
        rp = max(8, -(-rows // 8) * 8)
        a2 = attn_flat.reshape(rows, h * dh)
        r2 = x.reshape(rows, d)
        if rp != rows:
            a2 = jnp.pad(a2, ((0, rp - rows), (0, 0)))
            r2 = jnp.pad(r2, ((0, rp - rows), (0, 0)))
        out = ffn_block_pallas(
            a2, r2, layers["ffn_norm"][li],
            layers["wo"], layers["w_gate_up"], layers["w_down"], li,
            rms_eps=cfg.rms_eps, act_fn=cfg.act, compute_dtype=compute_dtype,
            stages="wo" if fused_mode == "wo" else "all",
        )
        x = out[:rows].reshape(b, t, d)
    else:
        attn_out = qmatmul_layer(attn_flat, layers["wo"], li, backend, compute_dtype)
        if "wo_s" in layers:  # bitnet
            attn_out = attn_out * layers["wo_s"][li]
        if "bo" in layers:  # attention output bias (gpt2/phi2/starcoder2)
            attn_out = attn_out + layers["bo"][li].astype(attn_out.dtype)
        if "post_attn_norm" in layers:  # gemma2 sandwich norm
            attn_out = rms_norm(attn_out, layers["post_attn_norm"][li], cfg.rms_eps)
        act = (
            jax.nn.silu if cfg.act == "silu"
            else _relu2 if cfg.act == "relu2"  # nemotron squared relu
            else partial(jax.nn.gelu, approximate=True)
        )
        if cfg.parallel_blocks:
            # parallel residual: x + attn + ffn. The FFN branch norms with its
            # own ffn_norm when the tensor exists (gpt-neox/stablelm two-norm
            # form) or shares the attention input norm (command-r/phi2/falcon/
            # gptj single-norm form)
            ffn_in = (
                _block_norm(cfg, layers, "ffn_norm", x, li)
                if "ffn_norm" in layers else attn_in
            )
            ffn_out = _ffn(cfg, layers, li, ffn_in, act, backend, compute_dtype)
            x = x + attn_out + ffn_out
        else:
            if cfg.resid_scale != 1.0:  # granite residual multiplier
                attn_out = attn_out * cfg.resid_scale
            x = x + attn_out
            # olmo2 has no pre-FFN norm (post-norm-only block); olmo's pre-FFN
            # norm is non-parametric (no tensor, but the norm still applies)
            ffn_in = (
                _block_norm(cfg, layers, "ffn_norm", x, li)
                if ("ffn_norm" in layers or cfg.nonparam_norms) else x
            )
            ffn_out = _ffn(cfg, layers, li, ffn_in, act, backend, compute_dtype)
            if "post_ffn_norm" in layers:
                ffn_out = rms_norm(ffn_out, layers["post_ffn_norm"][li], cfg.rms_eps)
            if cfg.resid_scale != 1.0:
                ffn_out = ffn_out * cfg.resid_scale
            x = x + ffn_out
            if "ffn_norm_exps" in layers:
                # arctic (build_arctic): a residual MoE branch in PARALLEL
                # with the dense FFN — its input is the LAYER INPUT normed
                # with ffn_norm_exps, added after the dense residual
                moe_in = rms_norm(x_in, layers["ffn_norm_exps"][li], cfg.rms_eps)
                x = x + _moe_ffn(cfg, layers, li, moe_in, act, backend, compute_dtype)
    if "cvec" in layers:  # control vector (llama_adapter_cvec.apply_to, src/llama-adapter.cpp)
        x = x + layers["cvec"][li].astype(x.dtype)
    return x, k_cache, v_cache, k_scale, v_scale


def llama_forward(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, T] int32
    positions: jax.Array,  # [B, T] int32 rope/logical positions
    kv: KVCache,
    slots: jax.Array,  # [B, T] cache slot indices to write k/v into
    mask: jax.Array,  # [B, T, S] bool — visibility of each cache slot
    *,
    backend: str | None = None,
    compute_dtype=jnp.bfloat16,
    return_logits: bool = True,
    input_embeds: jax.Array | None = None,
    kv_limit: int | None = None,
    slots_contiguous: bool = False,
    mrope_positions: jax.Array | None = None,  # [3, B, T] (qwen2vl)
    causal_tags_prefill: bool = False,  # mask IS causal_mask_from_tags: lets
    # the pallas prefill flash kernel rebuild it in VMEM from the tags
) -> ForwardOutput:
    """Run the transformer.

    `hidden` is the post-final-norm hidden state (the reference's `result_norm`
    tensor — what the fork hands to EAGLE, src/llama.cpp:10426); `hidden_pre`
    is the raw last-layer output (what official EAGLE checkpoints were trained
    on as the feature).

    `input_embeds` [B, T, D], when given, replaces the token-embedding lookup
    (llama_batch.embd, src/llama-batch.h — the multimodal path where llava
    splices image-projector rows between text embeddings).

    `kv_limit` (STATIC) bounds attention reads to cache slots [0, kv_limit):
    with the cache allocated at max_seq, every step would otherwise stream all
    max_seq K/V slots from HBM (measured 24.7 us/layer at S=1024 — ~7% of the
    7B decode step). Callers that know (on host) that all valid tags live in
    slots < kv_limit — the generator's slot==ordinal invariant — pass a
    per-chunk bucket; writes still address the full cache, so the compiled
    program per bucket stays valid as the sequence grows into it. This is the
    TPU-shaped counterpart of the reference growing its ubatch KV view with
    n_kv (llama.cpp's build-graph kv_size)."""
    x = input_embeds if input_embeds is not None else embed_lookup(params["tok_embd"], tokens)
    if cfg.embd_scale != 1.0:  # gemma: embeddings scaled by sqrt(n_embd)
        x = x * jnp.asarray(cfg.embd_scale, x.dtype)
    if cfg.has_pos_embd:  # gpt2 learned absolute positions (wpe — build_gpt2)
        x = x + params["pos_embd"][positions].astype(x.dtype)
    if "tok_embd_norm" in params:  # bloom word-embedding LayerNorm (build_bloom)
        x = layer_norm(
            x, params["tok_embd_norm"], params.get("tok_embd_norm_b"), cfg.rms_eps
        )
    alibi = (
        jnp.asarray(alibi_slopes(cfg.n_heads)) if cfg.use_alibi else None
    )
    # linear + YaRN scaling and the magnitude correction mscale
    # (ggml_rope_ext semantics — ops/rope.py:rope_freqs_cfg)
    inv_freq, rope_mscale = rope_freqs_cfg(cfg)
    if "rope_factors" in params:
        # per-frequency divisors (llama-3.1 smooth interpolation / phi3
        # longrope): ggml_rope_ext divides theta by freq_factors[i]
        # (rope_freqs.weight, reference LlamaModel.generate_extra_tensors) —
        # the division commutes with the YaRN blend (both elementwise)
        inv_freq = inv_freq / params["rope_factors"]
    mrope_pos = mrope_sec = None
    if cfg.mrope_sections:
        from ..ops.rope import mrope_section_ids

        mrope_sec = mrope_section_ids(cfg.mrope_sections, cfg.rope_dim // 2)
        mrope_pos = (
            mrope_positions if mrope_positions is not None
            # text-only: every section carries the text position — mrope
            # reduces to plain rope (HF get_rope_index for pure text)
            else jnp.broadcast_to(positions[None], (3, *positions.shape))
        )
    layers = params["layers"]
    page_table = getattr(kv, "page_table", None)
    page_size = getattr(kv, "page_size", 0) or 0
    if page_table is not None and kv_limit is not None:
        # paged reads gather whole pages — round the read bound up to a page
        kv_limit = min(-(-kv_limit // page_size) * page_size, kv.max_seq)
    if kv_limit is not None:
        kv_limit = min(kv_limit, mask.shape[-1])
        mask = mask[..., :kv_limit]
    slot_tags = None
    import os as _os

    if (causal_tags_prefill and cfg.swa_window == 0
            and _os.environ.get("EAGLE_TPU_FLASH_PREFILL", "1") != "0"):
        slot_tags = kv.slot_pos[:, : kv_limit if kv_limit else kv.slot_pos.shape[1]]
    mask_swa = None
    if cfg.swa_window > 0 and (cfg.swa_every > 0 or cfg.swa_full_every > 0):
        # gemma2: alternating global/sliding layers need both masks (the
        # per-layer select happens inside the scan). Slot index == position is
        # the engines' cache invariant, so the window test uses slot indices.
        s_idx = jnp.arange(mask.shape[-1], dtype=jnp.int32)[None, None, :]
        mask_swa = mask & (positions[:, :, None] - s_idx < cfg.swa_window)

    if "hetero" in params:
        assert page_table is None, "paged KV: homogeneous-layer archs only"
        # heterogeneous per-layer shapes (openelm's NAS head/ffn schedules,
        # deci's attention-free / linear-attention layers): no scan — a
        # python loop with per-layer configs; the KV cache is allocated at
        # the MAX kv-head count and each layer touches its first h_kv rows
        k_all, v_all, k_s, v_s = kv.k, kv.v, kv.k_scale, kv.v_scale
        act = (
            jax.nn.silu if cfg.act == "silu"
            else _relu2 if cfg.act == "relu2"
            else partial(jax.nn.gelu, approximate=True)
        )
        for i, lyr in enumerate(params["hetero"]):
            hc = cfg.head_counts[i] if cfg.head_counts else cfg.n_heads
            kvc = cfg.kv_head_counts[i] if cfg.kv_head_counts else cfg.n_kv_heads
            zero = jnp.int32(0)
            cli = jnp.int32(i)
            if hc == 0:
                # deci attention-free layer: the block is FFN-only and the
                # FFN input is the raw stream (build_deci's n_head == 0 arm)
                ffn_in = _block_norm(cfg, lyr, "ffn_norm", x, zero)
                out = _ffn(cfg, lyr, zero, ffn_in, act, backend, compute_dtype)
                x = x + out * cfg.resid_scale
            elif kvc == 0:
                # deci "linear attention": wo over the normed stream
                attn_in = _block_norm(cfg, lyr, "attn_norm", x, zero)
                lin = qmatmul_layer(attn_in, lyr["wo"], zero, backend, compute_dtype)
                x = x + lin * cfg.resid_scale
                ffn_in = _block_norm(cfg, lyr, "ffn_norm", x, zero)
                out = _ffn(cfg, lyr, zero, ffn_in, act, backend, compute_dtype)
                x = x + out * cfg.resid_scale
            else:
                cfg_i = dataclasses.replace(cfg, n_heads=hc, n_kv_heads=kvc)
                x, k_all, v_all, k_s, v_s = _layer_step(
                    cfg_i, inv_freq, positions, slots, mask, compute_dtype,
                    backend, x, lyr, zero, k_all, v_all, k_s, v_s,
                    kv_limit=kv_limit, cache_li=cli,
                    slots_contiguous=slots_contiguous,
                )
        kv = dataclasses.replace(kv, k=k_all, v=v_all, k_scale=k_s, v_scale=v_s)
        hidden = (
            layer_norm(x, params.get("output_norm"), params.get("output_norm_b"),
                       cfg.rms_eps)
            if cfg.norm_type == "layer"
            else rms_norm(x, params.get("output_norm"), cfg.rms_eps)
        )
        logits = None
        if return_logits:
            logits = qmatmul(hidden, params["output"], backend, compute_dtype)
            if cfg.logit_scale != 1.0:
                logits = logits * cfg.logit_scale
        return ForwardOutput(logits=logits, hidden=hidden, hidden_pre=x, kv=kv)

    # deepseek2 puts dense FFN layers before the MoE layers — different weight
    # shapes can't share one stack, so each structural group gets its own scan
    # (cache indexing stays absolute via the scanned layer ids)
    groups: list[tuple[dict, int]] = []
    if "layers_dense" in params:
        groups.append((params["layers_dense"], 0))
        groups.append((layers, cfg.n_dense_layers))
    else:
        groups.append((layers, 0))

    carry = (x, kv.k, kv.v, kv.k_scale, kv.v_scale)
    for grp, base in groups:
        n_grp = next(iter(grp.values())).shape[0] if grp else 0

        def scan_body(c, ids, _grp=grp):
            wi, cli = ids
            x, k_all, v_all, k_s, v_s = c
            x, k_all, v_all, k_s, v_s = _layer_step(
                cfg, inv_freq, positions, slots, mask, compute_dtype, backend,
                x, _grp, wi, k_all, v_all, k_s, v_s, mask_swa=mask_swa,
                kv_limit=kv_limit, cache_li=cli,
                slots_contiguous=slots_contiguous, alibi=alibi,
                mrope_pos=mrope_pos, mrope_sec=mrope_sec,
                slot_tags=slot_tags,
                page_table=page_table, page_size=page_size,
            )
            return (x, k_all, v_all, k_s, v_s), None

        carry, _ = jax.lax.scan(
            scan_body, carry,
            (jnp.arange(n_grp, dtype=jnp.int32),
             jnp.arange(base, base + n_grp, dtype=jnp.int32)),
        )
    (x, new_k, new_v, new_ks, new_vs) = carry

    kv = dataclasses.replace(kv, k=new_k, v=new_v, k_scale=new_ks, v_scale=new_vs)
    if cfg.norm_type == "layer":
        hidden = layer_norm(
            x, params.get("output_norm"), params.get("output_norm_b"), cfg.rms_eps
        )
    else:
        hidden = rms_norm(x, params.get("output_norm"), cfg.rms_eps)
    logits = None
    if return_logits:
        logits = qmatmul(hidden, params["output"], backend, compute_dtype)
        if "output_b" in params:  # phi2 lm_head bias
            logits = logits + params["output_b"].astype(logits.dtype)
        if cfg.logit_scale != 1.0:  # command-r/granite LLM_KV_LOGIT_SCALE
            logits = logits * cfg.logit_scale
        if cfg.final_softcap > 0:  # gemma2 final logit softcapping
            c = cfg.final_softcap
            logits = c * jnp.tanh(logits / c)
    return ForwardOutput(logits=logits, hidden=hidden, hidden_pre=x, kv=kv)
