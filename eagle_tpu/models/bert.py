"""BERT encoder for embedding models (LLM_ARCH_BERT, build_bert
src/llama.cpp:3005-3196): bidirectional attention over valid tokens,
post-norm blocks (residual -> LayerNorm), learned absolute positions +
token-type row 0, gelu no-gate FFN, CLS / mean / none pooling
(llama_pooling_type; the server's /v1/embeddings path).

One stateless forward — no KV cache (encoders re-read the whole input)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.matmul import qmatmul
from ..ops.norms import layer_norm
from .config import ModelConfig
from .llama import embed_lookup


class BertOutput(NamedTuple):
    hidden: jax.Array  # [B, T, D] per-token embeddings
    pooled: jax.Array  # [B, D] per-pooling_type sentence embedding


def bert_forward(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, T]
    n_valid: jax.Array,  # [B] true lengths (right padding masked out)
    *,
    backend: str | None = None,
    compute_dtype=jnp.float32,
    pooling: str = "mean",  # "cls" | "mean" | "none" (llama_pooling_type)
) -> BertOutput:
    b, t = tokens.shape
    h, dh = cfg.n_heads, cfg.head_dim
    layers = params["layers"]
    valid = jnp.arange(t)[None, :] < n_valid[:, None]  # [B, T]

    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
    x = embed_lookup(params["tok_embd"], tokens).astype(jnp.float32)
    # token types hardcoded to row 0 ("Sentence A") like the reference
    if "token_types" in params:
        x = x + params["token_types"][0][None, None]
    if "pos_embd" in params:  # plain bert: learned absolute positions
        x = x + params["pos_embd"][positions]
    x = layer_norm(x, params["tok_embd_norm"], params.get("tok_embd_norm_b"), cfg.rms_eps)

    # bidirectional mask over valid tokens only
    mask = valid[:, None, :] & valid[:, :, None]  # [B, T, T]

    use_rope = cfg.rope_dim > 0 and not cfg.use_alibi  # nomic-bert
    alibi = None
    if cfg.use_alibi:  # jina-bert-v2
        from .llama import alibi_slopes

        alibi = jnp.asarray(alibi_slopes(h))
    if use_rope:
        from ..ops.rope import apply_rope, rope_freqs_cfg

        inv_freq, _ = rope_freqs_cfg(cfg)

    for li in range(cfg.n_layers):
        if "wqkv" in layers:  # nomic-bert fused projection, no biases
            qkv = qmatmul(x, layers["wqkv"][li], backend, compute_dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = qmatmul(x, layers["wq"][li], backend, compute_dtype) + layers["bq"][li]
            k = qmatmul(x, layers["wk"][li], backend, compute_dtype) + layers["bk"][li]
            v = qmatmul(x, layers["wv"][li], backend, compute_dtype) + layers["bv"][li]
        q = q.reshape(b, t, h, dh)
        k = k.reshape(b, t, h, dh)
        if use_rope:
            q = apply_rope(q, positions, inv_freq)
            k = apply_rope(k, positions, inv_freq)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (dh ** -0.5)
        if alibi is not None:
            # additive per-head bias slope * key position (softmax is
            # invariant to the per-row shift — matches ggml soft_max_ext)
            scores = scores + alibi[None, :, None, None] * jnp.arange(
                t, dtype=jnp.float32
            )[None, None, None, :]
        scores = jnp.where(mask[:, None], scores, -1e30)
        attn = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, axis=-1), v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
        ao = qmatmul(attn, layers["wo"][li], backend, compute_dtype)
        if "bo" in layers:
            ao = ao + layers["bo"][li]
        x = layer_norm(x + ao, layers["attn_out_norm"][li],
                       layers["attn_out_norm_b"][li], cfg.rms_eps)
        if "w_gate" in layers:  # gated FFN: nomic (silu) / jina-v2 (gelu)
            gate = qmatmul(x, layers["w_gate"][li], backend, compute_dtype)
            up = qmatmul(x, layers["w_up"][li], backend, compute_dtype)
            act = jax.nn.silu if cfg.act == "silu" else (
                lambda z: jax.nn.gelu(z, approximate=False)
            )
            dn = qmatmul(act(gate) * up, layers["w_down"][li], backend,
                         compute_dtype)
        else:
            up = qmatmul(x, layers["w_up"][li], backend, compute_dtype) + layers["b_up"][li]
            dn = qmatmul(jax.nn.gelu(up, approximate=False), layers["w_down"][li],
                         backend, compute_dtype)
        if "b_down" in layers:
            dn = dn + layers["b_down"][li]
        x = layer_norm(x + dn, layers["layer_out_norm"][li],
                       layers["layer_out_norm_b"][li], cfg.rms_eps)

    if pooling == "cls":
        pooled = x[:, 0]
    elif pooling == "mean":
        w = valid.astype(x.dtype)
        pooled = (x * w[:, :, None]).sum(1) / jnp.maximum(w.sum(1), 1.0)[:, None]
    else:
        pooled = x[:, 0]
    return BertOutput(hidden=x, pooled=pooled)
