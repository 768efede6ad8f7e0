"""T5 encoder-decoder forward pass.

Graph semantics mirror build_t5_enc / build_t5_dec (src/llama.cpp:7138,7270):
pre-norm RMS blocks, NO attention scaling (T5 trains with scale 1.0),
bucketed relative-position bias added to the self-attention scores (shared
table from the first block, like the HF checkpoints), decoder cross-attention
over the encoder output with no positional bias, and d_model^-0.5 logit
scaling when the lm head is tied to the embeddings.

t5encoder (build_t5_enc only) reuses t5_encode for embedding extraction.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.matmul import qmatmul, qmatmul_layer
from ..ops.norms import rms_norm
from .config import ModelConfig


def relative_buckets(
    q_pos: jax.Array, k_pos: jax.Array, *, bidirectional: bool,
    num_buckets: int = 32, max_distance: int = 128,
) -> jax.Array:
    """T5 relative-position bucket indices [Tq, Tk] (HF
    T5Attention._relative_position_bucket; llm_build_pos_bucket computes the
    same table host-side in the reference)."""
    rel = k_pos[None, :] - q_pos[:, None]  # memory - query
    if bidirectional:
        nb = num_buckets // 2
        base = jnp.where(rel > 0, nb, 0)
        rel = jnp.abs(rel)
    else:
        nb = num_buckets
        base = jnp.zeros_like(rel)
        rel = jnp.maximum(-rel, 0)
    max_exact = nb // 2
    is_small = rel < max_exact
    rel_f = jnp.maximum(rel.astype(jnp.float32), 1.0)
    large = max_exact + (
        jnp.log(rel_f / max_exact) / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return base + jnp.where(is_small, rel, large)


def _rel_bias(rel_b, q_pos, k_pos, bidirectional, num_buckets):
    """[H, Tq, Tk] additive attention bias from the bucket table [NB, H]."""
    buckets = relative_buckets(q_pos, k_pos, bidirectional=bidirectional,
                               num_buckets=num_buckets)
    return jnp.transpose(rel_b[buckets], (2, 0, 1))


def _t5_attention(q, k, v, bias, mask):
    # q,k,v [B,T,H,dh]; bias [H,Tq,Tk] | None; NO 1/sqrt(dh) scaling (T5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    if bias is not None:
        scores = scores + bias[None]
    if mask is not None:
        scores = jnp.where(mask[:, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))


def _t5_ffn(layers, li, x, backend, compute_dtype):
    if "w_gate" in layers or "w_gate_up" in layers:
        if "w_gate_up" in layers:
            gu = qmatmul_layer(x, layers["w_gate_up"], li, backend, compute_dtype)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = qmatmul_layer(x, layers["w_gate"], li, backend, compute_dtype)
            up = qmatmul_layer(x, layers["w_up"], li, backend, compute_dtype)
        h = jax.nn.gelu(gate, approximate=True) * up  # gated-gelu (flan-t5)
    else:
        up = qmatmul_layer(x, layers["w_up"], li, backend, compute_dtype)
        h = jax.nn.relu(up)  # original t5 DenseReluDense
    return qmatmul_layer(h, layers["w_down"], li, backend, compute_dtype)


def _stack_block(cfg, layers, li, x, pos_bias, mask, backend, compute_dtype,
                 cross=None):
    b, t, _ = x.shape
    h, dh = cfg.n_heads, cfg.head_dim
    attn_in = rms_norm(x, layers["attn_norm"][li], cfg.rms_eps)
    q = qmatmul_layer(attn_in, layers["wq"], li, backend, compute_dtype)
    k = qmatmul_layer(attn_in, layers["wk"], li, backend, compute_dtype)
    v = qmatmul_layer(attn_in, layers["wv"], li, backend, compute_dtype)
    attn = _t5_attention(
        q.reshape(b, t, h, dh), k.reshape(b, t, h, dh), v.reshape(b, t, h, dh),
        pos_bias, mask,
    ).reshape(b, t, h * dh)
    x = x + qmatmul_layer(attn.astype(compute_dtype), layers["wo"], li,
                          backend, compute_dtype)
    if cross is not None:
        enc_hidden = cross
        s = enc_hidden.shape[1]
        cross_in = rms_norm(x, layers["cross_norm"][li], cfg.rms_eps)
        cq = qmatmul_layer(cross_in, layers["cross_q"], li, backend, compute_dtype)
        ck = qmatmul_layer(enc_hidden, layers["cross_k"], li, backend, compute_dtype)
        cv = qmatmul_layer(enc_hidden, layers["cross_v"], li, backend, compute_dtype)
        cattn = _t5_attention(
            cq.reshape(b, t, h, dh), ck.reshape(b, s, h, dh),
            cv.reshape(b, s, h, dh), None, None,
        ).reshape(b, t, h * dh)
        x = x + qmatmul_layer(cattn.astype(compute_dtype), layers["cross_o"],
                              li, backend, compute_dtype)
    ffn_in = rms_norm(x, layers["ffn_norm"][li], cfg.rms_eps)
    return x + _t5_ffn(layers, li, ffn_in, backend, compute_dtype)


def t5_encode(
    params: dict[str, Any], cfg: ModelConfig, tokens: jax.Array,
    *, backend: str | None = None, compute_dtype=jnp.float32,
) -> jax.Array:
    """Bidirectional encoder stack -> [B, S, D] final-normed hidden."""
    enc = params["enc"]
    x = params["tok_embd"][tokens].astype(jnp.float32)
    t = tokens.shape[1]
    pos = jnp.arange(t, dtype=jnp.int32)
    bias = _rel_bias(enc["rel_b"], pos, pos, True, cfg.rel_buckets)

    def body(x, li):
        return _stack_block(cfg, enc["layers"], li, x, bias, None, backend,
                            compute_dtype), None

    x, _ = jax.lax.scan(body, x, jnp.arange(cfg.n_layers, dtype=jnp.int32))
    return rms_norm(x, enc["output_norm"], cfg.rms_eps)


def t5_decode(
    params: dict[str, Any], cfg: ModelConfig, tokens: jax.Array,
    enc_hidden: jax.Array,
    *, backend: str | None = None, compute_dtype=jnp.float32,
    tied_head: bool = False,
) -> jax.Array:
    """Causal decoder over `tokens` attending to `enc_hidden` -> logits."""
    dec = params["dec"]
    x = params["tok_embd"][tokens].astype(jnp.float32)
    b, t = tokens.shape
    pos = jnp.arange(t, dtype=jnp.int32)
    bias = _rel_bias(dec["rel_b"], pos, pos, False, cfg.rel_buckets)
    mask = jnp.tril(jnp.ones((t, t), bool))[None].repeat(b, 0)

    def body(x, li):
        return _stack_block(cfg, dec["layers"], li, x, bias, mask, backend,
                            compute_dtype, cross=enc_hidden), None

    x, _ = jax.lax.scan(body, x, jnp.arange(cfg.n_layers, dtype=jnp.int32))
    x = rms_norm(x, dec["output_norm"], cfg.rms_eps)
    if tied_head:
        # HF ties the head and scales the hidden by d^-0.5 before projecting
        x = x * (cfg.n_embd ** -0.5)
    return qmatmul(x, params["output"], backend, compute_dtype)


class T5Generator:
    """Greedy/temperature generation: encode once, re-run the decoder prefix
    per step (T5 contexts are short; an incremental self-KV path can reuse
    the llama cache later)."""

    def __init__(self, params, cfg, *, backend=None, compute_dtype=jnp.float32,
                 eos_id: int = 1):
        params = dict(params)
        tied = bool(params.pop("tied_head", False))
        self.params, self.cfg = params, cfg
        self.backend, self.compute_dtype = backend, compute_dtype
        self.eos_id = eos_id
        self._enc = jax.jit(
            lambda p, tk: t5_encode(p, cfg, tk, backend=backend,
                                    compute_dtype=compute_dtype)
        )
        self._dec = jax.jit(
            lambda p, tk, eh: t5_decode(p, cfg, tk, eh, backend=backend,
                                        compute_dtype=compute_dtype,
                                        tied_head=tied)
        )

    def generate(self, prompt_tokens, max_new_tokens: int = 64,
                 decoder_start_id: int = 0, stop_at_eos: bool = True):
        enc_h = self._enc(self.params, jnp.asarray(
            np.asarray(prompt_tokens, np.int32)[None]))
        out = [decoder_start_id]
        for _ in range(max_new_tokens):
            logits = self._dec(self.params, jnp.asarray(
                np.asarray(out, np.int32)[None]), enc_h)
            nxt = int(np.asarray(jnp.argmax(logits[0, -1])))
            out.append(nxt)
            if stop_at_eos and nxt == self.eos_id:
                break
        return out[1:], {"n_tokens": len(out) - 1}
