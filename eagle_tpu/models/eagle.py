"""EAGLE feature-level draft head — functional forward.

Dataflow per the reference's build_eagle (src/llama.cpp:1839-2019) and the
EAGLE paper: x = ReLU(FC([embed(token); feature])) -> one llama decoder layer
with *no input norm* (the EAGLE checkpoint has no attn_norm tensor,
src/llama-model.cpp:1589-1647) -> unweighted RMSNorm (no output_norm weight)
-> the TARGET model's lm_head (build_lmhead, src/llama.cpp:1813-1837).

`feature` at step i is the hidden state of token i-1: the target's for
committed tokens, the draft's own output for speculated ones (feature-level
autoregression, src/llama.cpp:10170). Which hidden the engine feeds back —
post-norm (the fork's choice) or pre-norm (official EAGLE training) — is the
engine's `feature_source` knob.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.matmul import qmatmul
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_freqs_cfg
from ..runtime.kvcache import KVCache
from .config import ModelConfig
from .llama import _layer_step, embed_lookup


class EagleOutput(NamedTuple):
    logits: jax.Array  # [B, T, V] via the target's lm_head
    feature: jax.Array  # [B, T, D] the draft's next-step feature (post-norm)
    feature_pre: jax.Array  # [B, T, D] pre-norm variant
    kv: KVCache


def eagle_forward(
    draft_params: dict[str, Any],
    target_params: dict[str, Any],
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, T]
    features: jax.Array,  # [B, T, D] feature of each token's predecessor
    positions: jax.Array,  # [B, T] draft positions (shifted: pair i sits at i-1)
    kv: KVCache,  # single-layer draft cache
    slots: jax.Array,
    mask: jax.Array,
    *,
    backend: str | None = None,
    compute_dtype=jnp.bfloat16,
    return_logits: bool = True,
    kv_limit: int | None = None,  # static attention-read bound (see llama_forward)
    slots_contiguous: bool = False,  # STATIC: per-row slots are start+arange(T)
) -> EagleOutput:
    emb = embed_lookup(draft_params["tok_embd"], tokens)
    fused = jnp.concatenate([emb, features.astype(emb.dtype)], axis=-1)
    x = qmatmul(fused, draft_params["fc_w"], backend, compute_dtype)
    if draft_params.get("fc_b") is not None:
        x = x + draft_params["fc_b"].astype(x.dtype)
    x = jax.nn.relu(x)

    inv_freq, _ = rope_freqs_cfg(cfg)  # mscale re-derived inside _layer_step
    page_table = getattr(kv, "page_table", None)
    page_size = getattr(kv, "page_size", 0) or 0
    if page_table is not None and kv_limit is not None:
        # paged reads gather whole pages — round the read bound up to a page
        kv_limit = min(-(-kv_limit // page_size) * page_size, kv.max_seq)
    if kv_limit is not None:
        kv_limit = min(kv_limit, mask.shape[-1])
        mask = mask[..., :kv_limit]
    x, k_c, v_c, k_s, v_s = _layer_step(
        cfg, inv_freq, positions, slots, mask, compute_dtype, backend,
        x, draft_params["layers"], jnp.int32(0), kv.k, kv.v, kv.k_scale, kv.v_scale,
        kv_limit=kv_limit, slots_contiguous=slots_contiguous,
        page_table=page_table, page_size=page_size,
    )
    kv = dataclasses.replace(kv, k=k_c, v=v_c, k_scale=k_s, v_scale=v_s)

    feat_post = rms_norm(x, None, cfg.rms_eps)  # unweighted: no output_norm tensor
    logits = None
    if return_logits:
        logits = qmatmul(feat_post, target_params["output"], backend, compute_dtype)
    return EagleOutput(logits=logits, feature=feat_post, feature_pre=x, kv=kv)


def random_eagle_params(key, cfg: ModelConfig, scale: float = 0.02) -> dict[str, Any]:
    """Random draft-head params (tests / benchmarks without real checkpoints)."""
    import numpy as np

    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))

    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)

    d, dh, h, hkv, f = cfg.n_embd, cfg.head_dim, cfg.n_heads, cfg.n_kv_heads, cfg.n_ff
    layer = {
        "wq": w(1, h * dh, d),
        "wk": w(1, hkv * dh, d),
        "wv": w(1, hkv * dh, d),
        "wo": w(1, d, h * dh),
        "ffn_norm": jnp.ones((1, d), jnp.float32),
        "w_gate": w(1, f, d),
        "w_up": w(1, f, d),
        "w_down": w(1, d, f),
    }
    return {
        "tok_embd": w(cfg.vocab_size, d),
        "fc_w": w(d, 2 * d),
        "fc_b": w(d),
        "layers": layer,
    }
