"""Rotary position embedding, half-split ("NEOX"/HF) layout.

The GGUF loader un-permutes llama q/k projection rows back to HF layout
(inverting convert_hf_to_gguf.py:1596 LlamaModel.permute), so runtime rope is
always the TPU-friendly half-split form: no lane interleaving, just one roll of
the feature halves — maps to cheap VPU ops under XLA."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_freqs(head_dim: int, base: float, scale_factor: float = 1.0) -> jax.Array:
    """Inverse frequencies [head_dim/2] (f32)."""
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv_freq = 1.0 / (base**exponent)
    return inv_freq / scale_factor


def _yarn_corr_dims(
    n_dims: int, n_ctx_orig: int, base: float, beta_fast: float, beta_slow: float
) -> tuple[float, float]:
    """Correction-range endpoints in frequency-index units
    (ggml_rope_yarn_corr_dims, ggml/src/ggml.c:3699-3711): the dim where a
    frequency completes `beta` rotations over the original context."""
    import math

    def corr(n_rot: float) -> float:
        return (
            n_dims
            * math.log(n_ctx_orig / (n_rot * 2.0 * math.pi))
            / (2.0 * math.log(base))
        )

    start = math.floor(corr(beta_fast))
    end = math.ceil(corr(beta_slow))
    return max(0.0, float(start)), min(float(n_dims - 1), float(end))


def yarn_blend(
    head_dim: int,
    n_ctx_orig: int,
    base: float,
    scale_factor: float,
    ext_factor: float,
    beta_fast: float = 32.0,
    beta_slow: float = 1.0,
):
    """Per-frequency YaRN interpolation multiplier [head_dim/2] (numpy f32).

    ggml's rope_yarn (ggml/src/ggml-cpu/ggml-cpu.c:9358-9373) computes per dim
    theta = theta_interp*(1-mix) + theta_extrap*mix with theta_interp =
    freq_scale*theta_extrap and mix = ramp(corr)*ext_factor. Since theta is
    linear in inv_freq, that is exactly inv_freq * blend with
    blend = freq_scale + mix*(1 - freq_scale) — a static per-frequency vector,
    which is the TPU-shaped form (precomputed once, no per-position branch)."""
    import numpy as np

    freq_scale = 1.0 / scale_factor
    low, high = _yarn_corr_dims(head_dim, n_ctx_orig, base, beta_fast, beta_slow)
    i = np.arange(head_dim // 2, dtype=np.float32)
    # rope_yarn_ramp (ggml-cpu.c:9351-9354): i0/2 == frequency index
    ramp = 1.0 - np.clip((i - low) / max(0.001, high - low), 0.0, 1.0)
    mix = ramp * ext_factor
    return (freq_scale * (1.0 - mix) + mix).astype(np.float32)


def _yarn_active(cfg) -> tuple[float, int]:
    """(resolved ext_factor, resolved n_ctx_orig). ext_factor < 0 means
    "auto": 1.0 when the GGUF says rope.scaling.type=yarn, else 0
    (llama.cpp:11562-11564); n_ctx_orig falls back to the training context
    (llama.cpp:11546-11548)."""
    ext = float(getattr(cfg, "rope_ext_factor", -1.0))
    if ext < 0.0:
        ext = 1.0 if getattr(cfg, "rope_scaling", None) == "yarn" else 0.0
    orig = int(getattr(cfg, "rope_orig_ctx", 0) or 0) or int(
        getattr(cfg, "n_ctx_train", 0) or 0
    )
    return ext, orig


def rope_mscale_cfg(cfg) -> float:
    """YaRN magnitude correction — a STATIC python float multiplying cos/sin
    (the rotated features scale by mscale; q·k scores by mscale² — YaRN's
    attention temperature). deepseek2 pre-cancels the rope-side mscale and
    folds it into kq_scale instead (llama.cpp:6764-6768) — the config builder
    scales attn_scale, so rope_yarn_log_mul archs get mscale=1 here."""
    import math

    mscale = float(getattr(cfg, "rope_attn_factor", 1.0))
    ext, orig = _yarn_active(cfg)
    factor = getattr(cfg, "rope_scale_factor", 1.0) or 1.0
    if ext != 0.0 and orig > 0 and not getattr(cfg, "rope_yarn_log_mul", 0.0):
        # rope_yarn's `mscale *= 1 + 0.1*ln(1/freq_scale)` (ggml-cpu.c:9369)
        mscale *= 1.0 + 0.1 * math.log(factor)
    return mscale


def rope_freqs_cfg(cfg) -> tuple[jax.Array, float]:
    """(inv_freq [rope_dim/2], mscale) from a ModelConfig — the full
    ggml_rope_ext frequency/magnitude semantics (linear + YaRN scaling)."""
    factor = getattr(cfg, "rope_scale_factor", 1.0) or 1.0
    ext, orig = _yarn_active(cfg)
    inv_freq = rope_freqs(cfg.rope_dim, cfg.rope_base, 1.0)
    if ext != 0.0 and orig > 0 and cfg.rope_dim > 0:
        blend = yarn_blend(
            cfg.rope_dim, orig, cfg.rope_base, factor, ext,
            float(getattr(cfg, "rope_beta_fast", 32.0)),
            float(getattr(cfg, "rope_beta_slow", 1.0)),
        )
        inv_freq = inv_freq * jnp.asarray(blend)
    elif factor != 1.0:
        # guard keeps the lowered HLO byte-identical to the unscaled program
        # for the (overwhelmingly common) factor==1 case, preserving the
        # persistent compile cache
        inv_freq = inv_freq / factor
    return inv_freq, rope_mscale_cfg(cfg)


def apply_rope(
    x: jax.Array,
    positions: jax.Array,
    inv_freq: jax.Array,
    mscale: float = 1.0,
) -> jax.Array:
    """Rotate features.

    x: [..., T, H, D]; positions: broadcastable to [..., T] (int32);
    inv_freq: [D/2]; mscale scales cos/sin (YaRN attention-magnitude
    correction — ggml rope_yarn writes cos*mscale / sin*mscale).
    """
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, D/2]
    cos = jnp.cos(angles)[..., None, :]  # [..., T, 1, D/2]
    sin = jnp.sin(angles)[..., None, :]
    if mscale != 1.0:
        cos = cos * mscale
        sin = sin * mscale
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def mrope_section_ids(sections: tuple[int, ...], half_dim: int):
    """Frequency-index -> m-rope section id map [half_dim] (qwen2vl:
    time/height/width dims take cyclic chunks of the rotary frequencies —
    HF apply_multimodal_rotary_pos_emb / ggml GGML_ROPE_TYPE_MROPE)."""
    import numpy as np

    ids = np.zeros(half_dim, np.int32)
    off = 0
    for s_id, width in enumerate(sections):
        if width <= 0:
            continue
        ids[off:off + width] = min(s_id, 2)
        off += width
    ids[off:] = 0
    return ids


def apply_mrope(
    x: jax.Array,
    positions3: jax.Array,  # [3, ..., T] int32 (time, height, width)
    inv_freq: jax.Array,  # [D/2]
    sec_ids,  # [D/2] int32 section id per frequency
    mscale: float = 1.0,
) -> jax.Array:
    """Multimodal rotary (qwen2vl): frequency j rotates with the position of
    its SECTION (text tokens carry equal t/h/w positions, so this reduces to
    apply_rope; image patches separate the axes)."""
    # angles per section: [3, ..., T, D/2]; pick each frequency's section via
    # a static one-hot contraction (sec_ids is host-known)
    angles = positions3[..., None].astype(jnp.float32) * inv_freq
    onehot = jax.nn.one_hot(jnp.asarray(sec_ids), 3, dtype=jnp.float32).T  # [3, D/2]
    oh = onehot.reshape((3,) + (1,) * (angles.ndim - 2) + (-1,))
    sel = (angles * oh).sum(axis=0)  # [..., T, D/2]
    cos = jnp.cos(sel)[..., None, :]
    sin = jnp.sin(sel)[..., None, :]
    if mscale != 1.0:
        cos = cos * mscale
        sin = sin * mscale
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)
