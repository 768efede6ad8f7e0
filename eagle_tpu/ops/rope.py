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


def apply_rope(x: jax.Array, positions: jax.Array, inv_freq: jax.Array) -> jax.Array:
    """Rotate features.

    x: [..., T, H, D]; positions: broadcastable to [..., T] (int32);
    inv_freq: [D/2].
    """
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, D/2]
    cos = jnp.cos(angles)[..., None, :]  # [..., T, 1, D/2]
    sin = jnp.sin(angles)[..., None, :]
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
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)
