"""Synthetic model construction: random weights in real layouts/shapes.

Benchmarks and compile checks need checkpoint-shaped models without any
checkpoint on disk (throughput doesn't depend on weight values). QTensors are
synthesized directly (random int codes + scales) — no quantization pass, so a
7B materializes in seconds."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..models.config import ModelConfig
from ..quant.qtensor import QTensor

VICUNA_7B = ModelConfig(
    arch="llama", vocab_size=32000, n_embd=4096, n_layers=32, n_heads=32,
    n_kv_heads=32, head_dim=128, n_ff=11008, rms_eps=1e-6, rope_base=10000.0,
    rope_dim=128, n_ctx_train=2048,
)


def synth_qtensor(
    rng,
    n: int,
    k: int,
    qtype: GGMLType = GGMLType.Q4_K,
    layout: str = "kn",
    stack: int | None = None,
    packed: bool = False,
    scale_dtype=jnp.float32,
    coded: bool = False,
) -> QTensor:
    """rng is either a numpy Generator (host synth) or a jax PRNG key (device
    synth — generates weights directly in HBM, no host->device transfer; used
    by benchmarks where an 8GB upload through a TPU relay would dominate)."""
    group = 16 if qtype == GGMLType.Q6_K else 32
    lo, hi = {
        GGMLType.Q4_K: (0, 16),
        GGMLType.Q4_0: (0, 16),
        GGMLType.Q5_K: (0, 32),
        GGMLType.Q6_K: (-32, 32),
        GGMLType.Q8_0: (-127, 128),
    }[qtype]
    has_bias = qtype in (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q4_0)
    lead = () if stack is None else (stack,)
    if layout == "kn":
        qshape, sshape = lead + (k, n), lead + (k // group, n)
    else:
        qshape, sshape = lead + (n, k), lead + (n, k // group)
    scale_mag = 0.02 / max(1, (hi - 1))
    if isinstance(rng, np.random.Generator):
        q = jnp.asarray(rng.integers(lo, hi, size=qshape, dtype=np.int8))
        scale = jnp.asarray(rng.uniform(0.5, 1.5, size=sshape).astype(np.float32) * scale_mag)
        bias = (
            jnp.asarray(rng.normal(0, scale_mag, size=sshape).astype(np.float32))
            if has_bias
            else None
        )
    else:
        import jax

        # when the caller wants nibble-packed codes, synthesize the PACKED
        # bytes directly (random bytes == two random nibbles): materializing
        # the unpacked int8 first costs K*N bytes of HBM — at 13B shapes that
        # transient alone OOMs a 16GB chip
        direct_pack = packed and layout == "kn" and hi <= 16 and lo >= 0
        gshape = qshape if not direct_pack else qshape[:-2] + (qshape[-2] // 2, qshape[-1])
        glo, ghi = (lo, hi) if not direct_pack else (-128, 128)
        k1, k2, k3 = jax.random.split(rng, 3)
        gen = jax.jit(
            lambda k1, k2, k3: (
                jax.random.randint(k1, gshape, glo, ghi, dtype=jnp.int8),
                jax.random.uniform(k2, sshape, jnp.float32, 0.5, 1.5) * scale_mag,
                jax.random.normal(k3, sshape, jnp.float32) * scale_mag if has_bias else None,
            )
        )
        q, scale, bias = gen(k1, k2, k3)
    sup = sup_min = None
    if coded:
        # k-quant super-block factorization kept on-chip: u8 sub-scale codes +
        # f32 per-256 super-scales (f16 d promoted losslessly; Mosaic has no f16)
        assert layout == "kn" and k % 256 == 0
        import jax

        ks, km = jax.random.split(jax.random.PRNGKey(1) if not isinstance(rng, np.random.Generator) else jax.random.PRNGKey(2), 2)
        sshape2 = lead + (k // 256, n)
        code_mag = 0.02 / max(1, hi - 1) / 32.0
        if isinstance(rng, np.random.Generator):
            codes = rng.integers(1, 64, size=sshape).astype(np.int8)
            sup = (rng.uniform(0.5, 1.5, size=sshape2).astype(np.float32) * code_mag)
            scale = jnp.asarray(codes)
            sup = jnp.asarray(sup.astype(np.float32))
            if has_bias:
                bias = jnp.asarray(rng.integers(0, 64, size=sshape).astype(np.int8))
                sup_min = jnp.asarray(
                    (-rng.uniform(0.5, 1.5, size=sshape2) * code_mag).astype(np.float32)
                )
        else:
            import jax.numpy as _jnp

            scale = jax.random.randint(ks, sshape, 1, 64, dtype=_jnp.int32).astype(_jnp.int8)
            sup = jax.random.uniform(km, sshape2, _jnp.float32, 0.5, 1.5) * code_mag
            if has_bias:
                k2, k3 = jax.random.split(km)
                bias = jax.random.randint(k2, sshape, 0, 64, dtype=_jnp.int32).astype(_jnp.int8)
                sup_min = -jax.random.uniform(k3, sshape2, _jnp.float32, 0.5, 1.5) * code_mag
    elif scale_dtype != jnp.float32:
        scale = scale.astype(scale_dtype)
        bias = None if bias is None else bias.astype(scale_dtype)
    qt = QTensor(
        q=q, scale=scale, bias=bias, group=group, ggml_type=int(qtype), layout=layout,
        sup=sup, sup_min=sup_min,
    )
    if packed:
        assert layout == "kn" and hi <= 16 and lo >= 0
        if qt.q.shape[-2] == k // 2:  # device path generated packed bytes
            qt = dataclasses.replace(qt, packed=True)
        else:
            import jax

            half = group // 2

            def pack(qa):
                shp = qa.shape
                qg = qa.astype(jnp.uint8).reshape(*shp[:-2], shp[-2] // group, group, shp[-1])
                p = qg[..., :half, :] | (qg[..., half:, :] << 4)
                return p.reshape(*shp[:-2], shp[-2] // 2, shp[-1]).astype(jnp.int8)

            qt = dataclasses.replace(qt, q=jax.jit(pack)(qt.q), packed=True)
    return qt


def synth_llama_params(
    cfg: ModelConfig,
    qtype: GGMLType = GGMLType.Q4_K,
    seed: int = 0,
    embed_dtype=jnp.bfloat16,
    on_device: bool = False,
    packed: bool = False,
    scale_dtype=jnp.float32,
    coded: bool = False,
) -> dict[str, Any]:
    if on_device:
        return _synth_llama_on_device(
            cfg, qtype, seed, embed_dtype, packed=packed, scale_dtype=scale_dtype,
            coded=coded,
        )
    rng = np.random.default_rng(seed)
    L, d, dh, h, hkv, f, v = (
        cfg.n_layers, cfg.n_embd, cfg.head_dim, cfg.n_heads, cfg.n_kv_heads,
        cfg.n_ff, cfg.vocab_size,
    )
    layers = {
        "attn_norm": jnp.ones((L, d), jnp.float32),
        "wq": synth_qtensor(rng, h * dh, d, qtype, stack=L),
        "wk": synth_qtensor(rng, hkv * dh, d, qtype, stack=L),
        "wv": synth_qtensor(rng, hkv * dh, d, qtype, stack=L),
        "wo": synth_qtensor(rng, d, h * dh, qtype, stack=L),
        "ffn_norm": jnp.ones((L, d), jnp.float32),
        "w_gate": synth_qtensor(rng, f, d, qtype, stack=L),
        "w_up": synth_qtensor(rng, f, d, qtype, stack=L),
        "w_down": synth_qtensor(rng, d, f, qtype, stack=L),
    }
    return {
        "tok_embd": jnp.asarray(
            rng.normal(0, 0.02, size=(v, d)).astype(np.float32), dtype=embed_dtype
        ),
        "layers": layers,
        "output_norm": jnp.ones((d,), jnp.float32),
        "output": synth_qtensor(rng, v, d, qtype),
    }


def _synth_llama_on_device(cfg: ModelConfig, qtype, seed, embed_dtype, packed=False, scale_dtype=jnp.float32, coded=False) -> dict[str, Any]:
    import jax

    keys = iter(jax.random.split(jax.random.PRNGKey(seed), 16))
    L, d, dh, h, hkv, f, v = (
        cfg.n_layers, cfg.n_embd, cfg.head_dim, cfg.n_heads, cfg.n_kv_heads,
        cfg.n_ff, cfg.vocab_size,
    )
    layers = {
        "attn_norm": jnp.ones((L, d), jnp.float32),
        # qkv and gate+up fused along N: one MXU dispatch each (halves the
        # per-layer kernel-launch overhead on the decode critical path)
        "wqkv": synth_qtensor(next(keys), (h + 2 * hkv) * dh, d, qtype, stack=L, packed=packed, scale_dtype=scale_dtype, coded=coded),
        "wo": synth_qtensor(next(keys), d, h * dh, qtype, stack=L, packed=packed, scale_dtype=scale_dtype, coded=coded),
        "ffn_norm": jnp.ones((L, d), jnp.float32),
        "w_gate_up": synth_qtensor(next(keys), 2 * f, d, qtype, stack=L, packed=packed, scale_dtype=scale_dtype, coded=coded),
        "w_down": synth_qtensor(next(keys), d, f, qtype, stack=L, packed=packed, scale_dtype=scale_dtype, coded=coded),
    }
    emb = jax.jit(
        lambda k: (jax.random.normal(k, (v, d), jnp.float32) * 0.02).astype(embed_dtype)
    )(next(keys))
    return {
        "tok_embd": emb,
        "layers": layers,
        "output_norm": jnp.ones((d,), jnp.float32),
        "output": synth_qtensor(next(keys), v, d, qtype, packed=packed, scale_dtype=scale_dtype, coded=coded),
    }


def synth_eagle_params(
    cfg: ModelConfig,
    qtype: GGMLType = GGMLType.Q4_K,
    seed: int = 1,
    embed_dtype=jnp.bfloat16,
    packed: bool = False,
    scale_dtype=jnp.float32,
) -> dict[str, Any]:
    """`packed`/`scale_dtype` should match the target's synth options in
    benchmarks: an unpacked-int8 draft streams 2x the HBM bytes of the nibble-
    packed form — measurable in the EAGLE cycle where the L=1 draft runs K
    sequential forwards (profile 2026-08-18)."""
    rng = np.random.default_rng(seed)
    d, dh, h, hkv, f, v = (
        cfg.n_embd, cfg.head_dim, cfg.n_heads, cfg.n_kv_heads, cfg.n_ff, cfg.vocab_size
    )
    q = dict(packed=packed, scale_dtype=scale_dtype)
    layers = {
        "wqkv": synth_qtensor(rng, (h + 2 * hkv) * dh, d, qtype, stack=1, **q),
        "wo": synth_qtensor(rng, d, h * dh, qtype, stack=1, **q),
        "ffn_norm": jnp.ones((1, d), jnp.float32),
        "w_gate_up": synth_qtensor(rng, 2 * f, d, qtype, stack=1, **q),
        "w_down": synth_qtensor(rng, d, f, qtype, stack=1, **q),
    }
    return {
        "tok_embd": jnp.asarray(
            rng.normal(0, 0.02, size=(v, d)).astype(np.float32), dtype=embed_dtype
        ),
        "fc_w": synth_qtensor(rng, d, 2 * d, qtype, **q),
        "fc_b": jnp.zeros((d,), jnp.float32),
        "layers": layers,
    }
