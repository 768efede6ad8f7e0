"""Fused FFN-block megakernel vs the XLA composition it replaces.

The fused path must be numerically interchangeable with the unfused ops
(llama.py's qmatmul + rms_norm + act composition) — same bf16 matmul inputs,
f32 accumulation — so greedy decode tokens cannot change when it is enabled.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.models.synth import synth_qtensor
from eagle_tpu.ops.matmul import qmatmul_layer
from eagle_tpu.ops.norms import rms_norm
from eagle_tpu.ops.pallas_ffn import ffn_block_pallas, supports_ffn_block
from eagle_tpu.quant.qtensor import QTensor

D, F, L = 256, 384, 3
EPS = 1e-6


def _weights(rng, packed=False, scale_dtype=jnp.float32, stack=L):
    wo = synth_qtensor(rng, D, D, stack=stack, packed=packed, scale_dtype=scale_dtype)
    wgu = synth_qtensor(rng, 2 * F, D, stack=stack, packed=packed, scale_dtype=scale_dtype)
    wdn = synth_qtensor(rng, D, F, stack=stack, packed=packed, scale_dtype=scale_dtype)
    return wo, wgu, wdn


def _ref_block(attn, resid, nw, wo, wgu, wdn, li, act):
    actf = jax.nn.silu if act == "silu" else partial(jax.nn.gelu, approximate=True)
    attn_out = qmatmul_layer(attn, wo, li, backend="xla")
    x = resid.astype(jnp.float32) + attn_out
    h = rms_norm(x, nw, EPS)
    gate, up = jnp.split(qmatmul_layer(h, wgu, li, backend="xla"), 2, axis=-1)
    return qmatmul_layer(actf(gate) * up, wdn, li, backend="xla") + x


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("act", ["silu", "gelu"])
def test_fused_matches_composed(packed, act):
    rng = np.random.default_rng(0)
    wo, wgu, wdn = _weights(rng, packed=packed)
    attn = jnp.asarray(rng.normal(0, 1.0, (8, D)).astype(np.float32))
    resid = jnp.asarray(rng.normal(0, 1.0, (8, D)).astype(np.float32))
    nw = jnp.asarray(rng.uniform(0.5, 1.5, (D,)).astype(np.float32))
    li = jnp.asarray(1, jnp.int32)

    want = np.asarray(_ref_block(attn, resid, nw, wo, wgu, wdn, li, act))
    got = np.asarray(
        ffn_block_pallas(
            attn, resid, nw, wo, wgu, wdn, li,
            rms_eps=EPS, act_fn=act, interpret=True,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=0.05 * np.abs(want).max())


def test_fused_single_layer_stack():
    """L=1 stacks (EAGLE draft) take the static-slice path, no scalar prefetch."""
    rng = np.random.default_rng(1)
    wo, wgu, wdn = _weights(rng, stack=1, packed=True, scale_dtype=jnp.bfloat16)
    attn = jnp.asarray(rng.normal(0, 1.0, (8, D)).astype(np.float32))
    resid = jnp.asarray(rng.normal(0, 1.0, (8, D)).astype(np.float32))
    nw = jnp.ones((D,), jnp.float32)
    li = jnp.asarray(0, jnp.int32)
    want = np.asarray(_ref_block(attn, resid, nw, wo, wgu, wdn, li, "silu"))
    got = np.asarray(
        ffn_block_pallas(
            attn, resid, nw, wo, wgu, wdn, li,
            rms_eps=EPS, act_fn="silu", interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=0.08 * np.abs(want).max())


def test_supports_gating():
    rng = np.random.default_rng(2)
    wo, wgu, wdn = _weights(rng)

    class Cfg:
        act = "silu"

    base = {"ffn_norm": jnp.ones((L, D)), "wo": wo, "w_gate_up": wgu, "w_down": wdn}
    assert supports_ffn_block(base, Cfg())
    assert not supports_ffn_block({**base, "post_attn_norm": jnp.ones((L, D))}, Cfg())
    assert not supports_ffn_block({**base, "ffn_gate_inp": jnp.ones((L, D, 4))}, Cfg())
    nonorm = dict(base)
    del nonorm["ffn_norm"]
    assert not supports_ffn_block(nonorm, Cfg())
    split = dict(base)
    del split["w_gate_up"]
    split["w_gate"] = wgu
    assert not supports_ffn_block(split, Cfg())

    class CfgRelu:
        act = "relu"

    assert not supports_ffn_block(base, CfgRelu())
    # dense (unquantized) weights stay on the composed path
    dense = {**base, "wo": jnp.ones((L, D, D), jnp.bfloat16)}
    assert not supports_ffn_block(dense, Cfg())
