"""Mamba selective-SSM forward (LLM_ARCH_MAMBA).

Reference semantics: llm_build_mamba (src/llama.cpp:899-1032) + the
ggml_ssm_conv / ggml_ssm_scan ops (ggml-cpu). The reference (ab)uses its KV
cache to hold the conv/ssm states per layer; here the recurrent state is an
explicit functional pytree (MambaState), like everything else in this
runtime — a failed step leaves the prior state intact.

TPU shape notes:
  - the depthwise causal conv (kernel d_conv, typically 4) is d_conv shifted
    slices summed — no conv primitive needed, XLA fuses it;
  - the selective scan h_t = exp(dt_t A) h_{t-1} + dt_t B_t x_t is a
    first-order linear recurrence: prefill uses jax.lax.associative_scan
    (log-depth on the MXU/VPU; the parallel-scan formulation from Annex D of
    the Mamba paper that ggml implements sequentially), decode (T == 1) is a
    single state update — constant memory, no KV growth with context.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.matmul import qmatmul
from ..ops.norms import rms_norm
from .config import ModelConfig
from .llama import embed_lookup


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MambaState:
    """Per-layer recurrent state (the reference stores these in kv.k_l/v_l)."""

    conv: jax.Array  # [L, B, d_inner, d_conv-1] last conv inputs
    ssm: jax.Array  # [L, B, d_inner, d_state]

    @staticmethod
    def create(cfg: ModelConfig, batch: int, dtype=jnp.float32) -> "MambaState":
        return MambaState(
            conv=jnp.zeros(
                (cfg.n_layers, batch, cfg.ssm_d_inner, cfg.ssm_d_conv - 1), dtype
            ),
            ssm=jnp.zeros(
                (cfg.n_layers, batch, cfg.ssm_d_inner, cfg.ssm_d_state), dtype
            ),
        )


class MambaOutput(NamedTuple):
    logits: jax.Array | None  # [B, T, V]
    state: MambaState
    hidden: jax.Array  # [B, T, D] post-final-norm


def _selective_scan(h0, dA, dBx):
    """h_t = dA_t * h_{t-1} + dBx_t over axis 1 (time).

    dA/dBx: [B, T, d_inner, d_state]; h0: [B, d_inner, d_state].
    Returns (all h_t [B, T, di, ds])."""
    t = dA.shape[1]
    if t == 1:
        h = dA[:, 0] * h0 + dBx[:, 0]
        return h[:, None]
    # fold h0 into the first element, then a first-order associative scan:
    # (a2, b2) ∘ (a1, b1) = (a2*a1, a2*b1 + b2)
    dBx = dBx.at[:, 0].add(dA[:, 0] * h0)

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a2 * a1, a2 * b1 + b2

    _, hs = jax.lax.associative_scan(combine, (dA, dBx), axis=1)
    return hs


def mamba_forward(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, T]
    state: MambaState,
    *,
    backend: str | None = None,
    compute_dtype=jnp.float32,
    return_logits: bool = True,
) -> MambaOutput:
    b, t = tokens.shape
    di, ds, dc, dtr = cfg.ssm_d_inner, cfg.ssm_d_state, cfg.ssm_d_conv, cfg.ssm_dt_rank
    x = embed_lookup(params["tok_embd"], tokens).astype(jnp.float32)
    layers = params["layers"]

    new_conv, new_ssm = [], []
    for li in range(cfg.n_layers):
        xn = rms_norm(x, layers["attn_norm"][li], cfg.rms_eps)
        xz = qmatmul(xn, layers["ssm_in"][li], backend, compute_dtype)
        xi, z = jnp.split(xz, [di], axis=-1)  # [B, T, di] each

        # depthwise causal conv over time: state carries the last dc-1 inputs
        xt = xi.transpose(0, 2, 1)  # [B, di, T]
        conv_x = jnp.concatenate([state.conv[li].astype(xt.dtype), xt], axis=2)
        w = layers["ssm_conv1d"][li]  # [di, dc]
        xc = sum(
            conv_x[:, :, k : k + t] * w[None, :, k : k + 1] for k in range(dc)
        )  # [B, di, T]
        xc = xc + layers["ssm_conv1d_b"][li][None, :, None]
        new_conv.append(conv_x[:, :, -(dc - 1):])
        xc = jax.nn.silu(xc).transpose(0, 2, 1)  # [B, T, di]

        x_db = qmatmul(xc, layers["ssm_x"][li], backend, compute_dtype)
        dt, B_, C_ = jnp.split(x_db, [dtr, dtr + ds], axis=-1)
        if cfg.ssm_dt_b_c_rms:  # falcon-mamba
            dt = rms_norm(dt, None, cfg.rms_eps)
            B_ = rms_norm(B_, None, cfg.rms_eps)
            C_ = rms_norm(C_, None, cfg.rms_eps)
        dt = qmatmul(dt, layers["ssm_dt"][li], backend, compute_dtype)
        dt = jax.nn.softplus(dt + layers["ssm_dt_b"][li])  # [B, T, di]

        A = layers["ssm_a"][li]  # [di, ds] (= -exp(A_log), stored by convert)
        dA = jnp.exp(dt[..., None] * A[None, None])  # [B, T, di, ds]
        dBx = (dt * xc)[..., None] * B_[:, :, None, :]  # [B, T, di, ds]
        hs = _selective_scan(state.ssm[li].astype(dA.dtype), dA, dBx)
        new_ssm.append(hs[:, -1])

        y = jnp.einsum("btds,bts->btd", hs, C_)  # [B, T, di]
        y = y + xc * layers["ssm_d"][li][None, None]
        y = y * jax.nn.silu(z)
        out = qmatmul(y, layers["ssm_out"][li], backend, compute_dtype)
        x = x + out.astype(x.dtype)

    hidden = rms_norm(x, params["output_norm"], cfg.rms_eps)
    logits = None
    if return_logits:
        logits = qmatmul(hidden, params["output"], backend, compute_dtype)
    return MambaOutput(
        logits=logits,
        state=MambaState(conv=jnp.stack(new_conv), ssm=jnp.stack(new_ssm)),
        hidden=hidden,
    )
