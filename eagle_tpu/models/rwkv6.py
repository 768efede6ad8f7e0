"""RWKV6 (Finch) forward pass.

Graph semantics mirror build_rwkv6 + llm_build_rwkv6_time_mix /
llm_build_rwkv6_channel_mix (src/llama.cpp:7942,1034,1186) and the wkv6
recurrence kernel (ggml/src/ggml-cpu/ggml-cpu.c:12059):

    y_t[j] = sum_i r_t[i] * (S[i,j] + u[i] * k_t[i] * v_t[j])
    S[i,j] <- w_t[i] * S[i,j] + k_t[i] * v_t[j]

The sequence state is constant-size (token-shift vectors + per-head wkv
matrices) — the reference stores these in abused KV-cache cells; here they
are an explicit functional pytree like MambaState. The per-layer scan keeps
weights layer-stacked and scatters state at [li], the same pattern as
mamba_forward.

The rwkv6qwen2 hybrid (build_rwkv6qwen2, src/llama.cpp:8056) reuses the
time-mix with `is_qrwkv` semantics: no time_first u (gated linear attention
with dh^-0.5 scaling), sigmoid gate, k scaled by (1-w), no group norm, and a
qwen2-style RMS/silu-gated FFN instead of channel mix.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.matmul import qmatmul, qmatmul_layer
from ..ops.norms import layer_norm, rms_norm
from .config import ModelConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Rwkv6State:
    shift_att: jax.Array  # [L, B, D] last normed input of the time-mix
    shift_ffn: jax.Array  # [L, B, D] last normed input of the channel-mix
    wkv: jax.Array  # [L, B, H, dh, dh] per-head linear-attention state

    @staticmethod
    def create(cfg: ModelConfig, batch: int, dtype=jnp.float32) -> "Rwkv6State":
        h = cfg.n_embd // cfg.wkv_head_size
        dh = cfg.wkv_head_size
        return Rwkv6State(
            shift_att=jnp.zeros((cfg.n_layers, batch, cfg.n_embd), dtype),
            shift_ffn=jnp.zeros((cfg.n_layers, batch, cfg.n_embd), dtype),
            wkv=jnp.zeros((cfg.n_layers, batch, h, dh, dh), dtype),
        )


class Rwkv6Output(NamedTuple):
    logits: jax.Array | None
    state: Rwkv6State
    hidden: jax.Array


def _wkv6_scan(r, k, v, w, u, s0):
    """Sequential wkv6 recurrence over T (shapes [B,T,H,dh]; s0 [B,H,dh,dh]).

    u=None selects the qrwkv gated-linear-attention form (no bonus term,
    dh^-0.5 query scaling — ggml_gated_linear_attn in the reference)."""
    dh = r.shape[-1]

    def step(S, rkvw):
        r_t, k_t, v_t, w_t = rkvw  # [B,H,dh]
        kv = k_t[..., :, None] * v_t[..., None, :]  # [B,H,dh,dh]
        if u is None:
            y = ((S + kv) * (r_t * dh ** -0.5)[..., :, None]).sum(-2)
        else:
            y = ((S + u[None, :, :, None] * kv) * r_t[..., :, None]).sum(-2)
        S = S * w_t[..., :, None] + kv
        return S, y

    tfirst = lambda z: jnp.moveaxis(z, 1, 0)  # [T,B,H,dh]
    s, ys = jax.lax.scan(step, s0, (tfirst(r), tfirst(k), tfirst(v), tfirst(w)))
    return jnp.moveaxis(ys, 0, 1), s  # [B,T,H,dh], [B,H,dh,dh]


def _time_mix(cfg, layers, li, xa, x_prev, s0, backend, compute_dtype):
    b, t, d = xa.shape
    dh = cfg.wkv_head_size
    h = d // dh
    is_qrwkv = "tm_first" not in layers

    sx = x_prev - xa
    xxx = xa + sx * layers["tm_lerp_x"][li]
    inner = jnp.tanh(
        jnp.einsum("btd,ed->bte", xxx.astype(jnp.float32), layers["tm_w1"][li])
    )  # [B,T,5*ext]
    ext = inner.shape[-1] // 5
    inner = inner.reshape(b, t, 5, ext)
    # tm_w2 [5, D, ext]: one tiny projection per mixed stream (w,k,v,r,g)
    deltas = jnp.einsum("btfe,fde->btfd", inner, layers["tm_w2"][li])
    mix = layers["tm_lerp_fused"][li][None, None] + deltas  # [B,T,5,D]
    xw, xk, xv, xr, xg = [xa + sx * mix[:, :, j] for j in range(5)]

    r = qmatmul_layer(xr, layers["tm_r"], li, backend, compute_dtype)
    k = qmatmul_layer(xk, layers["tm_k"], li, backend, compute_dtype)
    v = qmatmul_layer(xv, layers["tm_v"], li, backend, compute_dtype)
    if "tm_r_b" in layers:  # rwkv6qwen2 carries qkv-style biases
        r = r + layers["tm_r_b"][li]
        k = k + layers["tm_k_b"][li]
        v = v + layers["tm_v_b"][li]
    g = qmatmul_layer(xg, layers["tm_g"], li, backend, compute_dtype)
    g = jax.nn.sigmoid(g) if is_qrwkv else jax.nn.silu(g)

    w = jnp.einsum(
        "bte,de->btd",
        jnp.tanh(jnp.einsum("btd,ed->bte", xw.astype(jnp.float32),
                            layers["tm_decay_w1"][li])),
        layers["tm_decay_w2"][li],
    ) + layers["tm_decay_w0"][li]
    w = jnp.exp(-jnp.exp(w.astype(jnp.float32)))

    kh = k.reshape(b, t, -1, dh)
    vh = v.reshape(b, t, -1, dh)
    if kh.shape[2] != h:  # rwkv6qwen2 GQA: repeat kv heads
        rep = h // kh.shape[2]
        kh = jnp.repeat(kh, rep, axis=2)
        vh = jnp.repeat(vh, rep, axis=2)
    rh = r.reshape(b, t, h, dh)
    wh = w.reshape(b, t, h, dh)
    if is_qrwkv:
        kh = kh * (1.0 - wh)

    u = None if is_qrwkv else layers["tm_first"][li]
    y, s = _wkv6_scan(
        rh.astype(jnp.float32), kh.astype(jnp.float32),
        vh.astype(jnp.float32), wh, u, s0.astype(jnp.float32),
    )
    y = y.reshape(b, t, d)
    if not is_qrwkv:
        # ggml_norm over each head (group norm, eps 64e-5), then the
        # time_mix_ln affine over the full width
        yh = y.reshape(b, t, h, dh)
        yh = layer_norm(yh, None, None, 64e-5)
        y = yh.reshape(b, t, d) * layers["tm_ln"][li] + layers["tm_ln_b"][li]
    y = y * g
    out = qmatmul_layer(y.astype(compute_dtype), layers["tm_out"], li,
                        backend, compute_dtype)
    return out, s


def _channel_mix(cfg, layers, li, xf, x_prev, backend, compute_dtype):
    sx = x_prev - xf
    xk = xf + sx * layers["cm_lerp_k"][li]
    xr = xf + sx * layers["cm_lerp_r"][li]
    r = jax.nn.sigmoid(qmatmul_layer(xr, layers["cm_r"], li, backend, compute_dtype))
    kk = qmatmul_layer(xk, layers["cm_k"], li, backend, compute_dtype)
    kk = jnp.square(jax.nn.relu(kk))
    return r * qmatmul_layer(kk, layers["cm_v"], li, backend, compute_dtype)


def rwkv6_forward(
    params: dict[str, Any],
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, T]
    state: Rwkv6State,
    *,
    backend: str | None = None,
    compute_dtype=jnp.float32,
    return_logits: bool = True,
) -> Rwkv6Output:
    x = params["tok_embd"][tokens].astype(jnp.float32)
    if "tok_norm" in params:
        x = layer_norm(x, params["tok_norm"], params.get("tok_norm_b"), cfg.rms_eps)

    layers = params["layers"]
    is_hybrid = cfg.arch == "rwkv6qwen2"  # qwen2 FFN + RMS norms

    def scan_body(carry, li):
        x, sa_all, sf_all, wkv_all = carry
        if is_hybrid:
            xa = rms_norm(x, layers["attn_norm"][li], cfg.rms_eps)
        else:
            anb = layers["attn_norm_b"][li] if "attn_norm_b" in layers else None
            xa = layer_norm(x, layers["attn_norm"][li], anb, cfg.rms_eps)
        x_prev = jnp.concatenate([sa_all[li][:, None], xa[:, :-1]], axis=1)
        att, s_new = _time_mix(cfg, layers, li, xa, x_prev, wkv_all[li],
                               backend, compute_dtype)
        x = x + att
        wkv_all = wkv_all.at[li].set(s_new.astype(wkv_all.dtype))
        sa_all = sa_all.at[li].set(xa[:, -1])

        if is_hybrid:
            xf = rms_norm(x, layers["ffn_norm"][li], cfg.rms_eps)
            gate = qmatmul_layer(xf, layers["w_gate"], li, backend, compute_dtype)
            up = qmatmul_layer(xf, layers["w_up"], li, backend, compute_dtype)
            ffn = qmatmul_layer(jax.nn.silu(gate) * up, layers["w_down"], li,
                                backend, compute_dtype)
            x = x + ffn
        else:
            xf = layer_norm(x, layers["ffn_norm"][li],
                            layers["ffn_norm_b"][li] if "ffn_norm_b" in layers
                            else None, cfg.rms_eps)
            x_prev = jnp.concatenate([sf_all[li][:, None], xf[:, :-1]], axis=1)
            x = x + _channel_mix(cfg, layers, li, xf, x_prev, backend, compute_dtype)
            sf_all = sf_all.at[li].set(xf[:, -1])

        if cfg.rescale_every > 0:
            # build_rwkv6 halves activations every rescale_every layers (the
            # converter pre-divided the output weights by 2^(l//n))
            x = jnp.where((li + 1) % cfg.rescale_every == 0, x * 0.5, x)
        return (x, sa_all, sf_all, wkv_all), None

    carry = (x, state.shift_att, state.shift_ffn, state.wkv)
    (x, sa, sf, wkv), _ = jax.lax.scan(
        scan_body, carry, jnp.arange(cfg.n_layers, dtype=jnp.int32)
    )
    new_state = Rwkv6State(shift_att=sa, shift_ffn=sf, wkv=wkv)

    if is_hybrid:
        hidden = rms_norm(x, params["output_norm"], cfg.rms_eps)
    else:
        hidden = layer_norm(x, params["output_norm"],
                            params.get("output_norm_b"), cfg.rms_eps)
    logits = None
    if return_logits:
        logits = qmatmul(hidden, params["output"], backend, compute_dtype)
    return Rwkv6Output(logits=logits, state=new_state, hidden=hidden)
