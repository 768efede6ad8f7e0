"""Quantized matmul — dispatch between the XLA dequant path and fused Pallas
kernels.

Semantics follow ggml_mul_mat (ggml/src/ggml.c): weights are [N, K]
(out-features, in-features), activations [..., K]; result [..., N] computed as
x @ W^T with f32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..quant.qtensor import QTensor

__all__ = ["qmatmul", "set_default_backend"]

_DEFAULT_BACKEND = "xla"


def set_default_backend(name: str):
    """Select the global quantized-matmul implementation: 'xla' | 'pallas'."""
    global _DEFAULT_BACKEND
    assert name in ("xla", "pallas")
    _DEFAULT_BACKEND = name


def _qmatmul_xla(x: jax.Array, w: QTensor, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Reference device path: dequantize then matmul, letting XLA fuse what it
    can. Exact w.r.t. the affine decode; weight values are rounded to
    `compute_dtype` before hitting the MXU."""
    if w.packed:
        w = w.unpack()
    g = w.group
    scale, bias = w.effective_scale_bias()
    if w.layout == "nk":
        n, k = w.q.shape
        wq = w.q.astype(compute_dtype).reshape(n, k // g, g)
        wd = wq * scale.astype(compute_dtype)[:, :, None]
        if bias is not None:
            wd = wd + bias.astype(compute_dtype)[:, :, None]
        wd = wd.reshape(n, k)
        contract = (1,)
    else:
        k, n = w.q.shape
        wq = w.q.astype(compute_dtype).reshape(k // g, g, n)
        wd = wq * scale.astype(compute_dtype)[:, None, :]
        if bias is not None:
            wd = wd + bias.astype(compute_dtype)[:, None, :]
        wd = wd.reshape(k, n)
        contract = (0,)
    return jax.lax.dot_general(
        x.astype(compute_dtype),
        wd,
        dimension_numbers=(((x.ndim - 1,), contract), ((), ())),
        preferred_element_type=jnp.float32,
    )


def qmatmul(
    x: jax.Array,
    w: QTensor | jax.Array,
    backend: str | None = None,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """x [..., K] @ w[N, K]^T -> [..., N] (f32 accumulation).

    Accepts either a QTensor or a plain dense array (f32/bf16 weights).
    """
    if not isinstance(w, QTensor):
        return jax.lax.dot_general(
            x.astype(compute_dtype),
            w.astype(compute_dtype),
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    backend = backend or _DEFAULT_BACKEND
    if backend == "pallas" and w.layout == "kn":
        from .pallas_qmm import qmatmul_pallas

        return qmatmul_pallas(x, w, compute_dtype=compute_dtype)
    return _qmatmul_xla(x, w, compute_dtype=compute_dtype)


def qmatmul_layer(
    x: jax.Array,
    w,
    layer_idx: jax.Array,
    backend: str | None = None,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Matmul against layer `layer_idx` of LAYER-STACKED weights.

    On the pallas backend the layer index is scalar-prefetched into the kernel
    so the stacked buffer is streamed directly (no dynamic-slice copy — worth
    ~30% of decode time at 7B). Other paths slice then dispatch."""
    backend = backend or _DEFAULT_BACKEND
    if isinstance(w, QTensor) and w.q.ndim == 3 and w.q.shape[0] == 1:
        # single-layer stack (EAGLE draft): index 0 statically — it's a free
        # reshape, and the scalar-prefetch path triggers pathological Mosaic
        # compiles inside the draft scan
        w_l = jax.tree_util.tree_map(lambda a: a[0], w)
        return qmatmul(x, w_l, backend, compute_dtype)
    if (
        isinstance(w, QTensor)
        and backend == "pallas"
        and w.layout == "kn"
        and w.q.ndim == 3
    ):
        from .pallas_qmm import qmatmul_pallas_stacked_nd

        return qmatmul_pallas_stacked_nd(x, w, layer_idx, compute_dtype=compute_dtype)
    w_l = jax.tree_util.tree_map(lambda a: a[layer_idx], w)
    return qmatmul(x, w_l, backend, compute_dtype)
