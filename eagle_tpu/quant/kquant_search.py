"""Search-based K-quant encoders (quality parity with ggml's quantizers).

ggml's Q4_K/Q5_K encoders (ggml-quants.c make_qkx2_quants/make_qkx3_quants)
don't take the min/max scale — they grid-search candidate scales per 32-value
group and refit (scale, min) by weighted least squares, optionally with
importance weights (imatrix). This is a vectorized numpy implementation of the
same algorithm shape: ~20 scale candidates per group, closed-form (d, m)
refit, weighted-MSE selection, then 6-bit super-block quantization of the
group scales with iterative rounding refinement (make_qp_quants analogue).

Same output bit-format as quant/blocks.py; plug-compatible with the GGUF
writer and the repackers."""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, QK_K
from . import blocks as _b


def _fit_affine(x, q, w):
    """Weighted LS fit of x ~ d*q + m per group. x,q,w: [G, n]. Returns d, m [G]."""
    sw = w.sum(1)
    swq = (w * q).sum(1)
    swx = (w * x).sum(1)
    swqq = (w * q * q).sum(1)
    swqx = (w * q * x).sum(1)
    det = sw * swqq - swq * swq
    safe = np.abs(det) > 1e-12
    d = np.where(safe, (sw * swqx - swq * swx) / np.where(safe, det, 1), 0.0)
    m = np.where(safe, (swqq * swx - swq * swqx) / np.where(safe, det, 1), 0.0)
    return d, m


def _search_group_quant(x, w, maxq: int, nsteps: int = 20):
    """Per-group asymmetric quantization search.

    x, w: [G, n] values and importance weights. Returns (scale, minv) [G]
    where x ~ scale * q - minv, q in [0, maxq], minv >= 0."""
    gmin = np.minimum(x.min(1), 0.0)
    gmax = np.maximum(x.max(1), 0.0)
    rng = gmax - gmin
    base_scale = rng / maxq
    best_d = base_scale.copy()
    best_m = -gmin
    q0 = np.clip(
        np.rint((x - gmin[:, None]) / np.where(base_scale > 0, base_scale, 1)[:, None]),
        0, maxq,
    )
    best_err = (w * (base_scale[:, None] * q0 - (x - gmin[:, None])) ** 2).sum(1)

    # candidate scales: (max-min)/(maxq - 1 + 0.1*is) for is in 0..nsteps
    for step in range(nsteps + 1):
        denom = maxq - 1.0 + 0.1 * step
        cand = rng / denom
        inv = np.where(cand > 0, 1.0 / np.where(cand > 0, cand, 1), 0.0)
        q = np.clip(np.rint((x - gmin[:, None]) * inv[:, None]), 0, maxq)
        d, m = _fit_affine(x, q, w)
        # min must be <= 0 in the x = d*q + m model (stored minv = -m >= 0)
        m = np.minimum(m, 0.0)
        err = (w * (d[:, None] * q + m[:, None] - x) ** 2).sum(1)
        better = err < best_err
        best_d = np.where(better, d, best_d)
        best_m = np.where(better, -m, best_m)
        best_err = np.where(better, err, best_err)
    return best_d, best_m


def _qp_quants(values, maxq: int, weights):
    """Quantize non-negative per-group values to ints in [0, maxq] with a
    shared scale (make_qp_quants analogue): pick scale minimizing weighted
    error with a small refinement loop. values, weights: [nb, G]."""
    vmax = values.max(1)
    scale = np.where(vmax > 0, vmax / maxq, 0.0)
    for _ in range(3):
        inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1), 0.0)
        L = np.clip(np.rint(values * inv[:, None]), 0, maxq)
        num = (weights * values * L).sum(1)
        den = (weights * L * L).sum(1)
        scale = np.where(den > 0, num / np.where(den > 0, den, 1), scale)
    inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1), 0.0)
    L = np.clip(np.rint(values * inv[:, None]), 0, maxq).astype(np.uint8)
    return scale.astype(np.float32), L


def quantize_q4_k_search(x: np.ndarray, imatrix: np.ndarray | None = None) -> np.ndarray:
    return _quantize_kq_search(x, imatrix, maxq=15,is_q5=False)


def quantize_q5_k_search(x: np.ndarray, imatrix: np.ndarray | None = None) -> np.ndarray:
    return _quantize_kq_search(x, imatrix, maxq=31, is_q5=True)


def _quantize_kq_search(x: np.ndarray, imatrix, maxq: int, is_q5: bool) -> np.ndarray:
    """Shared Q4_K/Q5_K search encoder. x: [..., K], K % 256 == 0."""
    orig_shape = x.shape
    x = np.ascontiguousarray(x, np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    xg = x.reshape(nb * 8, 32)

    # importance weights: ggml's sigma heuristic, or the imatrix column weights
    if imatrix is not None:
        w = np.broadcast_to(
            np.asarray(imatrix, np.float32).reshape(-1)[None, :], (len(x), QK_K)
        ).reshape(nb * 8, 32).copy()
        w = w * np.sqrt(
            (x * x).mean(1, keepdims=True).repeat(QK_K, 1).reshape(nb * 8, 32) + xg * xg
        )
    else:
        sigma2 = 2.0 * (x * x).mean(1) / 1.0  # per super-block
        av = np.sqrt(sigma2)[:, None].repeat(8, 1).reshape(-1, 1)
        w = av + np.abs(xg)

    scales, mins = _search_group_quant(xg, w, maxq)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)
    sw = w.sum(1).reshape(nb, 8)

    scales = np.maximum(scales, 0.0)
    mins = np.maximum(mins, 0.0)
    d_block, ls = _qp_quants(scales, 63, sw)
    m_block, lm = _qp_quants(mins, 63, sw)

    # stored (d, dmin) are the super-block scales; group scale = d * ls6
    d_store = (d_block).astype(np.float16)
    m_store = (m_block).astype(np.float16)
    eff_d = d_store.astype(np.float32)[:, None] * ls
    eff_m = m_store.astype(np.float32)[:, None] * lm
    inv_eff = np.where(eff_d > 0, 1.0 / np.where(eff_d == 0, 1.0, eff_d), 0.0)
    xb = x.reshape(nb, 8, 32)
    q = np.clip(
        np.rint((xb + eff_m[:, :, None]) * inv_eff[:, :, None]), 0, maxq
    ).astype(np.uint8)

    if not is_q5:
        qs = (q.reshape(nb, 4, 2, 32)[:, :, 0, :] | (q.reshape(nb, 4, 2, 32)[:, :, 1, :] << 4))
        out = np.empty((nb, 144), np.uint8)
        out[:, 0:2] = d_store.view(np.uint8).reshape(nb, 2)
        out[:, 2:4] = m_store.view(np.uint8).reshape(nb, 2)
        out[:, 4:16] = _b._pack_scale_min_k4(ls, lm)
        out[:, 16:] = qs.reshape(nb, 128)
        return out.reshape(-1)
    qq = q.reshape(nb, 4, 2, 32)
    ql = (qq[:, :, 0, :] & 0xF) | ((qq[:, :, 1, :] & 0xF) << 4)
    qh = np.zeros((nb, 32), np.uint8)
    for c in range(4):
        qh |= ((qq[:, c, 0, :] >> 4) & 1) << (2 * c)
        qh |= ((qq[:, c, 1, :] >> 4) & 1) << (2 * c + 1)
    out = np.empty((nb, 176), np.uint8)
    out[:, 0:2] = d_store.view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = m_store.view(np.uint8).reshape(nb, 2)
    out[:, 4:16] = _b._pack_scale_min_k4(ls, lm)
    out[:, 16:48] = qh
    out[:, 48:] = ql.reshape(nb, 128)
    return out.reshape(-1)
