"""Coded-scale QTensors: u8 sub-scale codes + f16 super-scales reconstructed
in-kernel (half the scale HBM stream of materialized bf16 products and
bit-exact with ggml's f32 d*sc — see QTensor docstring).

The pallas kernels must agree with the dense dequantize reference in every
mode: 2d/stacked, packed/unpacked, with/without the coded bias."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.synth import synth_qtensor
from eagle_tpu.ops.matmul import qmatmul
from eagle_tpu.ops.pallas_qmm import qmatmul_pallas, qmatmul_pallas_stacked_nd


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q6_K])
def test_coded_2d_matches_dense(rng, packed, qtype):
    if packed and qtype == GGMLType.Q6_K:
        pytest.skip("Q6_K codes are signed 6-bit: no nibble packing")
    qt = synth_qtensor(rng, 256, 512, qtype, coded=True, packed=packed)
    assert qt.sup is not None
    x = jnp.asarray(rng.normal(0, 1, (8, 512)).astype(np.float32))
    want = np.asarray(x) @ np.asarray(qt.dequantize()).T
    got = np.asarray(qmatmul_pallas(x, qt, compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * np.abs(want).max())


def test_coded_stacked_matches_dense(rng):
    qts = synth_qtensor(rng, 256, 512, GGMLType.Q4_K, stack=3, coded=True, packed=True)
    x = jnp.asarray(rng.normal(0, 1, (8, 512)).astype(np.float32))
    for li in (0, 2):
        qt = jax.tree_util.tree_map(lambda a: a[li], qts)
        want = np.asarray(x) @ np.asarray(qt.dequantize()).T
        got = np.asarray(
            qmatmul_pallas_stacked_nd(
                x, qts, jnp.asarray(li), compute_dtype=jnp.float32, interpret=True
            )
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * np.abs(want).max())


def test_coded_xla_path_matches_dense(rng):
    """The XLA fallback materializes the effective scales the same way."""
    qt = synth_qtensor(rng, 128, 256, GGMLType.Q4_K, coded=True)
    x = jnp.asarray(rng.normal(0, 1, (4, 256)).astype(np.float32))
    want = np.asarray(x) @ np.asarray(qt.dequantize()).T
    got = np.asarray(qmatmul(x, qt, backend="xla", compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * np.abs(want).max())


def test_effective_scale_bias_transpose(rng):
    qt = synth_qtensor(rng, 128, 256, GGMLType.Q4_K, coded=True)
    s_kn, b_kn = qt.effective_scale_bias()
    qt_nk = qt.transpose()
    s_nk, b_nk = qt_nk.effective_scale_bias()
    np.testing.assert_array_equal(np.asarray(s_kn).T, np.asarray(s_nk))
    np.testing.assert_array_equal(np.asarray(b_kn).T, np.asarray(b_nk))


# ---- coded GGUF loading (the serving path: loader emits sup/sup_min) -------

def test_gguf_coded_load_bit_exact(tmp_path, rng):
    """Loading a Q4_K GGUF with coded scales (the default) must produce the
    SAME dequantized weights as the materialized-product load, bit for bit —
    the kernel's in-flight f32 sup*code multiply is the very multiply the
    product repack would have precomputed."""
    import os

    from eagle_tpu.gguf.writer import GGUFWriter
    from eagle_tpu.models import loader as L

    w = (np.random.default_rng(7).standard_normal((64, 512)) * 0.05).astype(np.float32)
    path = tmp_path / "t.gguf"
    wr = GGUFWriter(path)
    wr.add_tensor("blk.0.attn_output.weight", w, ggml_type=GGMLType.Q4_K)
    wr.write()

    from eagle_tpu.gguf.reader import GGUFReader

    r = GGUFReader(path)
    qt_coded = L._load_tensor(r, "blk.0.attn_output.weight", layout="kn")
    assert qt_coded.sup is not None  # coded is the default serving load
    old = L._CODED_LOAD
    try:
        L._CODED_LOAD = False
        qt_prod = L._load_tensor(r, "blk.0.attn_output.weight", layout="kn")
    finally:
        L._CODED_LOAD = old
    assert qt_prod.sup is None
    a = np.asarray(qt_coded.dequantize())
    b = np.asarray(qt_prod.dequantize())
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K])
def test_repack_coded_matches_products(tmp_path, rng, qtype):
    """repack_coded_numpy's sup*codes must reproduce repack_numpy's product
    scales exactly for every coded k-quant format."""
    from eagle_tpu.gguf.reader import GGUFReader
    from eagle_tpu.gguf.writer import GGUFWriter
    from eagle_tpu.quant.qtensor import repack_coded_numpy, repack_numpy

    w = (np.random.default_rng(3).standard_normal((32, 512)) * 0.05).astype(np.float32)
    path = tmp_path / f"t{int(qtype)}.gguf"
    wr = GGUFWriter(path)
    wr.add_tensor("w", w, ggml_type=qtype)
    wr.write()
    r = GGUFReader(path)
    data = r.tensor_bytes("w")
    shape = r.tensors["w"].shape
    q0, s0, b0, g0 = repack_numpy(data, qtype, shape, use_native=False)
    qc, sc, mc, gc, sup, supmin = repack_coded_numpy(data, qtype, shape)
    assert gc == g0
    np.testing.assert_array_equal(qc, q0)
    per = s0.shape[-1] // sup.shape[-1]
    s_re = np.repeat(sup, per, axis=-1) * sc.astype(np.float32)
    np.testing.assert_array_equal(s_re, s0)
    if b0 is not None:
        b_re = np.repeat(supmin, per, axis=-1) * mc.astype(np.float32)
        np.testing.assert_array_equal(b_re, b0)


def test_full_model_coded_load_logits_match_product(tmp_path, rng):
    """END-TO-END: a Q4_K model loaded coded (the serving default, with qkv/
    gate-up FUSION and the packing pass) must produce the product-load's
    logits exactly — this is the invariant a dropped `sup` in any fusion/
    stacking/packing step silently breaks (caught live by scale_mode_study:
    ppl 703 vs 43)."""
    import jax
    import jax.numpy as jnp

    from eagle_tpu.models import loader as L
    from eagle_tpu.models.config import ModelConfig
    from eagle_tpu.models.llama import llama_forward
    from eagle_tpu.models.loader import load_llama_params
    from eagle_tpu.quant.serving import prepare_params_for_serving
    from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags
    from eagle_tpu.tools.train_draft import init_target, save_target_gguf

    cfg = ModelConfig(
        arch="llama", vocab_size=256, n_embd=256, n_layers=2, n_heads=4,
        n_kv_heads=4, head_dim=64, n_ff=512, rope_dim=64, rms_eps=1e-5,
        n_ctx_train=256,
    )
    params = init_target(cfg, np.random.default_rng(0))
    path = tmp_path / "t.gguf"
    save_target_gguf(path, params, cfg, qtype=GGMLType.Q4_K)

    coded, mcfg, _ = load_llama_params(path)
    assert coded["layers"]["wqkv"].sup is not None  # fusion kept the coding
    coded = prepare_params_for_serving(coded, scale_mode="f32", pack=True)
    old = L._CODED_LOAD
    try:
        L._CODED_LOAD = False
        prod, _, _ = load_llama_params(path)
    finally:
        L._CODED_LOAD = old
    prod = prepare_params_for_serving(prod, scale_mode="f32", pack=True)

    tokens = jnp.asarray(rng.integers(0, 256, (1, 12)), jnp.int32)
    pos = jnp.arange(12, dtype=jnp.int32)[None]

    @jax.jit
    def fwd(p):
        kv = KVCache.create(mcfg.n_layers, 1, 32, mcfg.n_kv_heads,
                            mcfg.head_dim, jnp.float32)
        kv = kv.with_tags(pos, pos)
        mask = causal_mask_from_tags(kv.slot_pos, pos)
        return llama_forward(p, mcfg, tokens, pos, kv, pos, mask,
                             backend="xla", compute_dtype=jnp.float32).logits

    np.testing.assert_array_equal(np.asarray(fwd(coded)), np.asarray(fwd(prod)))


@pytest.mark.parametrize("packed", [False, True])
def test_coded_resident_bias_matches_streamed(rng, packed):
    """The resident-bias coded variant (EAGLE_TPU_CODED_RESIDENT_BIAS=1 /
    coded_resident=True: full-K min-code + super-min blocks, ONE bias
    reconstruct+dot on the first K step) computes the same result as the
    shipping per-step streamed side-dot path."""
    qt = synth_qtensor(rng, 256, 512, GGMLType.Q4_K, coded=True, packed=packed)
    assert qt.bias is not None and qt.sup_min is not None
    x = jnp.asarray(rng.normal(0, 1, (8, 512)).astype(np.float32))
    streamed = np.asarray(qmatmul_pallas(
        x, qt, compute_dtype=jnp.float32, interpret=True, coded_resident=False))
    res = np.asarray(qmatmul_pallas(
        x, qt, compute_dtype=jnp.float32, interpret=True, coded_resident=True))
    np.testing.assert_allclose(res, streamed, rtol=0,
                               atol=2e-5 * np.abs(streamed).max())


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("resident", [False, True])
def test_coded_misaligned_ktile_onehot_path(rng, packed, resident):
    """K tiles that are 256-multiples but NOT 2048-multiples (the 13B
    K=5120/13824 situation scaled down): the kernel's one-hot sup-row
    selection must stay exact across multiple K grid steps."""
    k, n = 1280, 256  # tile_k=256 -> 5 K steps, rows=1 (% 8 != 0)
    qt = synth_qtensor(rng, n, k, GGMLType.Q4_K, coded=True, packed=packed)
    x = jnp.asarray(rng.normal(0, 1, (8, k)).astype(np.float32))
    want = np.asarray(x) @ np.asarray(qt.dequantize()).T
    from eagle_tpu.ops.pallas_qmm import qmatmul_pallas_2d

    got = np.asarray(qmatmul_pallas_2d(
        x, qt, compute_dtype=jnp.float32, interpret=True,
        tile_n=128, tile_k=256, coded_resident=resident))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * np.abs(want).max())


def test_coded_misaligned_ktile_stacked(rng):
    qts = synth_qtensor(rng, 256, 1280, GGMLType.Q4_K, stack=2, coded=True,
                        packed=True)
    x = jnp.asarray(rng.normal(0, 1, (8, 1280)).astype(np.float32))
    for li in range(2):
        qt = jax.tree_util.tree_map(lambda a: a[li], qts)
        want = np.asarray(x) @ np.asarray(qt.dequantize()).T
        from eagle_tpu.ops.pallas_qmm import qmatmul_pallas_stacked

        got = np.asarray(qmatmul_pallas_stacked(
            x, qts, jnp.asarray(li), compute_dtype=jnp.float32,
            interpret=True, tile_n=128, tile_k=256))
        np.testing.assert_allclose(got, want, rtol=0,
                                   atol=2e-5 * np.abs(want).max())


def test_pick_tiles_coded_misaligned_k_multistep():
    """The 13B shapes (K=5120/13824) must now be eligible for multi-step K
    grids in coded mode (previously forced to whole-K tiles)."""
    from eagle_tpu.ops.pallas_qmm import _pick_tiles_2d

    for k, n in ((5120, 13824), (13824, 5120)):
        tn, tk = _pick_tiles_2d(k, n, 32, True, 8, coded=True, has_bias=True)
        assert tk % 256 == 0 and k % tk == 0
