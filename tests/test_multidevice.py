"""Sharded == unsharded correctness on the virtual 8-device CPU mesh.

SURVEY §4 prescribes faking a mesh via
`XLA_FLAGS=--xla_force_host_platform_device_count=8` (set in conftest.py) —
these tests go beyond the reference (which has NO multi-device tests at all;
its production multi-GPU path is `--split-mode row`, ggml-backend.cpp:861)
by asserting NUMERICAL equivalence: the tensor-parallel sharded engines must
produce the same tokens/logits as a single-device run, including for the
packed+coded QTensor layout that `api.Engine` actually serves.

Everything runs the XLA backend with f32 compute so the only sharding
effect is GSPMD's partitioning (reduction-order differences stay ~1e-6 and
cannot flip well-separated greedy argmaxes on these seeds).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.models.config import ModelConfig
from eagle_tpu.models.synth import synth_eagle_params, synth_llama_params
from eagle_tpu.parallel.mesh import build_mesh
from eagle_tpu.parallel.shardings import (
    eagle_param_specs,
    llama_param_specs,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual CPU mesh"
)

CFG = ModelConfig(
    arch="llama", vocab_size=256, n_embd=128, n_layers=2, n_heads=4,
    n_kv_heads=4, head_dim=32, n_ff=512, n_ctx_train=256, rope_dim=32,
)
#: coded-scale shapes: every row-sharded K (wo: n_heads*head_dim, w_down:
#: n_ff) must keep K/256 divisible by the model-axis size (QTensorSpec doc)
CFG_CODED = ModelConfig(
    arch="llama", vocab_size=256, n_embd=512, n_layers=2, n_heads=4,
    n_kv_heads=4, head_dim=128, n_ff=512, n_ctx_train=256, rope_dim=128,
)

PROMPT = [3, 17, 5, 99, 42, 7, 250, 11]


def _chain_engine(tp, dp, cfg, **kw):
    from eagle_tpu.runtime.speculative import EagleChainEngine

    return EagleChainEngine(
        tp, dp, cfg, dataclasses.replace(cfg, n_layers=1, is_eagle=True),
        n_draft=3, max_seq=128, backend="xla",
        kv_dtype=jnp.float32, compute_dtype=jnp.float32, eos_id=-1, **kw,
    )


def _sharded(tp, dp, mesh):
    with mesh:
        return (
            shard_params(tp, mesh, llama_param_specs(tp)),
            shard_params(dp, mesh, eagle_param_specs(dp)),
        )


def test_chain_sharded_matches_unsharded():
    tp = synth_llama_params(CFG, seed=0, on_device=True)
    dp = synth_eagle_params(
        dataclasses.replace(CFG, n_layers=1, is_eagle=True), seed=1
    )
    base, _ = _chain_engine(tp, dp, CFG).generate(PROMPT, max_new_tokens=40)

    mesh = build_mesh(n_data=2, n_model=4)
    tps, dps = _sharded(tp, dp, mesh)
    with mesh:
        out, _ = _chain_engine(tps, dps, CFG).generate(PROMPT, max_new_tokens=40)
    assert out == base


def test_coded_packed_serving_layout_sharded():
    """The layout `api.Engine` serves (nibble-packed q + coded u8 sub-scale
    codes with f32 super-scales) under tensor parallelism: `shard_params`
    must carry `sup`/`sup_min` and the sharded forward must match."""
    tp = synth_llama_params(
        CFG_CODED, qtype=GGMLType.Q4_K, seed=0, on_device=True,
        packed=True, coded=True,
    )
    # sanity: this really is the serving layout
    w = tp["layers"]["wo"]
    assert w.packed and w.sup is not None and w.sup_min is not None
    dp = synth_eagle_params(
        dataclasses.replace(CFG_CODED, n_layers=1, is_eagle=True), seed=1
    )
    base, _ = _chain_engine(tp, dp, CFG_CODED).generate(PROMPT, max_new_tokens=32)

    mesh = build_mesh(n_data=4, n_model=2)
    tps, dps = _sharded(tp, dp, mesh)
    # the coded super-scales must actually live on the mesh, sharded like
    # their scale codes (this is what round-4's shard_params dropped)
    ws = tps["layers"]["wo"]
    assert ws.sup.sharding.mesh.shape == mesh.shape
    assert ws.sup.sharding.spec == ws.scale.sharding.spec
    with mesh:
        out, _ = _chain_engine(tps, dps, CFG_CODED).generate(
            PROMPT, max_new_tokens=32
        )
    assert out == base


def test_coded_packed_forward_logits_close():
    """Direct logits check (tighter than token identity): one forward of the
    packed+coded model, sharded vs unsharded."""
    from eagle_tpu.models.llama import llama_forward
    from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags

    tp = synth_llama_params(
        CFG_CODED, qtype=GGMLType.Q4_K, seed=0, on_device=True,
        packed=True, coded=True,
    )

    def fwd(params, toks):
        b, t = toks.shape
        pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
        kv = KVCache.create(CFG_CODED.n_layers, b, 32, CFG_CODED.n_kv_heads,
                            CFG_CODED.head_dim, jnp.float32)
        kv = kv.with_tags(pos, pos)
        mask = causal_mask_from_tags(kv.slot_pos, pos)
        return llama_forward(params, CFG_CODED, toks, pos, kv, pos, mask,
                             compute_dtype=jnp.float32).logits

    toks = jnp.asarray(np.arange(16, dtype=np.int32)[None, :] % 256)
    base = np.asarray(jax.jit(fwd)(tp, toks))

    mesh = build_mesh(n_data=4, n_model=2)
    with mesh:
        tps = shard_params(tp, mesh, llama_param_specs(tp))
        got = np.asarray(jax.jit(fwd)(tps, toks))
    np.testing.assert_allclose(got, base, rtol=2e-5, atol=2e-5)


def test_tree2_sharded_matches_unsharded():
    from eagle_tpu.runtime.tree2 import EagleTree2Engine

    tp = synth_llama_params(CFG, seed=0, on_device=True)
    dp = synth_eagle_params(
        dataclasses.replace(CFG, n_layers=1, is_eagle=True), seed=1
    )
    dcfg = dataclasses.replace(CFG, n_layers=1, is_eagle=True)

    def make(tpp, dpp):
        return EagleTree2Engine(
            tpp, dpp, CFG, dcfg, beam=4, depth=3, n_verify=8, max_seq=128,
            backend="xla", kv_dtype=jnp.float32, compute_dtype=jnp.float32,
            eos_id=-1,
        )

    base, _ = make(tp, dp).generate(PROMPT, max_new_tokens=32)
    mesh = build_mesh(n_data=2, n_model=4)
    tps, dps = _sharded(tp, dp, mesh)
    with mesh:
        out, _ = make(tps, dps).generate(PROMPT, max_new_tokens=32)
    assert out == base


def test_paged_cycle_sharded_matches_unsharded():
    """Paged KV pool under the mesh: prefill + three speculative cycles over
    page-table indirection must emit the same tokens as the unsharded run."""
    tp = synth_llama_params(CFG, seed=0, on_device=True)
    dp = synth_eagle_params(
        dataclasses.replace(CFG, n_layers=1, is_eagle=True), seed=1
    )

    def run(tpp, dpp):
        eng = _chain_engine(tpp, dpp, CFG)
        st = eng.fresh_paged_state(n_pages=16, page_size=8)
        table = np.full((1, st.tgt_kv.page_table.shape[1]), -1, np.int32)
        table[0, :8] = np.arange(8)
        st = dataclasses.replace(
            st,
            tgt_kv=dataclasses.replace(st.tgt_kv, page_table=jnp.asarray(table)),
            dft_kv=dataclasses.replace(st.dft_kv, page_table=jnp.asarray(table)),
        )
        t = 16
        toks = np.zeros((1, t), np.int32)
        toks[0, : len(PROMPT)] = PROMPT
        st = eng._prefill_jit(st, jnp.asarray(toks),
                              jnp.asarray([len(PROMPT)], np.int32), t=t)
        emitted = []
        for _ in range(3):
            res = eng._cycle_jit(st)
            st = res.state
            k = int(np.asarray(res.n_out)[0])
            emitted.extend(int(x) for x in np.asarray(res.tokens)[0, :k])
        return emitted

    base = run(tp, dp)
    mesh = build_mesh(n_data=2, n_model=4)
    tps, dps = _sharded(tp, dp, mesh)
    with mesh:
        out = run(tps, dps)
    assert out == base
