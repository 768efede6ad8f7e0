"""Lookahead decoding: token-identical to plain greedy decode, with n-gram
acceptance on repetitive text (the reference's examples/lookahead contract)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.models.synth import VICUNA_7B, synth_llama_params
from eagle_tpu.runtime.generate import Generator
from eagle_tpu.runtime.lookahead import LookaheadEngine, _Layout


TINY = dataclasses.replace(
    VICUNA_7B, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2, head_dim=16,
    rope_dim=16, n_ff=128, vocab_size=256,
)


def test_layout_mask_shape_and_visibility():
    lay = _Layout(W=4, N=4, G=3)
    assert lay.T == 1 + 3 * 3 + 3 + 2 * 4
    vis = lay.visible
    # everyone sees the input row
    assert vis[:, 0].all()
    # gram rows see only their own prefix (plus input/self)
    r_g1_t1 = 1 + 1 * 3 + 1
    assert vis[r_g1_t1, 1 + 1 * 3 + 0] and not vis[r_g1_t1, 1 + 0 * 3 + 0]
    # level-2 column 2 sees level-0 cols 1..2 and level-1 col 2 only
    r = lay.aj(2, 2)
    assert vis[r, lay.a0(1)] and vis[r, lay.a0(2)]
    assert vis[r, lay.aj(1, 2)]
    assert not vis[r, lay.a0(3)] and not vis[r, lay.aj(1, 1)]
    # positions follow the lookahead diagram (lookahead.cpp:183-186)
    assert lay.pos_off[0] == 0
    assert lay.pos_off[lay.a0(3)] == 3
    assert lay.pos_off[lay.aj(2, 1)] == 3


@pytest.mark.parametrize("seed", [0, 3])
def test_lookahead_matches_plain_greedy(seed):
    params = synth_llama_params(TINY, seed=seed)
    gen = Generator(params, TINY, max_seq=256, batch=1,
                    compute_dtype=jnp.float32, kv_dtype=jnp.float32, eos_id=-1)
    prompt = np.asarray([5, 9, 5, 9, 5, 9, 11, 5, 9], np.int32)
    ref = gen.generate(prompt, max_new_tokens=40, stop_at_eos=False, chunk=16)

    la = LookaheadEngine(params, TINY, W=4, N=4, G=4, max_seq=256,
                         compute_dtype=jnp.float32, kv_dtype=jnp.float32,
                         eos_id=-1)
    out, stats = la.generate(prompt, max_new_tokens=40, stop_at_eos=False)
    assert out[: len(ref)] == list(ref), (out, list(ref), stats)
    assert stats["n_steps"] > 0


def test_lookahead_accepts_on_repetitive_text():
    """A tiny random model greedy-loops; the pool must pick the loop up and
    accept > 0 gram tokens overall."""
    params = synth_llama_params(TINY, seed=1)
    la = LookaheadEngine(params, TINY, W=4, N=4, G=4, max_seq=512,
                         compute_dtype=jnp.float32, kv_dtype=jnp.float32,
                         eos_id=-1)
    prompt = np.asarray([7, 7, 7, 7], np.int32)
    out, stats = la.generate(prompt, max_new_tokens=120, stop_at_eos=False)
    assert len(out) >= 120
    assert stats["n_accept"] > 0, stats
    assert stats["tokens_per_step"] > 1.0
