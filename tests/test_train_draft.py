"""EAGLE draft-head training pipeline: trained acceptance must be measurable.

The reference never measures acceptance (no numbers in-tree, BASELINE.md); the
EAGLE paper's ~3.9-4.3 mean accept length needs real trained heads. This test
runs the full train->GGUF->reload->measure loop at miniature scale and asserts
the trained head accepts strictly more than chance (a random head accepts ~0
per tests below), proving the measurement path is real, not synthetic."""

import dataclasses

import numpy as np
import pytest

from eagle_tpu.tools import train_draft as td


@pytest.fixture(scope="module")
def trained():
    return td.train_pipeline(
        steps=220, batch=16, seqlen=48, seed=3,
        cfg_overrides=dict(vocab_size=128, n_embd=64, n_layers=2, n_heads=2,
                           n_kv_heads=2, head_dim=32, n_ff=128, rope_dim=32),
        log=lambda *a: None,
    )


def test_trained_head_accepts(trained):
    target, draft, tcfg, dcfg, lang = trained
    stats = td.measure_acceptance(
        target, draft, tcfg, dcfg, lang, n_prompts=4, prompt_len=16,
        max_new_tokens=48,
    )
    assert stats["n_cycles"] > 0
    # trained on a predictable language, acceptance must clear chance by a wide
    # margin (chance for a 128-vocab ~ 1/128 per position)
    assert stats["accept_rate"] > 0.05, stats
    assert stats["mean_accept_len"] > 1.1, stats


def test_random_head_accepts_nothing(trained):
    target, _, tcfg, dcfg, lang = trained
    random_draft = td.init_draft(dcfg, np.random.default_rng(123))
    stats = td.measure_acceptance(
        target, random_draft, tcfg, dcfg, lang, n_prompts=2, prompt_len=16,
        max_new_tokens=32,
    )
    assert stats["accept_rate"] < 0.05, stats


def test_gguf_round_trip_preserves_acceptance(trained, tmp_path):
    target, draft, tcfg, dcfg, lang = trained
    td.save_target_gguf(tmp_path / "t.gguf", target, tcfg)
    td.save_eagle_gguf(tmp_path / "d.gguf", draft, dcfg)

    from eagle_tpu.models.loader import load_eagle_params, load_llama_params

    tp, tcfg2, _ = load_llama_params(tmp_path / "t.gguf", fuse=False)
    dp, dcfg2, _ = load_eagle_params(tmp_path / "d.gguf")
    dcfg2 = dataclasses.replace(dcfg2, is_eagle=True)
    a = td.measure_acceptance(target, draft, tcfg, dcfg, lang, n_prompts=2,
                              prompt_len=16, max_new_tokens=32)
    b = td.measure_acceptance(tp, dp, tcfg2, dcfg2, lang, n_prompts=2,
                              prompt_len=16, max_new_tokens=32)
    # f32 tensors round-trip exactly -> identical token streams and stats
    assert a == b
