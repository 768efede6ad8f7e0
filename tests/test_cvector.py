"""cvector-generator: direction extraction (mean + PCA) and GGUF round-trip
into the control-vector apply path (cvector-generator.cpp / mean.hpp /
pca.hpp semantics)."""

import dataclasses

import numpy as np

from eagle_tpu.models.synth import VICUNA_7B, synth_llama_params
from eagle_tpu.tools.cvector import (
    direction_mean,
    direction_pca,
    diff_matrices,
    generate_cvector,
    write_cvector_gguf,
)

TINY = dataclasses.replace(
    VICUNA_7B, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2, head_dim=16,
    rope_dim=16, n_ff=128, vocab_size=256,
)


class _FakeTok:
    def encode(self, text, add_bos=True):
        return [1] + [3 + (ord(c) % 200) for c in text][:12]


def test_direction_mean_normalized():
    d = np.asarray([[2.0, 0.0], [4.0, 0.0]])
    v = direction_mean(d)
    assert np.allclose(v, [1.0, 0.0])


def test_direction_pca_dominant_axis_and_sign():
    rng = np.random.default_rng(0)
    # diffs mostly along +e1 with noise on e2
    d = np.outer(rng.uniform(0.5, 1.5, 200), [1.0, 0.0]) + \
        0.05 * rng.standard_normal((200, 2))
    v = direction_pca(d, n_iter=500)
    assert abs(v[0]) > 0.99
    assert v[0] > 0  # sign oriented toward the mean diff


def test_generate_and_roundtrip(tmp_path):
    params = synth_llama_params(TINY, seed=0)
    tok = _FakeTok()
    pairs = [("happy cheerful", "sad gloomy"), ("joy", "sorrow and despair")]
    diffs = diff_matrices(params, TINY, tok, pairs)
    assert len(diffs) == TINY.n_layers
    assert all(d.shape[1] == TINY.n_embd for d in diffs)

    dirs = generate_cvector(params, TINY, tok, pairs, method="pca", pca_iter=50)
    assert all(np.isclose(np.linalg.norm(v), 1.0, atol=1e-3) for v in dirs)

    out = tmp_path / "cv.gguf"
    write_cvector_gguf(out, dirs)
    from eagle_tpu.tools.lora import load_control_vector

    cv = load_control_vector(out, TINY.n_layers, TINY.n_embd)
    assert np.allclose(np.asarray(cv), np.stack(dirs), atol=1e-6)


def test_mean_method():
    params = synth_llama_params(TINY, seed=1)
    dirs = generate_cvector(params, TINY, _FakeTok(),
                            [("good", "bad")], method="mean")
    assert len(dirs) == TINY.n_layers
