"""GGUF container round-trip tests (ref test pattern: tests/test-gguf.cpp)."""

import numpy as np
import pytest

from eagle_tpu.gguf import GGMLType, GGUFReader, GGUFWriter


def test_write_read_roundtrip(tmp_path, rng):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(path)
    w.add("general.architecture", "llama")
    w.add("general.name", "test-model")
    w.add("llama.block_count", 2)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("tokenizer.ggml.add_bos_token", True)
    w.add("tokenizer.ggml.tokens", ["<s>", "</s>", "hello", "éé"])
    w.add("tokenizer.ggml.scores", np.array([0.0, -1.0, -2.0, -3.5], dtype=np.float32))
    w.add("tokenizer.ggml.token_type", np.array([3, 3, 1, 1], dtype=np.int32))

    a = rng.standard_normal((64, 256)).astype(np.float32)
    b = rng.standard_normal((4, 512)).astype(np.float32)
    w.add_tensor("a.weight", a, GGMLType.F32)
    w.add_tensor("b.weight", b, GGMLType.Q4_K)
    w.add_tensor("c.weight", a, GGMLType.F16)
    w.write()

    with GGUFReader(path) as r:
        assert r.version == 3
        assert r.metadata["general.architecture"] == "llama"
        assert r.metadata["llama.block_count"] == 2
        assert r.metadata["llama.rope.freq_base"] == pytest.approx(10000.0)
        assert r.metadata["tokenizer.ggml.add_bos_token"] is True
        assert r.metadata["tokenizer.ggml.tokens"] == ["<s>", "</s>", "hello", "éé"]
        np.testing.assert_array_equal(
            r.metadata["tokenizer.ggml.token_type"], np.array([3, 3, 1, 1])
        )
        assert r.tensors["a.weight"].shape == (64, 256)
        assert r.tensors["b.weight"].ggml_type == GGMLType.Q4_K
        np.testing.assert_array_equal(r.tensor_f32("a.weight"), a)
        np.testing.assert_array_equal(
            r.tensor_f32("c.weight"), a.astype(np.float16).astype(np.float32)
        )
        # quantized round trip within tolerance
        db = r.tensor_f32("b.weight")
        assert np.sqrt(np.mean((db - b) ** 2)) / np.std(b) < 0.12


def test_oracle_reads_our_file(tmp_path, rng, reference_gguf_py):
    """Files we write must parse under the reference's gguf-py reader."""
    path = tmp_path / "o.gguf"
    w = GGUFWriter(path)
    w.add("general.architecture", "llama")
    w.add("llama.embedding_length", 256)
    x = rng.standard_normal((8, 256)).astype(np.float32)
    w.add_tensor("tok.weight", x, GGMLType.Q8_0)
    w.write()

    r = reference_gguf_py.GGUFReader(str(path))
    fields = {f.name: f for f in r.fields.values()}
    assert "general.architecture" in fields
    t = {t.name: t for t in r.tensors}["tok.weight"]
    assert int(t.tensor_type) == int(GGMLType.Q8_0)
    deq = reference_gguf_py.quants.dequantize(
        np.array(t.data), reference_gguf_py.GGMLQuantizationType.Q8_0
    ).reshape(8, 256)
    ours = GGUFReader(path).tensor_f32("tok.weight")
    np.testing.assert_array_equal(deq, ours)


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        GGUFReader(p)
