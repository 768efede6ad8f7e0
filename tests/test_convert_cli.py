"""Convert CLI: full HF directory (config + safetensors + tokenizer.json /
sentencepiece model) -> GGUF -> loadable Engine."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import TokenType


def make_hf_dir(tmp_path, vocab_size=300):
    d = tmp_path / "hf"
    d.mkdir()
    torch.manual_seed(4)
    cfg = transformers.LlamaConfig(
        vocab_size=vocab_size, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(cfg)
    model.save_pretrained(d, safe_serialization=True)
    # minimal BPE tokenizer.json
    from eagle_tpu.tokenizer.bpe import _BYTE_ENC

    vocab = {}
    for i, sym in enumerate(["<unk>", "<s>", "</s>"]):
        vocab[sym] = i
    for b in range(256):
        vocab[_BYTE_ENC[b]] = 3 + b
    extra = ["he", "ll", "llo", "hello"]
    for i, w in enumerate(extra):
        vocab[w] = 259 + i
    while len(vocab) < vocab_size:
        vocab[f"<pad{len(vocab)}>"] = len(vocab)
    tj = {
        "model": {"type": "BPE", "vocab": vocab,
                  "merges": ["h e", "l l", "ll o", "he llo"]},
        "added_tokens": [
            {"id": 1, "special": True, "content": "<s>"},
            {"id": 2, "special": True, "content": "</s>"},
        ],
    }
    (d / "tokenizer.json").write_text(json.dumps(tj))
    (d / "tokenizer_config.json").write_text(json.dumps({"chat_template": "<|im_start|>"}))
    return d


def test_convert_cli_roundtrip(tmp_path):
    import jax.numpy as jnp

    from eagle_tpu.api import Engine, EngineConfig
    from eagle_tpu.tools.convert import main

    d = make_hf_dir(tmp_path)
    out = tmp_path / "model.gguf"
    assert main([str(d), str(out), "--qtype=F32"]) == 0

    eng = Engine(EngineConfig(model_path=out, max_seq=64,
                              compute_dtype=jnp.float32, kv_dtype=jnp.float32))
    assert eng.metadata["tokenizer.ggml.model"] == "gpt2"
    assert eng.metadata.get("tokenizer.chat_template") == "<|im_start|>"
    ids = eng.tokenizer.encode("hello", add_bos=False)
    assert [eng.tokenizer.tokens[i] for i in ids] == ["hello"]
    text, _ = eng.generate_text("hello", max_new_tokens=4)
    assert isinstance(text, str)


def test_sentencepiece_protobuf_parser(tmp_path):
    """Round-trip our own minimal sp-model writer through the parser."""
    import struct

    from eagle_tpu.tools.convert import _parse_sentencepiece_model

    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def piece(text, score, ptype):
        body = b"\x0a" + varint(len(text.encode())) + text.encode()
        body += b"\x15" + struct.pack("<f", score)
        body += b"\x18" + varint(ptype)
        return b"\x0a" + varint(len(body)) + body

    blob = piece("<unk>", 0.0, 2) + piece("▁the", -2.5, 1) + piece("<0x0A>", 0.0, 6)
    p = tmp_path / "tokenizer.model"
    p.write_bytes(blob)
    tokens, scores, types = _parse_sentencepiece_model(p)
    assert tokens == ["<unk>", "▁the", "<0x0A>"]
    assert scores[1] == pytest.approx(-2.5)
    assert types == [int(TokenType.UNKNOWN), int(TokenType.NORMAL), int(TokenType.BYTE)]
