"""App-level CLIs added for SURVEY §2.5/§2.6 coverage: tokenize, retrieval,
the shared arg system's env fallbacks, and the async logging framework."""

import logging
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import GGMLType


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    from tests.test_server import _vocab_metadata

    from eagle_tpu.models.hf_convert import config_from_hf, convert_hf_to_gguf

    md, vocab = _vocab_metadata()
    torch.manual_seed(11)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    path = tmp_path_factory.mktemp("m") / "tiny.gguf"
    convert_hf_to_gguf(model.state_dict(), config_from_hf(hf_cfg), path,
                       qtype=GGMLType.F32, metadata=md)
    return str(path)


def test_tokenize_cli(tiny_gguf, capsys):
    from eagle_tpu.tools.tokenize import main

    assert main(["-m", tiny_gguf, "-p", "hello world", "--ids"]) == 0
    out = capsys.readouterr().out.strip()
    ids = [int(x) for x in out.split()]
    assert ids[0] == 1  # add_bos

    from eagle_tpu.gguf.reader import GGUFReader
    from eagle_tpu.tokenizer.bpe import tokenizer_from_gguf_metadata

    tok = tokenizer_from_gguf_metadata(GGUFReader(tiny_gguf).metadata)
    assert ids == list(tok.encode("hello world"))


def test_retrieval_cli(tiny_gguf, tmp_path, capsys):
    from eagle_tpu.tools.retrieval import chunk_texts, main

    doc = tmp_path / "doc.txt"
    doc.write_text("hello world\n" * 3 + "abc abc abc\n" * 3)
    chunks = chunk_texts([str(doc)], chunk_size=20, separator="\n")
    assert len(chunks) >= 2
    assert main(["-m", tiny_gguf, "--context-files", str(doc),
                 "--chunk-size", "20", "--top-k", "1", "-q", "hello"]) == 0
    out = capsys.readouterr().out
    assert "sim=" in out


def test_env_arg_fallbacks(monkeypatch):
    from eagle_tpu.utils.args import build_parser, env_default

    monkeypatch.setenv("EAGLE_ARG_CTX", "512")
    monkeypatch.setenv("EAGLE_ARG_MODEL", "/tmp/x.gguf")
    assert env_default("ctx", 2048, int) == 512
    args = build_parser("cli").parse_args(["-p", "hi"])
    # no -m needed: the registry's env fallback satisfies the required flag
    assert args.model == "/tmp/x.gguf" and args.ctx == 512


def test_registry_per_tool_masks_and_env(monkeypatch):
    """One declarative table serves every tool: per-tool masks gate which
    flags exist, EAGLE_ARG_* overrides declared defaults, and explicit CLI
    values beat the environment (common/arg.cpp precedence)."""
    import pytest as _pytest

    from eagle_tpu.utils.args import REGISTRY, build_parser

    # masks: --port exists for the server, not the cli
    srv = build_parser("server")
    monkeypatch.setenv("EAGLE_ARG_MODEL", "/tmp/x.gguf")
    assert build_parser("server").parse_args([]).port == 8080
    with _pytest.raises(SystemExit):
        build_parser("cli").parse_args(["--port", "1"])
    # env overrides default; explicit CLI wins over env
    monkeypatch.setenv("EAGLE_ARG_TEMP", "0.25")
    assert build_parser("cli").parse_args([]).temp == 0.25
    assert build_parser("cli").parse_args(["--temp", "0.5"]).temp == 0.5
    # boolean env fallback
    monkeypatch.setenv("EAGLE_ARG_PAGED", "1")
    assert build_parser("server").parse_args([]).paged is True
    # every row resolves a well-formed dest + env name
    for opt in REGISTRY:
        assert opt.dest.isidentifier()
        assert opt.env_name is None or opt.env_name.startswith("EAGLE_ARG_")


def test_server_request_sampler_uses_registry_table():
    from eagle_tpu.runtime.sampling import SamplerConfig
    from eagle_tpu.utils.args import sampler_from_request

    base = SamplerConfig(greedy=True, temperature=0.8)
    cfg = sampler_from_request({"temperature": 0.3, "top_k": 7}, base)
    assert cfg.temperature == 0.3 and cfg.top_k == 7 and cfg.greedy is False
    cfg0 = sampler_from_request({"temperature": 0}, base)
    assert cfg0.greedy is True


def test_logging_framework(tmp_path):
    from eagle_tpu.utils.logging import get_logger, setup_logging

    log_file = tmp_path / "log.txt"
    setup_logging(level="debug", log_file=str(log_file), colors=False)
    log = get_logger("test")
    log.info("hello %d", 42)
    log.debug("dbg")
    log.warning("warn")
    import eagle_tpu.utils.logging as L

    L._stop_listener()  # drain the async queue
    text = log_file.read_text()
    assert "hello 42" in text and "dbg" in text and "warn" in text
    assert text.splitlines()[0].startswith("I ")
    setup_logging()  # restore defaults for other tests
