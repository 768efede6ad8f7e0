"""Grammar-constrained SPECULATIVE decoding (composition of the chain engine
with the GBNF automaton — the reference applies its grammar sampler stage to
whatever decode mode runs, src/llama-sampling.cpp + llama-grammar.cpp:1120).
The speculative output must be token-identical to the plain constrained
generator's (the draft only changes speed) and must satisfy the grammar."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from tests.test_server import tiny_gguf_pair  # noqa: F401  (fixture)

GRAMMAR = r'''
root ::= item item item
item ::= ("aa" | "bb" | "cc") " "
'''


def _engines(tiny_gguf_pair):
    from eagle_tpu.api import Engine, EngineConfig

    tgt, egl = tiny_gguf_pair
    spec = Engine(EngineConfig(model_path=tgt, draft_path=egl, max_seq=128,
                               compute_dtype=jnp.float32, kv_dtype=jnp.float32,
                               n_draft=4))
    plain = Engine(EngineConfig(model_path=tgt, max_seq=128,
                                compute_dtype=jnp.float32, kv_dtype=jnp.float32))
    return spec, plain


def test_spec_grammar_matches_plain_constrained(tiny_gguf_pair):  # noqa: F811
    spec, plain = _engines(tiny_gguf_pair)
    from eagle_tpu.runtime.speculative import EagleChainEngine

    assert isinstance(spec.engine, EagleChainEngine)

    text_s, stats_s = spec.generate_text("hello", max_new_tokens=24,
                                         grammar=GRAMMAR)
    text_p, stats_p = plain.generate_text("hello", max_new_tokens=24,
                                          grammar=GRAMMAR)
    assert stats_s["constrained"] and stats_s["n_cycles"] >= 1
    # token-identical composition: speculation must not change the output
    assert text_s == text_p

    # the emitted text satisfies the grammar (three items)
    from eagle_tpu.runtime.grammar import Grammar

    g = Grammar(GRAMMAR)
    assert g.accepts_text(text_s) or text_s == ""
    assert text_s.count(" ") >= 1  # actually produced constrained items


def test_spec_grammar_json_schema(tiny_gguf_pair):  # noqa: F811
    """JSON-schema constraint rides the same composed path."""
    spec, _ = _engines(tiny_gguf_pair)
    schema = {"type": "object", "properties": {"a": {"type": "integer"}},
              "required": ["a"]}
    text, stats = spec.generate_text("hello", max_new_tokens=32,
                                     json_schema=schema)
    assert stats["constrained"]
    # prefix of a JSON object (generation may hit the token cap mid-object)
    assert text.lstrip().startswith("{")
