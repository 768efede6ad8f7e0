"""GBNF grammar engine tests (ref: tests/test-grammar-parser.cpp and
test-grammar-integration.cpp patterns)."""

import pytest

from eagle_tpu.runtime.grammar import Grammar, GrammarParseError


def test_literal_alternates():
    g = Grammar('root ::= "yes" | "no"')
    assert g.accepts_text("yes", partial=False)
    assert g.accepts_text("no", partial=False)
    assert g.accepts_text("y")  # partial ok
    assert not g.accepts_text("maybe")
    assert not g.accepts_text("yess")


def test_char_class_and_star():
    g = Grammar('root ::= [a-z]*')
    assert g.accepts_text("", partial=False)
    assert g.accepts_text("abcxyz", partial=False)
    assert not g.accepts_text("ABC")


def test_plus_and_question():
    g = Grammar('root ::= [0-9]+ "."? [0-9]*')
    assert g.accepts_text("42", partial=False)
    assert g.accepts_text("3.14", partial=False)
    assert g.accepts_text("7.", partial=False)
    assert not g.accepts_text(".5", partial=False)


def test_rule_refs_and_recursion():
    g = Grammar(
        '''
root ::= expr
expr ::= term ("+" term)*
term ::= [0-9]+
'''
    )
    assert g.accepts_text("1+2+33", partial=False)
    assert not g.accepts_text("1++2")


def test_negated_class():
    g = Grammar('root ::= "\\"" [^"]* "\\""')
    assert g.accepts_text('"hello"', partial=False)
    assert not g.accepts_text('"he"llo"', partial=False)


def test_bounded_repetition():
    g = Grammar('root ::= [a]{2,4}')
    assert not g.accepts_text("a", partial=False)
    assert g.accepts_text("aa", partial=False)
    assert g.accepts_text("aaaa", partial=False)
    assert not g.accepts_text("aaaaa")


def test_accept_advances_state():
    g = Grammar('root ::= "ab" | "ac"')
    g.accept_text("a")
    assert g.accepts_text("b", partial=False)
    assert g.accepts_text("c", partial=False)
    g.accept_text("b")
    assert g.can_end
    with pytest.raises(ValueError):
        g.accept_text("x")


def test_allowed_mask_over_pieces():
    g = Grammar('root ::= "true" | "false"')
    mask = g.allowed_mask(["tr", "fa", "xx", "true", "t", ""])
    assert mask == [True, True, False, True, True, False]


def test_missing_root_raises():
    with pytest.raises(GrammarParseError):
        Grammar('start ::= "x"')


def test_escapes():
    g = Grammar('root ::= "\\n" [\\t ]')
    assert g.accepts_text("\n\t", partial=False)
    assert g.accepts_text("\n ", partial=False)


def test_json_like_subset():
    g = Grammar(
        r'''
root ::= object
object ::= "{" ws ( string ":" ws value ("," ws string ":" ws value)* )? "}" ws
value ::= object | array | string | number | "true" | "false" | "null"
array ::= "[" ws ( value ("," ws value)* )? "]" ws
string ::= "\"" [^"\\]* "\""
number ::= "-"? [0-9]+ ("." [0-9]+)?
ws ::= [ \t\n]*
'''
    )
    assert g.accepts_text('{"a": 1, "b": [true, null]}', partial=False)
    assert g.accepts_text('{"nested": {"x": -2.5}}', partial=False)
    assert not g.accepts_text('{"a": }', partial=False)
    assert not g.accepts_text("[1,2]", partial=False)  # root must be object


def test_constrained_generation_obeys_grammar():
    """End-to-end: a random tiny model forced through root ::= "yes" | "no"."""
    pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import torch
    import jax.numpy as jnp

    from eagle_tpu.models.hf_convert import params_from_hf_llama
    from eagle_tpu.runtime.generate import Generator
    from eagle_tpu.tokenizer.spm import SPMTokenizer
    from eagle_tpu.gguf.constants import TokenType

    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(
        transformers.LlamaConfig(
            vocab_size=300, hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
            attn_implementation="eager",
        )
    ).eval()
    params, cfg = params_from_hf_llama(hf)

    tokens = ["<unk>", "<s>", "</s>"]
    ttypes = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        ttypes.append(TokenType.BYTE)
    for w in ["yes", "no", "ye", "s", "maybe", "y", "▁x"]:
        tokens.append(w)
        ttypes.append(TokenType.NORMAL)
    while len(tokens) < 300:
        tokens.append(f"<pad{len(tokens)}>")
        ttypes.append(TokenType.UNUSED)
    tok = SPMTokenizer(tokens=tokens, scores=[0.0] * 300, token_types=ttypes)

    g = Grammar('root ::= "yes" | "no"')
    gen = Generator(params, cfg, max_seq=64, compute_dtype=jnp.float32, eos_id=2)
    out = gen.generate_constrained([1, 270, 271], g, tok, max_new_tokens=8)
    text = "".join(tok.piece(t) for t in out if t != 2)
    assert text in ("yes", "no"), text
