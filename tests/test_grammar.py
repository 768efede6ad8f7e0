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


def _json_grammar():
    return Grammar(
        'root ::= object\n'
        'object ::= "{" ws ( string ":" ws value ("," ws string ":" ws value)* )? "}"\n'
        'value ::= object | array | string | number | "true" | "false" | "null"\n'
        'array ::= "[" ws ( value ("," ws value)* )? "]" ws\n'
        'string ::= "\\"" [^"\\\\]* "\\"" ws\n'
        'number ::= "-"? [0-9]+ ("." [0-9]+)? ws\n'
        'ws ::= [ \\t\\n]*\n'
    )


def _fake_vocab(n=32000, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    pieces = ['{', '}', '[', ']', '"', ':', ',', ' ', 'true', 'false', 'null',
              '":', '",', '{"', '"}']
    alphabet = list('abcdefghijklmnopqrstuvwxyz0123456789 .-_"{}[]:,')
    while len(pieces) < n:
        ln = int(rng.integers(1, 8))
        pieces.append(''.join(rng.choice(alphabet) for _ in range(ln)))
    return pieces


def test_token_mask_matches_naive():
    from eagle_tpu.runtime.grammar import TokenTrie

    g = _json_grammar()
    pieces = _fake_vocab(n=800)
    trie = TokenTrie(pieces)
    g.accept_text('{"a')
    fast = g.token_mask(trie)
    naive = g.allowed_mask(pieces)
    assert list(fast) == naive


def test_token_mask_speed_32k_vocab():
    """Production bar (VERDICT #5): grammar masking over a 32k vocab must be
    milliseconds, not seconds, per token."""
    import time

    from eagle_tpu.runtime.grammar import TokenTrie

    g = _json_grammar()
    pieces = _fake_vocab(n=32000)
    trie = TokenTrie(pieces)
    g.accept_text('{"key": ')
    # min over repeats: the CI host is 2 cores and may be running a TPU bench
    # concurrently — mean timing is load-flaky, the min is the true cost
    per = min(
        (lambda t0: (g.token_mask(trie), time.time() - t0)[1])(time.time())
        for _ in range(20)
    )
    assert per < 0.05, f"{per*1e3:.1f} ms/token"


def test_lazy_grammar_trigger_word():
    g = Grammar('root ::= "{" [a-z]* "}"', lazy=True, trigger_words=["{"])
    from eagle_tpu.runtime.grammar import TokenTrie

    pieces = ["Hello", " world", "{", "ab", "}", "zz9"]
    trie = TokenTrie(pieces)
    assert g.awaiting_trigger
    assert g.token_mask(trie).all()  # unconstrained before trigger
    g.accept_token(0, "Hello")
    assert g.awaiting_trigger
    g.accept_token(2, "{")  # trigger word appears -> activates, consumes "{"
    assert not g.awaiting_trigger
    mask = g.token_mask(trie)
    assert mask[3] and mask[4]  # "ab", "}"
    assert not mask[0] and not mask[5]  # "Hello" (uppercase), "zz9" (digit)


def test_lazy_grammar_trigger_token():
    g = Grammar('root ::= "<tool>" [a-z]+ "</tool>"', lazy=True, trigger_tokens=[7])
    g.accept_token(3, "free text ")
    assert g.awaiting_trigger
    g.accept_token(7, "<tool>")
    assert not g.awaiting_trigger
    g.accept_token(1, "abc")
    assert g.accepts_text("</tool>")


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
