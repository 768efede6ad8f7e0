"""SPM tokenizer unit tests with handcrafted vocabs (the reference tests
tokenizers against fixture GGUFs, tests/test-tokenizer-0.cpp; here the vocab is
inline and the expected merges are derived by hand)."""

import numpy as np
import pytest

from eagle_tpu.gguf.constants import Keys, TokenType
from eagle_tpu.tokenizer.spm import SPMTokenizer


def make_tok(extra=(), extra_scores=(), **kw):
    tokens = ["<unk>", "<s>", "</s>"]
    ttypes = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL]
    scores = [0.0, 0.0, 0.0]
    # byte fallback tokens
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        ttypes.append(TokenType.BYTE)
        scores.append(0.0)
    base = ["▁", "a", "b", "c", "ab", "▁a", "▁ab", "bc"]
    base_scores = [-1.0, -2.0, -3.0, -4.0, -5.0, -6.0, -7.0, -8.0]
    tokens += base + list(extra)
    scores += base_scores + list(extra_scores)
    ttypes += [TokenType.NORMAL] * (len(base) + len(extra))
    return SPMTokenizer(tokens=tokens, scores=scores, token_types=ttypes, **kw)


def test_basic_merge_order():
    tok = make_tok()
    # "▁ab": pairs "▁a"(-6) vs "ab"(-5): "ab" wins (higher score), then "▁ab"(-7)
    ids = tok.encode("ab", add_bos=False)
    assert [tok.tokens[i] for i in ids] == ["▁ab"]


def test_merge_priority_respects_scores():
    tok = make_tok(add_space_prefix=False)
    # default: "ab"(-5) beats "bc"(-8) -> ["ab", "c"]
    ids = tok.encode("abc", add_bos=False)
    assert [tok.tokens[i] for i in ids] == ["ab", "c"]
    # boost "bc" above "ab": now "bc" merges first -> ["a", "bc"]
    tok2 = make_tok(add_space_prefix=False)
    tok2.scores[tok2.token_to_id["bc"]] = -1.0
    ids2 = tok2.encode("abc", add_bos=False)
    assert [tok2.tokens[i] for i in ids2] == ["a", "bc"]


def test_byte_fallback():
    tok = make_tok()
    ids = tok.encode("aZ", add_bos=False)
    pieces = [tok.tokens[i] for i in ids]
    assert pieces == ["▁a", "<0x5A>"]  # 'Z' not in vocab -> byte token


def test_bos_and_specials():
    tok = make_tok()
    ids = tok.encode("a</s>b")
    assert ids[0] == tok.bos_id
    assert tok.eos_id in ids
    # text after the special gets no space prefix
    pieces = [tok.tokens[i] for i in ids]
    assert pieces[0] == "<s>"


def test_roundtrip_decode():
    tok = make_tok()
    text = "ab abc"
    ids = tok.encode(text, add_bos=False)
    assert tok.decode(ids) == text


def test_decode_bytes_utf8():
    tok = make_tok()
    ids = tok.encode("héllo", add_bos=False)  # é via byte fallback
    assert tok.decode(ids) == "héllo"


def test_from_gguf_metadata_roundtrip():
    tok = make_tok()
    md = {
        Keys.Tokenizer.LIST: tok.tokens,
        Keys.Tokenizer.SCORES: np.asarray(tok.scores, np.float32),
        Keys.Tokenizer.TOKEN_TYPE: np.asarray(tok.token_types, np.int32),
        Keys.Tokenizer.BOS_ID: 1,
        Keys.Tokenizer.EOS_ID: 2,
        Keys.Tokenizer.UNK_ID: 0,
        Keys.Tokenizer.ADD_BOS: True,
    }
    tok2 = SPMTokenizer.from_gguf_metadata(md)
    text = "ab c"
    assert tok2.encode(text) == tok.encode(text)


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------


def make_bpe(**kw):
    from eagle_tpu.tokenizer.bpe import BPETokenizer, _BYTE_ENC

    # vocab: specials + all byte symbols + some merged tokens
    tokens = ["<unk>", "<s>", "</s>"]
    ttypes = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL]
    byte_syms = [_BYTE_ENC[b] for b in range(256)]
    tokens += byte_syms
    ttypes += [TokenType.NORMAL] * 256
    merged = ["he", "ll", "llo", "hello", "Ġw", "Ġwo", "or", "ld", "Ġworld"]
    tokens += merged
    ttypes += [TokenType.NORMAL] * len(merged)
    merges = ["h e", "l l", "ll o", "he llo", "Ġ w", "Ġw o", "o r", "l d", "Ġwo r l d", "Ġwo rld"]
    # note: merges use the byte-mapped space "Ġ"
    return BPETokenizer(tokens=tokens, merges=merges, token_types=ttypes, **kw)


def test_bpe_basic_merges():
    tok = make_bpe()
    ids = tok.encode("hello", add_bos=False)
    assert [tok.tokens[i] for i in ids] == ["hello"]


def test_bpe_space_handling():
    tok = make_bpe()
    ids = tok.encode("hello world", add_bos=False)
    pieces = [tok.tokens[i] for i in ids]
    assert pieces[0] == "hello"
    assert pieces[1].startswith("Ġ")  # space folded into next word


def test_bpe_roundtrip_unicode():
    tok = make_bpe()
    for text in ["hello world", "héllo", "日本語 text", "a\nb", "  spaces  "]:
        ids = tok.encode(text, add_bos=False)
        assert tok.decode(ids) == text


def test_bpe_specials():
    tok = make_bpe()
    ids = tok.encode("hello</s>", add_bos=False)
    assert ids[-1] == 2
    assert tok.decode(ids, skip_special=True) == "hello"


def test_tokenizer_factory():
    from eagle_tpu.tokenizer.bpe import tokenizer_from_gguf_metadata

    md = {
        Keys.Tokenizer.MODEL: "gpt2",
        Keys.Tokenizer.LIST: make_bpe().tokens,
        Keys.Tokenizer.MERGES: make_bpe().merges,
        Keys.Tokenizer.TOKEN_TYPE: np.asarray(make_bpe().token_types, np.int32),
    }
    tok = tokenizer_from_gguf_metadata(md)
    assert tok.encode("hello", add_bos=False)
