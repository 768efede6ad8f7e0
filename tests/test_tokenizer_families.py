"""WPM / UGM / RWKV tokenizer families + multi-regex pretokenizers, fuzzed
against the HF `tokenizers` library as an independent oracle (the
tests/test-tokenizer-random.py pattern from the reference)."""

import numpy as np
import pytest

from eagle_tpu.tokenizer.rwkv import RWKVTokenizer, unescape_rwkv_token
from eagle_tpu.tokenizer.ugm import UGMTokenizer
from eagle_tpu.tokenizer.wpm import WPMTokenizer

tokenizers = pytest.importorskip("tokenizers")


# ---------------------------------------------------------------------------
# WPM vs HF WordPiece
# ---------------------------------------------------------------------------

WORDS = ["the", "quick", "brown", "fox", "jump", "##ed", "##s", "##ing",
         "over", "lazy", "dog", "un", "##believ", "##able", "deep", "##er",
         "hello", "world", "!", ",", ".", "ché", "##ze", "中", "国", "a",
         "##b", "b", "t", "##he"]


def _hf_wordpiece():
    from tokenizers import Tokenizer, normalizers, pre_tokenizers
    from tokenizers.models import WordPiece

    vocab = {"[UNK]": 0, "[CLS]": 1, "[SEP]": 2}
    for w in WORDS:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(WordPiece(vocab, unk_token="[UNK]", max_input_chars_per_word=200))
    tok.normalizer = normalizers.BertNormalizer(lowercase=True)
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    return tok, vocab


def _our_wpm(vocab: dict):
    # GGUF conversion: word-initial pieces get the phantom-space prefix,
    # continuations ("##x") drop the marker (gguf-py BertModel vocab mapping)
    tokens = [""] * len(vocab)
    for w, i in vocab.items():
        if w in ("[UNK]", "[CLS]", "[SEP]"):
            tokens[i] = w
        elif w.startswith("##"):
            tokens[i] = w[2:]
        else:
            tokens[i] = "▁" + w
    ttypes = [1] * len(tokens)
    ttypes[0] = ttypes[1] = ttypes[2] = 3  # control
    return WPMTokenizer(tokens=tokens, token_types=ttypes, bos_id=1, eos_id=2,
                        unk_id=0, add_bos=False, add_eos=False)


@pytest.mark.parametrize("text", [
    "the quick brown fox",
    "The QUICK Brown fox jumped!",
    "unbelievable, deeper.",
    "hello world 中国 hello",
    "chéze the",
    "  spaces   everywhere  ",
    "punct!!!...,,,",
])
def test_wpm_matches_hf_wordpiece(text):
    hf, vocab = _hf_wordpiece()
    ours = _our_wpm(vocab)
    assert ours.encode(text) == hf.encode(text).ids


def test_wpm_fuzz_vs_hf():
    hf, vocab = _hf_wordpiece()
    ours = _our_wpm(vocab)
    rng = np.random.default_rng(0)
    pieces = ["the", "fox", "jumped", "!", " ", "  ", "中", "ché", "zzz",
              "unbelievable", "a", "b", "ab", ".", "deeper", "\t", "\n"]
    for _ in range(200):
        text = "".join(rng.choice(pieces) for _ in range(rng.integers(1, 12)))
        assert ours.encode(text) == hf.encode(text).ids, repr(text)


# ---------------------------------------------------------------------------
# UGM Viterbi vs HF Unigram
# ---------------------------------------------------------------------------


def _unigram_pair():
    from tokenizers import Tokenizer
    from tokenizers.models import Unigram

    vocab = [("<unk>", 0.0), ("▁", -2.0), ("▁the", -3.0), ("▁th", -4.5),
             ("e", -1.5), ("▁quick", -5.0), ("qu", -3.0), ("ick", -3.2),
             ("▁fox", -4.0), ("f", -2.0), ("ox", -2.5), ("t", -1.8),
             ("h", -1.9), ("x", -2.2), ("o", -1.7), ("i", -1.6), ("c", -1.9),
             ("k", -2.0), ("▁f", -3.1), ("▁q", -3.3), ("u", -1.5),
             ("▁t", -2.9), ("▁e", -3.0), ("the", -3.6), ("▁ox", -4.2)]
    hf = Tokenizer(Unigram(vocab, unk_id=0, byte_fallback=False))
    tokens = [v[0] for v in vocab]
    scores = [v[1] for v in vocab]
    ttypes = [1] * len(tokens)
    ttypes[0] = 2  # unknown
    ours = UGMTokenizer(tokens=tokens, scores=scores, token_types=ttypes,
                        bos_id=-1, eos_id=-1, unk_id=0, add_bos=False,
                        add_eos=False, add_space_prefix=False,
                        remove_extra_whitespaces=False)
    return hf, ours


def test_ugm_viterbi_matches_hf_unigram():
    hf, ours = _unigram_pair()
    rng = np.random.default_rng(1)
    alphabet = ["▁the", "▁quick", "▁fox", "e", "t", "h", "▁", "ox", "ick"]
    for _ in range(200):
        s = "".join(rng.choice(alphabet) for _ in range(rng.integers(1, 10)))
        got = ours.encode(s)
        want = hf.encode(s).ids
        # both are max-score tokenizations; scores chosen to avoid ties
        assert got == want, repr(s)


def test_ugm_unknown_chars_become_unk():
    _, ours = _unigram_pair()
    ids = ours.encode("the ZZ fox".replace(" ", "▁"))
    assert ours.unk_id in ids


def test_ugm_normalization():
    tok = UGMTokenizer(tokens=["<unk>", "▁a", "▁b", "a", "b"],
                       scores=[0, -1, -1, -2, -2], token_types=[2, 1, 1, 1, 1],
                       unk_id=0, add_space_prefix=True, eos_id=-1)
    assert tok.normalize("a  b") == "▁a▁b"  # extra whitespace removed + prefix


# ---------------------------------------------------------------------------
# RWKV greedy byte matching
# ---------------------------------------------------------------------------


def test_rwkv_unescape():
    assert unescape_rwkv_token("ab") == b"ab"
    assert unescape_rwkv_token("\\t\\n\\\\") == b"\t\n\\"
    assert unescape_rwkv_token("\\xe4\\xb8\\xad") == "中".encode()


def test_rwkv_longest_match():
    tokens = ["<unk>", "a", "ab", "abc", "b", "c", " ", "\\xe4\\xb8\\xad"]
    tok = RWKVTokenizer(tokens=tokens, token_types=[2] + [1] * 7, unk_id=0)
    assert tok.encode("abc") == [3]
    assert tok.encode("ab c") == [2, 6, 5]
    assert tok.encode("abab") == [2, 2]
    assert tok.encode("中a") == [7, 1]
    assert tok.decode(tok.encode("abc ab 中")) == "abc ab 中"
    assert tok.encode("Z") == [0]  # unknown byte -> unk


# ---------------------------------------------------------------------------
# BPE multi-regex pretokenizers
# ---------------------------------------------------------------------------


def test_regex_split_sequential():
    import regex as re

    from eagle_tpu.tokenizer.bpe import regex_split

    pats = [re.compile("[\r\n]"), re.compile(r"\p{N}+")]
    assert regex_split("ab12\ncd3", pats) == ["ab", "12", "\n", "cd", "3"]


def test_starcoder_digit_splitting():
    from eagle_tpu.tokenizer.bpe import _PRE_REGEX_LISTS, regex_split
    import regex as re

    pats = [re.compile(p) for p in _PRE_REGEX_LISTS["starcoder"]]
    # starcoder splits every digit individually BEFORE the gpt2 pattern
    assert regex_split("x 123", pats) == ["x", " ", "1", "2", "3"]


def test_pre_aliases_resolve():
    from eagle_tpu.tokenizer.bpe import _PRE_REGEX_LISTS

    for name in ("llama-bpe", "dbrx", "stablelm2", "command-r", "olmo",
                  "deepseek-r1-qwen", "tekken", "falcon"):
        assert name in _PRE_REGEX_LISTS
