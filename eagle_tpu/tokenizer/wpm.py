"""WordPiece tokenizer (BERT family) — llm_tokenizer_wpm
(src/llama-vocab.cpp:594-699).

Preprocess: NFD-normalize, lowercase, drop control chars, split on whitespace
and isolate punctuation / ASCII symbols / CJK chars as single-char words.
Encode: each word gets the phantom-space prefix (U+2581, as the GGUF BERT
vocabs store word-initial pieces), then greedy longest-match against the
vocab; a word with any unmatched position becomes a single UNK."""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass

from ..gguf.constants import Keys, TokenType

_PHANTOM = "▁"


def _is_chinese_char(cp: int) -> bool:
    # CJK ranges from llm_tokenizer_wpm_session::is_chinese_char
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F or 0x2B920 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
    )


@dataclass
class WPMTokenizer:
    tokens: list[str]
    token_types: list[int]
    bos_id: int = 101  # [CLS]
    eos_id: int = 102  # [SEP]
    unk_id: int = 100
    add_bos: bool = True
    add_eos: bool = True

    def __post_init__(self):
        self.token_to_id = {t: i for i, t in enumerate(self.tokens)}
        self.max_token_len = max((len(t) for t in self.tokens), default=1)

    @property
    def vocab_size(self) -> int:
        return len(self.tokens)

    # ------------------------------------------------------------------

    @staticmethod
    def preprocess(text: str) -> list[str]:
        words: list[str] = [""]
        for ch in unicodedata.normalize("NFD", text):
            cp = ord(ch)
            if ch.isspace():
                if words[-1]:
                    words.append("")
                continue
            cat = unicodedata.category(ch)
            if cp == 0 or cp == 0xFFFD or cat.startswith("C"):
                continue
            s = ch.lower()
            is_punct = cat.startswith("P")
            is_ascii_symbol = cp < 0x7F and cat.startswith("S")
            if is_punct or is_ascii_symbol or _is_chinese_char(cp):
                if words[-1]:
                    words.append("")
                words[-1] = s
                words.append("")
            else:
                words[-1] += s
        if not words[-1]:
            words.pop()
        return words

    def encode(self, text: str, add_bos: bool | None = None,
               add_eos: bool | None = None, parse_special: bool = True) -> list[int]:
        add_bos = self.add_bos if add_bos is None else add_bos
        add_eos = self.add_eos if add_eos is None else add_eos
        out: list[int] = []
        if add_bos and self.bos_id >= 0:
            out.append(self.bos_id)
        for word in self.preprocess(text):
            if not word:
                continue
            word1 = _PHANTOM + word
            n = len(word1)
            start = len(out)
            i = 0
            ok = True
            while i < n:
                matched = False
                for j in range(min(n, i + self.max_token_len + 1), i, -1):
                    tid = self.token_to_id.get(word1[i:j])
                    if tid is not None:
                        out.append(tid)
                        i = j
                        matched = True
                        break
                if not matched:
                    del out[start:]
                    ok = False
                    break
            if not ok or len(out) == start:
                out.append(self.unk_id)
        if add_eos and self.eos_id >= 0:
            out.append(self.eos_id)
        return out

    def decode(self, ids, skip_special: bool = False) -> str:
        parts = []
        for tid in ids:
            if not (0 <= tid < len(self.tokens)):
                continue
            tt = self.token_types[tid]
            if tt == TokenType.CONTROL:
                if not skip_special:
                    parts.append(self.tokens[tid])
                continue
            parts.append(self.tokens[tid].replace(_PHANTOM, " "))
        return "".join(parts).strip()

    def piece(self, tid: int) -> str:
        if self.token_types[tid] in (TokenType.CONTROL, TokenType.UNKNOWN):
            return ""
        return self.tokens[tid].replace(_PHANTOM, " ")

    @staticmethod
    def from_gguf_metadata(md: dict) -> "WPMTokenizer":
        tokens = list(md[Keys.Tokenizer.LIST])
        ttypes = [int(t) for t in md.get(Keys.Tokenizer.TOKEN_TYPE, [1] * len(tokens))]
        return WPMTokenizer(
            tokens=tokens,
            token_types=ttypes,
            bos_id=int(md.get(Keys.Tokenizer.BOS_ID, -1)),
            eos_id=int(md.get(Keys.Tokenizer.EOS_ID, -1)),
            unk_id=int(md.get(Keys.Tokenizer.UNK_ID, 0)),
            add_bos=bool(md.get(Keys.Tokenizer.ADD_BOS, True)),
            add_eos=bool(md.get(Keys.Tokenizer.ADD_EOS, True)),
        )
