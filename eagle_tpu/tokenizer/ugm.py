"""Unigram (UGM) tokenizer — T5/mT5 family. llm_tokenizer_ugm
(src/llama-vocab.cpp:710-1000): SentencePiece unigram Viterbi over token
scores.

Normalization: the reference replays sentencepiece's precompiled charsmap
(XCDA trie); here the charsmap transformations are approximated by NFKC
normalization plus the space conventions (escape to U+2581, optional dummy
prefix, whitespace collapsing) — byte-exact for ASCII/latin text, which the
tests pin down. Viterbi semantics match the reference: user-defined tokens
score 0, unknown codepoints take min_score - 10 per merged UNK run."""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass

from ..gguf.constants import Keys, TokenType

_SPACE = "▁"
_UNK_PENALTY = 10.0


@dataclass
class UGMTokenizer:
    tokens: list[str]
    scores: list[float]
    token_types: list[int]
    bos_id: int = -1
    eos_id: int = 2
    unk_id: int = 0
    add_bos: bool = False
    add_eos: bool = True
    add_space_prefix: bool = True
    remove_extra_whitespaces: bool = True

    def __post_init__(self):
        self.token_to_id: dict[str, int] = {}
        self.user_defined: set[str] = set()
        normal = (TokenType.NORMAL, TokenType.USER_DEFINED, TokenType.UNUSED)
        min_score = float("inf")
        for i, (t, tt) in enumerate(zip(self.tokens, self.token_types)):
            if tt in normal:
                self.token_to_id.setdefault(t, i)
            if tt == TokenType.NORMAL:
                min_score = min(min_score, self.scores[i])
            if tt == TokenType.USER_DEFINED:
                self.user_defined.add(t)
        self.min_score = 0.0 if min_score == float("inf") else min_score
        self.unknown_score = self.min_score - _UNK_PENALTY
        self.max_token_len = max((len(t) for t in self.token_to_id), default=1)

    @property
    def vocab_size(self) -> int:
        return len(self.tokens)

    # ------------------------------------------------------------------

    def normalize(self, text: str) -> str:
        s = unicodedata.normalize("NFKC", text)
        if self.remove_extra_whitespaces:
            s = " ".join(p for p in s.split(" ") if p != "")
        if self.add_space_prefix and s:
            s = " " + s
        return s.replace(" ", _SPACE)

    def _token_score(self, tid: int) -> float:
        # user-defined tokens are forced attractive (score 0, reference rule)
        if self.token_types[tid] == TokenType.USER_DEFINED:
            return 0.0
        return self.scores[tid]

    def encode(self, text: str, add_bos: bool | None = None,
               add_eos: bool | None = None, parse_special: bool = True) -> list[int]:
        add_bos = self.add_bos if add_bos is None else add_bos
        add_eos = self.add_eos if add_eos is None else add_eos
        s = self.normalize(text)
        n = len(s)
        # Viterbi: best[i] = (score, token_id, prev_index) for prefix s[:i]
        NEG = float("-inf")
        best_score = [NEG] * (n + 1)
        best_tok = [self.unk_id] * (n + 1)
        best_prev = [0] * (n + 1)
        best_score[0] = 0.0
        for i in range(n):
            if best_score[i] == NEG:
                continue
            matched_one_char = False
            for j in range(i + 1, min(n, i + self.max_token_len) + 1):
                tid = self.token_to_id.get(s[i:j])
                if tid is None:
                    continue
                if j == i + 1:
                    matched_one_char = True
                sc = best_score[i] + self._token_score(tid)
                if sc > best_score[j]:
                    best_score[j] = sc
                    best_tok[j] = tid
                    best_prev[j] = i
            if not matched_one_char:
                # unknown codepoint: consume one char as UNK
                sc = best_score[i] + self.unknown_score
                if sc > best_score[i + 1]:
                    best_score[i + 1] = sc
                    best_tok[i + 1] = self.unk_id
                    best_prev[i + 1] = i
        # backtrack (merging adjacent UNKs, reference behavior)
        rev: list[int] = []
        i = n
        while i > 0:
            tid = best_tok[i]
            if rev and tid == self.unk_id and rev[-1] == self.unk_id:
                pass  # merge consecutive unknowns
            else:
                rev.append(tid)
            i = best_prev[i]
        ids = rev[::-1]
        if add_bos and self.bos_id >= 0:
            ids.insert(0, self.bos_id)
        if add_eos and self.eos_id >= 0:
            ids.append(self.eos_id)
        return ids

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
            if tt == TokenType.UNKNOWN:
                continue
            parts.append(self.tokens[tid].replace(_SPACE, " "))
        text = "".join(parts)
        if self.add_space_prefix and text.startswith(" "):
            text = text[1:]
        return text

    def piece(self, tid: int) -> str:
        if self.token_types[tid] in (TokenType.CONTROL, TokenType.UNKNOWN):
            return ""
        return self.tokens[tid].replace(_SPACE, " ")

    @staticmethod
    def from_gguf_metadata(md: dict) -> "UGMTokenizer":
        tokens = list(md[Keys.Tokenizer.LIST])
        scores = [float(x) for x in md.get(Keys.Tokenizer.SCORES, [0.0] * len(tokens))]
        ttypes = [int(t) for t in md.get(Keys.Tokenizer.TOKEN_TYPE, [1] * len(tokens))]
        return UGMTokenizer(
            tokens=tokens, scores=scores, token_types=ttypes,
            bos_id=int(md.get(Keys.Tokenizer.BOS_ID, -1)),
            eos_id=int(md.get(Keys.Tokenizer.EOS_ID, 2)),
            unk_id=int(md.get(Keys.Tokenizer.UNK_ID, 0)),
            add_bos=bool(md.get(Keys.Tokenizer.ADD_BOS, False)),
            add_eos=bool(md.get(Keys.Tokenizer.ADD_EOS, True)),
            add_space_prefix=bool(md.get(Keys.Tokenizer.ADD_SPACE_PREFIX, True)),
        )
