"""RWKV "world" tokenizer — greedy longest-match over raw bytes.
llm_tokenizer_rwkv (src/llama-vocab.cpp:1114-1164) + token unescaping
(llama_unescape_rwkv_token, :1060): vocab entries are escaped byte strings
(\\t, \\n, \\\\, \\xNN); tokenization walks a byte trie taking the longest
match, emitting UNK for unmatched single bytes."""

from __future__ import annotations

from dataclasses import dataclass

from ..gguf.constants import Keys, TokenType


def unescape_rwkv_token(escaped: str) -> bytes:
    out = bytearray()
    it = iter(escaped)
    for c in it:
        if c == "\\":
            e = next(it, "")
            if e == "t":
                out.append(9)
            elif e == "n":
                out.append(10)
            elif e == "\\":
                out.append(92)
            elif e == "x":
                h1 = next(it, "0")
                h2 = next(it, "0")
                out.append(int(h1 + h2, 16))
            else:
                out.extend(e.encode("utf-8"))
        else:
            out.extend(c.encode("utf-8"))
    return bytes(out)


@dataclass
class RWKVTokenizer:
    tokens: list[str]
    token_types: list[int]
    bos_id: int = -1
    eos_id: int = 0
    unk_id: int = 0
    add_bos: bool = False
    add_eos: bool = False

    def __post_init__(self):
        # byte trie: node = {byte: child}, values at node[-1]
        self._pieces = [unescape_rwkv_token(t) for t in self.tokens]
        self.trie: dict = {}
        for tid, piece in enumerate(self._pieces):
            if not piece:
                continue
            node = self.trie
            for b in piece:
                node = node.setdefault(b, {})
            node[-1] = tid

    @property
    def vocab_size(self) -> int:
        return len(self.tokens)

    def encode(self, text: str, add_bos: bool | None = None,
               add_eos: bool | None = None, parse_special: bool = True) -> list[int]:
        data = text.encode("utf-8")
        out: list[int] = []
        pos = 0
        while pos < len(data):
            node = self.trie.get(data[pos])
            if node is None:
                out.append(self.unk_id)
                pos += 1
                continue
            best_id, best_len = None, pos + 1
            p = pos + 1
            while node is not None:
                if -1 in node:
                    best_id, best_len = node[-1], p
                node = node.get(data[p]) if p < len(data) else None
                p += 1
            if best_id is None:
                out.append(self.unk_id)
                pos += 1
            else:
                out.append(best_id)
                pos = best_len
        return out

    def decode(self, ids, skip_special: bool = False) -> str:
        buf = bytearray()
        for tid in ids:
            if 0 <= tid < len(self._pieces):
                if skip_special and self.token_types[tid] == TokenType.CONTROL:
                    continue
                buf.extend(self._pieces[tid])
        return buf.decode("utf-8", errors="replace")

    def piece(self, tid: int) -> str:
        try:
            return self._pieces[tid].decode("utf-8")
        except (UnicodeDecodeError, IndexError):
            return ""

    @staticmethod
    def from_gguf_metadata(md: dict) -> "RWKVTokenizer":
        tokens = list(md[Keys.Tokenizer.LIST])
        ttypes = [int(t) for t in md.get(Keys.Tokenizer.TOKEN_TYPE, [1] * len(tokens))]
        return RWKVTokenizer(
            tokens=tokens, token_types=ttypes,
            bos_id=int(md.get(Keys.Tokenizer.BOS_ID, -1)),
            eos_id=int(md.get(Keys.Tokenizer.EOS_ID, 0)),
            unk_id=int(md.get(Keys.Tokenizer.UNK_ID, 0)),
        )
