"""Byte-level BPE tokenizer from GGUF vocab metadata (GPT-2/llama-3 style).

Counterpart of llm_tokenizer_bpe (src/llama-vocab.cpp): regex pretokenization
(per-model patterns, tokenizer.ggml.pre), gpt2 byte-to-unicode mapping, then
rank-based pair merging with the tokenizer.ggml.merges table."""

from __future__ import annotations

from dataclasses import dataclass

import regex as _re

from ..gguf.constants import Keys, TokenType

# gpt2-style printable byte mapping
def _bytes_to_unicode() -> dict[int, str]:
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_BYTE_ENC = _bytes_to_unicode()
_BYTE_DEC = {v: k for k, v in _BYTE_ENC.items()}

# pretokenizer regex LISTS keyed by tokenizer.ggml.pre. Regex strings are
# format data mirrored from llama.cpp's tokenizer_pre dispatch
# (src/llama-vocab.cpp:279-400) — they must match byte-for-byte for token
# parity. Multiple regexes apply SEQUENTIALLY: each one further splits the
# not-yet-matched spans (unicode_regex_split semantics).
_GPT2 = r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
_LLAMA3 = r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
_QWEN2 = r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""

_PRE_REGEX_LISTS: dict[str, list[str]] = {
    "default": [_GPT2],
    "gpt-2": [_GPT2],
    "llama3": [_LLAMA3],
    "qwen2": [_QWEN2],
    "falcon": [
        r"""[\p{P}\$\+<=>\^~\|`]+""",
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)""",
        r"""[0-9][0-9][0-9]""",
    ],
    "starcoder": [
        r"""\p{N}""",
        _GPT2,
    ],
    "deepseek-llm": [
        "[\r\n]",
        r"""\s?[A-Za-zµÀ-ÖØ-öø-ƺƼ-ƿǄ-ʓʕ-ʯͰ-ͳͶͷͻ-ͽͿΆΈ-ΊΌΎ-ΡΣ-ϵϷ-ҁҊ-ԯԱ-ՖႠ-ჅᎠ-Ᏽᏸ-ᏽᲐ-ᲺᲽ-Ჿᴀ-ᴫᵫ-ᵷᵹ-ᶚḀ-ἕἘ-Ἕἠ-ὅὈ-Ὅὐ-ὗὙὛὝὟ-ώᾀ-ᾴᾶ-ᾼιῂ-ῄῆ-ῌῐ-ΐῖ-Ίῠ-Ῥῲ-ῴῶ-ῼℂℇℊ-ℓℕℙ-ℝℤΩℨK-ℭℯ-ℴℹℼ-ℿⅅ-ⅉⅎↃↄⰀ-ⱻⱾ-ⳤⳫ-ⳮⳲⳳꙀ-ꙭꚀ-ꚛꜢ-ꝯꝱ-ꞇꞋ-ꞎꭰ-ꮿﬀ-ﬆﬓ-ﬗＡ-Ｚａ-ｚ𐐀-𐑏𐒰-𐓓𐓘-𐓻𐲀-𐲲𐳀-𐳲𑢠-𑣟𞤀-𞥃]+""",
        r"""\s?[!-/:-~！-／：-～‘-‟　-。]+""",
        r"""\s+$""",
        r"""[一-龥ࠀ-一가-퟿]+""",
        r"""\p{N}+""",
    ],
    "deepseek-coder": [
        "[\r\n]",
        r"""\s?\p{L}+""",
        r"""\s?\p{P}+""",
        r"""[一-龥ࠀ-一가-퟿]+""",
        r"""\p{N}""",
    ],
    "deepseek-v3": [
        r"""\p{N}{1,3}""",
        r"""[一-龥぀-ゟ゠-ヿ]+""",
        "[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~][A-Za-z]+|[^\r\n\\p{L}\\p{P}\\p{S}]?[\\p{L}\\p{M}]+| ?[\\p{P}\\p{S}]+[\r\n]*|\\s*[\r\n]+|\\s+(?!\\S)|\\s+",
    ],
    "poro-chat": [r""" ?[^(\s|.,!?…。，、।۔،)]+"""],
    "viking": [r""" ?[^(\s|.,!?…。，、।۔،)]+""", r"""\p{N}"""],
    "chatglm-bpe": [_LLAMA3],
    "tekken": [
        r"""[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+|[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+|\s+(?!\S)|\s+""",
    ],
    "chameleon": [
        r"""<sentinel:[0-9]+>""",
        r"""(IMGIMG)((A|B|C|D|E|F|G|H|I){1,4})Z""",
        "([\\t\\n]|    |  )",
        r"""\p{N}""",
        _GPT2,
    ],
}
# aliases sharing another family's pattern list (llama-vocab.cpp case labels)
for _alias, _canon in {
    "llama-v3": "llama3", "llama-bpe": "llama3", "dbrx": "llama3",
    "smaug-bpe": "llama3", "falcon3": "llama3", "pixtral": "llama3",
    "stablelm2": "qwen2", "refact": "starcoder", "command-r": "starcoder",
    "smollm": "starcoder", "codeshell": "starcoder", "exaone": "starcoder",
    "minerva-7b": "starcoder", "megrez": "qwen2",
    "gpt2": "gpt-2", "mpt": "gpt-2", "olmo": "gpt-2", "jais": "gpt-2",
    "phi-2": "gpt-2", "bloom": "poro-chat", "gpt3-finnish": "poro-chat",
    "gigachat": "deepseek-v3", "deepseek-r1-qwen": "deepseek-llm",
}.items():
    _PRE_REGEX_LISTS[_alias] = _PRE_REGEX_LISTS[_canon]


def regex_split(text: str, patterns: list) -> list[str]:
    """Sequential regex splitting (unicode.cpp unicode_regex_split): each
    pattern splits the still-unmatched spans; matched spans become atomic
    pieces. Returns all pieces in order (matched and residual)."""
    segments: list[tuple[str, bool]] = [(text, False)]
    for pat in patterns:
        out: list[tuple[str, bool]] = []
        for seg, final in segments:
            if final or not seg:
                if seg:
                    out.append((seg, final))
                continue
            last = 0
            for m in pat.finditer(seg):
                if m.start() > last:
                    out.append((seg[last:m.start()], False))
                if m.group():
                    out.append((m.group(), True))
                last = m.end()
            if last < len(seg):
                out.append((seg[last:], False))
        segments = out
    return [s for s, _ in segments if s]


@dataclass
class BPETokenizer:
    tokens: list[str]
    merges: list[str]
    token_types: list[int]
    pre: str = "default"
    bos_id: int = 1
    eos_id: int = 2
    add_bos: bool = False
    add_eos: bool = False

    def __post_init__(self):
        self.token_to_id = {t: i for i, t in enumerate(self.tokens)}
        self.ranks = {}
        for i, m in enumerate(self.merges):
            a, b = m.split(" ", 1)
            self.ranks[(a, b)] = i
        patterns = _PRE_REGEX_LISTS.get(self.pre, _PRE_REGEX_LISTS["default"])
        self._pre_res = [_re.compile(p) for p in patterns]
        self.special_tokens = {
            t: i
            for i, (t, tt) in enumerate(zip(self.tokens, self.token_types))
            if tt in (TokenType.CONTROL, TokenType.USER_DEFINED)
        }

    @property
    def vocab_size(self) -> int:
        return len(self.tokens)

    # ------------------------------------------------------------------

    def _bpe_word(self, word: str) -> list[int]:
        parts = list(word)
        while len(parts) > 1:
            best, best_rank = None, None
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            parts[best : best + 2] = [parts[best] + parts[best + 1]]
        out = []
        for p in parts:
            tid = self.token_to_id.get(p)
            if tid is not None:
                out.append(tid)
            else:  # decompose to single mapped bytes
                for ch in p:
                    out.append(self.token_to_id.get(ch, 0))
        return out

    def encode(self, text: str, add_bos: bool | None = None, add_eos: bool | None = None, parse_special: bool = True) -> list[int]:
        add_bos = self.add_bos if add_bos is None else add_bos
        add_eos = self.add_eos if add_eos is None else add_eos
        fragments: list[tuple[bool, str]] = [(False, text)]
        if parse_special and self.special_tokens:
            for sp in sorted(self.special_tokens, key=len, reverse=True):
                new_frags = []
                for is_tok, frag in fragments:
                    if is_tok:
                        new_frags.append((is_tok, frag))
                        continue
                    parts = frag.split(sp)
                    for pi, part in enumerate(parts):
                        if pi > 0:
                            new_frags.append((True, sp))
                        if part:
                            new_frags.append((False, part))
                    if not parts or (len(parts) == 1 and parts[0] == frag and frag == ""):
                        pass
                fragments = new_frags
        ids: list[int] = []
        if add_bos and self.bos_id >= 0:
            ids.append(self.bos_id)
        for is_tok, frag in fragments:
            if is_tok:
                ids.append(self.special_tokens[frag])
                continue
            for piece in regex_split(frag, self._pre_res):
                mapped = "".join(_BYTE_ENC[b] for b in piece.encode("utf-8"))
                ids.extend(self._bpe_word(mapped))
        if add_eos and self.eos_id >= 0:
            ids.append(self.eos_id)
        return ids

    def decode(self, ids, skip_special: bool = False) -> str:
        buf = bytearray()
        for tid in ids:
            if not (0 <= tid < len(self.tokens)):
                continue
            tt = self.token_types[tid]
            piece = self.tokens[tid]
            if tt == TokenType.CONTROL:
                if not skip_special:
                    buf.extend(piece.encode("utf-8"))
                continue
            for ch in piece:
                b = _BYTE_DEC.get(ch)
                if b is None:
                    buf.extend(ch.encode("utf-8"))
                else:
                    buf.append(b)
        return buf.decode("utf-8", errors="replace")

    def piece(self, tid: int) -> str:
        tt = self.token_types[tid]
        if tt in (TokenType.CONTROL, TokenType.UNKNOWN):
            return ""
        buf = bytearray()
        for ch in self.tokens[tid]:
            b = _BYTE_DEC.get(ch)
            if b is None:
                buf.extend(ch.encode("utf-8"))
            else:
                buf.append(b)
        try:
            return buf.decode("utf-8")
        except UnicodeDecodeError:
            return ""

    # ------------------------------------------------------------------

    @staticmethod
    def from_gguf_metadata(md: dict) -> "BPETokenizer":
        tokens = list(md[Keys.Tokenizer.LIST])
        return BPETokenizer(
            tokens=tokens,
            merges=list(md.get(Keys.Tokenizer.MERGES, [])),
            token_types=[int(t) for t in md.get(Keys.Tokenizer.TOKEN_TYPE, [1] * len(tokens))],
            pre=str(md.get(Keys.Tokenizer.PRE, "default")),
            bos_id=int(md.get(Keys.Tokenizer.BOS_ID, 1)),
            eos_id=int(md.get(Keys.Tokenizer.EOS_ID, 2)),
            add_bos=bool(md.get(Keys.Tokenizer.ADD_BOS, False)),
            add_eos=bool(md.get(Keys.Tokenizer.ADD_EOS, False)),
        )


def tokenizer_from_gguf_metadata(md: dict):
    """Factory over the five tokenizer families (include/llama.h:69-74 vocab
    types): SPM, BPE, WPM (bert), UGM (t5), RWKV."""
    model = md.get(Keys.Tokenizer.MODEL, "llama")
    if model in ("llama", "spm"):
        from .spm import SPMTokenizer

        return SPMTokenizer.from_gguf_metadata(md)
    if model in ("gpt2", "bpe"):
        return BPETokenizer.from_gguf_metadata(md)
    if model in ("bert", "wpm"):
        from .wpm import WPMTokenizer

        return WPMTokenizer.from_gguf_metadata(md)
    if model in ("t5", "ugm"):
        from .ugm import UGMTokenizer

        return UGMTokenizer.from_gguf_metadata(md)
    if model == "rwkv":
        from .rwkv import RWKVTokenizer

        return RWKVTokenizer.from_gguf_metadata(md)
    raise NotImplementedError(f"tokenizer model {model!r}")
