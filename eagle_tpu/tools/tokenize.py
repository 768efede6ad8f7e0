"""llama-tokenize equivalent: print the token stream for a prompt.

Reference: examples/tokenize (CLI dump of ids + pieces)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    from ..utils.args import build_parser

    ap = build_parser("tokenize")
    ap.add_argument("-f", "--file", default=None)
    ap.add_argument("--ids", action="store_true", help="ids only, one line")
    ap.add_argument("--no-bos", action="store_true")
    args = ap.parse_args(argv)

    from ..gguf.reader import GGUFReader
    from ..tokenizer.bpe import tokenizer_from_gguf_metadata

    text = args.prompt if args.prompt is not None else open(args.file).read()
    tok = tokenizer_from_gguf_metadata(GGUFReader(args.model).metadata)
    ids = tok.encode(text, add_bos=not args.no_bos)
    if args.ids:
        print(" ".join(str(i) for i in ids))
        return 0
    for i in ids:
        piece = tok.decode([i])
        print(f"{i:>8} -> {piece!r}")
    print(f"# {len(ids)} tokens", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
