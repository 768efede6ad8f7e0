"""llama-retrieval equivalent (examples/retrieval): chunk text files, embed
every chunk, then answer interactive/one-shot queries by cosine top-k."""

from __future__ import annotations

import argparse
import sys

import numpy as np


def chunk_texts(files: list[str], chunk_size: int, separator: str) -> list[str]:
    chunks = []
    for path in files:
        buf = ""
        for part in open(path).read().split(separator):
            buf += part + separator
            if len(buf) >= chunk_size:
                chunks.append(buf.strip())
                buf = ""
        if buf.strip():
            chunks.append(buf.strip())
    return chunks


def main(argv=None):
    from ..utils.args import build_parser

    ap = build_parser("retrieval")
    ap.add_argument("--context-files", nargs="+", required=True)
    ap.add_argument("--chunk-size", type=int, default=200)
    ap.add_argument("--chunk-separator", default="\n")
    ap.add_argument("--top-k", type=int, default=3)
    ap.add_argument("-q", "--query", default=None, help="one-shot query (else stdin loop)")
    args = ap.parse_args(argv)

    from ..api import Engine, EngineConfig

    eng = Engine(EngineConfig(model_path=args.model, max_seq=args.ctx,
                              backend=args.backend))
    chunks = chunk_texts(args.context_files, args.chunk_size, args.chunk_separator)
    print(f"# embedding {len(chunks)} chunks", file=sys.stderr)
    emb = np.stack(eng.embed(chunks))  # normalized rows

    def answer(query: str):
        qv = eng.embed([query])[0]
        sims = emb @ qv
        for rank, idx in enumerate(np.argsort(-sims)[: args.top_k]):
            print(f"[{rank}] sim={sims[idx]:.4f}\n{chunks[idx]}\n")

    if args.query is not None:
        answer(args.query)
        return 0
    for line in sys.stdin:
        if line.strip():
            answer(line.strip())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
