"""Command-line generation — the llama-cli equivalent (examples/main).

Usage:
  python -m eagle_tpu.tools.cli -m model.gguf -p "prompt" [-n 128]
      [--draft eagle.gguf] [--tree 4,2,2] [--temp 0.8] [--top-k 40] ...
"""

from __future__ import annotations

import argparse
import sys
import time


def build_argparser():
    """Parser from the unified declarative registry (utils/args.py — the
    common/arg.cpp table; every flag resolves EAGLE_ARG_* env fallbacks)."""
    from ..utils.args import build_parser

    return build_parser("cli")


def chat_loop(eng, args, sampler) -> int:
    """The reference's interactive conversation loop (examples/main): each
    line from stdin is one user turn; only the template diff is fed (the
    cache keeps the shared history)."""
    session = eng.chat_session(system=args.system, template=args.chat_template,
                               use_jinja=args.jinja)
    print("== chat mode (ctrl-d or /exit to quit) ==", file=sys.stderr)
    while True:
        try:
            line = input("> ")
        except EOFError:
            break
        if line.strip() in ("/exit", "/quit"):
            break
        if not line.strip():
            continue
        t0 = time.time()
        n_tok = [0]

        def stream(tok_id, _n=n_tok):
            _n[0] += 1
            piece = eng.tokenizer.decode([tok_id], skip_special=True)
            print(piece, end="", flush=True)

        session.ask(line, max_new_tokens=args.n_predict, sampler=sampler,
                    seed=args.seed, on_token=stream)
        dt = time.time() - t0
        print(f"\n[perf] {n_tok[0]} tokens in {dt:.2f}s "
              f"({n_tok[0]/max(dt,1e-9):.1f} t/s, ctx {session.pos})",
              file=sys.stderr)
    return 0


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from ..api import Engine, EngineConfig
    from ..utils.args import apply_log_args, sampler_from_args

    apply_log_args(args)
    sampler = sampler_from_args(args)
    cfg = EngineConfig(
        model_path=args.model,
        draft_path=args.draft,
        lora_path=args.lora,
        lora_scale=args.lora_scale,
        n_draft=args.n_draft,
        cycles_per_dispatch=args.cycles_per_dispatch,
        tree_branching=tuple(int(x) for x in args.tree.split(",")) if args.tree else None,
        tree2=tuple(int(x) for x in args.tree2.split(",")) if args.tree2 else None,
        lookahead=tuple(int(x) for x in args.lookahead.split(",")) if args.lookahead else None,
        max_seq=args.ctx,
        backend=args.backend,
        feature_source=args.feature_source,
        sampler=sampler,
    )
    t0 = time.time()
    eng = Engine(cfg)
    print(f"[load] {time.time()-t0:.1f}s model={args.model}", file=sys.stderr)

    if args.chat:
        return chat_loop(eng, args, sampler)

    t0 = time.time()
    text, stats = eng.generate_text(
        args.prompt if args.prompt is not None else "Hello",
        max_new_tokens=args.n_predict, sampler=sampler, seed=args.seed,
        grammar=args.grammar, json_schema=args.json_schema,
        session_path=args.prompt_cache, session_cache_all=args.prompt_cache_all,
    )
    dt = time.time() - t0
    print(text)
    n = len(eng.tokenizer.encode(text, add_bos=False))
    print(f"[perf] {dt:.2f}s", file=sys.stderr)
    if stats and "session_prefix_reused" in stats:
        print(f"[session] reused {stats['session_prefix_reused']} cached prompt "
              f"tokens from {args.prompt_cache}", file=sys.stderr)
    if stats and "accept_rate" in stats:
        print(
            f"[speculative] accept_rate={stats['accept_rate']:.3f} "
            f"mean_accept_len={stats['mean_accept_len']:.2f} cycles={stats['n_cycles']}",
            file=sys.stderr,
        )
    if stats and "tokens_per_step" in stats:
        print(
            f"[lookahead] tokens_per_step={stats['tokens_per_step']:.2f} "
            f"n_accept={stats['n_accept']} steps={stats['n_steps']}",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
