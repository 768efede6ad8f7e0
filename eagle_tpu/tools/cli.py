"""Command-line generation — the llama-cli equivalent (examples/main).

Usage:
  python -m eagle_tpu.tools.cli -m model.gguf -p "prompt" [-n 128]
      [--draft eagle.gguf] [--tree 4,2,2] [--temp 0.8] [--top-k 40] ...
"""

from __future__ import annotations

import argparse
import sys
import time


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser("eagle-tpu cli")
    ap.add_argument("-m", "--model", required=True, help="target GGUF path")
    ap.add_argument("-p", "--prompt", default="Hello")
    ap.add_argument("-n", "--n-predict", type=int, default=128)
    ap.add_argument("--draft", default=None, help="EAGLE draft GGUF (enables speculation)")
    ap.add_argument("--n-draft", type=int, default=5, help="chain draft length")
    ap.add_argument("--tree", default=None, help="tree branching factors, e.g. 4,2,2")
    ap.add_argument("--tree2", default=None, metavar="BEAM,DEPTH,NVERIFY",
                    help="EAGLE-2 dynamic draft tree, e.g. 8,6,32")
    ap.add_argument("--lookahead", default=None, metavar="W,N,G",
                    help="model-free lookahead decoding (examples/lookahead), e.g. 8,4,8")
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--lora", default=None, help="LoRA adapter GGUF (merged at load)")
    ap.add_argument("--lora-scale", type=float, default=None)
    ap.add_argument("--grammar", default=None, help="GBNF grammar constraining output")
    ap.add_argument("--json-schema", default=None, help="JSON schema constraining output")
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--min-p", type=float, default=0.05)
    ap.add_argument("--repeat-penalty", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backend", default=None, choices=[None, "xla", "pallas"])
    ap.add_argument("--feature-source", default="pre_norm", choices=["pre_norm", "post_norm"])
    ap.add_argument("--chat", action="store_true",
                    help="interactive conversation mode (main.cpp -cnv): chat-"
                         "template formatting + KV reuse across turns")
    ap.add_argument("--system", default=None, help="system prompt (chat mode)")
    ap.add_argument("--chat-template", default=None,
                    help="force a template family (default: detect from GGUF)")
    ap.add_argument("--jinja", action="store_true",
                    help="execute the GGUF's embedded jinja template")
    return ap


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
    from ..runtime.sampling import SamplerConfig

    sampler = SamplerConfig(
        temperature=args.temp,
        greedy=args.temp <= 0,
        top_k=args.top_k,
        top_p=args.top_p,
        min_p=args.min_p,
        penalty_repeat=args.repeat_penalty,
    )
    cfg = EngineConfig(
        model_path=args.model,
        draft_path=args.draft,
        lora_path=args.lora,
        lora_scale=args.lora_scale,
        n_draft=args.n_draft,
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
        args.prompt, max_new_tokens=args.n_predict, sampler=sampler, seed=args.seed,
        grammar=args.grammar, json_schema=args.json_schema,
    )
    dt = time.time() - t0
    print(text)
    n = len(eng.tokenizer.encode(text, add_bos=False))
    print(f"[perf] {dt:.2f}s", file=sys.stderr)
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
