"""Shared CLI argument plumbing (common/arg.cpp equivalent): one place for
the flags every tool shares, with environment-variable fallbacks mirroring
the reference's LLAMA_ARG_* convention (EAGLE_ARG_<NAME>)."""

from __future__ import annotations

import argparse
import os


def env_default(name: str, default=None, cast=str):
    """Default from EAGLE_ARG_<NAME> (the reference reads LLAMA_ARG_* in
    common_params_parse, common/arg.cpp)."""
    v = os.environ.get(f"EAGLE_ARG_{name.upper().replace('-', '_')}")
    if v is None:
        return default
    if cast is bool:
        return v not in ("0", "false", "")
    return cast(v)


def add_model_args(ap: argparse.ArgumentParser, model_required: bool = True):
    ap.add_argument("-m", "--model", required=model_required and env_default("model") is None,
                    default=env_default("model"), help="GGUF path [EAGLE_ARG_MODEL]")
    ap.add_argument("--ctx", type=int, default=env_default("ctx", 2048, int),
                    help="context length [EAGLE_ARG_CTX]")
    ap.add_argument("--backend", default=env_default("backend"),
                    choices=[None, "xla", "pallas"], help="[EAGLE_ARG_BACKEND]")
    return ap


def add_sampling_args(ap: argparse.ArgumentParser):
    ap.add_argument("--temp", type=float, default=env_default("temp", 0.8, float))
    ap.add_argument("--top-k", type=int, default=env_default("top_k", 40, int))
    ap.add_argument("--top-p", type=float, default=env_default("top_p", 0.95, float))
    ap.add_argument("--min-p", type=float, default=env_default("min_p", 0.05, float))
    ap.add_argument("--seed", type=int, default=env_default("seed", 0, int))
    return ap


def add_log_args(ap: argparse.ArgumentParser):
    ap.add_argument("--log-level", default=env_default("log_level"),
                    choices=[None, "error", "warn", "info", "debug"])
    ap.add_argument("--log-file", default=env_default("log_file"))
    return ap


def apply_log_args(args):
    from .logging import setup_logging

    if getattr(args, "log_level", None) or getattr(args, "log_file", None):
        setup_logging(level=args.log_level, log_file=args.log_file)
