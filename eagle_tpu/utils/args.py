"""Unified declarative argument registry — the common/arg.cpp equivalent.

The reference declares every CLI option ONCE in a 228-entry table
(common/arg.cpp: add_opt(common_arg(...))), each entry carrying its flags,
help, handler, an optional LLAMA_ARG_* environment fallback, and a per-binary
mask (set_examples({LLAMA_EXAMPLE_MAIN, ...})). Binaries then materialize
only the options in their mask, and the server's per-request JSON overrides
read the same parameter names.

Same design here: `REGISTRY` is the single declarative table of `Opt` rows —
flags, type/default/choices/help, an EAGLE_ARG_<NAME> env fallback
(resolution: explicit CLI > environment > declared default), and a `tools`
mask (None = common to every tool). `build_parser(tool)` materializes a
tool's argparse parser from the table; `sampler_from_args` /
`sampler_from_request` derive SamplerConfigs from the SAME sampling rows for
the CLI and the server's per-request overrides respectively."""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Any


@dataclasses.dataclass(frozen=True)
class Opt:
    """One declarative option row (the common_arg equivalent)."""

    flags: tuple[str, ...]
    help: str = ""
    type: Any = None
    default: Any = None
    choices: tuple | None = None
    action: str | None = None  # "store_true" / "store_false"
    metavar: str | None = None
    nargs: Any = None
    required: bool = False
    #: tool-name mask; None = common (every tool). Mirrors set_examples().
    tools: tuple[str, ...] | None = None
    exclude: tuple[str, ...] = ()
    #: EAGLE_ARG_<NAME> fallback (LLAMA_ARG_* convention); None disables
    env: str | None = ""

    @property
    def dest(self) -> str:
        long = next((f for f in self.flags if f.startswith("--")), self.flags[-1])
        return long.lstrip("-").replace("-", "_")

    @property
    def env_name(self) -> str | None:
        if self.env is None:
            return None
        name = self.env or self.dest
        return f"EAGLE_ARG_{name.upper()}"

    def resolve_default(self):
        """Environment fallback: EAGLE_ARG_<NAME> overrides the declared
        default (but never an explicit CLI value)."""
        if self.env_name is None:
            return self.default
        v = os.environ.get(self.env_name)
        if v is None:
            return self.default
        if self.action in ("store_true", "store_false"):
            return v not in ("0", "false", "")
        cast = self.type or str
        return cast(v)


def _t(*names):
    return tuple(names)


#: every tool that materializes options from the registry
TOOLS = (
    "cli", "server", "bench", "perplexity", "quantize", "convert",
    "tokenize", "imatrix", "retrieval", "llava", "tts", "gguf",
)

REGISTRY: tuple[Opt, ...] = (
    # ---- model / runtime (common) ----------------------------------------
    Opt(("-m", "--model"), "target GGUF path", required=True,
        tools=_t("cli", "server", "perplexity", "tokenize", "imatrix",
                 "retrieval", "llava", "tts")),
    Opt(("--ctx",), "context length", type=int, default=2048,
        tools=_t("cli", "server", "perplexity", "retrieval", "llava")),
    Opt(("--backend",), "compute backend", choices=(None, "xla", "pallas")),
    Opt(("--lora",), "LoRA adapter GGUF (merged at load)",
        tools=_t("cli", "server")),
    Opt(("--lora-scale",), "LoRA alpha override", type=float,
        tools=_t("cli", "server")),
    # ---- speculation ------------------------------------------------------
    Opt(("--draft",), "EAGLE draft GGUF (enables speculation)",
        tools=_t("cli", "server", "bench")),
    Opt(("--n-draft",), "chain draft length", type=int, default=5,
        tools=_t("cli", "server", "bench")),
    Opt(("--cycles-per-dispatch",), "speculative cycles chained per program "
        "dispatch (amortizes the host-device round trip over C cycles)",
        type=int, default=1, tools=_t("cli", "server")),
    Opt(("--tree",), "tree branching factors, e.g. 4,2,2",
        tools=_t("cli", "server")),
    Opt(("--tree2",), "EAGLE-2 dynamic draft tree, e.g. 8,6,32",
        metavar="BEAM,DEPTH,NVERIFY", tools=_t("cli", "bench")),
    Opt(("--lookahead",), "model-free lookahead decoding (W,N,G)",
        metavar="W,N,G", tools=_t("cli",)),
    Opt(("--feature-source",), "EAGLE feature tap", default="pre_norm",
        choices=("pre_norm", "post_norm"), tools=_t("cli", "server")),
    # ---- sampling (the server's per-request overrides read these rows) ----
    Opt(("--temp",), "sampling temperature", type=float, default=0.8,
        tools=_t("cli", "server")),
    Opt(("--top-k",), "top-k", type=int, default=40, tools=_t("cli", "server")),
    Opt(("--top-p",), "top-p", type=float, default=0.95, tools=_t("cli", "server")),
    Opt(("--min-p",), "min-p", type=float, default=0.05, tools=_t("cli", "server")),
    Opt(("--repeat-penalty",), "repetition penalty", type=float, default=1.0,
        tools=_t("cli", "server")),
    Opt(("--seed",), "sampling seed", type=int, default=0,
        tools=_t("cli", "perplexity")),
    # ---- generation / prompt ---------------------------------------------
    Opt(("-p", "--prompt"), "prompt text", tools=_t("cli", "tokenize")),
    Opt(("-n", "--n-predict"), "tokens to generate", type=int, default=128,
        tools=_t("cli",)),
    Opt(("--grammar",), "GBNF grammar constraining output", tools=_t("cli", "server")),
    Opt(("--json-schema",), "JSON schema constraining output", tools=_t("cli",)),
    Opt(("--prompt-cache",), "session file: save/resume the prompt's KV state "
        "(main.cpp --prompt-cache)", tools=_t("cli",)),
    Opt(("--prompt-cache-all",), "also cache generated output in the session",
        action="store_true", tools=_t("cli",)),
    # ---- chat -------------------------------------------------------------
    Opt(("--chat",), "interactive conversation mode (llama-cli -cnv)",
        action="store_true", tools=_t("cli",)),
    Opt(("--system",), "system prompt (chat mode)", tools=_t("cli",)),
    Opt(("--chat-template",), "built-in chat template name", tools=_t("cli",)),
    Opt(("--jinja",), "execute the GGUF's embedded jinja chat template",
        action="store_true", tools=_t("cli", "server")),
    # ---- server -----------------------------------------------------------
    Opt(("--host",), "bind address", default="0.0.0.0", tools=_t("server",)),
    Opt(("--port",), "port", type=int, default=8080, tools=_t("server",)),
    Opt(("--parallel", "-np"), "number of server slots (continuous batching)",
        type=int, default=1, tools=_t("server",), env="n_parallel"),
    Opt(("--paged",), "serve KV from a shared page pool with prefix reuse",
        action="store_true", tools=_t("server",)),
    Opt(("--kv-pages",), "page-pool size (< batch*ctx/page-size oversubscribes)",
        type=int, tools=_t("server",)),
    Opt(("--page-size",), "KV page size", type=int, default=64, tools=_t("server",)),
    # ---- perplexity -------------------------------------------------------
    Opt(("-f", "--file"), "evaluation text file", tools=_t("perplexity", "imatrix")),
    Opt(("--n-ctx",), "evaluation window", type=int, default=256,
        tools=_t("perplexity", "imatrix")),
    # ---- logging (common) -------------------------------------------------
    Opt(("--log-level",), "log verbosity",
        choices=(None, "error", "warn", "info", "debug")),
    Opt(("--log-file",), "log destination file"),
)


def build_parser(tool: str, prog: str | None = None,
                 description: str | None = None) -> argparse.ArgumentParser:
    """Materialize `tool`'s parser from the registry (common options + rows
    whose mask includes the tool), with EAGLE_ARG_* environment fallbacks
    resolved into the defaults. `required` rows are satisfied by their env
    variable when set."""
    assert tool in TOOLS, tool
    ap = argparse.ArgumentParser(prog or f"eagle-tpu {tool}", description=description)
    for opt in REGISTRY:
        if opt.tools is not None and tool not in opt.tools:
            continue
        if tool in opt.exclude:
            continue
        kw: dict[str, Any] = {"help": opt.help or None, "dest": opt.dest}
        default = opt.resolve_default()
        if opt.action:
            kw["action"] = opt.action
            if default is not None:
                kw["default"] = default
        else:
            kw.update(
                type=opt.type, default=default, choices=opt.choices,
                metavar=opt.metavar,
            )
            if opt.nargs is not None:
                kw["nargs"] = opt.nargs
            if opt.required and default is None:
                kw["required"] = True
            kw = {k: v for k, v in kw.items() if v is not None or k in ("default",)}
        env = opt.env_name
        if env and kw.get("help"):
            kw["help"] = f"{kw['help']} [{env}]"
        ap.add_argument(*opt.flags, **kw)
    return ap


# ---------------------------------------------------------------------------
# sampling: ONE parameter table for CLI flags and server per-request JSON
# (server.cpp:272-278 reads the same common_params_sampling fields)
# ---------------------------------------------------------------------------

#: request-JSON key -> (SamplerConfig field, cast). The JSON names follow the
#: reference server's API (temperature/top_k/top_p/min_p/repeat_penalty).
SAMPLING_REQUEST_KEYS = {
    "temperature": ("temperature", float),
    "top_k": ("top_k", int),
    "top_p": ("top_p", float),
    "min_p": ("min_p", float),
    "repeat_penalty": ("penalty_repeat", float),
}

#: CLI dest -> SamplerConfig field (the same parameters as flags)
SAMPLING_ARG_FIELDS = {
    "temp": "temperature",
    "top_k": "top_k",
    "top_p": "top_p",
    "min_p": "min_p",
    "repeat_penalty": "penalty_repeat",
}


def sampler_from_args(args):
    """SamplerConfig from parsed registry args (greedy iff temp <= 0)."""
    from ..runtime.sampling import SamplerConfig

    return SamplerConfig(
        **{f: getattr(args, d) for d, f in SAMPLING_ARG_FIELDS.items()},
        greedy=args.temp <= 0,
    )


def sampler_from_request(body: dict, default):
    """Per-request sampler overrides from server JSON — same table. The
    request's greediness is decided by the effective temperature (<= 0 means
    argmax), matching the reference server's params_from_json_cmpl."""
    upd = {}
    for key, (field, cast) in SAMPLING_REQUEST_KEYS.items():
        if key in body:
            upd[field] = cast(body[key])
    cfg = dataclasses.replace(default, **upd) if upd else default
    return dataclasses.replace(cfg, greedy=cfg.temperature <= 0.0)


# ---------------------------------------------------------------------------
# legacy helpers (pre-registry callers)
# ---------------------------------------------------------------------------


def env_default(name: str, default=None, cast=str):
    """Default from EAGLE_ARG_<NAME> (the reference reads LLAMA_ARG_* in
    common_params_parse, common/arg.cpp)."""
    v = os.environ.get(f"EAGLE_ARG_{name.upper().replace('-', '_')}")
    if v is None:
        return default
    if cast is bool:
        return v not in ("0", "false", "")
    return cast(v)


def apply_log_args(args):
    from .logging import setup_logging

    if getattr(args, "log_level", None) or getattr(args, "log_file", None):
        setup_logging(level=args.log_level, log_file=args.log_file)
