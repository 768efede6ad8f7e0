"""Logging framework (common/log.cpp equivalent, 393 LoC in the reference):
asynchronous ring-buffered handler, ANSI colors, relative timestamps,
--log-file support, and env-var configuration.

The reference pushes log entries into a ring and drains them on a dedicated
thread so hot loops never block on stderr (common/log.cpp); here a
QueueHandler/QueueListener pair gives the same property. Levels mirror
LOG_ERR/WRN/INF/DBG; env vars mirror the LLAMA_LOG_* knobs:

  EAGLE_LOG_LEVEL    = error|warn|info|debug   (default info)
  EAGLE_LOG_FILE     = path (append)           (default: stderr only)
  EAGLE_LOG_COLORS   = 0|1                     (default: tty detection)
  EAGLE_LOG_TIMESTAMPS = 0|1                   (default 1)
"""

from __future__ import annotations

import atexit
import logging
import logging.handlers
import os
import queue
import sys
import time

_COLORS = {
    logging.DEBUG: "\x1b[90m",
    logging.INFO: "",
    logging.WARNING: "\x1b[33m",
    logging.ERROR: "\x1b[31m",
}
_RESET = "\x1b[0m"
_START = time.time()
_LISTENER: logging.handlers.QueueListener | None = None


class _Formatter(logging.Formatter):
    def __init__(self, color: bool, timestamps: bool):
        super().__init__()
        self.color = color
        self.timestamps = timestamps

    def format(self, record: logging.LogRecord) -> str:
        lvl = {"DEBUG": "D", "INFO": "I", "WARNING": "W", "ERROR": "E",
               "CRITICAL": "E"}.get(record.levelname, "?")
        ts = f"{record.created - _START:10.3f} " if self.timestamps else ""
        msg = record.getMessage()
        line = f"{lvl} {ts}{record.name}: {msg}"
        if self.color:
            c = _COLORS.get(record.levelno, "")
            if c:
                line = f"{c}{line}{_RESET}"
        return line


def setup_logging(level: str | None = None, log_file: str | None = None,
                  colors: bool | None = None) -> None:
    """Install the async ring-buffer pipeline on the package root logger.
    Safe to call more than once (reconfigures)."""
    global _LISTENER
    level = level or os.environ.get("EAGLE_LOG_LEVEL", "info")
    log_file = log_file or os.environ.get("EAGLE_LOG_FILE")
    if colors is None:
        env = os.environ.get("EAGLE_LOG_COLORS")
        colors = sys.stderr.isatty() if env is None else env == "1"
    timestamps = os.environ.get("EAGLE_LOG_TIMESTAMPS", "1") == "1"
    lv = {"error": logging.ERROR, "warn": logging.WARNING, "info": logging.INFO,
          "debug": logging.DEBUG}.get(level.lower(), logging.INFO)

    root = logging.getLogger("eagle_tpu")
    for h in list(root.handlers):
        root.removeHandler(h)
    _stop_listener()

    sinks: list[logging.Handler] = []
    err = logging.StreamHandler(sys.stderr)
    err.setFormatter(_Formatter(colors, timestamps))
    sinks.append(err)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(_Formatter(False, timestamps))
        sinks.append(fh)

    q: queue.Queue = queue.Queue(-1)  # unbounded ring; producers never block
    root.addHandler(logging.handlers.QueueHandler(q))
    root.setLevel(lv)
    root.propagate = False
    _LISTENER = logging.handlers.QueueListener(q, *sinks, respect_handler_level=False)
    _LISTENER.start()


def _stop_listener() -> None:
    """Stop + clear the drain thread (idempotent)."""
    global _LISTENER
    lst, _LISTENER = _LISTENER, None
    if lst is not None and lst._thread is not None:
        lst.stop()


atexit.register(_stop_listener)


def get_logger(name: str = "") -> logging.Logger:
    base = logging.getLogger("eagle_tpu")
    if not base.handlers:
        setup_logging()
    return base.getChild(name) if name else base
