"""Engine state serialization — the llama_state_{save,load}_file equivalent
(src/llama-context.cpp:1935-2066): persist/restore a generation or speculation
session (KV cache + counters + RNG) so prompts can be cached across process
restarts (the reference's --prompt-cache / server slot save-restore).

Format: numpy .npz with a JSON header. Arrays come back via device_put."""

from __future__ import annotations

import dataclasses
import io
import json
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .kvcache import KVCache
from .speculative import SpecState

MAGIC = "eagle_tpu_state_v1"


def _flatten_state(state) -> tuple[dict[str, np.ndarray], dict]:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = {"magic": MAGIC, "n_leaves": len(leaves), "type": type(state).__name__}
    return arrays, meta


def save_state(state, path: str | Path, extra: dict | None = None):
    """Serialize any pytree state (SpecState, KVCache, ...) to `path`."""
    arrays, meta = _flatten_state(state)
    if extra:
        meta["extra"] = extra
    buf = io.BytesIO()
    np.savez_compressed(buf, __meta__=np.frombuffer(json.dumps(meta).encode(), np.uint8), **arrays)
    Path(path).write_bytes(buf.getvalue())


def load_state(template, path: str | Path):
    """Restore a state saved by save_state; `template` supplies the pytree
    structure (e.g. engine.fresh_state()). Returns (state, extra_meta)."""
    with np.load(Path(path), allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta.get("magic") != MAGIC:
            raise ValueError(f"{path}: not an eagle_tpu state file")
        leaves, treedef = jax.tree_util.tree_flatten(template)
        if meta["n_leaves"] != len(leaves):
            raise ValueError(
                f"{path}: state has {meta['n_leaves']} leaves, template has {len(leaves)}"
            )
        new_leaves = []
        for i, tmpl in enumerate(leaves):
            arr = z[f"leaf_{i}"]
            if tuple(arr.shape) != tuple(tmpl.shape):
                raise ValueError(f"leaf {i}: shape {arr.shape} != template {tmpl.shape}")
            new_leaves.append(jnp.asarray(arr, dtype=tmpl.dtype))
        state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return state, meta.get("extra", {})
