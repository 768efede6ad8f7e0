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


def extract_seq_state(state: SpecState, slot: int) -> SpecState:
    """B=1 view of one sequence's full state (KV rows, counters, feature) —
    the llama_state_seq_get_data equivalent (src/llama-context.cpp:2075+)."""
    def kv_row(kv: KVCache) -> KVCache:
        return KVCache(
            k=kv.k[:, slot : slot + 1],
            v=kv.v[:, slot : slot + 1],
            slot_pos=kv.slot_pos[slot : slot + 1],
            k_scale=None if kv.k_scale is None else kv.k_scale[:, slot : slot + 1],
            v_scale=None if kv.v_scale is None else kv.v_scale[:, slot : slot + 1],
        )

    return SpecState(
        tgt_kv=kv_row(state.tgt_kv),
        dft_kv=kv_row(state.dft_kv),
        last_token=state.last_token[slot : slot + 1],
        feature=state.feature[slot : slot + 1],
        n_past=state.n_past[slot : slot + 1],
        key=state.key,
    )


def insert_seq_state(state: SpecState, sub: SpecState, slot: int) -> SpecState:
    """Write a B=1 sequence state into batch row `slot`
    (llama_state_seq_set_data): restores a saved prompt cache into any slot
    of any same-shaped engine."""
    def kv_put(full: KVCache, row: KVCache) -> KVCache:
        return KVCache(
            k=full.k.at[:, slot].set(row.k[:, 0]),
            v=full.v.at[:, slot].set(row.v[:, 0]),
            slot_pos=full.slot_pos.at[slot].set(row.slot_pos[0]),
            k_scale=None if full.k_scale is None
            else full.k_scale.at[:, slot].set(row.k_scale[:, 0]),
            v_scale=None if full.v_scale is None
            else full.v_scale.at[:, slot].set(row.v_scale[:, 0]),
        )

    return SpecState(
        tgt_kv=kv_put(state.tgt_kv, sub.tgt_kv),
        dft_kv=kv_put(state.dft_kv, sub.dft_kv),
        last_token=state.last_token.at[slot].set(sub.last_token[0]),
        feature=state.feature.at[slot].set(sub.feature[0]),
        n_past=state.n_past.at[slot].set(sub.n_past[0]),
        key=state.key,
    )


def save_seq_state(state: SpecState, slot: int, path: str | Path,
                   extra: dict | None = None):
    """Per-sequence save (llama_state_seq_save_file, server slot save
    server.cpp:3690)."""
    save_state(extract_seq_state(state, slot), path, extra=extra)


def load_seq_state(state: SpecState, slot: int, path: str | Path):
    """Per-sequence restore into `slot` (llama_state_seq_load_file, server
    slot restore server.cpp:3760). Returns (new_state, extra_meta)."""
    sub, extra = load_state(extract_seq_state(state, slot), path)
    return insert_seq_state(state, sub, slot), extra


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


# ---------------------------------------------------------------------------
# CLI prompt-cache sessions (main.cpp:235-253 --prompt-cache): token list +
# the KV rows they produced, reloaded next run and matched by longest token
# prefix so only the unseen tail is re-evaluated.
# ---------------------------------------------------------------------------

SESSION_MAGIC = "eagle_tpu_session_v1"


def _pack_np(a: np.ndarray) -> tuple[np.ndarray, str]:
    """npz-safe view: ml_dtypes (bfloat16, ...) are not serializable by
    np.save — store their bytes as uint8 with the dtype name on the side."""
    name = a.dtype.name
    if a.dtype in (np.float32, np.float16, np.int8, np.int32, np.int64, np.bool_):
        return a, name
    return a.view(np.uint8), name


def _unpack_np(a: np.ndarray, name: str) -> np.ndarray:
    if a.dtype.name == name:
        return a
    import ml_dtypes  # jax dependency — provides bfloat16 etc.

    return a.view(np.dtype(getattr(ml_dtypes, name)))


def save_prompt_session(path: str | Path, tokens, kv: KVCache, end: int):
    """Persist `tokens[:end]` and their KV rows (cache slots [0, end))."""
    end = int(min(end, kv.max_seq, len(tokens)))
    raw = {
        "tokens": np.asarray(tokens[:end], np.int32),
        "k": np.asarray(kv.k[:, :, :, :end]),
        "v": np.asarray(kv.v[:, :, :, :end]),
        "slot_pos": np.asarray(kv.slot_pos[:, :end]),
    }
    if kv.k_scale is not None:
        raw["k_scale"] = np.asarray(kv.k_scale[:, :, :, :end])
        raw["v_scale"] = np.asarray(kv.v_scale[:, :, :, :end])
    arrs, dtypes = {}, {}
    for name, a in raw.items():
        arrs[name], dtypes[name] = _pack_np(a)
    meta = {"magic": SESSION_MAGIC, "end": end, "dtypes": dtypes}
    buf = io.BytesIO()
    np.savez_compressed(
        buf, __meta__=np.frombuffer(json.dumps(meta).encode(), np.uint8), **arrs
    )
    Path(path).write_bytes(buf.getvalue())


def load_prompt_session(path: str | Path, kv_template: KVCache):
    """(tokens, arrays) from a session file, or None when the file is absent,
    malformed, or shaped for a different model/kv-dtype (the reference
    re-initializes on a bad session rather than failing the run)."""
    p = Path(path)
    if not p.exists() or p.stat().st_size == 0:
        return None
    try:
        z = np.load(io.BytesIO(p.read_bytes()))
        meta = json.loads(bytes(z["__meta__"]))
        if meta.get("magic") != SESSION_MAGIC:
            return None
        dtypes = meta.get("dtypes", {})
        arrs = {
            n: _unpack_np(z[n], dtypes.get(n, z[n].dtype.name))
            for n in z.files if n != "__meta__"
        }
        k = arrs["k"]
        ref = kv_template.k
        if (
            k.shape[:3] != ref.shape[:3]
            or k.shape[4:] != ref.shape[4:]
            or k.dtype != np.asarray(ref[:1, :1, :1, :1]).dtype
            or ("k_scale" in arrs) != (kv_template.k_scale is not None)
        ):
            return None
        return arrs["tokens"].tolist(), arrs
    except Exception:
        return None


def session_prefix_len(session_tokens, prompt) -> int:
    """Longest common prefix (main.cpp:312-318's matching walk)."""
    n = 0
    for a, b in zip(session_tokens, prompt):
        if int(a) != int(b):
            break
        n += 1
    return n


def insert_session_kv(kv: KVCache, arrs: dict, n: int) -> KVCache:
    """Place a session's first `n` KV rows into a fresh cache (tags included);
    rows >= n keep the fresh cache's empty (-1) tags."""
    n = int(min(n, arrs["k"].shape[3], kv.max_seq))

    def put(buf, saved):
        return buf.at[:, :, :, :n].set(jnp.asarray(saved[:, :, :, :n]))

    return dataclasses.replace(
        kv,
        k=put(kv.k, arrs["k"]),
        v=put(kv.v, arrs["v"]),
        slot_pos=kv.slot_pos.at[:, :n].set(jnp.asarray(arrs["slot_pos"][:, :n])),
        k_scale=None if kv.k_scale is None else put(kv.k_scale, arrs["k_scale"]),
        v_scale=None if kv.v_scale is None else put(kv.v_scale, arrs["v_scale"]),
    )
