"""Device mesh construction.

The reference's multi-device story is graph-splitting across backends plus a
TCP RPC offload backend (ggml-backend.cpp:861, ggml-rpc.cpp) — no collectives.
The TPU-native replacement is SPMD: a 2-D ("data", "model") mesh over ICI,
weights/KV tensor-sharded on "model" (Megatron-style column/row parallel, the
analogue of llama.cpp's --split-mode row done properly), batch sharded on
"data", with XLA GSPMD inserting/overlapping the collectives."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(
    n_data: int | None = None,
    n_model: int | None = None,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_model is None:
        n_model = n if n_data is None else n // n_data
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, f"{n_data}x{n_model} != {n} devices"
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def named(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)
