"""GGUF container writer.

Produces GGUF v3 files readable by both this framework and llama.cpp
(format facts: ggml/src/gguf.cpp write path). Used by the quantize tool, the
HF->GGUF converter, and test fixtures."""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Any, Sequence

import numpy as np

from .constants import (
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGUF_VERSION,
    GGMLType,
    GGUFValueType,
    ggml_row_bytes,
)

_SCALAR_PACK = {
    GGUFValueType.UINT8: "<B",
    GGUFValueType.INT8: "<b",
    GGUFValueType.UINT16: "<H",
    GGUFValueType.INT16: "<h",
    GGUFValueType.UINT32: "<I",
    GGUFValueType.INT32: "<i",
    GGUFValueType.FLOAT32: "<f",
    GGUFValueType.UINT64: "<Q",
    GGUFValueType.INT64: "<q",
    GGUFValueType.FLOAT64: "<d",
}

_NP_TO_VTYPE = {
    np.dtype(np.uint8): GGUFValueType.UINT8,
    np.dtype(np.int8): GGUFValueType.INT8,
    np.dtype(np.uint16): GGUFValueType.UINT16,
    np.dtype(np.int16): GGUFValueType.INT16,
    np.dtype(np.uint32): GGUFValueType.UINT32,
    np.dtype(np.int32): GGUFValueType.INT32,
    np.dtype(np.float32): GGUFValueType.FLOAT32,
    np.dtype(np.uint64): GGUFValueType.UINT64,
    np.dtype(np.int64): GGUFValueType.INT64,
    np.dtype(np.float64): GGUFValueType.FLOAT64,
}


def _infer_vtype(value: Any) -> GGUFValueType:
    if isinstance(value, bool) or isinstance(value, np.bool_):
        return GGUFValueType.BOOL
    if isinstance(value, str):
        return GGUFValueType.STRING
    if isinstance(value, (int, np.integer)):
        return GGUFValueType.UINT32 if 0 <= int(value) < 2**32 else GGUFValueType.INT64
    if isinstance(value, (float, np.floating)):
        return GGUFValueType.FLOAT32
    if isinstance(value, (list, tuple, np.ndarray)):
        return GGUFValueType.ARRAY
    raise TypeError(f"cannot infer GGUF value type for {type(value)}")


class GGUFWriter:
    def __init__(self, path: str | Path, alignment: int = GGUF_DEFAULT_ALIGNMENT):
        self.path = Path(path)
        self.alignment = alignment
        self._kv: list[tuple[str, GGUFValueType, Any]] = []
        self._tensors: list[tuple[str, GGMLType, tuple[int, ...], np.ndarray]] = []

    # -- metadata -----------------------------------------------------------

    def add(self, key: str, value: Any, vtype: GGUFValueType | None = None):
        self._kv.append((key, vtype if vtype is not None else _infer_vtype(value), value))

    # -- tensors ------------------------------------------------------------

    def add_tensor(
        self,
        name: str,
        data: np.ndarray,
        ggml_type: GGMLType | None = None,
        raw_shape: Sequence[int] | None = None,
    ):
        """Add a tensor.

        If `data` is float and `ggml_type` is a quantized/float type, it is
        encoded; if `data` is uint8 it is taken as pre-packed bytes and
        `raw_shape` (numpy convention) must be given.
        """
        from ..quant.blocks import quantize

        if data.dtype == np.uint8 and ggml_type is not None:
            shape = tuple(raw_shape)  # packed payload
            packed = data.reshape(-1)
        else:
            if ggml_type is None:
                ggml_type = {
                    np.dtype(np.float32): GGMLType.F32,
                    np.dtype(np.float16): GGMLType.F16,
                    np.dtype(np.int32): GGMLType.I32,
                }.get(data.dtype)
                if ggml_type is None:
                    raise TypeError(f"no default ggml type for dtype {data.dtype}")
            shape = tuple(data.shape)
            if ggml_type == GGMLType.I32:
                packed = np.ascontiguousarray(data, dtype="<i4").view(np.uint8).reshape(-1)
            else:
                packed = quantize(np.asarray(data, dtype=np.float32), ggml_type)
        expected = ggml_row_bytes(ggml_type, int(np.prod(shape)) if shape else 1)
        if packed.nbytes != expected:
            raise ValueError(f"tensor {name}: payload {packed.nbytes} != expected {expected}")
        self._tensors.append((name, ggml_type, shape, packed))

    # -- serialization ------------------------------------------------------

    def _write_string(self, f, s: str):
        raw = s.encode("utf-8")
        f.write(struct.pack("<Q", len(raw)))
        f.write(raw)

    def _write_value(self, f, vtype: GGUFValueType, value: Any):
        if vtype == GGUFValueType.STRING:
            self._write_string(f, value)
        elif vtype == GGUFValueType.BOOL:
            f.write(struct.pack("<B", 1 if value else 0))
        elif vtype == GGUFValueType.ARRAY:
            if isinstance(value, np.ndarray) and value.dtype in _NP_TO_VTYPE:
                elem_t = _NP_TO_VTYPE[value.dtype]
                f.write(struct.pack("<IQ", int(elem_t), value.size))
                f.write(np.ascontiguousarray(value).astype(value.dtype.newbyteorder("<")).tobytes())
            else:
                seq = list(value)
                elem_t = _infer_vtype(seq[0]) if seq else GGUFValueType.UINT32
                # promote int arrays containing any negative to INT32
                if elem_t == GGUFValueType.UINT32 and any(
                    isinstance(v, (int, np.integer)) and int(v) < 0 for v in seq
                ):
                    elem_t = GGUFValueType.INT32
                f.write(struct.pack("<IQ", int(elem_t), len(seq)))
                for v in seq:
                    self._write_value(f, elem_t, v)
        else:
            f.write(struct.pack(_SCALAR_PACK[vtype], value))

    def write(self):
        with open(self.path, "wb") as f:
            f.write(struct.pack("<IIqq", GGUF_MAGIC, GGUF_VERSION, len(self._tensors), len(self._kv)))
            for key, vtype, value in self._kv:
                self._write_string(f, key)
                f.write(struct.pack("<I", int(vtype)))
                self._write_value(f, vtype, value)

            offset = 0
            offsets = []
            for name, ggml_type, shape, packed in self._tensors:
                self._write_string(f, name)
                dims = tuple(reversed(shape))  # back to ggml innermost-first
                f.write(struct.pack("<I", len(dims)))
                for d in dims:
                    f.write(struct.pack("<Q", d))
                f.write(struct.pack("<I", int(ggml_type)))
                offsets.append(offset)
                f.write(struct.pack("<Q", offset))
                offset += packed.nbytes + (-packed.nbytes % self.alignment)

            pad = -f.tell() % self.alignment
            f.write(b"\x00" * pad)
            for (name, ggml_type, shape, packed), off in zip(self._tensors, offsets):
                f.write(packed.tobytes())
                f.write(b"\x00" * (-packed.nbytes % self.alignment))
