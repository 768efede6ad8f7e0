"""GGUF container reader — mmap-backed, zero-copy tensor access.

Functionally equivalent to the reference's gguf loader (ggml/src/gguf.cpp and
src/llama-model-loader.cpp): parse typed KV metadata and the tensor index, then
expose each tensor's packed bytes as a numpy view over a memory map. Quantized
tensors stay packed; dequantization/repacking happens downstream
(eagle_tpu.quant)."""

from __future__ import annotations

import mmap
import struct
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import numpy as np

from .constants import (
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGMLType,
    GGUFValueType,
    ggml_row_bytes,
)

_SCALAR_FMT = {
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

_SCALAR_NP = {
    GGUFValueType.UINT8: np.uint8,
    GGUFValueType.INT8: np.int8,
    GGUFValueType.UINT16: np.uint16,
    GGUFValueType.INT16: np.int16,
    GGUFValueType.UINT32: np.uint32,
    GGUFValueType.INT32: np.int32,
    GGUFValueType.FLOAT32: np.float32,
    GGUFValueType.UINT64: np.uint64,
    GGUFValueType.INT64: np.int64,
    GGUFValueType.FLOAT64: np.float64,
}


@dataclass
class GGUFTensorInfo:
    name: str
    ggml_type: GGMLType
    #: logical shape in numpy (row-major) convention: last axis is the
    #: contiguous row (= ggml ne[0]); i.e. the reverse of on-disk dims order.
    shape: tuple[int, ...]
    offset: int  # relative to the start of the data section
    nbytes: int = field(default=0)

    @property
    def n_elements(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1


class _Cursor:
    def __init__(self, buf: memoryview):
        self.buf = buf
        self.pos = 0

    def read_fmt(self, fmt: str):
        size = struct.calcsize(fmt)
        vals = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += size
        return vals[0] if len(vals) == 1 else vals

    def read_string(self) -> str:
        n = self.read_fmt("<Q")
        raw = bytes(self.buf[self.pos : self.pos + n])
        self.pos += n
        return raw.decode("utf-8", errors="replace")

    def read_value(self, vtype: GGUFValueType) -> Any:
        if vtype == GGUFValueType.STRING:
            return self.read_string()
        if vtype == GGUFValueType.BOOL:
            return bool(self.read_fmt("<B"))
        if vtype == GGUFValueType.ARRAY:
            elem_type = GGUFValueType(self.read_fmt("<I"))
            count = self.read_fmt("<Q")
            if elem_type in _SCALAR_NP and count > 0:
                dt = np.dtype(_SCALAR_NP[elem_type]).newbyteorder("<")
                nbytes = dt.itemsize * count
                arr = np.frombuffer(self.buf, dtype=dt, count=count, offset=self.pos).copy()
                self.pos += nbytes
                return arr
            return [self.read_value(elem_type) for _ in range(count)]
        return self.read_fmt(_SCALAR_FMT[vtype])


class GGUFReader:
    """Read-only view of a GGUF file.

    Attributes:
        metadata: dict of key -> value (numpy arrays for numeric arrays)
        tensors: dict of name -> GGUFTensorInfo
    """

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._file = open(self.path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        buf = memoryview(self._mm)
        cur = _Cursor(buf)

        magic = cur.read_fmt("<I")
        if magic != GGUF_MAGIC:
            raise ValueError(f"{path}: not a GGUF file (magic {magic:#x})")
        self.version = cur.read_fmt("<I")
        if self.version not in (2, 3):
            raise ValueError(f"{path}: unsupported GGUF version {self.version}")
        n_tensors = cur.read_fmt("<q")
        n_kv = cur.read_fmt("<q")

        self.metadata: dict[str, Any] = {}
        for _ in range(n_kv):
            key = cur.read_string()
            vtype = GGUFValueType(cur.read_fmt("<I"))
            self.metadata[key] = cur.read_value(vtype)

        self.alignment = int(self.metadata.get("general.alignment", GGUF_DEFAULT_ALIGNMENT))

        self.tensors: dict[str, GGUFTensorInfo] = {}
        order: list[GGUFTensorInfo] = []
        for _ in range(n_tensors):
            name = cur.read_string()
            n_dims = cur.read_fmt("<I")
            dims = [cur.read_fmt("<Q") for _ in range(n_dims)]
            ggml_type = GGMLType(cur.read_fmt("<I"))
            offset = cur.read_fmt("<Q")
            shape = tuple(reversed(dims))  # ggml ne[] is innermost-first
            info = GGUFTensorInfo(name=name, ggml_type=ggml_type, shape=shape, offset=offset)
            info.nbytes = ggml_row_bytes(ggml_type, info.n_elements)
            self.tensors[name] = info
            order.append(info)

        data_start = cur.pos
        pad = -data_start % self.alignment
        self.data_offset = data_start + pad
        self._buf = buf

    def tensor_bytes(self, name: str) -> np.ndarray:
        """Packed bytes of a tensor as a zero-copy uint8 view."""
        info = self.tensors[name]
        start = self.data_offset + info.offset
        return np.frombuffer(self._buf, dtype=np.uint8, count=info.nbytes, offset=start)

    def tensor_f32(self, name: str) -> np.ndarray:
        """Dequantized tensor (float32, numpy convention shape)."""
        from ..quant.blocks import dequantize

        info = self.tensors[name]
        return dequantize(self.tensor_bytes(name), info.ggml_type, info.shape)

    def close(self):
        self._buf = None
        try:
            self._mm.close()
        except BufferError:
            # zero-copy tensor views are still alive; the mapping is released
            # when they are garbage-collected
            pass
        self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
