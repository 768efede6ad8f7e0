"""GGUF utility CLIs — llama.cpp's gguf/gguf-hash/gguf-split equivalents.

  python -m eagle_tpu.tools.gguf_tools dump  model.gguf [--tensors]
  python -m eagle_tpu.tools.gguf_tools hash  model.gguf
  python -m eagle_tpu.tools.gguf_tools split model.gguf out_prefix --max-tensors 64
  python -m eagle_tpu.tools.gguf_tools merge out.gguf shard1.gguf shard2.gguf ...
"""

from __future__ import annotations

import hashlib
import sys

import numpy as np

from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter


def dump(path: str, show_tensors: bool = False) -> int:
    r = GGUFReader(path)
    print(f"GGUF v{r.version}  kv={len(r.metadata)}  tensors={len(r.tensors)}  align={r.alignment}")
    for k, v in r.metadata.items():
        if isinstance(v, (list, np.ndarray)) and len(v) > 8:
            v = f"[{len(v)} items]"
        print(f"  {k} = {v}")
    if show_tensors:
        for name, info in r.tensors.items():
            print(f"  {name}: {info.ggml_type.name} {info.shape} {info.nbytes}B @{info.offset}")
    return 0


def hash_file(path: str) -> int:
    """Per-tensor + whole-model sha256 (llama-gguf-hash)."""
    r = GGUFReader(path)
    total = hashlib.sha256()
    for name in r.tensors:
        h = hashlib.sha256(r.tensor_bytes(name).tobytes()).hexdigest()
        total.update(bytes.fromhex(h))
        print(f"{h}  {name}")
    print(f"{total.hexdigest()}  TOTAL")
    return 0


def split(path: str, prefix: str, max_tensors: int = 128) -> int:
    """Split into shards <prefix>-00001-of-0000N.gguf (gguf-split layout:
    every shard carries the full metadata; tensors partitioned)."""
    r = GGUFReader(path)
    names = list(r.tensors)
    n_shards = (len(names) + max_tensors - 1) // max_tensors
    for s in range(n_shards):
        out = f"{prefix}-{s+1:05d}-of-{n_shards:05d}.gguf"
        w = GGUFWriter(out)
        for k, v in r.metadata.items():
            w.add(k, v)
        w.add("split.no", s)
        w.add("split.count", n_shards)
        w.add("split.tensors.count", len(names))
        for name in names[s * max_tensors : (s + 1) * max_tensors]:
            info = r.tensors[name]
            w.add_tensor(name, r.tensor_bytes(name), info.ggml_type, raw_shape=info.shape)
        w.write()
        print(f"wrote {out}")
    return 0


def merge(out: str, shards: list[str]) -> int:
    w = GGUFWriter(out)
    seen_meta = False
    for shard in shards:
        r = GGUFReader(shard)
        if not seen_meta:
            for k, v in r.metadata.items():
                if not k.startswith("split."):
                    w.add(k, v)
            seen_meta = True
        for name, info in r.tensors.items():
            w.add_tensor(name, r.tensor_bytes(name), info.ggml_type, raw_shape=info.shape)
    w.write()
    print(f"wrote {out}")
    return 0


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    cmd, rest = argv[0], argv[1:]
    if cmd == "dump":
        return dump(rest[0], "--tensors" in rest)
    if cmd == "hash":
        return hash_file(rest[0])
    if cmd == "split":
        mt = 128
        if "--max-tensors" in rest:
            mt = int(rest[rest.index("--max-tensors") + 1])
        return split(rest[0], rest[1], mt)
    if cmd == "merge":
        return merge(rest[0], rest[1:])
    print(__doc__)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
