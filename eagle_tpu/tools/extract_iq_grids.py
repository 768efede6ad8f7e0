"""One-time extraction of the IQ-format codebook grids into iq_grids.npz.

The IQ1/IQ2/IQ3 GGUF block formats quantize weights as indices into fixed
codebooks (E8-lattice / sign-constrained grids). The grids are part of the
on-disk format definition — any decoder MUST reproduce them bit-exactly
(same situation as the GGUF enum values and the k-quant bit layouts:
interoperability data, not creative code). This script parses them out of
the format's canonical definition (ggml/src/ggml-common.h GGML_TABLE blocks,
lines 512-1588) and stores them as a committed binary artifact so the
runtime never needs the reference tree.

Usage: python -m eagle_tpu.tools.extract_iq_grids /path/to/ggml-common.h
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

TABLES = {
    "iq2xxs_grid": np.uint64,
    "iq2xs_grid": np.uint64,
    "iq2s_grid": np.uint64,
    "iq3xxs_grid": np.uint32,
    "iq3s_grid": np.uint32,
    "iq1s_grid": np.uint64,
}


def extract(common_h: Path) -> dict[str, np.ndarray]:
    text = common_h.read_text()
    out = {}
    for name, dtype in TABLES.items():
        m = re.search(
            rf"GGML_TABLE_BEGIN\(\w+,\s*{name},\s*\w+\)(.*?)GGML_TABLE_END\(\)",
            text,
            re.S,
        )
        if not m:
            raise SystemExit(f"table {name} not found in {common_h}")
        vals = [int(v, 16) for v in re.findall(r"0x[0-9a-fA-F]+", m.group(1))]
        out[name] = np.array(vals, dtype=dtype)
    return out


def main():
    src = Path(
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/llama.cpp/ggml/src/ggml-common.h"
    )
    grids = extract(src)
    for name, arr in grids.items():
        print(f"{name}: {arr.shape[0]} entries, {arr.dtype}")
    dst = Path(__file__).parent.parent / "quant" / "iq_grids.npz"
    np.savez_compressed(dst, **grids)
    print(f"wrote {dst} ({dst.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
