"""Offline GGUF requantization tool — the llama-quantize equivalent.

Reads a GGUF (typically F16/F32), rewrites tensor payloads in a target scheme.
Per-tensor type rules follow llama_model_quantize_impl's shape
(src/llama-quant.cpp): 1-D tensors and norms stay F32, output.weight gets a
higher-precision type, K-quants fall back when row sizes don't divide 256.

Usage: python -m eagle_tpu.tools.quantize in.gguf out.gguf Q4_K_M
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from ..gguf.constants import GGMLType, LlamaFtype
from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter
from ..quant.blocks import dequantize, quantize

# ftype name -> (default type, output.weight type, embeddings type)
SCHEMES = {
    "Q4_0": (GGMLType.Q4_0, GGMLType.Q6_K, GGMLType.Q4_0),
    "Q4_1": (GGMLType.Q4_1, GGMLType.Q6_K, GGMLType.Q4_1),
    "Q5_0": (GGMLType.Q5_0, GGMLType.Q6_K, GGMLType.Q5_0),
    "Q5_1": (GGMLType.Q5_1, GGMLType.Q6_K, GGMLType.Q5_1),
    "Q8_0": (GGMLType.Q8_0, GGMLType.Q8_0, GGMLType.Q8_0),
    "Q2_K": (GGMLType.Q2_K, GGMLType.Q6_K, GGMLType.Q2_K),
    "Q2_K_S": (GGMLType.Q2_K, GGMLType.Q6_K, GGMLType.Q2_K),
    "Q3_K_S": (GGMLType.Q3_K, GGMLType.Q6_K, GGMLType.Q3_K),
    "Q3_K_M": (GGMLType.Q3_K, GGMLType.Q6_K, GGMLType.Q3_K),
    "Q3_K_L": (GGMLType.Q3_K, GGMLType.Q6_K, GGMLType.Q5_K),
    "Q4_K_S": (GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q4_K),
    "Q4_K_M": (GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q4_K),
    "Q5_K_S": (GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q5_K),
    "Q5_K_M": (GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q5_K),
    "Q6_K": (GGMLType.Q6_K, GGMLType.Q6_K, GGMLType.Q6_K),
    "IQ4_NL": (GGMLType.IQ4_NL, GGMLType.Q6_K, GGMLType.IQ4_NL),
    "IQ4_XS": (GGMLType.IQ4_XS, GGMLType.Q6_K, GGMLType.IQ4_XS),
    "F16": (GGMLType.F16, GGMLType.F16, GGMLType.F16),
}

FTYPE_IDS = {
    "Q4_0": LlamaFtype.MOSTLY_Q4_0,
    "Q4_1": LlamaFtype.MOSTLY_Q4_1,
    "Q5_0": LlamaFtype.MOSTLY_Q5_0,
    "Q5_1": LlamaFtype.MOSTLY_Q5_1,
    "Q8_0": LlamaFtype.MOSTLY_Q8_0,
    "Q2_K": LlamaFtype.MOSTLY_Q2_K,
    "Q2_K_S": LlamaFtype.MOSTLY_Q2_K_S,
    "Q3_K_S": LlamaFtype.MOSTLY_Q3_K_S,
    "Q3_K_M": LlamaFtype.MOSTLY_Q3_K_M,
    "Q3_K_L": LlamaFtype.MOSTLY_Q3_K_L,
    "Q4_K_S": LlamaFtype.MOSTLY_Q4_K_S,
    "Q4_K_M": LlamaFtype.MOSTLY_Q4_K_M,
    "Q5_K_S": LlamaFtype.MOSTLY_Q5_K_S,
    "Q5_K_M": LlamaFtype.MOSTLY_Q5_K_M,
    "Q6_K": LlamaFtype.MOSTLY_Q6_K,
    "IQ4_NL": LlamaFtype.MOSTLY_IQ4_NL,
    "IQ4_XS": LlamaFtype.MOSTLY_IQ4_XS,
    "F16": LlamaFtype.MOSTLY_F16,
}

# In the _M ("medium") variants llama.cpp bumps attn_v (and the first/last
# ffn_down layers) to a higher-precision type (llama-quant.cpp
# llama_tensor_get_type); we apply the same to attn_v.
_M_BUMP = {
    "Q2_K": GGMLType.Q4_K,
    "Q2_K_S": GGMLType.Q4_K,
    "Q3_K_M": GGMLType.Q5_K,
    "Q3_K_L": GGMLType.Q5_K,
    "Q4_K_M": GGMLType.Q6_K,
    "Q5_K_M": GGMLType.Q6_K,
}


def pick_type(name: str, shape: tuple[int, ...], scheme: str) -> GGMLType:
    default, out_t, emb_t = SCHEMES[scheme]
    if len(shape) != 2:
        return GGMLType.F32
    if name.endswith(("_norm.weight", "norm.weight")) or "norm" in name.split(".")[-2:][0]:
        return GGMLType.F32
    t = default
    if name == "output.weight":
        t = out_t
    elif name == "token_embd.weight":
        t = emb_t
    elif name.endswith("attn_v.weight") and scheme in _M_BUMP:
        t = _M_BUMP[scheme]
    # K-quant fallback for odd row sizes
    from ..models.hf_convert import fallback_qtype

    return fallback_qtype(t, shape[-1]) if t not in (GGMLType.F16, GGMLType.F32) else t


def quantize_gguf(
    src: str | Path,
    dst: str | Path,
    scheme: str = "Q4_K_M",
    search: bool = False,
    imatrix_path: str | Path | None = None,
) -> dict:
    imatrix = None
    if imatrix_path:
        from .imatrix import load_imatrix

        imatrix = load_imatrix(imatrix_path)
    reader = GGUFReader(src)
    writer = GGUFWriter(dst)
    for key, val in reader.metadata.items():
        if key == "general.file_type":
            writer.add(key, int(FTYPE_IDS[scheme]))
        else:
            writer.add(key, val)
    if "general.file_type" not in reader.metadata:
        writer.add("general.file_type", int(FTYPE_IDS[scheme]))

    stats = {"tensors": 0, "bytes_in": 0, "bytes_out": 0}
    for name, info in reader.tensors.items():
        f32 = dequantize(reader.tensor_bytes(name), info.ggml_type, info.shape)
        target = pick_type(name, info.shape, scheme)
        if (search or imatrix is not None) and target in (GGMLType.Q4_K, GGMLType.Q5_K):
            from ..quant.kquant_search import quantize_q4_k_search, quantize_q5_k_search
            from .imatrix import imatrix_for

            im = imatrix_for(name, imatrix) if imatrix is not None else None
            enc = quantize_q4_k_search if target == GGMLType.Q4_K else quantize_q5_k_search
            packed = enc(f32, imatrix=im)
            writer.add_tensor(name, packed.astype(np.uint8), target, raw_shape=info.shape)
        else:
            writer.add_tensor(name, f32, target)
        stats["tensors"] += 1
        stats["bytes_in"] += info.nbytes
        stats["bytes_out"] += writer._tensors[-1][3].nbytes
    writer.write()
    reader.close()
    return stats


def main(argv=None):
    from ..utils.args import build_parser

    ap = build_parser("quantize", description=__doc__)
    ap.add_argument("src", help="input GGUF")
    ap.add_argument("dst", help="output GGUF")
    ap.add_argument("scheme", nargs="?", default="Q4_K_M",
                    help="quantization scheme (Q4_K_M, Q4_0, Q8_0, ...)")
    ap.add_argument("--imatrix", default=None,
                    help="importance matrix from tools.imatrix")
    ap.add_argument("--search", action="store_true",
                    help="per-tensor search over candidate types")
    args = ap.parse_args(argv)
    stats = quantize_gguf(args.src, args.dst, args.scheme, search=args.search,
                          imatrix_path=args.imatrix)
    print(
        f"quantized {stats['tensors']} tensors: "
        f"{stats['bytes_in']/1e6:.1f}MB -> {stats['bytes_out']/1e6:.1f}MB ({args.scheme})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
