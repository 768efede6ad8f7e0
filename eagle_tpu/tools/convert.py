"""HF checkpoint directory -> GGUF converter CLI.

The command-line face of models/hf_convert.py (the reference's
convert_hf_to_gguf.py): reads config.json + safetensors/bin weights +
tokenizer.json from a local HF directory and writes a GGUF with full
tokenizer metadata.

  python -m eagle_tpu.tools.convert /path/to/hf_model out.gguf [--qtype F16]
      [--arch llama|qwen2|eagle]

Tokenizer extraction supports HF-fast `tokenizer.json` for both BPE
(vocab+merges) and Unigram/SPM (vocab+scores); `tokenizer.model`
(sentencepiece protobuf) is parsed directly — no sentencepiece dependency.
"""

from __future__ import annotations

import json
import struct
import sys
from pathlib import Path

import numpy as np

from ..gguf.constants import GGMLType, Keys, TokenType


def _parse_sentencepiece_model(path: Path):
    """Minimal protobuf wire-format parse of a sentencepiece model: extract
    repeated SentencePiece {piece: 1, score: 2, type: 3} from field 1."""
    data = path.read_bytes()

    def read_varint(buf, i):
        out, shift = 0, 0
        while True:
            b = buf[i]
            i += 1
            out |= (b & 0x7F) << shift
            if not (b & 0x80):
                return out, i
            shift += 7

    tokens, scores, types = [], [], []
    i = 0
    while i < len(data):
        tag, i = read_varint(data, i)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # SentencePiece message
            ln, i = read_varint(data, i)
            end = i + ln
            piece, score, ptype = "", 0.0, 1
            while i < end:
                t2, i = read_varint(data, i)
                f2, w2 = t2 >> 3, t2 & 7
                if f2 == 1 and w2 == 2:
                    l2, i = read_varint(data, i)
                    piece = data[i : i + l2].decode("utf-8", errors="replace")
                    i += l2
                elif f2 == 2 and w2 == 5:
                    (score,) = struct.unpack("<f", data[i : i + 4])
                    i += 4
                elif f2 == 3 and w2 == 0:
                    ptype, i = read_varint(data, i)
                else:  # skip
                    if w2 == 0:
                        _, i = read_varint(data, i)
                    elif w2 == 2:
                        l2, i = read_varint(data, i)
                        i += l2
                    elif w2 == 5:
                        i += 4
                    else:
                        i += 8
            # sp types: 1=normal 2=unk 3=control 6=byte
            tmap = {1: TokenType.NORMAL, 2: TokenType.UNKNOWN, 3: TokenType.CONTROL,
                    4: TokenType.USER_DEFINED, 5: TokenType.UNUSED, 6: TokenType.BYTE}
            tokens.append(piece)
            scores.append(float(score))
            types.append(int(tmap.get(ptype, TokenType.NORMAL)))
        else:
            if wire == 0:
                _, i = read_varint(data, i)
            elif wire == 2:
                ln, i = read_varint(data, i)
                i += ln
            elif wire == 5:
                i += 4
            else:
                i += 8
    return tokens, scores, types


def extract_tokenizer_metadata(model_dir: Path) -> dict:
    md: dict = {}
    tk_json = model_dir / "tokenizer.json"
    sp_model = model_dir / "tokenizer.model"
    cfg = {}
    if (model_dir / "tokenizer_config.json").exists():
        cfg = json.loads((model_dir / "tokenizer_config.json").read_text())

    if sp_model.exists():
        tokens, scores, types = _parse_sentencepiece_model(sp_model)
        md[Keys.Tokenizer.MODEL] = "llama"
        md[Keys.Tokenizer.LIST] = tokens
        md[Keys.Tokenizer.SCORES] = np.asarray(scores, np.float32)
        md[Keys.Tokenizer.TOKEN_TYPE] = np.asarray(types, np.int32)
    elif tk_json.exists():
        tj = json.loads(tk_json.read_text())
        model = tj.get("model", {})
        if model.get("type") == "BPE":
            vocab = model["vocab"]
            tokens = [None] * len(vocab)
            for tok, idx in vocab.items():
                tokens[idx] = tok
            merges = model.get("merges", [])
            merges = [m if isinstance(m, str) else " ".join(m) for m in merges]
            types = [int(TokenType.NORMAL)] * len(tokens)
            for added in tj.get("added_tokens", []):
                if added["id"] < len(types) and added.get("special"):
                    types[added["id"]] = int(TokenType.CONTROL)
            md[Keys.Tokenizer.MODEL] = "gpt2"
            md[Keys.Tokenizer.LIST] = tokens
            md[Keys.Tokenizer.MERGES] = merges
            md[Keys.Tokenizer.TOKEN_TYPE] = np.asarray(types, np.int32)
        elif model.get("type") == "Unigram":
            pieces = model["vocab"]  # [piece, score]
            md[Keys.Tokenizer.MODEL] = "llama"
            md[Keys.Tokenizer.LIST] = [p[0] for p in pieces]
            md[Keys.Tokenizer.SCORES] = np.asarray([p[1] for p in pieces], np.float32)
            md[Keys.Tokenizer.TOKEN_TYPE] = np.asarray(
                [int(TokenType.NORMAL)] * len(pieces), np.int32
            )
        else:
            raise NotImplementedError(f"tokenizer.json model type {model.get('type')}")
    else:
        raise FileNotFoundError("no tokenizer.model or tokenizer.json found")

    gen_cfg = {}
    if (model_dir / "generation_config.json").exists():
        gen_cfg = json.loads((model_dir / "generation_config.json").read_text())
    main_cfg = json.loads((model_dir / "config.json").read_text())
    bos = gen_cfg.get("bos_token_id", main_cfg.get("bos_token_id", 1))
    eos = gen_cfg.get("eos_token_id", main_cfg.get("eos_token_id", 2))
    if isinstance(eos, list):
        eos = eos[0]
    md[Keys.Tokenizer.BOS_ID] = int(bos if bos is not None else 1)
    md[Keys.Tokenizer.EOS_ID] = int(eos if eos is not None else 2)
    if cfg.get("chat_template"):
        md["tokenizer.chat_template"] = cfg["chat_template"]
    return md


def load_hf_state_dict(model_dir: Path) -> dict:
    """Load weights from safetensors (preferred) or pytorch bins."""
    sts = sorted(model_dir.glob("*.safetensors"))
    if sts:
        from safetensors import safe_open  # bundled with transformers deps

        sd = {}
        for f in sts:
            with safe_open(str(f), framework="np") as h:
                for k in h.keys():
                    sd[k] = h.get_tensor(k)
        return sd
    bins = sorted(model_dir.glob("pytorch_model*.bin"))
    if bins:
        import torch

        sd = {}
        for f in bins:
            part = torch.load(str(f), map_location="cpu", weights_only=True)
            sd.update({k: v.float().numpy() for k, v in part.items()})
        return sd
    raise FileNotFoundError("no safetensors or pytorch_model*.bin in model dir")


def main(argv=None):
    from ..utils.args import build_parser

    ap = build_parser("convert", description=__doc__)
    ap.add_argument("model_dir", help="HF model directory (config.json + weights)")
    ap.add_argument("out", help="output GGUF path")
    ap.add_argument("--qtype", default="F16", help="output quantization type")
    ap.add_argument("--arch", default=None, help="override detected architecture")
    args = ap.parse_args(argv)
    model_dir = Path(args.model_dir)
    out = args.out
    qtype = GGMLType[args.qtype]
    arch = args.arch

    from types import SimpleNamespace

    from ..models.hf_convert import convert_hf_to_gguf, llama3_rope_factors
    from ..models.hf_registry import config_from_hf_dict, detect_arch

    hf_cfg = json.loads((model_dir / "config.json").read_text())
    detected = arch or detect_arch(hf_cfg)
    cfg = config_from_hf_dict(hf_cfg, arch=detected)
    # llama-3.1 "rope_type: llama3" ships as per-frequency divisors
    rope_factors = llama3_rope_factors(SimpleNamespace(**hf_cfg))

    md = extract_tokenizer_metadata(model_dir)
    sd = load_hf_state_dict(model_dir)
    convert_hf_to_gguf(sd, cfg, out, qtype=qtype, metadata=md, arch=detected,
                       rope_factors=rope_factors)
    print(f"wrote {out} ({detected}, {qtype.name}, vocab {cfg.vocab_size})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
