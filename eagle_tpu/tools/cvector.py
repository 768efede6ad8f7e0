"""Control-vector generation from data — the cvector-generator equivalent
(examples/cvector-generator/cvector-generator.cpp + mean.hpp + pca.hpp).

Given positive/negative persona prompt pairs, collect per-layer hidden states
(the `l_out` tensors the reference hooks via cb_eval, cvector-generator.cpp:326),
diff them per token position, and reduce each layer's diff matrix to one
direction per layer by either:
  - mean (mean.hpp:11-46): normalized column mean of the diffs;
  - pca (pca.hpp:245-316): dominant eigenvector of D^T D by power iteration,
    sign-fixed toward the mean diff (the reference notes its output sign is
    random — PR #8069; we orient it so +strength pushes toward positive).

Output: a control-vector GGUF with `direction.<il>` tensors (1-indexed, the
format tools/lora.py:load_control_vector and llama.cpp both read).

Usage:
  python -m eagle_tpu.tools.cvector -m model.gguf \
      --positive-file positive.txt --negative-file negative.txt \
      -o control_vector.gguf [--method pca|mean] [--pca-iter 1000]
"""

from __future__ import annotations

import argparse
from typing import Any

import numpy as np


def collect_layer_hiddens(params: dict[str, Any], cfg, tokens) -> list[np.ndarray]:
    """Per-layer l_out hidden states for one padded prompt [T] -> list of
    [T, D] f32 arrays (eager per-layer loop like tools/trace.py)."""
    import jax.numpy as jnp

    from ..models.llama import _layer_step, embed_lookup
    from ..ops.rope import rope_freqs_cfg
    from ..runtime.kvcache import KVCache, causal_mask_from_tags

    tokens = jnp.asarray(tokens)
    if tokens.ndim == 1:
        tokens = tokens[None, :]
    b, t = tokens.shape
    x = embed_lookup(params["tok_embd"], tokens)
    if cfg.embd_scale != 1.0:
        x = x * jnp.asarray(cfg.embd_scale, x.dtype)
    inv_freq, _ = rope_freqs_cfg(cfg)
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    kv = KVCache.create(cfg.n_layers, b, t, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    kv = kv.with_tags(positions, positions)
    mask = causal_mask_from_tags(kv.slot_pos, positions)
    k_all, v_all, k_s, v_s = kv.k, kv.v, kv.k_scale, kv.v_scale
    outs = []
    for li in range(cfg.n_layers):
        x, k_all, v_all, k_s, v_s = _layer_step(
            cfg, inv_freq, positions, positions, mask, jnp.float32, None,
            x, params["layers"], jnp.int32(li), k_all, v_all, k_s, v_s,
        )
        outs.append(np.asarray(x[0], np.float32))
    return outs


def _pad_pair(tok, pos_text: str, neg_text: str) -> tuple[list[int], list[int]]:
    """Tokenize a pair and pad the shorter one with its last token
    (cvector-generator.cpp:282-292 pads; padding token choice is a TODO
    there too)."""
    p = tok.encode(pos_text)
    n = tok.encode(neg_text)
    m = max(len(p), len(n))
    p = p + [p[-1]] * (m - len(p))
    n = n + [n[-1]] * (m - len(n))
    return p, n


def diff_matrices(params, cfg, tok, pairs) -> list[np.ndarray]:
    """Per layer: stack (pos - neg) hidden diffs over all pairs/tokens,
    dropping all-zero rows (calc_diff + filter_nonzero_rows,
    cvector-generator.cpp:99-155)."""
    per_layer: list[list[np.ndarray]] = [[] for _ in range(cfg.n_layers)]
    for pos_text, neg_text in pairs:
        p_ids, n_ids = _pad_pair(tok, pos_text, neg_text)
        h_pos = collect_layer_hiddens(params, cfg, p_ids)
        h_neg = collect_layer_hiddens(params, cfg, n_ids)
        for li in range(cfg.n_layers):
            per_layer[li].append(h_pos[li] - h_neg[li])
    out = []
    for li in range(cfg.n_layers):
        d = np.concatenate(per_layer[li], axis=0)  # [n_rows, D]
        nz = np.abs(d).sum(axis=1) > 0
        out.append(d[nz] if nz.any() else d[:1])
    return out


def direction_mean(diff: np.ndarray) -> np.ndarray:
    v = diff.mean(axis=0)
    return v / (np.linalg.norm(v) + 1e-12)


def direction_pca(diff: np.ndarray, n_iter: int = 1000, tol: float = 1e-7,
                  seed: int = 0) -> np.ndarray:
    """Dominant right-singular vector of diff via power iteration on
    C = diff^T diff (pca.hpp:245-294), sign-oriented toward the mean diff."""
    d = diff.shape[1]
    c = diff.T.astype(np.float64) @ diff.astype(np.float64)
    c /= max(1.0, float(diff.shape[0]))
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(d)
    v /= np.linalg.norm(v)
    for _ in range(n_iter):
        nv = c @ v
        norm = np.linalg.norm(nv)
        if norm == 0:
            break
        nv /= norm
        if np.linalg.norm(nv - v) < tol:
            v = nv
            break
        v = nv
    mean = diff.mean(axis=0)
    if np.dot(v, mean) < 0:  # random sign fix (llama.cpp PR #8069)
        v = -v
    return v.astype(np.float32)


def write_cvector_gguf(path, directions: list[np.ndarray], model_hint: str = ""):
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter

    w = GGUFWriter(path)
    w.add("general.architecture", "controlvector")
    w.add("controlvector.model_hint", model_hint or "llama")
    w.add("controlvector.layer_count", len(directions))
    for il, v in enumerate(directions):
        # 1-indexed like the reference's output (cvector-generator.cpp writes
        # direction.%zu with il+1)
        w.add_tensor(f"direction.{il + 1}", v.astype(np.float32), GGMLType.F32)
    w.write()


def generate_cvector(params, cfg, tok, pairs, method: str = "pca",
                     pca_iter: int = 1000) -> list[np.ndarray]:
    diffs = diff_matrices(params, cfg, tok, pairs)
    fn = direction_mean if method == "mean" else (
        lambda d: direction_pca(d, n_iter=pca_iter)
    )
    return [fn(d) for d in diffs]


def main(argv=None):
    ap = argparse.ArgumentParser("eagle-tpu cvector-generator")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--positive-file", required=True)
    ap.add_argument("--negative-file", required=True)
    ap.add_argument("-o", "--output", default="control_vector.gguf")
    ap.add_argument("--method", default="pca", choices=["pca", "mean"])
    ap.add_argument("--pca-iter", type=int, default=1000)
    args = ap.parse_args(argv)

    from ..models.loader import load_llama_params
    from ..tokenizer.bpe import tokenizer_from_gguf_metadata

    params, cfg, md = load_llama_params(args.model)
    tok = tokenizer_from_gguf_metadata(md)
    with open(args.positive_file) as f:
        pos = [l.rstrip("\n") for l in f if l.strip()]
    with open(args.negative_file) as f:
        neg = [l.rstrip("\n") for l in f if l.strip()]
    if len(pos) != len(neg):
        raise SystemExit("positive and negative files must have the same number of lines")
    dirs = generate_cvector(params, cfg, tok, list(zip(pos, neg)),
                            method=args.method, pca_iter=args.pca_iter)
    write_cvector_gguf(args.output, dirs, model_hint=md.get("general.architecture", "llama"))
    print(f"wrote {args.output} ({len(dirs)} directions, d={dirs[0].shape[0]})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
