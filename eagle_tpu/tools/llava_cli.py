"""LLaVA multimodal generation — the llava-cli equivalent
(examples/llava/llava-cli.cpp + llava.cpp).

Prompt layout follows llava-cli's eval loop (llava-cli.cpp:180-220): the text
before the `<image>` marker is embedded, the CLIP-projected image rows are
spliced in at its position, then the text after, and generation proceeds over
the combined embedding sequence. The vision tower + projector come from an
mmproj GGUF (models/clip.py).

Usage:
  python -m eagle_tpu.tools.llava_cli -m model.gguf --mmproj mmproj.gguf \
      --image img.npy|.png -p "USER: <image>\nDescribe the image. ASSISTANT:"
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def load_image(path) -> np.ndarray:
    """Load an image file to an HWC uint8/float array. Supports .npy always;
    common formats when PIL is available."""
    p = str(path)
    if p.endswith(".npy"):
        return np.load(p)
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise SystemExit("PIL not available: provide the image as .npy (HWC)") from e
    return np.asarray(Image.open(p).convert("RGB"))


def generate_with_image(
    engine,
    clip_params,
    clip_cfg,
    prompt: str,
    image: np.ndarray,
    max_new_tokens: int = 128,
    marker: str = "<image>",
) -> str:
    """Greedy multimodal generation over [text_before ⊕ image ⊕ text_after]."""
    import jax
    import jax.numpy as jnp

    from ..models.clip import encode_image
    from ..models.llama import embed_lookup, llama_forward
    from ..runtime.generate import pad_bucket
    from ..runtime.kvcache import KVCache, causal_mask_from_tags

    tok = engine.tokenizer
    cfg = engine.model_cfg
    params = engine.params
    before, _, after = prompt.partition(marker)
    ids_a = tok.encode(before)
    ids_b = tok.encode(after, add_bos=False) if after else []

    img_embd = encode_image(clip_params, clip_cfg, image)  # [n_patch, D]
    emb_a = embed_lookup(params["tok_embd"], jnp.asarray([ids_a], jnp.int32))[0]
    emb_b = (
        embed_lookup(params["tok_embd"], jnp.asarray([ids_b], jnp.int32))[0]
        if ids_b else jnp.zeros((0, cfg.n_embd), jnp.float32)
    )
    embeds = jnp.concatenate([emb_a, img_embd.astype(jnp.float32), emb_b], axis=0)
    n = embeds.shape[0]
    t = pad_bucket(n)
    embeds = jnp.pad(embeds, ((0, t - n), (0, 0)))[None]

    max_seq = max(engine.cfg.max_seq, t + max_new_tokens + 1)
    kv = KVCache.create(cfg.n_layers, 1, max_seq, cfg.n_kv_heads, cfg.head_dim,
                        engine.cfg.kv_dtype)

    @jax.jit
    def prefill(params, kv, embeds):
        positions = jnp.arange(t, dtype=jnp.int32)[None]
        kv2 = kv.with_tags(positions, positions, valid=positions < n)
        mask = causal_mask_from_tags(kv2.slot_pos, positions)
        o = llama_forward(
            params, cfg, jnp.zeros((1, t), jnp.int32), positions, kv2,
            positions, mask, backend=engine.cfg.backend,
            compute_dtype=engine.cfg.compute_dtype, input_embeds=embeds,
        )
        return o.logits[0, n - 1], o.kv

    logits, kv = prefill(params, kv, embeds)
    out = []
    pos = n
    tok_id = int(jnp.argmax(logits))
    for _ in range(max_new_tokens):
        if tok_id == tok.eos_id:
            break
        out.append(tok_id)
        if pos + 1 >= max_seq:
            break
        p_arr = jnp.full((1, 1), pos, jnp.int32)
        kv = kv.with_tags(p_arr, p_arr)
        mask = causal_mask_from_tags(kv.slot_pos, p_arr)
        fo = llama_forward(
            params, cfg, jnp.full((1, 1), tok_id, jnp.int32), p_arr, kv, p_arr,
            mask, backend=engine.cfg.backend,
            compute_dtype=engine.cfg.compute_dtype,
        )
        kv = fo.kv
        tok_id = int(jnp.argmax(fo.logits[0, 0]))
        pos += 1
    return tok.decode(out, skip_special=True)


def main(argv=None):
    ap = argparse.ArgumentParser("eagle-tpu llava")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--mmproj", required=True, help="CLIP vision + projector GGUF")
    ap.add_argument("--image", required=True)
    ap.add_argument("-p", "--prompt",
                    default="USER: <image>\nDescribe the image. ASSISTANT:")
    ap.add_argument("-n", "--n-predict", type=int, default=128)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--backend", default=None, choices=[None, "xla", "pallas"])
    args = ap.parse_args(argv)

    from ..api import Engine, EngineConfig
    from ..models.clip import load_clip_params

    t0 = time.time()
    eng = Engine(EngineConfig(model_path=args.model, max_seq=args.ctx,
                              backend=args.backend))
    clip_params, clip_cfg = load_clip_params(args.mmproj)
    print(f"[load] {time.time()-t0:.1f}s (+mmproj: {clip_cfg.n_layers}L "
          f"d={clip_cfg.d} {clip_cfg.image_size}px/{clip_cfg.patch_size})",
          file=sys.stderr)
    img = load_image(args.image)
    t0 = time.time()
    text = generate_with_image(eng, clip_params, clip_cfg, args.prompt, img,
                               max_new_tokens=args.n_predict)
    print(text)
    print(f"[perf] {time.time()-t0:.2f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
