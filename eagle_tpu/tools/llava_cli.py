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
    encode=None,
) -> str:
    """Greedy multimodal generation over [text_before ⊕ image ⊕ text_after].
    `encode` maps (params, cfg, image) -> [rows, n_embd] (defaults to the
    CLIP+MLP llava projector; the MiniCPM-V resampler path passes its own)."""
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

    if encode is None:
        encode = encode_image
    img_embd = encode(clip_params, clip_cfg, image)  # [n_rows, D]
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


def qwen2vl_mrope_positions(n_before: int, llm_h: int, llm_w: int, n_after: int):
    """m-rope position channels [3, T] for [text][image rows][text] — HF
    get_rope_index / the reference's qwen2vl-cli position walk
    (qwen2vl-cli.cpp: img t/h/w channels offset from the text cursor; text
    resumes at st + max(h, w))."""
    t, h, w = list(range(n_before)), list(range(n_before)), list(range(n_before))
    st = n_before
    for r in range(llm_h):
        for c in range(llm_w):
            t.append(st)
            h.append(st + r)
            w.append(st + c)
    nxt = st + max(llm_h, llm_w)
    for i in range(n_after):
        t.append(nxt + i)
        h.append(nxt + i)
        w.append(nxt + i)
    return np.asarray([t, h, w], np.int32), nxt + n_after


def generate_with_image_qwen2vl(
    engine,
    vis_params,
    vis_cfg,
    prompt: str,
    image: np.ndarray,
    max_new_tokens: int = 128,
    marker: str = "<image>",
    max_pixels: int | None = None,
) -> str:
    """Qwen2-VL multimodal generation: windowed/full ViT rows spliced between
    the vision markers, m-rope positions per channel (t constant over the
    image, h/w from the merged grid), decode resuming at the compressed text
    cursor — qwen2vl-cli.cpp over models/qwen2vl_vision.py."""
    import jax
    import jax.numpy as jnp

    from ..models.llama import embed_lookup, llama_forward
    from ..models.qwen2vl_vision import encode_image as q2_encode
    from ..runtime.generate import pad_bucket
    from ..runtime.kvcache import KVCache, causal_mask_from_tags

    tok = engine.tokenizer
    before, _, after = prompt.partition(marker)
    ids_a = tok.encode(before)
    ids_b = tok.encode(after, add_bos=False) if after else []
    img_rows, (gh, gw) = q2_encode(vis_params, vis_cfg, image, max_pixels=max_pixels)
    m = vis_cfg.merge_size
    out = qwen2vl_generate_ids(
        engine, ids_a, ids_b, img_rows, gh // m, gw // m,
        max_new_tokens=max_new_tokens,
    )
    return tok.decode(out, skip_special=True)


def qwen2vl_generate_ids(
    engine, ids_a, ids_b, img_rows, llm_h: int, llm_w: int,
    max_new_tokens: int = 128, eos_id: int | None = None,
) -> list:
    """Greedy decode over [ids_a ⊕ image rows ⊕ ids_b] with m-rope image
    positions; `img_rows` [llm_h*llm_w, D] from the vision tower."""
    import jax
    import jax.numpy as jnp

    from ..models.llama import embed_lookup, llama_forward
    from ..runtime.generate import pad_bucket
    from ..runtime.kvcache import KVCache, causal_mask_from_tags

    cfg = engine.model_cfg
    params = engine.params
    eos_id = engine.tokenizer.eos_id if eos_id is None else eos_id
    emb_a = embed_lookup(params["tok_embd"], jnp.asarray([ids_a], jnp.int32))[0]
    emb_b = (
        embed_lookup(params["tok_embd"], jnp.asarray([ids_b], jnp.int32))[0]
        if ids_b else jnp.zeros((0, cfg.n_embd), jnp.float32)
    )
    embeds = jnp.concatenate(
        [emb_a, jnp.asarray(img_rows).astype(emb_a.dtype), emb_b], axis=0
    )
    n = embeds.shape[0]
    mrope, text_cursor = qwen2vl_mrope_positions(len(ids_a), llm_h, llm_w, len(ids_b))
    t = pad_bucket(n)
    embeds = jnp.pad(embeds, ((0, t - n), (0, 0)))[None]
    mrope = np.pad(mrope, ((0, 0), (0, t - n)))[:, None, :]  # [3, 1, t]

    max_seq = max(engine.cfg.max_seq, t + max_new_tokens + 1)
    kv = KVCache.create(cfg.n_layers, 1, max_seq, cfg.n_kv_heads, cfg.head_dim,
                        engine.cfg.kv_dtype)

    @jax.jit
    def prefill(params, kv, embeds, mrope):
        # cache slots + visibility tags are ORDINALS; rope reads the m-rope
        # channels (they compress positions over the image rows)
        ordinals = jnp.arange(t, dtype=jnp.int32)[None]
        kv2 = kv.with_tags(ordinals, ordinals, valid=ordinals < n)
        mask = causal_mask_from_tags(kv2.slot_pos, ordinals)
        o = llama_forward(
            params, cfg, jnp.zeros((1, t), jnp.int32), ordinals, kv2,
            ordinals, mask, backend=engine.cfg.backend,
            compute_dtype=engine.cfg.compute_dtype, input_embeds=embeds,
            mrope_positions=mrope,
        )
        return o.logits[0, n - 1], o.kv

    @jax.jit
    def step(params, kv, tok_id, slot, rope_pos):
        sl = jnp.full((1, 1), slot, jnp.int32)
        kv = kv.with_tags(sl, sl)
        mask = causal_mask_from_tags(kv.slot_pos, sl)
        fo = llama_forward(
            params, cfg, jnp.full((1, 1), tok_id, jnp.int32), sl, kv, sl, mask,
            backend=engine.cfg.backend, compute_dtype=engine.cfg.compute_dtype,
            mrope_positions=jnp.full((3, 1, 1), rope_pos, jnp.int32),
        )
        return jnp.argmax(fo.logits[0, 0]), fo.kv

    logits, kv = prefill(params, kv, embeds, jnp.asarray(mrope))
    out = []
    slot = n
    rope_pos = text_cursor
    tok_id = int(jnp.argmax(logits))
    for _ in range(max_new_tokens):
        if tok_id == eos_id:
            break
        out.append(tok_id)
        if slot + 1 >= max_seq:
            break
        nxt, kv = step(params, kv, tok_id, slot, rope_pos)
        tok_id = int(nxt)
        slot += 1
        rope_pos += 1
    return out


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
    from ..gguf.reader import GGUFReader

    t0 = time.time()
    eng = Engine(EngineConfig(model_path=args.model, max_seq=args.ctx,
                              backend=args.backend))
    mm_md = GGUFReader(args.mmproj).metadata
    is_qwen2vl = bool(mm_md.get("clip.has_qwen2vl_merger", False))
    is_minicpmv = bool(mm_md.get("clip.has_minicpmv_projector", False))
    is_glmedge = bool(mm_md.get("clip.has_glm_projector", False))
    img = load_image(args.image)
    if is_glmedge:
        from ..models.clip import encode_image_glmedge, load_clip_params

        gp, gcfg = load_clip_params(args.mmproj)
        print(f"[load] {time.time()-t0:.1f}s (+glmedge mmproj: {gcfg.n_layers}L "
              f"d={gcfg.d})", file=sys.stderr)
        t0 = time.time()
        text = generate_with_image(
            eng, gp, gcfg, args.prompt, img, max_new_tokens=args.n_predict,
            encode=encode_image_glmedge,
        )
    elif is_minicpmv:
        from functools import partial

        from ..models.minicpmv import encode_image_minicpmv, load_minicpmv_mmproj

        mp, rcfg, vcfg = load_minicpmv_mmproj(args.mmproj)
        print(f"[load] {time.time()-t0:.1f}s (+minicpmv mmproj v{rcfg.version}: "
              f"{vcfg.n_layers}L d={vcfg.d} -> {rcfg.num_query} queries x "
              f"d={rcfg.embed_dim})", file=sys.stderr)
        t0 = time.time()
        text = generate_with_image(
            eng, mp, vcfg, args.prompt, img, max_new_tokens=args.n_predict,
            encode=lambda p, c, im: encode_image_minicpmv(p, rcfg, c, im),
        )
    elif is_qwen2vl:
        from ..models.qwen2vl_vision import load_qwen2vl_mmproj

        vp, vc = load_qwen2vl_mmproj(args.mmproj)
        print(f"[load] {time.time()-t0:.1f}s (+qwen2vl mmproj: {vc.n_layers}L "
              f"d={vc.d} {vc.variant})", file=sys.stderr)
        t0 = time.time()
        text = generate_with_image_qwen2vl(eng, vp, vc, args.prompt, img,
                                           max_new_tokens=args.n_predict)
    else:
        from ..models.clip import load_clip_params

        clip_params, clip_cfg = load_clip_params(args.mmproj)
        print(f"[load] {time.time()-t0:.1f}s (+mmproj: {clip_cfg.n_layers}L "
              f"d={clip_cfg.d} {clip_cfg.image_size}px/{clip_cfg.patch_size})",
              file=sys.stderr)
        t0 = time.time()
        text = generate_with_image(eng, clip_params, clip_cfg, args.prompt, img,
                                   max_new_tokens=args.n_predict)
    print(text)
    print(f"[perf] {time.time()-t0:.2f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
