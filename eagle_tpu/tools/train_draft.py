"""Train a tiny target model + EAGLE draft head so acceptance is MEASURED.

The reference names its checkpoints (yuhuili/EAGLE-Vicuna-7B-v1.3 +
lmsys/vicuna-7b-v1.3, gpt2_example.py:14-19) but publishes no acceptance
numbers, and real checkpoints cannot enter this environment (zero egress). A
synthetic-weight draft head accepts ~0 tokens, so every speedup claim would be
arithmetic. This tool closes that gap end-to-end on CPU:

  1. generate a deterministic synthetic language (order-2 Markov chain with
     skewed transitions — predictable enough that a trained model is sharp);
  2. train a tiny llama TARGET on next-token CE (dense f32 params in the
     exact runtime pytree layout — the same `llama_forward` that serves);
  3. train an EAGLE DRAFT HEAD against the frozen target with the EAGLE
     recipe: logit distillation + feature regression (smooth-L1), predicting
     the target's hidden state trajectory (feature-level autoregression);
  4. write both as GGUF (arch "llama" / "eagle", canonical tensor names) and
     reload through the production loader;
  5. measure mean accepted length / accept rate with the chain engine.

Usage:
  python -m eagle_tpu.tools.train_draft [--steps 600] [--out /tmp/tiny]
         [--feature-source post_norm|pre_norm] [--measure-only ckpt_dir]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

TINY = dict(
    vocab_size=256, n_embd=128, n_layers=4, n_heads=4, n_kv_heads=4,
    head_dim=32, n_ff=256, rope_dim=32, rms_eps=1e-5, n_ctx_train=256,
)


# ---------------------------------------------------------------------------
# synthetic language
# ---------------------------------------------------------------------------


class MarkovLang:
    """Order-2 Markov chain over `vocab` tokens; each context has `fanout`
    successors with a dominant one (prob ~`p_top`). Deterministic from seed."""

    def __init__(self, vocab: int = 256, fanout: int = 4, p_top: float = 0.82, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.vocab = vocab
        self.succ = rng.integers(0, vocab, size=(vocab, vocab, fanout))
        probs = np.empty((fanout,), np.float64)
        probs[0] = p_top
        rest = (1.0 - p_top) / (fanout - 1)
        probs[1:] = rest
        self.probs = probs

    def sample(self, rng: np.random.Generator, batch: int, seqlen: int) -> np.ndarray:
        out = np.empty((batch, seqlen), np.int32)
        out[:, 0] = rng.integers(0, self.vocab, size=batch)
        out[:, 1] = rng.integers(0, self.vocab, size=batch)
        fan = self.succ.shape[-1]
        for t in range(2, seqlen):
            choice = rng.choice(fan, size=batch, p=self.probs)
            out[:, t] = self.succ[out[:, t - 2], out[:, t - 1], choice]
        return out


# ---------------------------------------------------------------------------
# dense param init (runtime pytree layout, f32)
# ---------------------------------------------------------------------------


def init_target(cfg, rng: np.random.Generator):
    import jax.numpy as jnp

    d, dh, h, hkv, f, v, L = (
        cfg.n_embd, cfg.head_dim, cfg.n_heads, cfg.n_kv_heads, cfg.n_ff,
        cfg.vocab_size, cfg.n_layers,
    )

    def w(*shape, scale=None):
        s = scale if scale is not None else (2.0 / (shape[-1] + shape[-2])) ** 0.5
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)

    layers = {
        "attn_norm": jnp.ones((L, d), jnp.float32),
        "wq": w(L, h * dh, d),
        "wk": w(L, hkv * dh, d),
        "wv": w(L, hkv * dh, d),
        "wo": w(L, d, h * dh),
        "ffn_norm": jnp.ones((L, d), jnp.float32),
        "w_gate": w(L, f, d),
        "w_up": w(L, f, d),
        "w_down": w(L, d, f),
    }
    return {
        "tok_embd": w(v, d, scale=0.02),
        "layers": layers,
        "output_norm": jnp.ones((d,), jnp.float32),
        "output": w(v, d, scale=0.02),
    }


def init_draft(cfg, rng: np.random.Generator):
    import jax.numpy as jnp

    d, dh, h, hkv, f, v = (
        cfg.n_embd, cfg.head_dim, cfg.n_heads, cfg.n_kv_heads, cfg.n_ff, cfg.vocab_size
    )

    def w(*shape):
        s = (2.0 / (shape[-1] + shape[-2])) ** 0.5
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)

    layer = {
        "wq": w(1, h * dh, d),
        "wk": w(1, hkv * dh, d),
        "wv": w(1, hkv * dh, d),
        "wo": w(1, d, h * dh),
        "ffn_norm": jnp.ones((1, d), jnp.float32),
        "w_gate": w(1, f, d),
        "w_up": w(1, f, d),
        "w_down": w(1, d, f),
    }
    return {
        "tok_embd": w(v, d),
        "fc_w": w(d, 2 * d),
        "fc_b": jnp.zeros((d,), jnp.float32),
        "layers": layer,
    }


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def _target_forward(params, cfg, tokens):
    """Full-sequence causal forward (training); returns (logits, feats_post,
    feats_pre)."""
    import jax.numpy as jnp

    from ..models.llama import llama_forward
    from ..runtime.kvcache import KVCache, causal_mask_from_tags

    b, t = tokens.shape
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    kv = KVCache.create(cfg.n_layers, b, t, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    kv = kv.with_tags(positions, positions)
    mask = causal_mask_from_tags(kv.slot_pos, positions)
    out = llama_forward(
        params, cfg, tokens, positions, kv, positions, mask,
        backend="xla", compute_dtype=jnp.float32,
    )
    return out.logits, out.hidden, out.hidden_pre


def train_target(cfg, lang: MarkovLang, steps: int, batch: int, seqlen: int, seed: int = 0,
                 log=print):
    import jax
    import jax.numpy as jnp
    import optax

    params = init_target(cfg, np.random.default_rng(seed))
    opt = optax.adamw(optax.cosine_decay_schedule(3e-3, steps, 0.1), weight_decay=1e-4)
    opt_state = opt.init(params)

    def loss_fn(p, tokens):
        logits, _, _ = _target_forward(p, cfg, tokens)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = tokens[:, 1:]
        ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return -jnp.mean(ll)

    @jax.jit
    def step(p, s, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(p, tokens)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    rng = np.random.default_rng(seed + 1)
    t0 = time.time()
    for i in range(steps):
        tokens = jnp.asarray(lang.sample(rng, batch, seqlen))
        params, opt_state, loss = step(params, opt_state, tokens)
        if i % max(1, steps // 10) == 0 or i == steps - 1:
            log(f"  target step {i}: loss {float(loss):.4f} ({time.time()-t0:.0f}s)")
    return params


def train_draft(tcfg, dcfg, target_params, lang: MarkovLang, steps: int, batch: int,
                seqlen: int, seed: int = 10, feature_source: str = "post_norm",
                w_feat: float = 0.5, log=print):
    """EAGLE training recipe: logit distillation (soft CE against the frozen
    target's distribution) + smooth-L1 feature regression on the target's
    hidden trajectory."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.eagle import eagle_forward
    from ..runtime.kvcache import KVCache, causal_mask_from_tags

    draft = init_draft(dcfg, np.random.default_rng(seed))
    opt = optax.adamw(optax.cosine_decay_schedule(2e-3, steps, 0.1), weight_decay=1e-4)
    opt_state = opt.init(draft)

    def loss_fn(dp, tokens):
        t_logits, feats_post, feats_pre = _target_forward(target_params, tcfg, tokens)
        feats = feats_post if feature_source == "post_norm" else feats_pre
        feats = jax.lax.stop_gradient(feats)
        t_logits = jax.lax.stop_gradient(t_logits)
        b, t = tokens.shape
        # draft pair i: (token x_{i+1}, feature f_i) -> predicts x_{i+2} and f_{i+1}
        d_tokens = tokens[:, 1:]
        d_feats = feats[:, :-1]
        td = t - 1
        positions = jnp.tile(jnp.arange(td, dtype=jnp.int32), (b, 1))
        kv = KVCache.create(1, b, td, dcfg.n_kv_heads, dcfg.head_dim, jnp.float32)
        kv = kv.with_tags(positions, positions)
        mask = causal_mask_from_tags(kv.slot_pos, positions)
        out = eagle_forward(
            dp, target_params, dcfg, d_tokens, d_feats, positions, kv,
            positions, mask, backend="xla", compute_dtype=jnp.float32,
        )
        # logit distillation at positions predicting x_{i+2} (drop last pair)
        logp = jax.nn.log_softmax(out.logits[:, :-1], axis=-1)
        p_t = jax.nn.softmax(t_logits[:, 1:-1], axis=-1)  # target dist for x_{i+2}
        ce = -jnp.mean(jnp.sum(p_t * logp, axis=-1))
        feat_pred = out.feature if feature_source == "post_norm" else out.feature_pre
        delta = feat_pred - feats[:, 1:]
        l1 = jnp.mean(jnp.where(jnp.abs(delta) < 1.0, 0.5 * delta**2, jnp.abs(delta) - 0.5))
        return ce + w_feat * l1, (ce, l1)

    @jax.jit
    def step(dp, s, tokens):
        (loss, (ce, l1)), grads = jax.value_and_grad(loss_fn, has_aux=True)(dp, tokens)
        updates, s = opt.update(grads, s, dp)
        return optax.apply_updates(dp, updates), s, loss, ce, l1

    rng = np.random.default_rng(seed + 1)
    t0 = time.time()
    for i in range(steps):
        tokens = jnp.asarray(lang.sample(rng, batch, seqlen))
        draft, opt_state, loss, ce, l1 = step(draft, opt_state, tokens)
        if i % max(1, steps // 10) == 0 or i == steps - 1:
            log(f"  draft step {i}: ce {float(ce):.4f} featL1 {float(l1):.4f} "
                f"({time.time()-t0:.0f}s)")
    return draft


# ---------------------------------------------------------------------------
# GGUF save (canonical names; inverts the loader's rope row-unpermute)
# ---------------------------------------------------------------------------


def _permute_rows_for_file(w: np.ndarray, n_heads: int) -> np.ndarray:
    from ..models.loader import unpermute_rows

    inv = np.argsort(unpermute_rows(w.shape[0], n_heads))
    return w[inv]


def _base_metadata(cfg, arch: str) -> dict:
    return {
        "general.architecture": arch,
        f"{arch}.context_length": cfg.n_ctx_train,
        f"{arch}.embedding_length": cfg.n_embd,
        f"{arch}.block_count": cfg.n_layers,
        f"{arch}.feed_forward_length": cfg.n_ff,
        f"{arch}.vocab_size": cfg.vocab_size,
        f"{arch}.attention.head_count": cfg.n_heads,
        f"{arch}.attention.head_count_kv": cfg.n_kv_heads,
        f"{arch}.attention.key_length": cfg.head_dim,
        f"{arch}.attention.layer_norm_rms_epsilon": cfg.rms_eps,
        f"{arch}.rope.dimension_count": cfg.rope_dim,
        f"{arch}.rope.freq_base": cfg.rope_base,
    }


def _smoke_vocab(v: int) -> dict:
    """Minimal SPM vocab sized to the synthetic model so the saved GGUF is
    usable through the real CLI/server surfaces (tokenize text prompts, detok
    output): specials + single printable-ASCII pieces + filler words. The
    MarkovLang training stream is id-level, so the vocab STRINGS are
    arbitrary — this exists purely to make the artifact drivable."""
    import numpy as np

    from ..gguf.constants import Keys, TokenType

    tokens = ["<unk>", "<s>", "</s>", "▁"]
    ttypes = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL,
              TokenType.NORMAL]
    for c in range(33, 127):  # printable ASCII, single-char pieces
        tokens.append(chr(c))
        ttypes.append(TokenType.NORMAL)
    i = 0
    while len(tokens) < v:
        tokens.append(f"▁w{i}")
        ttypes.append(TokenType.NORMAL)
        i += 1
    tokens = tokens[:v]
    ttypes = ttypes[:v]
    scores = [-float(i) for i in range(len(tokens))]
    return {
        Keys.Tokenizer.MODEL: "llama",
        Keys.Tokenizer.LIST: tokens,
        Keys.Tokenizer.SCORES: np.asarray(scores, np.float32),
        Keys.Tokenizer.TOKEN_TYPE: np.asarray([int(t) for t in ttypes], np.int32),
        Keys.Tokenizer.BOS_ID: 1,
        Keys.Tokenizer.EOS_ID: 2,
        Keys.Tokenizer.UNK_ID: 0,
        Keys.Tokenizer.ADD_BOS: True,
    }


def save_target_gguf(path, params, cfg, qtype=None):
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter
    from ..quant.blocks import quantize

    w = GGUFWriter(path)
    for k, v in _base_metadata(cfg, "llama").items():
        w.add(k, v)
    for k, v in _smoke_vocab(cfg.vocab_size).items():
        w.add(k, v)

    def add(name, arr, permute_heads=None, quantizable=False):
        arr = np.asarray(arr, dtype=np.float32)
        if permute_heads:
            arr = _permute_rows_for_file(arr, permute_heads)
        if quantizable and qtype is not None and arr.ndim == 2 and arr.shape[-1] % 256 == 0:
            w.add_tensor(name, quantize(arr, qtype).astype(np.uint8), GGMLType(qtype),
                         raw_shape=arr.shape)
        else:
            w.add_tensor(name, arr)

    add("token_embd.weight", params["tok_embd"])
    L = cfg.n_layers
    lyr = params["layers"]
    for i in range(L):
        add(f"blk.{i}.attn_norm.weight", lyr["attn_norm"][i])
        add(f"blk.{i}.attn_q.weight", lyr["wq"][i], permute_heads=cfg.n_heads, quantizable=True)
        add(f"blk.{i}.attn_k.weight", lyr["wk"][i], permute_heads=cfg.n_kv_heads, quantizable=True)
        add(f"blk.{i}.attn_v.weight", lyr["wv"][i], quantizable=True)
        add(f"blk.{i}.attn_output.weight", lyr["wo"][i], quantizable=True)
        add(f"blk.{i}.ffn_norm.weight", lyr["ffn_norm"][i])
        add(f"blk.{i}.ffn_gate.weight", lyr["w_gate"][i], quantizable=True)
        add(f"blk.{i}.ffn_up.weight", lyr["w_up"][i], quantizable=True)
        add(f"blk.{i}.ffn_down.weight", lyr["w_down"][i], quantizable=True)
    add("output_norm.weight", params["output_norm"])
    add("output.weight", params["output"], quantizable=True)
    w.write()


def save_eagle_gguf(path, params, cfg):
    from ..gguf.writer import GGUFWriter

    w = GGUFWriter(path)
    for k, v in _base_metadata(dataclasses.replace(cfg, n_layers=1), "eagle").items():
        w.add(k, v)

    def add(name, arr, permute_heads=None):
        arr = np.asarray(arr, dtype=np.float32)
        if permute_heads:
            arr = _permute_rows_for_file(arr, permute_heads)
        w.add_tensor(name, arr)

    add("token_embd.weight", params["tok_embd"])
    add("fc.weight", params["fc_w"])
    add("fc.bias", params["fc_b"])
    lyr = params["layers"]
    add("blk.0.attn_q.weight", lyr["wq"][0], permute_heads=cfg.n_heads)
    add("blk.0.attn_k.weight", lyr["wk"][0], permute_heads=cfg.n_kv_heads)
    add("blk.0.attn_v.weight", lyr["wv"][0])
    add("blk.0.attn_output.weight", lyr["wo"][0])
    add("blk.0.ffn_norm.weight", lyr["ffn_norm"][0])
    add("blk.0.ffn_gate.weight", lyr["w_gate"][0])
    add("blk.0.ffn_up.weight", lyr["w_up"][0])
    add("blk.0.ffn_down.weight", lyr["w_down"][0])
    w.write()


# ---------------------------------------------------------------------------
# acceptance measurement
# ---------------------------------------------------------------------------


def measure_acceptance(target_params, draft_params, tcfg, dcfg, lang: MarkovLang,
                       n_prompts: int = 8, prompt_len: int = 32,
                       max_new_tokens: int = 96, n_draft: int = 5,
                       feature_source: str = "post_norm", backend: str = "xla",
                       seed: int = 99, engine: str = "chain",
                       tree2: tuple[int, int, int] = (4, 5, 12)) -> dict:
    """engine: 'chain' (K-step chain) or 'tree2' (EAGLE-2 dynamic tree with
    (beam, depth, n_verify)) — the tree spends the same verify pass over many
    branches, so its mean accept length upper-bounds the chain's."""
    if engine == "tree2":
        from ..runtime.tree2 import EagleTree2Engine

        bm, dpt, nv = tree2
        eng = EagleTree2Engine(
            target_params, draft_params, tcfg, dcfg, beam=bm, depth=dpt,
            n_verify=nv, max_seq=512, backend=backend,
            feature_source=feature_source, eos_id=-1,
        )
    else:
        from ..runtime.speculative import EagleChainEngine

        eng = EagleChainEngine(
            target_params, draft_params, tcfg, dcfg, n_draft=n_draft,
            max_seq=512, backend=backend, feature_source=feature_source, eos_id=-1,
        )
    rng = np.random.default_rng(seed)
    prompts = lang.sample(rng, n_prompts, prompt_len)
    agg = {"n_cycles": 0, "n_drafted": 0, "n_accepted": 0, "n_tokens": 0}
    for p in prompts:
        out, stats = eng.generate(list(p), max_new_tokens=max_new_tokens)
        agg["n_cycles"] += stats["n_cycles"]
        agg["n_drafted"] += stats["n_drafted"]
        agg["n_accepted"] += stats["n_accepted"]
        agg["n_tokens"] += len(out)
    agg["accept_rate"] = agg["n_accepted"] / max(1, agg["n_drafted"])
    agg["mean_accept_len"] = (agg["n_accepted"] + agg["n_cycles"]) / max(1, agg["n_cycles"])
    return agg


def train_pipeline(steps: int = 600, batch: int = 24, seqlen: int = 64, seed: int = 0,
                   feature_source: str = "post_norm", cfg_overrides: dict | None = None,
                   log=print):
    """Full pipeline; returns (target_params, draft_params, tcfg, dcfg, lang)."""
    from ..models.config import ModelConfig

    tiny = dict(TINY)
    tiny.update(cfg_overrides or {})
    tcfg = ModelConfig(arch="llama", **tiny)
    dcfg = dataclasses.replace(tcfg, n_layers=1, is_eagle=True, arch="eagle")
    lang = MarkovLang(vocab=tcfg.vocab_size, seed=seed)
    log(f"training tiny target ({tcfg.n_layers}L d={tcfg.n_embd} V={tcfg.vocab_size})")
    target = train_target(tcfg, lang, steps, batch, seqlen, seed=seed, log=log)
    log("training EAGLE draft head")
    draft = train_draft(tcfg, dcfg, target, lang, steps, batch, seqlen, seed=seed + 10,
                        feature_source=feature_source, log=log)
    return target, draft, tcfg, dcfg, lang


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--seqlen", type=int, default=64)
    ap.add_argument("--out", default="/tmp/tiny_eagle")
    ap.add_argument("--feature-source", default="post_norm",
                    choices=["post_norm", "pre_norm"])
    ap.add_argument("--n-draft", type=int, default=5)
    ap.add_argument("--quant-target", default=None, help="e.g. Q4_K")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    target, draft, tcfg, dcfg, lang = train_pipeline(
        args.steps, args.batch, args.seqlen, args.seed, args.feature_source
    )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    from ..gguf.constants import GGMLType

    qtype = getattr(GGMLType, args.quant_target) if args.quant_target else None
    save_target_gguf(out / "target.gguf", target, tcfg, qtype=qtype)
    save_eagle_gguf(out / "draft.gguf", draft, dcfg)
    print(f"saved {out}/target.gguf + draft.gguf")

    # reload through the production loader and measure acceptance
    from ..models.loader import load_eagle_params, load_llama_params

    tparams, tcfg2, _ = load_llama_params(out / "target.gguf", fuse=False)
    dparams, dcfg2, _ = load_eagle_params(out / "draft.gguf")
    dcfg2 = dataclasses.replace(dcfg2, is_eagle=True)
    stats = measure_acceptance(
        tparams, dparams, tcfg2, dcfg2, lang, n_draft=args.n_draft,
        feature_source=args.feature_source,
    )
    print(json.dumps(stats))
    (out / "acceptance.json").write_text(json.dumps(stats, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
