"""High-level engine API: load GGUF models, tokenize, generate.

The Python-facing equivalent of llama.cpp's common_init_from_params +
generation loop plumbing (common/common.cpp:899, examples/main): one object
owning target (+ optional EAGLE draft) params, tokenizer, and the right
runtime engine."""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Iterator

import jax.numpy as jnp
import numpy as np

from .models.config import ModelConfig
from .models.loader import load_eagle_params, load_llama_params
from .runtime.generate import Generator
from .runtime.sampling import SamplerConfig
from .runtime.speculative import EagleChainEngine
from .runtime.tree import EagleTreeEngine, TreeSpec
from .tokenizer.spm import SPMTokenizer


@dataclasses.dataclass
class EngineConfig:
    model_path: str | Path = ""
    draft_path: str | Path | None = None  # EAGLE gguf
    lora_path: str | Path | None = None  # LoRA adapter gguf (merged at load)
    lora_scale: float | None = None
    max_seq: int = 2048
    batch: int = 1  # >1 enables continuous-batching slots (needs draft_path)
    n_draft: int = 5  # chain draft length
    #: speculative cycles chained per program dispatch (single-stream
    #: generate): >1 amortizes the host<->device round trip per dispatch —
    #: 25-40 ms on the TPU relay vs ~10 ms of 7B cycle compute — at the
    #: price of up to C-1 discarded cycles after a stop condition
    cycles_per_dispatch: int = 1
    tree_branching: tuple[int, ...] | None = None  # enables static tree mode
    tree2: tuple[int, int, int] | None = None  # (beam, depth, n_verify) — EAGLE-2 dynamic trees
    lookahead: tuple[int, int, int] | None = None  # (W, N, G) — model-free lookahead decoding
    backend: str | None = None  # 'xla' | 'pallas'
    compute_dtype: Any = jnp.bfloat16
    kv_dtype: Any = jnp.bfloat16
    feature_source: str = "pre_norm"
    sampler: SamplerConfig = dataclasses.field(default_factory=lambda: SamplerConfig(greedy=True))
    #: serving weight layout (quant/serving.py): nibble-pack 4-bit formats
    #: (value-preserving, ~2x decode on weight-bound shapes) and the scale
    #: stream — "f32" (ggml's exact products) or "bf16" (half the scale
    #: bytes; see the scale-mode quality study in BENCHMARKS.md)
    scale_mode: str = "f32"
    pack_weights: bool = True
    #: paged KV serving (runtime/paged_batcher.py — the reference's
    #: find_slot/seq-id sharing, llama-kv-cache.cpp:120): slots draw cache
    #: pages from a shared pool with prefix-cache reuse. `kv_pages` bounds the
    #: pool (default = full batch*max_seq capacity; smaller oversubscribes)
    paged: bool = False
    kv_pages: int | None = None
    page_size: int = 64


class Engine:
    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.batcher = None
        self.params, self.model_cfg, self.metadata = load_llama_params(cfg.model_path)
        if cfg.lora_path:
            from .tools.lora import apply_lora_to_params

            self.params = apply_lora_to_params(
                self.params, self.model_cfg, cfg.lora_path, scale_override=cfg.lora_scale
            )
        from .quant.serving import prepare_params_for_serving

        self.params = prepare_params_for_serving(
            self.params, scale_mode=cfg.scale_mode, pack=cfg.pack_weights
        )
        from .tokenizer.bpe import tokenizer_from_gguf_metadata

        self.tokenizer = tokenizer_from_gguf_metadata(self.metadata)

        self.draft_params = None
        if cfg.draft_path:
            self.draft_params, self.draft_cfg, _ = load_eagle_params(cfg.draft_path)
            self.draft_params = prepare_params_for_serving(
                self.draft_params, scale_mode=cfg.scale_mode, pack=cfg.pack_weights
            )
            if cfg.tree2:
                from .runtime.tree2 import EagleTree2Engine

                bm, dpt, nv = cfg.tree2
                self.engine: Any = EagleTree2Engine(
                    self.params, self.draft_params, self.model_cfg, self.draft_cfg,
                    beam=bm, depth=dpt, n_verify=nv, max_seq=cfg.max_seq,
                    compute_dtype=cfg.compute_dtype, kv_dtype=cfg.kv_dtype,
                    backend=cfg.backend, feature_source=cfg.feature_source,
                    sampler=cfg.sampler, eos_id=self.tokenizer.eos_id,
                )
            elif cfg.tree_branching:
                self.engine = EagleTreeEngine(
                    self.params, self.draft_params, self.model_cfg, self.draft_cfg,
                    tree=TreeSpec(cfg.tree_branching), max_seq=cfg.max_seq,
                    compute_dtype=cfg.compute_dtype, kv_dtype=cfg.kv_dtype,
                    backend=cfg.backend, feature_source=cfg.feature_source,
                    sampler=cfg.sampler, eos_id=self.tokenizer.eos_id,
                )
            else:
                self.engine = EagleChainEngine(
                    self.params, self.draft_params, self.model_cfg, self.draft_cfg,
                    n_draft=cfg.n_draft, max_seq=cfg.max_seq, batch=cfg.batch,
                    compute_dtype=cfg.compute_dtype, kv_dtype=cfg.kv_dtype,
                    backend=cfg.backend, feature_source=cfg.feature_source,
                    sampler=cfg.sampler, eos_id=self.tokenizer.eos_id,
                )
            if cfg.cycles_per_dispatch > 1 and not cfg.tree_branching:
                # chain + tree2 engines compile a multi-cycle program;
                # generate() picks it up as the default dispatch width
                self.engine.cycles_per_dispatch = int(cfg.cycles_per_dispatch)
            if cfg.batch > 1 and not cfg.tree_branching and not cfg.tree2:
                if cfg.paged:
                    from .runtime.paged_batcher import PagedBatcher

                    mp = -(-cfg.max_seq // cfg.page_size)
                    self.batcher = PagedBatcher(
                        self.engine,
                        n_pages=cfg.kv_pages or cfg.batch * mp,
                        page_size=cfg.page_size,
                    )
                else:
                    from .runtime.scheduler import ContinuousBatcher

                    self.batcher = ContinuousBatcher(self.engine)
        elif cfg.lookahead:
            from .runtime.lookahead import LookaheadEngine

            w_, n_, g_ = cfg.lookahead
            self.engine = LookaheadEngine(
                self.params, self.model_cfg, W=w_, N=n_, G=g_,
                max_seq=cfg.max_seq, compute_dtype=cfg.compute_dtype,
                kv_dtype=cfg.kv_dtype, backend=cfg.backend,
                eos_id=self.tokenizer.eos_id,
            )
        elif self.model_cfg.is_recurrent:  # mamba: constant-size state
            from .runtime.mamba_gen import MambaGenerator

            self.engine = MambaGenerator(
                self.params, self.model_cfg, max_seq=cfg.max_seq,
                backend=cfg.backend, eos_id=self.tokenizer.eos_id,
            )
        else:
            self.engine = Generator(
                self.params, self.model_cfg, max_seq=cfg.max_seq,
                compute_dtype=cfg.compute_dtype, kv_dtype=cfg.kv_dtype,
                backend=cfg.backend, eos_id=self.tokenizer.eos_id,
            )

    # ------------------------------------------------------------------

    def _plain_generator(self) -> Generator:
        """A non-speculative generator over the same target params (grammar
        mode and fallback paths)."""
        if not hasattr(self, "_plain"):
            self._plain = Generator(
                self.params, self.model_cfg, max_seq=self.cfg.max_seq,
                compute_dtype=self.cfg.compute_dtype, kv_dtype=self.cfg.kv_dtype,
                backend=self.cfg.backend, eos_id=self.tokenizer.eos_id,
            )
        return self._plain

    def chat_session(
        self, system: str | None = None, template: str | None = None,
        use_jinja: bool = False,
    ):
        """Multi-turn interactive chat with KV reuse across turns (llama-cli
        conversation mode). Uses the GGUF's embedded chat template."""
        from .runtime.chat import ChatSession

        return ChatSession(
            self._plain_generator() if not isinstance(self.engine, Generator)
            else self.engine,
            self.tokenizer, template=template,
            jinja_src=self.metadata.get("tokenizer.chat_template"),
            use_jinja=use_jinja, system=system,
        )

    def generate_text(
        self,
        prompt: str,
        max_new_tokens: int = 256,
        sampler: SamplerConfig | None = None,
        seed: int = 0,
        grammar: str | None = None,
        json_schema: dict | str | None = None,
        session_path: str | None = None,
        session_cache_all: bool = False,
    ) -> tuple[str, dict]:
        ids = self.tokenizer.encode(prompt)
        if grammar or json_schema:
            from .runtime.grammar import Grammar
            from .runtime.json_schema import json_schema_to_gbnf
            from .runtime.speculative import EagleChainEngine

            gbnf = grammar or json_schema_to_gbnf(json_schema)
            g = Grammar(gbnf)
            if isinstance(self.engine, EagleChainEngine):
                # grammar COMPOSED with speculation: draft freely, validate
                # every emitted token through the automaton host-side
                out, stats = self.engine.generate_constrained(
                    ids, g, self.tokenizer, max_new_tokens=max_new_tokens,
                    seed=seed,
                )
            else:
                gen = self._plain_generator()
                out = gen.generate_constrained(
                    ids, g, self.tokenizer, max_new_tokens=max_new_tokens,
                    sampler=sampler or self.cfg.sampler, seed=seed,
                )
                stats = {"constrained": True}
            text = self.tokenizer.decode(
                [t for t in out if t != self.tokenizer.eos_id], skip_special=True
            )
            return text, stats
        if session_path and not isinstance(self.engine, Generator):
            # prompt-cache sessions ride the plain generator (main.cpp is the
            # non-speculative binary); reuse the target-only path
            gen = self._plain_generator()
            out = gen.generate(
                ids, max_new_tokens=max_new_tokens,
                sampler=sampler or self.cfg.sampler, seed=seed,
                session_path=session_path, session_cache_all=session_cache_all,
            )
            stats = {"session_prefix_reused": gen.session_prefix_reused}
        elif isinstance(self.engine, Generator):
            out = self.engine.generate(
                ids, max_new_tokens=max_new_tokens,
                sampler=sampler or self.cfg.sampler, seed=seed,
                session_path=session_path, session_cache_all=session_cache_all,
            )
            stats = (
                {"session_prefix_reused": self.engine.session_prefix_reused}
                if session_path else {}
            )
        else:
            out, stats = self.engine.generate(ids, max_new_tokens=max_new_tokens, seed=seed)
        text = self.tokenizer.decode(
            [t for t in out if t != self.tokenizer.eos_id], skip_special=True
        )
        return text, stats


    # ------------------------------------------------------------------

    def infill(
        self,
        input_prefix: str,
        input_suffix: str,
        max_new_tokens: int = 128,
        spm_infill: bool = False,
        seed: int = 0,
        top_k: int = 64,
    ) -> str:
        """Fill-in-the-middle completion (examples/infill + the /infill server
        endpoint). The prompt is [FIM_PRE]prefix[FIM_SUF]suffix[FIM_MID]
        (or SPM order), and each step runs the reference's infill sampler
        transform over the top-k candidates (src/llama-sampling.cpp:2246)."""
        import numpy as np

        from .models.llama import llama_forward
        from .runtime.infill import (
            fim_tokens_from_metadata,
            format_infill,
            infill_filter,
        )
        from .runtime.kvcache import causal_mask_from_tags

        pieces = [self.tokenizer.piece(i) for i in range(self.model_cfg.vocab_size)]
        fim = fim_tokens_from_metadata(self.metadata, pieces)
        if fim is None:
            raise ValueError("model vocab has no FIM tokens — cannot infill")
        pre_ids = self.tokenizer.encode(input_prefix, add_bos=False)
        suf_ids = self.tokenizer.encode(input_suffix, add_bos=False)
        ids = format_infill(
            pre_ids, suf_ids, fim, spm_infill=spm_infill,
            bos_id=self.tokenizer.bos_id, add_bos=getattr(self.tokenizer, "add_bos", False),
        )
        is_eog = np.zeros(self.model_cfg.vocab_size, bool)
        if self.tokenizer.eos_id >= 0:
            is_eog[self.tokenizer.eos_id] = True
        eot = self.metadata.get("tokenizer.ggml.eot_token_id")
        eot_id = int(eot) if eot is not None else self.tokenizer.eos_id
        if eot is not None:
            is_eog[int(eot)] = True

        gen = self._plain_generator()
        from .runtime.generate import pad_bucket

        n = len(ids)
        t = pad_bucket(n)
        padded = np.zeros((1, t), np.int32)
        padded[0, :n] = ids
        gen.kv = gen.kv.rollback(keep_below=jnp.zeros((1,), jnp.int32))
        logits, _, gen.kv = gen._prefill_jit(
            gen.params, gen.kv, jnp.asarray(padded), jnp.asarray([n], np.int32), t=t
        )
        rng = np.random.default_rng(seed)
        out: list[int] = []
        pos = n
        logits = np.asarray(logits)[0]
        for _ in range(max_new_tokens):
            p = np.exp(logits - logits.max())
            p /= p.sum()
            cand = np.argsort(-p)[:top_k]
            f_ids, f_p = infill_filter(cand, p[cand], pieces, is_eog, eot_id)
            tok = int(f_ids[int(np.argmax(f_p))]) if self.cfg.sampler.greedy else int(
                rng.choice(f_ids, p=f_p / f_p.sum())
            )
            if is_eog[tok]:
                break
            out.append(tok)
            if pos + 1 >= self.cfg.max_seq:
                break
            p_arr = jnp.full((1, 1), pos, jnp.int32)
            gen.kv = gen.kv.with_tags(p_arr, p_arr)
            m = causal_mask_from_tags(gen.kv.slot_pos, p_arr)
            fo = llama_forward(
                self.params, self.model_cfg, jnp.full((1, 1), tok, jnp.int32),
                p_arr, gen.kv, p_arr, m,
                backend=self.cfg.backend, compute_dtype=self.cfg.compute_dtype,
            )
            gen.kv = fo.kv
            logits = np.asarray(fo.logits)[0, 0]
            pos += 1
        return self.tokenizer.decode(out, skip_special=True)

    def rerank(self, query: str, documents: list[str]) -> list[float]:
        """Relevance scores query→documents (the reference's /rerank with
        LLAMA_POOLING_TYPE_RANK, src/llama.cpp:1560-1585).

        Each document is scored over the reference's rerank prompt
        [BOS] query [EOS] [SEP] doc [EOS] (server/utils.hpp:233-245). With a
        classification head in the GGUF (`cls`/`cls_out` tensors) the score is
        the rank-pooling head over the pooled hidden state; without one
        (causal LLMs) the score falls back to embedding cosine similarity —
        the reference simply refuses in that case, asserting model.cls."""
        import numpy as np

        cls_w = self.params.get("cls")
        if cls_w is None:
            qv = self.embed([query])[0]
            dvs = self.embed(documents)
            return [float(np.dot(qv, dv)) for dv in dvs]

        from .models.llama import llama_forward
        from .runtime.generate import pad_bucket
        from .runtime.kvcache import KVCache, causal_mask_from_tags

        tok = self.tokenizer
        sep = self.metadata.get("tokenizer.ggml.seperator_token_id")
        sep_id = int(sep) if sep is not None else tok.eos_id
        q_ids = tok.encode(query, add_bos=False)
        scores = []
        for doc in documents:
            d_ids = tok.encode(doc, add_bos=False)
            ids = [tok.bos_id] + q_ids + [tok.eos_id, sep_id] + d_ids + [tok.eos_id]
            n = len(ids)
            t = pad_bucket(n)
            padded = np.zeros((1, t), np.int32)
            padded[0, :n] = ids
            kv = KVCache.create(
                self.model_cfg.n_layers, 1, t, self.model_cfg.n_kv_heads,
                self.model_cfg.head_dim, self.cfg.kv_dtype,
                v_head_dim=self.model_cfg.v_dim,
            )
            pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (1, 1))
            kv = kv.with_tags(pos, pos, valid=pos < n)
            mask = causal_mask_from_tags(kv.slot_pos, pos)
            fo = llama_forward(
                self.params, self.model_cfg, jnp.asarray(padded), pos, kv, pos,
                mask, backend=self.cfg.backend,
                compute_dtype=self.cfg.compute_dtype, return_logits=False,
            )
            h = np.asarray(fo.hidden)[0, 0]  # CLS-position pooled state
            x = np.tanh(np.asarray(cls_w, np.float32) @ h + np.asarray(self.params.get("cls_b"), np.float32))
            out_w = self.params.get("cls_out")
            if out_w is not None:
                x = np.asarray(out_w, np.float32) @ x + np.asarray(self.params.get("cls_out_b"), np.float32)
            scores.append(float(np.asarray(x).reshape(-1)[0]))
        return scores

    def embed(self, texts: list[str], pooling: str = "mean", normalize: bool = True):
        """Sequence embeddings (llama-embedding equivalent: pooled hidden
        states; pooling mean|last)."""
        import jax
        import numpy as np

        from .models.llama import llama_forward
        from .runtime.generate import pad_bucket
        from .runtime.kvcache import KVCache, causal_mask_from_tags

        if self.model_cfg.arch in ("bert", "nomic-bert"):
            # encoder embedding model: bidirectional attention + pooling
            from .models.bert import bert_forward

            pool = {1: "mean", 2: "cls"}.get(
                self.metadata.get(f"{self.model_cfg.arch}.pooling_type"), pooling
            )
            out = []
            for text in texts:
                ids = np.asarray(self.tokenizer.encode(text), np.int32)
                t = pad_bucket(len(ids))
                padded = np.zeros((1, t), np.int32)
                padded[0, : len(ids)] = ids
                bo = bert_forward(
                    self.params, self.model_cfg, jnp.asarray(padded),
                    jnp.asarray([len(ids)], np.int32),
                    backend=self.cfg.backend, pooling=pool,
                )
                v = np.asarray(bo.pooled)[0]
                if normalize:
                    v = v / (np.linalg.norm(v) + 1e-9)
                out.append(v.astype(np.float32))
            return out

        out = []
        for text in texts:
            ids = np.asarray(self.tokenizer.encode(text), np.int32)
            t = pad_bucket(len(ids))
            padded = np.zeros((1, t), np.int32)
            padded[0, : len(ids)] = ids
            kv = KVCache.create(
                self.model_cfg.n_layers, 1, t, self.model_cfg.n_kv_heads,
                self.model_cfg.head_dim, self.cfg.kv_dtype,
                v_head_dim=self.model_cfg.v_dim,
            )
            pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (1, 1))
            valid = pos < len(ids)
            kv = kv.with_tags(pos, pos, valid=valid)
            mask = causal_mask_from_tags(kv.slot_pos, pos)
            fo = llama_forward(
                self.params, self.model_cfg, jnp.asarray(padded), pos, kv, pos, mask,
                backend=self.cfg.backend, compute_dtype=self.cfg.compute_dtype,
                return_logits=False,
            )
            h = np.asarray(fo.hidden)[0, : len(ids)]
            v = h.mean(0) if pooling == "mean" else h[-1]
            if normalize:
                v = v / (np.linalg.norm(v) + 1e-9)
            out.append(v.astype(np.float32))
        return out
