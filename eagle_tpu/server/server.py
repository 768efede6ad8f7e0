"""HTTP inference server — the llama-server equivalent.

Endpoints (subset of examples/server/server.cpp's surface, OpenAI-compatible):
  POST /v1/completions        text completion (stream or not)
  POST /v1/chat/completions   chat (simple template application)
  POST /completion            llama.cpp-native completion
  POST /tokenize, /detokenize
  GET  /health, /props, /metrics (Prometheus text format)

Architecture: aiohttp front, a task queue drained by a single inference worker
(the reference's server_queue/update_slots split, server.cpp:1491,2764).
Requests are processed through the engine; generated tokens stream back over
SSE. Slot-level continuous batching lands on top of this queue design."""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from ..runtime.sampling import SamplerConfig

try:
    from aiohttp import web
except ImportError:  # pragma: no cover
    web = None


@dataclass
class ServerMetrics:
    requests_total: int = 0
    tokens_generated_total: int = 0
    tokens_prompt_total: int = 0
    busy: bool = False
    started_at: float = field(default_factory=time.time)

    def prometheus(self) -> str:
        lines = [
            "# TYPE eagle_tpu_requests_total counter",
            f"eagle_tpu_requests_total {self.requests_total}",
            "# TYPE eagle_tpu_tokens_generated_total counter",
            f"eagle_tpu_tokens_generated_total {self.tokens_generated_total}",
            "# TYPE eagle_tpu_tokens_prompt_total counter",
            f"eagle_tpu_tokens_prompt_total {self.tokens_prompt_total}",
            "# TYPE eagle_tpu_uptime_seconds gauge",
            f"eagle_tpu_uptime_seconds {time.time() - self.started_at:.1f}",
        ]
        return "\n".join(lines) + "\n"


def _sampler_from_request(body: dict[str, Any], default: SamplerConfig) -> SamplerConfig:
    """Per-request sampler overrides — reads the SAME parameter table as the
    CLI flags (utils/args.SAMPLING_REQUEST_KEYS; server.cpp:272-278)."""
    from ..utils.args import sampler_from_request

    return sampler_from_request(body, default)


def _tool_system_prompt(tools: list[dict], fmt: str) -> str:
    """Render tool schemas into a system preamble for templates that don't
    carry tools natively (the reference's generic handler injects the same
    kind of JSON tool listing, common/chat.cpp:660-710)."""
    decls = json.dumps(
        [t.get("function", t) for t in tools], ensure_ascii=False, indent=None
    )
    if fmt == "hermes_2_pro":
        how = ('To call a tool, reply with '
               '<tool_call>{"name": <name>, "arguments": <args-object>}</tool_call>')
    elif fmt == "mistral_nemo":
        how = ('To call tools, reply with '
               '[TOOL_CALLS][{"name": <name>, "arguments": <args-object>}]')
    elif fmt.startswith("llama_3"):
        how = 'To call a tool, reply with {"name": <name>, "parameters": <args-object>}'
    else:
        how = ('Respond with JSON: {"tool_call": {"name": <name>, '
               '"arguments": <args-object>}} to call a tool, or '
               '{"response": <text>} to answer directly.')
    return f"You have access to these tools:\n{decls}\n{how}"


def apply_chat_template(messages: list[dict], template: str = "vicuna") -> str:
    """Minimal template application (the reference carries ~30 templates in
    src/llama-chat.cpp; vicuna + chatml cover our target models)."""
    if template == "chatml":
        out = []
        for m in messages:
            out.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
        out.append("<|im_start|>assistant\n")
        return "".join(out)
    # vicuna v1.1 style
    sys_txt = "A chat between a curious user and an artificial intelligence assistant. The assistant gives helpful, detailed, and polite answers to the user's questions."
    parts = []
    for m in messages:
        if m["role"] == "system":
            sys_txt = m["content"]
        elif m["role"] == "user":
            parts.append(f"USER: {m['content']}")
        else:
            parts.append(f"ASSISTANT: {m['content']}</s>")
    return sys_txt + " " + " ".join(parts) + " ASSISTANT:"


class InferenceServer:
    def __init__(self, engine, model_name: str = "eagle-tpu", use_jinja: bool = False):
        self.engine = engine
        self.model_name = model_name
        #: execute the GGUF's embedded chat template verbatim (--jinja)
        self.use_jinja = use_jinja
        self.metrics = ServerMetrics()
        self.queue: asyncio.Queue = asyncio.Queue()
        self._worker_task = None
        self.batch_worker = None
        if getattr(engine, "batcher", None) is not None:
            from .batch_worker import BatcherWorker

            self.batch_worker = BatcherWorker(engine.batcher)
            self.batch_worker.start()

    # -- worker ------------------------------------------------------------

    async def _worker(self):
        while True:
            job = await self.queue.get()
            fut, fn = job
            try:
                self.metrics.busy = True
                result = await asyncio.get_event_loop().run_in_executor(None, fn)
                fut.set_result(result)
            except Exception as e:  # surface to the request
                fut.set_exception(e)
            finally:
                self.metrics.busy = False
                self.queue.task_done()

    async def _run(self, fn):
        fut = asyncio.get_event_loop().create_future()
        await self.queue.put((fut, fn))
        return await fut

    # -- handlers ----------------------------------------------------------

    async def handle_index(self, request):
        """GET / — the built-in chat web UI (the reference serves its SPA
        from examples/server/public/index.html.gz the same way)."""
        from .webui import INDEX_HTML

        return web.Response(text=INDEX_HTML, content_type="text/html")

    async def handle_health(self, request):
        return web.json_response({"status": "ok"})

    async def handle_props(self, request):
        mc = self.engine.model_cfg
        return web.json_response(
            {
                "model": self.model_name,
                "n_ctx": self.engine.cfg.max_seq,
                "n_embd": mc.n_embd,
                "n_layers": mc.n_layers,
                "vocab_size": mc.vocab_size,
                "speculative": self.engine.draft_params is not None,
            }
        )

    async def handle_metrics(self, request):
        return web.Response(text=self.metrics.prometheus(), content_type="text/plain")

    async def handle_tokenize(self, request):
        body = await request.json()
        ids = self.engine.tokenizer.encode(body.get("content", ""))
        return web.json_response({"tokens": ids})

    async def handle_detokenize(self, request):
        body = await request.json()
        text = self.engine.tokenizer.decode(body.get("tokens", []))
        return web.json_response({"content": text})

    async def _complete(self, prompt: str, body: dict) -> dict:
        sampler = _sampler_from_request(body, self.engine.cfg.sampler)
        max_new = int(body.get("max_tokens", body.get("n_predict", 128)))
        seed = int(body.get("seed", 0))
        self.metrics.requests_total += 1
        t0 = time.time()
        ids = self.engine.tokenizer.encode(prompt)
        self.metrics.tokens_prompt_total += len(ids)

        grammar = body.get("grammar")
        schema = body.get("json_schema") or (
            body.get("response_format", {}).get("schema")
            if isinstance(body.get("response_format"), dict)
            else None
        )
        if grammar or schema:
            def gwork():
                text, st = self.engine.generate_text(
                    prompt, max_new_tokens=max_new, sampler=sampler, seed=seed,
                    grammar=grammar, json_schema=schema,
                )
                return self.engine.tokenizer.encode(text, add_bos=False), st

            toks, stats = await self._run(gwork)
        elif self.batch_worker is not None:
            toks, stats = await self._run_batched(ids, max_new, body)
        else:

            def work():
                if self.engine.draft_params is not None:
                    toks, stats = self.engine.engine.generate(ids, max_new_tokens=max_new, seed=seed)
                else:
                    toks = self.engine.engine.generate(
                        ids, max_new_tokens=max_new, sampler=sampler, seed=seed
                    )
                    stats = {}
                return toks, stats

            toks, stats = await self._run(work)
        self.metrics.tokens_generated_total += len(toks)
        eos = self.engine.tokenizer.eos_id
        text = self.engine.tokenizer.decode([t for t in toks if t != eos], skip_special=True)
        return {
            "text": text,
            "tokens": toks,
            "stats": stats,
            "timings": {
                "total_s": time.time() - t0,
                "predicted_n": len(toks),
                "predicted_per_second": len(toks) / max(1e-9, time.time() - t0),
            },
        }

    async def _run_batched(self, ids, max_new, body):
        """Submit to the continuous-batching worker; returns (tokens, stats)."""
        from .batch_worker import BatchRequest

        loop = asyncio.get_event_loop()
        fut = loop.create_future()

        def on_token(_tok):
            pass

        def on_done(tokens):
            loop.call_soon_threadsafe(fut.set_result, list(tokens))

        self.batch_worker.submit(
            BatchRequest(prompt_ids=ids, max_new=max_new, on_token=on_token, on_done=on_done)
        )
        toks = await fut
        return toks, {"batched": True}

    async def _stream_chat(self, request, prompt: str, body: dict):
        """OpenAI chat.completion.chunk SSE streaming (`stream: true` on
        /v1/chat/completions — the contract the built-in web UI speaks)."""
        sampler = _sampler_from_request(body, self.engine.cfg.sampler)
        max_new = int(body.get("max_tokens", body.get("n_predict", 128)))
        seed = int(body.get("seed", 0))
        self.metrics.requests_total += 1
        ids = self.engine.tokenizer.encode(prompt)
        loop = asyncio.get_event_loop()
        q: asyncio.Queue = asyncio.Queue()

        def on_token(tok):
            loop.call_soon_threadsafe(q.put_nowait, tok)

        def work():
            eng = self.engine.engine
            if self.engine.draft_params is not None:
                toks, _ = eng.generate(ids, max_new_tokens=max_new, seed=seed, on_token=on_token)
            else:
                toks = eng.generate(
                    ids, max_new_tokens=max_new, sampler=sampler, seed=seed, on_token=on_token
                )
            return toks

        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        fut = loop.run_in_executor(None, work)
        eos = self.engine.tokenizer.eos_id
        cid = f"chatcmpl-{uuid.uuid4().hex[:12]}"
        sent = 0
        while True:
            try:
                tok = await asyncio.wait_for(q.get(), timeout=0.2)
            except asyncio.TimeoutError:
                if fut.done() and q.empty():
                    break
                continue
            sent += 1
            piece = self.engine.tokenizer.piece(tok) if tok != eos else ""
            chunk = {
                "id": cid, "object": "chat.completion.chunk",
                "created": int(time.time()), "model": self.model_name,
                "choices": [{"index": 0, "delta": {"content": piece},
                             "finish_reason": None}],
            }
            await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
            if tok == eos:
                break
        await fut
        self.metrics.tokens_generated_total += sent
        final = {
            "id": cid, "object": "chat.completion.chunk",
            "created": int(time.time()), "model": self.model_name,
            "choices": [{"index": 0, "delta": {}, "finish_reason": "stop"}],
        }
        await resp.write(f"data: {json.dumps(final)}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    async def _stream_completion(self, request, prompt: str, body: dict):
        """SSE streaming (llama.cpp's `stream: true` contract)."""
        sampler = _sampler_from_request(body, self.engine.cfg.sampler)
        max_new = int(body.get("max_tokens", body.get("n_predict", 128)))
        seed = int(body.get("seed", 0))
        self.metrics.requests_total += 1
        ids = self.engine.tokenizer.encode(prompt)
        loop = asyncio.get_event_loop()
        q: asyncio.Queue = asyncio.Queue()

        def on_token(tok):
            loop.call_soon_threadsafe(q.put_nowait, tok)

        def work():
            eng = self.engine.engine
            if self.engine.draft_params is not None:
                toks, _ = eng.generate(ids, max_new_tokens=max_new, seed=seed, on_token=on_token)
            else:
                toks = eng.generate(
                    ids, max_new_tokens=max_new, sampler=sampler, seed=seed, on_token=on_token
                )
            return toks

        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        fut = loop.run_in_executor(None, work)
        eos = self.engine.tokenizer.eos_id
        sent = 0
        while True:
            try:
                tok = await asyncio.wait_for(q.get(), timeout=0.2)
            except asyncio.TimeoutError:
                if fut.done() and q.empty():
                    break
                continue
            sent += 1
            piece = self.engine.tokenizer.piece(tok) if tok != eos else ""
            payload = json.dumps({"content": piece, "token": int(tok), "stop": False})
            await resp.write(f"data: {payload}\n\n".encode())
            if tok == eos:
                break
        await fut
        self.metrics.tokens_generated_total += sent
        await resp.write(
            f"data: {json.dumps({'content': '', 'stop': True, 'tokens_predicted': sent})}\n\n".encode()
        )
        await resp.write_eof()
        return resp

    async def handle_completion(self, request):
        body = await request.json()
        if body.get("stream"):
            return await self._stream_completion(request, body.get("prompt", ""), body)
        res = await self._complete(body.get("prompt", ""), body)
        return web.json_response(
            {
                "content": res["text"],
                "tokens_predicted": res["timings"]["predicted_n"],
                "stop": True,
                "timings": res["timings"],
                "speculative": res["stats"],
            }
        )

    async def handle_v1_completions(self, request):
        body = await request.json()
        res = await self._complete(body.get("prompt", ""), body)
        return web.json_response(
            {
                "id": f"cmpl-{uuid.uuid4().hex[:12]}",
                "object": "text_completion",
                "created": int(time.time()),
                "model": self.model_name,
                "choices": [
                    {"index": 0, "text": res["text"], "finish_reason": "stop"}
                ],
                "usage": {
                    "prompt_tokens": self.metrics.tokens_prompt_total,
                    "completion_tokens": res["timings"]["predicted_n"],
                },
            }
        )

    async def handle_v1_chat(self, request):
        body = await request.json()
        from .chat_templates import apply_template
        from .tool_calls import build_tool_grammar, detect_format
        from .tool_calls import parse as parse_tool_output

        jinja_src = self.engine.metadata.get("tokenizer.chat_template")
        messages = list(body.get("messages", []))
        tools = body.get("tools") or []
        tool_choice = body.get("tool_choice", "auto")
        fmt = "content_only"
        if tools and tool_choice != "none":
            # format detection follows the template markers
            # (common_chat_templates_apply_jinja, common/chat.cpp:1436-1496)
            fmt = detect_format(jinja_src or "", has_tools=True)
            messages = [
                {"role": "system", "content": _tool_system_prompt(tools, fmt)}
            ] + messages
            if tool_choice == "required":
                # constrain generation to a well-formed call (the reference
                # builds the same schema-derived GBNF, chat.cpp:1356-1378)
                g, _ = build_tool_grammar(tools, fmt, required=True)
                body = {**body, "grammar": g.gbnf_source}
        tok = self.engine.tokenizer
        prompt = apply_template(
            messages, template=body.get("template"), jinja_src=jinja_src,
            use_jinja=self.use_jinja,
            bos_token=tok.decode([tok.bos_id]) if getattr(tok, "bos_id", -1) >= 0 else "",
            eos_token=tok.decode([tok.eos_id]) if getattr(tok, "eos_id", -1) >= 0 else "",
            tools=tools or None,
        )
        if body.get("stream") and not tools:
            return await self._stream_chat(request, prompt, body)
        res = await self._complete(prompt, body)
        msg = parse_tool_output(res["text"].strip(), fmt if tools else "content_only")
        message: dict[str, Any] = {"role": "assistant", "content": msg.content or None}
        if msg.reasoning_content:
            message["reasoning_content"] = msg.reasoning_content
        if msg.tool_calls:
            message["tool_calls"] = [tc.as_openai() for tc in msg.tool_calls]
        else:
            message["content"] = res["text"].strip()
        return web.json_response(
            {
                "id": f"chatcmpl-{uuid.uuid4().hex[:12]}",
                "object": "chat.completion",
                "created": int(time.time()),
                "model": self.model_name,
                "choices": [
                    {
                        "index": 0,
                        "message": message,
                        "finish_reason": "tool_calls" if msg.tool_calls else "stop",
                    }
                ],
            }
        )

    async def handle_infill(self, request):
        """Fill-in-the-middle endpoint (server.cpp's /infill): input_prefix +
        input_suffix -> middle completion via the FIM special tokens."""
        body = await request.json()
        self.metrics.requests_total += 1

        def work():
            return self.engine.infill(
                body.get("input_prefix", ""),
                body.get("input_suffix", ""),
                max_new_tokens=int(body.get("n_predict", body.get("max_tokens", 128))),
                spm_infill=bool(body.get("spm_infill", False)),
                seed=int(body.get("seed", 0)),
            )

        try:
            content = await self._run(work)
        except ValueError as e:  # vocab without FIM tokens
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response({"content": content, "stop": True})

    async def handle_rerank(self, request):
        """Jina/TEI-style rerank endpoint (server.cpp:4221 handle_rerank):
        {"query": ..., "documents"|"texts": [...], "top_n": k}."""
        body = await request.json()
        query = body.get("query")
        if not isinstance(query, str):
            return web.json_response({"error": '"query" must be a string'}, status=400)
        docs = body.get("documents") or body.get("texts") or []
        if not docs:
            return web.json_response(
                {"error": '"documents" must be a non-empty string array'}, status=400
            )
        self.metrics.requests_total += 1
        scores = await self._run(lambda: self.engine.rerank(query, docs))
        ranked = sorted(range(len(docs)), key=lambda i: -scores[i])
        top_n = int(body.get("top_n", len(docs)))
        results = [
            {"index": i, "relevance_score": scores[i]}
            | ({"document": {"text": docs[i]}} if body.get("return_documents") else {})
            for i in ranked[:top_n]
        ]
        return web.json_response({"model": self.model_name, "results": results})

    async def handle_v1_embeddings(self, request):
        body = await request.json()
        inputs = body.get("input", body.get("content", ""))
        if isinstance(inputs, str):
            inputs = [inputs]
        vecs = await self._run(lambda: self.engine.embed(inputs))
        return web.json_response(
            {
                "object": "list",
                "model": self.model_name,
                "data": [
                    {"object": "embedding", "index": i, "embedding": v.tolist()}
                    for i, v in enumerate(vecs)
                ],
            }
        )

    async def handle_slots(self, request):
        """GET /slots — slot states (server.cpp /slots endpoint)."""
        if self.batch_worker is None:
            return web.json_response([], status=200)

        def snap(b):
            return [
                {
                    "id": s.id, "state": s.state, "request_id": s.request_id,
                    "n_generated": len(s.generated), "prompt_len": s.prompt_len,
                }
                for s in b.slots
            ]

        data = await asyncio.get_event_loop().run_in_executor(
            None, self.batch_worker.call(snap).result
        )
        return web.json_response(data)

    async def handle_slot_action(self, request):
        """POST /slots/{id}?action=save|restore|erase — per-slot state
        save/restore (server.cpp:3690,3760; llama_state_seq_* underneath)."""
        if self.batch_worker is None:
            return web.json_response({"error": "no batcher"}, status=501)
        slot_id = int(request.match_info["id"])
        action = request.query.get("action", "")
        body = await request.json() if request.can_read_body else {}
        filename = body.get("filename", f"slot_{slot_id}.bin")

        if action == "save":
            fut = self.batch_worker.call(lambda b: b.save_slot(slot_id, filename))
        elif action == "restore":
            def restore(b):
                s = b.restore_slot(filename, slot_id)
                b.resume_slot(slot_id)
                return {"id": s.id, "state": s.state, "n_generated": len(s.generated)}

            fut = self.batch_worker.call(restore)
        elif action == "erase":
            def erase(b):
                s = b.slots[slot_id]
                if s.request_id:
                    b.abort(s.request_id)
                elif s.state != "free":
                    if s in b._prefill_queue:
                        b._prefill_queue.remove(s)
                    s.state = "free"
                    b._active_mask[slot_id] = False
                    b._on_slot_freed(s)  # release pooled pages (paged batcher)
                return {"id": slot_id, "state": "free"}

            fut = self.batch_worker.call(erase)
        else:
            return web.json_response({"error": f"unknown action {action!r}"}, status=400)
        try:
            res = await asyncio.get_event_loop().run_in_executor(None, fut.result)
        except ValueError as e:
            # e.g. paged save on a freed slot (its pages went back to the pool)
            return web.json_response({"error": str(e)}, status=409)
        return web.json_response({"id": slot_id, "result": res})

    # -- app ---------------------------------------------------------------

    def build_app(self):
        app = web.Application()
        app.router.add_get("/", self.handle_index)
        app.router.add_get("/index.html", self.handle_index)
        app.router.add_get("/health", self.handle_health)
        app.router.add_get("/props", self.handle_props)
        app.router.add_get("/metrics", self.handle_metrics)
        app.router.add_post("/tokenize", self.handle_tokenize)
        app.router.add_post("/detokenize", self.handle_detokenize)
        app.router.add_post("/completion", self.handle_completion)
        app.router.add_post("/v1/completions", self.handle_v1_completions)
        app.router.add_post("/v1/chat/completions", self.handle_v1_chat)
        app.router.add_post("/infill", self.handle_infill)
        app.router.add_post("/rerank", self.handle_rerank)
        app.router.add_post("/v1/rerank", self.handle_rerank)
        app.router.add_post("/v1/embeddings", self.handle_v1_embeddings)
        app.router.add_post("/embedding", self.handle_v1_embeddings)
        app.router.add_get("/slots", self.handle_slots)
        app.router.add_post("/slots/{id}", self.handle_slot_action)

        async def on_startup(app):
            self._worker_task = asyncio.create_task(self._worker())

        async def on_cleanup(app):
            # cancel the worker before the loop closes — an orphaned task
            # raises "Event loop is closed" from its next queue.get otherwise
            if self._worker_task is not None:
                self._worker_task.cancel()
                try:
                    await self._worker_task
                except asyncio.CancelledError:
                    pass
                self._worker_task = None
            if self.batch_worker is not None:
                self.batch_worker.shutdown()

        app.on_startup.append(on_startup)
        app.on_cleanup.append(on_cleanup)
        return app

    def run(self, host="0.0.0.0", port=8080):
        web.run_app(self.build_app(), host=host, port=port)


def main(argv=None):
    import argparse

    from ..api import Engine, EngineConfig

    from ..utils.args import apply_log_args, build_parser

    ap = build_parser("server")
    args = ap.parse_args(argv)
    apply_log_args(args)

    cfg = EngineConfig(
        model_path=args.model,
        draft_path=args.draft,
        n_draft=args.n_draft,
        cycles_per_dispatch=args.cycles_per_dispatch,
        tree_branching=tuple(int(x) for x in args.tree.split(",")) if args.tree else None,
        max_seq=args.ctx,
        batch=args.parallel,
        paged=args.paged,
        kv_pages=args.kv_pages,
        page_size=args.page_size,
    )
    InferenceServer(Engine(cfg), use_jinja=args.jinja).run(host=args.host, port=args.port)


if __name__ == "__main__":
    main()
