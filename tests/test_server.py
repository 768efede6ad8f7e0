"""End-to-end server/API/CLI tests with a complete tiny GGUF (model +
tokenizer), mirroring the reference's pytest server suite
(examples/server/tests/unit/)."""

import json
import socket
import threading
import time
import urllib.request

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import GGMLType, Keys, TokenType


def _vocab_metadata():
    tokens = ["<unk>", "<s>", "</s>"]
    ttypes = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        ttypes.append(TokenType.BYTE)
        scores.append(0.0)
    words = ["▁", "a", "b", "c", "he", "ll", "o", "▁hello", "▁world", "ab", "bc", "d", "e"]
    for i, w in enumerate(words):
        tokens.append(w)
        ttypes.append(TokenType.NORMAL)
        scores.append(-float(i + 1))
    return {
        Keys.Tokenizer.MODEL: "llama",
        Keys.Tokenizer.LIST: tokens,
        Keys.Tokenizer.SCORES: np.asarray(scores, np.float32),
        Keys.Tokenizer.TOKEN_TYPE: np.asarray([int(t) for t in ttypes], np.int32),
        Keys.Tokenizer.BOS_ID: 1,
        Keys.Tokenizer.EOS_ID: 2,
        Keys.Tokenizer.UNK_ID: 0,
        Keys.Tokenizer.ADD_BOS: True,
    }, len(tokens)


@pytest.fixture(scope="module")
def tiny_gguf_pair(tmp_path_factory):
    """(target.gguf, eagle.gguf) with matching vocab."""
    from eagle_tpu.models.config import ModelConfig
    from eagle_tpu.models.hf_convert import config_from_hf, convert_hf_to_gguf

    md, vocab = _vocab_metadata()
    torch.manual_seed(9)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    d = tmp_path_factory.mktemp("models")
    tgt = d / "target.gguf"
    cfg = config_from_hf(hf_cfg)
    convert_hf_to_gguf(model.state_dict(), cfg, tgt, qtype=GGMLType.F32, metadata=md)

    # EAGLE head: random weights, HF-eagle layout
    rng = np.random.default_rng(4)
    D, DH, H, HKV, F = 32, 8, 4, 2, 64
    sd = {
        "embed_tokens.weight": rng.normal(0, 0.02, (vocab, D)).astype(np.float32),
        "fc.weight": rng.normal(0, 0.05, (D, 2 * D)).astype(np.float32),
        "fc.bias": np.zeros(D, np.float32),
        "layers.0.self_attn.q_proj.weight": rng.normal(0, 0.05, (H * DH, D)).astype(np.float32),
        "layers.0.self_attn.k_proj.weight": rng.normal(0, 0.05, (HKV * DH, D)).astype(np.float32),
        "layers.0.self_attn.v_proj.weight": rng.normal(0, 0.05, (HKV * DH, D)).astype(np.float32),
        "layers.0.self_attn.o_proj.weight": rng.normal(0, 0.05, (D, H * DH)).astype(np.float32),
        "layers.0.post_attention_layernorm.weight": np.ones(D, np.float32),
        "layers.0.mlp.gate_proj.weight": rng.normal(0, 0.05, (F, D)).astype(np.float32),
        "layers.0.mlp.up_proj.weight": rng.normal(0, 0.05, (F, D)).astype(np.float32),
        "layers.0.mlp.down_proj.weight": rng.normal(0, 0.05, (D, F)).astype(np.float32),
    }
    ecfg = ModelConfig(
        arch="eagle", vocab_size=vocab, n_embd=D, n_layers=1, n_heads=H,
        n_kv_heads=HKV, head_dim=DH, n_ff=F, rope_dim=DH, n_ctx_train=256,
    )
    egl = d / "eagle.gguf"
    convert_hf_to_gguf(sd, ecfg, egl, qtype=GGMLType.F32, metadata=md, arch="eagle")
    return tgt, egl


def test_engine_plain(tiny_gguf_pair):
    import jax.numpy as jnp

    from eagle_tpu.api import Engine, EngineConfig

    tgt, _ = tiny_gguf_pair
    eng = Engine(EngineConfig(model_path=tgt, max_seq=128, compute_dtype=jnp.float32,
                              kv_dtype=jnp.float32))
    text, stats = eng.generate_text("hello", max_new_tokens=8)
    assert isinstance(text, str)


def test_engine_eagle_chain_matches_plain(tiny_gguf_pair):
    import jax.numpy as jnp

    from eagle_tpu.api import Engine, EngineConfig

    tgt, egl = tiny_gguf_pair
    base = EngineConfig(model_path=tgt, max_seq=128, compute_dtype=jnp.float32,
                        kv_dtype=jnp.float32)
    plain = Engine(base)
    a, _ = plain.generate_text("hello world", max_new_tokens=10)
    import dataclasses

    spec = Engine(dataclasses.replace(base, draft_path=egl, n_draft=3))
    b, stats = spec.generate_text("hello world", max_new_tokens=10)
    assert a == b
    assert stats["n_cycles"] > 0


def test_engine_eagle_tree(tiny_gguf_pair):
    import dataclasses

    import jax.numpy as jnp

    from eagle_tpu.api import Engine, EngineConfig

    tgt, egl = tiny_gguf_pair
    base = EngineConfig(model_path=tgt, max_seq=128, compute_dtype=jnp.float32,
                        kv_dtype=jnp.float32)
    a, _ = Engine(base).generate_text("abc", max_new_tokens=8)
    tree = Engine(dataclasses.replace(base, draft_path=egl, tree_branching=(2, 2)))
    b, _ = tree.generate_text("abc", max_new_tokens=8)
    assert a == b


@pytest.fixture(scope="module")
def server(tiny_gguf_pair):
    import jax.numpy as jnp

    from eagle_tpu.api import Engine, EngineConfig
    from eagle_tpu.server.server import InferenceServer
    from aiohttp import web
    import asyncio

    tgt, egl = tiny_gguf_pair
    eng = Engine(EngineConfig(model_path=tgt, draft_path=egl, n_draft=2, max_seq=128,
                              compute_dtype=jnp.float32, kv_dtype=jnp.float32))
    srv = InferenceServer(eng, model_name="tiny")
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    loop = asyncio.new_event_loop()

    holder = {}

    def run():
        asyncio.set_event_loop(loop)
        runner = holder["runner"] = web.AppRunner(srv.build_app())
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", port)
        loop.run_until_complete(site.start())
        loop.run_forever()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            urllib.request.urlopen(base + "/health", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    yield base
    asyncio.run_coroutine_threadsafe(holder["runner"].cleanup(), loop).result(30)
    loop.call_soon_threadsafe(loop.stop)


def _post(url, body):
    req = urllib.request.Request(
        url, json.dumps(body).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_server_health_props_metrics(server):
    health = json.loads(urllib.request.urlopen(server + "/health").read())
    assert health["status"] == "ok"
    props = json.loads(urllib.request.urlopen(server + "/props").read())
    assert props["speculative"] is True
    metrics = urllib.request.urlopen(server + "/metrics").read().decode()
    assert "eagle_tpu_requests_total" in metrics


def test_server_tokenize_roundtrip(server):
    toks = _post(server + "/tokenize", {"content": "hello world"})["tokens"]
    text = _post(server + "/detokenize", {"tokens": toks})["content"]
    assert "hello" in text


def test_server_completion(server):
    res = _post(server + "/completion", {"prompt": "hello", "n_predict": 6, "temperature": 0})
    assert res["stop"] is True
    assert res["tokens_predicted"] >= 1
    assert "speculative" in res


def test_server_openai_endpoints(server):
    res = _post(
        server + "/v1/completions",
        {"prompt": "hello", "max_tokens": 4, "temperature": 0},
    )
    assert res["object"] == "text_completion"
    res = _post(
        server + "/v1/chat/completions",
        {"messages": [{"role": "user", "content": "hi"}], "max_tokens": 4, "temperature": 0},
    )
    assert res["choices"][0]["message"]["role"] == "assistant"


@pytest.fixture(scope="module")
def batched_server(tiny_gguf_pair):
    import asyncio
    import jax.numpy as jnp
    from aiohttp import web

    from eagle_tpu.api import Engine, EngineConfig
    from eagle_tpu.server.server import InferenceServer

    tgt, egl = tiny_gguf_pair
    eng = Engine(EngineConfig(model_path=tgt, draft_path=egl, n_draft=2, batch=3,
                              max_seq=128, compute_dtype=jnp.float32, kv_dtype=jnp.float32))
    assert eng.batcher is not None
    srv = InferenceServer(eng, model_name="tiny-batched")
    sock = socket.socket(); sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]; sock.close()
    loop = asyncio.new_event_loop()

    holder = {}

    def run():
        asyncio.set_event_loop(loop)
        runner = holder["runner"] = web.AppRunner(srv.build_app())
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", port)
        loop.run_until_complete(site.start())
        loop.run_forever()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            urllib.request.urlopen(base + "/health", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    yield base
    asyncio.run_coroutine_threadsafe(holder["runner"].cleanup(), loop).result(30)
    loop.call_soon_threadsafe(loop.stop)


def test_batched_server_concurrent_requests(batched_server):
    import concurrent.futures

    def go(prompt):
        return _post(batched_server + "/completion",
                     {"prompt": prompt, "n_predict": 6, "temperature": 0})

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        results = list(ex.map(go, ["hello", "world", "abc", "hello abc"]))
    for r in results:
        assert r["tokens_predicted"] >= 1
    # same prompt twice must give identical completions (greedy, slot isolation)
    a = go("hello")
    b = go("hello")
    assert a["content"] == b["content"]


@pytest.fixture(scope="module")
def paged_server(tiny_gguf_pair):
    import asyncio
    import jax.numpy as jnp
    from aiohttp import web

    from eagle_tpu.api import Engine, EngineConfig
    from eagle_tpu.server.server import InferenceServer

    tgt, egl = tiny_gguf_pair
    # pool smaller than dense capacity (3 slots x 128/16 = 24 pages dense)
    eng = Engine(EngineConfig(model_path=tgt, draft_path=egl, n_draft=2, batch=3,
                              max_seq=128, compute_dtype=jnp.float32,
                              kv_dtype=jnp.float32, paged=True, kv_pages=16,
                              page_size=16))
    from eagle_tpu.runtime.paged_batcher import PagedBatcher

    assert isinstance(eng.batcher, PagedBatcher)
    srv = InferenceServer(eng, model_name="tiny-paged")
    sock = socket.socket(); sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]; sock.close()
    loop = asyncio.new_event_loop()

    holder = {}

    def run():
        asyncio.set_event_loop(loop)
        runner = holder["runner"] = web.AppRunner(srv.build_app())
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", port)
        loop.run_until_complete(site.start())
        loop.run_forever()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            urllib.request.urlopen(base + "/health", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    yield base, eng
    asyncio.run_coroutine_threadsafe(holder["runner"].cleanup(), loop).result(30)
    loop.call_soon_threadsafe(loop.stop)


def test_paged_server_concurrent_and_prefix_reuse(paged_server):
    """The server serves slots from the shared page pool; identical prompts
    hit the prefix cache; outputs stay deterministic under concurrency."""
    import concurrent.futures

    base, eng = paged_server
    # long identical prefix so the prompt spans a full page (page_size=16)
    prompt = "the quick brown fox jumps over the lazy dog again and again and again"

    def go(p):
        return _post(base + "/completion",
                     {"prompt": p, "n_predict": 6, "temperature": 0})

    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        results = list(ex.map(go, [prompt, prompt, "something else entirely"]))
    for r in results:
        assert r["tokens_predicted"] >= 1
    assert results[0]["content"] == results[1]["content"]
    # sequential identical request must reuse registered pages
    a = go(prompt)
    assert a["content"] == results[0]["content"]
    assert eng.batcher.stats["prefix_hits"] >= 1


def test_paged_server_slot_save_freed_slot_conflict(paged_server):
    """Saving a FREED paged slot is a 409 (its pages went back to the pool);
    live-slot save/restore works and is covered by test_paged_batcher."""
    base, _ = paged_server
    req = urllib.request.Request(
        base + "/slots/0?action=save", data=b"{}",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = None
    except urllib.error.HTTPError as e:
        raised = e.code
    assert raised == 409


def test_server_grammar_constrained(server):
    res = _post(
        server + "/completion",
        {"prompt": "abc", "n_predict": 8, "temperature": 0,
         "grammar": 'root ::= "abc" | "ab"'},
    )
    assert res["content"] in ("abc", "ab")


def test_server_embeddings(server):
    res = _post(server + "/v1/embeddings", {"input": ["hello", "world"]})
    assert len(res["data"]) == 2
    v = np.asarray(res["data"][0]["embedding"])
    assert v.shape == (32,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3


def test_gguf_tools(tiny_gguf_pair, tmp_path, capsys):
    from eagle_tpu.tools import gguf_tools

    tgt, _ = tiny_gguf_pair
    assert gguf_tools.dump(str(tgt), True) == 0
    assert gguf_tools.hash_file(str(tgt)) == 0
    out = capsys.readouterr().out
    assert "TOTAL" in out
    prefix = str(tmp_path / "shard")
    assert gguf_tools.split(str(tgt), prefix, 8) == 0
    import glob

    shards = sorted(glob.glob(prefix + "*"))
    assert len(shards) > 1
    merged = str(tmp_path / "merged.gguf")
    assert gguf_tools.merge(merged, shards) == 0
    from eagle_tpu.gguf.reader import GGUFReader

    a, b = GGUFReader(str(tgt)), GGUFReader(merged)
    assert set(a.tensors) == set(b.tensors)
    np.testing.assert_array_equal(
        a.tensor_bytes("token_embd.weight"), b.tensor_bytes("token_embd.weight")
    )


def test_server_streaming(server):
    req = urllib.request.Request(
        server + "/completion",
        json.dumps({"prompt": "hello", "n_predict": 5, "temperature": 0, "stream": True}).encode(),
        {"Content-Type": "application/json"},
    )
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[6:]))
    assert events[-1]["stop"] is True
    assert len(events) >= 2
    assert any(not e["stop"] for e in events)


@pytest.fixture(scope="module")
def tool_server(tiny_gguf_pair):
    """Server with a context large enough for the injected tool schemas
    (the tiny vocab tokenizes the JSON decls byte-by-byte)."""
    import asyncio

    import jax.numpy as jnp
    from aiohttp import web

    from eagle_tpu.api import Engine, EngineConfig
    from eagle_tpu.server.server import InferenceServer

    tgt, _ = tiny_gguf_pair
    eng = Engine(EngineConfig(model_path=tgt, max_seq=1024,
                              compute_dtype=jnp.float32, kv_dtype=jnp.float32))
    srv = InferenceServer(eng, model_name="tiny")
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    loop = asyncio.new_event_loop()

    holder = {}

    def run():
        asyncio.set_event_loop(loop)
        runner = holder["runner"] = web.AppRunner(srv.build_app())
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", port)
        loop.run_until_complete(site.start())
        loop.run_forever()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            urllib.request.urlopen(base + "/health", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    yield base
    asyncio.run_coroutine_threadsafe(holder["runner"].cleanup(), loop).result(30)
    loop.call_soon_threadsafe(loop.stop)


def test_server_tool_calls_required(tool_server):
    """tools + tool_choice=required: grammar-constrained output parses into
    an OpenAI tool_calls message (common/chat.cpp generic handler path)."""
    res = _post(
        tool_server + "/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "add 1 and 2"}],
            "max_tokens": 100,
            "temperature": 0,
            "tool_choice": "required",
            "tools": [{
                "type": "function",
                "function": {
                    "name": "add",
                    "parameters": {
                        "type": "object",
                        "properties": {"a": {"type": "integer"}},
                        "required": ["a"],
                    },
                },
            }],
        },
    )
    choice = res["choices"][0]
    assert choice["finish_reason"] == "tool_calls", choice
    tc = choice["message"]["tool_calls"][0]
    assert tc["function"]["name"] == "add"
    json.loads(tc["function"]["arguments"])


def test_server_rerank(tool_server):
    """Jina/TEI rerank endpoint: scores + ranking come back; a relevant doc
    (sharing tokens with the query) outranks an unrelated one under the
    cosine fallback."""
    res = _post(
        tool_server + "/v1/rerank",
        {"query": "hello world", "documents": ["hello world", "dcba"],
         "return_documents": True},
    )
    results = res["results"]
    assert len(results) == 2
    assert {r["index"] for r in results} == {0, 1}
    assert results[0]["relevance_score"] >= results[1]["relevance_score"]
    assert "text" in results[0]["document"]
    # TEI format + top_n
    res2 = _post(tool_server + "/rerank",
                 {"query": "hello", "texts": ["a", "b", "c"], "top_n": 1})
    assert len(res2["results"]) == 1
    # error paths
    import urllib.error
    try:
        _post(tool_server + "/rerank", {"documents": ["a"]})
        assert False, "missing query should 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_server_web_ui(server):
    """GET / serves the built-in chat page (the reference's public/index.html
    equivalent) wired to /v1/chat/completions."""
    html = urllib.request.urlopen(server + "/", timeout=30).read().decode()
    assert "<!doctype html>" in html
    assert "/v1/chat/completions" in html
    assert "eagle-tpu" in html


def test_server_chat_streaming_openai_chunks(server):
    """stream:true on /v1/chat/completions emits OpenAI chat.completion.chunk
    SSE frames ending with [DONE] (what the web UI consumes)."""
    req = urllib.request.Request(
        server + "/v1/chat/completions",
        json.dumps({
            "messages": [{"role": "user", "content": "hello"}],
            "stream": True, "max_tokens": 6, "temperature": 0,
        }).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers.get("Content-Type", "").startswith("text/event-stream")
        raw = r.read().decode()
    frames = [l[5:].strip() for l in raw.split("\n") if l.startswith("data:")]
    assert frames[-1] == "[DONE]"
    chunks = [json.loads(f) for f in frames[:-1]]
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
    text = "".join(c["choices"][0]["delta"].get("content", "") for c in chunks)
    assert isinstance(text, str)
