"""Interactive chat-session invariants (llama-cli conversation mode,
examples/main/main.cpp): the incremental extend-at-offset feeding must leave
the cache in EXACTLY the state a monolithic prefill of the same token ids
would produce — greedy continuations are token-identical — including after a
mid-chunk EOS rollback."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.runtime.chat import ChatSession
from eagle_tpu.runtime.generate import Generator
from eagle_tpu.runtime.sampling import SamplerConfig


@pytest.fixture(scope="module")
def tiny():
    from eagle_tpu.models.hf_convert import params_from_hf_llama

    torch.manual_seed(11)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512, attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, mcfg = params_from_hf_llama(model)
    return params, mcfg


class StubTok:
    """Deterministic text<->id mapping over the tiny 128-vocab. Injectivity
    is irrelevant to the invariants; only determinism matters."""

    def __init__(self, eos_id=2):
        self.eos_id = eos_id
        self.bos_id = 1

    def encode(self, text, add_bos=True):
        ids = [3 + (b % 120) for b in text.encode("utf-8")]
        return ([self.bos_id] if add_bos else []) + ids

    def decode(self, ids, skip_special=True):
        return "".join(f"<{i}>" for i in ids)


def make_gen(tiny, **kw):
    params, mcfg = tiny
    return Generator(params, mcfg, max_seq=512, batch=1,
                     compute_dtype=jnp.float32, kv_dtype=jnp.float32,
                     eos_id=kw.pop("eos_id", 2), **kw)


def oracle_continue(tiny, context_ids, n):
    """Greedy continuation from a monolithic prefill of context_ids."""
    g = make_gen(tiny)
    return g.generate(list(context_ids), max_new_tokens=n,
                      sampler=SamplerConfig(greedy=True), stop_at_eos=False)


def test_extend_matches_prefill(tiny):
    """Generator._extend at an offset == one monolithic prefill (logits)."""
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 120, size=37).tolist()
    for k in (9, 16, 30):
        g1 = make_gen(tiny)
        t = 64
        padded = np.zeros((1, t), np.int32)
        padded[0, : len(ids)] = ids
        ref_logits, _, _ = g1._prefill_jit(
            g1.params, g1.kv, jnp.asarray(padded),
            jnp.asarray([len(ids)], np.int32), t=t)

        g2 = make_gen(tiny)
        t0 = 32
        p0 = np.zeros((1, t0), np.int32)
        p0[0, :k] = ids[:k]
        _, _, g2.kv = g2._prefill_jit(
            g2.params, g2.kv, jnp.asarray(p0), jnp.asarray([k], np.int32), t=t0)
        rest = ids[k:]
        t1 = 32
        p1 = np.zeros((1, t1), np.int32)
        p1[0, : len(rest)] = rest
        ext_logits, _ = g2._extend_jit(
            g2.params, g2.kv, jnp.asarray(p1),
            jnp.full((1,), k, jnp.int32), jnp.asarray([len(rest)], np.int32),
            t=t1, kv_limit=128)
        np.testing.assert_allclose(np.asarray(ref_logits), np.asarray(ext_logits),
                                   rtol=2e-5, atol=2e-5)


def test_chat_session_multiturn_matches_monolithic(tiny):
    """After N turns, the session's live cache behaves exactly like a fresh
    prefill of every token it fed: each turn's sampled stream equals the
    greedy oracle over the accumulated context."""
    sess = ChatSession(make_gen(tiny), StubTok(), template="chatml",
                       system="sys")
    for turn, prompt in enumerate(["hello", "again", "third"]):
        sess.ask(prompt, max_new_tokens=6, chunk=4)
        ctx = sess.fed[: sess.last_prompt_len]
        want = oracle_continue(tiny, ctx, len(sess.last_out))
        assert sess.last_out == want, f"turn {turn}"
        # cache bookkeeping: every slot maps 1:1 to a fed token
        assert len(sess.fed) == sess.pos
        # message history carries both sides
        assert sess.messages[-1]["role"] == "assistant"
        assert sess.messages[-2]["content"] == prompt


def test_chat_session_eos_rollback(tiny):
    """Force an EOS mid-chunk: the speculatively-fed post-EOS rows must be
    rolled back so the NEXT turn still matches the monolithic oracle."""
    # dry run with an unreachable EOS to learn what the model emits
    probe = ChatSession(make_gen(tiny), StubTok(eos_id=-100), template="chatml")
    probe.ask("hello", max_new_tokens=8, chunk=8)
    assert len(probe.last_out) == 8
    # pick the first emitted token that did not appear earlier in the stream
    # as EOS, at index >= 2 so it fires mid-chunk
    j = next(i for i in range(2, 8)
             if probe.last_out[i] not in probe.last_out[:i])
    eos = probe.last_out[j]

    sess = ChatSession(make_gen(tiny), StubTok(eos_id=eos), template="chatml")
    r1 = sess.ask("hello", max_new_tokens=8, chunk=8)
    assert sess.last_out[-1] == eos and len(sess.last_out) == j + 1
    assert r1 == StubTok().decode(probe.last_out[:j])
    # the EOS is pending (sampled, unfed), garbage rows are invalidated
    assert sess.pending == eos
    assert len(sess.fed) == sess.pos
    p1 = sess.pos  # context length at the end of turn 1

    sess.ask("again", max_new_tokens=6, chunk=4)
    ctx = sess.fed[: sess.last_prompt_len]
    want = oracle_continue(tiny, ctx, len(sess.last_out))
    assert sess.last_out == want
    # turn 2's feed started with the pending EOS token
    assert sess.fed[p1] == eos


def test_chat_session_context_shift_on_overflow(tiny):
    """Long conversations context-shift instead of silently writing past the
    cache (main.cpp:452-460): pos stays bounded, every turn still decodes."""
    params, mcfg = tiny
    gen = Generator(params, mcfg, max_seq=128, batch=1,
                    compute_dtype=jnp.float32, kv_dtype=jnp.float32)
    sess = ChatSession(gen, StubTok(eos_id=-100), template="chatml")
    for i in range(6):
        reply = sess.ask(f"t{i}", max_new_tokens=8, chunk=4)
        assert reply  # still generating
        assert sess.pos < 128
        assert len(sess.fed) == sess.pos
    # the shift preserved the header (first-turn prompt) at the front
    assert sess.keep > 0


def test_chat_template_flows_into_prompt(tiny):
    """The first turn's ids are the chatml rendering; later turns feed only
    the format_single diff."""
    tok = StubTok()
    sess = ChatSession(make_gen(tiny), tok, template="chatml")
    ids1 = sess.turn_tokens("hi")
    assert ids1 == tok.encode(
        "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n")
    sess.ask("hi", max_new_tokens=4, chunk=4)
    ids2 = sess.turn_tokens("yo")
    # pending token + the incremental suffix only (history not re-fed)
    assert ids2[0] == sess.pending
    assert ids2[1:] == tok.encode(
        "\n<|im_start|>user\nyo<|im_end|>\n<|im_start|>assistant\n",
        add_bos=False)
