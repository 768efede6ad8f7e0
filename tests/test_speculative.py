"""EAGLE chain speculation tests.

The load-bearing invariant (same as the reference's server speculative test,
examples/server/tests/unit/test_speculative.py:24-40): speculative decoding
must produce *exactly* the same tokens as plain decoding — the draft head only
changes speed, never output. We assert it with a random (useless) draft head,
which exercises the accept-0 path, and with a target-derived draft."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.models.eagle import eagle_forward, random_eagle_params
from eagle_tpu.runtime.generate import Generator
from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags
from eagle_tpu.runtime.speculative import EagleChainEngine


@pytest.fixture(scope="module")
def target():
    from eagle_tpu.models.hf_convert import params_from_hf_llama

    torch.manual_seed(3)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, mcfg = params_from_hf_llama(model)
    return params, mcfg


@pytest.fixture(scope="module")
def draft(target):
    _, tcfg = target
    dcfg = dataclasses.replace(tcfg, n_layers=1, is_eagle=True)
    dparams = random_eagle_params(jax.random.PRNGKey(5), dcfg)
    return dparams, dcfg


def test_eagle_forward_shapes(target, draft):
    tparams, tcfg = target
    dparams, dcfg = draft
    b, t, s = 1, 4, 16
    kv = KVCache.create(1, b, s, dcfg.n_kv_heads, dcfg.head_dim, jnp.float32)
    tokens = jnp.zeros((b, t), jnp.int32)
    feats = jnp.zeros((b, t, tcfg.n_embd), jnp.float32)
    pos = jnp.arange(t, dtype=jnp.int32)[None, :]
    kv = kv.with_tags(pos, pos)
    mask = causal_mask_from_tags(kv.slot_pos, pos)
    out = eagle_forward(dparams, tparams, dcfg, tokens, feats, pos, kv, pos, mask,
                        compute_dtype=jnp.float32)
    assert out.logits.shape == (b, t, tcfg.vocab_size)
    assert out.feature.shape == (b, t, tcfg.n_embd)


@pytest.mark.parametrize("feature_source", ["post_norm", "pre_norm"])
@pytest.mark.parametrize("n_draft", [1, 3])
def test_spec_equals_plain_greedy(target, draft, rng, feature_source, n_draft):
    """draft-on == draft-off, token for token, greedy."""
    tparams, tcfg = target
    dparams, dcfg = draft
    prompt = rng.integers(0, 128, size=9).tolist()

    plain = Generator(tparams, tcfg, max_seq=128, compute_dtype=jnp.float32, eos_id=-1)
    want = plain.generate(prompt, max_new_tokens=16, stop_at_eos=False)

    eng = EagleChainEngine(
        tparams, dparams, tcfg, dcfg, n_draft=n_draft, max_seq=128,
        compute_dtype=jnp.float32, kv_dtype=jnp.float32,
        feature_source=feature_source, eos_id=-1,
    )
    got, stats = eng.generate(prompt, max_new_tokens=16, stop_at_eos=False)
    assert got == want, (got, want, stats)
    assert stats["n_cycles"] > 0


def test_stats_consistent(target, draft, rng):
    tparams, tcfg = target
    dparams, dcfg = draft
    prompt = rng.integers(0, 128, size=5).tolist()
    eng = EagleChainEngine(
        tparams, dparams, tcfg, dcfg, n_draft=4, max_seq=128,
        compute_dtype=jnp.float32, kv_dtype=jnp.float32, eos_id=-1,
    )
    out, stats = eng.generate(prompt, max_new_tokens=12, stop_at_eos=False)
    assert stats["n_accepted"] <= stats["n_drafted"]
    assert 1.0 <= stats["mean_accept_len"] <= eng.K + 1
    assert len(out) >= 1


def test_lookup_decoding_equals_plain(target, rng):
    """Prompt-lookup/ngram speculation is also output-invariant."""
    from eagle_tpu.runtime.lookup import LookupEngine, NgramCache, prompt_lookup_draft

    tparams, tcfg = target
    # repetitive prompt so lookup actually drafts
    base = rng.integers(0, 128, size=4).tolist()
    prompt = base * 3
    plain = Generator(tparams, tcfg, max_seq=256, compute_dtype=jnp.float32, eos_id=-1)
    want = plain.generate(prompt, max_new_tokens=15, stop_at_eos=False)

    eng = LookupEngine(tparams, tcfg, n_draft=4, max_seq=256,
                       compute_dtype=jnp.float32, kv_dtype=jnp.float32, eos_id=-1)
    got, stats = eng.generate(prompt, max_new_tokens=15, stop_at_eos=False)
    assert got == want, (got, want, stats)


def test_prompt_lookup_draft_matches():
    from eagle_tpu.runtime.lookup import prompt_lookup_draft

    ctx = [1, 2, 3, 9, 1, 2]
    assert prompt_lookup_draft(ctx, 2) == [3, 9]
    assert prompt_lookup_draft([5, 6, 7], 2) == []


def test_ngram_cache():
    from eagle_tpu.runtime.lookup import NgramCache

    c = NgramCache(2, 3)
    c.update([1, 2, 3, 1, 2, 3, 1, 2])
    assert c.draft([1, 2], 1) == [3]
    assert c.draft([9, 9], 1) == []


def test_multi_cycle_dispatch_token_identity(target, draft):
    """cycles_per_dispatch chains C speculative cycles in one compiled
    program (one host<->device round trip per C cycles through a remote
    link); output must be token-identical to single-cycle dispatch,
    including eos overshoot (extra chained cycles computed then discarded)
    and the near-max_seq wind-down to single cycles."""
    tparams, tcfg = target
    dparams, dcfg = draft
    rng2 = np.random.default_rng(7)
    p = rng2.integers(0, tcfg.vocab_size, size=6).tolist()

    def make(max_seq=128):
        return EagleChainEngine(
            tparams, dparams, tcfg, dcfg, n_draft=2, max_seq=max_seq,
            compute_dtype=jnp.float32, kv_dtype=jnp.float32, eos_id=-1,
        )

    base, st1 = make().generate(p, max_new_tokens=40, stop_at_eos=False)
    got, st4 = make().generate(p, max_new_tokens=40, stop_at_eos=False,
                               cycles_per_dispatch=4)
    assert got == base
    # emitted-token accounting matches (overshoot cycles are not counted)
    assert st4["n_accepted"] + st4["n_cycles"] >= len(got) - 1

    # wind-down: max_seq small enough that chained dispatches stop fitting
    base2, _ = make(max_seq=32).generate(p, max_new_tokens=64, stop_at_eos=False)
    got2, _ = make(max_seq=32).generate(p, max_new_tokens=64, stop_at_eos=False,
                                        cycles_per_dispatch=4)
    assert got2 == base2

    # eos mid-dispatch: pick an eos id the model actually emits
    eos = base[2]
    e1 = EagleChainEngine(tparams, dparams, tcfg, dcfg, n_draft=2, max_seq=128,
                          compute_dtype=jnp.float32, kv_dtype=jnp.float32,
                          eos_id=eos)
    e4 = EagleChainEngine(tparams, dparams, tcfg, dcfg, n_draft=2, max_seq=128,
                          compute_dtype=jnp.float32, kv_dtype=jnp.float32,
                          eos_id=eos)
    b_eos, _ = e1.generate(p, max_new_tokens=40)
    g_eos, _ = e4.generate(p, max_new_tokens=40, cycles_per_dispatch=4)
    assert g_eos == b_eos


def test_multi_cycle_dispatch_tree2(target, draft):
    from eagle_tpu.runtime.tree2 import EagleTree2Engine

    tparams, tcfg = target
    dparams, dcfg = draft
    rng2 = np.random.default_rng(11)
    p = rng2.integers(0, tcfg.vocab_size, size=6).tolist()

    def make():
        return EagleTree2Engine(
            tparams, dparams, tcfg, dcfg, beam=3, depth=2, n_verify=6,
            max_seq=128, compute_dtype=jnp.float32, kv_dtype=jnp.float32,
            eos_id=-1,
        )

    base, _ = make().generate(p, max_new_tokens=32, stop_at_eos=False)
    got, _ = make().generate(p, max_new_tokens=32, stop_at_eos=False,
                             cycles_per_dispatch=3)
    assert got == base
