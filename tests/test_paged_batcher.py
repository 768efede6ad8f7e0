"""PagedBatcher: the paged serving path must be invisible — every slot's
output identical to single-sequence dense generation — while slots draw cache
memory from a shared page pool (find_slot / seq_id-sharing semantics,
src/llama-kv-cache.cpp:120, exercised by server.cpp:2764 update_slots), and a
second request with a shared prefix must skip prefill of the shared region."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.models.eagle import random_eagle_params
from eagle_tpu.runtime.paged_batcher import PagedBatcher
from eagle_tpu.runtime.scheduler import ContinuousBatcher
from eagle_tpu.runtime.speculative import EagleChainEngine

PS = 8  # page size


@pytest.fixture(scope="module")
def setup():
    from eagle_tpu.models.hf_convert import params_from_hf_llama

    torch.manual_seed(3)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(cfg).eval()
    tparams, tcfg = params_from_hf_llama(model)
    dcfg = dataclasses.replace(tcfg, n_layers=1, is_eagle=True)
    dparams = random_eagle_params(jax.random.PRNGKey(5), dcfg)
    return tparams, dparams, tcfg, dcfg


def make_engine(setup, batch=1, kv_dtype=jnp.float32):
    tparams, dparams, tcfg, dcfg = setup
    return EagleChainEngine(
        tparams, dparams, tcfg, dcfg, n_draft=2, max_seq=128, batch=batch,
        compute_dtype=jnp.float32, kv_dtype=kv_dtype, eos_id=-1,
    )


def single_ref(setup, prompt, n, kv_dtype=jnp.float32):
    eng = make_engine(setup, batch=1, kv_dtype=kv_dtype)
    out, _ = eng.generate(prompt, max_new_tokens=n, stop_at_eos=False)
    return out[:n]


def plain_ref(setup, prompt, n):
    """Non-speculative greedy decode (draft-off reference)."""
    from eagle_tpu.runtime.generate import Generator

    tparams, _, tcfg, _ = setup
    gen = Generator(tparams, tcfg, max_seq=128, compute_dtype=jnp.float32,
                    kv_dtype=jnp.float32, eos_id=-1)
    return list(gen.generate(prompt, max_new_tokens=n))[:n]


def test_paged_batched_matches_single(setup, rng):
    """Slot isolation on PAGED state: every slot's stream == dense
    single-sequence chain output, token for token."""
    prompts = [rng.integers(0, 128, size=int(rng.integers(4, 12))).tolist()
               for _ in range(3)]
    want = [single_ref(setup, p, 10) for p in prompts]

    batcher = PagedBatcher(make_engine(setup, batch=4), n_pages=40, page_size=PS)
    slots = [batcher.submit(p, max_new_tokens=10, stop_at_eos=False) for p in prompts]
    assert all(s is not None for s in slots)
    batcher.run_until_done(max_steps=200)
    got = [s.generated[:10] for s in slots]
    assert got == want


def test_paged_draft_on_equals_draft_off(setup, rng):
    """Speculation over a paged pool only changes speed: output == plain
    greedy decoding with no draft at all."""
    p = rng.integers(0, 128, size=9).tolist()
    want = plain_ref(setup, p, 12)
    batcher = PagedBatcher(make_engine(setup, batch=2), n_pages=40, page_size=PS)
    s = batcher.submit(p, max_new_tokens=12, stop_at_eos=False)
    batcher.run_until_done(max_steps=100)
    assert s.generated[:12] == want


def test_oversubscribed_pool(setup, rng):
    """4 slots over a pool FAR smaller than dense 4x per-slot capacity
    (dense would reserve 4*128/8 = 64 pages; the pool has 24) still serve
    every request correctly — the capability dense allocation cannot match."""
    engine = make_engine(setup, batch=4)
    batcher = PagedBatcher(engine, n_pages=24, page_size=PS,
                           dft_n_pages=24, prefix_cache=False)
    prompts = [rng.integers(0, 128, size=int(rng.integers(6, 14))).tolist()
               for _ in range(4)]
    want = [single_ref(setup, p, 8) for p in prompts]
    slots = [batcher.submit(p, max_new_tokens=8, stop_at_eos=False) for p in prompts]
    batcher.run_until_done(max_steps=200)
    assert [s.generated[:8] for s in slots] == want
    # the summed mapped context really exceeded what a 24-page dense split
    # (6 pages = 48 positions per slot) could hold per-slot contiguously
    assert all(s.state == "free" for s in slots)


def test_prefix_sharing_skips_prefill(setup, rng):
    """A second request with the same prompt must reuse the registered pages:
    measurably fewer prefill chunks, identical output."""
    prompt = rng.integers(0, 128, size=3 * PS + 3).tolist()  # 3 full pages
    want = single_ref(setup, prompt, 8)

    batcher = PagedBatcher(make_engine(setup, batch=2), n_pages=40, page_size=PS)
    s1 = batcher.submit(prompt, max_new_tokens=8, stop_at_eos=False)
    batcher.run_until_done(max_steps=100)
    assert s1.generated[:8] == want
    assert batcher.stats["prefix_hits"] == 0

    chunks_before = []
    orig = batcher._advance_prefill

    def counting_advance():
        chunks_before.append(1)
        orig()

    batcher._advance_prefill = counting_advance
    s2 = batcher.submit(prompt, max_new_tokens=8, stop_at_eos=False)
    assert batcher.stats["prefix_hits"] == 1
    assert batcher.stats["prefill_tokens_skipped"] == 3 * PS
    assert s2.consumed == 3 * PS  # admitted with 3 pages already served
    batcher.run_until_done(max_steps=100)
    assert s2.generated[:8] == want
    # only the partial tail (3 tokens) needed prefill: one chunk
    assert len(chunks_before) == 1


def test_prefix_sharing_divergent_suffixes(setup, rng):
    """Two requests sharing a 2-page prefix but diverging after it must each
    match their own single-sequence reference (copy-on-write isolation)."""
    base = rng.integers(0, 128, size=2 * PS).tolist()
    p1 = base + rng.integers(0, 128, size=5).tolist()
    p2 = base + rng.integers(0, 128, size=7).tolist()
    want1 = single_ref(setup, p1, 8)
    want2 = single_ref(setup, p2, 8)

    batcher = PagedBatcher(make_engine(setup, batch=2), n_pages=48, page_size=PS)
    s1 = batcher.submit(p1, max_new_tokens=8, stop_at_eos=False)
    batcher.run_until_done(max_steps=100)
    got1 = list(s1.generated)  # the freed Slot object may be reused for s2
    s2 = batcher.submit(p2, max_new_tokens=8, stop_at_eos=False)
    assert batcher.stats["prefix_hits"] == 1
    batcher.run_until_done(max_steps=100)
    assert got1[:8] == want1
    assert s2.generated[:8] == want2
    assert batcher.stats["pages_copied"] >= 1  # draft boundary page CoW


def test_shared_page_not_corrupted_by_concurrent_writer(setup, rng):
    """The prefix-cache owner keeps generating WHILE a second slot that
    matched its pages prefills + decodes: the owner's stream must stay
    identical to its solo run (no write from the matcher may reach a shared
    page without copy-on-write)."""
    prompt = rng.integers(0, 128, size=2 * PS).tolist()
    want = single_ref(setup, prompt, 16)

    batcher = PagedBatcher(make_engine(setup, batch=2), n_pages=48, page_size=PS)
    s1 = batcher.submit(prompt, max_new_tokens=16, stop_at_eos=False)
    # run until s1 has prefilled (registering its pages) and produced a few
    # tokens, then admit the matching request mid-generation
    while len(s1.generated) < 4:
        batcher.step()
    s2 = batcher.submit(prompt, max_new_tokens=16, stop_at_eos=False)
    assert batcher.stats["prefix_hits"] == 1
    batcher.run_until_done(max_steps=200)
    assert s1.generated[:16] == want
    assert s2.generated[:16] == want


def test_paged_int8_pool(setup, rng):
    """int8 paged pool: output == int8 dense single-sequence output."""
    p = rng.integers(0, 128, size=10).tolist()
    want = single_ref(setup, p, 8, kv_dtype=jnp.int8)
    batcher = PagedBatcher(make_engine(setup, batch=2, kv_dtype=jnp.int8),
                           n_pages=40, page_size=PS)
    s = batcher.submit(p, max_new_tokens=8, stop_at_eos=False)
    batcher.run_until_done(max_steps=100)
    assert s.generated[:8] == want


def test_pool_pages_released_on_free(setup, rng):
    """Completed requests return their pages; the pool serves an unbounded
    request stream from bounded memory."""
    batcher = PagedBatcher(make_engine(setup, batch=2), n_pages=16,
                           page_size=PS, dft_n_pages=16, prefix_cache=False)
    for i in range(5):
        p = rng.integers(0, 128, size=int(rng.integers(5, 12))).tolist()
        want = single_ref(setup, p, 6)
        s = batcher.submit(p, max_new_tokens=6, stop_at_eos=False)
        batcher.run_until_done(max_steps=100)
        assert s.generated[:6] == want, f"iteration {i}"
    assert len(batcher.pools["tgt"].free) == 16
    assert len(batcher.pools["dft"].free) == 16


def test_prefix_reuse_is_page_granular_under_large_chunks(setup, rng):
    """Prefill chunks spanning several pages must still attach a boundary
    feature to EVERY full page (the chunk program returns page-stride
    features), so a novel-suffix request sharing a prefix is admitted with
    page-granular reuse — not truncated to the last chunk boundary.

    Layout: page 8, chunk 32 (4 pages), shared prefix 24 (3 pages). The
    target matches 3 pages; the draft's shift-1 keying exact-matches 2 (its
    third page depends on the first suffix token) and the boundary-page
    copy-on-write extends it to 3, so the expected reuse is the FULL
    3-page prefix — which requires the page-2 payload that only the
    page-stride features provide under a 32-token chunk."""
    base = rng.integers(0, 128, size=3 * PS).tolist()
    p1 = base + rng.integers(0, 128, size=2 * PS).tolist()  # 40 tokens
    p2 = base + rng.integers(0, 128, size=2 * PS + 3).tolist()  # novel suffix
    want1 = single_ref(setup, p1, 8)
    want2 = single_ref(setup, p2, 8)

    batcher = PagedBatcher(make_engine(setup, batch=2), n_pages=48,
                           page_size=PS, prefill_chunk=4 * PS)
    s1 = batcher.submit(p1, max_new_tokens=8, stop_at_eos=False)
    batcher.run_until_done(max_steps=100)
    got1 = list(s1.generated)
    s2 = batcher.submit(p2, max_new_tokens=8, stop_at_eos=False)
    assert batcher.stats["prefix_hits"] == 1
    assert s2.consumed == 3 * PS  # full prefix: boundary draft page CoW'd
    assert batcher.stats["pages_copied"] >= 1
    batcher.run_until_done(max_steps=100)
    assert got1[:8] == want1
    assert s2.generated[:8] == want2


def test_paged_slot_save_restore_resume(setup, rng, tmp_path):
    """test_slot_save.py semantics on the PAGED batcher: save a slot
    mid-generation, restore into a FRESH paged batcher (different slot),
    resume — the continued stream must equal uninterrupted generation. The
    artifact is the dense per-sequence format, so it also restores into a
    DENSE batcher and a dense save restores into a paged one."""
    p = rng.integers(0, 128, size=6).tolist()
    want = single_ref(setup, p, 14)

    b1 = PagedBatcher(make_engine(setup, batch=2), n_pages=40, page_size=PS)
    # paged pools reclaim a slot's pages the moment it completes, so the
    # save happens mid-generation (the live-slot case the server exercises)
    s = b1.submit(p, max_new_tokens=20, stop_at_eos=False)
    for _ in range(50):
        if len(s.generated) >= 6:
            break
        b1.step()
    got_first = list(s.generated)
    assert got_first[:6] == want[:6]
    b1.save_slot(s.id, tmp_path / "slot.bin")

    # paged -> paged, into a different slot
    b2 = PagedBatcher(make_engine(setup, batch=2), n_pages=40, page_size=PS)
    s2 = b2.restore_slot(tmp_path / "slot.bin", slot_id=1)
    assert s2.state == "restored" and s2.generated == got_first
    b2.resume_slot(1, max_new_tokens=14)
    b2.run_until_done(max_steps=60)
    assert s2.generated[:14] == want

    # paged -> dense (cross-layout restore)
    b3 = ContinuousBatcher(make_engine(setup, batch=2))
    s3 = b3.restore_slot(tmp_path / "slot.bin", slot_id=0)
    b3.resume_slot(0, max_new_tokens=14)
    b3.run_until_done(max_steps=60)
    assert s3.generated[:14] == want

    # dense -> paged (cross-layout restore)
    b4 = ContinuousBatcher(make_engine(setup, batch=2))
    s4 = b4.submit(p, max_new_tokens=6, stop_at_eos=False)
    b4.run_until_done(max_steps=50)
    b4.save_slot(s4.id, tmp_path / "slot_dense.bin")
    b5 = PagedBatcher(make_engine(setup, batch=2), n_pages=40, page_size=PS)
    s5 = b5.restore_slot(tmp_path / "slot_dense.bin", slot_id=1)
    b5.resume_slot(1, max_new_tokens=14)
    b5.run_until_done(max_steps=60)
    assert s5.generated[:14] == want


def test_paged_slot_save_restore_int8_kv(setup, rng, tmp_path):
    """int8-KV paged slot round-trips its per-row scales too."""
    p = rng.integers(0, 128, size=5).tolist()
    b1 = PagedBatcher(make_engine(setup, batch=2, kv_dtype=jnp.int8),
                      n_pages=40, page_size=PS)
    s = b1.submit(p, max_new_tokens=18, stop_at_eos=False)
    for _ in range(50):
        if len(s.generated) >= 5:
            break
        b1.step()
    want = single_ref(setup, p, 12, kv_dtype=jnp.int8)
    assert list(s.generated)[:5] == want[:5]
    b1.save_slot(s.id, tmp_path / "slot8.bin")
    b2 = PagedBatcher(make_engine(setup, batch=2, kv_dtype=jnp.int8),
                      n_pages=40, page_size=PS)
    s2 = b2.restore_slot(tmp_path / "slot8.bin")
    b2.resume_slot(s2.id, max_new_tokens=12)
    b2.run_until_done(max_steps=60)
    assert s2.generated[:12] == want


def test_free_then_prefix_admit_same_slot_before_step(setup, rng):
    """The deferred-flush edge: a slot finishes (its quarantine + table reset
    pend), and the SAME slot is immediately reassigned to a prefix-hit
    request before any step() runs — the single flush must apply the
    quarantine and the new tags/feature to the same row without clobbering
    each other, and the resumed request must still generate correctly."""
    prompt = rng.integers(0, 128, size=3 * PS).tolist()  # 3 full pages
    want = single_ref(setup, prompt, 8)

    batcher = PagedBatcher(make_engine(setup, batch=1), n_pages=40,
                           page_size=PS)
    s1 = batcher.submit(prompt, max_new_tokens=4, stop_at_eos=False)
    batcher.run_until_done(max_steps=60)
    assert s1.state == "free"  # freed -> quarantine + table reset PENDING
    # same slot id, same prompt -> prefix-hit admission queues tag presets
    s2 = batcher.submit(prompt, max_new_tokens=8, stop_at_eos=False)
    assert s2.id == s1.id
    assert batcher.stats["prefix_hits"] == 1
    assert s2.consumed >= 2 * PS  # shared pages skipped
    batcher.run_until_done(max_steps=60)
    assert list(s2.generated)[:8] == want
