"""Infill (FIM): token resolution, prompt assembly, and the infill sampler
transform — semantics mirrored from src/llama-vocab.cpp:1717-1880,
examples/infill/infill.cpp:165-178 and src/llama-sampling.cpp:2246-2436."""

import numpy as np

from eagle_tpu.runtime.infill import (
    FimTokens,
    fim_tokens_from_metadata,
    format_infill,
    infill_filter,
)


def test_fim_from_metadata_keys():
    md = {
        "tokenizer.ggml.fim_pre_token_id": 11,
        "tokenizer.ggml.fim_suf_token_id": 12,
        "tokenizer.ggml.fim_mid_token_id": 13,
    }
    fim = fim_tokens_from_metadata(md)
    assert (fim.pre, fim.suf, fim.mid) == (11, 12, 13)


def test_fim_from_legacy_keys():
    md = {
        "tokenizer.ggml.prefix_token_id": 1,
        "tokenizer.ggml.suffix_token_id": 2,
        "tokenizer.ggml.middle_token_id": 3,
    }
    fim = fim_tokens_from_metadata(md)
    assert (fim.pre, fim.suf, fim.mid) == (1, 2, 3)


def test_fim_name_fallback_qwen_and_codellama():
    pieces = ["a", "<|fim_prefix|>", "<|fim_suffix|>", "<|fim_middle|>"]
    fim = fim_tokens_from_metadata({}, pieces)
    assert (fim.pre, fim.suf, fim.mid) == (1, 2, 3)
    pieces = ["x", "<PRE>", "<SUF>", "<MID>"]
    fim = fim_tokens_from_metadata({}, pieces)
    assert (fim.pre, fim.suf, fim.mid) == (1, 2, 3)
    assert fim_tokens_from_metadata({}, ["just", "words"]) is None


def test_format_infill_orders():
    fim = FimTokens(pre=100, suf=101, mid=102)
    psm = format_infill([1, 2], [3], fim)
    assert psm == [100, 1, 2, 101, 3, 102]
    spm = format_infill([1, 2], [3], fim, spm_infill=True)
    assert spm == [101, 3, 100, 1, 2, 102]
    with_bos = format_infill([1], [2], fim, bos_id=9, add_bos=True)
    assert with_bos[0] == 9 and with_bos[-1] == 102


def _vocab(pieces):
    is_eog = np.zeros(len(pieces), bool)
    return pieces, is_eog


def test_infill_filter_eog_gate():
    # 3 * p_eog * n > p_txt -> only EOG kept (llama-sampling.cpp:2288)
    pieces = ["a", "b", "<eos>"]
    is_eog = np.asarray([False, False, True])
    ids = np.asarray([0, 1, 2])
    probs = np.asarray([0.4, 0.3, 0.3])
    f_ids, f_p = infill_filter(ids, probs, pieces, is_eog, eot_id=2)
    assert list(f_ids) == [2]
    assert np.isclose(f_p.sum(), 1.0)


def test_infill_filter_prefix_merge():
    # "fo" is a prefix of "foo": masses merge into the higher-prob one
    pieces = ["fo", "foo", "bar", "<eos>"]
    is_eog = np.asarray([False, False, False, True])
    ids = np.asarray([0, 1, 2, 3])
    probs = np.asarray([0.30, 0.40, 0.28, 0.02])
    f_ids, f_p = infill_filter(ids, probs, pieces, is_eog, eot_id=3)
    # merged: foo gets 0.7 -> passes both tholds; bar 0.28 passes 0.2 then
    # renorm -> thold 1/3: 0.28/0.98 < 1/3 -> dropped
    assert 1 in f_ids and 0 not in f_ids
    d = dict(zip(f_ids.tolist(), f_p.tolist()))
    assert d[1] > 0.6


def test_infill_filter_all_below_threshold_forces_eot():
    pieces = [f"t{i}" for i in range(10)]
    is_eog = np.zeros(10, bool)
    ids = np.arange(10)
    probs = np.full(10, 0.1)
    f_ids, f_p = infill_filter(ids, probs, pieces, is_eog, eot_id=7)
    assert list(f_ids) == [7] and f_p[0] == 1.0


def test_server_infill_no_fim_tokens_is_400(tool_server=None):
    # engine-level: a vocab without FIM tokens raises a clean ValueError
    import pytest

    from eagle_tpu.runtime.infill import fim_tokens_from_metadata

    assert fim_tokens_from_metadata({}, ["hello"]) is None
