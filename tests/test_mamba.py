"""Mamba selective-SSM: parity vs transformers, GGUF round-trip, recurrent
generation equivalence (prefill-then-decode must equal all-at-once forward —
the state handoff invariant), constant-size state."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.models.config import ModelConfig
from eagle_tpu.models.mamba import MambaState, mamba_forward


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(7)
    cfg = transformers.MambaConfig(
        vocab_size=128, hidden_size=32, state_size=8, num_hidden_layers=2,
        conv_kernel=4, expand=2, time_step_rank=4, use_cache=False,
    )
    return transformers.MambaForCausalLM(cfg).eval()


def _cfg(model) -> ModelConfig:
    hc = model.config
    return dataclasses.replace(
        ModelConfig(
            arch="mamba", vocab_size=hc.vocab_size, n_embd=hc.hidden_size,
            n_layers=hc.num_hidden_layers, n_heads=0, n_kv_heads=0,
            head_dim=hc.hidden_size, n_ff=0, rms_eps=hc.layer_norm_epsilon,
            rope_dim=0, n_ctx_train=1024,
        ),
        ssm_d_conv=hc.conv_kernel, ssm_d_inner=hc.intermediate_size,
        ssm_d_state=hc.state_size, ssm_dt_rank=hc.time_step_rank,
    )


def _params(model):
    sd = {k: np.asarray(v.detach().float().numpy()) for k, v in model.state_dict().items()}
    L = model.config.num_hidden_layers
    layers = {
        "attn_norm": [], "ssm_in": [], "ssm_conv1d": [], "ssm_conv1d_b": [],
        "ssm_x": [], "ssm_dt": [], "ssm_dt_b": [], "ssm_a": [], "ssm_d": [],
        "ssm_out": [],
    }
    for i in range(L):
        p = f"backbone.layers.{i}"
        layers["attn_norm"].append(sd[f"{p}.norm.weight"])
        layers["ssm_in"].append(sd[f"{p}.mixer.in_proj.weight"])
        layers["ssm_conv1d"].append(sd[f"{p}.mixer.conv1d.weight"].reshape(-1, model.config.conv_kernel))
        layers["ssm_conv1d_b"].append(sd[f"{p}.mixer.conv1d.bias"])
        layers["ssm_x"].append(sd[f"{p}.mixer.x_proj.weight"])
        layers["ssm_dt"].append(sd[f"{p}.mixer.dt_proj.weight"])
        layers["ssm_dt_b"].append(sd[f"{p}.mixer.dt_proj.bias"])
        layers["ssm_a"].append(-np.exp(sd[f"{p}.mixer.A_log"]))
        layers["ssm_d"].append(sd[f"{p}.mixer.D"])
        layers["ssm_out"].append(sd[f"{p}.mixer.out_proj.weight"])
    params = {
        "tok_embd": sd["backbone.embeddings.weight"],
        "layers": layers,
        "output_norm": sd["backbone.norm_f.weight"],
        "output": sd.get("lm_head.weight", sd["backbone.embeddings.weight"]),
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


def test_mamba_parity(hf_model):
    cfg = _cfg(hf_model)
    params = _params(hf_model)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, size=(1, 12)).astype(np.int32)
    out = mamba_forward(params, cfg, jnp.asarray(tokens), MambaState.create(cfg, 1))
    with torch.no_grad():
        theirs = hf_model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(np.asarray(out.logits), theirs, atol=3e-3, rtol=1e-2)


def test_mamba_state_handoff(hf_model):
    """forward(prefix) then forward(suffix, state) == forward(full) — the
    invariant that makes chunked prefill + decode exact."""
    cfg = _cfg(hf_model)
    params = _params(hf_model)
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    full = mamba_forward(params, cfg, jnp.asarray(toks), MambaState.create(cfg, 1))
    o1 = mamba_forward(params, cfg, jnp.asarray(toks[:, :6]), MambaState.create(cfg, 1))
    o2 = mamba_forward(params, cfg, jnp.asarray(toks[:, 6:]), o1.state)
    np.testing.assert_allclose(
        np.asarray(o2.logits), np.asarray(full.logits[:, 6:]), atol=1e-4, rtol=1e-4
    )
    # state is constant-size regardless of context
    assert o2.state.conv.shape == o1.state.conv.shape
    assert o2.state.ssm.shape == (cfg.n_layers, 1, cfg.ssm_d_inner, cfg.ssm_d_state)


def test_mamba_gguf_round_trip(hf_model, tmp_path):
    from eagle_tpu.gguf.constants import GGMLType
    from eagle_tpu.models.hf_convert import convert_hf_to_gguf
    from eagle_tpu.models.loader import load_llama_params

    cfg = _cfg(hf_model)
    path = tmp_path / "mamba.gguf"
    convert_hf_to_gguf(hf_model.state_dict(), cfg, path, qtype=GGMLType.F32, arch="mamba")
    params, lcfg, _ = load_llama_params(path)
    assert lcfg.is_recurrent and lcfg.ssm_d_state == cfg.ssm_d_state
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 128, size=(1, 9)).astype(np.int32)
    ours = mamba_forward(params, lcfg, jnp.asarray(tokens), MambaState.create(lcfg, 1))
    with torch.no_grad():
        theirs = hf_model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours.logits), theirs, atol=3e-3, rtol=1e-2)


def test_mamba_generate_matches_hf_greedy(hf_model):
    from eagle_tpu.runtime.mamba_gen import MambaGenerator

    cfg = _cfg(hf_model)
    params = _params(hf_model)
    gen = MambaGenerator(params, cfg, eos_id=-1)
    prompt = [3, 17, 42, 99, 5]
    ours, _ = gen.generate(prompt, max_new_tokens=12, stop_at_eos=False)
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor([prompt], dtype=torch.long), max_new_tokens=12,
            do_sample=False, use_cache=True,
        )[0, len(prompt):].tolist()
    assert ours == hf_out
