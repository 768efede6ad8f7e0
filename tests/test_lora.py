"""LoRA adapter tests: merged-GGUF and load-time application must match a
manually-updated dense model."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eagle_tpu.gguf.constants import GGMLType
from eagle_tpu.gguf.reader import GGUFReader
from eagle_tpu.gguf.writer import GGUFWriter
from eagle_tpu.models.hf_convert import config_from_hf, convert_hf_to_gguf
from eagle_tpu.tools.lora import apply_lora_to_params, load_lora, merge_lora_gguf


@pytest.fixture(scope="module")
def base_gguf(tmp_path_factory):
    torch.manual_seed(2)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    d = tmp_path_factory.mktemp("lora")
    path = d / "base.gguf"
    convert_hf_to_gguf(model.state_dict(), config_from_hf(hf_cfg), path, qtype=GGMLType.F32)
    return path, model, d


def make_lora_gguf(d, rng, rank=4, alpha=8.0):
    path = d / "adapter.gguf"
    w = GGUFWriter(path)
    w.add("general.architecture", "llama")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", alpha)
    tensors = {}
    for target, (n, k) in {
        "blk.0.ffn_down": (64, 256),
        "blk.1.attn_output": (64, 64),
    }.items():
        a = (rng.standard_normal((rank, k)) * 0.05).astype(np.float32)
        b = (rng.standard_normal((n, rank)) * 0.05).astype(np.float32)
        w.add_tensor(f"{target}.lora_a", a, GGMLType.F32)
        w.add_tensor(f"{target}.lora_b", b, GGMLType.F32)
        tensors[target] = (a, b)
    w.write()
    return path, tensors, alpha / rank


def test_load_lora(base_gguf, rng):
    _, _, d = base_gguf
    path, tensors, scale = make_lora_gguf(d, rng)
    adapters, s = load_lora(path)
    assert s == pytest.approx(scale)
    assert set(adapters) == set(tensors)


def test_merge_lora_gguf(base_gguf, rng):
    base, model, d = base_gguf
    lora, tensors, scale = make_lora_gguf(d, rng)
    out = d / "merged.gguf"
    n = merge_lora_gguf(base, lora, out)
    assert n == 2
    rb, rm = GGUFReader(base), GGUFReader(out)
    w0 = rb.tensor_f32("blk.0.ffn_down.weight")
    wm = rm.tensor_f32("blk.0.ffn_down.weight")
    a, b = tensors["blk.0.ffn_down"]
    np.testing.assert_allclose(wm, w0 + scale * (b @ a), rtol=1e-5, atol=1e-6)
    # untouched tensor identical
    np.testing.assert_array_equal(
        rb.tensor_f32("blk.0.attn_q.weight"), rm.tensor_f32("blk.0.attn_q.weight")
    )


def test_apply_lora_to_params_forward(base_gguf, rng):
    """Runtime-merged params must produce the same logits as loading the
    merged GGUF."""
    import jax.numpy as jnp

    from eagle_tpu.models.loader import load_llama_params
    from eagle_tpu.models.llama import llama_forward
    from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags

    base, model, d = base_gguf
    lora, tensors, scale = make_lora_gguf(d, rng)
    out = d / "merged2.gguf"
    merge_lora_gguf(base, lora, out)

    params_a, cfg, _ = load_llama_params(base)
    params_a = apply_lora_to_params(params_a, cfg, lora)
    params_b, _, _ = load_llama_params(out)

    tokens = rng.integers(0, 256, size=(1, 8)).astype(np.int32)

    def fwd(params):
        kv = KVCache.create(cfg.n_layers, 1, 16, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
        pos = jnp.arange(8, dtype=jnp.int32)[None, :]
        kv = kv.with_tags(pos, pos)
        mask = causal_mask_from_tags(kv.slot_pos, pos)
        return np.asarray(
            llama_forward(params, cfg, jnp.asarray(tokens), pos, kv, pos, mask,
                          compute_dtype=jnp.float32).logits
        )

    np.testing.assert_allclose(fwd(params_a), fwd(params_b), atol=1e-4, rtol=1e-4)


def test_control_vector(base_gguf, rng, tmp_path):
    import jax.numpy as jnp

    from eagle_tpu.gguf.constants import GGMLType
    from eagle_tpu.models.loader import load_llama_params
    from eagle_tpu.models.llama import llama_forward
    from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags
    from eagle_tpu.tools.lora import apply_control_vector

    base, model, d = base_gguf
    # write a cvector gguf
    w = GGUFWriter(d / "cvec.gguf")
    w.add("general.architecture", "controlvector")
    dirs = rng.standard_normal((2, 64)).astype(np.float32) * 0.1
    w.add_tensor("direction.1", dirs[0], GGMLType.F32)
    w.add_tensor("direction.2", dirs[1], GGMLType.F32)
    w.write()

    params, cfg, _ = load_llama_params(base)
    params_cv = apply_control_vector(params, cfg, d / "cvec.gguf", scale=1.0)
    assert params_cv["layers"]["cvec"].shape == (2, 64)

    tokens = jnp.asarray([[1, 5, 9]], jnp.int32)

    def fwd(p):
        kv = KVCache.create(cfg.n_layers, 1, 16, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
        pos = jnp.arange(3, dtype=jnp.int32)[None, :]
        kv = kv.with_tags(pos, pos)
        mask = causal_mask_from_tags(kv.slot_pos, pos)
        return np.asarray(llama_forward(p, cfg, tokens, pos, kv, pos, mask,
                                        compute_dtype=jnp.float32).logits)

    a, b = fwd(params), fwd(params_cv)
    assert np.abs(a - b).max() > 1e-4  # the vector steers the logits


def test_convert_hf_lora_to_gguf(base_gguf, rng, tmp_path):
    """PEFT-style LoRA state_dict -> GGUF adapter; merging the converted
    adapter must equal merging the HF-side deltas directly (incl. the rope
    row permutation on q/k lora_B)."""
    from eagle_tpu.models.loader import load_llama_params
    from eagle_tpu.tools.lora import convert_hf_lora_to_gguf

    path, model, d = base_gguf
    cfg = config_from_hf(model.config)
    rank, alpha = 4, 8.0
    sd = {}
    deltas = {}
    for i in range(cfg.n_layers):
        for mod in ("self_attn.q_proj", "mlp.down_proj"):
            shape = dict(model.named_modules())[f"model.layers.{i}.{mod}"].weight.shape
            A = rng.standard_normal((rank, shape[1])).astype(np.float32) * 0.05
            B = rng.standard_normal((shape[0], rank)).astype(np.float32) * 0.05
            sd[f"base_model.model.model.layers.{i}.{mod}.lora_A.weight"] = A
            sd[f"base_model.model.model.layers.{i}.{mod}.lora_B.weight"] = B
            deltas[f"model.layers.{i}.{mod}.weight"] = (alpha / rank) * (B @ A)

    apath = tmp_path / "adapter.gguf"
    n = convert_hf_lora_to_gguf(sd, cfg, apath, alpha=alpha)
    assert n == cfg.n_layers * 2 * 2

    merged_path = tmp_path / "merged.gguf"
    merge_lora_gguf(path, apath, merged_path)
    params, lcfg, _ = load_llama_params(merged_path)

    # golden: HF model with deltas applied directly
    import torch as _torch

    hf = model
    sd_new = {k: v.clone() for k, v in hf.state_dict().items()}
    for name, dlt in deltas.items():
        sd_new[name] += _torch.tensor(dlt)
    hf2 = transformers.LlamaForCausalLM(hf.config).eval()
    hf2.load_state_dict(sd_new)

    import jax.numpy as jnp

    from eagle_tpu.models.llama import llama_forward
    from eagle_tpu.runtime.kvcache import KVCache, causal_mask_from_tags

    tokens = rng.integers(0, 256, size=(1, 8)).astype(np.int32)
    kv = KVCache.create(lcfg.n_layers, 1, 16, lcfg.n_kv_heads, lcfg.head_dim, jnp.float32)
    pos = jnp.arange(8, dtype=jnp.int32)[None, :]
    kv = kv.with_tags(pos, pos)
    mask = causal_mask_from_tags(kv.slot_pos, pos)
    ours = np.asarray(llama_forward(params, lcfg, jnp.asarray(tokens), pos, kv,
                                    pos, mask, compute_dtype=jnp.float32).logits)
    with _torch.no_grad():
        theirs = hf2(_torch.tensor(tokens, dtype=_torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-2)
