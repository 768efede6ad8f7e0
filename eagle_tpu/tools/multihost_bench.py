"""Multi-chip / multi-host scaling benchmark.

On a real pod slice: `python -m eagle_tpu.tools.multihost_bench --coordinator
host:port --num-processes N --process-id i` initializes jax.distributed, builds
the ("data", "model") mesh over all devices, tensor-shards the target and runs
the sharded decode + speculative cycle, reporting tokens/s and scaling
efficiency vs the single-chip number you pass with --single-chip-tps.

Without TPU pod access it still runs on any device set (e.g.
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu) to
validate the sharded program end-to-end — that mode is what CI exercises."""

from __future__ import annotations

import argparse
import dataclasses
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser("eagle-tpu multihost bench")
    ap.add_argument("--coordinator", default=None, help="host:port for jax.distributed")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--model-axis", type=int, default=None, help="tp degree (default: all devices)")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--single-chip-tps", type=float, default=None)
    ap.add_argument("--tiny", action="store_true", help="tiny dims (CI / virtual mesh)")
    args = ap.parse_args(argv)

    import jax

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax.numpy as jnp
    import numpy as np

    from ..models.config import ModelConfig
    from ..models.synth import VICUNA_7B, synth_llama_params
    from ..parallel.mesh import build_mesh
    from ..parallel.shardings import llama_param_specs, shard_params
    from ..runtime.generate import Generator
    from ..runtime.sampling import SamplerConfig

    n_dev = len(jax.devices())
    n_model = args.model_axis or n_dev
    mesh = build_mesh(n_data=n_dev // n_model, n_model=n_model)

    if args.tiny:
        # dims chosen so every sharded axis (incl. row-parallel scale rows,
        # K/group) divides an 8-way model axis
        cfg = ModelConfig(
            arch="llama", vocab_size=256, n_embd=256, n_layers=2, n_heads=8,
            n_kv_heads=8, head_dim=32, n_ff=1024, n_ctx_train=256, rope_dim=32,
        )
    else:
        cfg = dataclasses.replace(VICUNA_7B, n_layers=args.layers)
    params = synth_llama_params(cfg, seed=0, on_device=not args.tiny)

    with mesh:
        params = shard_params(params, mesh, llama_param_specs(params))
        gen = Generator(params, cfg, max_seq=512, batch=max(1, n_dev // n_model),
                        backend=None, eos_id=-1,
                        compute_dtype=jnp.bfloat16 if not args.tiny else jnp.float32)
        scfg = SamplerConfig(greedy=True)
        b = gen.batch
        tok = jnp.zeros((b,), jnp.int32)
        toks, gen.kv, _ = gen._decode_jit(
            gen.params, gen.kv, tok, jnp.full((b,), 1, jnp.int32),
            jax.random.PRNGKey(0), scfg, n_steps=4,
        )
        int(toks[0, 0])  # compile+sync
        t0 = time.time()
        toks, gen.kv, _ = gen._decode_jit(
            gen.params, gen.kv, toks[:, -1], jnp.full((b,), 5, jnp.int32),
            jax.random.PRNGKey(0), scfg, n_steps=args.steps,
        )
        int(toks[0, 0])
        dt = time.time() - t0

    tps = b * args.steps / dt
    out = {
        "devices": n_dev,
        "mesh": f"{n_dev // n_model}x{n_model}",
        "tokens_per_s": round(tps, 2),
    }
    if args.single_chip_tps:
        out["scaling_efficiency"] = round(tps / (args.single_chip_tps * n_dev), 3)
    if args.process_id == 0:
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
