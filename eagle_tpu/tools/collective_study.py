"""Collective-overlap study for the tensor-parallel decode step.

Real multi-chip hardware isn't available here, so this tool does what CAN be
done faithfully off-pod (VERDICT r1 #10): lower the SAME sharded decode
program the pod would run on a virtual 8-device mesh, extract the optimized
HLO, and analyze the collectives XLA inserted — their kind (all-reduce /
reduce-scatter / all-gather / collective-permute), count per decode step, and
payload bytes. From those it builds the v5e roofline model:

    t_comm(per layer)  = bytes_exchanged / ici_bw
    t_comp(per layer)  = weight_bytes / (tp * hbm_bw)
    efficiency(tp)     = t_comp / max(t_comp, t_comm)   (perfect overlap)
                       / (t_comp + t_comm)              (no overlap)

and reports the predicted scaling curve 1->8 chips. The ≥80% gate is decided
by whether XLA can overlap the row-parallel psum with the next matmul — the
HLO async-pair check below verifies the collectives are emitted in their
async (start/done) form, which is what the latency-hiding scheduler overlaps.

Usage (CI/virtual):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python -m eagle_tpu.tools.collective_study [--tp 8] [--json out.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import re


# v5e per-chip speeds (public spec): 819 GB/s HBM; ICI 1.6 Tbps总 ~ 2D torus,
# ~186 GB/s usable per direction pair for ring collectives (conservative).
HBM_GBS = 679.0  # measured on this chip (BENCHMARKS.md), not the 819 spec
ICI_GBS = 90.0  # conservative per-link ring bandwidth for a v5e 2D torus


def _parse_collectives(hlo: str) -> list[dict]:
    """Collect collective ops with payload sizes from optimized HLO text."""
    out = []
    pat = re.compile(
        r"(\w[\w.-]*) = (\S+) (all-reduce|reduce-scatter|all-gather|"
        r"collective-permute|all-to-all)(?:-start)?\(",
    )
    for m in pat.finditer(hlo):
        shape = m.group(2)
        kind = m.group(3)
        # shape like f32[8,256]{1,0} or tuple
        bytes_ = 0
        for s in re.finditer(r"(f32|bf16|f16|s32|u32|s8|u8)\[([\d,]*)\]", shape):
            dt = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "s8": 1, "u8": 1}[
                s.group(1)
            ]
            dims = [int(x) for x in s.group(2).split(",") if x] or [1]
            n = 1
            for d in dims:
                n *= d
            bytes_ += n * dt
        out.append({"kind": kind, "bytes": bytes_, "async": "-start(" in m.group(0)})
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=None, help="model-axis size")
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--json", default=None)
    ap.add_argument("--full-size", action="store_true",
                    help="analyze at 7B dims (slow lowering)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..models.config import ModelConfig
    from ..models.synth import VICUNA_7B, synth_llama_params
    from ..parallel.mesh import build_mesh
    from ..parallel.shardings import llama_param_specs, shard_params
    from ..runtime.generate import Generator

    n_dev = len(jax.devices())
    tp = args.tp or n_dev

    if args.full_size:
        cfg = dataclasses.replace(VICUNA_7B, n_layers=args.layers)
    else:
        cfg = ModelConfig(
            arch="llama", vocab_size=256, n_embd=256, n_layers=args.layers,
            n_heads=8, n_kv_heads=8, head_dim=32, n_ff=1024, n_ctx_train=256,
            rope_dim=32,
        )
    mesh = build_mesh(n_data=n_dev // tp, n_model=tp)
    params = synth_llama_params(cfg, seed=0)

    from ..runtime.sampling import SamplerConfig

    with mesh:
        params = shard_params(params, mesh, llama_param_specs(params))
        gen = Generator(params, cfg, max_seq=256, batch=n_dev // tp,
                        compute_dtype=jnp.float32, eos_id=-1)
        b = gen.batch
        lowered = gen._decode_jit.lower(
            gen.params, gen.kv, jnp.zeros((b,), jnp.int32),
            jnp.full((b,), 1, jnp.int32), jax.random.PRNGKey(0),
            SamplerConfig(greedy=True), n_steps=1,
        )
        hlo = lowered.compile().as_text()

    colls = _parse_collectives(hlo)
    per_kind: dict[str, dict] = {}
    for c in colls:
        k = per_kind.setdefault(c["kind"], {"count": 0, "bytes": 0, "async": 0})
        k["count"] += 1
        k["bytes"] += c["bytes"]
        k["async"] += int(c["async"])

    # roofline model at 7B dims regardless of the analyzed toy dims: what
    # matters from the HLO is the collective STRUCTURE (kinds and count per
    # layer); payload scales with d_model
    d, f, L = 4096, 11008, 32
    bytes_per_layer_w = (d * (d + 2 * d) // 2 + 2 * f * d // 2 + f * d // 2
                         + d * d // 2)  # q4 packed qkv+gate_up+down+wo
    # per layer: one psum after attention o-proj + one after ffn down-proj,
    # activation [B=1, d] f32 ring all-reduce: 2 * bytes * (tp-1)/tp each
    act_bytes = d * 4
    rows = []
    for tp_i in (1, 2, 4, 8):
        t_comp = bytes_per_layer_w / (tp_i * HBM_GBS * 1e9)
        t_comm = 0.0 if tp_i == 1 else 2 * (2 * act_bytes * (tp_i - 1) / tp_i) / (ICI_GBS * 1e9)
        eff_overlap = t_comp / max(t_comp, t_comm)
        eff_serial = t_comp / (t_comp + t_comm)
        rows.append({
            "tp": tp_i,
            "t_comp_us_per_layer": round(t_comp * 1e6, 2),
            "t_comm_us_per_layer": round(t_comm * 1e6, 2),
            "eff_overlapped": round(eff_overlap, 3),
            "eff_serial": round(eff_serial, 3),
        })

    # execute one sharded step to prove the program runs on the mesh
    import numpy as np

    with mesh:
        toks, _, _ = gen._decode_jit(
            gen.params, gen.kv, jnp.zeros((b,), jnp.int32),
            jnp.full((b,), 1, jnp.int32), jax.random.PRNGKey(0),
            SamplerConfig(greedy=True), n_steps=2,
        )
        executed = bool(np.asarray(toks).shape == (b, 2))

    n_layers = cfg.n_layers
    report = {
        "mesh": f"{n_dev // tp}x{tp}",
        "executed_on_virtual_mesh": executed,
        "collectives_per_step": {
            k: {"count": v["count"], "per_layer": v["count"] / n_layers,
                "bytes": v["bytes"], "async_form": v["async"]}
            for k, v in per_kind.items()
        },
        "v5e_roofline_7B_q4": rows,
        "notes": [
            "collective structure extracted from the optimized HLO of the SAME"
            " sharded decode program a pod would run (virtual 8-device mesh)",
            "async start/done pairing is inserted by the TPU latency-hiding"
            " scheduler, absent on the CPU backend — async_form=0 here is"
            " expected; payload sizes + kinds are backend-independent",
            "decode at B=1 is HBM-bound: even fully serialized activation"
            " all-reduces cost <4% at tp=8, so the >=80% scaling gate is"
            " predicted met with wide margin; real-pod validation still"
            " required (no multi-chip hardware in this environment)",
        ],
    }
    print(json.dumps(report, indent=1))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
