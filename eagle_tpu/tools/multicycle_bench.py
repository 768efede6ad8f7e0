"""Wall-clock multi-cycle-dispatch bench: ms/cycle including the
per-dispatch host<->device round trip, at 7B synth scale (the measurement
behind BENCHMARKS.md's multi-cycle table).

Usage: python -m eagle_tpu.tools.multicycle_bench
"""

import dataclasses, pathlib, time
import jax
jax.config.update("jax_compilation_cache_dir", str(pathlib.Path("/root/repo/.jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from eagle_tpu.models.synth import VICUNA_7B, synth_llama_params, synth_eagle_params
from eagle_tpu.runtime.speculative import EagleChainEngine

cfg = VICUNA_7B
params = synth_llama_params(cfg, seed=0, on_device=True, packed=True,
                            scale_dtype=jnp.bfloat16, coded=True)
dcfg = dataclasses.replace(cfg, n_layers=1, is_eagle=True)
dparams = jax.tree_util.tree_map(jnp.asarray, synth_eagle_params(
    dcfg, seed=1, packed=True, scale_dtype=jnp.bfloat16))
eng = EagleChainEngine(params, dparams, cfg, dcfg, n_draft=5, max_seq=1024,
                       backend="pallas", eos_id=-1)
t = 16
toks = jnp.zeros((1, t), jnp.int32)
nv = jnp.asarray([8], jnp.int32)

def run(C, n_disp, warm=True):
    st = eng._prefill_jit(eng.fresh_state(), toks, nv, t=t)
    lim = eng.kv_read_bucket(8 + n_disp * C * (eng.K + 2))
    outs = 0
    t0 = time.time()
    for _ in range(n_disp):
        if C == 1:
            r = eng._cycle_jit(st, kv_limit=lim)
        else:
            r = eng._multi_jit(st, n_cycles=C, kv_limit=lim)
        st = r.state
        no = np.asarray(r.n_out)  # sync (host reads tokens each dispatch)
        _ = np.asarray(r.tokens)
        outs += int(no.sum())
    dt = time.time() - t0
    return dt, outs

for C, n_disp in ((1, 32), (4, 8), (8, 4)):
    run(C, 1)  # compile + warm
    best = None
    for _ in range(3):
        dt, outs = run(C, n_disp)
        best = dt if best is None else min(best, dt)
    cycles = n_disp * C
    print(f"C={C}: {best*1e3:.1f} ms wall for {cycles} cycles "
          f"({best*1e3/cycles:.2f} ms/cycle incl. dispatch; emitted {outs})", flush=True)
