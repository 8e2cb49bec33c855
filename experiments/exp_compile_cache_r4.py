"""Isolate XLA compile time from relay transfer noise at 255^3 (VERDICT #2).

bench.py's 'compile + first run' conflates (a) trace+lower, (b) XLA
compile (cached by utils/compile_cache.py), and (c) the FIRST transfer
of ~350 MB of model/state arrays through the axon tunnel (0.1-2 MB/s,
wildly variable: 270 s / 479 s / 1499 s across runs of the same code).
This probe times ONLY (a)+(b) via AOT lower/compile on abstract shapes —
no arrays ever move.  Run twice in separate processes: the second run's
compile() time is the persistent-cache hit.

Usage: python experiments/exp_compile_cache_r4.py [nx]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from civiwave_tpu.utils.compile_cache import enable_persistent_cache

print("cache:", enable_persistent_cache(), flush=True)

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.physics import materials
from civiwave_tpu.solver.stepper import effective_scalars, newmark_step
from civiwave_tpu.utils.synthetic import cantilever_config

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 255

t0 = time.perf_counter()
cfg = cantilever_config()
mats = [materials.make_properties(m) for m in cfg.materials]
ray = materials.compute_rayleigh(cfg.damping)
model, force = build_structured_model(
    nx, nx, nx, mats[0], cfg.materials[0].density,
    traction=(0.0, 0.0, -1.0e6),
)
jax.block_until_ready((model, force))
_ = float(jnp.sum(model.mass_grid[0, 0, :4]))  # relay-reliable sync
print(f"build+transfer: {time.perf_counter()-t0:.1f}s "
      f"(dof={model.dof_count:,})", flush=True)

pc_ss, pc_mf = effective_scalars(1.0e-3, ray.alpha, ray.beta)
pcj = jax.jit(lambda m, a, b: m.build_preconditioner(a, b))
t0 = time.perf_counter()
pc_lowered = pcj.lower(model, pc_ss, pc_mf)
pc_compiled = pc_lowered.compile()
print(f"preconditioner lower+compile: {time.perf_counter()-t0:.1f}s",
      flush=True)

step = jax.jit(
    partial(newmark_step, rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta)
)
pc_shape = jax.eval_shape(lambda m, a, b: m.build_preconditioner(a, b),
                          model, pc_ss, pc_mf)
state = model.zero_state()
t0 = time.perf_counter()
lowered = step.lower(
    model, state, force, 1.0e-3, 2.0e-4, 120,
    preconditioner=pc_shape,
)
t_lower = time.perf_counter() - t0
t0 = time.perf_counter()
compiled = lowered.compile()
t_compile = time.perf_counter() - t0
print(f"newmark step lower: {t_lower:.1f}s, compile: {t_compile:.1f}s",
      flush=True)
