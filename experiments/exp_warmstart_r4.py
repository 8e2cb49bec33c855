"""Round-4: warm-start policy effect on PCG iterations/step at scale.

VERDICT r3 #4: 24.8 iters x 7.18 ms dominates the 50.3M step; multigrid
is a measured dead end (ADR-15), so iteration count must come from a
better seed.  Policies (solver/stepper.py): 'predictor' (ships),
'delta' (seed = u_pred + previous implicit correction).

Usage: python experiments/exp_warmstart_r4.py [nx [steps]]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from civiwave_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.physics import materials
from civiwave_tpu.solver.stepper import effective_scalars, newmark_step
from civiwave_tpu.utils.synthetic import cantilever_config

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 127
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

cfg = cantilever_config()
mats = [materials.make_properties(m) for m in cfg.materials]
ray = materials.compute_rayleigh(cfg.damping)
model, force = build_structured_model(
    nx, nx, nx, mats[0], cfg.materials[0].density,
    traction=(0.0, 0.0, -1.0e6),
)
dof = model.dof_count
print(f"grid {nx}^3, dof={dof:,}, device {jax.devices()[0]}", flush=True)

pc_ss, pc_mf = effective_scalars(1.0e-3, ray.alpha, ray.beta)
pc = jax.jit(lambda m, a, b: m.build_preconditioner(a, b))(model, pc_ss, pc_mf)


def run(policy):
    step = partial(
        newmark_step,
        rayleigh_alpha=ray.alpha,
        rayleigh_beta=ray.beta,
        warm_start_policy=policy,
    )

    @jax.jit
    def run_steps(m, s, f, pcv):
        def body(i, carry):
            s, iters = carry
            out = step(m, s, f, 1.0e-3, 2.0e-4, 120, preconditioner=pcv)
            return out.state, iters + out.pcg.iterations

        return jax.lax.fori_loop(0, n_steps, body, (s, jnp.int32(0)))

    state0 = model.zero_state()
    t0 = time.perf_counter()
    final, iters = run_steps(model, state0, force, pc)
    u = final.displacement.ravel()
    chk = float(jnp.sum(jnp.abs(u[u.size // 2 : u.size // 2 + 64])))
    print(f"  [{policy}] compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    final, iters = run_steps(model, state0, force, pc)
    u = final.displacement.ravel()
    chk = float(jnp.sum(jnp.abs(u[u.size // 2 : u.size // 2 + 64])))
    dt = time.perf_counter() - t0
    print(
        f"  [{policy}] {n_steps/dt:.2f} steps/s, "
        f"{int(iters)/n_steps:.2f} iters/step, chk {chk:.6e}", flush=True
    )


for policy in ("predictor", "delta", "solution"):
    run(policy)
