"""Round-3 step decomposition at scale, post-ADR-21.

ADR-16 measured (with the 9.26 ms matvec): 76.3 ms fixed/step + 13.9 ms/iter
(9.26 matvec + ~4.6 tail).  The complete-operator kernel (ADR-21) halved the
matvec to 4.63 ms; this re-measures the split so the next lever is chosen
from current numbers, not stale ones.

Method: run N steps at a forced iteration count (tolerance ~0 so every step
runs exactly `cap` iterations) for several caps; the slope is ms/iteration,
the intercept is the fixed per-step cost.  Also times the matvec and the
isolated preconditioner-apply stream for the tail breakdown.

Usage: python experiments/step_decomp_r3.py [nx]  (default 255)
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.physics import materials
from civiwave_tpu.solver.stepper import effective_scalars, newmark_step
from civiwave_tpu.utils.synthetic import cantilever_config


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 255
    variant = sys.argv[2] if len(sys.argv) > 2 else "classic"
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, force = build_structured_model(
        n, n, n, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    dof = model.dof_count
    log(f"grid {n}^3 cells, dof={dof:,}, variant={variant}")

    ray = materials.compute_rayleigh(cfg.damping)
    step = partial(
        newmark_step, rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
        solver_variant=variant,
    )
    pc_ss, pc_mf = effective_scalars(1.0e-3, ray.alpha, ray.beta)
    pc = jax.jit(lambda m, a, b: m.build_preconditioner(a, b))(
        model, pc_ss, pc_mf
    )

    n_steps = 8

    @jax.jit
    def run_steps(m, s, f, pc, tol, cap):
        def body(i, carry):
            s, iters = carry
            out = step(m, s, f, 1.0e-3, tol, cap, preconditioner=pc)
            return out.state, iters + out.pcg.iterations

        return jax.lax.fori_loop(0, n_steps, body, (s, jnp.int32(0)))

    def sync(s):
        u = s.displacement.ravel()
        return float(jnp.sum(jnp.abs(u[u.size // 2 : u.size // 2 + 64])))

    state0 = model.zero_state()
    rows = []
    for cap in (0, 4, 16, 32):
        tol = np.float32(1.0e-30)  # never converges -> exactly `cap` iters
        fs, it = run_steps(model, state0, force, pc, tol, jnp.int32(cap))
        sync(fs)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fs, it = run_steps(model, state0, force, pc, tol, jnp.int32(cap))
            sync(fs)
            best = min(best, time.perf_counter() - t0)
        ms_step = best / n_steps * 1e3
        rows.append((cap, ms_step))
        log(f"cap={cap:3d}: {ms_step:8.2f} ms/step (iters/step={int(it)/n_steps:.0f})")

    # least-squares slope/intercept over the swept caps
    caps = np.array([r[0] for r in rows], np.float64)
    ms = np.array([r[1] for r in rows], np.float64)
    A = np.stack([caps, np.ones_like(caps)], axis=1)
    (slope, intercept), *_ = np.linalg.lstsq(A, ms, rcond=None)
    log(f"per-iteration: {slope:.2f} ms   fixed per-step: {intercept:.2f} ms")

    # isolated matvec
    @jax.jit
    def mv(m, x):
        def body(_, y):
            return m.apply_keff(y, np.float32(1.0), np.float32(4.0e6)) * np.float32(
                1.0 / 2.0e11
            )
        return jax.lax.fori_loop(0, 32, body, x)

    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal(model.vector_shape),
        jnp.float32,
    )
    y = mv(model, x0)
    _ = float(y.ravel()[y.size // 2])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = mv(model, x0)
        _ = float(y.ravel()[y.size // 2])
        best = min(best, time.perf_counter() - t0)
    log(f"matvec alone: {best / 32 * 1e3:.2f} ms")

    # isolated preconditioner apply (the biggest non-matvec stream)
    @jax.jit
    def pcapply(m, pcv, r):
        def body(_, z):
            return m.apply_preconditioner(pcv, z)
        return jax.lax.fori_loop(0, 32, body, r)

    z = pcapply(model, pc, x0)
    _ = float(z.ravel()[z.size // 2])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        z = pcapply(model, pc, x0)
        _ = float(z.ravel()[z.size // 2])
        best = min(best, time.perf_counter() - t0)
    log(f"preconditioner apply alone: {best / 32 * 1e3:.2f} ms")
    log(f"summary: slope={slope:.2f} ms/iter, fixed={intercept:.2f} ms/step")


if __name__ == "__main__":
    main()
