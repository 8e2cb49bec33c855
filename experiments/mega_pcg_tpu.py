"""Validate + time the whole-iteration PCG kernel ON THE TPU.

Solves one Newmark-style system with the classic loop and with the
megafused loop (auto-selected inside solve_pcg_fused on eligible grids),
checks solution agreement, then times fixed-iteration chains.

Usage: python experiments/mega_pcg_tpu.py [nx]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.physics import materials
from civiwave_tpu.solver.pcg import solve_pcg
from civiwave_tpu.utils.synthetic import cantilever_config


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 95
    cfg = cantilever_config(traction=-1.0e6)
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, force = build_structured_model(
        n, n, n, mats[0], cfg.materials[0].density,
        fixed_axis_planes=("x0",),
        traction=(0.0, 0.0, -1.0e6), traction_plane="x1",
    )
    log(f"grid {n}^3, dof={model.dof_count:,}")
    ss, mf = np.float32(1.0), np.float32(4.0e6)
    pc = jax.jit(lambda m: m.build_preconditioner(ss, mf))(model)
    rhs = jnp.where(model.bc_mask, model.bc_value, force)
    x0 = jnp.zeros(model.vector_shape, jnp.float32)

    sol = {}
    for name in ("classic", "fused"):
        solve = jax.jit(
            lambda m, r, x, p, v=name: solve_pcg(
                m, r, ss, mf, 2.0e-4, 120, x, warm_start=False,
                preconditioner=p, variant=v,
            )
        )
        x, tel = solve(model, rhs, x0, pc)
        sol[name] = np.asarray(x)
        log(
            f"[{name}] iters={int(tel.iterations)} conv={bool(tel.converged)}"
            f" res={float(tel.residual_norm):.3e}"
        )
    scale = np.abs(sol["classic"]).max() + 1e-30
    d = np.abs(sol["fused"] - sol["classic"]).max() / scale
    log(f"solution rel diff fused vs classic: {d:.3e}")
    assert d < 5.0e-4, d
    log("validate OK")

    # fixed-iteration timing: tolerance ~0 forces exactly `cap` iterations
    for name in ("fused", "classic"):
        solve = jax.jit(
            lambda m, r, x, p, v=name: solve_pcg(
                m, r, ss, mf, 1.0e-30, 64, x, warm_start=False,
                preconditioner=p, variant=v,
            )[0]
        )
        y = solve(model, rhs, x0, pc)
        _ = float(y.ravel()[y.size // 2])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = solve(model, rhs, x0, pc)
            _ = float(y.ravel()[y.size // 2])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / 64 * 1e3:.2f} ms per iteration (64-iter solve)")


if __name__ == "__main__":
    main()
