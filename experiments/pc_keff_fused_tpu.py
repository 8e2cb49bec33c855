"""Validate + time the fused pc+matvec mega kernel ON THE TPU.

Compares (u, w) against the composition (class-table pc apply then the
fused matvec kernel), then times chained mega-kernel applications vs the
chained composition at the given size.

Usage: python experiments/pc_keff_fused_tpu.py [nx] [reps]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.ops import structured as sops
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import cantilever_config


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 95
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, _ = build_structured_model(
        n, n, n, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    dof = model.dof_count
    log(f"grid {n}^3, dof={dof:,}")
    ss, mf = np.float32(1.3), np.float32(2.5e5)
    pc = jax.jit(lambda m: sops.build_compact_block_jacobi(m, ss, mf))(model)
    rng = np.random.default_rng(0)
    r0 = jnp.asarray(rng.standard_normal(model.vector_shape), jnp.float32)

    @jax.jit
    def fused_once(m, p, r):
        return m.apply_pc_keff(p, r, ss, mf)

    @jax.jit
    def comp_once(m, p, r):
        u = m.apply_preconditioner(p, r)
        return u, m.apply_keff(u, ss, mf)

    u1, w1 = jax.tree.map(np.asarray, fused_once(model, pc, r0))
    u2, w2 = jax.tree.map(np.asarray, comp_once(model, pc, r0))
    du = np.max(np.abs(u1 - u2)) / (np.max(np.abs(u2)) + 1e-30)
    dw = np.max(np.abs(w1 - w2)) / (np.max(np.abs(w2)) + 1e-30)
    log(f"u rel {du:.3e}  w rel {dw:.3e}")
    assert du < 2e-6 and dw < 2e-6, (du, dw)
    log("validate OK")

    scale = np.float32(1.0 / 2.0e11)

    @jax.jit
    def chain_fused(m, p, r):
        def body(_, y):
            u, w = m.apply_pc_keff(p, y, ss, mf)
            return (w + u) * scale
        return jax.lax.fori_loop(0, inner, body, r)

    @jax.jit
    def chain_comp(m, p, r):
        def body(_, y):
            u = m.apply_preconditioner(p, y)
            w = m.apply_keff(u, ss, mf)
            return (w + u) * scale
        return jax.lax.fori_loop(0, inner, body, r)

    for name, fn in (("fused", chain_fused), ("comp ", chain_comp)):
        t0 = time.perf_counter()
        y = fn(model, pc, r0)
        _ = float(y.ravel()[y.size // 2])
        log(f"[{name}] compile+first: {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            y = fn(model, pc, r0)
            _ = float(y.ravel()[y.size // 2])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / inner * 1e3:.2f} ms per (pc+matvec)")


if __name__ == "__main__":
    main()
