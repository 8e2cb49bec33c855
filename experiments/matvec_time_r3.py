"""Time the structured matvec alone at a given grid size on the TPU.

Chained fori_loop keeps the ~27 ms axon dispatch RTT out of the per-call
number; sync is a scalar fetch (block_until_ready is a relay no-op).

Usage: python experiments/matvec_time_r3.py [nx] [reps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import cantilever_config


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 255
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, _ = build_structured_model(
        n, n, n, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    dof = model.dof_count
    print(f"grid {n}^3 cells, dof={dof:,}", file=sys.stderr, flush=True)

    @jax.jit
    def mv(m, x):
        def body(_, y):
            return m.apply_keff(y, np.float32(1.0), np.float32(4.0e6)) * (
                np.float32(1.0 / 2.0e11)
            )
        return jax.lax.fori_loop(0, inner, body, x)

    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal(model.vector_shape),
        jnp.float32,
    )
    t0 = time.perf_counter()
    y = mv(model, x0)
    _ = float(y.ravel()[y.size // 2])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        y = mv(model, x0)
        _ = float(y.ravel()[y.size // 2])
        best = min(best, time.perf_counter() - t0)
    ms = best / inner * 1e3
    gdofs = dof / (ms * 1e-3) / 1e9
    print(f"matvec: {ms:.2f} ms  ({gdofs:.2f} GDOF/s)")


if __name__ == "__main__":
    main()
