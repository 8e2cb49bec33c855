"""Is the fused matvec FLOP-bound?  Time the kernel with the interior tap
table artificially thinned (wrong numerics, timing only).  If time scales
with tap count -> VPU-bound -> separable/tap-reduction rewrites pay off.

Usage: python experiments/matvec_bound_probe.py [nx] [keep_fraction]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.ops import structured as ops_mod
from civiwave_tpu.ops.pallas import structured_stencil as psten
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import cantilever_config


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 255
    keep = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, _ = build_structured_model(
        n, n, n, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    tables = ops_mod._stencil_tables(model.spacing, model.lam0, model.mu0)
    interior, faces, edges, corners = tables
    interior = np.array(interior)
    nz_idx = np.argwhere(interior != 0)
    print(f"interior nnz = {len(nz_idx)}", file=sys.stderr)
    rng = np.random.default_rng(0)
    drop = rng.choice(
        len(nz_idx), size=int(len(nz_idx) * (1 - keep)), replace=False
    )
    thin = interior.copy()
    for d in drop:
        thin[tuple(nz_idx[d])] = 0.0
    print(
        f"thinned nnz = {int((thin != 0).sum())}", file=sys.stderr
    )
    tables_thin = (thin, faces, edges, corners)

    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal(model.vector_shape),
        jnp.float32,
    )
    ss, mf = np.float32(1.0), np.float32(4.0e6)

    for label, tabs in (("full", tables), ("thin", tables_thin)):
        @jax.jit
        def mv(m, x, tabs=tabs):
            def body(_, y):
                return psten.apply_keff_fused_pallas(
                    m, y, ss, mf, tabs
                ) * np.float32(1.0 / 2.0e11)
            return jax.lax.fori_loop(0, 32, body, x)

        y = mv(model, x0)
        _ = float(y.ravel()[y.size // 2])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = mv(model, x0)
            _ = float(y.ravel()[y.size // 2])
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best / 32 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
