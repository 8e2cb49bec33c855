"""Decompose the 50.3M-DOF structured matvec: fused kernel vs envelope.

Times (a) the full apply_keff_structured, (b) the fused pallas_call alone,
(c) the interior-only pallas kernel — each as 32 chained calls inside one
jitted fori_loop (axon relay: ~25 ms/dispatch, so per-call timing needs
chaining; sync via host scalar fetch).  Run from /root/repo (cwd import).
"""

import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.ops import structured as st
from civiwave_tpu.ops.pallas.structured_stencil import (
    apply_keff_fused_pallas,
    interior_stencil_pallas,
)
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import cantilever_config

N = int(os.environ.get("DECOMP_N", "255"))
INNER = 32


def chain(fn):
    @jax.jit
    def run(m, x):
        def body(_, y):
            return fn(m, y) * np.float32(1e-9)

        return jax.lax.fori_loop(0, INNER, body, x)

    return run


def timeit(run, model, x0, label):
    def sync(x):
        y = run(model, x)
        return float(jnp.sum(jnp.abs(y.ravel()[: 64])))

    t0 = time.perf_counter()
    sync(x0)
    print(f"[{label}] compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for rep in range(4):
        t0 = time.perf_counter()
        sync(x0)
        best = min(best, time.perf_counter() - t0)
    ms = best / INNER * 1e3
    print(f"[{label}] {ms:8.3f} ms/call", flush=True)
    return ms


def main():
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, _f = build_structured_model(
        N, N, N, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    x0 = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((3,) + tuple(model.grid_shape))
        .astype(np.float32)
    )
    ss = np.float32(1.0)
    mf = np.float32(4.0e6)
    taps = st._stencil_tables(model.spacing, model.lam0, model.mu0)[0]

    t_full = timeit(
        chain(lambda m, v: st.apply_keff_structured(m, v, ss, mf)),
        model, x0, "full",
    )
    t_fused = timeit(
        chain(lambda m, v: apply_keff_fused_pallas(m, v, ss, mf, taps)),
        model, x0, "fused-kernel-only",
    )
    t_int = timeit(
        chain(lambda m, v: interior_stencil_pallas(v, taps)), model, x0,
        "interior-only",
    )
    gb = x0.size * 4 / 1e9
    print(f"grid {model.grid_shape} dof {x0.size}")
    print(f"envelope (face corr): {t_full - t_fused:.3f} ms")
    print(f"fused effective BW if 4x footprint: {4*gb/(t_fused/1e3):.0f} GB/s")


if __name__ == "__main__":
    main()
