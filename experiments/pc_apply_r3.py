"""Measure full-table vs compact block-Jacobi apply at scale (round 3).

The compact class-separable form replaces the (6, X, Y, Z) per-node
inverse table read (402 MB at 50.3M DOF) with (6, 3, Y, Z) planes
expanded in-register.  This times both applies in isolation.

Usage: python experiments/pc_apply_r3.py [nx]  (default 255)
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


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench(chain, r, iters=50):
    """chain(r, n) applies the op n times with data dependence between
    applications.  Sync via a scalar fetch — block_until_ready does not
    reliably wait through the axon tunnel."""

    def sync(x):
        return float(x.ravel()[x.size // 2])

    sync(chain(r, 2))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(r, iters)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 255
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, _ = build_structured_model(
        n, n, n, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    log(f"grid {n}^3 cells, dof={model.dof_count:,}")
    ss, mf = np.float32(1.3), np.float32(4.0e6)

    full = jax.jit(
        lambda m: sops.build_block_jacobi_inverse_structured(m, ss, mf)
    )(model)
    jax.block_until_ready(full)
    compact = jax.jit(lambda m: sops.build_compact_block_jacobi(m, ss, mf))(
        model
    )
    jax.block_until_ready(compact)

    key = jax.random.PRNGKey(0)
    r = jax.random.normal(key, (3,) + full.shape[1:], jnp.float32)

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def chain_full(m, pc, r, n):
        def body(_, x):
            z = sops.apply_preconditioner_structured(m, pc, x)
            return z + 1e-20 * x  # keep dependence, avoid fixed point
        return jax.lax.fori_loop(0, n, body, r)

    @partial(jax.jit, static_argnums=(3,))
    def chain_compact(m, pc, r, n):
        def body(_, x):
            z = sops.apply_compact_preconditioner_structured(m, pc, x)
            return z + 1e-20 * x
        return jax.lax.fori_loop(0, n, body, r)

    t_full = bench(lambda r, n: chain_full(model, full, r, n), r)
    t_compact = bench(lambda r, n: chain_compact(model, compact, r, n), r)
    gib = full.nbytes / 2**30
    log(f"full table apply   : {t_full:8.3f} ms  (table {gib:.2f} GiB)")
    log(f"compact apply      : {t_compact:8.3f} ms")
    log(f"speedup            : {t_full / t_compact:.2f}x")


if __name__ == "__main__":
    main()
