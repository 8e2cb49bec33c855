"""Per-op cost inside the plane pipeline: FMA vs sublane roll (dy) vs lane
roll (dz) vs masked where.  Same grid/block shape as the fused matvec.

Usage: python experiments/roll_cost_probe.py [n_ops] [y] [z]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_OPS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
Y = int(sys.argv[2]) if len(sys.argv) > 2 else 256
Z = int(sys.argv[3]) if len(sys.argv) > 3 else 256
X = 256


def make(kind):
    def kernel(x_ref, out_ref, kind=kind):
        v = x_ref[:, 0]  # (3, Y, Z)
        v1 = x_ref[0, 0]  # (Y, Z) single component
        acc = v
        acc1 = v1
        row = jax.lax.broadcasted_iota(jnp.int32, (Y, Z), 0)
        cond = row >= 1
        accs = [v1, v1 * 2.0, v1 * 3.0, v1 * 4.0]
        for k in range(N_OPS):
            w = np.float32(1.0 + 1e-6 * k)
            if kind == "fma":
                acc = acc + w * v
            elif kind == "rolly":
                acc = acc + pltpu.roll(v, np.int32(1 + (k % 3)), axis=1)
            elif kind == "rollz":
                acc = acc + pltpu.roll(v, np.int32(1 + (k % 3)), axis=2)
            elif kind == "rolly1":
                acc1 = acc1 + pltpu.roll(v1, np.int32(1 + (k % 3)), axis=0)
            elif kind == "rollz1":
                acc1 = acc1 + pltpu.roll(v1, np.int32(1 + (k % 3)), axis=1)
            elif kind == "fma1":
                acc1 = acc1 + np.float32(1.0 + 1e-6 * k) * v1
            elif kind == "fma1ilp":
                # 4 independent chains — measures ILP headroom
                j = k % 4
                accs[j] = accs[j] + np.float32(1.0 + 1e-6 * k) * v1
            elif kind == "where1":
                acc1 = acc1 + jnp.where(cond, v1 * np.float32(1.0 + 1e-6 * k), 0.0)
            elif kind == "where":
                acc = acc + jnp.where(cond, v * w, 0.0)
        if kind == "fma1ilp":
            acc1 = accs[0] + accs[1] + accs[2] + accs[3]
        if kind in ("rolly1", "rollz1", "fma1", "fma1ilp", "where1"):
            out_ref[:, 0] = jnp.stack([acc1, acc1, acc1])
        else:
            out_ref[:, 0] = acc

    spec = pl.BlockSpec(
        (3, 1, Y, Z), lambda i: (i * 0, i, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(X,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((3, X, Y, Z), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(x)
    return run


x = jnp.asarray(
    np.random.default_rng(0).standard_normal((3, X, Y, Z)), jnp.float32
)
for kind in ("fma", "rolly", "rollz", "where", "fma1", "fma1ilp", "rolly1", "rollz1", "where1"):
    @jax.jit
    def loop(x, kind=kind):
        def body(_, v):
            return make(kind)(v) * np.float32(1.0 / (N_OPS + 1))
        return jax.lax.fori_loop(0, 8, body, x)

    yv = loop(x)
    _ = float(yv.ravel()[yv.size // 2])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        yv = loop(x)
        _ = float(yv.ravel()[yv.size // 2])
        best = min(best, time.perf_counter() - t0)
    per_op_ns = best / 8 / X / N_OPS * 1e9
    print(f"{kind}: {best / 8 * 1e3:.2f} ms/pass  {per_op_ns:.0f} ns/op/plane")
