"""Bisect the Mosaic VectorLayout bitwidth crash in the streaming kernel.

Variants (pass name as argv[1]):
  copy      — scratch rotation only, trivial compute
  when      — + pl.when(i >= 2) guarded compute from scratch
  maxidx    — + jnp.maximum output index map
  mass      — + iota-based mass synthesis
  int8      — + int8 second stream with cast
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

variant = sys.argv[1] if len(sys.argv) > 1 else "copy"
import os
X, Y, Z = 16, int(os.environ.get("BY", 64)), int(os.environ.get("BZ", 128))


def make(variant):
    use_max = variant in ("maxidx", "mass", "int8")
    use_when = variant != "copy"
    use_mass = variant in ("mass", "int8")
    use_int8 = variant == "int8"

    def kernel(*refs):
        if use_int8:
            x_ref, b_ref, out_ref, s0, s1 = refs
        else:
            x_ref, out_ref, s0, s1 = refs
        i = pl.program_id(0)
        new = x_ref[:, 0]
        if use_int8:
            new = new * (1.0 - b_ref[:, 0].astype(jnp.float32))

        if use_when:
            @pl.when(i >= 2)
            def _():
                val = s0[...] + 2.0 * s1[...] + new
                if use_mass:
                    io = i - 2
                    row = jax.lax.broadcasted_iota(jnp.int32, (Y, Z), 0)
                    col = jax.lax.broadcasted_iota(jnp.int32, (Y, Z), 1)
                    wx = jnp.where((io == 0) | (io == X - 1), 0.5, 1.0)
                    wy = jnp.where((row == 0) | (row == Y - 1), 0.5, 1.0)
                    wz = jnp.where((col == 0) | (col == Z - 1), 0.5, 1.0)
                    val = val + ((np.float32(3.0) * wx) * wy) * wz
                out_ref[:, 0] = val
        else:
            out_ref[:, 0] = new + s0[...]
        s0[...] = s1[...]
        s1[...] = new

    plane = pl.BlockSpec(
        (3, 1, Y, Z), lambda i: (i * 0, i, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    if use_max:
        out_map = lambda i: (i * 0, jnp.maximum(i - 2, i * 0), i * 0, i * 0)  # noqa
        grid = X + 2
    else:
        out_map = lambda i: (i * 0, i, i * 0, i * 0)  # noqa
        grid = X
    in_specs = [plane, plane] if use_int8 else [plane]

    def run(x, b):
        args = (x, b) if use_int8 else (x,)
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (3, 1, Y, Z), out_map, memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((3, X, Y, Z), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((3, Y, Z), jnp.float32),
                pltpu.VMEM((3, Y, Z), jnp.float32),
            ],
        )(*args)

    return run


x = jnp.asarray(np.random.default_rng(0).standard_normal((3, X + 2, Y, Z)), jnp.float32)
b = jnp.zeros((3, X + 2, Y, Z), jnp.int8)
out = jax.jit(make(variant))(x, b)
print(variant, "ok", float(jnp.sum(out)))

# --- variant "smem": SMEM scalar * where-select vector (suspect) ---
if variant == "smem":
    def k2(m_ref, x_ref, out_ref):
        row = jax.lax.broadcasted_iota(jnp.int32, (Y, Z), 0)
        wy = jnp.where((row == 0) | (row == Y - 1), 0.5, 1.0)
        out_ref[...] = x_ref[...] * (m_ref[0, 0] * wy)

    r = pl.pallas_call(
        k2,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Y, Z), jnp.float32),
    )(jnp.full((1, 1), 3.0, jnp.float32), jnp.ones((Y, Z), jnp.float32))
    print("smem ok", float(jnp.sum(r)))
