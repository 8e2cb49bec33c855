"""Minimal mirror of the streaming-kernel when-body to pin the Mosaic
VectorLayout bitwidth crash.  argv[1]: scalar | vector | novecwrite |
nof0 | noident | noss
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

variant = sys.argv[1] if len(sys.argv) > 1 else "vector"
X = 13
Y = int(os.environ.get("BY", 13))
Z = int(os.environ.get("BZ", 13))
ny, nz = Y - 1, Z - 1


def kernel(ss_ref, mf_ref, xlo_ref, xhi_ref, m8_ref, x_ref, bc_ref,
           out_ref, san_m, san_0, raw_0, free_0):
    i = pl.program_id(0)
    new_raw = x_ref[:, 0]
    new_free = 1.0 - bc_ref[:, 0].astype(jnp.float32)
    new_san = new_raw * new_free

    @pl.when(i >= 2)
    def _():
        io = i - 2
        xlo = xlo_ref[0, 0]
        xhi = xhi_ref[0, 0]
        row = jax.lax.broadcasted_iota(jnp.int32, (Y, Z), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Y, Z), 1)
        wx = jnp.where((io == xlo) | (io == xhi), 0.5, 1.0)
        wy = jnp.where((row == 0) | (row == ny), 0.5, 1.0)
        wz = jnp.where((col == 0) | (col == nz), 0.5, 1.0)
        if variant == "scalar":
            mass = m8_ref[0, 0] * wx
        else:
            mass = ((m8_ref[0, 0] * wx) * wy) * wz
        ss = ss_ref[0, 0]
        mf = mf_ref[0, 0]
        xs0 = san_0[...]
        inter = jnp.stack([
            jnp.zeros((Y, Z), jnp.float32) for _ in range(3)
        ])
        out = (mf * mass) * xs0
        if variant != "noss":
            out = ss * inter + out
        f0 = free_0[...]
        x_raw = raw_0[...]
        if variant == "nof0":
            out_ref[:, 0] = out
        elif variant == "noident":
            out_ref[:, 0] = f0 * out
        else:
            out_ref[:, 0] = f0 * out + (1.0 - f0) * x_raw

    san_m[...] = san_0[...]
    san_0[...] = new_san
    raw_0[...] = new_raw
    free_0[...] = new_free


plane = pl.BlockSpec(
    (3, 1, Y, Z), lambda i: (i * 0, i, i * 0, i * 0),
    memory_space=pltpu.VMEM,
)
smem = pl.BlockSpec((1, 1), lambda i: (i * 0, i * 0), memory_space=pltpu.SMEM)

x = jnp.asarray(
    np.random.default_rng(0).standard_normal((3, X + 2, Y, Z)), jnp.float32
)
bc = jnp.zeros((3, X + 2, Y, Z), jnp.int8)
sc = lambda v, dt=jnp.float32: jnp.full((1, 1), v, dt)  # noqa: E731

out = pl.pallas_call(
    kernel,
    grid=(X + 2,),
    in_specs=[smem, smem, smem, smem, smem, plane, plane],
    out_specs=pl.BlockSpec(
        (3, 1, Y, Z),
        lambda i: (i * 0, jnp.maximum(i - 2, i * 0), i * 0, i * 0),
        memory_space=pltpu.VMEM,
    ),
    out_shape=jax.ShapeDtypeStruct((3, X, Y, Z), jnp.float32),
    scratch_shapes=[pltpu.VMEM((3, Y, Z), jnp.float32)] * 4,
)(sc(1.3), sc(2.5e5), sc(0, jnp.int32), sc(X - 1, jnp.int32), sc(3.0), x, bc)
print(variant, "ok", float(jnp.sum(out)))
