"""Probe: which in-kernel gather forms does Mosaic (Pallas TPU) support,
and how fast are they from VMEM?  (ADR-20 evidence.)

Run one case per process (compile hangs must not kill the matrix):
    python experiments/exp_pallas_gather.py <case> [n] [m]
cases: 1d, take, 2d, lane, 1d_big
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch(y):
    return float(jnp.sum(jnp.abs(y.ravel()[:8])))


def measure(name, fn, *args, per=1):
    print(f"--- {name}", flush=True)
    t0 = time.perf_counter()
    y = jax.jit(fn)(*args)
    c = fetch(y)
    print(f"    compiles+runs ({time.perf_counter()-t0:.1f}s) checksum {c:.3e}", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = jax.jit(fn)(*args)
        c = fetch(y)
        best = min(best, time.perf_counter() - t0)
    print(f"    best {best*1e3:.3f} ms => {best/per*1e9:.3f} ns/unit", flush=True)


def main():
    case = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 131072
    rng = np.random.default_rng(0)

    if case in ("1d", "1d_big"):
        k = 8 if case == "1d_big" else 1
        table = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n, size=(m,), dtype=np.int32))

        def kern(x_ref, i_ref, o_ref):
            x = x_ref[:]
            acc = jnp.zeros((m,), jnp.float32)
            for _ in range(k):
                acc = acc * 0.5 + x[i_ref[:]]
            o_ref[:] = acc

        def run(x, i):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((m,), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, i)

        measure(f"1-D VMEM gather: {k}x {m:,} from ({n:,},)", run, table, idx, per=k * m)

    elif case == "take":
        table = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n, size=(m,), dtype=np.int32))

        def kern(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)

        def run(x, i):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((m,), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, i)

        measure(f"jnp.take {m:,} from ({n:,},)", run, table, idx, per=m)

    elif case == "2d":
        table = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n, size=(m,), dtype=np.int32))

        def kern(x_ref, i_ref, o_ref):
            o_ref[:] = x_ref[i_ref[:], :]

        def run(x, i):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((m, 8), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, i)

        measure(f"2-D row gather {m:,} rows of ({n:,},8)", run, table, idx, per=m)

    elif case == "lane":
        table = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 128, size=(8, 128), dtype=np.int32))

        def kern(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

        def run(x, i):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, i)

        measure("take_along_axis lanes (8,128)", run, table, idx, per=1024)

    print(f"device: {jax.devices()[0]}", flush=True)


if __name__ == "__main__":
    main()
