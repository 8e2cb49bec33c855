"""Probe tpu.dynamic_gather (take_along_axis in Pallas) semantics + speed.

Usage: python experiments/exp_dynamic_gather.py <case>
cases:
  ax0_small   — correctness: axis=0 on (8,128) vs numpy
  ax0_cross   — correctness: axis=0 on (64,128), indices cross vreg rows
  ax0_big     — speed: axis=0 on (18816,128) ~ 2.4M elems, chained
  ax1_small   — correctness: axis=1 on (8,128)
  ax1_big     — speed: axis=1 on (18816,128)
  xla_ax0     — speed: plain-XLA take_along_axis axis=0 on (18816,128)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_taa(x, i, axis):
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(i.shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i)


def correctness(s, axis):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((s, 128)).astype(np.float32)
    hi = s if axis == 0 else 128
    i = rng.integers(0, hi, size=(s, 128), dtype=np.int32)
    print(f"axis={axis} shape=({s},128): compiling...", flush=True)
    y = jax.jit(lambda a, b: pallas_taa(a, b, axis))(jnp.asarray(x), jnp.asarray(i))
    y = np.asarray(y)
    ref = np.take_along_axis(x, i, axis=axis)
    ok = np.array_equal(y, ref)
    print(f"  match={ok}  (max abs diff {np.abs(y-ref).max():.2e})", flush=True)


def speed(s, axis, pallas=True, k=16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((s, 128)).astype(np.float32))
    hi = s if axis == 0 else 128
    i = jnp.asarray(rng.integers(0, hi, size=(s, 128), dtype=np.int32))

    if pallas:
        def kern(x_ref, i_ref, o_ref):
            acc = x_ref[:]
            for _ in range(k):
                acc = jnp.take_along_axis(acc, i_ref[:], axis=axis) * 0.999
            o_ref[:] = acc

        def run(x, i):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((s, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, i)
    else:
        def run(x, i):
            def body(_, acc):
                return jnp.take_along_axis(acc, i, axis=axis) * 0.999

            return jax.lax.fori_loop(0, k, body, x)

    jr = jax.jit(run)
    print(f"axis={axis} shape=({s},128) pallas={pallas}: compiling...", flush=True)
    t0 = time.perf_counter()
    y = jr(x, i)
    c = float(jnp.sum(jnp.abs(y.ravel()[:8])))
    print(f"  compile+run {time.perf_counter()-t0:.1f}s checksum {c:.2e}", flush=True)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        y = jr(x, i)
        c = float(jnp.sum(jnp.abs(y.ravel()[:8])))
        best = min(best, time.perf_counter() - t0)
    n = s * 128
    print(
        f"  best {best*1e3:.3f} ms for {k} x {n:,} elems => "
        f"{best/k/n*1e9:.4f} ns/elem ({k*n/best/1e9:.1f} G gathers/s)",
        flush=True,
    )


case = sys.argv[1]
if case == "ax0_small":
    correctness(8, 0)
elif case == "ax0_cross":
    correctness(64, 0)
    correctness(1024, 0)
elif case == "ax0_big":
    speed(18816, 0)
elif case == "ax1_small":
    correctness(8, 1)
elif case == "ax1_big":
    speed(18816, 1)
elif case == "xla_ax0":
    speed(18816, 0, pallas=False)
print(f"device: {jax.devices()[0]}", flush=True)
