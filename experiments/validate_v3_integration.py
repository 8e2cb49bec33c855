"""Validate the INTEGRATED v3 fused path (shipped routing) on TPU.

Forces the fused route at small/mid sizes by lowering the node threshold,
checks elementwise vs the XLA forms (use_pallas=False) on asymmetric and
x-padded grids, then times the shipped operator at 255^3.
"""

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.ops import structured as st
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import cantilever_config


def build(nx, ny, nz, pad_x_multiple=1):
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, _f = build_structured_model(
        nx, ny, nz, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6), pad_x_multiple=pad_x_multiple,
    )
    return model


def check(nx, ny, nz, pad_x_multiple=1):
    m = build(nx, ny, nz, pad_x_multiple)
    ss = np.float32(1.3)
    mf = np.float32(4.0e6)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.standard_normal((3,) + tuple(m.grid_shape)).astype(np.float32)
    )
    ref = jax.jit(
        lambda mm, v: st.apply_keff_structured(mm, v, ss, mf)
    )(replace(m, use_pallas=False), xs)
    st._FLAT_INTERIOR_NODE_THRESHOLD, saved = 0, st._FLAT_INTERIOR_NODE_THRESHOLD
    try:
        got = jax.jit(
            lambda mm, v: st.apply_keff_structured(mm, v, ss, mf)
        )(m, xs)
    finally:
        st._FLAT_INTERIOR_NODE_THRESHOLD = saved
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    tag = f"{nx}x{ny}x{nz} pad{pad_x_multiple}"
    print(f"[shipped-v3 {tag}] rel {rel:.3e}", flush=True)
    assert rel < 5e-6, f"mismatch at {tag}"


def main():
    check(12, 9, 10)
    check(13, 9, 10, pad_x_multiple=8)
    check(30, 41, 23)

    n = 255
    m = build(n, n, n)
    ss = np.float32(1.0)
    mf = np.float32(4.0e6)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.standard_normal((3,) + tuple(m.grid_shape)).astype(np.float32)
    )
    INNER = 32

    @jax.jit
    def run(mm, x):
        def body(_, yv):
            return st.apply_keff_structured(mm, yv, ss, mf) * np.float32(1e-9)
        return jax.lax.fori_loop(0, INNER, body, x)

    def sync(x):
        yv = run(m, x)
        return float(jnp.sum(jnp.abs(yv.ravel()[:64])))

    t0 = time.perf_counter()
    sync(x0)
    print(f"[shipped 255^3] compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        sync(x0)
        best = min(best, time.perf_counter() - t0)
    ms = best / INNER * 1e3
    dof = m.dof_count
    print(f"[shipped 255^3] {ms:8.3f} ms/matvec  "
          f"{dof * 1e-6 / ms:.2f} GDOF/s", flush=True)


if __name__ == "__main__":
    main()
