"""Round-5: per-phase breakdown of the WINDOWED general-path matvec.

VERDICT r4 weak item 1: the 19.0 ms measured at 66^3 (902k DOF) does not
match ADR-27's floor arithmetic (~4.7M gathered rows at the 1.5-2.8
ns/row VMEM-window rate = 7-13 ms).  This experiment separates:

  full        shipped apply_keff (windowed x-gather -> stream math ->
              windowed assembly -> mass/bc tail)
  ustreams    windowed x-gather + per-chunk transpose only
  fstreams    ustreams + the scalar-component element math (no assembly)
  awonly      windowed assembly from precomputed force streams
  nowin       apply_keff with CIVIWAVE_GATHER_WINDOWS=0 (HBM-rate gather)

Usage: python experiments/exp_windowed_phases_r5.py [nx]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.ops import apply_keff as ops
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import box_mesh, cantilever_config


def fetch(y):
    flat = y.ravel()
    return float(jnp.sum(jnp.abs(flat[flat.size // 2 : flat.size // 2 + 8])))


def bench(fn, model, x0, label, inner=16, reps=4):
    jitted = jax.jit(fn)
    t0 = time.perf_counter()
    c = fetch(jitted(model, x0))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        c = fetch(jitted(model, x0))
        best = min(best, time.perf_counter() - t0)
    print(
        f"  {label:<10} {best/inner*1e3:8.2f} ms/iter  (compile {compile_s:.1f}s, "
        f"checksum {c:.3e})",
        flush=True,
    )
    return best / inner


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 66
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    t0 = time.perf_counter()
    mesh = box_mesh(nx, nx, nx, hex_elements=True)
    pre = preprocess.run(mesh, cfg)
    model, _state, _force = pack.build_packed_model(
        mesh, pre, cfg, mats, pad_nodes=1024, pad_elems=1024
    )
    print(
        f"{nx}^3 box: {model.node_count:,} nodes / {model.hex_count:,} hexes "
        f"/ {model.dof_count:,} DOF (pack {time.perf_counter()-t0:.1f}s); "
        f"xw={len(model.xw_hex)} chunks, aw={len(model.aw)} chunks"
    )

    ss = np.float32(1.0)
    mf = np.float32(4.0e6)
    rescale = np.float32(1.0 / 2.0e11)
    K = 16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(model.vector_shape).astype(np.float32))

    def full(m, x):
        def body(_, y):
            return m.apply_keff(y, ss, mf) * rescale

        return jax.lax.fori_loop(0, K, body, x)

    def ustreams(m, x):
        def body(_, y):
            us = ops._u_streams(y, m.conn_hex, m.xw_hex, 8)  # (24, H*)
            back = us[:3].T[: y.shape[0]]
            return y * 0.999 + 0.001 * jnp.zeros_like(y).at[: back.shape[0]].set(back)

        return jax.lax.fori_loop(0, K, body, x)

    def fstreams(m, x):
        def body(_, y):
            f = ops._force_streams(m, y, ss, "hex")  # (24, H*)
            back = f[:3].T[: y.shape[0]]
            return y * 0.999 + 1e-13 * jnp.zeros_like(y).at[: back.shape[0]].set(back)

        return jax.lax.fori_loop(0, K, body, x)

    streams0 = jnp.asarray(
        rng.standard_normal((24, model.padded_hex_count)).astype(np.float32)
    )

    def awonly(m, f):
        def body(_, fs):
            out = ops._assemble_windowed(m, fs, 8)  # (N*,3)
            # scalar feedback serializes iterations without a full-size
            # relayout riding the timing
            return fs * 0.999 + 1.0e-9 * jnp.mean(out)

        return jax.lax.fori_loop(0, K, body, f)

    bench(full, model, x0, "full", K)
    bench(ustreams, model, x0, "ustreams", K)
    bench(fstreams, model, x0, "fstreams", K)
    if model.aw:  # ADR-20 assembly windows fail past ~1M nodes
        bench(awonly, model, streams0, "awonly", K)
    if model.oa_oct:
        def aoct(m, f):
            def body(_, fs):
                out = ops._assemble_oct(m, fs)
                return fs * 0.999 + 1.0e-9 * jnp.mean(out)

            return jax.lax.fori_loop(0, K, body, f)

        bench(aoct, model, streams0, "aoct", K)

    os.environ["CIVIWAVE_GATHER_WINDOWS"] = "0"
    bench(full, model, x0, "nowin", K)
    os.environ.pop("CIVIWAVE_GATHER_WINDOWS", None)
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
