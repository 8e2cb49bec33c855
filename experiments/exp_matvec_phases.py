"""Phase breakdown of the general-path matvec at a given box size.

Times, each as a chained fori_loop on the real PackedModel:
  full      — apply_keff (the shipped operator)
  xgather   — x[conn_hex] + transpose to (8l,3,H) only
  elem      — element_force_rows (x-gather + scalar-component einsums + relayout)
  assemble  — the D-slot CSR gather-sum over precomputed rows
  masstail  — sanitize + mass term + bc_mask select only

Usage: python experiments/exp_matvec_phases.py [nx]
"""

from __future__ import annotations

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
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 67
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    t0 = time.perf_counter()
    mesh = box_mesh(nx, nx, nx, hex_elements=True)
    pre = preprocess.run(mesh, cfg)
    model, _state, _force = pack.build_packed_model(
        mesh, pre, cfg, mats, pad_nodes=1024, pad_elems=1024
    )
    print(
        f"{nx}^3 box: {model.node_count:,} nodes / {model.hex_count:,} hexes / "
        f"{model.dof_count:,} DOF (pack {time.perf_counter()-t0:.1f}s)"
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

    def xgather(m, x):
        def body(_, y):
            u_e = jnp.transpose(y[m.conn_hex], (1, 2, 0))  # (8,3,H)
            back = u_e[0].T  # (H,3)
            return y * 0.999 + 0.001 * jnp.zeros_like(y).at[: back.shape[0]].set(back)

        return jax.lax.fori_loop(0, K, body, x)

    def elem(m, x):
        def body(_, y):
            rows = ops.element_force_rows(m, y, ss)  # (R,3)
            back = rows[: y.shape[0]]
            return y * 0.999 + 1e-13 * jnp.zeros_like(y).at[:].set(back)

        return jax.lax.fori_loop(0, K, body, x)

    rows0 = jnp.asarray(
        rng.standard_normal((model.force_row_count, 3)).astype(np.float32)
    )

    def assemble(m, rows):
        def body(_, r):
            out = ops.assemble(m, r)  # (N,3)
            pad = jnp.zeros_like(r)
            return r * 0.999 + 0.001 * pad.at[: out.shape[0]].set(out)

        return jax.lax.fori_loop(0, K, body, rows)

    def masstail(m, x):
        def body(_, y):
            xs = ops.sanitize(m, y)
            out = (mf * m.lumped_mass)[:, None] * xs
            out = jnp.where(m.bc_mask, y, out)
            return out * np.float32(0.99 / 4.0e6) + y * 0.5

        return jax.lax.fori_loop(0, K, body, x)

    bench(full, model, x0, "full", K)
    bench(xgather, model, x0, "xgather", K)
    bench(elem, model, x0, "elem", K)
    bench(assemble, model, rows0, "assemble", K)
    bench(masstail, model, x0, "masstail", K)
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
