"""Fused-stencil kernel variant: post-accumulation dz rolls.

Current kernel: per (dx,dy,dz,c) combo it rolls+masks the input plane
(~108 rolls + ~72 selects + 201 FMAs per output plane).  V2 reorganizes:

* dy-shifted masked input variants are computed ONCE per (dx, c, dy)
  (18 rolls + 18 selects),
* taps accumulate into 3 dz-group accumulators (201 FMAs, no z shifts),
* each dz group is rolled/masked ONCE at the end (6 rolls + 6 selects).

~263 vector ops/plane vs ~381 — expected win if the kernel is VPU-bound.
Validates elementwise vs the shipped kernel on a small grid, then times
both standalone at DECOMP_N^3 nodes (chained fori_loop, host-fetch sync).
"""

import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.ops import structured as st
from civiwave_tpu.ops.pallas import structured_stencil as ss_mod
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import cantilever_config


def _make_fused_kernel_v2(taps: np.ndarray, y: int, z: int):
    def kernel(ss_ref, mf_ref, xm_ref, x0_ref, xp_ref,
               bm_ref, b0_ref, bp_ref, mass_ref, out_ref):
        row = jax.lax.broadcasted_iota(jnp.int32, (y, z), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (y, z), 1)
        row_cond = {-1: row >= 1, 1: row < y - 1}
        col_cond = {-1: col >= 1, 1: col < z - 1}

        raw = {-1: xm_ref[:, 0], 0: x0_ref[:, 0], 1: xp_ref[:, 0]}
        free = {
            -1: 1.0 - bm_ref[:, 0].astype(jnp.float32),
            0: 1.0 - b0_ref[:, 0].astype(jnp.float32),
            1: 1.0 - bp_ref[:, 0].astype(jnp.float32),
        }
        planes = {dx: raw[dx] * free[dx] for dx in (-1, 0, 1)}

        # accumulate into dz groups (no z shifts inside).  Each dy-shifted
        # masked variant is built and fully consumed before the next one so
        # at most one variant is live alongside the 9 accumulators (all 27
        # live at once blew the 16 MB scoped-vmem limit at 256^2 planes).
        acc = {dz: [None, None, None] for dz in (-1, 0, 1)}
        for dx in (-1, 0, 1):
            for c in range(3):
                for dy in (-1, 0, 1):
                    if not taps[dx + 1, dy + 1, :, :, c].any():
                        continue
                    v = planes[dx][c]
                    if dy:
                        v = pltpu.roll(v, np.int32((-dy) % y), axis=0)
                        v = jnp.where(row_cond[dy], v, 0.0)
                    for dz in (-1, 0, 1):
                        for b in range(3):
                            w = float(taps[dx + 1, dy + 1, dz + 1, b, c])
                            if w == 0.0:
                                continue
                            term = np.float32(w) * v
                            a = acc[dz][b]
                            acc[dz][b] = term if a is None else a + term

        outs = []
        for b in range(3):
            ob = acc[0][b]
            if ob is None:
                ob = jnp.zeros((y, z), jnp.float32)
            for dz in (-1, 1):
                a = acc[dz][b]
                if a is None:
                    continue
                r = pltpu.roll(a, np.int32((-dz) % z), axis=1)
                ob = ob + jnp.where(col_cond[dz], r, 0.0)
            outs.append(ob)
        interior = jnp.stack(outs)

        ss = ss_ref[0, 0]
        mf = mf_ref[0, 0]
        x_raw = raw[0]
        xs0 = planes[0]
        mass = mass_ref[0]
        out = ss * interior + (mf * mass) * xs0
        f0 = free[0]
        out_ref[:, 0] = f0 * out + (1.0 - f0) * x_raw

    return kernel


def apply_v2(model, x, stiffness_scale, mass_factor, interior_taps):
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    bc_pad = jnp.pad(
        model.bc_mask.astype(jnp.int8), ((0, 0), (1, 1), (0, 0), (0, 0)),
        constant_values=1,
    )
    _, x_total, y, z = x_pad.shape
    x_planes = x_total - 2
    kernel = _make_fused_kernel_v2(np.asarray(interior_taps, np.float64), y, z)
    vec_spec = lambda offset: pl.BlockSpec(  # noqa: E731
        (3, 1, y, z), lambda i, o=offset: (i * 0, i + o, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec((1, 1), lambda i: (i * 0, i * 0), memory_space=pltpu.SMEM)
    mass_spec = pl.BlockSpec(
        (1, y, z), lambda i: (i, i * 0, i * 0), memory_space=pltpu.VMEM
    )
    flops = 2 * int((np.asarray(interior_taps) != 0).sum()) * x_planes * y * z
    ss = jnp.asarray(stiffness_scale, jnp.float32).reshape(1, 1)
    mf = jnp.asarray(mass_factor, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(x_planes,),
        in_specs=[smem, smem, vec_spec(0), vec_spec(1), vec_spec(2),
                  vec_spec(0), vec_spec(1), vec_spec(2), mass_spec],
        out_specs=pl.BlockSpec(
            (3, 1, y, z), lambda i: (i * 0, i, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, x_planes, y, z), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=3 * x_pad.size * 4, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(ss, mf, x_pad, x_pad, x_pad, bc_pad, bc_pad, bc_pad, model.mass_grid)


INNER = 32


def chain(fn):
    @jax.jit
    def run(m, x):
        def body(_, yv):
            return fn(m, yv) * np.float32(1e-9)

        return jax.lax.fori_loop(0, INNER, body, x)

    return run


def timeit(run, model, x0, label):
    def sync(x):
        yv = run(model, x)
        return float(jnp.sum(jnp.abs(yv.ravel()[:64])))

    t0 = time.perf_counter()
    sync(x0)
    print(f"[{label}] compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        sync(x0)
        best = min(best, time.perf_counter() - t0)
    print(f"[{label}] {best/INNER*1e3:8.3f} ms/call", flush=True)
    return best / INNER * 1e3


def build(n):
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, _f = build_structured_model(
        n, n, n, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    return model


def main():
    ss = np.float32(1.0)
    mf = np.float32(4.0e6)

    # correctness on a small grid (on-TPU elementwise check)
    m = build(31)
    taps = st._stencil_tables(m.spacing, m.lam0, m.mu0)[0]
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.standard_normal((3,) + tuple(m.grid_shape)).astype(np.float32)
    )
    ref = jax.jit(
        lambda mm, v: ss_mod.apply_keff_fused_pallas(mm, v, ss, mf, taps)
    )(m, xs)
    v2 = jax.jit(lambda mm, v: apply_v2(mm, v, ss, mf, taps))(m, xs)
    err = float(jnp.max(jnp.abs(ref - v2)))
    rel = err / float(jnp.max(jnp.abs(ref)))
    print(f"[check 32^3] max abs diff {err:.3e} (rel {rel:.3e})", flush=True)
    assert rel < 1e-6, "v2 kernel mismatch"

    n = int(os.environ.get("DECOMP_N", "255"))
    m = build(n)
    taps = st._stencil_tables(m.spacing, m.lam0, m.mu0)[0]
    x0 = jnp.asarray(
        rng.standard_normal((3,) + tuple(m.grid_shape)).astype(np.float32)
    )
    t_v0 = timeit(
        chain(lambda mm, v: ss_mod.apply_keff_fused_pallas(mm, v, ss, mf, taps)),
        m, x0, f"v0 fused {n}^3",
    )
    t_v2 = timeit(
        chain(lambda mm, v: apply_v2(mm, v, ss, mf, taps)), m, x0,
        f"v2 fused {n}^3",
    )
    print(f"v2 speedup: {t_v0 / t_v2:.2f}x", flush=True)


if __name__ == "__main__":
    main()
