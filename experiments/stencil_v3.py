"""Fused-stencil v3: v2 interior + IN-KERNEL boundary corrections.

The measured 50.3M-DOF matvec decomposition (experiments/stencil_decomp):
10.43 ms full = 5.18 fused kernel + 5.25 XLA face-correction envelope.
The envelope's cost is layout-hostile z-plane extraction plus six
full-array `.at[].add` updates.  v3 folds ALL corrections into the kernel:

* y-face corrections: (1, z) row slices of the three resident planes,
  dz rolls on 2-vreg rows, row RMW into out_ref — every step, ~free;
* z-face corrections: (y, 1) col slices, dy rolls, col RMW — every step;
* x-face corrections (2-D stencil + its edges + corners): full-plane work
  under `pl.when(i == x_face_idx)` — only on the 2 owning grid steps;
  the face indices arrive as SMEM scalars so the sharded path can pass
  `where(axis_index == owner, local_plane, -1)`.

Validates elementwise vs the XLA apply_keff_structured on asymmetric and
x-padded grids (on TPU), then times at 255^3.
"""

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.ops import structured as st
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import cantilever_config


def _make_kernel_v3(tables, y: int, z: int, ny: int, nz: int):
    interior, faces, edges, corners = [np.asarray(t) if not isinstance(t, dict)
                                       else t for t in tables]
    interior = np.asarray(interior, np.float64)

    def kernel(ss_ref, mf_ref, xlo_ref, xhi_ref, xm_ref, x0_ref, xp_ref,
               bm_ref, b0_ref, bp_ref, mass_ref, out_ref):
        i = pl.program_id(0)
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

        # ---- interior: accumulate into dz groups, one postroll each ----
        acc = {dz: [None, None, None] for dz in (-1, 0, 1)}
        for dx in (-1, 0, 1):
            for c in range(3):
                for dy in (-1, 0, 1):
                    if not interior[dx + 1, dy + 1, :, :, c].any():
                        continue
                    v = planes[dx][c]
                    if dy:
                        v = pltpu.roll(v, np.int32((-dy) % y), axis=0)
                        v = jnp.where(row_cond[dy], v, 0.0)
                    for dz in (-1, 0, 1):
                        for b in range(3):
                            w = float(interior[dx + 1, dy + 1, dz + 1, b, c])
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
        inter = jnp.stack(outs)

        ss = ss_ref[0, 0]
        mf = mf_ref[0, 0]
        x_raw = raw[0]
        xs0 = planes[0]
        mass = mass_ref[0]
        out = ss * inter + (mf * mass) * xs0
        f0 = free[0]
        out_ref[:, 0] = f0 * out + (1.0 - f0) * x_raw

        # ---- y-face row corrections (axis=1), every step ----
        colr = jax.lax.broadcasted_iota(jnp.int32, (1, z), 1)
        for side, rpos in ((0, 0), (1, ny)):
            ftaps = np.asarray(faces[(1, side)], np.float64)  # (dxt,dzt,b,c)
            racc = [None, None, None]
            for dxt in range(3):
                for c in range(3):
                    if not (ftaps[dxt, :, :, c].any() or any(
                        np.asarray(edges[(1, side, 2, s2)])[dxt, :, c].any()
                        for s2 in (0, 1)
                    )):
                        continue
                    base = planes[dxt - 1][c][rpos : rpos + 1, :]  # (1, z)
                    for dzt in range(3):
                        colw = ftaps[dxt, dzt, :, c]
                        if not colw.any():
                            continue
                        v = base
                        dz = dzt - 1
                        if dz:
                            v = pltpu.roll(v, np.int32((-dz) % z), axis=1)
                            v = jnp.where(
                                colr >= 1 if dz < 0 else colr < z - 1, v, 0.0
                            )
                        for b in range(3):
                            w = float(colw[b])
                            if w == 0.0:
                                continue
                            term = np.float32(w) * v
                            a = racc[b]
                            racc[b] = term if a is None else a + term
                    # edge terms (pinned z cols), subtracted from corr
                    for s2 in (0, 1):
                        etaps = np.asarray(edges[(1, side, 2, s2)])
                        pinned = 0 if s2 == 0 else nz
                        for b in range(3):
                            w = float(etaps[dxt, b, c])
                            if w == 0.0:
                                continue
                            ev = np.float32(w) * base
                            term = -jnp.where(colr == pinned, ev, 0.0)
                            a = racc[b]
                            racc[b] = term if a is None else a + term
            corr = jnp.stack([
                r if r is not None else jnp.zeros((1, z), jnp.float32)
                for r in racc
            ])  # (3, 1, z)
            f0r = f0[:, rpos : rpos + 1, :]
            cur = out_ref[:, 0, rpos : rpos + 1, :]
            out_ref[:, 0, rpos : rpos + 1, :] = cur - ss * f0r * corr

        # ---- z-face col corrections (axis=2), every step ----
        rowc = jax.lax.broadcasted_iota(jnp.int32, (y, 1), 0)
        for side, cpos in ((0, 0), (1, nz)):
            ftaps = np.asarray(faces[(2, side)], np.float64)  # (dxt,dyt,b,c)
            cacc = [None, None, None]
            for dxt in range(3):
                for c in range(3):
                    if not ftaps[dxt, :, :, c].any():
                        continue
                    base = planes[dxt - 1][c][:, cpos : cpos + 1]  # (y, 1)
                    for dyt in range(3):
                        colw = ftaps[dxt, dyt, :, c]
                        if not colw.any():
                            continue
                        v = base
                        dy = dyt - 1
                        if dy:
                            v = pltpu.roll(v, np.int32((-dy) % y), axis=0)
                            v = jnp.where(
                                rowc >= 1 if dy < 0 else rowc < y - 1, v, 0.0
                            )
                        for b in range(3):
                            w = float(colw[b])
                            if w == 0.0:
                                continue
                            term = np.float32(w) * v
                            a = cacc[b]
                            cacc[b] = term if a is None else a + term
            corr = jnp.stack([
                r if r is not None else jnp.zeros((y, 1), jnp.float32)
                for r in cacc
            ])  # (3, y, 1)
            f0c = f0[:, :, cpos : cpos + 1]
            cur = out_ref[:, 0, :, cpos : cpos + 1]
            out_ref[:, 0, :, cpos : cpos + 1] = cur - ss * f0c * corr

        # ---- x-face corrections: only on the owning grid steps ----
        for side, idx_ref in ((0, xlo_ref), (1, xhi_ref)):
            ftaps = np.asarray(faces[(0, side)], np.float64)  # (dyt,dzt,b,c)

            @pl.when(i == idx_ref[0, 0])
            def _(side=side, ftaps=ftaps):
                cacc = [None, None, None]
                for c in range(3):
                    for dyt in range(3):
                        if not ftaps[dyt, :, :, c].any():
                            continue
                        v = planes[0][c]
                        dy = dyt - 1
                        if dy:
                            v = pltpu.roll(v, np.int32((-dy) % y), axis=0)
                            v = jnp.where(row_cond[dy], v, 0.0)
                        for dzt in range(3):
                            colw = ftaps[dyt, dzt, :, c]
                            if not colw.any():
                                continue
                            vv = v
                            dz = dzt - 1
                            if dz:
                                vv = pltpu.roll(vv, np.int32((-dz) % z), axis=1)
                                vv = jnp.where(col_cond[dz], vv, 0.0)
                            for b in range(3):
                                w = float(colw[b])
                                if w == 0.0:
                                    continue
                                term = np.float32(w) * vv
                                a = cacc[b]
                                cacc[b] = term if a is None else a + term
                corr = [
                    r if r is not None else jnp.zeros((y, z), jnp.float32)
                    for r in cacc
                ]
                # x-face edges: (0,side,1,s2) pinned y row, 1-D stencil
                # along z; (0,side,2,s2) pinned z col, 1-D stencil along y
                for s2 in (0, 1):
                    etaps = np.asarray(edges[(0, side, 1, s2)])  # (dzt,b,c)
                    rpos = 0 if s2 == 0 else ny
                    er = [None, None, None]
                    for c in range(3):
                        base = planes[0][c][rpos : rpos + 1, :]
                        for dzt in range(3):
                            colw = etaps[dzt, :, c]
                            if not colw.any():
                                continue
                            v = base
                            dz = dzt - 1
                            if dz:
                                v = pltpu.roll(v, np.int32((-dz) % z), axis=1)
                                v = jnp.where(
                                    colr >= 1 if dz < 0 else colr < z - 1,
                                    v, 0.0,
                                )
                            for b in range(3):
                                w = float(colw[b])
                                if w == 0.0:
                                    continue
                                term = np.float32(w) * v
                                a = er[b]
                                er[b] = term if a is None else a + term
                    for b in range(3):
                        if er[b] is None:
                            continue
                        corr[b] = corr[b] - jnp.where(
                            row == rpos, er[b], 0.0
                        )
                    etaps = np.asarray(edges[(0, side, 2, s2)])  # (dyt,b,c)
                    cpos = 0 if s2 == 0 else nz
                    ec = [None, None, None]
                    for c in range(3):
                        base = planes[0][c][:, cpos : cpos + 1]
                        for dyt in range(3):
                            colw = etaps[dyt, :, c]
                            if not colw.any():
                                continue
                            v = base
                            dy = dyt - 1
                            if dy:
                                v = pltpu.roll(v, np.int32((-dy) % y), axis=0)
                                v = jnp.where(
                                    rowc >= 1 if dy < 0 else rowc < y - 1,
                                    v, 0.0,
                                )
                            for b in range(3):
                                w = float(colw[b])
                                if w == 0.0:
                                    continue
                                term = np.float32(w) * v
                                a = ec[b]
                                ec[b] = term if a is None else a + term
                    for b in range(3):
                        if ec[b] is None:
                            continue
                        corr[b] = corr[b] - jnp.where(
                            col == cpos, ec[b], 0.0
                        )
                # corners on this x face
                for (sx, sy, sz), ctaps in corners.items():
                    if sx != side:
                        continue
                    blk = np.asarray(ctaps)
                    rpos = 0 if sy == 0 else ny
                    cpos = 0 if sz == 0 else nz
                    pt = jnp.logical_and(row == rpos, col == cpos)
                    for b in range(3):
                        mv = None
                        for c in range(3):
                            w = float(blk[b, c])
                            if w == 0.0:
                                continue
                            term = np.float32(w) * planes[0][c]
                            mv = term if mv is None else mv + term
                        if mv is None:
                            continue
                        corr[b] = corr[b] + jnp.where(pt, mv, 0.0)
                corr = jnp.stack(corr)
                out_ref[:, 0] = out_ref[:, 0] - ss * f0 * corr

    return kernel


def apply_v3_padded(x_pad, bc_pad, mass_grid, ss, mf, tables, ny, nz,
                    x_lo, x_hi):
    """x_pad/bc_pad (3, X+2, Y, Z); x_lo/x_hi: grid-step indices of the two
    global X faces on this shard (-1 = not owned)."""
    _, x_total, y, z = x_pad.shape
    x_planes = x_total - 2
    kernel = _make_kernel_v3(tables, y, z, ny, nz)
    vec_spec = lambda offset: pl.BlockSpec(  # noqa: E731
        (3, 1, y, z), lambda i, o=offset: (i * 0, i + o, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec((1, 1), lambda i: (i * 0, i * 0), memory_space=pltpu.SMEM)
    mass_spec = pl.BlockSpec(
        (1, y, z), lambda i: (i, i * 0, i * 0), memory_space=pltpu.VMEM
    )
    interior = np.asarray(tables[0])
    flops = 2 * int((interior != 0).sum()) * x_planes * y * z
    ssv = jnp.asarray(ss, jnp.float32).reshape(1, 1)
    mfv = jnp.asarray(mf, jnp.float32).reshape(1, 1)
    xlo = jnp.asarray(x_lo, jnp.int32).reshape(1, 1)
    xhi = jnp.asarray(x_hi, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(x_planes,),
        in_specs=[smem, smem, smem, smem,
                  vec_spec(0), vec_spec(1), vec_spec(2),
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
    )(ssv, mfv, xlo, xhi, x_pad, x_pad, x_pad, bc_pad, bc_pad, bc_pad,
      mass_grid)


def apply_v3(model, x, ss, mf, tables):
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    bc_pad = jnp.pad(
        model.bc_mask.astype(jnp.int8), ((0, 0), (1, 1), (0, 0), (0, 0)),
        constant_values=1,
    )
    return apply_v3_padded(
        x_pad, bc_pad, model.mass_grid, ss, mf, tables,
        model.ny, model.nz, 0, model.nx,
    )


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
    tables = st._stencil_tables(m.spacing, m.lam0, m.mu0)
    ss = np.float32(1.3)
    mf = np.float32(4.0e6)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.standard_normal((3,) + tuple(m.grid_shape)).astype(np.float32)
    )
    m_xla = replace(m, use_pallas=False)
    ref = jax.jit(
        lambda mm, v: st.apply_keff_structured(mm, v, ss, mf)
    )(m_xla, xs)
    got = jax.jit(lambda mm, v: apply_v3(mm, v, ss, mf, tables))(m, xs)
    err = float(jnp.max(jnp.abs(ref - got)))
    scale = float(jnp.max(jnp.abs(ref)))
    rel = err / scale
    tag = f"{nx}x{ny}x{nz} pad{pad_x_multiple}"
    print(f"[check {tag}] max abs {err:.3e} rel {rel:.3e}", flush=True)
    assert rel < 5e-6, f"v3 mismatch at {tag}"


def main():
    check(12, 9, 10)
    check(13, 9, 10, pad_x_multiple=8)
    check(31, 31, 31)

    n = int(os.environ.get("DECOMP_N", "255"))
    m = build(n, n, n)
    tables = st._stencil_tables(m.spacing, m.lam0, m.mu0)
    ss = np.float32(1.0)
    mf = np.float32(4.0e6)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.standard_normal((3,) + tuple(m.grid_shape)).astype(np.float32)
    )
    t_full_old = timeit(
        chain(lambda mm, v: st.apply_keff_structured(mm, v, ss, mf)),
        m, x0, f"v0 full-op {n}^3",
    )
    t_v3 = timeit(
        chain(lambda mm, v: apply_v3(mm, v, ss, mf, tables)), m, x0,
        f"v3 full-op {n}^3",
    )
    print(f"v3 speedup vs shipped full op: {t_full_old / t_v3:.2f}x", flush=True)


if __name__ == "__main__":
    main()
