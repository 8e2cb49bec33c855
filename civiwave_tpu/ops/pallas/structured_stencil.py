"""Pallas TPU kernel: slab-resident 27-point block stencil (interior term).

The XLA forms of the assembled constant stencil (ops/structured.py) read
the node grid once per shifted window — up to 27x the vector's footprint in
HBM traffic.  This kernel walks the X axis one output plane per grid step;
the three input planes it needs live in VMEM (Pallas pipelines the plane
loads across grid steps automatically), so HBM sees each plane O(1) times
and the VPU runs the ~230 nonzero scalar taps back-to-back on (Y, Z) vregs.

Plumbing matters as much as the kernel (measured at 50M DOF on v5e): an
earlier version transposed to X-major and materialized three plane-shifted
copies of the array around the call — the kernel alone won 2x (7.9 ms vs
15.5 XLA) but the copies ate the entire win in the full operator.  This
version blocks the native ``(3, X, Y, Z)`` array directly (component dim
covered by one block) and expresses the -1/0/+1 plane offsets as index maps
over a single once-padded array, which requires one output plane per grid
step.

Shifted (dy, dz) windows inside a plane are ``pltpu.roll`` + an in-kernel
iota edge mask (zero-padding semantics: the wrapped row/column must read as
zero; captured numpy masks would be forbidden constants).

Used on the TPU backend for LARGE unsharded grids only — on small planes
the per-op overhead loses to the fused XLA stencil (0.95 vs 0.84 ms at 945k
DOF), and under GSPMD a pallas_call does not partition (shard_structured
keeps the XLA form).  CPU tests run it in interpreter mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one (3, Y, Z) plane must fit VMEM comfortably alongside the pipeline's
# double buffers: 4 plane buffers x 2 x 4 bytes
_MAX_PLANE_FLOATS = 192 * 1024


def plane_fits(y: int, z: int) -> bool:
    """Whether a (Y, Z) plane is small enough for the slab kernel."""
    yp = ((y + 7) // 8) * 8
    zp = ((z + 127) // 128) * 128
    return yp * zp <= _MAX_PLANE_FLOATS


def _make_kernel(taps: np.ndarray, y: int, z: int):
    """taps: (3, 3, 3, 3, 3) — (dx+1, dy+1, dz+1, b, c) scalar constants."""

    def kernel(xm_ref, x0_ref, xp_ref, out_ref):
        # refs: (3, 1, y, z) at plane offsets -1 / 0 / +1 (the caller pads
        # X by one zero plane per side, so offsets are always in range)
        planes = {-1: xm_ref[:, 0], 0: x0_ref[:, 0], 1: xp_ref[:, 0]}
        # edge masks per (dy, dz) built in-kernel from iota (a captured
        # numpy mask array would be a constant, which pallas forbids):
        # zero the row/col that a roll wrapped around
        row = jax.lax.broadcasted_iota(jnp.int32, (y, z), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (y, z), 1)
        row_cond = {-1: row >= 1, 0: None, 1: row < y - 1}
        col_cond = {-1: col >= 1, 0: None, 1: col < z - 1}
        masks = {}
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                cond = row_cond[dy]
                if col_cond[dz] is not None:
                    cond = (
                        col_cond[dz]
                        if cond is None
                        else jnp.logical_and(cond, col_cond[dz])
                    )
                masks[(dy, dz)] = cond  # None => no masking needed
        acc = [None, None, None]
        for dx in (-1, 0, 1):
            plane = planes[dx]  # (3, y, z)
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    blk = taps[dx + 1, dy + 1, dz + 1]  # (3, 3)
                    if not blk.any():
                        continue
                    mask = masks[(dy, dz)]
                    for c in range(3):
                        col_w = blk[:, c]
                        if not col_w.any():
                            continue
                        f = plane[c]
                        # pltpu.roll wants non-negative shifts; -d == size-d
                        # (int32: x64 mode would emit an i64 rotate operand,
                        # which tpu.dynamic_rotate rejects)
                        if dy:
                            f = pltpu.roll(f, np.int32((-dy) % y), axis=0)
                        if dz:
                            f = pltpu.roll(f, np.int32((-dz) % z), axis=1)
                        if mask is not None:
                            f = jnp.where(mask, f, 0.0)
                        for b in range(3):
                            w = float(col_w[b])
                            if w == 0.0:
                                continue
                            term = np.float32(w) * f
                            acc[b] = term if acc[b] is None else acc[b] + term
        out_ref[:, 0] = jnp.stack(
            [a if a is not None else jnp.zeros((y, z), jnp.float32) for a in acc]
        )

    return kernel


def interior_stencil_pallas(
    xs: jax.Array, taps: np.ndarray, *, interpret: bool = False
) -> jax.Array:
    """Apply the interior 27-point block stencil to ``xs`` (3, X, Y, Z)."""
    _, x_planes, y, z = xs.shape
    kernel = _make_kernel(np.asarray(taps, np.float64), y, z)
    # one zero plane of X padding per side keeps the -1/0/+1 plane index
    # maps in range (and provides the zero-padding semantics in x)
    xs_pad = jnp.pad(xs, ((0, 0), (1, 1), (0, 0), (0, 0)))
    # index maps must return i32 under x64 mode — `x * 0` keeps the program
    # id's dtype where a literal `0` would trace as a weak i64
    spec = lambda offset: pl.BlockSpec(  # noqa: E731
        (3, 1, y, z),
        lambda x, o=offset: (x * 0, x + o, x * 0, x * 0),
        memory_space=pltpu.VMEM,
    )
    flops = 2 * int((np.asarray(taps) != 0).sum()) * x_planes * y * z
    return pl.pallas_call(
        kernel,
        grid=(x_planes,),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec(
            (3, 1, y, z),
            lambda x: (x * 0, x, x * 0, x * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(xs.shape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * xs.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs_pad, xs_pad, xs_pad)


# ---------------------------------------------------------------------------
# fully-fused operator kernel: sanitize + interior + ALL boundary
# corrections + mass + identity rows
# ---------------------------------------------------------------------------


def _make_fused_body(
    tables, y: int, z: int, ny: int, nz: int,
    *, y_rows: tuple | None = None, ghost_y: bool = False,
):
    """The COMPLETE K_eff for ONE output plane: given the three sanitized
    neighbor planes, the raw/free center plane and the (synthesized) mass
    plane, runs the interior taps, subtracts every boundary ghost
    correction (faces, edges, corners — the inclusion-exclusion tables of
    ADR-8), adds the mass term and emits the FINAL value
    ``bc ? x_raw : ss*(interior - corr) + mf*mass*xs``.

    2-D (X, Y) decomposition support: ``y_rows=(rlo, rhi)`` overrides the
    static global-face row positions (default ``(0, ny)``) with the LOCAL
    plane-coordinate rows of the two global Y faces — STATIC ints, because
    a uniform Y decomposition puts each global face at the same local row
    on every shard; per-shard ownership arrives as the traced ``oy_lo``/
    ``oy_hi`` 0/1 scalars multiplying the face/edge/corner terms (the
    X-face trick of traced ``xlo/xhi`` indices, applied to Y as masks
    because Y-face work runs every grid step, not under ``pl.when``).
    ``ghost_y=True`` marks the plane's first/last rows as exchanged ghost
    rows: outputs slice to the interior ``[1:-1]`` rows and face RMWs
    shift by one row.  Defaults reproduce the single-chip/1-D-slab body
    exactly (oy multipliers elided at trace time when ``None``).

    Two measured designs it folds (50.3M DOF on v5e, ADR-21):

    * the interior loop accumulates into dz groups and applies each dz roll
      ONCE per output component after accumulation ("postroll": 15 rolls
      per plane instead of ~52); each dy-shifted variant is built and fully
      consumed before the next so at most one variant is live alongside the
      9 accumulators (all 27 at once blew the 16 MB scoped-vmem limit);
    * the XLA correction envelope around the previous kernel cost 5.25 ms
      of the 10.4 ms matvec — strided z-plane extraction plus six
      full-array ``.at[].add`` updates.  In-kernel, the y/z-face
      corrections are (1, z)/(y, 1) row/col slices of the resident planes
      RMW'd into ``out_ref`` on every grid step, and the two x-face planes
      (2-D stencils + their edge lines + corners) run under
      ``pl.when(io == x_face_idx)`` so they cost nothing on interior steps.

    The x-face plane indices arrive as scalars: the single-chip caller
    passes (0, nx); an X-slab shard passes its LOCAL plane index on the
    owning shard and -1 (never matches) elsewhere, which is how one kernel
    serves both paths.

    Reference analogue: ke_apply_element.slang accumulated the same
    boundary physics per element; here it is closed-form tap algebra.
    """
    interior, faces, edges, corners = tables
    interior = np.asarray(interior, np.float64)
    rlo, rhi = y_rows if y_rows is not None else (0, ny)
    off = 1 if ghost_y else 0  # plane-row -> out-row shift

    def isl(v):
        """Interior-row slice of a (3, y, ...) plane value under ghost_y."""
        return v[:, 1:-1] if ghost_y else v

    def body(out_ref, k, planes, raw0, free0, mass, ss, mf, io, xlo, xhi,
             oy_lo=None, oy_hi=None):
        oy = {0: oy_lo, 1: oy_hi}
        row = jax.lax.broadcasted_iota(jnp.int32, (y, z), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (y, z), 1)
        row_cond = {-1: row >= 1, 1: row < y - 1}
        col_cond = {-1: col >= 1, 1: col < z - 1}

        # ---- interior: accumulate into dz groups, one postroll each ----
        acc = {dz: [None, None, None] for dz in (-1, 0, 1)}
        for dx in (-1, 0, 1):
            for c in range(3):
                for dy in (-1, 0, 1):
                    if not interior[dx + 1, dy + 1, :, :, c].any():
                        continue
                    v = planes[dx][c]
                    if dy:
                        # pltpu.roll wants non-negative i32 shifts (x64 mode
                        # would emit an i64 rotate operand, which
                        # tpu.dynamic_rotate rejects)
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

        x_raw = raw0
        xs0 = planes[0]
        out = ss * inter + (mf * mass) * xs0
        # identity rows: free==1 keeps out, free==0 passes raw input through
        f0 = free0
        out_ref[:, k] = isl(f0 * out + (1.0 - f0) * x_raw)

        # ---- y-face row corrections (axis=1) with their assigned z-edge
        # lines subtracted (inclusion-exclusion), every step ----
        colr = jax.lax.broadcasted_iota(jnp.int32, (1, z), 1)
        for side, rpos in ((0, rlo), (1, rhi)):
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
            if oy[side] is not None:
                corr = corr * oy[side]
            f0r = f0[:, rpos : rpos + 1, :]
            ro = rpos - off
            cur = out_ref[:, k, ro : ro + 1, :]
            out_ref[:, k, ro : ro + 1, :] = cur - ss * f0r * corr

        # ---- z-face col corrections (axis=2; no edges fold here), every
        # step ----
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
            cur = out_ref[:, k, :, cpos : cpos + 1]
            out_ref[:, k, :, cpos : cpos + 1] = cur - ss * isl(f0c * corr)

        # ---- x-face corrections: only on the owning grid steps ----
        for side, face_idx in ((0, xlo), (1, xhi)):
            ftaps = np.asarray(faces[(0, side)], np.float64)  # (dyt,dzt,b,c)

            @pl.when(io == face_idx)
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
                    rpos = rlo if s2 == 0 else rhi
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
                        ev = er[b]
                        if oy[s2] is not None:  # x∩y edge owned with y face
                            ev = ev * oy[s2]
                        corr[b] = corr[b] - jnp.where(
                            row == rpos, ev, 0.0
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
                    rpos = rlo if sy == 0 else rhi
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
                        if oy[sy] is not None:  # corner owned with y face
                            mv = mv * oy[sy]
                        corr[b] = corr[b] + jnp.where(pt, mv, 0.0)
                corr = jnp.stack(corr)
                out_ref[:, k] = out_ref[:, k] - ss * isl(f0 * corr)

    return body


def _make_stream_kernel(
    tables, y: int, z: int, ny: int, nz: int,
    *, y_rows: tuple | None = None, ghost_y: bool = False,
):
    """Single-input-stream driver around :func:`_make_fused_body`.

    The previous generation delivered each x plane through THREE window
    specs (offsets -1/0/+1) and each int8 constraint plane through three
    more — the Pallas pipeline re-fetched every plane once per spec, so HBM
    saw 3x the vector + 3x the constraints + the mass grid (~1.02 GB per
    matvec at 50.3M DOF, measured 4.6 ms = 224 GB/s while a single XLA
    stream runs at ~620 GB/s on v5e).  This kernel fetches each plane ONCE
    and keeps the 3-plane neighborhood in VMEM scratch as a rolling window:
    the grid runs X+2 steps, step i receives padded plane i, and from step
    2 onward computes output plane ``io = i - 2`` (center = plane i-1 held
    in scratch).  The mass plane is synthesized in-register from one SMEM
    scalar — on a homogeneous box grid the lumped mass is exactly
    class-separable with power-of-2 face weights (0.5 per boundary axis),
    so ``m8 * wx * wy * wz`` is BITWISE the stored grid (power-of-2 scaling
    commutes with f32 rounding).  Total HBM: x once + int8 bc once + out
    once (~452 MB at 50.3M DOF).
    """
    body = _make_fused_body(tables, y, z, ny, nz, y_rows=y_rows,
                            ghost_y=ghost_y)
    rlo, rhi = y_rows if y_rows is not None else (0, ny)

    def kernel(ss_ref, mf_ref, xlo_ref, xhi_ref, m8_ref, *rest):
        if ghost_y:
            (oylo_ref, oyhi_ref, x_ref, bc_ref, out_ref,
             san_m, san_0, raw_0, free_0) = rest
        else:
            x_ref, bc_ref, out_ref, san_m, san_0, raw_0, free_0 = rest
        i = pl.program_id(0)
        new_raw = x_ref[:, 0]
        # constraint planes hold 0/1 int8 — Mosaic lacks i8 vector compares
        # on this target, so derive the free-mask by cast, not comparison
        new_free = 1.0 - bc_ref[:, 0].astype(jnp.float32)
        new_san = new_raw * new_free

        @pl.when(i >= 2)
        def _():
            io = i - 2
            xlo = xlo_ref[0, 0]
            xhi = xhi_ref[0, 0]
            planes = {-1: san_m[...], 0: san_0[...], 1: new_san}
            # class-separable lumped mass: 0.5 per boundary axis (exact)
            row = jax.lax.broadcasted_iota(jnp.int32, (y, z), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (y, z), 1)
            # STRONG f32 literals: under x64 two weak Python floats make
            # the select f64 — a 64-bit vector layout Mosaic cannot tile
            # (layout.h bitwidth check aborts the compile)
            half, one = np.float32(0.5), np.float32(1.0)
            wx = jnp.where((io == xlo) | (io == xhi), half, one)
            if ghost_y:
                oy_lo, oy_hi = oylo_ref[0, 0], oyhi_ref[0, 0]
                # the global Y faces sit at LOCAL plane rows rlo/rhi only
                # on the shards that own them (oy_* = 1.0 there, 0.0 off)
                on_face = jnp.logical_or(
                    jnp.logical_and(row == rlo, oy_lo != 0.0),
                    jnp.logical_and(row == rhi, oy_hi != 0.0),
                )
                wy = jnp.where(on_face, half, one)
            else:
                oy_lo = oy_hi = None
                wy = jnp.where((row == 0) | (row == ny), half, one)
            wz = jnp.where((col == 0) | (col == nz), half, one)
            mass = ((m8_ref[0, 0] * wx) * wy) * wz
            body(
                out_ref, 0, planes, raw_0[...], free_0[...], mass,
                ss_ref[0, 0], mf_ref[0, 0], io, xlo, xhi,
                oy_lo=oy_lo, oy_hi=oy_hi,
            )

        # rotate the window AFTER the compute consumed it
        san_m[...] = san_0[...]
        san_0[...] = new_san
        raw_0[...] = new_raw
        free_0[...] = new_free

    return kernel


def _make_stream_kernel_blocked(
    tables, block: int, y: int, z: int, ny: int, nz: int,
    *, y_rows: tuple | None = None, ghost_y: bool = False,
):
    """B-plane-block variant of :func:`_make_stream_kernel`.

    One plane per grid step leaves ~5 us of pipeline latency per step
    un-amortized — ~1.3 ms of the 4.6 ms matvec at 50.3M DOF (256 steps).
    This kernel delivers B planes per step (grid = X/B + 1 steps) and walks
    them SEQUENTIALLY in-kernel, reusing the per-plane body — per-plane VPU
    work and VMEM pressure stay at the proven level while per-step latency
    amortizes by B.  Output block j lags delivery by ONE step: its plane k
    (global x_ext plane jB + k) reads neighbors from the previous delivered
    block held in scratch, crossing into the first planes of the fresh
    block only for k >= B-2 (which is why B >= 2 is required; B == 1 takes
    the lag-2 single-plane kernel).
    """
    body = _make_fused_body(tables, y, z, ny, nz, y_rows=y_rows,
                            ghost_y=ghost_y)
    rlo, rhi = y_rows if y_rows is not None else (0, ny)

    def kernel(ss_ref, mf_ref, xlo_ref, xhi_ref, m8_ref, *rest):
        if ghost_y:
            (oylo_ref, oyhi_ref, x_ref, bc_ref, out_ref,
             san_prev, raw_prev, free_prev) = rest
        else:
            x_ref, bc_ref, out_ref, san_prev, raw_prev, free_prev = rest
        i = pl.program_id(0)
        new_raw = x_ref[...]  # (3, B, y, z)
        new_free = 1.0 - bc_ref[...].astype(jnp.float32)
        new_san = new_raw * new_free

        @pl.when(i >= 1)
        def _():
            xlo = xlo_ref[0, 0]
            xhi = xhi_ref[0, 0]
            ss = ss_ref[0, 0]
            mf = mf_ref[0, 0]
            row = jax.lax.broadcasted_iota(jnp.int32, (y, z), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (y, z), 1)
            half, one = np.float32(0.5), np.float32(1.0)
            if ghost_y:
                oy_lo, oy_hi = oylo_ref[0, 0], oyhi_ref[0, 0]
                on_face = jnp.logical_or(
                    jnp.logical_and(row == rlo, oy_lo != 0.0),
                    jnp.logical_and(row == rhi, oy_hi != 0.0),
                )
                wy = jnp.where(on_face, half, one)
            else:
                oy_lo = oy_hi = None
                wy = jnp.where((row == 0) | (row == ny), half, one)
            wz = jnp.where((col == 0) | (col == nz), half, one)
            wyz = wy * wz
            io_base = (i - 1) * block
            prev_san = san_prev[...]
            prev_raw = raw_prev[...]
            prev_free = free_prev[...]
            for k in range(block):
                # x_ext planes o, o+1, o+2 for output plane o = io_base+k:
                # local index k in the previous block, crossing into the
                # fresh block for the tail planes
                def pick(prev, new, j):
                    return prev[:, j] if j < block else new[:, j - block]

                planes = {
                    -1: pick(prev_san, new_san, k),
                    0: pick(prev_san, new_san, k + 1),
                    1: pick(prev_san, new_san, k + 2),
                }
                raw0 = pick(prev_raw, new_raw, k + 1)
                free0 = pick(prev_free, new_free, k + 1)
                io = io_base + k
                wx = jnp.where((io == xlo) | (io == xhi), half, one)
                mass = (m8_ref[0, 0] * wx) * wyz
                body(out_ref, k, planes, raw0, free0, mass, ss, mf,
                     io, xlo, xhi, oy_lo=oy_lo, oy_hi=oy_hi)

        san_prev[...] = new_san
        raw_prev[...] = new_raw
        free_prev[...] = new_free

    return kernel


def _pick_block(x_planes: int) -> int:
    # Measured at 50.3M DOF on v5e (256 x-planes): block 2 = 4.48 ms,
    # block 1 = 4.65, block 4 = 5.49, block 8 = 5.17 — two planes per grid
    # step amortize the per-step pipeline latency, while larger blocks
    # triple+ the VMEM block working set and stall double-buffering.
    import os

    cap = int(os.environ.get("CIVIWAVE_STREAM_BLOCK", "2"))
    for b in (2, 4, 8):
        if b == cap and x_planes % b == 0:
            return b
    return 2 if (2 <= cap and x_planes % 2 == 0) else 1


def stream_pad_extra(x_planes: int) -> int:
    """Extra right-side X padding the blocked stream kernel needs beyond
    the one halo plane: the final delivery block overruns the halo by
    block-2 planes (they are never read as a center or as a neighbor of a
    real output plane, so zeros are fine).  Callers fold this into their
    one pad/concat so no extra array copy is paid."""
    block = _pick_block(x_planes)
    return block - 2 if block > 1 else 0


def _pc_coeff_maps(tab_ref, cls: int, y: int, z: int, ny: int, nz: int):
    """Six (y, z) block-Jacobi coefficient maps for x-class ``cls`` from
    the (1, 3, 54) SMEM class-table bundle (packing as in
    block_jacobi_apply: ``tab[0, x_class, (m * 3 + y_class) * 3 +
    z_class]``).  Built once per grid step with nested selects over the
    row/col class regions — ~48 (y, z) selects, amortized over the whole
    delivered block."""
    row = jax.lax.broadcasted_iota(jnp.int32, (y, z), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (y, z), 1)
    maps = []
    for m in range(6):

        def t(a, b, m=m):
            return tab_ref[0, cls, (m * 3 + a) * 3 + b]

        per_a = [
            jnp.where(col == 0, t(a, 0), jnp.where(col == nz, t(a, 2), t(a, 1)))
            for a in range(3)
        ]
        maps.append(
            jnp.where(row == 0, per_a[0], jnp.where(row == ny, per_a[2], per_a[1]))
        )
    return maps


def _pc_apply_value(maps, r, free):
    """u = M^-1 r for one plane/block given coefficient maps; constrained
    components zeroed (select, not multiply — the XLA twin's ``where``
    yields +0.0 where ``free * u`` would give -0.0)."""
    c00, c11, c22, c01, c02, c12 = maps
    r0, r1, r2 = r[0], r[1], r[2]
    u = jnp.stack(
        [
            c00 * r0 + c01 * r1 + c02 * r2,
            c01 * r0 + c11 * r1 + c12 * r2,
            c02 * r0 + c12 * r1 + c22 * r2,
        ]
    )
    return jnp.where(free != 0.0, u, 0.0)


def _make_pc_stream_kernel(
    tables, block: int, y: int, z: int, ny: int, nz: int,
    with_dots: bool = False,
):
    """Fused block-Jacobi-apply + complete-operator kernel: streams the
    PCG residual once and emits BOTH ``u = M^-1 r`` and ``w = K_eff u``.

    The Chronopoulos-Gear iteration applies the preconditioner and then
    immediately the operator to its output (solver/pcg.py:397-400).  Run
    separately, the class-table pc apply costs its own full pass over r
    plus a dispatch (~2.6 ms of the 7.9 ms iteration at 50.3M DOF) and u
    round-trips through HBM between the kernels.  Here the delivered
    residual block is transformed to u in-register at delivery time (the
    same class-table algebra as block_jacobi_apply, hoisted coefficient
    maps), the rolling window holds u instead of sanitized x, and the
    stencil body consumes it directly — u is emitted as a second output
    (the p-update and the (r,u)/(w,u) dots need it) on the same lag-1
    schedule as w.

    Sanitize note: pc output is bc-zeroed by construction, so the window
    IS the sanitized operator input, and the identity-row passthrough of
    the raw operator input (= u, zero on constrained axes) reduces to
    ``free * out``.  Single-chip only: ghost planes of r under X-slab
    sharding would need the neighbor's pc classes (the sharded path keeps
    the composition).
    """
    body = _make_fused_body(tables, y, z, ny, nz)

    def kernel(ss_ref, mf_ref, xlo_ref, xhi_ref, m8_ref, tab_ref, r_ref,
               bc_ref, w_ref, u_ref, *rest):
        if with_dots:
            pa_ref, pb_ref, u_cur, u_prev, free_prev = rest
        else:
            u_cur, u_prev, free_prev = rest
        i = pl.program_id(0)
        new_free = 1.0 - bc_ref[...].astype(jnp.float32)
        r = r_ref[...]  # (3, B, y, z)
        xlo = xlo_ref[0, 0]
        xhi = xhi_ref[0, 0]

        # pc at delivery: interior-x class everywhere, the two global
        # x-face planes repainted under pl.when (free on interior steps)
        maps_int = _pc_coeff_maps(tab_ref, 1, y, z, ny, nz)
        u_cur[...] = _pc_apply_value(maps_int, r, new_free)
        for j in range(block):
            for cls, face in ((0, xlo), (2, xhi)):

                @pl.when(i * block + j - 1 == face)
                def _(j=j, cls=cls):
                    maps_f = _pc_coeff_maps(tab_ref, cls, y, z, ny, nz)
                    u_cur[:, j] = _pc_apply_value(
                        maps_f, r[:, j], new_free[:, j]
                    )
        if with_dots:
            # delivery-time (r,u)/(r,r) row partials (layout (x_ext, 2, y):
            # the blocked axis leads — TPU tiling constrains only the last
            # two dims); halo plane rows are exactly zero (r = 0 there)
            u_val = u_cur[...]
            pa_ref[...] = jnp.stack(
                [
                    jnp.sum(r * u_val, axis=(0, 3)),
                    jnp.sum(r * r, axis=(0, 3)),
                ],
                axis=1,
            )

        @pl.when(i >= 1)
        def _():
            ss = ss_ref[0, 0]
            mf = mf_ref[0, 0]
            row = jax.lax.broadcasted_iota(jnp.int32, (y, z), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (y, z), 1)
            half, one = np.float32(0.5), np.float32(1.0)
            wy = jnp.where((row == 0) | (row == ny), half, one)
            wz = jnp.where((col == 0) | (col == nz), half, one)
            wyz = wy * wz
            io_base = (i - 1) * block
            prev_u = u_prev[...]
            cur_u = u_cur[...]
            prev_free = free_prev[...]
            for k in range(block):

                def pick(prev, new, j):
                    return prev[:, j] if j < block else new[:, j - block]

                planes = {
                    -1: pick(prev_u, cur_u, k),
                    0: pick(prev_u, cur_u, k + 1),
                    1: pick(prev_u, cur_u, k + 2),
                }
                u_center = planes[0]
                free0 = pick(prev_free, new_free, k + 1)
                io = io_base + k
                wx = jnp.where((io == xlo) | (io == xhi), half, one)
                mass = (m8_ref[0, 0] * wx) * wyz
                body(w_ref, k, planes, u_center, free0, mass, ss, mf,
                     io, xlo, xhi)
                u_ref[:, k] = u_center
                if with_dots:
                    # (w,u) lag-1 row partial, after all body corrections
                    w_val = w_ref[:, k]
                    pb_ref[k, 0] = jnp.sum(w_val * u_center, axis=(0, 2))

        u_prev[...] = u_cur[...]
        free_prev[...] = new_free

    return kernel


def apply_pc_keff_fused_pallas(
    model, table: jax.Array, residual: jax.Array, stiffness_scale,
    mass_factor, tables, *, with_dots: bool = False,
    interpret: bool = False
):
    """(u, w) = (M^-1 r, K_eff M^-1 r) in ONE pass over the residual.

    ``table`` is the (6, 3, 3, 3) CompactBlockJacobi class table.  Returns
    None when the plane count is odd (the mega kernel is blocked-only);
    the caller falls back to the pc-then-matvec composition.

    ``with_dots``: also emit the iteration's three dot-product row
    partials from the same pass — (r,u) and (r,r) at delivery, (w,u) on
    the lag-1 schedule after all body corrections — as tiny
    ``(x_ext, 2, y)`` / ``(x_planes, 1, y)`` f32 arrays (accumulate in
    the reduction dtype host-side).  This removes the separate XLA
    reduction pass over r/u/w (~0.8 ms/iteration at 50.3M DOF) at the
    cost of three in-plane lane reductions per plane.
    """
    x_planes, y, z = model.grid_shape
    block = _pick_block(x_planes)
    if block == 1:
        return None
    extra = block - 2
    r_pad = jnp.pad(residual, ((0, 0), (1, 1 + extra), (0, 0), (0, 0)))
    bc_pad = jnp.pad(
        model.bc_mask.astype(jnp.int8), ((0, 0), (1, 1 + extra), (0, 0), (0, 0)),
        constant_values=1,
    )
    tab = jnp.transpose(
        jnp.asarray(table, jnp.float32), (1, 0, 2, 3)
    ).reshape(1, 3, 54)
    kernel = _make_pc_stream_kernel(
        tables, block, y, z, model.ny, model.nz, with_dots=with_dots
    )
    interior = np.asarray(tables[0])
    flops = (2 * int((interior != 0).sum()) + 21) * x_planes * y * z
    ss = jnp.asarray(stiffness_scale, jnp.float32).reshape(1, 1)
    mf = jnp.asarray(mass_factor, jnp.float32).reshape(1, 1)
    m8 = jnp.asarray(_interior_mass(model), jnp.float32).reshape(1, 1)
    xlo = jnp.zeros((1, 1), jnp.int32)
    xhi = jnp.full((1, 1), model.nx, jnp.int32)
    smem = pl.BlockSpec((1, 1), lambda i: (i * 0, i * 0), memory_space=pltpu.SMEM)
    blk_in = pl.BlockSpec(
        (3, block, y, z),
        lambda i: (i * 0, i, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    blk_out = pl.BlockSpec(
        (3, block, y, z),
        # step 0 revisits block 0 (flushed only on index change, so the
        # real write at step 1 lands before the flush)
        lambda i: (i * 0, jnp.maximum(i - 1, i * 0), i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    n_blocks = x_planes // block
    x_ext = x_planes + block
    out_shape = jax.ShapeDtypeStruct((3, x_planes, y, z), jnp.float32)
    out_specs = [blk_out, blk_out]
    out_shapes = [out_shape, out_shape]
    if with_dots:
        out_specs.append(pl.BlockSpec(
            (block, 2, y),
            lambda i: (i, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ))
        out_shapes.append(jax.ShapeDtypeStruct((x_ext, 2, y), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (block, 1, y),
            lambda i: (jnp.maximum(i - 1, i * 0), i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ))
        out_shapes.append(
            jax.ShapeDtypeStruct((x_planes, 1, y), jnp.float32)
        )
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks + 1,),
        in_specs=[
            smem, smem, smem, smem, smem,
            pl.BlockSpec(
                (1, 3, 54),
                lambda i: (i * 0, i * 0, i * 0),
                memory_space=pltpu.SMEM,
            ),
            blk_in, blk_in,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((3, block, y, z), jnp.float32),  # u (current block)
            pltpu.VMEM((3, block, y, z), jnp.float32),  # u (previous block)
            pltpu.VMEM((3, block, y, z), jnp.float32),  # free (previous)
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * residual.size * 4 + r_pad.size * 4 + bc_pad.size,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=interpret,
    )(ss, mf, xlo, xhi, m8, tab, r_pad, bc_pad)
    if with_dots:
        w, u, pa, pb = outs
        return u, w, pa, pb
    w, u = outs
    return u, w


def apply_keff_fused_pallas(
    model, x: jax.Array, stiffness_scale, mass_factor, tables,
    *, interpret: bool = False
) -> jax.Array:
    """The COMPLETE K_eff * x (sanitize + stencil + all boundary
    corrections + mass + identity rows) as one pallas_call over X planes.
    ``tables`` is the full ``_stencil_tables`` tuple."""
    extra = stream_pad_extra(x.shape[1])
    x_pad = jnp.pad(x, ((0, 0), (1, 1 + extra), (0, 0), (0, 0)))
    # int8 constraint planes: 4x less HBM than f32, bool is not a TPU type
    bc_pad = jnp.pad(
        model.bc_mask.astype(jnp.int8),
        ((0, 0), (1, 1 + extra), (0, 0), (0, 0)),
        constant_values=1,  # out-of-range planes read as constrained => 0
    )
    return apply_keff_fused_pallas_padded(
        x_pad, bc_pad, _interior_mass(model), stiffness_scale, mass_factor,
        tables, model.ny, model.nz, 0, model.nx,
        x_planes=x.shape[1], interpret=interpret,
    )


def _interior_mass(model) -> jax.Array:
    """The interior lumped-mass scalar ``m8 = rho * V_cell`` recovered from
    the stored grid: node (1, 1, 1) always exists (extents are n+1 >= 2)
    and carries ``m8 * 2^-d`` where d counts axes with n == 1 (the node
    then sits on the high face).  Power-of-2 scaling is exact in f32, so
    the kernel's ``m8 * wx * wy * wz`` reproduces every stored value
    bitwise."""
    corr = (
        (2.0 if model.nx == 1 else 1.0)
        * (2.0 if model.ny == 1 else 1.0)
        * (2.0 if model.nz == 1 else 1.0)
    )
    return model.mass_grid[1, 1, 1] * np.float32(corr)


def apply_keff_fused_pallas_padded(
    x_pad: jax.Array, bc_pad: jax.Array, m8, stiffness_scale, mass_factor,
    tables, ny: int, nz: int, x_lo, x_hi, *, x_planes: int | None = None,
    y_rows: tuple | None = None, oy_lo=None, oy_hi=None,
    interpret: bool = False
) -> jax.Array:
    """Core fused call on inputs that already carry one X halo plane per
    side — either zero/constrained padding (single chip) or real neighbor
    ghost planes exchanged by ``ppermute`` (one shard of an X-slab
    decomposition).  ``x_pad``/``bc_pad`` are
    (3, X + 2 + stream_pad_extra(X), Y, Z); ``m8`` is the interior
    lumped-mass scalar (see :func:`_interior_mass`); output is
    (3, X, Y, Z).

    ``x_lo``/``x_hi`` are the LOCAL output-plane indices of the two global
    X faces (static ints single-chip; traced ``where(axis_index == owner,
    local_plane, -1)`` per shard — -1 never matches a grid step).

    2-D (X, Y) decomposition: pass ``y_rows=(rlo, rhi)`` — the static
    LOCAL plane rows of the two global Y faces — plus traced ``oy_lo``/
    ``oy_hi`` 0/1 ownership scalars.  The inputs then carry one exchanged
    ghost ROW per side too (Y = local rows + 2) and the output drops them:
    (3, X, Y - 2, Z)."""
    _, x_total, y, z = x_pad.shape
    ghost_y = y_rows is not None
    y_out = y - 2 if ghost_y else y
    if x_planes is None:
        x_planes = x_total - 2
    block = _pick_block(x_planes)
    assert x_total == x_planes + 2 + stream_pad_extra(x_planes), (
        x_total, x_planes
    )
    smem = pl.BlockSpec((1, 1), lambda i: (i * 0, i * 0), memory_space=pltpu.SMEM)
    interior = np.asarray(tables[0])
    flops = 2 * int((interior != 0).sum()) * x_planes * y * z
    ss = jnp.asarray(stiffness_scale, jnp.float32).reshape(1, 1)
    mf = jnp.asarray(mass_factor, jnp.float32).reshape(1, 1)
    m8 = jnp.asarray(m8, jnp.float32).reshape(1, 1)
    xlo = jnp.asarray(x_lo, jnp.int32).reshape(1, 1)
    xhi = jnp.asarray(x_hi, jnp.int32).reshape(1, 1)
    oy_args = ()
    oy_specs = []
    if ghost_y:
        oy_args = (
            jnp.asarray(oy_lo, jnp.float32).reshape(1, 1),
            jnp.asarray(oy_hi, jnp.float32).reshape(1, 1),
        )
        oy_specs = [smem, smem]
    common = dict(
        out_shape=jax.ShapeDtypeStruct((3, x_planes, y_out, z), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * x_pad.size * 4 + bc_pad.size,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # the dz-group accumulators + one live dy variant need ~22 MB
            # of scoped VMEM at 256^2 planes; the default 16 MB cap OOMs
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=interpret,
    )

    if block > 1:
        n_blocks = x_planes // block
        kernel = _make_stream_kernel_blocked(
            tables, block, y, z, ny, nz, y_rows=y_rows, ghost_y=ghost_y
        )
        blk_spec = pl.BlockSpec(
            (3, block, y, z),
            lambda i: (i * 0, i, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(n_blocks + 1,),
            in_specs=[smem, smem, smem, smem, smem, *oy_specs,
                      blk_spec, blk_spec],
            out_specs=pl.BlockSpec(
                (3, block, y_out, z),
                # step 0 revisits block 0 (flushed only on index change,
                # so the real write at step 1 lands before the flush)
                lambda i: (i * 0, jnp.maximum(i - 1, i * 0), i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((3, block, y, z), jnp.float32),  # sanitized
                pltpu.VMEM((3, block, y, z), jnp.float32),  # raw
                pltpu.VMEM((3, block, y, z), jnp.float32),  # free mask
            ],
            **common,
        )(ss, mf, xlo, xhi, m8, *oy_args, x_pad, bc_pad)

    kernel = _make_stream_kernel(tables, y, z, ny, nz, y_rows=y_rows,
                                 ghost_y=ghost_y)
    plane_spec = pl.BlockSpec(
        (3, 1, y, z),
        lambda i: (i * 0, i, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(x_planes + 2,),
        in_specs=[smem, smem, smem, smem, smem, *oy_specs,
                  plane_spec, plane_spec],
        out_specs=pl.BlockSpec(
            (3, 1, y_out, z),
            # steps 0-2 revisit block 0 (flushed only on index change, so
            # the real write at step 2 lands before the flush)
            lambda i: (i * 0, jnp.maximum(i - 2, i * 0), i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((3, y, z), jnp.float32),  # sanitized plane i-2
            pltpu.VMEM((3, y, z), jnp.float32),  # sanitized plane i-1
            pltpu.VMEM((3, y, z), jnp.float32),  # raw plane i-1
            pltpu.VMEM((3, y, z), jnp.float32),  # free-mask plane i-1
        ],
        **common,
    )(ss, mf, xlo, xhi, m8, *oy_args, x_pad, bc_pad)


# ---------------------------------------------------------------------------
# whole-PCG-iteration kernel: p/s recurrence + x/r axpys + block-Jacobi
# apply + complete operator + dot partials, one pass over six vectors
# ---------------------------------------------------------------------------


def _make_pcg_iter_kernel(
    tables, block: int, y: int, z: int, ny: int, nz: int, n_ext: int
):
    """ONE Chronopoulos-Gear PCG iteration as a single streaming kernel.

    Post the pc+matvec fusion, the iteration still pays three separate XLA
    passes — the x/r axpys, the (3,)-dot reduction over r/u/w, and the p/s
    direction updates — ~2.3 ms of the 7.3 ms iteration at 50.3M DOF.
    Every one of those is elementwise or a reduction over vectors this
    kernel already streams, so the whole recurrence folds in:

        p = free ? u + beta p_old : 0       (deferred from LAST iteration:
        s = free ? w + beta s_old : 0        identical algebra, the update
        x' = x + alpha p                     just crosses the loop boundary)
        r' = r - alpha s
        u' = M^-1 r'                         (class-table, in-register)
        w' = K_eff u'                        (rolling 3-plane window)
        partials of (r',u'), (r',r')         (delivery-time)
        partials of (w',u')                  (lag-1, after the stencil)

    ALL six vector carries live x_ext-PADDED (one halo plane left,
    block-1 planes right, all constrained) so every delivered block is
    transformed in place with no per-iteration pad copies: padded planes
    are fully constrained, every recurrence output there is exactly 0,
    and the halo contributions to the dot partials vanish numerically.
    The elementwise outputs and the (r,u)/(r,r) partials write at
    delivery (lag 0); w and the (w,u) partial lag one block behind, with
    the two missing window neighbors (left of plane 0, right of plane
    X_ext-1) selected to zero by traced guards.

    The f32 partial rows sum over z then components (768-element chunks
    vs dot_f64's 256) before the host-side f64 accumulate — the same
    chunked-reduction contract (ADR-13), pinned by trajectory-parity
    tests.  Reference analogue: one iteration of pcg.cpp:830-915, which
    issues seven separate kernels' worth of work per iteration.
    """
    body = _make_fused_body(tables, y, z, ny, nz)

    def kernel(ss_ref, mf_ref, xlo_ref, xhi_ref, m8_ref, alpha_ref,
               beta_ref, tab_ref, x_ref, r_ref, u_ref, w_ref, p_ref,
               s_ref, bc_ref, xo_ref, ro_ref, uo_ref, po_ref, so_ref,
               pa_ref, wo_ref, pb_ref, u_cur, u_prev, free_prev, last_u):
        i = pl.program_id(0)
        xlo = xlo_ref[0, 0]
        xhi = xhi_ref[0, 0]
        alpha = alpha_ref[0, 0]
        beta = beta_ref[0, 0]
        new_free = 1.0 - bc_ref[...].astype(jnp.float32)
        nonzero = new_free != 0.0

        # ---- delivery: recurrence + axpys + pc, all plane-local ----
        p_new = jnp.where(nonzero, u_ref[...] + beta * p_ref[...], 0.0)
        s_new = jnp.where(nonzero, w_ref[...] + beta * s_ref[...], 0.0)
        x_new = x_ref[...] + alpha * p_new
        r_new = r_ref[...] - alpha * s_new
        maps_int = _pc_coeff_maps(tab_ref, 1, y, z, ny, nz)
        u_cur[...] = _pc_apply_value(maps_int, r_new, new_free)
        # the final (lag-flush) grid step re-delivers the last block, so
        # plane coordinates come from the CLAMPED block index
        d = jnp.minimum(i, n_ext - 1)
        for j in range(block):
            for cls, face in ((0, xlo), (2, xhi)):

                @pl.when(d * block + j - 1 == face)
                def _(j=j, cls=cls):
                    maps_f = _pc_coeff_maps(tab_ref, cls, y, z, ny, nz)
                    u_cur[:, j] = _pc_apply_value(
                        maps_f, r_new[:, j], new_free[:, j]
                    )
        u_val = u_cur[...]
        xo_ref[...] = x_new
        ro_ref[...] = r_new
        uo_ref[...] = u_val
        po_ref[...] = p_new
        so_ref[...] = s_new
        # delivery-time dot partials: rows sum over z then components.
        # Layout (x_ext, dot, y): the blocked axis leads because TPU
        # block tiling constrains only the LAST two dims
        pa_ref[...] = jnp.stack(
            [
                jnp.sum(r_new * u_val, axis=(0, 3)),
                jnp.sum(r_new * r_new, axis=(0, 3)),
            ],
            axis=1,
        )

        # ---- lag-1: stencil + (w,u) partial for the previous block ----
        @pl.when(i >= 1)
        def _():
            ss = ss_ref[0, 0]
            mf = mf_ref[0, 0]
            row = jax.lax.broadcasted_iota(jnp.int32, (y, z), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (y, z), 1)
            half, one = np.float32(0.5), np.float32(1.0)
            wy = jnp.where((row == 0) | (row == ny), half, one)
            wz = jnp.where((col == 0) | (col == nz), half, one)
            wyz = wy * wz
            zero_plane = jnp.zeros((3, y, z), jnp.float32)
            prev_u = u_prev[...]
            cur_u0 = u_cur[:, 0]
            last = last_u[...]
            prev_free = free_prev[...]
            for k in range(block):
                if k == 0:
                    left = jnp.where(i == 1, zero_plane, last)
                else:
                    left = prev_u[:, k - 1]
                if k == block - 1:
                    right = jnp.where(i == n_ext, zero_plane, cur_u0)
                else:
                    right = prev_u[:, k + 1]
                center = prev_u[:, k]
                planes = {-1: left, 0: center, 1: right}
                # x_ext plane g = (i-1)*block + k -> output plane g - 1
                io = (i - 1) * block + k - 1
                wx = jnp.where((io == xlo) | (io == xhi), half, one)
                mass = (m8_ref[0, 0] * wx) * wyz
                body(wo_ref, k, planes, center, prev_free[:, k], mass,
                     ss, mf, io, xlo, xhi)
                w_val = wo_ref[:, k]
                pb_ref[k, 0] = jnp.sum(w_val * center, axis=(0, 2))

        # rotate AFTER the lag-1 compute consumed the previous block
        last_u[...] = u_prev[:, block - 1]
        u_prev[...] = u_cur[...]
        free_prev[...] = new_free

    return kernel


def pcg_iteration_fused_pallas(
    model, table: jax.Array, carries, alpha, beta, stiffness_scale,
    mass_factor, tables, *, interpret: bool = False
):
    """Run one whole PCG iteration (see :func:`_make_pcg_iter_kernel`) on
    x_ext-padded carries ``(x, r, u, w, p, s)``; returns the six updated
    padded carries plus f32 partial-row arrays ``(pa, pb)`` of shapes
    (x_ext, 2, y) / (x_ext, 1, y) where ``pa[:, 0]/pa[:, 1]`` are the
    (r,u)/(r,r) row partials and ``pb[:, 0]`` the (w,u) rows — accumulate
    them in the reduction dtype host-side."""
    x_p, r_p, u_p, w_p, p_p, s_p = carries
    x_planes, y, z = model.grid_shape
    block = _pick_block(x_planes)
    assert block > 1, "iteration kernel is blocked-only"
    x_ext = x_planes + block
    assert x_p.shape[1] == x_ext, (x_p.shape, x_ext)
    n_ext = x_ext // block
    bc_pad = jnp.pad(
        model.bc_mask.astype(jnp.int8),
        ((0, 0), (1, block - 1), (0, 0), (0, 0)),
        constant_values=1,
    )
    tab = jnp.transpose(
        jnp.asarray(table, jnp.float32), (1, 0, 2, 3)
    ).reshape(1, 3, 54)
    kernel = _make_pcg_iter_kernel(
        tables, block, y, z, model.ny, model.nz, n_ext
    )
    interior = np.asarray(tables[0])
    flops = (2 * int((interior != 0).sum()) + 45) * x_planes * y * z

    def smem_scalar(v, dtype=jnp.float32):
        return jnp.asarray(v, dtype).reshape(1, 1)

    smem = pl.BlockSpec((1, 1), lambda i: (i * 0, i * 0), memory_space=pltpu.SMEM)
    # deliver block min(i, n_ext-1): the final (lag-flush) step re-delivers
    # the last block and recomputes identical values — idempotent
    cl = n_ext - 1
    blk_in = pl.BlockSpec(
        (3, block, y, z),
        lambda i: (i * 0, jnp.minimum(i, cl), i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    blk_lag = pl.BlockSpec(
        (3, block, y, z),
        lambda i: (i * 0, jnp.maximum(i - 1, i * 0), i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    pa_spec = pl.BlockSpec(
        (block, 2, y),
        lambda i: (jnp.minimum(i, cl), i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    pb_spec = pl.BlockSpec(
        (block, 1, y),
        lambda i: (jnp.maximum(i - 1, i * 0), i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    vec = jax.ShapeDtypeStruct((3, x_ext, y, z), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(n_ext + 1,),
        in_specs=[
            smem, smem, smem, smem, smem, smem, smem,
            pl.BlockSpec(
                (1, 3, 54),
                lambda i: (i * 0, i * 0, i * 0),
                memory_space=pltpu.SMEM,
            ),
            blk_in, blk_in, blk_in, blk_in, blk_in, blk_in, blk_in,
        ],
        out_specs=[
            blk_in, blk_in, blk_in, blk_in, blk_in, pa_spec, blk_lag,
            pb_spec,
        ],
        out_shape=[
            vec, vec, vec, vec, vec,
            jax.ShapeDtypeStruct((x_ext, 2, y), jnp.float32),
            vec,
            jax.ShapeDtypeStruct((x_ext, 1, y), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, block, y, z), jnp.float32),  # u (current)
            pltpu.VMEM((3, block, y, z), jnp.float32),  # u (previous)
            pltpu.VMEM((3, block, y, z), jnp.float32),  # free (previous)
            pltpu.VMEM((3, y, z), jnp.float32),  # u, last plane of i-2
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=12 * x_p.size * 4 + bc_pad.size,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        smem_scalar(stiffness_scale), smem_scalar(mass_factor),
        smem_scalar(0, jnp.int32), smem_scalar(model.nx, jnp.int32),
        smem_scalar(_interior_mass(model)), smem_scalar(alpha),
        smem_scalar(beta), tab, x_p, r_p, u_p, w_p, p_p, s_p, bc_pad,
    )
    x_o, r_o, u_o, p_o, s_o, pa, w_o, pb = outs
    return (x_o, r_o, u_o, w_o, p_o, s_o), pa, pb
