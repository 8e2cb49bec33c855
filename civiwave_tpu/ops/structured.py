"""Structured-grid operators in component-separated (3, X, Y, Z) layout.

Two operator forms, same math as the unstructured hex path (2x2x2 Gauss,
tensor-form isotropic stress — reference pcg.cpp:561-662):

**Homogeneous (constant material): assembled constant 27-point stencil.**
The per-element operator is linear in (lam, mu), so for a uniform grid the
fully-assembled interior operator is a constant 27-tap stencil of 3x3
blocks: ``out[b][n] = sum_d sum_c C[d][b][c] * u[c][n+d]``.  Evaluating the
assembled stencil instead of the element loop cuts the per-matvec work from
~1200 to ~240 plane-FMAs (measured 4.2x on v5e).  The constant stencil
assumes full element coverage; the exact operator is recovered by
inclusion-exclusion boundary corrections — ghost elements form face slabs,
edge beams and corner cells that are each *translation-invariant in their
free axes*, so their contributions are lower-dimensional constant stencils
applied to the 6 boundary planes, 12 edges and 8 corners:

    real = full - (sum faces - sum edges + sum corners)

Inputs from and outputs to constrained rows (Dirichlet, dead +X pad planes)
are handled by the usual sanitize/identity-row envelope, which is why only
ghost slabs adjacent to free planes need corrections (the deeper +X pad
slabs touch constrained planes only).

**Heterogeneous (per-element lam/mu grids): corner-gather element loop.**
The 8 shifted corner views of the node grid replace the gather, per-Gauss
stress is formed with the material grids, and 8 shifted adds scatter back.

All stencil constants are baked as Python floats from the (static) grid
spacing, so zero taps vanish from the graph and the jitted program stays
small enough for fast compiles.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.structured import CORNERS, StructuredModel

_DET_TOL = 1.0e-12


# --------------------------------------------------------------------------
# constant tables (numpy, cached per spacing/material)
# --------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _element_tables(spacing: Tuple[float, float, float]):
    """Constant Gauss gradient table for one uniform cell: (8gp, 8l, 3), (8,)."""
    from ..mesh.preprocess import hex_gradients

    corner = np.array(CORNERS, np.float64) * np.asarray(spacing, np.float64)
    grads, gp_vol = hex_gradients(corner[None])
    return grads[0], gp_vol[0]


@lru_cache(maxsize=32)
def _pair_matrices(spacing: Tuple[float, float, float]):
    """Constant 24x24 per-element operators: K_e = lam*Klam + mu*Kmu.

    Klam[l,b,m,c] = sum_gp V g[gp,l,b] g[gp,m,c]              (volumetric)
    Kmu[l,b,m,c]  = d_bc sum_gp V g[gp,l,:].g[gp,m,:]
                    + sum_gp V g[gp,l,c] g[gp,m,b]            (deviatoric)
    """
    grads, gp_vol = _element_tables(spacing)
    klam = np.einsum("g,glb,gmc->lbmc", gp_vol, grads, grads)
    kmu1 = np.einsum("g,gla,gma->lm", gp_vol, grads, grads)
    kmu = np.zeros((8, 3, 8, 3))
    for b in range(3):
        kmu[:, b, :, b] += kmu1
    kmu += np.einsum("g,glc,gmb->lbmc", gp_vol, grads, grads)
    return klam, kmu


def _restricted_stencil(kfull: np.ndarray, fixed: Dict[int, int]) -> np.ndarray:
    """Assembled stencil over corner pairs restricted to fixed axis slots.

    ``fixed[axis] = s`` keeps only pairs with both corners at slot ``s`` on
    that axis (s=1: the ghost slab sits on the low side of the plane, s=0:
    high side).  Free axes become tap dims indexed by (offset + 1), where
    offset = corner_m - corner_l (input node relative to output node).
    Returns taps of shape (3,)*len(free) + (3, 3).
    """
    free = [a for a in range(3) if a not in fixed]
    out = np.zeros((3,) * len(free) + (3, 3))
    for l, cl in enumerate(CORNERS):
        for m, cm in enumerate(CORNERS):
            if any(cl[a] != s or cm[a] != s for a, s in fixed.items()):
                continue
            idx = tuple(cm[a] - cl[a] + 1 for a in free)
            out[idx] += kfull[l, :, m, :]
    return out


@lru_cache(maxsize=32)
def _stencil_tables(spacing, lam0: float, mu0: float):
    """All constant stencils for a homogeneous grid (see module docstring)."""
    klam, kmu = _pair_matrices(spacing)
    kfull = lam0 * klam + mu0 * kmu
    faces = {}
    edges = {}
    corners = {}
    for axis in range(3):
        for side in (0, 1):  # 0 = low boundary plane, 1 = high
            faces[(axis, side)] = _restricted_stencil(kfull, {axis: 1 - side})
    for a1 in range(3):
        for a2 in range(a1 + 1, 3):
            for s1 in (0, 1):
                for s2 in (0, 1):
                    edges[(a1, s1, a2, s2)] = _restricted_stencil(
                        kfull, {a1: 1 - s1, a2: 1 - s2}
                    )
    for sx in (0, 1):
        for sy in (0, 1):
            for sz in (0, 1):
                corners[(sx, sy, sz)] = _restricted_stencil(
                    kfull, {0: 1 - sx, 1: 1 - sy, 2: 1 - sz}
                )
    interior = _restricted_stencil(kfull, {})
    return interior, faces, edges, corners


# --------------------------------------------------------------------------
# stencil application
# --------------------------------------------------------------------------


def _apply_taps(
    v: jax.Array, taps: np.ndarray, prepad_axis: int | None = None
) -> jax.Array:
    """Apply a constant block stencil to ``v`` (3, *spatial) with zero-padded
    boundaries; taps has shape (3,)*nd + (3, 3), nd = spatial rank.

    ``prepad_axis``: spatial axis that already carries one halo entry per
    side (ghost planes from a neighbor shard) — it is windowed in place
    instead of zero-padded, and the output is 2 shorter on that axis.
    """
    nd = v.ndim - 1
    pad = [(0, 0)] + [
        (0, 0) if a == prepad_axis else (1, 1) for a in range(nd)
    ]
    vp = jnp.pad(v, pad) if nd else v
    spatial = tuple(
        s - 2 if a == prepad_axis else s for a, s in enumerate(v.shape[1:])
    )
    rows = [None, None, None]
    for idx in np.ndindex(*taps.shape[:nd]):
        blk = taps[idx]
        window = vp[(slice(None),) + tuple(
            slice(t, t + s) for t, s in zip(idx, spatial)
        )]
        for b in range(3):
            for c in range(3):
                w = float(blk[b, c])
                if w == 0.0:
                    continue
                term = np.float32(w) * window[c]
                rows[b] = term if rows[b] is None else rows[b] + term
    rows = [
        r if r is not None else jnp.zeros(spatial, v.dtype) for r in rows
    ]
    return jnp.stack(rows)  # spatial shape already accounts for prepad_axis


def _apply_taps_axis(
    plane: jax.Array, taps: np.ndarray, axis_pos: int, prepadded: bool = False
) -> jax.Array:
    """Apply a 1D block stencil (taps (3, 3, 3)) along one spatial axis of a
    (3, d1, d2) plane, at every position of the other axis.  ``prepadded``:
    the stencil axis already carries one halo entry per side."""
    pad = [(0, 0)] * plane.ndim
    pad[1 + axis_pos] = (0, 0) if prepadded else (1, 1)
    vp = jnp.pad(plane, pad)
    size = plane.shape[1 + axis_pos] - (2 if prepadded else 0)
    rows = [None, None, None]
    for t in range(3):
        sl = [slice(None)] * plane.ndim
        sl[1 + axis_pos] = slice(t, t + size)
        window = vp[tuple(sl)]
        for b in range(3):
            for c in range(3):
                w = float(taps[t][b, c])
                if w == 0.0:
                    continue
                term = np.float32(w) * window[c]
                rows[b] = term if rows[b] is None else rows[b] + term
    out_shape = list(plane.shape[1:])
    if prepadded:
        out_shape[axis_pos] -= 2
    rows = [
        r if r is not None else jnp.zeros(tuple(out_shape), plane.dtype)
        for r in rows
    ]
    return jnp.stack(rows)


def _matvec_const(plane: jax.Array, blk: np.ndarray) -> jax.Array:
    """Pointwise constant 3x3 matvec over a (3, ...) field."""
    rows = [None, None, None]
    for b in range(3):
        for c in range(3):
            w = float(blk[b, c])
            if w == 0.0:
                continue
            term = np.float32(w) * plane[c]
            rows[b] = term if rows[b] is None else rows[b] + term
    rows = [
        r if r is not None else jnp.zeros(plane.shape[1:], plane.dtype)
        for r in rows
    ]
    return jnp.stack(rows)


def _onehot(size: int, index: int) -> np.ndarray:
    m = np.zeros(size, np.float32)
    m[index] = 1.0
    return m


def _interior_flat(
    xs: jax.Array, interior: np.ndarray, x_prepadded: bool = False
) -> jax.Array:
    """Interior 27-point stencil evaluated in flattened-lane form.

    ``(Y, Z)`` planes with Z ~ O(100) waste most of the 128-lane tile (e.g.
    57 -> 128: 2.5x padded work); reshaping to ``(3, X, Y*Z)`` puts a long
    axis in the lanes (pad ~1.02x).  A (dy, dz) window shift becomes the
    single flat shift ``s = dy*Z + dz`` on the padded row — exact wherever
    ``z + dz`` stays inside the row.  The two flat shifts with dz = +/-1
    *bleed* across row ends (at z = Z-1 they read the next y-row's z = 0
    value instead of the zero padding the 4D form sees); the bleed is a
    deterministic read of a real value, so it is cancelled analytically by
    two small 2D stencils coupling the z = 0 and z = Z-1 planes.
    """
    _, x_total, y, z = xs.shape
    x_planes = x_total - 2 if x_prepadded else x_total
    yz = y * z
    span = z + 1  # max |flat shift|
    xsf = xs.reshape(3, x_total, yz)
    x_pad = (0, 0) if x_prepadded else (1, 1)
    vp = jnp.pad(xsf, ((0, 0), x_pad, (span, span)))
    rows = [None, None, None]
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                blk = interior[dx + 1, dy + 1, dz + 1]
                if not blk.any():
                    continue
                shift = dy * z + dz
                window = vp[
                    :, 1 + dx : 1 + dx + x_planes,
                    span + shift : span + shift + yz,
                ]
                for b in range(3):
                    for c in range(3):
                        w = float(blk[b, c])
                        if w == 0.0:
                            continue
                        term = np.float32(w) * window[c]
                        rows[b] = term if rows[b] is None else rows[b] + term
    out = jnp.stack(
        [
            r if r is not None else jnp.zeros((x_planes, yz), xs.dtype)
            for r in rows
        ]
    ).reshape(3, x_planes, y, z)

    # cancel the dz=+1 bleed: outputs at z=Z-1 picked up
    # sum_{dx,dy} C[dx,dy,+1] * u[x+dx, y+dy+1, 0]   (y-offsets 0..2)
    a_lo = xs[:, :, :, 0]  # (3, X, Y)
    out = out.at[:, :, :, z - 1].add(
        -_bleed_taps(a_lo, interior[:, :, 2], forward=True,
                     x_prepadded=x_prepadded)
    )
    # cancel the dz=-1 bleed: outputs at z=0 picked up
    # sum_{dx,dy} C[dx,dy,-1] * u[x+dx, y+dy-1, Z-1] (y-offsets -2..0)
    a_hi = xs[:, :, :, z - 1]
    out = out.at[:, :, :, 0].add(
        -_bleed_taps(a_hi, interior[:, :, 0], forward=False,
                     x_prepadded=x_prepadded)
    )
    return out


def _bleed_taps(
    a: jax.Array, taps: np.ndarray, forward: bool, x_prepadded: bool = False
) -> jax.Array:
    """2D stencil with a y-offset range of {0,1,2} (forward) or {-2,-1,0}
    (backward) — the bleed couplings are off-center, so a centered window
    would lose the in-range boundary reads (a shifted-input trick zero-fills
    exactly the rows that must stay real)."""
    _, x_size, y_size = a.shape
    if x_prepadded:
        x_size -= 2
    x_pad = (0, 0) if x_prepadded else (1, 1)
    pad = (((0, 0),) + (x_pad,) + ((0, 2),)) if forward else (
        ((0, 0),) + (x_pad,) + ((2, 0),)
    )
    vp = jnp.pad(a, pad)
    rows = [None, None, None]
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            blk = taps[dx + 1, dy + 1]
            if not blk.any():
                continue
            # y-offset (dy+1) for forward, (dy-1) for backward — both map
            # to window start dy+1 with the respective padding above
            window = vp[:, 1 + dx : 1 + dx + x_size,
                        dy + 1 : dy + 1 + y_size]
            for b in range(3):
                for c in range(3):
                    w = float(blk[b, c])
                    if w == 0.0:
                        continue
                    term = np.float32(w) * window[c]
                    rows[b] = term if rows[b] is None else rows[b] + term
    rows = [
        r if r is not None else jnp.zeros((x_size, y_size), a.dtype)
        for r in rows
    ]
    return jnp.stack(rows)


# grids above this node count evaluate the interior stencil in the
# flattened-lane form: its ~1.0x lane padding beats the (Y, Z)-plane form's
# tile waste once volumes are large (v5e matvec chain: 945k DOF 4D 0.98
# GDOF/s / flat 0.72; 4.5M DOF 4D 0.57 / flat 1.59).  Caveat: inside the
# full PCG program XLA's fusion outcomes differ again (945k steps/s: 4D
# 41.8 / flat 47.1; 4.5M: 4D 15.1 / flat 11.7) — the crossover below tracks
# the standalone operator, the honest headline.
_FLAT_INTERIOR_NODE_THRESHOLD = 700_000

# Fused-stream-kernel dispatch floor (ADR-23, measured on v5e): the kernel
# matches or beats the XLA forms from ~500k nodes up PROVIDED the (Y, Z)
# plane carries enough work per grid step — on tiny planes the ~5 us
# per-step pipeline latency dominates (0.601 XLA vs 0.704 kernel ms at
# 96x56x56; 0.707 kernel vs 0.792 XLA at 79^3; 1.21 vs 4.48 at 144x88x88).
_KERNEL_MIN_NODES = 500_000
_KERNEL_MIN_PLANE = 5_000  # y*z lanes per plane


def stream_kernel_profitable(model: StructuredModel) -> bool:
    """Whether the fused Pallas stream kernels beat the XLA forms at this
    grid's shape (node count + plane-size floors, measured in ADR-23)."""
    _, y, z = model.grid_shape
    return (
        int(np.prod(model.grid_shape)) > _KERNEL_MIN_NODES
        and y * z >= _KERNEL_MIN_PLANE
    )


def _interior_dispatch(
    model: StructuredModel, xs: jax.Array, interior: np.ndarray
) -> jax.Array:
    """Interior 27-point stencil, chosen by grid size (all forms pinned
    equal by tests; numbers are v5e matvec-chain measurements):

    * large grids (> _FLAT_INTERIOR_NODE_THRESHOLD nodes) on TPU: the
      Pallas slab kernel — planes live in VMEM, HBM sees each plane O(1)
      times (4.5M DOF: 2.44 ms vs 2.88 flat; 50M: 7.9 ms vs 15.5 — 2x);
    * large grids elsewhere (CPU, GSPMD-sharded): flattened-lane XLA form;
    * small grids: (Y, Z)-plane shifted windows (the Pallas kernel is
      per-op-overhead-bound on tiny planes: 0.95 ms vs 0.84 at 945k DOF).
    """
    _, _, y, z = xs.shape
    large = int(np.prod(model.grid_shape)) > _FLAT_INTERIOR_NODE_THRESHOLD
    if (
        large
        and model.use_pallas
        and xs.dtype == jnp.float32  # kernels are f32-only (fp64 vector
        # mode takes the XLA forms)
        and jax.default_backend() == "tpu"
    ):
        from .pallas.structured_stencil import interior_stencil_pallas, plane_fits

        if plane_fits(y, z):
            return interior_stencil_pallas(xs, interior)
    if large:
        return _interior_flat(xs, interior)
    return _apply_taps(xs, interior)


def _face_correction(model: StructuredModel, xs, axis, side, tables,
                     sanitize: bool = False):
    """Correction plane for one face, with its assigned edge/corner terms
    folded in as dense masked ops (one-hot row/point masks — per-slice
    ``.at[].add`` on either the output or the small plane broke fusion).

    ``sanitize=True`` takes RAW x and zeroes constrained components on the
    extracted plane only (the fused-pallas path avoids materializing a
    full sanitized array just for the boundary corrections)."""
    _, faces, edges, corners = tables
    hi = (model.nx, model.ny, model.nz)
    plane_sl = [slice(None)] * 4
    plane_sl[1 + axis] = 0 if side == 0 else hi[axis]
    plane_sl = tuple(plane_sl)
    plane = xs[plane_sl]  # (3, d1, d2)
    if sanitize:
        plane = jnp.where(model.bc_mask[plane_sl], 0.0, plane)
    corr = _apply_taps(plane, faces[(axis, side)])
    rem = [a for a in range(3) if a != axis]  # plane's spatial axes
    d1, d2 = plane.shape[1], plane.shape[2]
    # edges assigned to their lower-axis face: sign flips inside corr
    # (out -= corr, so -edge here means +edge in out)
    for (a1, s1, a2, s2), edge_taps in edges.items():
        if a1 != axis or s1 != side:
            continue
        pos = rem.index(a2)  # plane axis the edge line is pinned on
        pinned = 0 if s2 == 0 else hi[a2]
        mask = (
            _onehot(d1, pinned)[None, :, None]
            if pos == 0
            else _onehot(d2, pinned)[None, None, :]
        )
        corr = corr - mask * _apply_taps_axis(plane, edge_taps, 1 - pos)
    # corners assigned to their x face (+corner here -> -corner in out)
    if axis == 0:
        for (sx, sy, sz), corner_taps in corners.items():
            if sx != side:
                continue
            mask = (
                _onehot(d1, 0 if sy == 0 else hi[1])[None, :, None]
                * _onehot(d2, 0 if sz == 0 else hi[2])[None, None, :]
            )
            corr = corr + mask * _matvec_const(plane, corner_taps)
    return plane_sl, corr


# Two exact correction forms exist: masked-dense inside the face buffers
# (default) and direct sliced updates per face/edge/corner.  In the
# shipped harness (model passed as a jit argument) they measure within
# noise of each other at every size on v5e, so the direct form is kept
# only as a tested alternative (threshold disabled).  Beware harness
# artifacts: with the model closure-captured as HLO constants the direct
# form once measured 2.8x faster at 4.5M DOF — not reproducible with real
# argument passing.  (A jax.lax.optimization_barrier fence also timed well
# at scale but MISCOMPILES under TPU jit on jax 0.9.0 — wrong values
# everywhere, NaN PCG — never reintroduce without elementwise-validating
# jitted TPU output.)
_DIRECT_CORRECTION_NODE_THRESHOLD = None  # disabled: fused form always


def _apply_homogeneous_stiffness(model: StructuredModel, xs: jax.Array) -> jax.Array:
    """Exact assembled K*xs for a uniform homogeneous grid (CSG layout).

    Interior constant stencil minus boundary corrections.  Small grids fold
    the edge/corner terms into the six face-plane buffers as dense masked
    ops (everything fuses, six sliced updates total); large grids apply
    faces, edges and corners as direct sliced updates (26 small updates —
    see ``_DIRECT_CORRECTION_NODE_THRESHOLD`` for the measured crossover).
    """
    tables = _stencil_tables(model.spacing, model.lam0, model.mu0)
    interior, faces, edges, corners = tables
    hi = (model.nx, model.ny, model.nz)

    out = _interior_dispatch(model, xs, interior)

    if (
        _DIRECT_CORRECTION_NODE_THRESHOLD is None
        or int(np.prod(model.grid_shape)) <= _DIRECT_CORRECTION_NODE_THRESHOLD
    ):
        for (axis, side) in faces:
            plane_sl, corr = _face_correction(model, xs, axis, side, tables)
            out = out.at[plane_sl].add(-corr)
        return out

    # large grids: direct form — faces subtract, edges add, corners subtract
    for (axis, side), ftaps in faces.items():
        sl = [slice(None)] * 4
        sl[1 + axis] = 0 if side == 0 else hi[axis]
        sl = tuple(sl)
        out = out.at[sl].add(-_apply_taps(xs[sl], ftaps))
    for (a1, s1, a2, s2), etaps in edges.items():
        sl = [slice(None)] * 4
        sl[1 + a1] = 0 if s1 == 0 else hi[a1]
        sl[1 + a2] = 0 if s2 == 0 else hi[a2]
        sl = tuple(sl)
        out = out.at[sl].add(_apply_taps(xs[sl], etaps))
    for (sx, sy, sz), ctaps in corners.items():
        sl = (
            slice(None),
            0 if sx == 0 else hi[0],
            0 if sy == 0 else hi[1],
            0 if sz == 0 else hi[2],
        )
        out = out.at[sl].add(-_apply_taps(xs[sl], ctaps))
    return out


def _corner_views(xs: jax.Array, nx: int, ny: int, nz: int):
    """The 8 per-corner element views of a CSG vector, each (3, nx, ny, nz)."""
    return [
        xs[:, di : di + nx, dj : dj + ny, dk : dk + nz]
        for (di, dj, dk) in CORNERS
    ]


def _apply_heterogeneous_stiffness(model: StructuredModel, xs: jax.Array) -> jax.Array:
    """Per-element corner-gather K*xs with material grids (CSG layout)."""
    grads, gp_vol = _element_tables(model.spacing)
    nx, ny, nz = model.nx, model.ny, model.nz
    lam = model.lam_cells
    mu = model.mu_cells
    u_l = _corner_views(xs, nx, ny, nz)

    # accumulate per-corner force fields across Gauss points
    f = [[None] * 3 for _ in range(8)]
    for gp in range(8):
        g = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for b in range(3):
                acc = None
                for l in range(8):
                    w = float(grads[gp, l, a])
                    if w == 0.0:
                        continue
                    term = np.float32(w) * u_l[l][b]
                    acc = term if acc is None else acc + term
                g[a][b] = acc if acc is not None else jnp.zeros(
                    (nx, ny, nz), xs.dtype
                )
        trace = g[0][0] + g[1][1] + g[2][2]
        vol = float(gp_vol[gp])
        stress = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for b in range(a, 3):
                s = mu * (g[a][b] + g[b][a])
                if a == b:
                    s = s + lam * trace
                stress[a][b] = stress[b][a] = np.float32(vol) * s
        for l in range(8):
            for b in range(3):
                acc = f[l][b]
                for a in range(3):
                    w = float(grads[gp, l, a])
                    if w == 0.0:
                        continue
                    term = np.float32(w) * stress[a][b]
                    acc = term if acc is None else acc + term
                f[l][b] = acc

    out = jnp.zeros_like(xs)
    for l, (di, dj, dk) in enumerate(CORNERS):
        fl = jnp.stack([f[l][b] for b in range(3)])
        out = out.at[:, di : di + nx, dj : dj + ny, dk : dk + nz].add(fl)
    return out


def _apply_fused_pallas(model: StructuredModel, x, stiffness_scale, mass_factor):
    """Large-grid TPU path: ONE pallas_call carries the ENTIRE operator —
    sanitize + interior stencil + every boundary ghost correction + mass +
    identity rows.  Two prior generations left work outside the kernel and
    paid for it in HBM passes: the XLA envelope around the interior-only
    kernel cost ~1.5 ms per pass at 50M DOF, and the six face-correction
    updates another 5.25 ms of the 10.4 ms matvec (ADR-21; now 4.7 ms)."""
    from .pallas.structured_stencil import apply_keff_fused_pallas

    tables = _stencil_tables(model.spacing, model.lam0, model.mu0)
    ss = jnp.asarray(stiffness_scale, jnp.float32)
    return apply_keff_fused_pallas(model, x, ss, mass_factor, tables)


def apply_keff_structured(
    model: StructuredModel, x: jax.Array, stiffness_scale, mass_factor
) -> jax.Array:
    """K_eff * x in CSG layout; semantics match the general operator exactly
    (sanitize -> stiffness -> scale -> mass term -> identity rows), plus
    the absorbing-face dashpot term when the stepper injected a1
    (add_absorbing_operator_term — O(surface) face-plane updates).
    """
    out = _apply_keff_structured_base(model, x, stiffness_scale, mass_factor)
    return add_absorbing_operator_term(model, out, x)


def _apply_keff_structured_base(
    model: StructuredModel, x: jax.Array, stiffness_scale, mass_factor
) -> jax.Array:
    if model.shard_mesh is not None and model.homogeneous:
        from .structured_sharded import apply_keff_structured_sharded

        return apply_keff_structured_sharded(
            model, x, stiffness_scale, mass_factor
        )
    if (
        model.homogeneous
        and model.use_pallas
        and x.dtype == jnp.float32  # the slab kernel is f32-only; the
        # fp64 vector mode (precision.vectors) takes the XLA forms
        and jax.default_backend() == "tpu"
    ):
        from .pallas.structured_stencil import plane_fits

        _, _, y, z = x.shape
        if stream_kernel_profitable(model) and plane_fits(y, z):
            return _apply_fused_pallas(model, x, stiffness_scale, mass_factor)
    xs = jnp.where(model.bc_mask, 0.0, x)
    if model.homogeneous:
        stiff = _apply_homogeneous_stiffness(model, xs)
    else:
        stiff = _apply_heterogeneous_stiffness(model, xs)
    out = stiff * jnp.asarray(stiffness_scale, xs.dtype)
    out = out + (jnp.asarray(mass_factor, xs.dtype) * model.mass_grid)[None] * xs
    return jnp.where(model.bc_mask, x, out)


# --------------------------------------------------------------------------
# block-Jacobi preconditioner (CSG layout)
# --------------------------------------------------------------------------


def assemble_node_blocks_structured(
    model: StructuredModel, stiffness_scale, mass_factor
) -> jax.Array:
    """Per-node 3x3 K_eff diagonal blocks, (3, 3, X, Y, Z).

    Per corner l the gp-summed diagonal block is
    ``scale * [(lam+mu) A_l + mu b_l I]`` with constant
    ``A_l = sum_gp V g_gl (x) g_gl`` and ``b_l = sum_gp V |g_gl|^2``
    (pcg.cpp:270-378 without building Ke), scattered to the 8 corners.
    """
    grads, gp_vol = _element_tables(model.spacing)
    a_const = np.einsum("g,gla,glb->lab", gp_vol, grads, grads)  # (8, 3, 3)
    b_const = np.einsum("g,gla,gla->l", gp_vol, grads, grads)  # (8,)
    nx, ny, nz = model.nx, model.ny, model.nz
    grid_shape = model.grid_shape

    ss = jnp.asarray(stiffness_scale, jnp.float32)
    lam_mu = (model.lam_cells + model.mu_cells) * ss
    mu = model.mu_cells * ss

    rows = []
    for a in range(3):
        for b in range(3):
            acc = jnp.zeros(grid_shape, jnp.float32)
            for l, (di, dj, dk) in enumerate(CORNERS):
                contrib = np.float32(a_const[l, a, b]) * lam_mu
                if a == b:
                    contrib = contrib + np.float32(b_const[l]) * mu
                acc = acc.at[di : di + nx, dj : dj + ny, dk : dk + nz].add(
                    contrib
                )
            if a == b:
                acc = acc + jnp.asarray(mass_factor, jnp.float32) * model.mass_grid
            rows.append(acc)
    return jnp.stack(rows).reshape(3, 3, *grid_shape)


def _det3_lead(m: jax.Array) -> jax.Array:
    return (
        m[0, 0] * (m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1])
        - m[0, 1] * (m[1, 0] * m[2, 2] - m[1, 2] * m[2, 0])
        + m[0, 2] * (m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0])
    )


def _adjugate_lead(m: jax.Array) -> jax.Array:
    return jnp.stack(
        [
            m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1],
            m[0, 2] * m[2, 1] - m[0, 1] * m[2, 2],
            m[0, 1] * m[1, 2] - m[0, 2] * m[1, 1],
            m[1, 2] * m[2, 0] - m[1, 0] * m[2, 2],
            m[0, 0] * m[2, 2] - m[0, 2] * m[2, 0],
            m[0, 2] * m[1, 0] - m[0, 0] * m[1, 2],
            m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0],
            m[0, 1] * m[2, 0] - m[0, 0] * m[2, 1],
            m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0],
        ]
    ).reshape(3, 3, *m.shape[2:])


def _invert_spd_3x3_lead(blocks: jax.Array) -> jax.Array:
    """Regularized SPD 3x3 inverse on leading axes (pcg.cpp:215-268)."""
    det = _det3_lead(blocks)
    singular = jnp.abs(det) < _DET_TOL

    diag = jnp.stack([blocks[0, 0], blocks[1, 1], blocks[2, 2]])
    max_diag = jnp.max(diag, axis=0)
    epsilon = jnp.maximum(1.0e-6, max_diag * 1.0e-6 + 1.0e-12)
    eye = np.eye(3, dtype=np.float32).reshape(
        3, 3, *([1] * (blocks.ndim - 2))
    )
    regularized = jnp.where(
        singular[None, None], blocks + epsilon[None, None] * eye, blocks
    )
    det2 = _det3_lead(regularized)
    still_singular = jnp.abs(det2) < _DET_TOL

    inv_det = 1.0 / jnp.where(still_singular, 1.0, det2)
    inverse = _adjugate_lead(regularized) * inv_det[None, None]

    reg_diag = jnp.stack(
        [regularized[0, 0], regularized[1, 1], regularized[2, 2]]
    )
    inv_diag = 1.0 / jnp.maximum(reg_diag, 1.0e-6)
    diag_only = inv_diag[:, None] * eye
    return jnp.where(still_singular[None, None], diag_only, inverse)


def build_block_jacobi_inverse_structured(
    model: StructuredModel, stiffness_scale, mass_factor
) -> jax.Array:
    """Symmetric-packed inverse blocks (6, X, Y, Z): [00, 11, 22, 01, 02, 12]
    (pcg.cpp:479-503).

    The SPD block inverse is symmetric, so 6 components suffice — at 50M DOF
    the preconditioner read is the largest non-matvec HBM stream of each
    PCG iteration (9 vs 6 planes: 1.8 vs 1.2 GB).  The reference's identity
    rows on constrained axes (pcg.cpp:390-400) are observationally redundant
    here: PCG clamps ``r`` to zero on constrained components before every
    preconditioner application and the apply zeroes constrained outputs, so
    neither the constrained rows nor columns of the inverse are reachable.
    """
    blocks = assemble_node_blocks_structured(model, stiffness_scale, mass_factor)
    inverse = _invert_spd_3x3_lead(blocks)
    return jnp.stack(
        [
            inverse[0, 0],
            inverse[1, 1],
            inverse[2, 2],
            inverse[0, 1],
            inverse[0, 2],
            inverse[1, 2],
        ]
    )


def apply_preconditioner_structured(
    model: StructuredModel, block_inverse: jax.Array, residual: jax.Array
) -> jax.Array:
    """z = M^-1 r with constrained outputs zeroed (pcg.cpp:410-456);
    ``block_inverse`` is symmetric-packed (6, X, Y, Z)."""
    c00, c11, c22, c01, c02, c12 = block_inverse
    r0, r1, r2 = residual
    z = jnp.stack(
        [
            c00 * r0 + c01 * r1 + c02 * r2,
            c01 * r0 + c11 * r1 + c12 * r2,
            c02 * r0 + c12 * r1 + c22 * r2,
        ]
    )
    return jnp.where(model.bc_mask, 0.0, z)


class CompactBlockJacobi(NamedTuple):
    """Class-table block-Jacobi inverse for HOMOGENEOUS uniform grids.

    On a homogeneous grid the assembled 3x3 node block depends only on the
    node's per-axis boundary class (low face / interior / high face): the
    incident-cell pattern and the constant material give at most 27
    distinct blocks, so the (6, X, Y, Z) packed inverse — the largest
    non-matvec HBM stream of each PCG iteration, 402 MB at 50.3M DOF —
    carries exactly the (6, 3, 3, 3) table

        inv[m, i, j, k] = table[m, x_class(i), y_class(j), z_class(k)].

    The apply expands coefficients in-register from one-hot class vectors;
    on TPU a Pallas kernel does it in ONE pass over the residual (the XLA
    3-component output stack splits into three fusions that each re-read
    all of r — measured 2.33 ms full-table vs ~0.7 ms kernel at 50.3M
    DOF).  Reference analogue: pcg_precondition.slang reads per-node
    BlockInverse rows; at <=150k DOF that table fits L2 and deduplication
    was never worth it.
    """

    table: jax.Array  # (6, 3, 3, 3) f32 — [comp, x-class, y-class, z-class]


def build_compact_block_jacobi(
    model: StructuredModel, stiffness_scale, mass_factor
) -> CompactBlockJacobi:
    """Compact form of :func:`build_block_jacobi_inverse_structured`.

    Builds the full per-node inverse (hoisted by the stepper — ADR-17 —
    so the transient build cost is amortized over dt changes) and slices
    one representative node per class combination: class-separability of
    the assembled blocks makes the 27 sampled blocks reproduce every
    node's value exactly.  Dead x pad planes beyond x=nx take high-class
    values in the apply — they are fully constrained, so their z is
    bc-zeroed and any finite block works.  Degenerate extents (n==1: no
    interior class) leave the interior entry unused.
    """
    full = build_block_jacobi_inverse_structured(
        model, stiffness_scale, mass_factor
    )
    xsel = np.array([0, min(1, model.nx), model.nx])
    ysel = np.array([0, min(1, model.ny), model.ny])
    zsel = np.array([0, min(1, model.nz), model.nz])
    table = full[:, xsel][:, :, ysel][:, :, :, zsel]  # (6, 3, 3, 3)
    return CompactBlockJacobi(table=table)


def apply_compact_preconditioner_structured(
    model: StructuredModel, pc: CompactBlockJacobi, residual: jax.Array
) -> jax.Array:
    """z = M^-1 r from the class table (see :class:`CompactBlockJacobi`);
    bitwise the full-table apply (one-hot expansion adds exact zeros)."""
    if (
        model.use_pallas
        and model.shard_mesh is None
        and residual.dtype == jnp.float32
        and jax.default_backend() == "tpu"
        and stream_kernel_profitable(model)
    ):
        from .pallas.structured_stencil import plane_fits

        _, y, z = model.grid_shape
        if plane_fits(y, z):
            from .pallas.block_jacobi_apply import apply_block_jacobi_pallas

            return apply_block_jacobi_pallas(model, pc.table, residual)

    # XLA fallback (small grids, CPU, fp64 vectors, GSPMD-sharded): the
    # coefficient grids are virtual broadcast products — never the full
    # (6, X, Y, Z) table in HBM
    x_planes, ys, zs = model.grid_shape
    idx = np.arange(x_planes)
    clsx = np.where(idx == 0, 0, np.where(idx >= model.nx, 2, 1))
    tab_x = pc.table[:, clsx]  # (6, X, 3, 3) — static-index gather
    jdx = np.arange(ys)
    wy = np.eye(3, dtype=np.float32)[
        :, np.where(jdx == 0, 0, np.where(jdx >= model.ny, 2, 1))
    ]  # (3, Y)
    kdx = np.arange(zs)
    wz = np.eye(3, dtype=np.float32)[
        :, np.where(kdx == 0, 0, np.where(kdx >= model.nz, 2, 1))
    ]  # (3, Z)

    def coef(m):  # (X, Y, Z) virtual coefficient map
        t = tab_x[m]  # (X, 3, 3)
        c = None
        for a in range(3):
            for b in range(3):
                term = t[:, a, b][:, None, None] * jnp.asarray(
                    (wy[a][:, None] * wz[b][None, :])[None]
                )
                c = term if c is None else c + term
        return c

    c00, c11, c22, c01, c02, c12 = (coef(m) for m in range(6))
    r0, r1, r2 = residual
    z = jnp.stack(
        [
            c00 * r0 + c01 * r1 + c02 * r2,
            c01 * r0 + c11 * r1 + c12 * r2,
            c02 * r0 + c12 * r1 + c22 * r2,
        ]
    )
    return jnp.where(model.bc_mask, 0.0, z)


def apply_pc_keff_structured(
    model: StructuredModel, pc, residual: jax.Array, stiffness_scale,
    mass_factor,
):
    """(u, w) = (M^-1 r, K_eff u) — the back-to-back pc-apply + matvec of
    the Chronopoulos-Gear iteration (solver/pcg.py) as ONE Pallas pass
    when eligible.

    Run as two kernels, the class-table pc apply costs its own full pass
    over the residual plus a dispatch and u round-trips through HBM
    between them (~2.6 ms of the 7.9 ms/iteration at 50.3M DOF on v5e).
    The mega kernel transforms delivered residual planes to u in-register
    and feeds the stencil's rolling window directly.  Eligibility is the
    fused-matvec envelope (homogeneous, unsharded, f32, large planes that
    fit VMEM) plus an even x-plane count (the kernel is blocked-only);
    everything else takes the composition, which is semantically
    identical.

    Reference analogue: pcg_precondition.slang followed by the
    ke_apply/gather pair — separate dispatches with a queue sync between
    them (newmark_stepper.cpp:787-841); fusing them is the TPU-native
    restatement.
    """
    if pc_keff_kernel_eligible(model, pc, residual.dtype):
        from .pallas.structured_stencil import apply_pc_keff_fused_pallas

        tables = _stencil_tables(model.spacing, model.lam0, model.mu0)
        out = apply_pc_keff_fused_pallas(
            model, pc.table, residual, stiffness_scale, mass_factor,
            tables,
        )
        if out is not None:
            u, w = out
            # the kernel computes ss*K + mf*M; the absorbing dashpot term
            # (+ a1 C u) rides as O(surface) face-plane updates
            return u, add_absorbing_operator_term(model, w, u)
    u = model.apply_preconditioner(pc, residual)
    w = model.apply_keff(u, stiffness_scale, mass_factor)
    return u, w


# ADR-22 measured the fused/classic crossover at ~5M nodes BEFORE the
# in-kernel dot partials; with them (apply_pc_keff_dots) fused wins at
# every size the kernel engages (2.65M DOF 1.12/1.15, 50.3M 7.18/7.98
# ms/iter), so prefers_fused_pcg now delegates to kernel eligibility.


def pc_keff_kernel_eligible(model: StructuredModel, pc, dtype) -> bool:
    """Whether apply_pc_keff_structured will take the fused Pallas kernel
    (homogeneous, unsharded, f32, large VMEM-fitting planes, even x-plane
    count on the TPU backend)."""
    if not (
        isinstance(pc, CompactBlockJacobi)
        and model.homogeneous
        and model.use_pallas
        and model.shard_mesh is None
        and dtype == jnp.float32
        and jax.default_backend() == "tpu"
        and stream_kernel_profitable(model)
    ):
        return False
    from .pallas.structured_stencil import _pick_block, plane_fits

    x_planes, y, z = model.grid_shape
    return plane_fits(y, z) and _pick_block(x_planes) > 1


def build_fused_pcg_iteration(
    model: StructuredModel, pc, stiffness_scale, mass_factor,
    reduction_dtype=jnp.float64, vector_dtype=jnp.float32,
    *, interpret: bool | None = None,
):
    """Whole-iteration PCG kernel bundle, or None when ineligible.

    Returns ``(iteration, pad, unpad)``: ``pad``/``unpad`` convert solver
    vectors to/from the x_ext-padded carry layout (one constrained halo
    plane left, block-1 right) and ``iteration(carries, alpha, beta)``
    runs ONE Chronopoulos-Gear iteration — p/s recurrence, x/r axpys,
    block-Jacobi apply, K_eff and all three dot products — as a single
    Pallas pass, returning the updated padded carries and the
    ``(gamma, delta, rr)`` reductions in ``reduction_dtype``.

    Eligibility is the fused pc+matvec envelope (homogeneous, unsharded,
    f32, large VMEM-fitting planes, even x-plane count); ``interpret``
    forces/disables interpreter mode for CPU tests (None = hardware
    gating).
    """
    import os

    # opt-in (ADR-22): measured at 50.3M DOF on v5e the whole-iteration
    # kernel is BANDWIDTH-serialized — its 13 block streams move 2.6 GB
    # per iteration that the split form overlaps better (8.24 vs 7.80
    # ms/iter).  Kept for higher-BW:VPU parts (v5p moves the same bytes
    # in ~1 ms against the same VPU time), where the single-launch form
    # should invert the verdict.
    if os.environ.get("CIVIWAVE_MEGA_PCG", "0") != "1" and not interpret:
        return None
    if model.absorb_faces:
        # the whole-iteration kernel computes w in-kernel and cannot carry
        # the absorbing face term; the split path adds it post-kernel
        return None
    if not (
        isinstance(pc, CompactBlockJacobi)
        and model.homogeneous
        and model.use_pallas
        and model.shard_mesh is None
        and vector_dtype == jnp.float32
        and (interpret or stream_kernel_profitable(model))
    ):
        return None
    if interpret is None:
        if jax.default_backend() != "tpu":
            return None
        interpret = False
    from .pallas.structured_stencil import (
        _pick_block,
        pcg_iteration_fused_pallas,
        plane_fits,
    )

    x_planes, y, z = model.grid_shape
    if not plane_fits(y, z) or _pick_block(x_planes) == 1:
        return None
    block = _pick_block(x_planes)
    tables = _stencil_tables(model.spacing, model.lam0, model.mu0)
    rdt = reduction_dtype

    def iteration(carries, alpha, beta):
        new_carries, pa, pb = pcg_iteration_fused_pallas(
            model, pc.table, carries, alpha, beta, stiffness_scale,
            mass_factor, tables, interpret=interpret,
        )
        gamma = jnp.sum(pa[:, 0].astype(rdt))
        rr = jnp.sum(pa[:, 1].astype(rdt))
        delta = jnp.sum(pb[:, 0].astype(rdt))
        return new_carries, (gamma, delta, rr)

    def pad(v):
        return jnp.pad(v, ((0, 0), (1, block - 1), (0, 0), (0, 0)))

    def unpad(v):
        return v[:, 1 : 1 + x_planes]

    return iteration, pad, unpad


# --------------------------------------------------------------------------
# Lysmer-Kuhlemeyer absorbing faces (CSG layout; physics/absorbing.py)
# --------------------------------------------------------------------------

_FACE_TAGS = {"x0": (0, 0), "x1": (0, 1), "y0": (1, 0), "y1": (1, 1),
              "z0": (2, 0), "z1": (2, 1)}


def _face_damp_terms(model: StructuredModel, x: jax.Array):
    """Yield (plane_index_tuple, masked C .dot x term) per absorbing face.

    Per node on face (axis, side): C is diagonal in the grid frame —
    rho*c_p against the normal component, rho*c_s tangential — times the
    tributary face area (spacing product of the in-plane axes with the
    same half-weights at plane edges as the lumped mass).  Output
    components on constrained axes are zeroed; the input plane is
    sanitized, so the effective operator term is P_free C P_free —
    symmetric, as CG requires.
    """
    hx, hy, hz = model.spacing
    extents = (model.nx, model.ny, model.nz)
    spacings = (hx, hy, hz)
    for tag in model.absorb_faces:
        axis, side = _FACE_TAGS[tag]
        pos = 0 if side == 0 else extents[axis]
        in_plane = [a for a in range(3) if a != axis]
        area = float(spacings[in_plane[0]] * spacings[in_plane[1]])
        sl = [slice(None)] * 4
        sl[1 + axis] = pos
        sl = tuple(sl)
        x_plane = x[sl]  # (3, d1, d2)
        bc_plane = model.bc_mask[sl]
        xs_plane = jnp.where(bc_plane, 0.0, x_plane)
        d1, d2 = x_plane.shape[1], x_plane.shape[2]
        r1 = jax.lax.broadcasted_iota(jnp.int32, (d1, d2), 0)
        r2 = jax.lax.broadcasted_iota(jnp.int32, (d1, d2), 1)
        half, one = np.float32(0.5), np.float32(1.0)
        w1 = jnp.where((r1 == 0) | (r1 == extents[in_plane[0]]), half, one)
        w2 = jnp.where((r2 == 0) | (r2 == extents[in_plane[1]]), half, one)
        aw = np.float32(area) * (w1 * w2)  # (d1, d2) tributary areas
        coef = np.array(
            [model.rho_cs, model.rho_cs, model.rho_cs], np.float32
        )
        coef[axis] = np.float32(model.rho_cp)
        term = jnp.asarray(coef)[:, None, None] * (aw[None] * xs_plane)
        yield sl, jnp.where(bc_plane, 0.0, term)


def add_absorbing_operator_term(
    model: StructuredModel, out: jax.Array, x: jax.Array
) -> jax.Array:
    """out += damp_factor * C x on the absorbing face planes (no-op when
    the model has no absorbing faces or the stepper has not injected the
    Newmark a1 factor).  Applied AFTER identity rows — the term is
    bc-masked, so constrained entries stay exactly the passthrough."""
    if not model.absorb_faces or model.damp_factor is None:
        return out
    factor = jnp.asarray(model.damp_factor, out.dtype)
    for sl, term in _face_damp_terms(model, x):
        out = out.at[sl].add(factor * term.astype(out.dtype))
    return out


def absorbing_force_structured(
    model: StructuredModel, v: jax.Array
) -> jax.Array:
    """C v (no a1 factor) — the Newmark RHS damping-force contribution."""
    out = jnp.zeros_like(v)
    if not model.absorb_faces:
        return out
    for sl, term in _face_damp_terms(model, v):
        out = out.at[sl].add(term.astype(out.dtype))
    return out


def apply_pc_keff_dots_structured(
    model: StructuredModel, pc, residual: jax.Array, stiffness_scale,
    mass_factor, reduction_dtype=jnp.float64,
):
    """(u, w, (gamma, delta, rr)) with the three Chronopoulos-Gear dot
    products emitted AS ROW PARTIALS from the same pc+matvec kernel pass
    (see apply_pc_keff_fused_pallas with_dots), or None when the kernel is
    ineligible — the caller composes apply_pc_keff + fused_dots instead.

    Absorbing models decline: the face dashpot term is added to w AFTER
    the kernel, so an in-kernel (w,u) partial would miss it."""
    import os

    if (
        model.absorb_faces
        or os.environ.get("CIVIWAVE_KERNEL_DOTS", "1") != "1"
        or not pc_keff_kernel_eligible(model, pc, residual.dtype)
    ):
        return None
    from .pallas.structured_stencil import apply_pc_keff_fused_pallas

    tables = _stencil_tables(model.spacing, model.lam0, model.mu0)
    out = apply_pc_keff_fused_pallas(
        model, pc.table, residual, stiffness_scale, mass_factor, tables,
        with_dots=True,
    )
    if out is None:
        return None
    u, w, pa, pb = out
    rdt = reduction_dtype
    gamma = jnp.sum(pa[:, 0].astype(rdt))
    rr = jnp.sum(pa[:, 1].astype(rdt))
    delta = jnp.sum(pb[:, 0].astype(rdt))
    return u, w, (gamma, delta, rr)
