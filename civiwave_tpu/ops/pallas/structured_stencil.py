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
# fully-fused operator kernel: sanitize + interior + mass + identity rows
# ---------------------------------------------------------------------------


def _make_fused_kernel(taps: np.ndarray, y: int, z: int):
    """Like _make_kernel, but absorbs the whole K_eff envelope: inputs are
    RAW x planes plus int8 constraint planes; the kernel sanitizes each
    input plane, runs the interior taps, and emits the FINAL value
    ``bc ? x_raw : ss*interior + mf*mass*xs`` — at 50M DOF every XLA
    envelope pass around a custom call costs ~1.5 ms of HBM, which ate the
    kernel's 2x interior win when the envelope stayed outside."""

    def kernel(ss_ref, mf_ref, xm_ref, x0_ref, xp_ref,
               bm_ref, b0_ref, bp_ref, mass_ref, out_ref):
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
                masks[(dy, dz)] = cond

        raw = {-1: xm_ref[:, 0], 0: x0_ref[:, 0], 1: xp_ref[:, 0]}
        # constraint planes hold 0/1 int8 — Mosaic lacks i8 vector compares
        # on this target, so derive the free-mask by cast, not comparison
        free = {  # 1.0 on unconstrained components
            -1: 1.0 - bm_ref[:, 0].astype(jnp.float32),
            0: 1.0 - b0_ref[:, 0].astype(jnp.float32),
            1: 1.0 - bp_ref[:, 0].astype(jnp.float32),
        }
        planes = {dx: raw[dx] * free[dx] for dx in (-1, 0, 1)}

        acc = [None, None, None]
        for dx in (-1, 0, 1):
            plane = planes[dx]
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    blk = taps[dx + 1, dy + 1, dz + 1]
                    if not blk.any():
                        continue
                    mask = masks[(dy, dz)]
                    for c in range(3):
                        col_w = blk[:, c]
                        if not col_w.any():
                            continue
                        f = plane[c]
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
        interior = jnp.stack(
            [a if a is not None else jnp.zeros((y, z), jnp.float32) for a in acc]
        )
        ss = ss_ref[0, 0]
        mf = mf_ref[0, 0]
        x_raw = raw[0]
        xs0 = planes[0]
        mass = mass_ref[0]  # (y, z)
        out = ss * interior + (mf * mass) * xs0
        # identity rows: free==1 keeps out, free==0 passes raw input through
        f0 = free[0]
        out_ref[:, 0] = f0 * out + (1.0 - f0) * x_raw

    return kernel


def apply_keff_fused_pallas(
    model, x: jax.Array, stiffness_scale, mass_factor, interior_taps: np.ndarray,
    *, interpret: bool = False
) -> jax.Array:
    """Fused interior K_eff (sanitize + stencil + mass + identity rows) as
    one pallas_call over X planes.  Boundary ghost corrections are NOT
    included — the caller subtracts them (masked off constrained rows)."""
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    # int8 constraint planes: 4x less HBM than f32, bool is not a TPU type
    bc_pad = jnp.pad(
        model.bc_mask.astype(jnp.int8), ((0, 0), (1, 1), (0, 0), (0, 0)),
        constant_values=1,  # out-of-range planes read as constrained => 0
    )
    return apply_keff_fused_pallas_padded(
        x_pad, bc_pad, model.mass_grid, stiffness_scale, mass_factor,
        interior_taps, interpret=interpret,
    )


def apply_keff_fused_pallas_padded(
    x_pad: jax.Array, bc_pad: jax.Array, mass_grid: jax.Array,
    stiffness_scale, mass_factor, interior_taps: np.ndarray,
    *, interpret: bool = False
) -> jax.Array:
    """Core fused call on inputs that already carry one X halo plane per
    side — either zero/constrained padding (single chip) or real neighbor
    ghost planes exchanged by ``ppermute`` (one shard of an X-slab
    decomposition).  ``x_pad``/``bc_pad`` are (3, X+2, Y, Z); ``mass_grid``
    is the local (X, Y, Z); output is (3, X, Y, Z)."""
    _, x_total, y, z = x_pad.shape
    x_planes = x_total - 2
    kernel = _make_fused_kernel(np.asarray(interior_taps, np.float64), y, z)
    vec_spec = lambda offset, dtype=jnp.float32: pl.BlockSpec(  # noqa: E731
        (3, 1, y, z),
        lambda i, o=offset: (i * 0, i + o, i * 0, i * 0),
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
        in_specs=[
            smem, smem,
            vec_spec(0), vec_spec(1), vec_spec(2),
            vec_spec(0), vec_spec(1), vec_spec(2),
            mass_spec,
        ],
        out_specs=pl.BlockSpec(
            (3, 1, y, z),
            lambda i: (i * 0, i, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, x_planes, y, z), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=3 * x_pad.size * 4, transcendentals=0
        ),
        interpret=interpret,
    )(ss, mf, x_pad, x_pad, x_pad, bc_pad, bc_pad, bc_pad, mass_grid)
