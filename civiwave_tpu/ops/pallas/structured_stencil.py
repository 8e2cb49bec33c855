"""Pallas TPU kernel: slab-resident 27-point block stencil (interior term).

The XLA form of the assembled constant stencil (ops/structured.py) reads
the node grid once per shifted window — ~27x the vector's footprint in HBM
traffic.  This kernel walks the X axis one output plane per grid step; the
three input planes it needs live in VMEM (Pallas pipelines the plane loads
across grid steps automatically), so HBM sees each plane O(1) times and the
VPU runs the ~230 nonzero scalar taps back-to-back on (Y, Z) vregs.

Shifted (dy, dz) windows are realized as ``pltpu.roll`` + a constant edge
mask (zero-padding semantics: the wrapped row/column must read as zero).
Out-of-range x neighbors at the first/last plane are zeroed by a scalar
select.  Only the translation-invariant interior term runs here — the
lower-dimensional boundary corrections (inclusion-exclusion over ghost
element slabs) stay in XLA where they cost one sliced update per face.

**Measured outcome (v5e, 945k DOF, jax 0.9.0): the XLA stencil wins.**
This kernel compiles and is bit-exact vs the XLA form, but times 0.95 ms vs
0.80 ms (one plane per grid step: 1.20 ms).  The operator is VPU-op-bound —
~80 `pltpu.roll` + mask ops per step eat the HBM saving — and the
transpose/pad/shifted-view plumbing around the call costs another ~0.9 ms
in composition.  Kept as an opt-in (``StructuredModel.use_pallas``) and for
the equality test; the XLA stencil remains the default operator and the
only path under GSPMD X-slab sharding (a pallas_call does not partition).
Future win would need an MXU-friendly reformulation, not better plumbing.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# keep three input planes + one output + rolled temporaries under ~2 MiB
_MAX_PLANE_FLOATS = 128 * 1024


def plane_fits(y: int, z: int) -> bool:
    """Whether a (Y, Z) plane is small enough for the slab kernel."""
    # account for (8, 128) tile padding
    yp = ((y + 7) // 8) * 8
    zp = ((z + 127) // 128) * 128
    return yp * zp <= _MAX_PLANE_FLOATS


def _make_kernel(taps: np.ndarray, batch: int, y: int, z: int):
    """taps: (3, 3, 3, 3, 3) — (dx+1, dy+1, dz+1, b, c) scalar constants.

    Each grid step emits ``batch`` output planes; processing one plane per
    step left the VPU op-overhead-bound ((y, z) is only a handful of vregs),
    measured 1.4x SLOWER than the fused XLA loop.  The three refs hold the
    batch shifted by -1/0/+1 planes (same array, offset index maps), so the
    x-neighbor planes are just the other refs — no in-kernel concatenation.
    """

    def kernel(xm_ref, x0_ref, xp_ref, out_ref):
        # refs: (batch, 3, y, z) at plane offsets -1 / 0 / +1
        planes = {-1: xm_ref[:], 0: x0_ref[:], 1: xp_ref[:]}
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
            plane = planes[dx]  # (batch, 3, y, z)
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    blk = taps[dx + 1, dy + 1, dz + 1]  # (3, 3)
                    if not blk.any():
                        continue
                    mask = masks[(dy, dz)]
                    for c in range(3):
                        col = blk[:, c]
                        if not col.any():
                            continue
                        f = plane[:, c]  # (batch, y, z)
                        # pltpu.roll wants non-negative shifts; -d == size-d
                        # (int32: x64 mode would emit an i64 rotate operand,
                        # which tpu.dynamic_rotate rejects)
                        if dy:
                            f = pltpu.roll(f, np.int32((-dy) % y), axis=1)
                        if dz:
                            f = pltpu.roll(f, np.int32((-dz) % z), axis=2)
                        if mask is not None:
                            f = jnp.where(mask, f, 0.0)
                        for b in range(3):
                            w = float(col[b])
                            if w == 0.0:
                                continue
                            term = np.float32(w) * f
                            acc[b] = term if acc[b] is None else acc[b] + term
        out_ref[:] = jnp.stack(
            [
                a if a is not None else jnp.zeros((batch, y, z), jnp.float32)
                for a in acc
            ],
            axis=1,
        )

    return kernel


def interior_stencil_pallas(
    xs: jax.Array, taps: np.ndarray, *, interpret: bool = False
) -> jax.Array:
    """Apply the interior 27-point block stencil to ``xs`` (3, X, Y, Z)."""
    _, x_planes, y, z = xs.shape
    batch = 8  # output planes per grid step (amortizes per-op overhead)
    xp = ((x_planes + batch - 1) // batch) * batch
    kernel = _make_kernel(np.asarray(taps, np.float64), batch, y, z)
    # blocks walk the X axis, so X must be the leading array dim; block
    # index maps work in whole-block units, so the -1/0/+1 plane offsets
    # are realized as three pre-shifted sliced views of the zero-padded
    # array (XLA materializes them — ~3x the vector's footprint, still far
    # below the 27x of the shifted-window form)
    xs_x = jnp.pad(
        jnp.transpose(xs, (1, 0, 2, 3)),
        ((1, 1 + xp - x_planes), (0, 0), (0, 0), (0, 0)),
    )  # (xp + 2, 3, y, z)
    views = [xs_x[o : o + xp] for o in (0, 1, 2)]
    # index maps must return i32 under x64 mode — `x * 0` keeps the program
    # id's dtype where a literal `0` would trace as a weak i64
    spec = pl.BlockSpec(
        (batch, 3, y, z),
        lambda x: (x, x * 0, x * 0, x * 0),
        memory_space=pltpu.VMEM,
    )
    flops = 2 * int((np.asarray(taps) != 0).sum()) * x_planes * y * z
    out = pl.pallas_call(
        kernel,
        grid=(xp // batch,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((xp, 3, y, z), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * xs.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*views)
    return jnp.transpose(out[:x_planes], (1, 0, 2, 3))
