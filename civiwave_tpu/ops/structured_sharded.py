"""X-slab halo-exchange structured operator: shard_map + ppermute.

GSPMD can partition the flat XLA stencil (shifted slices become implicit
halo exchanges) but cannot partition a ``pallas_call`` — round 1 therefore
disabled the fused slab kernel under sharding and multi-chip ran the slower
XLA form.  This module runs the FULL fused operator per shard instead:

* the grid is decomposed into contiguous X-slabs over a 1-D device mesh
  (``shard_structured`` pads X to a device-count multiple with dead planes);
* inside ``jax.shard_map`` each shard exchanges ONE raw (Y, Z) ghost plane
  of ``x`` and one int8 constraint plane with each X neighbor via
  ``jax.lax.ppermute`` (the FEM analogue of ring-neighbor halo exchange;
  devices at the global ends receive ppermute's zero fill, which is exactly
  the zero/constrained padding the single-chip operator uses);
* the ghost-padded local slab runs the SAME fused Pallas slab kernel
  (``apply_keff_fused_pallas_padded``) or the prepadded XLA stencil forms;
* boundary corrections are computed shard-locally: Y/Z faces span every
  slab (their X-direction taps read the ghost planes), while the two X
  faces are single planes applied only on the owning shard via an
  ``axis_index`` mask.

Everything outside the operator (dots -> psum over ICI, axpys,
preconditioner apply) stays GSPMD-partitioned; only the stencil needs
manual collectives.  Semantics are bit-identical to the single-chip
operator (pinned by tests on the 8-device CPU mesh, kernel in interpret
mode).

Reference analogue: the CSR gather ke_gather_node.slang is the op whose
neighborhood structure forces halo exchange once nodes are partitioned
(SURVEY.md section 5); the reference itself never distributed.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .structured import (
    _FLAT_INTERIOR_NODE_THRESHOLD,
    _KERNEL_MIN_NODES,
    _KERNEL_MIN_PLANE,
    _apply_taps,
    _apply_taps_axis,
    _interior_flat,
    _matvec_const,
    _onehot,
    _stencil_tables,
)

if TYPE_CHECKING:  # pragma: no cover
    from ..mesh.structured import StructuredModel


def apply_keff_structured_sharded(
    model: "StructuredModel", x: jax.Array, stiffness_scale, mass_factor
) -> jax.Array:
    """K_eff * x with explicit per-shard halo exchange (homogeneous grids).

    Exact same semantics as the single-chip ``apply_keff_structured``:
    sanitize -> interior stencil - boundary corrections -> scale -> mass
    term -> identity rows.
    """
    if model.shard_axis_y is not None:
        return _apply_keff_2d(model, x, stiffness_scale, mass_factor)
    mesh = model.shard_mesh
    ax = model.shard_axis
    n = int(mesh.shape[ax])
    x_total = model.nx + 1 + model.pad_planes
    assert x_total % n == 0, "X extent must divide the shard mesh"
    x_local = x_total // n
    tables = _stencil_tables(model.spacing, model.lam0, model.mu0)

    # kernel choice is per-LOCAL-slab: the Pallas kernel wins on large
    # planes on real TPUs (ADR-23: node-count + plane-size floors); tests
    # force it via pallas_interpret on CPU
    local_nodes = x_local * (model.ny + 1) * (model.nz + 1)
    plane_lanes = (model.ny + 1) * (model.nz + 1)
    use_kernel = x.dtype == jnp.float32 and (
        model.pallas_interpret
        or (
            model.use_pallas
            and jax.default_backend() == "tpu"
            and local_nodes > _KERNEL_MIN_NODES
            and plane_lanes >= _KERNEL_MIN_PLANE
        )
    )
    if use_kernel:
        from .pallas.structured_stencil import plane_fits

        use_kernel = plane_fits(model.ny + 1, model.nz + 1)

    from .pallas.structured_stencil import _interior_mass

    def local_fn(x_loc, bc_loc, mass_loc, m8, ss, mf):
        return _local_keff(
            x_loc, bc_loc, mass_loc, m8, ss, mf,
            axis_name=ax, n_shards=n, x_local=x_local,
            nx=model.nx, ny=model.ny, nz=model.nz,
            tables=tables, use_kernel=use_kernel,
            interpret=model.pallas_interpret,
            large=local_nodes > _FLAT_INTERIOR_NODE_THRESHOLD,
        )

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, ax), P(None, ax), P(ax), P(), P(), P()),
        out_specs=P(None, ax),
        check_vma=False,
    )
    return sharded(
        x,
        model.bc_mask,
        model.mass_grid,
        _interior_mass(model),
        jnp.asarray(stiffness_scale, jnp.float32),
        jnp.asarray(mass_factor, jnp.float32),
    )


def _overlap_enabled() -> bool:
    """Interior/boundary kernel split on the 1-D halo path (ADR-28).
    CIVIWAVE_HALO_OVERLAP=0/1 overrides; default on for slabs with
    interior planes (x_local >= 4)."""
    import os

    env = os.environ.get("CIVIWAVE_HALO_OVERLAP", "auto")
    if env in ("0", "1"):
        return env == "1"
    return True


def _local_keff_overlap(
    x_loc, bc_i8, x_pad, bc_pad, m8, ss, mf, tables, ny, nz, *,
    idx, x_local, nx, interpret, ykw=None,
):
    """Shard-local K_eff split into ghost-free interior + 2 boundary planes.

    Three calls to the SAME fused slab kernel with identical per-plane
    math (bitwise: the kernel body is plane-local given its three input
    planes):

    * interior — local planes [1, x_local-2], whose one-plane halo is the
      slab's own planes 0 / x_local-1; consumes NO exchanged ghosts
      (built from the PRE-exchange ``x_loc``/``bc_i8``, so there is no
      structural data dependency on the ppermutes at all — not even a
      concat-slice pair for the simplifier to clean up);
    * two boundary planes (0 and x_local-1), each a 3-input-plane
      single-output-plane call reading one exchanged ghost.

    The global X faces keep the traced local-output-index mechanism; the
    face index shifts by the sub-call's plane offset (interior output k
    is local plane k+1).

    2-D (X, Y) decomposition reuses this split verbatim: ``ykw`` carries
    the ghost-Y kernel parameters (``y_rows``/``oy_lo``/``oy_hi``), which
    are plane-position-invariant — Y-face rows sit at the same LOCAL row
    in every sub-call — and the "pre-exchange" inputs are the Y-extended
    (but X-unexchanged) arrays, so the interior sweep depends only on the
    Y ghost-row permutes while the X plane permutes (and the 2-hop corner
    relay riding them) overlap with it.
    """
    ykw = ykw or {}
    from .pallas.structured_stencil import (
        apply_keff_fused_pallas_padded,
        stream_pad_extra,
    )

    owner_hi = nx // x_local
    f_hi = nx - owner_hi * x_local  # static local plane of the +X face

    # interior: input is the raw local slab (ghost-free)
    x_int = x_loc
    bc_int = bc_i8
    n_int = x_local - 2
    hi_int = f_hi - 1 if 1 <= f_hi <= x_local - 2 else -1
    xlo_i = jnp.int32(-1)  # the global -X face is local plane 0 (boundary)
    xhi_i = jnp.where(idx == owner_hi, hi_int, -1)
    extra = stream_pad_extra(n_int)
    if extra:
        x_int = jnp.pad(x_int, ((0, 0), (0, extra), (0, 0), (0, 0)))
        bc_int = jnp.pad(
            bc_int, ((0, 0), (0, extra), (0, 0), (0, 0)), constant_values=1
        )
    out_int = apply_keff_fused_pallas_padded(
        x_int, bc_int, m8, ss, mf, tables, ny, nz, xlo_i, xhi_i,
        x_planes=n_int, interpret=interpret, **ykw,
    )

    # boundary plane 0: [ghost_lo, p0, p1]
    xlo_b0 = jnp.where(idx == 0, 0, -1)
    xhi_b0 = jnp.where(idx == owner_hi, 0 if f_hi == 0 else -1, -1)
    out_b0 = apply_keff_fused_pallas_padded(
        x_pad[:, 0:3], bc_pad[:, 0:3], m8, ss, mf, tables, ny, nz,
        xlo_b0, xhi_b0, x_planes=1, interpret=interpret, **ykw,
    )
    # boundary plane x_local-1: [p_{n-2}, p_{n-1}, ghost_hi]
    xlo_b1 = jnp.int32(-1)  # x_local >= 4, so plane 0 is never here
    xhi_b1 = jnp.where(
        idx == owner_hi, 0 if f_hi == x_local - 1 else -1, -1
    )
    out_b1 = apply_keff_fused_pallas_padded(
        x_pad[:, x_local - 1 : x_local + 2],
        bc_pad[:, x_local - 1 : x_local + 2],
        m8, ss, mf, tables, ny, nz, xlo_b1, xhi_b1, x_planes=1,
        interpret=interpret, **ykw,
    )
    return jnp.concatenate([out_b0, out_int, out_b1], axis=1)


def _exchange_ghost_planes(x_loc, bc_i8, axis_name: str, n_shards: int):
    """One raw x plane + one int8 constraint plane to/from each X neighbor.

    ppermute zero-fills shards that receive nothing, so the global-end
    ghosts read as (x=0, bc=free) — a zero free plane contributes zero
    stencil taps, identical to the single-chip zero/constrained padding.
    """
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]
    gx_lo = jax.lax.ppermute(x_loc[:, -1:], axis_name, fwd)
    gx_hi = jax.lax.ppermute(x_loc[:, :1], axis_name, bwd)
    gb_lo = jax.lax.ppermute(bc_i8[:, -1:], axis_name, fwd)
    gb_hi = jax.lax.ppermute(bc_i8[:, :1], axis_name, bwd)
    x_pad = jnp.concatenate([gx_lo, x_loc, gx_hi], axis=1)
    bc_pad = jnp.concatenate([gb_lo, bc_i8, gb_hi], axis=1)
    return x_pad, bc_pad


def _local_keff(
    x_loc, bc_loc, mass_loc, m8, ss, mf, *,
    axis_name, n_shards, x_local, nx, ny, nz, tables,
    use_kernel, interpret, large,
):
    """Shard-local K_eff on one ghost-padded X-slab."""
    interior, faces, edges, corners = tables
    idx = jax.lax.axis_index(axis_name)
    bc_i8 = bc_loc.astype(jnp.int8)
    x_pad, bc_pad = _exchange_ghost_planes(x_loc, bc_i8, axis_name, n_shards)
    xs_pad = jnp.where(bc_pad.astype(bool), 0.0, x_pad)  # sanitized

    if use_kernel:
        from .pallas.structured_stencil import (
            apply_keff_fused_pallas_padded,
            stream_pad_extra,
        )

        if _overlap_enabled() and x_local >= 4:
            # halo/compute overlap: the interior planes never read the
            # exchanged ghosts, so splitting them into their own kernel
            # call removes the data dependency between the ppermutes and
            # the bulk of the stencil — XLA's latency-hiding scheduler can
            # then run the ghost exchange concurrently with the interior
            # kernel, leaving only the two single-plane boundary calls on
            # the collective's critical path (ADR-28).
            return _local_keff_overlap(
                x_loc, bc_i8, x_pad, bc_pad, m8, ss, mf, tables, ny, nz,
                idx=idx, x_local=x_local, nx=nx, interpret=interpret,
            )

        # the kernel IS the complete operator (interior + every boundary
        # correction + mass + identity rows).  The two global X faces are
        # identified by LOCAL plane index on their owning shard and -1
        # (never matches a grid step) elsewhere; Y/Z face strips are
        # handled in-kernel on every shard, their X-direction taps reading
        # the exchanged ghost planes.
        owner_hi = nx // x_local
        x_lo = jnp.where(idx == 0, 0, -1)
        x_hi = jnp.where(idx == owner_hi, nx - owner_hi * x_local, -1)
        extra = stream_pad_extra(x_local)
        if extra:
            x_pad = jnp.pad(x_pad, ((0, 0), (0, extra), (0, 0), (0, 0)))
            bc_pad = jnp.pad(
                bc_pad, ((0, 0), (0, extra), (0, 0), (0, 0)),
                constant_values=1,
            )
        return apply_keff_fused_pallas_padded(
            x_pad, bc_pad, m8, ss, mf, tables, ny, nz, x_lo, x_hi,
            x_planes=x_local, interpret=interpret,
        )

    if large:
        inter = _interior_flat(xs_pad, interior, x_prepadded=True)
    else:
        inter = _apply_taps(xs_pad, interior, prepad_axis=0)
    xs_loc = xs_pad[:, 1:-1]
    out = ss * inter + (mf * mass_loc)[None] * xs_loc

    # --- boundary corrections (all slabs own a strip of the Y/Z faces) ---
    for axis in (1, 2):
        hi_pos = ny if axis == 1 else nz
        for side in (0, 1):
            pos = 0 if side == 0 else hi_pos
            if axis == 1:
                plane = xs_pad[:, :, pos, :]  # (3, Xl+2, Z)
            else:
                plane = xs_pad[:, :, :, pos]  # (3, Xl+2, Y)
            corr = _apply_taps(plane, faces[(axis, side)], prepad_axis=0)
            # edges assigned to their lower-axis face (only (1,*,2,*) land
            # on Y faces; Z faces fold nothing) — pinned on Z, free along
            # the prepadded X
            if axis == 1:
                for (a1, s1, a2, s2), etaps in edges.items():
                    if a1 != axis or s1 != side:
                        continue
                    pinned = 0 if s2 == 0 else nz
                    mask = _onehot(plane.shape[2], pinned)[None, None, :]
                    corr = corr - mask * _apply_taps_axis(
                        plane, etaps, 0, prepadded=True
                    )
            sl = [slice(None)] * 4
            sl[1 + axis] = pos
            sl = tuple(sl)
            out = out.at[sl].add(-ss * corr)

    # --- X faces: one global plane each, applied on the owning shard ---
    for side in (0, 1):
        gplane = 0 if side == 0 else nx
        owner = gplane // x_local
        lp = gplane - owner * x_local
        plane = xs_pad[:, lp + 1]  # (3, Y, Z); garbage off-owner, masked out
        corr = _apply_taps(plane, faces[(0, side)])
        for (a1, s1, a2, s2), etaps in edges.items():
            if a1 != 0 or s1 != side:
                continue
            rem = [1, 2]
            pos = rem.index(a2)
            pinned = 0 if s2 == 0 else (ny if a2 == 1 else nz)
            d1, d2 = plane.shape[1], plane.shape[2]
            mask = (
                _onehot(d1, pinned)[None, :, None]
                if pos == 0
                else _onehot(d2, pinned)[None, None, :]
            )
            corr = corr - mask * _apply_taps_axis(plane, etaps, 1 - pos)
        for (sx, sy, sz), ctaps in corners.items():
            if sx != side:
                continue
            mask = (
                _onehot(plane.shape[1], 0 if sy == 0 else ny)[None, :, None]
                * _onehot(plane.shape[2], 0 if sz == 0 else nz)[None, None, :]
            )
            corr = corr + mask * _matvec_const(plane, ctaps)
        corr = corr * jnp.where(idx == owner, 1.0, 0.0)
        out = out.at[:, lp].add(-ss * corr)

    return jnp.where(bc_loc, x_loc, out)


# ---------------------------------------------------------------------------
# 2-D (X, Y) slab decomposition
# ---------------------------------------------------------------------------


def _apply_keff_2d(
    model: "StructuredModel", x: jax.Array, stiffness_scale, mass_factor
) -> jax.Array:
    """K_eff * x over a 2-D (X, Y) device mesh: shard_map + 4 ppermutes.

    Halo protocol (per matvec, per array): exchange one ghost ROW per Y
    neighbor first, then one ghost PLANE of the Y-extended array per X
    neighbor — the X planes then carry the four corner values from the
    diagonal neighbors through two ICI hops (the standard 2-hop diagonal
    trick; no separate corner sends).  Global-end ghosts read ppermute's
    zero fill = (x=0, free), a zero free ghost contributes zero taps —
    identical to the single-chip implicit zero padding.

    Per shard, the SAME fused Pallas slab kernel runs in ghost-Y mode
    (``y_rows``/``oy_lo``/``oy_hi`` — see ``_make_fused_body``): the two
    global Y faces sit at STATIC local plane rows (a uniform decomposition
    puts them at the same row on every shard) and traced 0/1 ownership
    scalars switch the face/edge/corner work off on non-owning shards.
    The two global X faces keep the 1-D path's traced-index mechanism.

    Grids too small for the kernel floors fall back to the GSPMD-
    partitioned XLA stencil (shifted slices become implicit halo
    exchanges) — correct at every size, slower only where slabs are tiny.
    """
    import dataclasses

    mesh = model.shard_mesh
    ax, ay = model.shard_axis, model.shard_axis_y
    npx, npy = int(mesh.shape[ax]), int(mesh.shape[ay])
    x_total = model.nx + 1 + model.pad_planes
    y_total = model.ny + 1 + model.pad_rows
    assert x_total % npx == 0, "X extent must divide the shard mesh"
    assert y_total % npy == 0, "Y extent must divide the shard mesh"
    x_local, y_local = x_total // npx, y_total // npy
    tables = _stencil_tables(model.spacing, model.lam0, model.mu0)

    # NO local-node floor here, unlike the 1-D path: the 2-D mesh's whole
    # regime is pod scale, where local tiles are small by construction
    # (~109k nodes at the 150^3-on-32-chips north star) and the only
    # alternative is the GSPMD-partitioned stencil, whose implicit halo
    # lowering issues an order of magnitude more collectives per matvec
    # than the explicit 4-permute protocol.  The plane floor stays: Mosaic
    # lowering of very thin (y_local+2, nz+1) planes is unproven on
    # hardware (the 1-D path's XLA local form has no 2-D counterpart).
    plane_lanes = (y_local + 2) * (model.nz + 1)
    use_kernel = x.dtype == jnp.float32 and (
        model.pallas_interpret
        or (
            model.use_pallas
            and jax.default_backend() == "tpu"
            and plane_lanes >= _KERNEL_MIN_PLANE
        )
    )
    if use_kernel:
        from .pallas.structured_stencil import plane_fits

        use_kernel = plane_fits(y_local + 2, model.nz + 1)
    if not use_kernel:
        # GSPMD fallback: the flat XLA stencil partitions under the input
        # shardings without manual collectives (round-1 behavior)
        from .structured import _apply_keff_structured_base

        solo = dataclasses.replace(
            model, shard_mesh=None, shard_axis_y=None, use_pallas=False
        )
        return _apply_keff_structured_base(
            solo, x, stiffness_scale, mass_factor
        )

    from .pallas.structured_stencil import _interior_mass

    def local_fn(x_loc, bc_loc, m8, ss, mf):
        return _local_keff_2d(
            x_loc, bc_loc, m8, ss, mf,
            ax=ax, ay=ay, npx=npx, npy=npy,
            x_local=x_local, y_local=y_local,
            nx=model.nx, ny=model.ny, nz=model.nz,
            tables=tables, interpret=model.pallas_interpret,
        )

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, ax, ay), P(None, ax, ay), P(), P(), P()),
        out_specs=P(None, ax, ay),
        check_vma=False,
    )
    return sharded(
        x,
        model.bc_mask,
        _interior_mass(model),
        jnp.asarray(stiffness_scale, jnp.float32),
        jnp.asarray(mass_factor, jnp.float32),
    )


def _exchange_ghosts_2d(x_loc, bc_i8, ax, ay, npx, npy):
    """Ghost rows along Y, then ghost planes (Y-extended) along X.

    Also returns the Y-extended-only intermediates: the overlap split's
    interior sweep consumes them directly, so it depends on the 2 Y
    row-permutes but NOT on the 2 X plane-permutes (ADR-28 on 2-D).
    """
    fwd_y = [(i, i + 1) for i in range(npy - 1)]
    bwd_y = [(i + 1, i) for i in range(npy - 1)]

    def gy(a, sl, pairs):
        return jax.lax.ppermute(a[:, :, sl], ay, pairs)

    x_y = jnp.concatenate(
        [gy(x_loc, slice(-1, None), fwd_y), x_loc,
         gy(x_loc, slice(None, 1), bwd_y)], axis=2)
    b_y = jnp.concatenate(
        [gy(bc_i8, slice(-1, None), fwd_y), bc_i8,
         gy(bc_i8, slice(None, 1), bwd_y)], axis=2)
    fwd_x = [(i, i + 1) for i in range(npx - 1)]
    bwd_x = [(i + 1, i) for i in range(npx - 1)]

    def gx(a, sl, pairs):
        return jax.lax.ppermute(a[:, sl], ax, pairs)

    x_pad = jnp.concatenate(
        [gx(x_y, slice(-1, None), fwd_x), x_y,
         gx(x_y, slice(None, 1), bwd_x)], axis=1)
    bc_pad = jnp.concatenate(
        [gx(b_y, slice(-1, None), fwd_x), b_y,
         gx(b_y, slice(None, 1), bwd_x)], axis=1)
    return x_pad, bc_pad, x_y, b_y


def _local_keff_2d(
    x_loc, bc_loc, m8, ss, mf, *,
    ax, ay, npx, npy, x_local, y_local, nx, ny, nz, tables, interpret,
):
    """Shard-local K_eff on one ghost-padded (X, Y) tile (kernel only)."""
    from .pallas.structured_stencil import (
        apply_keff_fused_pallas_padded,
        stream_pad_extra,
    )

    ix = jax.lax.axis_index(ax)
    iy = jax.lax.axis_index(ay)
    bc_i8 = bc_loc.astype(jnp.int8)
    x_pad, bc_pad, x_y, b_y = _exchange_ghosts_2d(
        x_loc, bc_i8, ax, ay, npx, npy
    )

    # global Y faces: STATIC local plane rows + traced 0/1 ownership
    owner_y = ny // y_local
    rhi = ny - owner_y * y_local + 1  # +1: plane rows include the ghost
    ykw = dict(
        y_rows=(1, rhi),
        oy_lo=jnp.where(iy == 0, 1.0, 0.0).astype(jnp.float32),
        oy_hi=jnp.where(iy == owner_y, 1.0, 0.0).astype(jnp.float32),
    )

    if _overlap_enabled() and x_local >= 4:
        # halo/compute overlap (ADR-28, 2-D form): the interior planes
        # read only the Y-extended pre-X-exchange tile, so the 2 X plane
        # permutes (the larger of the 4 sends, and the ones carrying the
        # 2-hop corner relay) run concurrently with the interior sweep;
        # only the two single-plane boundary calls wait on them.
        return _local_keff_overlap(
            x_y, b_y, x_pad, bc_pad, m8, ss, mf, tables, ny, nz,
            idx=ix, x_local=x_local, nx=nx, interpret=interpret, ykw=ykw,
        )

    # global X faces: local output-plane index on the owner, -1 elsewhere
    owner_x = nx // x_local
    x_lo = jnp.where(ix == 0, 0, -1)
    x_hi = jnp.where(ix == owner_x, nx - owner_x * x_local, -1)
    extra = stream_pad_extra(x_local)
    if extra:
        x_pad = jnp.pad(x_pad, ((0, 0), (0, extra), (0, 0), (0, 0)))
        bc_pad = jnp.pad(
            bc_pad, ((0, 0), (0, extra), (0, 0), (0, 0)), constant_values=1
        )
    return apply_keff_fused_pallas_padded(
        x_pad, bc_pad, m8, ss, mf, tables, ny, nz, x_lo, x_hi,
        x_planes=x_local, interpret=interpret, **ykw,
    )
