"""Structured-grid fast path: uniform hex8 grids without gathers.

For an axis-aligned box of (nx, ny, nz) uniform hex cells, every element
shares ONE constant Gauss gradient table and connectivity is implicit, so
the EBE matvec becomes a 27-point stencil on the node grid (see
``ops/structured.py`` for the operator forms).

**Layout (performance-critical, measured on TPU v5e).**  Solver vectors for
this model are *component-separated grids* (CSG): ``(3, X, Y, Z)`` float32,
with Z as the minor dimension.  The naive ``(N, 3)`` nodal layout wastes
~42x of every vector register on lane padding (3 of 128 lanes) and measured
4x slower on the stencil matvec; component-separated rank-4 grids tile
cleanly onto (8, 128) vregs.  The solver stack is layout-agnostic — models
own their vector layout through the operator protocol below — and
``to_nodal``/``from_nodal`` convert at the (cheap, per-frame) edges.

This is the production fast path for the regular meshes in the north-star
configs (cantilever/plate/basin); arbitrary Gmsh meshes take the general
:class:`~civiwave_tpu.mesh.pack.PackedModel` path.  Both expose the same
operator protocol, so PCG/Newmark code is shared.

The math is identical in structure to the unstructured hex path (2x2x2
Gauss, same stress form, pcg.cpp:561-662 in the reference); equivalence is
pinned by tests against PackedModel on the same box.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.materials import ElasticProperties

# corner offsets in Gmsh hex ordering (matches synthetic.box_mesh and
# preprocess._HEX_XI)
CORNERS = (
    (0, 0, 0),
    (1, 0, 0),
    (1, 1, 0),
    (0, 1, 0),
    (0, 0, 1),
    (1, 0, 1),
    (1, 1, 1),
    (0, 1, 1),
)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class StructuredModel:
    """Uniform hex grid model implementing the solver operator protocol.

    Node grid is (X, Y, Z) = (nx+1+pad, ny+1, nz+1); solver vectors are
    component-separated ``(3, X, Y, Z)`` f32 (see module docstring).  The
    nodal order for ``to_nodal``/``from_nodal`` is x-major flattening — the
    same ordering as :func:`civiwave_tpu.utils.synthetic.box_mesh`.
    """

    # per-element material fields, padded along X to the node extent so
    # X-slab sharding divides them evenly (dead tail cells are never read
    # — consume through lam_cells/mu_cells)
    lam_grid: jax.Array  # (X, ny, nz) f32
    mu_grid: jax.Array  # (X, ny, nz) f32
    # node-grid fields (CSG layout)
    mass_grid: jax.Array  # (X, Y, Z) f32
    bc_mask: jax.Array  # (3, X, Y, Z) bool
    bc_value: jax.Array  # (3, X, Y, Z) f32
    position0: jax.Array  # (N, 3) f32 — host-facing nodal coordinates
    # static metadata
    nx: int = field(metadata=dict(static=True), default=0)
    ny: int = field(metadata=dict(static=True), default=0)
    nz: int = field(metadata=dict(static=True), default=0)
    node_count: int = field(metadata=dict(static=True), default=0)
    padded_node_count: int = field(metadata=dict(static=True), default=0)
    # node planes along +X beyond nx+1: dead (fully constrained, massless)
    # padding so X divides a device mesh evenly
    pad_planes: int = field(metadata=dict(static=True), default=0)
    # node rows along +Y beyond ny+1: dead padding so Y divides the second
    # axis of a 2-D (X, Y) device mesh evenly
    pad_rows: int = field(metadata=dict(static=True), default=0)
    # uniform cell spacing — the ops derive the constant Gauss tables from
    # this (concrete numpy values are required to bake stencil constants)
    spacing: Tuple[float, float, float] = field(
        metadata=dict(static=True), default=(1.0, 1.0, 1.0)
    )
    # homogeneous-material flag selects the constant-stencil operator
    homogeneous: bool = field(metadata=dict(static=True), default=True)
    lam0: float = field(metadata=dict(static=True), default=0.0)
    mu0: float = field(metadata=dict(static=True), default=0.0)
    # Pallas slab kernel for the interior stencil: used on TPU for LARGE
    # grids, where VMEM-resident planes beat the XLA windows 2x (50M DOF:
    # 7.9 ms vs 15.5).  Small grids stay on the fused XLA stencil (the
    # kernel is per-op-overhead-bound on tiny planes).
    use_pallas: bool = field(metadata=dict(static=True), default=True)
    # X-slab decomposition over a device mesh: when set, apply_keff runs
    # the explicit shard_map + ppermute halo-exchange operator (the fused
    # Pallas kernel per shard — a pallas_call cannot partition under plain
    # GSPMD).  Set by parallel.sharding.shard_structured.
    shard_mesh: Optional[object] = field(metadata=dict(static=True), default=None)
    shard_axis: str = field(metadata=dict(static=True), default="shard")
    # second mesh axis of a 2-D (X, Y) slab decomposition (None => 1-D)
    shard_axis_y: Optional[str] = field(
        metadata=dict(static=True), default=None
    )
    # force the Pallas kernels through the interpreter (CPU tests exercise
    # the exact sharded-kernel code path without TPU hardware)
    pallas_interpret: bool = field(metadata=dict(static=True), default=False)
    # geometric multigrid hierarchy (ops/multigrid.py): coarse levels are
    # themselves StructuredModels (pytree children), attached by
    # attach_multigrid when the YAML asks for solver.preconditioner:
    # multigrid; empty tuple means plain block-Jacobi (the reference's
    # only preconditioner, pcg.cpp:479-503)
    mg_levels: Tuple["StructuredModel", ...] = ()
    mg_omegas: Tuple[float, ...] = field(metadata=dict(static=True), default=())
    preconditioner: str = field(
        metadata=dict(static=True), default="block_jacobi"
    )
    # Lysmer-Kuhlemeyer absorbing axis planes (physics/absorbing.py;
    # extension — the reference has none): face tags "x0".."z1" receiving
    # viscous dashpots with per-unit-area normal/tangential impedances
    # rho*c_p / rho*c_s (homogeneous material).  damp_factor is the
    # Newmark a1 scalar the stepper injects per step (K_eff += a1 C).
    absorb_faces: Tuple[str, ...] = field(
        metadata=dict(static=True), default=()
    )
    rho_cp: float = field(metadata=dict(static=True), default=0.0)
    rho_cs: float = field(metadata=dict(static=True), default=0.0)
    damp_factor: Optional[jax.Array] = None

    @property
    def lam_cells(self) -> jax.Array:
        """(nx, ny, nz) live-cell view of the X/Y-padded material grid."""
        return self.lam_grid[: self.nx, : self.ny]

    @property
    def mu_cells(self) -> jax.Array:
        return self.mu_grid[: self.nx, : self.ny]

    @property
    def grid_shape(self) -> Tuple[int, int, int]:
        return (
            self.nx + 1 + self.pad_planes,
            self.ny + 1 + self.pad_rows,
            self.nz + 1,
        )

    @property
    def dof_count(self) -> int:
        return self.node_count * 3

    @property
    def element_count(self) -> int:
        return self.nx * self.ny * self.nz

    # --- operator protocol -------------------------------------------------
    @property
    def vector_shape(self) -> Tuple[int, ...]:
        return (3, *self.grid_shape)

    @property
    def mass_b(self) -> jax.Array:
        """Lumped mass broadcastable against solver vectors."""
        return self.mass_grid[None]

    def zero_state(self):
        from .pack import SimState

        z = jnp.zeros(self.vector_shape, jnp.float32)
        return SimState(z, z, z, z)

    def to_nodal(self, vector: jax.Array) -> jax.Array:
        """CSG vector -> (node_count, 3) nodal rows (x-major order)."""
        if self.pad_rows:  # dead Y rows interleave in x-major flat order
            vector = vector[:, :, : self.ny + 1, :]
        flat = jnp.transpose(vector, (1, 2, 3, 0)).reshape(-1, 3)
        return flat[: self.node_count]

    def from_nodal(self, rows) -> jax.Array:
        """(node_count, 3) nodal rows -> CSG vector (pad planes zeroed)."""
        rows = jnp.asarray(rows, jnp.float32)[: self.node_count]
        real = (self.nx + 1 + self.pad_planes, self.ny + 1, self.nz + 1)
        total = int(np.prod(real))
        flat = jnp.zeros((total, 3), jnp.float32).at[: self.node_count].set(rows)
        grid = jnp.transpose(flat.reshape(*real, 3), (3, 0, 1, 2))
        if self.pad_rows:
            grid = jnp.pad(grid, ((0, 0), (0, 0), (0, self.pad_rows), (0, 0)))
        return grid

    def apply_keff(self, x, stiffness_scale, mass_factor):
        from ..ops import structured as _ops

        return _ops.apply_keff_structured(self, x, stiffness_scale, mass_factor)

    def assemble_node_blocks(self, stiffness_scale, mass_factor):
        from ..ops import structured as _ops

        return _ops.assemble_node_blocks_structured(
            self, stiffness_scale, mass_factor
        )

    def build_preconditioner(self, stiffness_scale, mass_factor):
        from ..ops import structured as _ops

        if self.preconditioner == "multigrid" and self.mg_levels:
            from ..ops import multigrid as _mg

            return _mg.build_mg_preconditioner(
                self, stiffness_scale, mass_factor
            )
        if self.homogeneous:
            # class-table compact form: identical values, no per-node
            # table stream in the PCG loop (the 402 MB/iteration read at
            # 50.3M DOF becomes 27 blocks expanded in-register; on TPU a
            # one-pass Pallas kernel applies them)
            return _ops.build_compact_block_jacobi(
                self, stiffness_scale, mass_factor
            )
        return _ops.build_block_jacobi_inverse_structured(
            self, stiffness_scale, mass_factor
        )

    def absorbing_force(self, v: jax.Array) -> jax.Array:
        """C v from the Lysmer-Kuhlemeyer face dashpots, bc-masked (zero
        array when the model has no absorbing faces) — the Newmark RHS
        damping-force contribution."""
        from ..ops import structured as _ops

        return _ops.absorbing_force_structured(self, v)

    def prefers_fused_pcg(self, block_inverse, vector_dtype) -> bool:
        """'auto' variant probe: with the in-kernel dot partials the
        Chronopoulos-Gear loop beats classic at EVERY size the pc+matvec
        kernel engages (v5e ms/iter fused/classic: 2.65M DOF 1.12/1.15,
        50.3M 7.18/7.98 — ADR-22 addendum), so the kernel eligibility IS
        the crossover."""
        from ..ops import structured as _ops

        if self.preconditioner == "multigrid" and self.mg_levels:
            return False
        return _ops.pc_keff_kernel_eligible(
            self, block_inverse, vector_dtype
        )

    def build_fused_pcg_iteration(self, block_inverse, stiffness_scale,
                                  mass_factor, reduction_dtype,
                                  vector_dtype):
        """Whole-iteration PCG kernel bundle for the large-grid TPU path
        (None when ineligible — see ops.structured)."""
        from ..ops import structured as _ops

        if self.preconditioner == "multigrid" and self.mg_levels:
            return None
        return _ops.build_fused_pcg_iteration(
            self, block_inverse, stiffness_scale, mass_factor,
            reduction_dtype, vector_dtype,
        )

    def apply_pc_keff(self, block_inverse, residual, stiffness_scale,
                      mass_factor):
        """(u, w) = (M^-1 r, K_eff u) — fused into one Pallas pass on the
        large-grid TPU path (see ops.structured.apply_pc_keff_structured);
        composition everywhere else."""
        from ..ops import structured as _ops

        if self.preconditioner == "multigrid" and self.mg_levels:
            u = self.apply_preconditioner(block_inverse, residual)
            return u, self.apply_keff(u, stiffness_scale, mass_factor)
        return _ops.apply_pc_keff_structured(
            self, block_inverse, residual, stiffness_scale, mass_factor
        )

    def apply_pc_keff_dots(self, block_inverse, residual, stiffness_scale,
                           mass_factor, reduction_dtype):
        """(u, w, (gamma, delta, rr)) with the three iteration dots emitted
        as row partials from the same kernel pass, or None when ineligible
        (the PCG loop composes apply_pc_keff + fused_dots instead)."""
        from ..ops import structured as _ops

        if self.preconditioner == "multigrid" and self.mg_levels:
            return None
        return _ops.apply_pc_keff_dots_structured(
            self, block_inverse, residual, stiffness_scale, mass_factor,
            reduction_dtype,
        )

    def apply_preconditioner(self, block_inverse, residual):
        from ..ops import structured as _ops

        if self.preconditioner == "multigrid" and self.mg_levels:
            from ..ops import multigrid as _mg

            return _mg.apply_mg_preconditioner(self, block_inverse, residual)
        if isinstance(block_inverse, _ops.CompactBlockJacobi):
            return _ops.apply_compact_preconditioner_structured(
                self, block_inverse, residual
            )
        return _ops.apply_preconditioner_structured(
            self, block_inverse, residual
        )


def _box_plane_slice(tag: str, xs: int, axis_extents: Tuple[int, int, int]):
    """Grid slice for an axis plane tag "x0"/"x1"/"y0"/...; the +X physical
    boundary is plane xs-1 (NOT the padded end)."""
    axis = {"x": 0, "y": 1, "z": 2}[tag[0]]
    if tag[1] == "0":
        index = 0
    else:
        index = (xs - 1) if axis == 0 else axis_extents[axis] - 1
    sl = [slice(None)] * 3
    sl[axis] = index
    return axis, tuple(sl)


def _face_share(
    plane_tag: str,
    cell_counts: Tuple[int, int, int],
    spacings: Tuple[float, float, float],
) -> Tuple[int, np.ndarray]:
    """Equal nodal shares of face area on an axis plane (each boundary quad
    contributes area/4 to its 4 corner nodes, loads.cpp:104-149)."""
    axis = {"x": 0, "y": 1, "z": 2}[plane_tag[0]]
    face_dims = [d for d in range(3) if d != axis]
    face_area = spacings[face_dims[0]] * spacings[face_dims[1]]
    share = np.zeros([cell_counts[d] + 1 for d in face_dims])
    quad = np.full([cell_counts[d] for d in face_dims], face_area / 4.0)
    for da in (0, 1):
        for db in (0, 1):
            share[
                da : da + cell_counts[face_dims[0]],
                db : db + cell_counts[face_dims[1]],
            ] += quad
    return axis, share


def traction_force_grid(
    model: StructuredModel, plane_tag: str, value: Tuple[float, float, float]
) -> np.ndarray:
    """One traction's nodal force contribution in CSG layout (3, X, Y, Z)."""
    counts = (model.nx, model.ny, model.nz)
    _, share = _face_share(plane_tag, counts, model.spacing)
    grid = np.zeros(model.grid_shape + (3,))
    _, sl = _box_plane_slice(
        plane_tag, model.nx + 1,
        (model.nx + 1, model.ny + 1, model.nz + 1),
    )
    grid[sl] = share[..., None] * np.asarray(value, np.float64)
    return grid.transpose(3, 0, 1, 2).astype(np.float32)


@lru_cache(maxsize=32)
def _device_grids_fn(
    nx: int,
    ny: int,
    nz: int,
    xs_pad: int,
    ys_pad: int,
    cell_ys: int,
    fixes_static: Tuple[Tuple[str, Tuple[bool, bool, bool]], ...],
    traction_plane: str,
):
    """Jitted on-device builder for every node-grid array of the
    homogeneous structured model (ADR-31).

    The numpy path materializes ~1 GB of host arrays at the 255^3
    flagship (masses, masks, positions, force) that are all ANALYTIC:
    each is a per-axis cell-adjacency count product (values in {0,1,2},
    exact powers of two) scaled by one f64 scalar.  Building them in one
    jitted program keeps host->device traffic at a handful of scalars —
    on the axon relay (0.1-2 MB/s) that converts a multi-minute model
    upload into one ~seconds compile.  All arithmetic runs in f64 and
    casts to the storage dtype at the end, exactly like the numpy path;
    power-of-two adjacency scalings commute with rounding, so the
    results are bit-identical (pinned by
    tests/test_structured.py::test_device_build_matches_numpy).
    """
    xs, ys, zs = nx + 1, ny + 1, nz + 1
    slices = tuple(
        _box_plane_slice(tag, xs, (xs, ys, zs))[1]
        for tag, _ in fixes_static
    )
    t_axis, _ = _box_plane_slice(traction_plane, xs, (xs, ys, zs))
    t_index = 0 if traction_plane[1] == "0" else (
        xs - 1 if t_axis == 0 else (ys, zs)[t_axis - 1] - 1
    )

    def build(hx, hy, hz, cm, cmg, a4t, fixvals, lam_v, mu_v):
        f64 = jnp.float64
        ix = jnp.arange(xs_pad)[:, None, None]
        iy = jnp.arange(ys_pad)[None, :, None]
        iz = jnp.arange(zs)[None, None, :]

        def adj(i, ncells):  # cells adjacent to node plane i along an axis
            return (
                ((i >= 1) & (i <= ncells)).astype(f64)
                + (i <= ncells - 1).astype(f64)
            )

        ax_, ay_, az_ = adj(ix, nx), adj(iy, ny), adj(iz, nz)
        counts = ax_ * ay_ * az_  # cells per node: 0 on pads, 8 interior
        mass = (cm * counts).astype(jnp.float32)

        # cell material grids: the material value on real cells, 0 on the
        # x/y pad tails (== numpy's zero np.pad)
        icx = jnp.arange(xs_pad)[:, None, None] < nx
        icy = jnp.arange(cell_ys)[None, :, None] < ny
        cell_real = (icx & icy).astype(jnp.float32)
        lam = lam_v * jnp.broadcast_to(cell_real, (xs_pad, cell_ys, nz))
        mu = mu_v * jnp.broadcast_to(cell_real, (xs_pad, cell_ys, nz))

        # Dirichlet planes (static slices), then dead-pad overrides — the
        # same order of operations as the numpy path
        bc = jnp.zeros((xs_pad, ys_pad, zs, 3), bool)
        vals = jnp.zeros((xs_pad, ys_pad, zs, 3), jnp.float32)
        for f, (sl, (_, constrain)) in enumerate(
            zip(slices, fixes_static)
        ):
            for a in range(3):
                if constrain[a]:
                    bc = bc.at[sl + (a,)].set(True)
                    vals = vals.at[sl + (a,)].set(fixvals[f, a])
        dead = (ix >= xs) | (iy >= ys)
        bc = bc | dead[..., None]
        vals = jnp.where(dead[..., None], 0.0, vals)

        # nodal positions continue the lattice across pads (no dead Y
        # rows in the host-facing flat order)
        px = (ix.astype(f64) * hx)
        py = (jnp.arange(ys)[None, :, None].astype(f64) * hy)
        pz = (iz.astype(f64) * hz)
        shape = (xs_pad, ys, zs)
        pos = jnp.stack(
            [jnp.broadcast_to(p, shape) for p in (px, py, pz)], axis=-1
        ).astype(jnp.float32).reshape(xs_pad * ys * zs, 3)

        # external force: gravity rides the mass counts; the traction
        # plane adds face-area shares (the face-dim adjacency product)
        face_adj = [ax_, ay_, az_]
        face_adj[t_axis] = (
            [ix, iy, iz][t_axis] == t_index
        ).astype(f64)
        force = counts[..., None] * cmg + (
            face_adj[0] * face_adj[1] * face_adj[2]
        )[..., None] * a4t
        force = jnp.transpose(force.astype(jnp.float32), (3, 0, 1, 2))

        return dict(
            lam=lam,
            mu=mu,
            mass=mass,
            bc=jnp.transpose(bc, (3, 0, 1, 2)),
            vals=jnp.transpose(vals, (3, 0, 1, 2)),
            pos=pos,
            force=force,
        )

    return jax.jit(build)


def build_structured_model(
    nx: int,
    ny: int,
    nz: int,
    material: ElasticProperties,
    density: float,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    fixed_axis_planes: Tuple[str, ...] = ("x0",),
    traction: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    traction_plane: str = "x1",
    gravity: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    lam_grid: Optional[np.ndarray] = None,
    mu_grid: Optional[np.ndarray] = None,
    pad_x_multiple: int = 1,
    pad_y_multiple: int = 1,
    fixes=None,
    absorb_planes: Tuple[str, ...] = (),
):
    """Build the structured cantilever-style model + initial force.

    ``fixed_axis_planes``/``traction_plane``: "x0"/"x1"/"y0"/... meaning the
    min/max plane normal to that axis.  ``fixes`` generalizes
    ``fixed_axis_planes`` to the reference's full Dirichlet contract
    (config.cpp:500-567): a sequence of ``(plane_tag, constrain_axis(3,),
    values(3,))`` with per-axis constraint flags and optional nonzero
    targets (None => 0).  Per-element material overrides come via
    ``lam_grid``/``mu_grid`` (a non-uniform grid selects the general
    corner-gather operator instead of the constant stencil).
    ``pad_x_multiple`` appends dead node planes along +X until (nx+1+pad) is
    a multiple — use the device-mesh size so the grid decomposes into even
    X-slabs (ops/structured_sharded.py exchanges one ghost plane per
    neighbor per matvec over ICI).  ``pad_y_multiple`` does the same along
    +Y for the second axis of a 2-D (X, Y) device mesh.

    Returns (model, external_force (3, X, Y, Z) f32 jnp array).
    """
    xs, ys, zs = nx + 1, ny + 1, nz + 1
    pad_planes = (-xs) % max(pad_x_multiple, 1)
    xs_pad = xs + pad_planes
    pad_rows = (-ys) % max(pad_y_multiple, 1)
    ys_pad = ys + pad_rows
    # host-facing flat node order has NO dead Y rows (to_nodal slices them
    # away before flattening), so position0/node prefixes stay X-pad-only
    n = xs_pad * ys * zs
    hx, hy, hz = spacing

    homogeneous = lam_grid is None and mu_grid is None
    if lam_grid is None:
        lam_grid = np.full((nx, ny, nz), material.lame.lam, dtype=np.float32)
    if mu_grid is None:
        mu_grid = np.full((nx, ny, nz), material.lame.mu, dtype=np.float32)
    lam_grid = np.asarray(lam_grid, np.float32)
    mu_grid = np.asarray(mu_grid, np.float32)
    if not homogeneous and (
        np.all(lam_grid == lam_grid.flat[0]) and np.all(mu_grid == mu_grid.flat[0])
    ):
        homogeneous = True
    lam0 = float(lam_grid.flat[0]) if homogeneous else 0.0
    mu0 = float(mu_grid.flat[0]) if homogeneous else 0.0
    if absorb_planes and not homogeneous:
        # the face-plane dashpot impedances rho*c_p / rho*c_s are derived
        # from the single material; a heterogeneous grid needs per-face
        # impedances the structured path does not carry — the general
        # gather path supports arbitrary-material absorbing faces
        raise ValueError(
            "absorbing faces on the structured path require a homogeneous "
            "material grid; use the general (Gmsh/packed) path for "
            "multi-material absorbing boundaries"
        )

    if fixes is None:
        fixes = [(tag, (True, True, True), (None, None, None))
                 for tag in fixed_axis_planes]

    # homogeneous grids build entirely ON DEVICE (ADR-31): every node-grid
    # array is an analytic adjacency-count product, so one jitted program
    # replaces ~1 GB of host->device transfer at the 255^3 flagship.
    # Bit-identical to the numpy path below (parity-tested);
    # CIVIWAVE_DEVICE_BUILD=0 forces the numpy reference path.
    if homogeneous and os.environ.get("CIVIWAVE_DEVICE_BUILD", "auto") != "0":
        cell_ys = ys_pad if pad_y_multiple > 1 else ny
        fixes_static = tuple(
            (tag, tuple(bool(c) for c in constrain))
            for tag, constrain, _ in fixes
        )
        fixvals = np.array(
            [
                [0.0 if v is None else float(v) for v in values]
                for _, _, values in fixes
            ],
            np.float32,
        ).reshape(len(fixes), 3)
        cell_volume = hx * hy * hz
        cm = density * cell_volume / 8.0
        t_axis = {"x": 0, "y": 1, "z": 2}[traction_plane[0]]
        fd = [d for d in range(3) if d != t_axis]
        face_area = spacing[fd[0]] * spacing[fd[1]]
        g = _device_grids_fn(
            nx, ny, nz, xs_pad, ys_pad, cell_ys, fixes_static,
            traction_plane,
        )(
            jnp.float64(hx),
            jnp.float64(hy),
            jnp.float64(hz),
            jnp.float64(cm),
            jnp.asarray(cm * np.asarray(gravity, np.float64)),
            jnp.asarray(
                (face_area / 4.0) * np.asarray(traction, np.float64)
            ),
            jnp.asarray(fixvals),
            jnp.float32(np.float32(lam0)),
            jnp.float32(np.float32(mu0)),
        )
        model = StructuredModel(
            lam_grid=g["lam"],
            mu_grid=g["mu"],
            mass_grid=g["mass"],
            bc_mask=g["bc"],
            bc_value=g["vals"],
            position0=g["pos"],
            nx=nx,
            ny=ny,
            nz=nz,
            node_count=xs * ys * zs,
            padded_node_count=n,
            pad_planes=pad_planes,
            pad_rows=pad_rows,
            spacing=(float(hx), float(hy), float(hz)),
            homogeneous=True,
            lam0=lam0,
            mu0=mu0,
            absorb_faces=tuple(absorb_planes),
            rho_cp=float(np.sqrt(density * (lam0 + 2.0 * mu0)))
            if absorb_planes else 0.0,
            rho_cs=float(np.sqrt(density * mu0)) if absorb_planes else 0.0,
        )
        return model, g["force"]

    # pad the cell grids along X to the padded NODE extent: X-slab
    # sharding (parallel/sharding.shard_structured) then divides the
    # material grids evenly across chips instead of replicating them
    # (round-2 VERDICT item 5).  The dead tail is never read — operators
    # consume the grids through lam_cells/mu_cells ([:nx] slices).
    cell_pad = xs_pad - nx
    if cell_pad:
        lam_grid = np.pad(lam_grid, ((0, cell_pad), (0, 0), (0, 0)))
        mu_grid = np.pad(mu_grid, ((0, cell_pad), (0, 0), (0, 0)))
    if pad_y_multiple > 1:
        # Y-pad cells to the padded NODE extent (2-D meshes only): a 2-D
        # device mesh shards cell grids P(x_axis, y_axis), so the Y cell
        # extent must divide npy even when the node rows already do
        # (ys_pad is a multiple of npy and ys_pad > ny always)
        cell_pad_y = ys_pad - ny
        lam_grid = np.pad(lam_grid, ((0, 0), (0, cell_pad_y), (0, 0)))
        mu_grid = np.pad(mu_grid, ((0, 0), (0, cell_pad_y), (0, 0)))

    # lumped mass: rho * V_cell / 8 scattered to the 8 corners (pad planes
    # carry no elements, hence no mass)
    cell_volume = hx * hy * hz
    cell_mass = np.full((nx, ny, nz), density * cell_volume / 8.0)
    mass_grid = np.zeros((xs_pad, ys, zs))
    for di, dj, dk in CORNERS:
        mass_grid[di : di + nx, dj : dj + ny, dk : dk + nz] += cell_mass

    # node positions (pad planes continue the lattice)
    gi, gj, gk = np.meshgrid(
        np.arange(xs_pad) * hx, np.arange(ys) * hy, np.arange(zs) * hz, indexing="ij"
    )
    position0 = np.stack([gi, gj, gk], axis=-1).reshape(n, 3).astype(np.float32)

    # boundary conditions on axis planes; dead pad planes fully constrained
    bc_grid = np.zeros((xs_pad, ys, zs, 3), dtype=bool)
    bc_values = np.zeros((xs_pad, ys, zs, 3), dtype=np.float32)
    if fixes is None:
        fixes = [(tag, (True, True, True), (None, None, None))
                 for tag in fixed_axis_planes]
    for tag, constrain, values in fixes:
        _, sl = _box_plane_slice(tag, xs, (xs, ys, zs))
        for a in range(3):
            if constrain[a]:
                bc_grid[sl + (a,)] = True
                bc_values[sl + (a,)] = (
                    0.0 if values[a] is None else float(values[a])
                )
    bc_grid[xs:] = True  # dead padding
    bc_values[xs:] = 0.0

    # external force: gravity + uniform traction on the loaded plane (equal
    # nodal shares of face area, matching loads.cpp:104-149 for quads)
    force_grid = mass_grid[..., None] * np.asarray(gravity, dtype=np.float64)
    _, share = _face_share(traction_plane, (nx, ny, nz), (hx, hy, hz))
    traction_vec = np.asarray(traction, dtype=np.float64)
    _, sl = _box_plane_slice(traction_plane, xs, (xs, ys, zs))
    # index through the REAL x-extent view: share spans unpadded node
    # extents, while force_grid's x axis is already X-padded — a y/z-plane
    # slice over the full grid would broadcast (xs_pad, .) against (xs, .)
    # (round-4 advisor finding; dead pad planes carry zero force anyway)
    fg_real = force_grid[:xs]
    fg_real[sl] = fg_real[sl] + share[..., None] * traction_vec

    if pad_rows:
        # dead +Y node rows: massless, fully constrained, zero force — the
        # exact analogue of the +X dead planes, so a 2-D (X, Y) device mesh
        # divides the grid evenly
        yp = ((0, 0), (0, pad_rows), (0, 0))
        mass_grid = np.pad(mass_grid, yp)
        force_grid = np.pad(force_grid, yp + ((0, 0),))
        bc_grid = np.pad(bc_grid, yp + ((0, 0),), constant_values=True)
        bc_values = np.pad(bc_values, yp + ((0, 0),))

    model = StructuredModel(
        lam_grid=jnp.asarray(lam_grid),
        mu_grid=jnp.asarray(mu_grid),
        mass_grid=jnp.asarray(mass_grid.astype(np.float32)),
        bc_mask=jnp.asarray(bc_grid.transpose(3, 0, 1, 2)),
        bc_value=jnp.asarray(bc_values.transpose(3, 0, 1, 2)),
        position0=jnp.asarray(position0),
        nx=nx,
        ny=ny,
        nz=nz,
        # pad planes sit at the end of the x-major flat order, so the real
        # nodes stay a contiguous prefix
        node_count=xs * ys * zs,
        padded_node_count=n,
        pad_planes=pad_planes,
        pad_rows=pad_rows,
        spacing=(float(hx), float(hy), float(hz)),
        homogeneous=homogeneous,
        lam0=lam0,
        mu0=mu0,
        absorb_faces=tuple(absorb_planes),
        # per-unit-area Lysmer-Kuhlemeyer impedances (exact for the
        # homogeneous grid the structured path requires)
        rho_cp=float(np.sqrt(density * (lam0 + 2.0 * mu0)))
        if absorb_planes else 0.0,
        rho_cs=float(np.sqrt(density * mu0)) if absorb_planes else 0.0,
    )
    force = jnp.asarray(
        force_grid.transpose(3, 0, 1, 2).astype(np.float32)
    )
    return model, force
