"""Structured-grid fast path: uniform hex8 grids without gathers.

For an axis-aligned box of (nx, ny, nz) uniform hex cells, every element
shares ONE constant Gauss gradient table, connectivity is implicit, and the
EBE matvec becomes a 27-point stencil:

* the per-element nodal gather = 8 shifted views of the (X, Y, Z, 3) node
  grid (zero-cost slices — no gather op, no connectivity table in HBM);
* the scatter-back = 8 shifted adds;
* HBM traffic per matvec drops from ~300 MB of topology + gradients to just
  the node vectors (~a few MB), turning the operator compute-bound.

This is the production fast path for the regular meshes in the north-star
configs (cantilever/plate/basin); arbitrary Gmsh meshes take the general
:class:`~civiwave_tpu.mesh.pack.PackedModel` path.  Both expose the same
operator protocol (``apply_keff`` / ``assemble_node_blocks`` + the node
tables the solver reads), so PCG/Newmark code is shared.

The math is bit-identical in structure to the unstructured hex path
(2x2x2 Gauss, same stress form); equivalence is pinned by tests against
PackedModel on the same box.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.materials import ElasticProperties
from .preprocess import hex_gradients

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

    Node grid is (X, Y, Z) = (nx+1, ny+1, nz+1), flattened x-major to N
    rows — the same ordering as :func:`civiwave_tpu.utils.synthetic.box_mesh`.
    """

    # constant element tables (uniform spacing)
    grads: jax.Array  # (8gp, 8l, 3) f32
    gp_vol: jax.Array  # (8gp,) f32 — detJ per Gauss point
    # per-element material fields
    lam_grid: jax.Array  # (nx, ny, nz) f32
    mu_grid: jax.Array  # (nx, ny, nz) f32
    # per node (flattened grid order)
    lumped_mass: jax.Array  # (N, ) f32
    bc_mask: jax.Array  # (N, 3) bool
    bc_value: jax.Array  # (N, 3) f32
    position0: jax.Array  # (N, 3) f32
    # static metadata
    nx: int = field(metadata=dict(static=True), default=0)
    ny: int = field(metadata=dict(static=True), default=0)
    nz: int = field(metadata=dict(static=True), default=0)
    node_count: int = field(metadata=dict(static=True), default=0)
    padded_node_count: int = field(metadata=dict(static=True), default=0)
    # node planes along +X beyond nx+1: dead (fully constrained, massless)
    # padding so X divides a device mesh evenly
    pad_planes: int = field(metadata=dict(static=True), default=0)

    @property
    def grid_shape(self) -> Tuple[int, int, int]:
        return (self.nx + 1 + self.pad_planes, self.ny + 1, self.nz + 1)

    @property
    def dof_count(self) -> int:
        return self.node_count * 3

    @property
    def element_count(self) -> int:
        return self.nx * self.ny * self.nz

    # --- operator protocol -------------------------------------------------
    def apply_keff(self, x, stiffness_scale, mass_factor):
        from ..ops import structured as _ops

        return _ops.apply_keff_structured(self, x, stiffness_scale, mass_factor)

    def assemble_node_blocks(self, stiffness_scale, mass_factor):
        from ..ops import structured as _ops

        return _ops.assemble_node_blocks_structured(
            self, stiffness_scale, mass_factor
        )


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
):
    """Build the structured cantilever-style model + initial force.

    ``fixed_axis_planes``/``traction_plane``: "x0"/"x1"/"y0"/... meaning the
    min/max plane normal to that axis.  Per-element material overrides come
    via ``lam_grid``/``mu_grid``.  ``pad_x_multiple`` appends dead node
    planes along +X until (nx+1+pad) is a multiple — use the device-mesh
    size so GSPMD shards the grid into even X-slabs (halo exchanges of the
    shifted stencil slices become neighbor collective-permutes over ICI).

    Returns (model, external_force (N,3) f32 jnp array).
    """
    xs, ys, zs = nx + 1, ny + 1, nz + 1
    pad_planes = (-xs) % max(pad_x_multiple, 1)
    xs_pad = xs + pad_planes
    n = xs_pad * ys * zs
    hx, hy, hz = spacing

    # constant Gauss tables from one reference element
    corner_pos = np.array(CORNERS, dtype=np.float64) * np.array([hx, hy, hz])
    grads, gp_vol = hex_gradients(corner_pos[None])
    grads = grads[0].astype(np.float32)  # (8gp, 8l, 3)
    gp_vol = gp_vol[0].astype(np.float32)  # (8,)

    if lam_grid is None:
        lam_grid = np.full((nx, ny, nz), material.lame.lam, dtype=np.float32)
    if mu_grid is None:
        mu_grid = np.full((nx, ny, nz), material.lame.mu, dtype=np.float32)

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

    def plane_slice(tag):
        axis = {"x": 0, "y": 1, "z": 2}[tag[0]]
        # the +X physical boundary is plane xs-1, NOT the padded end
        if tag[1] == "0":
            index = 0
        else:
            index = (xs - 1) if axis == 0 else -1
        sl = [slice(None)] * 3
        sl[axis] = index
        return tuple(sl)

    for tag in fixed_axis_planes:
        bc_grid[plane_slice(tag)] = True
    bc_grid[xs:] = True  # dead padding
    bc_mask = bc_grid.reshape(n, 3)
    bc_value = np.zeros((n, 3), dtype=np.float32)

    # external force: gravity + uniform traction on the loaded plane (equal
    # nodal shares of face area, matching loads.cpp:104-149 for quads)
    force_grid = mass_grid[..., None] * np.asarray(gravity, dtype=np.float64)
    axis = {"x": 0, "y": 1, "z": 2}[traction_plane[0]]
    face_dims = [d for d in range(3) if d != axis]
    cell_counts = (nx, ny, nz)
    spacings = (hx, hy, hz)
    face_area = spacings[face_dims[0]] * spacings[face_dims[1]]
    # each face quad contributes area/4 to its 4 corner nodes
    share = np.zeros([cell_counts[d] + 1 for d in face_dims])
    quad = np.full([cell_counts[d] for d in face_dims], face_area / 4.0)
    for da in (0, 1):
        for db in (0, 1):
            share[
                da : da + cell_counts[face_dims[0]],
                db : db + cell_counts[face_dims[1]],
            ] += quad
    traction_vec = np.asarray(traction, dtype=np.float64)
    sl = plane_slice(traction_plane)
    force_grid[sl] = force_grid[sl] + share[..., None] * traction_vec

    model = StructuredModel(
        grads=jnp.asarray(grads),
        gp_vol=jnp.asarray(gp_vol),
        lam_grid=jnp.asarray(lam_grid, dtype=jnp.float32),
        mu_grid=jnp.asarray(mu_grid, dtype=jnp.float32),
        lumped_mass=jnp.asarray(mass_grid.reshape(n).astype(np.float32)),
        bc_mask=jnp.asarray(bc_mask),
        bc_value=jnp.asarray(bc_value),
        position0=jnp.asarray(position0),
        nx=nx,
        ny=ny,
        nz=nz,
        # pad planes sit at the end of the x-major flat order, so the real
        # nodes stay a contiguous prefix
        node_count=xs * ys * zs,
        padded_node_count=n,
        pad_planes=pad_planes,
    )
    force = jnp.asarray(force_grid.reshape(n, 3).astype(np.float32))
    return model, force
