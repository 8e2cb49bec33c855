"""Device-side derived fields + O(1) probe sampling for structured grids.

The host derived-field path (post/derived.py, rebuilding derived_fields.cpp:
139-211) materializes per-quadrature-row tensors — 132M rows at 50M DOF.
On the uniform grid the same math collapses: every Gauss point carries the
equal volume V/8, so the row-volume-weighted element average equals the
strain of the MEAN gradient table, and the node average becomes a uniform
average over incident cells (a corner scatter, the same pattern as mass
assembly).  Everything runs jitted on device in CSG layout; the host sees
converted (E, 6)/(N, 6) rows only on VTU frames.

Probe logging per frame must not pull full fields at 50M DOF: probes are
static node indices, so ``probe_samples`` slices a 3x3x3 displacement
window per probe on device (plus the u/v/a rows) and the host evaluates
the <=8 incident-cell strains from the window — O(1) per frame at any
grid size, numerically identical to the full-field path.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.structured import CORNERS, StructuredModel
from ..ops.structured import _element_tables
from .derived import DerivedFieldSet


@lru_cache(maxsize=32)
def _mean_grads(spacing: Tuple[float, float, float]) -> np.ndarray:
    """Volume-weighted mean Gauss gradient table (8 corners, 3), such that
    the element's volume-averaged strain is the strain of this table."""
    grads, gp_vol = _element_tables(spacing)
    return np.einsum("g,gla->la", gp_vol, grads) / gp_vol.sum()


def _strain_from_views(views, mg: np.ndarray):
    """Voigt strain (engineering shear) per cell from 8 corner views of u.

    views[l] is (3, nx, ny, nz); returns a list of 6 (nx, ny, nz) arrays
    [xx, yy, zz, xy, yz, xz] matching derived_fields.cpp:166-188.
    """
    g = [[None] * 3 for _ in range(3)]  # g[a][b] = du_b/dx_a
    for a in range(3):
        for b in range(3):
            acc = None
            for l in range(8):
                w = float(mg[l, a])
                if w == 0.0:
                    continue
                term = np.float32(w) * views[l][b]
                acc = term if acc is None else acc + term
            g[a][b] = acc if acc is not None else jnp.zeros_like(views[0][0])
    return [
        g[0][0], g[1][1], g[2][2],
        g[1][0] + g[0][1], g[2][1] + g[1][2], g[2][0] + g[0][2],
    ]


def _stress_from_strain(strain6, lam, mu):
    """Isotropic sigma = D . eps with engineering shear (materials.hpp:
    124-134): normal = lam*tr + 2mu*eps, shear = mu*gamma."""
    tr = strain6[0] + strain6[1] + strain6[2]
    return [
        lam * tr + 2.0 * mu * strain6[0],
        lam * tr + 2.0 * mu * strain6[1],
        lam * tr + 2.0 * mu * strain6[2],
        mu * strain6[3],
        mu * strain6[4],
        mu * strain6[5],
    ]


def _von_mises6(s):
    energy = 0.5 * (
        (s[0] - s[1]) ** 2 + (s[1] - s[2]) ** 2 + (s[2] - s[0]) ** 2
    ) + 3.0 * (s[3] ** 2 + s[4] ** 2 + s[5] ** 2)
    return jnp.sqrt(jnp.maximum(energy, 0.0))


@jax.jit
def compute_structured_derived(model: StructuredModel, u_csg: jax.Array):
    """Element + node derived fields on device.

    Returns (elem_strain, elem_stress, elem_vm, node_strain, node_stress,
    node_vm) — element grids are (6, nx, ny, nz)/(nx, ny, nz), node grids
    (6, X, Y, Z)/(X, Y, Z) in CSG layout, f32.
    """
    nx, ny, nz = model.nx, model.ny, model.nz
    mg = _mean_grads(model.spacing)
    views = [
        u_csg[:, di : di + nx, dj : dj + ny, dk : dk + nz]
        for (di, dj, dk) in CORNERS
    ]
    strain6 = _strain_from_views(views, mg)
    stress6 = _stress_from_strain(strain6, model.lam_cells, model.mu_cells)
    elem_strain = jnp.stack(strain6)
    elem_stress = jnp.stack(stress6)
    elem_vm = _von_mises6(stress6)

    # node average = uniform mean over incident cells (equal cell volumes)
    grid_shape = model.grid_shape
    acc_strain = jnp.zeros((6,) + grid_shape, jnp.float32)
    acc_stress = jnp.zeros((6,) + grid_shape, jnp.float32)
    count = jnp.zeros(grid_shape, jnp.float32)
    for (di, dj, dk) in CORNERS:
        sl = (slice(None), slice(di, di + nx), slice(dj, dj + ny),
              slice(dk, dk + nz))
        acc_strain = acc_strain.at[sl].add(elem_strain)
        acc_stress = acc_stress.at[sl].add(elem_stress)
        count = count.at[sl[1:]].add(1.0)
    safe = jnp.maximum(count, 1.0)
    node_strain = acc_strain / safe
    node_stress = acc_stress / safe
    node_vm = _von_mises6([node_stress[i] for i in range(6)])
    return elem_strain, elem_stress, elem_vm, node_strain, node_stress, node_vm


def derived_to_host(model: StructuredModel, device_fields) -> DerivedFieldSet:
    """Convert the device grids to the host (E, 6)/(N, 6) row layout used
    by the VTU writer and probe logger (x-major element/node order)."""
    elem_strain, elem_stress, elem_vm, node_strain, node_stress, node_vm = (
        device_fields
    )
    n = model.node_count

    def elem_rows(a):
        return np.asarray(a).transpose(1, 2, 3, 0).reshape(-1, 6)

    def node_rows(a):
        return np.asarray(a).transpose(1, 2, 3, 0).reshape(-1, 6)[:n]

    return DerivedFieldSet(
        element_strain=elem_rows(elem_strain).astype(np.float32),
        element_stress=elem_rows(elem_stress).astype(np.float32),
        element_von_mises=np.asarray(elem_vm).reshape(-1).astype(np.float32),
        node_strain=node_rows(node_strain).astype(np.float32),
        node_stress=node_rows(node_stress).astype(np.float32),
        node_von_mises=np.asarray(node_vm)
        .reshape(-1)[:n]
        .astype(np.float32),
    )


# ---------------------------------------------------------------------------
# O(1) probe sampling
# ---------------------------------------------------------------------------


def _probe_coords(model: StructuredModel, probe: int) -> Tuple[int, int, int]:
    ys, zs = model.ny + 1, model.nz + 1
    return probe // (ys * zs), (probe // zs) % ys, probe % zs


@partial(jax.jit, static_argnums=(2,))
def probe_samples(model: StructuredModel, state, probes: Tuple[int, ...]):
    """Device slice per probe: (u, v, a) rows + the 3x3x3 displacement
    window around the probe node (clipped at domain edges — the host
    reconstructs incident cells from the static coordinates)."""
    xs = model.nx + 1
    ys, zs = model.ny + 1, model.nz + 1
    rows = []
    windows = []
    for p in probes:
        i, j, k = _probe_coords(model, p)
        kin = [
            field[:, i, j, k]
            for field in (state.displacement, state.velocity,
                          state.acceleration)
        ]
        rows.append(jnp.stack(kin))  # (3 kin, 3 comp)
        lo = (max(i - 1, 0), max(j - 1, 0), max(k - 1, 0))
        hi = (min(i + 2, xs), min(j + 2, ys), min(k + 2, zs))
        windows.append(
            state.displacement[:, lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
        )
    return jnp.stack(rows), tuple(windows)


def probe_derived_host(
    model: StructuredModel, probes: Sequence[int], windows
) -> List[Tuple[np.ndarray, np.ndarray, float]]:
    """(strain6, stress6, von_mises) per probe from its displacement
    window — the same incident-cell mean the full node average computes."""
    mg = _mean_grads(model.spacing)
    lam_grid = np.asarray(model.lam_cells)
    mu_grid = np.asarray(model.mu_cells)
    nx, ny, nz = model.nx, model.ny, model.nz
    xs, ys, zs = nx + 1, ny + 1, nz + 1
    out = []
    for p, w in zip(probes, windows):
        i, j, k = _probe_coords(model, p)
        lo = (max(i - 1, 0), max(j - 1, 0), max(k - 1, 0))
        w = np.asarray(w, np.float64)  # (3, wx, wy, wz)
        strain_sum = np.zeros(6)
        stress_sum = np.zeros(6)
        n_cells = 0
        for ci in (i - 1, i):
            for cj in (j - 1, j):
                for ck in (k - 1, k):
                    if not (0 <= ci < nx and 0 <= cj < ny and 0 <= ck < nz):
                        continue
                    oi, oj, ok = ci - lo[0], cj - lo[1], ck - lo[2]
                    g = np.zeros((3, 3))
                    for l, (di, dj, dk) in enumerate(CORNERS):
                        ul = w[:, oi + di, oj + dj, ok + dk]
                        g += np.outer(mg[l], ul)  # g[a, b] = du_b/dx_a
                    strain = np.array([
                        g[0, 0], g[1, 1], g[2, 2],
                        g[1, 0] + g[0, 1], g[2, 1] + g[1, 2],
                        g[2, 0] + g[0, 2],
                    ])
                    lam = float(lam_grid[ci, cj, ck])
                    mu = float(mu_grid[ci, cj, ck])
                    tr = strain[:3].sum()
                    stress = np.concatenate([
                        lam * tr + 2.0 * mu * strain[:3],
                        mu * strain[3:],
                    ])
                    strain_sum += strain
                    stress_sum += stress
                    n_cells += 1
        inv = 1.0 / max(n_cells, 1)
        strain_avg = strain_sum * inv
        stress_avg = stress_sum * inv
        s = stress_avg
        vm = float(np.sqrt(max(
            0.5 * ((s[0] - s[1]) ** 2 + (s[1] - s[2]) ** 2
                   + (s[2] - s[0]) ** 2)
            + 3.0 * (s[3] ** 2 + s[4] ** 2 + s[5] ** 2), 0.0,
        )))
        out.append((
            strain_avg.astype(np.float32), stress_avg.astype(np.float32), vm
        ))
    return out
