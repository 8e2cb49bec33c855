"""Shared test fixtures: programmatic configs + synthetic meshes.

Plays the role of the reference's tests/support/config_builder.hpp — a
toggleable scenario generator feeding the *real* parser — plus in-code
synthetic meshes like pcg_test.cpp:35-75 builds.
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import numpy as np

from civiwave_tpu.config.loader import parse_config_node
from civiwave_tpu.config.schema import Config
from civiwave_tpu.mesh.model import Mesh, PhysicalGroup, SENTINEL

BASE_CONFIG: Dict[str, Any] = {
    "mesh": {"path": "tests/data/cantilever.msh"},
    "materials": [
        {"name": "concrete", "E": 3.0e10, "nu": 0.2, "rho": 2500.0},
    ],
    "assignments": [{"group": "SOLID", "material": "concrete"}],
    "damping": {"xi": 0.02, "w1": 10.0, "w2": 100.0},
    "time": {"dt": 0.01, "adaptive": True, "min_dt": 0.005, "max_dt": 0.02},
    "solver": {
        "type": "pcg",
        "preconditioner": "block_jacobi",
        "tol_runtime": 2.0e-4,
        "tol_pause": 1.0e-5,
        "max_iters": 120,
    },
    "precision": {"vectors": "fp32", "reductions": "fp64"},
    "curves": {"load_curve1": [[0.0, 0.0], [0.5, 0.75], [1.0, 1.0]]},
    "loads": {
        "gravity": [0.0, 0.0, -9.81],
        "tractions": [
            {"group": "LOAD_FACE", "value": [0.0, 0.0, -1.0e5], "scale_curve": "load_curve1"}
        ],
    },
    "dirichlet": {"fixes": [{"group": "FIXED_BASE", "dof": ["x", "y", "z"]}]},
    "output": {"vtu_stride": 10, "probes": [1, 2]},
}


def make_config_dict(**section_overrides: Any) -> Dict[str, Any]:
    """Deep-copy the base config and replace whole sections."""
    cfg = copy.deepcopy(BASE_CONFIG)
    cfg.update(section_overrides)
    return cfg


def make_config(**section_overrides: Any) -> Config:
    return parse_config_node(make_config_dict(**section_overrides))


def single_tet_mesh() -> Mesh:
    """Unit tetrahedron with FIXED (tri 0-1-2), LOAD_FACE (tri 1-2-3),
    SOLID volume group, and a POINT_LOAD node group on node 3 — the same
    synthetic fixture physics_test.cpp:48-102 hand-builds."""
    mesh = Mesh()
    mesh.node_positions = np.array(
        [
            [0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    mesh.node_original_ids = np.arange(1, 5, dtype=np.int64)

    mesh.elements = np.array(
        [[0, 1, 2, 3, SENTINEL, SENTINEL, SENTINEL, SENTINEL]], dtype=np.int32
    )
    mesh.element_node_counts = np.array([4], dtype=np.int32)
    mesh.element_physical_group = np.array([12], dtype=np.int64)
    mesh.element_original_ids = np.array([200], dtype=np.int64)

    mesh.surfaces = np.array(
        [[0, 1, 2, SENTINEL], [1, 2, 3, SENTINEL]], dtype=np.int32
    )
    mesh.surface_node_counts = np.array([3, 3], dtype=np.int32)
    mesh.surface_physical_group = np.array([10, 11], dtype=np.int64)
    mesh.surface_original_ids = np.array([100, 101], dtype=np.int64)

    mesh.physical_groups = [
        PhysicalGroup(2, 10, "FIXED"),
        PhysicalGroup(2, 11, "LOAD_FACE"),
        PhysicalGroup(3, 12, "SOLID"),
        PhysicalGroup(0, 13, "POINT_LOAD"),
    ]
    mesh.group_lookup = {10: 0, 11: 1, 12: 2, 13: 3}
    mesh.surface_groups = {
        10: np.array([0], dtype=np.int64),
        11: np.array([1], dtype=np.int64),
    }
    mesh.node_groups = {13: np.array([3], dtype=np.int64)}
    return mesh


def tet_config(**overrides: Any) -> Config:
    """Config matching single_tet_mesh group names (physics_test.cpp:119-159)."""
    base = make_config_dict(
        materials=[{"name": "test_material", "E": 7.0e10, "nu": 0.25, "rho": 1000.0}],
        assignments=[{"group": "SOLID", "material": "test_material"}],
        damping={"xi": 0.02, "w1": 5.0, "w2": 50.0},
        time={"dt": 0.01, "adaptive": False, "min_dt": 0.005, "max_dt": 0.02},
        solver={
            "type": "pcg",
            "preconditioner": "block_jacobi",
            "tol_runtime": 1.0e-8,
            "tol_pause": 1.0e-9,
            "max_iters": 128,
        },
        curves={},
        loads={"gravity": [0.0, 0.0, 0.0]},
        dirichlet={"fixes": [{"group": "FIXED", "dof": ["x", "y", "z"]}]},
        output={"vtu_stride": 10, "probes": []},
    )
    base.update(overrides)
    return parse_config_node(base)


def bar_mesh(nx: int = 4, ny: int = 1, nz: int = 1, hex_elements: bool = False) -> Mesh:
    """Structured bar of nx*ny*nz cells on [0,nx]x[0,ny]x[0,nz].

    hex_elements=False splits each cell into 6 tets.  Physical groups:
    FIXED (x=0 face, tri/quad surfaces), LOAD_FACE (x=nx face), SOLID.
    """
    xs, ys, zs = nx + 1, ny + 1, nz + 1
    grid = np.stack(
        np.meshgrid(np.arange(xs), np.arange(ys), np.arange(zs), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)

    def nid(i, j, k):
        return (i * ys + j) * zs + k

    mesh = Mesh()
    mesh.node_positions = grid.astype(np.float64)
    mesh.node_original_ids = np.arange(1, len(grid) + 1, dtype=np.int64)

    cells = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                v = [
                    nid(i, j, k),
                    nid(i + 1, j, k),
                    nid(i + 1, j + 1, k),
                    nid(i, j + 1, k),
                    nid(i, j, k + 1),
                    nid(i + 1, j, k + 1),
                    nid(i + 1, j + 1, k + 1),
                    nid(i, j + 1, k + 1),
                ]
                cells.append(v)
    cells = np.array(cells, dtype=np.int64)

    if hex_elements:
        conn = np.full((len(cells), 8), SENTINEL, dtype=np.int32)
        conn[:, :8] = cells
        counts = np.full(len(cells), 8, dtype=np.int32)
    else:
        # 6-tet decomposition of each hex (consistent diagonal)
        tet_corners = [
            (0, 1, 2, 6),
            (0, 2, 3, 6),
            (0, 3, 7, 6),
            (0, 7, 4, 6),
            (0, 4, 5, 6),
            (0, 5, 1, 6),
        ]
        tets = []
        for v in cells:
            for a, b, c, d in tet_corners:
                tets.append([v[a], v[b], v[c], v[d]])
        tets = np.array(tets, dtype=np.int64)
        conn = np.full((len(tets), 8), SENTINEL, dtype=np.int32)
        conn[:, :4] = tets
        counts = np.full(len(tets), 4, dtype=np.int32)

    mesh.elements = conn
    mesh.element_node_counts = counts
    mesh.element_physical_group = np.full(len(conn), 3, dtype=np.int64)
    mesh.element_original_ids = np.arange(1, len(conn) + 1, dtype=np.int64)

    # boundary faces at x=0 (FIXED, group 1) and x=nx (LOAD_FACE, group 2)
    surfaces = []
    surf_groups = []
    for j in range(ny):
        for k in range(nz):
            quad0 = [nid(0, j, k), nid(0, j + 1, k), nid(0, j + 1, k + 1), nid(0, j, k + 1)]
            quadn = [
                nid(nx, j, k),
                nid(nx, j + 1, k),
                nid(nx, j + 1, k + 1),
                nid(nx, j, k + 1),
            ]
            surfaces += [quad0, quadn]
            surf_groups += [1, 2]
    surfaces = np.array(surfaces, dtype=np.int32)
    mesh.surfaces = surfaces
    mesh.surface_node_counts = np.full(len(surfaces), 4, dtype=np.int32)
    mesh.surface_physical_group = np.array(surf_groups, dtype=np.int64)
    mesh.surface_original_ids = np.arange(1, len(surfaces) + 1, dtype=np.int64)

    mesh.physical_groups = [
        PhysicalGroup(2, 1, "FIXED"),
        PhysicalGroup(2, 2, "LOAD_FACE"),
        PhysicalGroup(3, 3, "SOLID"),
    ]
    mesh.group_lookup = {1: 0, 2: 1, 3: 2}
    groups: Dict[int, list] = {1: [], 2: []}
    for idx, g in enumerate(surf_groups):
        groups[g].append(idx)
    mesh.surface_groups = {
        g: np.array(v, dtype=np.int64) for g, v in groups.items()
    }
    mesh.node_groups = {}
    return mesh


def bar_config(**overrides: Any) -> Config:
    base = make_config_dict(
        materials=[{"name": "steel", "E": 2.0e11, "nu": 0.3, "rho": 7800.0}],
        assignments=[{"group": "SOLID", "material": "steel"}],
        damping={"xi": 0.02, "w1": 10.0, "w2": 100.0},
        time={"dt": 0.001, "adaptive": False, "min_dt": 0.0005, "max_dt": 0.002},
        solver={
            "type": "pcg",
            "preconditioner": "block_jacobi",
            "tol_runtime": 1.0e-6,
            "tol_pause": 1.0e-8,
            "max_iters": 400,
        },
        curves={},
        loads={
            "gravity": [0.0, 0.0, 0.0],
            "tractions": [{"group": "LOAD_FACE", "value": [0.0, 0.0, -1.0e6]}],
        },
        dirichlet={"fixes": [{"group": "FIXED", "dof": ["x", "y", "z"]}]},
        output={"vtu_stride": 1, "probes": [0]},
    )
    base.update(overrides)
    return parse_config_node(base)
