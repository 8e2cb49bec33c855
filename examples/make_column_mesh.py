"""Generate examples/column.msh — the BASELINE config #3 fixture.

A 4x4x16-cell tet column (6-tet decomposition per cell) with TWO physical
volumes — stiff ROCK_LOWER (z < 8) under soft SOIL_UPPER (z >= 8) — plus
FIXED_BASE quads at z=0 and TOP_FACE quads at z=16, written as Gmsh 4.1
ASCII (the format contract of mesh/gmsh.py; no $Entities section, so
entity tags double as physical ids — the parser's documented fallback,
mesh/gmsh.py:318).

Node numbering is deliberately SHUFFLED (seed 3) so the example also
exercises the pack-time RCM renumbering (mesh/renumber.py, ADR-32) the
way real Gmsh output does.

Run ``python examples/make_column_mesh.py`` to regenerate.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from civiwave_tpu.utils.synthetic import box_mesh, shuffle_mesh_nodes  # noqa: E402

NX, NY, NZ = 4, 4, 16
SPACING = 0.5  # metres per cell -> a 2 m x 2 m x 8 m column
SPLIT_Z = 8  # cells below this z-layer are ROCK_LOWER


def main() -> None:
    mesh = shuffle_mesh_nodes(
        box_mesh(NX, NY, NZ, hex_elements=False, spacing=SPACING), seed=3
    )
    n = mesh.node_count

    # tets come 6 per cell in cell order; cell k-index = cell // 1 ... the
    # box builder orders cells x-major (ii, jj, kk meshgrid 'ij'), so the
    # cell's kk = cell_index % NZ
    cell_of_tet = np.arange(len(mesh.elements)) // 6
    kk = cell_of_tet % NZ
    lower = kk < SPLIT_Z

    # boundary quads: base at z=0, top at z=NZ (by node positions)
    def plane_quads(zval: float) -> np.ndarray:
        quads = []
        pos = mesh.node_positions
        # reuse the x=0/x=NX quads? No — emit fresh z-plane quads
        ii, jj = np.meshgrid(np.arange(NX), np.arange(NY), indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        # map (i, j, k) -> node id via position lookup
        key = {}
        grid = np.round(pos / SPACING).astype(np.int64)
        for idx, (gx, gy, gz) in enumerate(grid):
            key[(int(gx), int(gy), int(gz))] = idx
        k = int(round(zval / SPACING))
        for a, b in zip(ii, jj):
            quads.append(
                [
                    key[(a, b, k)],
                    key[(a + 1, b, k)],
                    key[(a + 1, b + 1, k)],
                    key[(a, b + 1, k)],
                ]
            )
        return np.asarray(quads, dtype=np.int64)

    base_quads = plane_quads(0.0)
    top_quads = plane_quads(NZ * SPACING)

    lines = []
    w = lines.append
    w("$MeshFormat")
    w("4.1 0 8")
    w("$EndMeshFormat")
    w("$PhysicalNames")
    w("4")
    w('2 1 "FIXED_BASE"')
    w('2 2 "TOP_FACE"')
    w('3 3 "ROCK_LOWER"')
    w('3 4 "SOIL_UPPER"')
    w("$EndPhysicalNames")

    # one node block under entity (3, 3); tags are 1-based ids in file order
    w("$Nodes")
    w(f"1 {n} 1 {n}")
    w(f"3 3 0 {n}")
    for i in range(n):
        w(str(i + 1))
    for p in mesh.node_positions:
        w(f"{p[0]:.17g} {p[1]:.17g} {p[2]:.17g}")
    w("$EndNodes")

    # element blocks: (2,1) base quads, (2,2) top quads, (3,3)/(3,4) tets
    tet_lower = mesh.elements[lower][:, :4] + 1
    tet_upper = mesh.elements[~lower][:, :4] + 1
    total = len(base_quads) + len(top_quads) + len(tet_lower) + len(tet_upper)
    w("$Elements")
    w(f"4 {total} 1 {total}")
    tag = 1

    def block(dim: int, ent: int, etype: int, rows: np.ndarray) -> None:
        nonlocal tag
        w(f"{dim} {ent} {etype} {len(rows)}")
        for r in rows:
            w(" ".join(str(v) for v in ([tag] + list(r))))
            tag += 1

    block(2, 1, 3, base_quads + 1)  # type 3 = quad4
    block(2, 2, 3, top_quads + 1)
    block(3, 3, 4, tet_lower)  # type 4 = tet4
    block(3, 4, 4, tet_upper)
    w("$EndElements")

    out = os.path.join(os.path.dirname(__file__), "column.msh")
    with open(out, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(
        f"wrote {out}: {n} nodes, {len(tet_lower)}+{len(tet_upper)} tets, "
        f"{len(base_quads)}+{len(top_quads)} quads"
    )


if __name__ == "__main__":
    main()
