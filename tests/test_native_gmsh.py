"""Native (C++) vs pure-Python Gmsh parser equivalence."""

import io

import numpy as np
import pytest

from civiwave_tpu.mesh import native
from civiwave_tpu.mesh.gmsh import load_gmsh_from_string
from civiwave_tpu.utils.errors import MeshError
from civiwave_tpu.utils.synthetic import box_mesh

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native parser unavailable (no g++)"
)


def _mesh_to_gmsh_text(mesh) -> str:
    """Serialize a synthetic mesh to Gmsh 4.1 ASCII (one node block)."""
    out = io.StringIO()
    out.write("$MeshFormat\n4.1 0 8\n$EndMeshFormat\n")
    out.write("$PhysicalNames\n3\n")
    out.write('2 1 "FIXED"\n2 2 "LOAD_FACE"\n3 3 "SOLID"\n$EndPhysicalNames\n')
    n = mesh.node_count
    out.write(f"$Nodes\n1 {n} 1 {n}\n")
    out.write(f"3 1 0 {n}\n")
    for i in range(n):
        out.write(f"{i + 1}\n")
    for pos in mesh.node_positions:
        out.write(f"{pos[0]} {pos[1]} {pos[2]}\n")
    out.write("$EndNodes\n")

    e = mesh.element_count
    s = len(mesh.surfaces)
    out.write(f"$Elements\n3 {e + s} 1 {e + s}\n")
    # surfaces split by group
    for group, etag_base in ((1, 0), (2, 0)):
        members = np.nonzero(mesh.surface_physical_group == group)[0]
        out.write(f"2 {group} 3 {len(members)}\n")
        for idx in members:
            nodes = " ".join(str(v + 1) for v in mesh.surfaces[idx, :4])
            out.write(f"{idx + 1} {nodes}\n")
    gmsh_type = 5 if mesh.element_node_counts[0] == 8 else 4
    out.write(f"3 3 {gmsh_type} {e}\n")
    for idx in range(e):
        count = mesh.element_node_counts[idx]
        nodes = " ".join(str(v + 1) for v in mesh.elements[idx, :count])
        out.write(f"{s + idx + 1} {nodes}\n")
    out.write("$EndElements\n")
    return out.getvalue()


@pytest.mark.parametrize("hex_elements", [False, True])
def test_native_matches_python(hex_elements):
    mesh = box_mesh(3, 2, 2, hex_elements=hex_elements)
    text = _mesh_to_gmsh_text(mesh)
    via_python = load_gmsh_from_string(text, use_native=False)
    via_native = load_gmsh_from_string(text, use_native=True)

    np.testing.assert_array_equal(
        via_native.node_positions, via_python.node_positions
    )
    np.testing.assert_array_equal(via_native.elements, via_python.elements)
    np.testing.assert_array_equal(via_native.surfaces, via_python.surfaces)
    np.testing.assert_array_equal(
        via_native.element_physical_group, via_python.element_physical_group
    )
    assert set(via_native.surface_groups) == set(via_python.surface_groups)
    for gid in via_native.surface_groups:
        np.testing.assert_array_equal(
            via_native.surface_groups[gid], via_python.surface_groups[gid]
        )
    assert [g.name for g in via_native.physical_groups] == [
        g.name for g in via_python.physical_groups
    ]


def test_native_error_messages_match():
    bad_nodes = """$Nodes
1 2 1 2
3 1 0 1
1
0 0 0
$EndNodes
$Elements
0 0 0 0
$EndElements
"""
    for use_native in (False, True):
        with pytest.raises(MeshError, match="node count mismatch"):
            load_gmsh_from_string(bad_nodes, use_native=use_native)

    bad_type = """$Nodes
1 1 1 1
3 1 0 1
1
0 0 0
$EndNodes
$Elements
1 1 1 1
3 1 7 1
1 1 1 1 1
$EndElements
"""
    for use_native in (False, True):
        with pytest.raises(MeshError, match="unsupported Gmsh element type 7"):
            load_gmsh_from_string(bad_type, use_native=use_native)


def test_native_is_faster_on_large_mesh():
    import time

    mesh = box_mesh(20, 20, 20, hex_elements=True)  # 9k nodes, 8k hexes
    text = _mesh_to_gmsh_text(mesh)

    t0 = time.perf_counter()
    load_gmsh_from_string(text, use_native=False)
    python_time = time.perf_counter() - t0

    t0 = time.perf_counter()
    load_gmsh_from_string(text, use_native=True)
    native_time = time.perf_counter() - t0

    # the native path must not be slower; typically it is 10-50x faster
    assert native_time < python_time * 1.5
