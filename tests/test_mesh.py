"""Gmsh 4.1 parser tests.

Mirrors /root/reference/tests/mesh_loader_test.cpp: golden cantilever fixture
parse (nodes, groups, lookup) plus malformed-mesh error paths built from
inline Gmsh strings.
"""

import os

import numpy as np
import pytest

from civiwave_tpu.mesh.gmsh import load_gmsh_file, load_gmsh_from_string
from civiwave_tpu.utils.errors import MeshError


def test_cantilever_fixture(data_dir):
    mesh = load_gmsh_file(os.path.join(data_dir, "cantilever.msh"))
    assert mesh.node_count == 4
    np.testing.assert_allclose(
        mesh.node_positions,
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
    )
    assert mesh.element_count == 1
    np.testing.assert_array_equal(mesh.elements[0, :4], [0, 1, 2, 3])
    assert mesh.element_node_counts[0] == 4
    assert mesh.element_physical_group[0] == 3

    assert len(mesh.surfaces) == 2
    np.testing.assert_array_equal(mesh.surfaces[0, :3], [0, 1, 2])
    np.testing.assert_array_equal(mesh.surfaces[1, :3], [1, 2, 3])

    names = {g.name: g for g in mesh.physical_groups}
    assert set(names) >= {"FIXED_BASE", "LOAD_FACE", "SOLID"}
    assert names["FIXED_BASE"].dimension == 2
    assert names["SOLID"].dimension == 3

    assert set(mesh.surface_groups) == {1, 2}
    np.testing.assert_array_equal(mesh.surface_groups[1], [0])
    np.testing.assert_array_equal(mesh.surface_groups[2], [1])

    lookup = mesh.group_name_to_id()
    assert lookup["SOLID"] == 3


def test_missing_file():
    with pytest.raises(MeshError, match="failed to open mesh file"):
        load_gmsh_file("/nonexistent/path.msh")


def test_missing_nodes_section():
    with pytest.raises(MeshError, match=r"missing \$Nodes section"):
        load_gmsh_from_string("$MeshFormat\n4.1 0 8\n$EndMeshFormat\n")


def test_missing_elements_section():
    contents = """$Nodes
1 1 1 1
3 1 0 1
1
0 0 0
$EndNodes
"""
    with pytest.raises(MeshError, match=r"missing \$Elements section"):
        load_gmsh_from_string(contents)


def test_node_count_mismatch():
    contents = """$Nodes
1 2 1 2
3 1 0 1
1
0 0 0
$EndNodes
$Elements
0 0 0 0
$EndElements
"""
    with pytest.raises(MeshError, match="node count mismatch"):
        load_gmsh_from_string(contents)


def test_element_count_mismatch():
    contents = """$Nodes
1 4 1 4
3 1 0 4
1
2
3
4
0 0 0
1 0 0
0 1 0
0 0 1
$EndNodes
$Elements
1 2 1 2
3 1 4 1
1 1 2 3 4
$EndElements
"""
    with pytest.raises(MeshError, match="element count mismatch"):
        load_gmsh_from_string(contents)


def test_unsupported_element_type():
    contents = """$Nodes
1 4 1 4
3 1 0 4
1
2
3
4
0 0 0
1 0 0
0 1 0
0 0 1
$EndNodes
$Elements
1 1 1 1
3 1 7 1
1 1 2 3 4
$EndElements
"""
    with pytest.raises(MeshError, match="unsupported Gmsh element type 7"):
        load_gmsh_from_string(contents)


def test_element_references_unknown_node():
    contents = """$Nodes
1 4 1 4
3 1 0 4
1
2
3
4
0 0 0
1 0 0
0 1 0
0 0 1
$EndNodes
$Elements
1 1 1 1
3 1 4 1
1 1 2 3 99
$EndElements
"""
    with pytest.raises(MeshError, match="element references unknown node 99"):
        load_gmsh_from_string(contents)


def test_ignored_dimension_consumed_silently():
    # a supported element type in a dim-1 entity block is consumed without
    # producing elements (mesh.cpp:396-404)
    contents = """$Nodes
1 4 1 4
3 1 0 4
1
2
3
4
0 0 0
1 0 0
0 1 0
0 0 1
$EndNodes
$Elements
2 2 1 2
1 5 2 1
7 1 2 3
3 1 4 1
1 1 2 3 4
$EndElements
"""
    mesh = load_gmsh_from_string(contents)
    assert mesh.element_count == 1  # the dim-1 block was skipped
    assert len(mesh.surfaces) == 0


def test_hex8_volume_block():
    contents = """$Nodes
1 8 1 8
3 1 0 8
1
2
3
4
5
6
7
8
0 0 0
1 0 0
1 1 0
0 1 0
0 0 1
1 0 1
1 1 1
0 1 1
$EndNodes
$Elements
1 1 1 1
3 1 5 1
1 1 2 3 4 5 6 7 8
$EndElements
"""
    mesh = load_gmsh_from_string(contents)
    assert mesh.element_count == 1
    assert mesh.element_node_counts[0] == 8
    np.testing.assert_array_equal(mesh.elements[0], np.arange(8))


def test_entities_point_groups_feed_node_groups():
    # a dim-0 entity with a physical tag produces a node group — the route
    # point loads take (mesh.cpp:216-224).  Uses the real 4.1 grammar for
    # point entities (x y z, no bbox).
    contents = """$Entities
1 0 0 1
5 0 0 1 1 42
9 0 0 0 2 2 2 1 3 0
$EndEntities
$Nodes
2 5 1 5
0 5 0 1
1
0 0 0
3 9 0 4
2
3
4
5
1 0 0
0 1 0
0 0 1
2 0 0
$EndNodes
$Elements
1 1 1 1
3 9 4 1
1 2 3 4 5
$EndElements
"""
    mesh = load_gmsh_from_string(contents)
    assert 42 in mesh.node_groups
    np.testing.assert_array_equal(mesh.node_groups[42], [0])
    assert mesh.element_physical_group[0] == 3
