"""Preprocessing tests.

Mirrors /root/reference/tests/preprocess_test.cpp (gradients/volumes/masses
vs hand values, duplicate rejection, group validation) and adds hex8 coverage
the reference never had (preprocess.cpp:326-330 rejects hexes).
"""

import numpy as np
import pytest

from civiwave_tpu.mesh import preprocess
from civiwave_tpu.mesh.model import SENTINEL
from civiwave_tpu.utils.errors import PreprocessError
from support import bar_config, bar_mesh, single_tet_mesh, tet_config


def test_unit_tet_gradients_volume_mass():
    mesh = single_tet_mesh()
    cfg = tet_config()
    out = preprocess.run(mesh, cfg)

    # unit tet volume = 1/6
    assert out.element_volumes[0] == pytest.approx(1.0 / 6.0)
    # shape gradients of the unit tetrahedron: N0 = 1-x-y-z etc.
    expected = np.array(
        [[-1.0, -1.0, -1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    np.testing.assert_allclose(out.quad_gradients[0, :4], expected, atol=1e-12)
    np.testing.assert_allclose(out.quad_gradients[0, 4:], 0.0)
    # lumped mass rho * V / 4 per corner
    np.testing.assert_allclose(out.lumped_mass, 1000.0 * (1.0 / 6.0) / 4.0)
    # partition of unity: gradients sum to zero
    np.testing.assert_allclose(out.quad_gradients[0].sum(axis=0), 0.0, atol=1e-12)


def test_gradients_reproduce_linear_field():
    # for any tet, sum_l grad_l * f(x_l) must equal the gradient of a linear f
    rng = np.random.default_rng(3)
    mesh = single_tet_mesh()
    mesh.node_positions = mesh.node_positions + 0.2 * rng.standard_normal((4, 3))
    cfg = tet_config()
    out = preprocess.run(mesh, cfg)
    coeff = np.array([1.5, -2.0, 0.75])
    values = mesh.node_positions @ coeff
    recovered = np.einsum("la,l->a", out.quad_gradients[0, :4], values)
    np.testing.assert_allclose(recovered, coeff, rtol=1e-12)


def test_adjacency_csr():
    mesh = single_tet_mesh()
    out = preprocess.run(mesh, tet_config())
    adj = out.adjacency
    assert adj.offsets.tolist() == [0, 1, 2, 3, 4]
    np.testing.assert_array_equal(adj.row_indices, [0, 0, 0, 0])
    np.testing.assert_array_equal(adj.local_indices, [0, 1, 2, 3])


def test_duplicate_nodes_rejected():
    mesh = single_tet_mesh()
    mesh.node_positions[1] = mesh.node_positions[0]
    with pytest.raises(PreprocessError, match="duplicate nodes detected"):
        preprocess.run(mesh, tet_config())


def test_duplicate_elements_rejected():
    mesh = single_tet_mesh()
    mesh.elements = np.vstack([mesh.elements, mesh.elements[:, [1, 0, 2, 3, 4, 5, 6, 7]]])
    mesh.element_node_counts = np.array([4, 4], dtype=np.int32)
    mesh.element_physical_group = np.array([12, 12], dtype=np.int64)
    mesh.element_original_ids = np.array([200, 201], dtype=np.int64)
    with pytest.raises(PreprocessError, match="duplicate elements detected"):
        preprocess.run(mesh, tet_config())


def test_missing_dirichlet_group():
    mesh = single_tet_mesh()
    cfg = tet_config(
        dirichlet={"fixes": [{"group": "NOPE", "dof": ["x"]}]}
    )
    with pytest.raises(
        PreprocessError, match="dirichlet fix references missing physical group 'NOPE'"
    ):
        preprocess.run(mesh, cfg)


def test_missing_traction_group():
    mesh = single_tet_mesh()
    cfg = tet_config(
        loads={
            "gravity": [0, 0, 0],
            "tractions": [{"group": "NOPE", "value": [0, 0, 1]}],
        }
    )
    with pytest.raises(
        PreprocessError,
        match="traction load references missing physical group 'NOPE'",
    ):
        preprocess.run(mesh, cfg)


def test_missing_assignment_for_element_group():
    mesh = single_tet_mesh()
    cfg = tet_config(assignments=[{"group": "FIXED", "material": "test_material"}])
    with pytest.raises(PreprocessError, match="element physical group missing assignment"):
        preprocess.run(mesh, cfg)


def test_degenerate_tet_rejected():
    mesh = single_tet_mesh()
    mesh.node_positions[3] = [0.5, 0.5, 0.0]  # coplanar
    with pytest.raises(PreprocessError, match="tetrahedron volume non-positive"):
        preprocess.run(mesh, tet_config())


def test_empty_mesh_rejected():
    mesh = single_tet_mesh()
    mesh.elements = np.zeros((0, 8), dtype=np.int32)
    mesh.element_node_counts = np.zeros((0,), dtype=np.int32)
    mesh.element_physical_group = np.zeros((0,), dtype=np.int64)
    with pytest.raises(PreprocessError, match="mesh has zero elements"):
        preprocess.run(mesh, tet_config())


# ---------------------------------------------------------------------------
# hex8 coverage — new capability vs the reference
# ---------------------------------------------------------------------------


def test_hex8_unit_cube_quadrature():
    mesh = bar_mesh(1, 1, 1, hex_elements=True)
    cfg = bar_config()
    out = preprocess.run(mesh, cfg)

    # one hex expands to 8 Gauss rows whose point volumes sum to the volume
    assert out.quad_count == 8
    assert out.element_volumes[0] == pytest.approx(1.0)
    np.testing.assert_allclose(out.quad_volume.sum(), 1.0, rtol=1e-12)
    # lumped mass rho * V / 8 per corner
    np.testing.assert_allclose(out.lumped_mass, 7800.0 / 8.0)
    # partition of unity at every Gauss point
    np.testing.assert_allclose(
        out.quad_gradients.sum(axis=1), 0.0, atol=1e-12
    )


def test_hex8_gradients_reproduce_linear_field():
    rng = np.random.default_rng(7)
    mesh = bar_mesh(1, 1, 1, hex_elements=True)
    mesh.node_positions = mesh.node_positions + 0.1 * rng.standard_normal((8, 3))
    out = preprocess.run(mesh, bar_config())
    coeff = np.array([0.3, -1.2, 2.5])
    # each Gauss row must recover the uniform gradient of a linear field
    # (local slots follow the row's connectivity order).  Hex gradients are
    # computed in f64 but STORED in f32 — the device-table precision the
    # packer ships anyway (hex_gradients_gp_major) — so recovery is exact
    # to f32 rounding, not f64.
    for g in range(8):
        values = mesh.node_positions[out.quad_connectivity[g]] @ coeff
        recovered = np.einsum("la,l->a", out.quad_gradients[g], values)
        np.testing.assert_allclose(recovered, coeff, rtol=1e-6)


def test_hex8_inverted_rejected():
    mesh = bar_mesh(1, 1, 1, hex_elements=True)
    # swap two corners to invert the element
    mesh.node_positions[[0, 1]] = mesh.node_positions[[1, 0]]
    with pytest.raises(PreprocessError, match="hexahedron Jacobian non-positive"):
        preprocess.run(mesh, bar_config())


def test_mixed_mesh_tet_bar():
    mesh = bar_mesh(2, 1, 1, hex_elements=False)
    out = preprocess.run(mesh, bar_config())
    assert out.quad_count == 12  # 2 cells x 6 tets
    np.testing.assert_allclose(out.element_volumes.sum(), 2.0, rtol=1e-12)
    total_mass = out.lumped_mass.sum()
    np.testing.assert_allclose(total_mass, 7800.0 * 2.0, rtol=1e-12)
    assert (out.quad_connectivity[:, 4:] == SENTINEL).all()
