"""Post-processing tests: derived fields, VTU, probes, output manager.

Mirrors /root/reference/tests/derived_fields_test.cpp (analytic single-tet
strain/stress) and export_writer_test.cpp (VTU smoke, probe CSV rows,
OutputManager stride).
"""

import os
import struct

import numpy as np
import pytest

from civiwave_tpu.mesh import preprocess
from civiwave_tpu.physics import materials
from civiwave_tpu.post.derived import compute_derived_fields, von_mises
from civiwave_tpu.post.output import OutputManager
from civiwave_tpu.post.probes import ProbeLogger
from civiwave_tpu.post.vtu import write_vtu
from civiwave_tpu.utils.errors import ProbeError
from support import single_tet_mesh, tet_config


@pytest.fixture
def tet_setup():
    mesh = single_tet_mesh()
    cfg = tet_config()
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    _, _, d_all = materials.material_tables(mats)
    return mesh, cfg, pre, mats, d_all


def test_analytic_uniaxial_strain(tet_setup):
    mesh, cfg, pre, mats, d_all = tet_setup
    # u = (0.1 x, 0, 0): strain_xx = 0.1, everything else 0
    u = np.zeros((4, 3))
    u[:, 0] = 0.1 * mesh.node_positions[:, 0]
    fields = compute_derived_fields(pre, d_all, u, 4, 1)

    expected_strain = np.array([0.1, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(fields.element_strain[0], expected_strain, atol=1e-7)
    lam, mu = mats[0].lame.lam, mats[0].lame.mu
    expected_stress = np.array([(lam + 2 * mu) * 0.1, lam * 0.1, lam * 0.1, 0, 0, 0])
    np.testing.assert_allclose(
        fields.element_stress[0], expected_stress, rtol=1e-6
    )
    # single element: node fields equal the element fields
    for node in range(4):
        np.testing.assert_allclose(fields.node_strain[node], expected_strain, atol=1e-7)
    # von mises for uniaxial-strain stress state
    vm = von_mises(expected_stress[None])[0]
    np.testing.assert_allclose(fields.element_von_mises[0], vm, rtol=1e-6)


def test_shear_strain_engineering_convention(tet_setup):
    mesh, cfg, pre, mats, d_all = tet_setup
    # u = (0.2 y, 0, 0): gamma_xy = 0.2 (engineering shear)
    u = np.zeros((4, 3))
    u[:, 0] = 0.2 * mesh.node_positions[:, 1]
    fields = compute_derived_fields(pre, d_all, u, 4, 1)
    np.testing.assert_allclose(
        fields.element_strain[0], [0, 0, 0, 0.2, 0, 0], atol=1e-7
    )
    mu = mats[0].lame.mu
    assert fields.element_stress[0, 3] == pytest.approx(mu * 0.2, rel=1e-6)


def test_vtu_smoke(tet_setup, tmp_path):
    mesh, cfg, pre, mats, d_all = tet_setup
    u = np.zeros((4, 3), np.float32)
    u[3, 2] = -0.001
    fields = compute_derived_fields(pre, d_all, u, 4, 1)
    path = str(tmp_path / "frame_00000.vtu")
    write_vtu(path, mesh, u, np.zeros_like(u), np.zeros_like(u), fields, 0.25, 7)

    with open(path, "rb") as f:
        blob = f.read()
    head = blob[:2000].decode("ascii", errors="replace")
    assert '<VTKFile type="UnstructuredGrid"' in head
    assert 'header_type="UInt32"' in head
    assert 'Name="time"' in head and ">0.25<" in head
    assert 'Name="frame"' in head and ">7<" in head
    assert 'NumberOfPoints="4"' in head and 'NumberOfCells="1"' in head
    for name in (
        "displacement",
        "velocity",
        "acceleration",
        "strain_node",
        "stress_node",
        "von_mises_node",
        "strain_elem",
        "stress_elem",
        "von_mises_elem",
    ):
        assert f'Name="{name}"' in head
    assert b'<AppendedData encoding="raw">' in blob

    # first appended block is displacement: u32 size + 4*3 f32
    marker = blob.index(b'encoding="raw">\n_') + len(b'encoding="raw">\n_')
    (size,) = struct.unpack_from("<I", blob, marker)
    assert size == 4 * 3 * 4
    data = np.frombuffer(blob, dtype=np.float32, count=12, offset=marker + 4)
    np.testing.assert_allclose(data.reshape(4, 3), u)


def test_probe_csv(tet_setup, tmp_path):
    mesh, cfg, pre, mats, d_all = tet_setup
    u = np.zeros((4, 3), np.float32)
    fields = compute_derived_fields(pre, d_all, u, 4, 1)
    path = str(tmp_path / "probes.csv")
    logger = ProbeLogger(path, [0, 3])
    logger.log_frame(0.0, 0, u, u, u, fields)
    logger.log_frame(0.01, 1, u, u, u, fields)
    lines = open(path).read().strip().splitlines()
    assert lines[0].startswith("frame,time,node,ux,uy,uz,vx")
    assert lines[0].endswith("von_mises")
    assert len(lines) == 5  # header + 2 probes x 2 frames
    assert lines[1].split(",")[0] == "0"
    assert lines[1].split(",")[2] == "0"
    assert lines[2].split(",")[2] == "3"


def test_probe_out_of_range(tet_setup, tmp_path):
    mesh, cfg, pre, mats, d_all = tet_setup
    u = np.zeros((4, 3), np.float32)
    fields = compute_derived_fields(pre, d_all, u, 4, 1)
    logger = ProbeLogger(str(tmp_path / "p.csv"), [99])
    with pytest.raises(ProbeError, match="probe index out of range"):
        logger.log_frame(0.0, 0, u, u, u, fields)


def test_output_manager_stride(tet_setup, tmp_path):
    mesh, cfg, pre, mats, d_all = tet_setup
    from civiwave_tpu.config.schema import OutputSettings

    manager = OutputManager(
        str(tmp_path), OutputSettings(vtu_stride=2, probes=(0,)), mesh, pre, d_all
    )
    u = np.zeros((4, 3), np.float32)
    for frame in range(4):
        manager.handle_frame(frame * 0.01, frame, u, u, u)
    manager.flush()  # VTU writes are asynchronous
    vtu_dir = tmp_path / "vtu"
    assert sorted(os.listdir(vtu_dir)) == ["frame_00000.vtu", "frame_00002.vtu"]
    lines = open(tmp_path / "probes" / "probes.csv").read().strip().splitlines()
    assert len(lines) == 5  # header + 4 frames x 1 probe


def test_snapshot_renders_png(tet_setup, tmp_path):
    from civiwave_tpu.post.derived import compute_derived_fields
    from civiwave_tpu.post.snapshot import save_snapshot

    mesh, cfg, pre, mats, d_all = tet_setup
    u = np.zeros((4, 3), np.float32)
    u[3, 2] = -0.05
    fields = compute_derived_fields(pre, d_all, u, 4, 1)
    path = str(tmp_path / "snap.png")
    save_snapshot(path, mesh, u, fields, deformation_scale=2.0, title="tet")
    blob = open(path, "rb").read()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(blob) > 5000


def test_native_vtu_writer_byte_identical(tet_setup, tmp_path, monkeypatch):
    """The C++ writer (native/vtu_fast.cpp) must produce byte-identical
    files to the pure-Python path."""
    from civiwave_tpu.post import native_vtu
    from civiwave_tpu.post.derived import compute_derived_fields
    from civiwave_tpu.post.vtu import write_vtu

    if not native_vtu.available():
        pytest.skip("no native toolchain")

    mesh, cfg, pre, mats, d_all = tet_setup
    rng = np.random.default_rng(3)
    u = rng.standard_normal((4, 3)).astype(np.float32) * 0.01
    v = rng.standard_normal((4, 3)).astype(np.float32)
    a = rng.standard_normal((4, 3)).astype(np.float32)
    fields = compute_derived_fields(pre, d_all, u, 4, 1)

    p_native = str(tmp_path / "native.vtu")
    write_vtu(p_native, mesh, u, v, a, fields, 0.1, 7)

    p_python = str(tmp_path / "python.vtu")
    monkeypatch.setattr(native_vtu, "available", lambda: False)
    write_vtu(p_python, mesh, u, v, a, fields, 0.1, 7)

    native_bytes = open(p_native, "rb").read()
    python_bytes = open(p_python, "rb").read()
    assert native_bytes == python_bytes


@pytest.mark.parametrize("kind", ["tet", "hex", "mixed"])
def test_native_vtu_padded_byte_identical(kind, tmp_path, monkeypatch):
    """The streaming padded-connectivity path (cwf_write_vtu_padded) must be
    byte-identical to the pure-Python ragged extraction for tet, hex, and
    MIXED tet+hex meshes (variable node counts exercise the per-row copy,
    the cumsum offsets, and the 10/12 type mapping)."""
    from civiwave_tpu.post import native_vtu
    from civiwave_tpu.post.derived import DerivedFieldSet
    from civiwave_tpu.post.vtu import write_vtu
    from civiwave_tpu.utils.synthetic import box_mesh

    if not native_vtu.available():
        pytest.skip("no native toolchain")

    if kind == "mixed":
        # hex box mesh with the first two cells split into tets: hand-lower
        # counts so padded rows carry genuine -1 tails
        mesh = box_mesh(3, 2, 2, hex_elements=True)
        mesh.element_node_counts = mesh.element_node_counts.copy()
        mesh.elements = mesh.elements.copy()
        mesh.element_node_counts[:2] = 4
        mesh.elements[:2, 4:] = -1
    else:
        mesh = box_mesh(3, 2, 2, hex_elements=(kind == "hex"))

    n, e = mesh.node_count, mesh.element_count
    rng = np.random.default_rng(11)
    u = rng.standard_normal((n, 3)).astype(np.float32) * 0.01
    v = rng.standard_normal((n, 3)).astype(np.float32)
    a = rng.standard_normal((n, 3)).astype(np.float32)
    fields = DerivedFieldSet(
        element_strain=rng.standard_normal((e, 6)).astype(np.float32),
        element_stress=rng.standard_normal((e, 6)).astype(np.float32),
        element_von_mises=rng.standard_normal(e).astype(np.float32),
        node_strain=rng.standard_normal((n, 6)).astype(np.float32),
        node_stress=rng.standard_normal((n, 6)).astype(np.float32),
        node_von_mises=rng.standard_normal(n).astype(np.float32),
    )

    p_native = str(tmp_path / "native.vtu")
    write_vtu(p_native, mesh, u, v, a, fields, 0.3, 4)

    p_python = str(tmp_path / "python.vtu")
    monkeypatch.setattr(native_vtu, "available", lambda: False)
    write_vtu(p_python, mesh, u, v, a, fields, 0.3, 4)

    assert open(p_native, "rb").read() == open(p_python, "rb").read()


def test_structured_device_derived_matches_host():
    """Device-side derived fields (uniform grid collapse of the row-
    weighted averages) must equal the host per-quadrature-row path."""
    import jax.numpy as jnp

    from civiwave_tpu.mesh import preprocess as pre_mod
    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.physics import materials as mat_mod
    from civiwave_tpu.post.structured_fields import (
        compute_structured_derived,
        derived_to_host,
    )
    from civiwave_tpu.utils.synthetic import box_mesh, cantilever_config

    cfg = cantilever_config()
    mats = [mat_mod.make_properties(m) for m in cfg.materials]
    _, _, d_all = mat_mod.material_tables(mats)
    nx, ny, nz = 5, 3, 4
    model, _ = build_structured_model(
        nx, ny, nz, mats[0], cfg.materials[0].density
    )
    rng = np.random.default_rng(3)
    u_rows = rng.standard_normal((model.node_count, 3)).astype(np.float32)
    u_csg = model.from_nodal(u_rows)

    fast = derived_to_host(
        model, compute_structured_derived(model, u_csg)
    )
    mesh = box_mesh(nx, ny, nz, hex_elements=True)
    pre = pre_mod.run(mesh, cfg)
    ref = compute_derived_fields(
        pre, d_all, u_rows, mesh.node_count, mesh.element_count
    )
    for name in (
        "element_strain", "element_stress", "element_von_mises",
        "node_strain", "node_stress", "node_von_mises",
    ):
        a, b = getattr(fast, name), getattr(ref, name)
        scale = np.abs(b).max() + 1e-30
        np.testing.assert_allclose(
            a, b, atol=5e-6 * scale, err_msg=name
        )


def _random_derived(rng, n_nodes: int, n_cells: int):
    from civiwave_tpu.post.derived import DerivedFieldSet

    return DerivedFieldSet(
        element_strain=rng.standard_normal((n_cells, 6)).astype(np.float32),
        element_stress=rng.standard_normal((n_cells, 6)).astype(np.float32),
        element_von_mises=rng.standard_normal(n_cells).astype(np.float32),
        node_strain=rng.standard_normal((n_nodes, 6)).astype(np.float32),
        node_stress=rng.standard_normal((n_nodes, 6)).astype(np.float32),
        node_von_mises=rng.standard_normal(n_nodes).astype(np.float32),
    )


@pytest.mark.parametrize("force_python", [False, True])
def test_structured_vtu_byte_identical(tmp_path, monkeypatch, force_python):
    """write_vtu_structured (implicit connectivity, native + Python
    fallback) must be byte-identical to write_vtu over the equivalent
    box_mesh — same appended-raw layout, same x-major/Gmsh-corner cell
    table (vtu_writer.cpp:171-291 byte format)."""
    from civiwave_tpu.post import native_vtu
    from civiwave_tpu.post.vtu import write_vtu, write_vtu_structured
    from civiwave_tpu.utils.synthetic import box_mesh

    if not force_python and not native_vtu.available():
        pytest.skip("no native toolchain")

    nx, ny, nz = 3, 2, 4
    mesh = box_mesh(nx, ny, nz, hex_elements=True)
    n, e = mesh.node_count, mesh.element_count
    rng = np.random.default_rng(11)
    u = rng.standard_normal((n, 3)).astype(np.float32) * 0.01
    v = rng.standard_normal((n, 3)).astype(np.float32)
    a = rng.standard_normal((n, 3)).astype(np.float32)
    fields = _random_derived(rng, n, e)

    if force_python:
        monkeypatch.setattr(native_vtu, "available", lambda: False)

    p_ref = str(tmp_path / "explicit.vtu")
    write_vtu(p_ref, mesh, u, v, a, fields, 0.5, 3)
    p_imp = str(tmp_path / "implicit.vtu")
    points = (mesh.node_positions.astype(np.float32) + u).astype(np.float32)
    write_vtu_structured(p_imp, nx, ny, nz, points, u, v, a, fields, 0.5, 3)

    assert open(p_imp, "rb").read() == open(p_ref, "rb").read()


def test_structured_vtu_int32_guard(tmp_path):
    """Grids whose connectivity would overflow the Int32 offsets block
    must fail loudly, not write a corrupt file."""
    from civiwave_tpu.post.vtu import write_vtu_structured
    from civiwave_tpu.utils.errors import VtuError

    rng = np.random.default_rng(0)
    with pytest.raises(VtuError):
        write_vtu_structured(
            str(tmp_path / "huge.vtu"), 700, 700, 700,
            np.zeros((8, 3), np.float32),
            np.zeros((8, 3), np.float32),
            np.zeros((8, 3), np.float32),
            np.zeros((8, 3), np.float32),
            _random_derived(rng, 8, 1), 0.0, 0,
        )
