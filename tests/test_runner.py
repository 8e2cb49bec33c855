"""End-to-end scenario run: the cantilever fixture through the full pipeline.

This is the slice the reference exercises via viewer_demo.cpp:241-293 +
pcg_test.cpp:195-258 — YAML -> Gmsh -> preprocess -> pack -> Newmark frames
-> VTU/probe output — driven through the CLI runner.
"""

import os

import numpy as np
import pytest

from civiwave_tpu.runner import build_simulation, main


@pytest.fixture
def scenario(data_dir):
    return os.path.join(data_dir, "cantilever.yaml")


def test_build_simulation(scenario, data_dir):
    sim = build_simulation(scenario, mesh_root=os.path.dirname(os.path.dirname(data_dir)))
    assert sim.mesh.node_count == 4
    assert sim.model.tet_count == 1
    assert sim.stepper.current_dt == pytest.approx(0.01111)


def test_end_to_end_run_with_outputs(scenario, tmp_path, data_dir):
    out_root = str(tmp_path / "out")
    sim = build_simulation(
        scenario,
        output_root=out_root,
        mesh_root=os.path.dirname(os.path.dirname(data_dir)),
    )
    telemetries = sim.run(12)
    assert all(t.pcg_converged for t in telemetries)

    # gravity + downward ramped traction must push the free node down
    u = sim.stepper.displacement()
    np.testing.assert_allclose(u[:3], 0.0, atol=1e-7)  # FIXED_BASE held

    # vtu_stride=10: frames 0 and 10 written
    assert sorted(os.listdir(os.path.join(out_root, "vtu"))) == [
        "frame_00000.vtu",
        "frame_00010.vtu",
    ]
    lines = (
        open(os.path.join(out_root, "probes", "probes.csv")).read().strip().splitlines()
    )
    assert len(lines) == 1 + 12 * 2  # header + 12 frames x 2 probes

    # adaptive dt must respect the configured bounds
    assert 0.005 <= sim.stepper.current_dt <= 0.02


def test_curve_scaled_force_updates_between_frames(scenario, data_dir, tmp_path):
    sim = build_simulation(
        scenario, mesh_root=os.path.dirname(os.path.dirname(data_dir))
    )
    sim.run(3)
    # load_curve1 ramps 0 -> 0.75 over 0.5s; after a few frames the traction
    # is nonzero, so the packed force must have been refreshed
    force = np.asarray(sim.stepper.external_force)[: sim.mesh.node_count]
    gravity_only = sim.model.lumped_mass[: sim.mesh.node_count]
    # node 3 lies on LOAD_FACE: must differ from pure gravity
    assert force[3, 2] != pytest.approx(float(gravity_only[3]) * -9.81, rel=1e-6)


def test_cli_main(scenario, tmp_path, data_dir, monkeypatch):
    monkeypatch.chdir(os.path.dirname(os.path.dirname(data_dir)))
    telemetry_path = str(tmp_path / "telemetry.json")
    code = main(
        [
            scenario,
            "--frames",
            "3",
            "--quiet",
            "--output",
            str(tmp_path / "cli_out"),
            "--telemetry-json",
            telemetry_path,
        ]
    )
    assert code == 0
    import json

    telemetry = json.load(open(telemetry_path))
    assert len(telemetry) == 3
    assert telemetry[0]["pcg_converged"]


# ---------------------------------------------------------------------------
# YAML -> structured fast-path routing
# ---------------------------------------------------------------------------

_BOX_YAML = """
mesh: {path: "synthetic://box/6,3,3"}
materials:
  - {name: steel, E: 2.0e11, nu: 0.3, rho: 7800.0}
assignments:
  - {group: SOLID, material: steel}
damping: {xi: 0.02, w1: 10.0, w2: 100.0}
time: {dt: 0.001, adaptive: false, min_dt: 0.0005, max_dt: 0.002}
solver:
  type: pcg
  preconditioner: block_jacobi
  tol_runtime: 1.0e-7
  tol_pause: 1.0e-9
  max_iters: 500
precision: {vectors: fp32, reductions: fp64}
curves:
  ramp: [[0.0, 0.0], [0.004, 1.0]]
loads:
  gravity: [0.0, 0.0, -9.81]
  tractions:
    - {group: LOAD_FACE, value: [0.0, 0.0, -1.0e6], scale_curve: ramp}
dirichlet:
  fixes:
    - {group: FIXED, dof: [x, y, z]}
output: {vtu_stride: 1, probes: []}
"""


def _general_sim(path, monkeypatch):
    """Same scenario forced onto the general gather path."""
    import civiwave_tpu.mesh.structured_config as sc

    monkeypatch.setattr(sc, "try_build_structured", lambda cfg, **kw: None)
    return build_simulation(path)


@pytest.mark.slow
def test_yaml_routes_to_structured_fast_path(tmp_path, monkeypatch):
    """A synthetic-box hex scenario must run on the StructuredModel fast
    path and produce the same trajectory as the general gather path —
    including curve-scaled tractions recombined on device per frame."""
    path = str(tmp_path / "box.yaml")
    open(path, "w").write(_BOX_YAML)

    sim = build_simulation(path)
    assert sim.structured
    assert sim.mesh is None  # host mesh not built unless output needs it
    assert sim.force_schedule is not None and sim.force_schedule.has_curves
    sim.run(3)

    ref = _general_sim(path, monkeypatch)
    assert not ref.structured
    ref.run(3)

    u_fast = sim.stepper.displacement()
    u_ref = ref.stepper.displacement()[: u_fast.shape[0]]
    scale = np.abs(u_ref).max() + 1e-30
    np.testing.assert_allclose(u_fast, u_ref, atol=2e-5 * scale)


@pytest.mark.slow
def test_structured_yaml_outputs_and_probes(tmp_path):
    """Structured scenarios produce VTU + probe output through the
    device-side derived-field path — no host mesh/preprocess required."""
    yaml = _BOX_YAML.replace(
        "output: {vtu_stride: 1, probes: []}",
        "output: {vtu_stride: 2, probes: [0, 5]}",
    )
    path = str(tmp_path / "box.yaml")
    open(path, "w").write(yaml)
    out_root = str(tmp_path / "out")
    sim = build_simulation(path, output_root=out_root)
    assert sim.structured and sim.mesh is None  # fully device-side output
    sim.run(3)
    assert sorted(os.listdir(os.path.join(out_root, "vtu"))) == [
        "frame_00000.vtu",
        "frame_00002.vtu",
    ]
    lines = open(
        os.path.join(out_root, "probes", "probes.csv")
    ).read().strip().splitlines()
    assert len(lines) == 1 + 3 * 2


@pytest.mark.slow
def test_structured_nonzero_dirichlet_matches_general(tmp_path, monkeypatch):
    """Per-axis Dirichlet with nonzero targets (config.cpp:500-567) on the
    structured path: prescribed settlement of the fixed plane must match the
    general path (exercises bc_value plumbing end to end)."""
    yaml = _BOX_YAML.replace(
        "    - {group: FIXED, dof: [x, y, z]}",
        "    - {group: FIXED, dof: [x, z], value: [0.0, 0.0, -0.001]}",
    )
    path = str(tmp_path / "box.yaml")
    open(path, "w").write(yaml)

    sim = build_simulation(path)
    assert sim.structured
    sim.run(2)
    ref = _general_sim(path, monkeypatch)
    ref.run(2)

    u_fast = sim.stepper.displacement()
    u_ref = ref.stepper.displacement()[: u_fast.shape[0]]
    # the fixed plane (x=0 nodes) must sit at the prescribed target
    n_plane = 4 * 4  # (ny+1)*(nz+1)
    np.testing.assert_allclose(u_fast[:n_plane, 2], -0.001, rtol=1e-5)
    np.testing.assert_allclose(u_fast[:n_plane, 0], 0.0, atol=1e-12)
    scale = np.abs(u_ref).max() + 1e-30
    np.testing.assert_allclose(u_fast, u_ref, atol=2e-5 * scale)


def test_tet_box_yaml_stays_on_general_path(tmp_path):
    path = str(tmp_path / "box.yaml")
    open(path, "w").write(
        _BOX_YAML.replace("synthetic://box/6,3,3", "synthetic://box/4,2,2,tet")
    )
    sim = build_simulation(path)
    assert not sim.structured
    assert sim.model.tet_count > 0


@pytest.mark.slow
def test_structured_output_parity_with_general(tmp_path, monkeypatch):
    """Probe CSV + VTU derived fields from the device-side structured
    output path must match the general host path numerically."""
    yaml = _BOX_YAML.replace(
        "output: {vtu_stride: 1, probes: []}",
        "output: {vtu_stride: 2, probes: [3, 41]}",
    )
    path = str(tmp_path / "box.yaml")
    open(path, "w").write(yaml)

    sim = build_simulation(path, output_root=str(tmp_path / "fast"))
    assert sim.structured
    sim.run(3)
    ref = _general_sim_with_output(path, str(tmp_path / "ref"), monkeypatch)
    ref.run(3)

    fast_rows = np.loadtxt(
        str(tmp_path / "fast" / "probes" / "probes.csv"),
        delimiter=",", skiprows=1,
    )
    ref_rows = np.loadtxt(
        str(tmp_path / "ref" / "probes" / "probes.csv"),
        delimiter=",", skiprows=1,
    )
    assert fast_rows.shape == ref_rows.shape
    scale = np.abs(ref_rows).max(axis=0) + 1e-9
    np.testing.assert_allclose(
        fast_rows / scale, ref_rows / scale, atol=5e-5
    )

    # VTU bytes: identical field structure; compare sizes as a smoke check
    f_fast = os.path.join(tmp_path, "fast", "vtu", "frame_00002.vtu")
    f_ref = os.path.join(tmp_path, "ref", "vtu", "frame_00002.vtu")
    assert os.path.getsize(f_fast) == os.path.getsize(f_ref)


def _general_sim_with_output(path, out_root, monkeypatch):
    import civiwave_tpu.mesh.structured_config as sc

    monkeypatch.setattr(sc, "try_build_structured", lambda cfg, **kw: None)
    return build_simulation(path, output_root=out_root)
