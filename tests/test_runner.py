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
