"""Static solve mode + the BASELINE configs #1-#3 example scenarios.

BASELINE.json names five benchmark configs; #4 (sharded matvec) and #5
(seismic basin) are covered by tests/test_sharding.py and
tests/test_absorbing.py.  This file pins the first three as runnable
artifacts: the static cantilever (--static runner mode, config #1), the
plate impulse (config #2), and the multi-material tet column read from a
real Gmsh file with shuffled node numbering (config #3).
"""

import json
import os

import numpy as np
import pytest

from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.physics import materials
from civiwave_tpu.runner import build_simulation, main
from civiwave_tpu.solver.static import solve_static_jit, static_oracle
from civiwave_tpu.utils.synthetic import box_mesh, cantilever_config

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


# ---------------------------------------------------------------------------
# static solve


@pytest.mark.parametrize("hex_elements", [True, False])
def test_static_solve_matches_dense_oracle(hex_elements):
    cfg = cantilever_config()
    mesh = box_mesh(4, 2, 2, hex_elements=hex_elements)
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, _, force = pack.build_packed_model(mesh, pre, cfg, mats)

    # 1e-8 relative: the f32-vector floor (1e-10 stalls in breakdown)
    u, pcg = solve_static_jit(model, force, tolerance=1.0e-8)
    assert bool(pcg.converged)
    got = np.asarray(model.to_nodal(u), np.float64)
    ref = static_oracle(mesh, pre, cfg, mats)
    scale = np.abs(ref).max() + 1e-30
    # reference parity budget (pcg_test.cpp:358): 2.5e-4 relative
    np.testing.assert_allclose(got, ref, atol=2.5e-4 * scale)


def test_static_dirichlet_targets_hold():
    cfg = cantilever_config()
    mesh = box_mesh(3, 2, 2, hex_elements=True)
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, _, force = pack.build_packed_model(mesh, pre, cfg, mats)
    u, pcg = solve_static_jit(model, force, tolerance=1.0e-8)
    u_nodal = np.asarray(model.to_nodal(u))
    fixed = np.isclose(mesh.node_positions[:, 0], 0.0)
    np.testing.assert_array_equal(u_nodal[fixed], 0.0)
    assert np.abs(u_nodal[~fixed]).max() > 0.0


def test_static_runner_cli(tmp_path):
    scenario = tmp_path / "static_small.yaml"
    scenario.write_text(
        open(os.path.join(EXAMPLES, "static_cantilever.yaml")).read().replace(
            "synthetic://box/30,10,10,hex,0.1", "synthetic://box/10,4,4"
        )
    )
    out_root = str(tmp_path / "out")
    telemetry = str(tmp_path / "static.json")
    rc = main(
        [
            str(scenario),
            "--static",
            "--output",
            out_root,
            "--telemetry-json",
            telemetry,
        ]
    )
    assert rc == 0
    assert os.path.isfile(os.path.join(out_root, "vtu", "frame_00000.vtu"))
    payload = json.load(open(telemetry))
    assert payload["mode"] == "static"
    assert payload["converged"] is True
    assert payload["max_displacement"] > 0.0


# ---------------------------------------------------------------------------
# BASELINE config #1: static cantilever example (structured fast path)


def test_example_static_cantilever(tmp_path):
    sim = build_simulation(
        os.path.join(EXAMPLES, "static_cantilever.yaml"),
        output_root=str(tmp_path / "out"),
    )
    assert sim.structured  # hex box routes onto the fast path
    u, pcg = solve_static_jit(
        sim.model,
        sim.stepper.external_force,
        tolerance=sim.config.solver.pause_tolerance,
        max_iterations=sim.config.solver.max_iterations,
    )
    assert bool(pcg.converged)
    # tip deflection within the beam-theory band measured in
    # tests/test_validation_analytic.py (same geometry scaled by 0.1)
    from test_validation_analytic import _beam_theory_deflection

    u_nodal = np.asarray(sim.model.to_nodal(u)).reshape(31, 11, 11, 3)
    measured = float(u_nodal[30, :, :, 2].mean())
    analytic = _beam_theory_deflection(3.0, 1.0, 1.0, 2.0e11, 0.3, -1.0e6)
    assert abs(measured - analytic) / abs(analytic) < 0.10


# ---------------------------------------------------------------------------
# BASELINE config #2: plate impulse


def test_example_plate_impulse(tmp_path):
    sim = build_simulation(
        os.path.join(EXAMPLES, "plate_impulse.yaml"),
        output_root=str(tmp_path / "out"),
    )
    telemetries = sim.run(6)
    assert all(t.pcg_converged for t in telemetries)
    # the impulse curve must actually modulate the force over frames
    u = sim.stepper.displacement()
    assert np.abs(u[:, 2]).max() > 0.0


# ---------------------------------------------------------------------------
# BASELINE config #3: multi-material tet column from a real Gmsh file


def test_example_seismic_column(tmp_path):
    sim = build_simulation(
        os.path.join(EXAMPLES, "seismic_column_tet.yaml"),
        output_root=str(tmp_path / "out"),
    )
    assert not sim.structured
    model = sim.model
    assert model.tet_count == 1536 and model.hex_count == 0
    # two materials actually bound to elements
    assert set(np.unique(np.asarray(model.mat_tet)[: model.tet_count])) == {
        0,
        1,
    }
    # the file's shuffled numbering triggers the RCM renumbering (ADR-32)
    assert model.renumbered
    telemetries = sim.run(3)
    assert all(t.pcg_converged for t in telemetries)
    sim.output.flush()
    assert os.path.isfile(
        os.path.join(str(tmp_path / "out"), "vtu", "frame_00000.vtu")
    )
    # gravity + lateral pulse: soil top must displace laterally more than
    # the rock base region
    u = sim.stepper.displacement()
    z = sim.mesh.node_positions[:, 2]
    top = np.abs(u[z > 7.0, 0]).max()
    base = np.abs(u[(z > 0.0) & (z < 1.0), 0]).max()
    assert top > base
