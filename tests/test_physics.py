"""Physics helper tests: curves, loads, Newmark algebra, dense oracle.

Mirrors /root/reference/tests/physics_test.cpp — curve edge cases, load
vector composition vs analytic areas, Newmark coefficient closed forms,
K_eff/RHS algebra, dense stiffness symmetry, Dirichlet locking, and the full
CPU step holding constraints.
"""

import numpy as np
import pytest

from civiwave_tpu.config.schema import Curve, Damping
from civiwave_tpu.mesh import preprocess
from civiwave_tpu.physics import loads as loads_mod
from civiwave_tpu.physics import materials, newmark, oracle
from support import single_tet_mesh, tet_config

EPS = 1.0e-9


# --- curves (physics_test.cpp:174-193) --------------------------------------


def test_curve_interpolates_linearly():
    curve = Curve(((0.0, 0.0), (1.0, 2.0)))
    assert loads_mod.evaluate_curve(curve, 0.5) == pytest.approx(1.0, abs=EPS)


def test_curve_clamps_outside_range():
    curve = Curve(((1.0, -2.0), (3.0, 4.0)))
    assert loads_mod.evaluate_curve(curve, -10.0) == pytest.approx(-2.0, abs=EPS)
    assert loads_mod.evaluate_curve(curve, 10.0) == pytest.approx(4.0, abs=EPS)


def test_curve_degenerate_segments():
    curve = Curve(((0.0, 1.0), (0.0, 3.0), (2.0, 5.0)))
    assert loads_mod.evaluate_curve(curve, 0.0) == pytest.approx(1.0, abs=EPS)
    assert loads_mod.evaluate_curve(curve, 1.0) == pytest.approx(4.0, abs=EPS)


def test_curve_empty_returns_one():
    assert loads_mod.evaluate_curve(Curve(()), 5.0) == 1.0


# --- materials ---------------------------------------------------------------


def test_lame_and_stiffness_matrix():
    lame = materials.compute_lame(7.0e10, 0.25)
    assert lame.mu == pytest.approx(7.0e10 / 2.5)
    assert lame.lam == pytest.approx(0.25 * 7.0e10 / (1.25 * 0.5))
    d = materials.make_stiffness_matrix(7.0e10, 0.25)
    c = lame.lam + 2 * lame.mu
    np.testing.assert_allclose(np.diag(d), [c, c, c, lame.mu, lame.mu, lame.mu])
    assert d[0, 1] == pytest.approx(lame.lam)
    assert d[3, 4] == 0.0
    np.testing.assert_allclose(d, d.T)


def test_rayleigh_coefficients():
    damping = Damping(0.02, 10.0, 100.0)
    ray = materials.compute_rayleigh(damping)
    assert ray.alpha == pytest.approx(2 * 0.02 * 10 * 100 / 110.0)
    assert ray.beta == pytest.approx(2 * 0.02 / 110.0)


# --- load assembly (physics_test.cpp:199-228) --------------------------------


def test_load_assembly_combines_all_sources():
    mesh = single_tet_mesh()
    cfg = tet_config(
        loads={
            "gravity": [0.0, 0.0, -9.81],
            "tractions": [{"group": "LOAD_FACE", "value": [0.0, 0.0, -5000.0]}],
            "points": [{"group": "POINT_LOAD", "value": [0.0, 0.0, -200.0]}],
        }
    )
    pre = preprocess.run(mesh, cfg)
    lumped = 41.666666666666664
    np.testing.assert_allclose(pre.lumped_mass, lumped, rtol=1e-12)

    loads = loads_mod.assemble_load_vector(mesh, cfg, pre, 0.0)
    np.testing.assert_allclose(loads[:, 0], 0.0, atol=EPS)
    np.testing.assert_allclose(loads[:, 1], 0.0, atol=EPS)

    gravity = lumped * -9.81
    # triangle (1,2,3): area of right triangle with legs sqrt(2) along the
    # slanted face = sqrt(3)/2
    area = np.sqrt(3.0) / 2.0
    share = (area / 3.0) * -5000.0
    assert loads[0, 2] == pytest.approx(gravity, abs=1e-6)
    assert loads[1, 2] == pytest.approx(gravity + share, abs=1e-6)
    assert loads[2, 2] == pytest.approx(gravity + share, abs=1e-6)
    assert loads[3, 2] == pytest.approx(gravity + share - 200.0, abs=1e-6)


def test_load_curve_scaling():
    mesh = single_tet_mesh()
    cfg = tet_config(
        curves={"ramp": [[0.0, 0.0], [1.0, 1.0]]},
        loads={
            "gravity": [0.0, 0.0, 0.0],
            "tractions": [
                {"group": "LOAD_FACE", "value": [0.0, 0.0, -1.0], "scale_curve": "ramp"}
            ],
        },
    )
    pre = preprocess.run(mesh, cfg)
    half = loads_mod.assemble_load_vector(mesh, cfg, pre, 0.5)
    full = loads_mod.assemble_load_vector(mesh, cfg, pre, 1.0)
    np.testing.assert_allclose(half, 0.5 * full, atol=1e-15)


# --- newmark algebra (physics_test.cpp:234-381) -------------------------------


def test_newmark_coefficients_closed_form():
    c = newmark.make_coefficients(0.02, 0.25, 0.5)
    assert c.a0 == pytest.approx(10000.0, abs=EPS)
    assert c.a1 == pytest.approx(100.0, abs=EPS)
    assert c.a2 == pytest.approx(200.0, abs=EPS)
    assert c.a3 == pytest.approx(1.0, abs=EPS)
    assert c.a4 == pytest.approx(1.0, abs=EPS)
    assert c.a5 == pytest.approx(0.0, abs=EPS)


def test_effective_stiffness_scales_and_adds_mass():
    stiffness = np.array([[10.0, 2.0], [2.0, 6.0]])
    mass_diag = np.array([4.0, 8.0])
    coeffs = newmark.make_coefficients(0.1, 0.25, 0.5)
    ray = materials.RayleighCoefficients(0.01, 0.02)
    keff = newmark.build_effective_stiffness(stiffness, mass_diag, ray, coeffs)
    scale = 1.0 + coeffs.a1 * ray.beta
    mass_factor = coeffs.a0 + coeffs.a1 * ray.alpha
    assert keff[0, 0] == pytest.approx(10.0 * scale + 4.0 * mass_factor, abs=EPS)
    assert keff[1, 1] == pytest.approx(6.0 * scale + 8.0 * mass_factor, abs=EPS)
    assert keff[0, 1] == pytest.approx(2.0 * scale, abs=EPS)


def test_effective_rhs_consistent():
    load = np.array([5.0, -3.0])
    stiffness = np.array([[4.0, 1.0], [1.0, 2.0]])
    mass_diag = np.array([2.0, 3.0])
    coeffs = newmark.make_coefficients(0.05, 0.25, 0.5)
    ray = materials.RayleighCoefficients(0.0, 0.1)
    state = newmark.State(
        np.array([0.1, -0.2]), np.array([0.0, 0.3]), np.array([0.5, -0.1])
    )
    rhs = newmark.build_effective_rhs(load, stiffness, mass_diag, ray, coeffs, state)

    mass_term = mass_diag * (
        coeffs.a0 * state.displacement
        + coeffs.a2 * state.velocity
        + coeffs.a3 * state.acceleration
    )
    damping_rhs = (
        coeffs.a1 * state.displacement
        + coeffs.a4 * state.velocity
        + coeffs.a5 * state.acceleration
    )
    expected = load + mass_term + ray.alpha * mass_diag * damping_rhs
    expected = expected + ray.beta * (stiffness @ damping_rhs)
    np.testing.assert_allclose(rhs, expected, atol=1e-6)


def test_predictor_matches_analytic():
    coeffs = newmark.make_coefficients(0.02, 0.25, 0.5)
    state = newmark.State(
        np.array([0.1, -0.2, 0.3]),
        np.array([0.05, -0.04, 0.02]),
        np.array([0.3, -0.6, 0.9]),
    )
    u_pred, v_pred = newmark.predict_state(coeffs, state)
    dt = coeffs.dt
    expected_u = state.displacement + dt * state.velocity + dt * dt * 0.25 * state.acceleration
    expected_v = state.velocity + dt * 0.5 * state.acceleration
    np.testing.assert_allclose(u_pred, expected_u, atol=EPS)
    np.testing.assert_allclose(v_pred, expected_v, atol=EPS)


def test_update_scalars():
    coeffs = newmark.make_coefficients(0.01, 0.25, 0.5)
    scalars = newmark.compute_update_scalars(coeffs)
    assert scalars.inv_beta_dt2 == pytest.approx(1.0 / (0.25 * 0.01**2), abs=EPS)
    assert scalars.gamma_over_beta_dt == pytest.approx(0.5 / (0.25 * 0.01), abs=EPS)


def test_update_state_kinematics():
    coeffs = newmark.make_coefficients(0.1, 0.25, 0.5)
    previous = newmark.State(
        np.array([0.0, 0.0]), np.array([1.0, -1.0]), np.array([0.0, 0.5])
    )
    delta = np.array([0.2, -0.1])
    nxt = newmark.update_state(coeffs, previous, delta)
    assert nxt.displacement[0] == pytest.approx(0.2, abs=EPS)
    expected_a1 = coeffs.a0 * delta[1] - coeffs.a2 * previous.velocity[1] - coeffs.a3 * previous.acceleration[1]
    assert nxt.acceleration[1] == pytest.approx(expected_a1, rel=1e-6)
    expected_v0 = previous.velocity[0] + coeffs.dt * (
        0.5 * previous.acceleration[0] + 0.5 * nxt.acceleration[0]
    )
    assert nxt.velocity[0] == pytest.approx(expected_v0, rel=1e-6)


# --- dense oracle (physics_test.cpp:387-455) ----------------------------------


@pytest.fixture
def solver_setup():
    mesh = single_tet_mesh()
    cfg = tet_config()
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    coeffs = newmark.make_coefficients(cfg.time.initial_dt)
    state = newmark.State.zeros(mesh.dof_count)
    return mesh, cfg, pre, mats, ray, coeffs, state


def test_dense_assembly_symmetric(solver_setup):
    mesh, cfg, pre, mats, *_ = solver_setup
    assembly = oracle.assemble_linear_system(mesh, pre, mats)
    n = mesh.dof_count
    assert assembly.stiffness.shape == (n, n)
    np.testing.assert_allclose(assembly.stiffness, assembly.stiffness.T, atol=1e-6)
    assert (assembly.mass_diag >= 0.0).all()


def test_dense_stiffness_annihilates_rigid_translation(solver_setup):
    mesh, cfg, pre, mats, *_ = solver_setup
    assembly = oracle.assemble_linear_system(mesh, pre, mats)
    rigid = np.tile([1.0, -2.0, 0.5], mesh.node_count)
    np.testing.assert_allclose(
        assembly.stiffness @ rigid, 0.0, atol=1e-4
    )


def test_dirichlet_conditions_lock_surface_nodes(solver_setup):
    mesh, cfg, *_ = solver_setup
    conditions = oracle.build_dirichlet_conditions(mesh, cfg)
    for node in (0, 1, 2):
        for axis in range(3):
            assert conditions.mask[node * 3 + axis]
            assert conditions.targets[node * 3 + axis] == 0.0
    assert not conditions.mask[9:].any()


def test_dirichlet_value_targets():
    mesh = single_tet_mesh()
    cfg = tet_config(
        dirichlet={
            "fixes": [
                {"group": "FIXED", "dof": ["x", "z"], "value": [0.1, None, -0.2]}
            ]
        }
    )
    conditions = oracle.build_dirichlet_conditions(mesh, cfg)
    assert conditions.mask[0] and not conditions.mask[1] and conditions.mask[2]
    assert conditions.targets[0] == pytest.approx(0.1)
    assert conditions.targets[2] == pytest.approx(-0.2)


def test_dense_newmark_step_keeps_constraints(solver_setup):
    mesh, cfg, pre, mats, ray, coeffs, state = solver_setup
    assembly = oracle.assemble_linear_system(mesh, pre, mats)
    dirichlet = oracle.build_dirichlet_conditions(mesh, cfg)
    cfg2 = tet_config(
        loads={
            "gravity": [0.0, 0.0, 0.0],
            "points": [{"group": "POINT_LOAD", "value": [0.0, 0.0, -500.0]}],
        }
    )
    result = oracle.solve_newmark_step(
        assembly, ray, dirichlet, mesh, cfg2, pre, coeffs, state, 0.0, 1.0e-8, 256
    )
    assert result.stats.converged
    assert result.stats.residual_norm < 1.0
    for node in (0, 1, 2):
        for axis in range(3):
            assert result.state.displacement[node * 3 + axis] == pytest.approx(
                0.0, abs=EPS
            )
    # the loaded node must move
    assert abs(result.state.displacement[3 * 3 + 2]) > 0.0
