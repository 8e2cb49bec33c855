"""Vec3 invariants (test_sample.cpp parity) + interactive session behavior
(SimulationBackend, viewer.cpp:187-360)."""

import os

import numpy as np
import pytest

from civiwave_tpu.utils.vec3 import cross, dot, magnitude, safe_normalize


# --- math.hpp invariants (tests/test_sample.cpp, 8 cases) -------------------


def test_dot_symmetry_and_orthogonality():
    a, b = np.array([1.0, 2.0, 3.0]), np.array([-4.0, 5.0, 0.5])
    assert dot(a, b) == pytest.approx(dot(b, a))
    assert dot([1, 0, 0], [0, 1, 0]) == 0.0


def test_cross_right_handed_basis():
    np.testing.assert_allclose(cross([1, 0, 0], [0, 1, 0]), [0, 0, 1])
    np.testing.assert_allclose(cross([0, 1, 0], [0, 0, 1]), [1, 0, 0])


def test_cross_annihilates_parallel():
    a = np.array([2.0, -1.0, 0.5])
    np.testing.assert_allclose(cross(a, 3.0 * a), 0.0, atol=1e-15)


def test_cross_antisymmetry():
    a, b = np.array([1.0, 2.0, 3.0]), np.array([-4.0, 5.0, 0.5])
    np.testing.assert_allclose(cross(a, b), -cross(b, a))


def test_magnitude_pythagorean():
    assert magnitude([3.0, 4.0, 0.0]) == pytest.approx(5.0)


def test_safe_normalize_unit_result():
    v = safe_normalize([3.0, 4.0, 0.0])
    assert magnitude(v) == pytest.approx(1.0)
    np.testing.assert_allclose(v, [0.6, 0.8, 0.0])


def test_safe_normalize_zero_vector_is_zero():
    """math.hpp:181-191 — below-threshold input gives exact zero, not NaN."""
    np.testing.assert_array_equal(safe_normalize([0.0, 0.0, 0.0]), 0.0)
    np.testing.assert_array_equal(safe_normalize([1e-13, 0.0, 0.0]), 0.0)


def test_safe_normalize_nonfinite_is_zero():
    np.testing.assert_array_equal(safe_normalize([np.inf, 0.0, 0.0]), 0.0)
    np.testing.assert_array_equal(safe_normalize([np.nan, 1.0, 0.0]), 0.0)


def test_safe_normalize_batched():
    vs = np.array([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]])
    out = safe_normalize(vs)
    np.testing.assert_allclose(out[0], [0.6, 0.8, 0.0])
    np.testing.assert_array_equal(out[1], 0.0)


# --- interactive session (viewer.cpp SimulationBackend) ---------------------


@pytest.fixture(scope="module")
def session():
    from civiwave_tpu.runner import build_simulation
    from civiwave_tpu.ui import InteractiveSession

    scenario = os.path.join(os.path.dirname(__file__), "data", "cantilever.yaml")
    sim = build_simulation(scenario, mesh_root=os.path.dirname(os.path.dirname(os.path.dirname(scenario))))
    return sim, InteractiveSession(sim)


def test_interactive_solve_is_repeatable(session):
    """Every solve restarts from the baseline (viewer.cpp:255-278), so the
    same request must yield the same state."""
    from civiwave_tpu.ui import PointLoadRequest

    sim, ses = session
    req = PointLoadRequest(
        enabled=True, anchor=3, direction=(0, 0, -1), magnitude_newtons=1e4
    )
    tel1, derived1 = ses.solve(req)
    u1 = sim.stepper.displacement()
    tel2, derived2 = ses.solve(req)
    u2 = sim.stepper.displacement()
    np.testing.assert_array_equal(u1, u2)
    assert tel1.pcg_converged and tel2.pcg_converged
    np.testing.assert_array_equal(
        derived1.node_von_mises, derived2.node_von_mises
    )


def test_point_load_changes_solution(session):
    from civiwave_tpu.ui import PointLoadRequest

    sim, ses = session
    _, derived_free = ses.solve(PointLoadRequest(enabled=False))
    u_free = sim.stepper.displacement()
    _, derived_loaded = ses.solve(
        PointLoadRequest(
            enabled=True, anchor=3, direction=(0, 0, -1), magnitude_newtons=1e5
        )
    )
    u_loaded = sim.stepper.displacement()
    # the loaded solve deflects the free node further down
    assert u_loaded[3, 2] < u_free[3, 2]


def test_degenerate_direction_falls_back_minus_z(session):
    """viewer.cpp:327-333: near-zero direction becomes (0, 0, -1)."""
    from civiwave_tpu.ui import PointLoadRequest

    sim, ses = session
    ses.solve(
        PointLoadRequest(
            enabled=True, anchor=3, direction=(0.0, 0.0, 0.0),
            magnitude_newtons=1e5,
        )
    )
    u_degenerate = sim.stepper.displacement()
    ses.solve(
        PointLoadRequest(
            enabled=True, anchor=3, direction=(0.0, 0.0, -1.0),
            magnitude_newtons=1e5,
        )
    )
    u_explicit = sim.stepper.displacement()
    np.testing.assert_array_equal(u_degenerate, u_explicit)


def test_reset_restores_baseline(session):
    from civiwave_tpu.ui import PointLoadRequest

    sim, ses = session
    ses.solve(
        PointLoadRequest(enabled=True, anchor=3, magnitude_newtons=1e5)
    )
    ses.reset()
    np.testing.assert_array_equal(sim.stepper.displacement(), 0.0)


def test_display_stress_overlay_directional_decay():
    """Host twin of recompute_display_stress (viewer.cpp:2940-2999):
    anchor gets the full boost, aligned vertices decay exponentially with
    distance, anti-aligned vertices are untouched."""
    import numpy as np

    from civiwave_tpu.ui.session import (
        PointLoadRequest,
        display_stress_overlay,
        estimate_auto_falloff,
        stress_reference_range,
    )

    pos = np.array(
        [[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0], [-1.0, 0, 0]], np.float64
    )
    vm = np.array([10.0, 5.0, 2.0, 4.0])
    req = PointLoadRequest(
        enabled=True, anchor=0, direction=(1.0, 0.0, 0.0),
        magnitude_newtons=1.0,
    )
    display, falloff = display_stress_overlay(pos, vm, req)
    assert 0.05 <= falloff <= 2.0
    ref = stress_reference_range(vm)
    assert display[0] == pytest.approx(vm[0] + ref)  # anchor: full boost
    assert display[3] == pytest.approx(vm[3])  # anti-aligned: untouched
    b1, b2 = display[1] - vm[1], display[2] - vm[2]
    assert b1 > b2 > 0.0  # exponential decay along the direction
    assert b1 / b2 == pytest.approx(np.exp(falloff), rel=1e-5)

    # disabled request: pure (scaled) base field, falloff still derived
    display_off, _ = display_stress_overlay(
        pos, vm, PointLoadRequest(enabled=False)
    )
    np.testing.assert_allclose(display_off, vm)

    # degenerate field: default falloff
    assert estimate_auto_falloff(pos, np.zeros(4), 0) == pytest.approx(0.35)
