"""Newmark stepper integration tests.

Mirrors /root/reference/tests/newmark_stepper_test.cpp: full ``step()``
u/v/a vs the dense CPU oracle (3e-4 displacement / 3e-3 acceleration
relative tolerances, :230-238), pause-mode tolerance switch (:241-250), and
adaptive-dt grow+clamp telemetry (:252-269).
"""

import numpy as np
import pytest

from civiwave_tpu.config.schema import SolverSettings, TimeSettings
from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.physics import materials, newmark, oracle
from civiwave_tpu.solver.stepper import AdaptivePolicy, NewmarkStepper
from support import bar_config, bar_mesh, single_tet_mesh, tet_config


def _build_stepper(mesh, cfg, **kwargs):
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    model, state, force = pack.build_packed_model(mesh, pre, cfg, mats)
    stepper = NewmarkStepper(
        model,
        state,
        force,
        ray,
        cfg.solver,
        cfg.time,
        **kwargs,
    )
    return stepper, pre, mats, ray


@pytest.mark.parametrize("hex_elements", [False, True])
@pytest.mark.slow
def test_step_matches_dense_oracle(hex_elements):
    mesh = bar_mesh(2, 1, 1, hex_elements=hex_elements)
    cfg = bar_config()
    stepper, pre, mats, ray = _build_stepper(mesh, cfg)

    # dense twin
    assembly = oracle.assemble_linear_system(mesh, pre, mats)
    dirichlet = oracle.build_dirichlet_conditions(mesh, cfg)
    state = newmark.State.zeros(mesh.dof_count)
    n = mesh.node_count

    for frame in range(3):
        coeffs = newmark.make_coefficients(stepper.current_dt)
        load = np.asarray(stepper.external_force)[:n].reshape(-1).astype(np.float64)
        rhs_norm = np.linalg.norm(
            newmark.build_effective_rhs(
                load, assembly.stiffness, assembly.mass_diag, ray, coeffs, state
            )
        )
        dense = oracle.solve_newmark_step(
            assembly,
            ray,
            dirichlet,
            mesh,
            cfg,
            pre,
            coeffs,
            state,
            frame * stepper.current_dt,
            1.0e-8 * max(rhs_norm, 1.0),
            4000,
            external_load=load,
        )

        telemetry = stepper.step(frame * stepper.current_dt)
        assert telemetry.pcg_converged
        assert not telemetry.pcg_breakdown

        u = stepper.displacement().reshape(-1)
        v = stepper.velocity().reshape(-1)
        a = stepper.acceleration().reshape(-1)

        # newmark_stepper_test.cpp:230-238 tolerances (relative to field scale)
        u_scale = np.abs(dense.state.displacement).max() + 1e-30
        v_scale = np.abs(dense.state.velocity).max() + 1e-30
        a_scale = np.abs(dense.state.acceleration).max() + 1e-30
        np.testing.assert_allclose(u, dense.state.displacement, atol=3e-4 * u_scale)
        np.testing.assert_allclose(v, dense.state.velocity, atol=3e-3 * v_scale)
        np.testing.assert_allclose(a, dense.state.acceleration, atol=3e-3 * a_scale)

        state = dense.state


def test_constrained_nodes_stay_fixed():
    mesh, cfg = single_tet_mesh(), tet_config(
        loads={
            "gravity": [0.0, 0.0, 0.0],
            "points": [{"group": "POINT_LOAD", "value": [0.0, 0.0, -500.0]}],
        }
    )
    stepper, *_ = _build_stepper(mesh, cfg)
    for frame in range(4):
        stepper.step(frame * stepper.current_dt)
    u = stepper.displacement()
    np.testing.assert_allclose(u[:3], 0.0, atol=1e-7)
    assert abs(u[3, 2]) > 0.0


def test_pause_mode_uses_tighter_tolerance():
    mesh, cfg = single_tet_mesh(), tet_config()
    stepper, *_ = _build_stepper(mesh, cfg)
    running = stepper.step(0.0, paused_mode=False)
    paused = stepper.step(0.01, paused_mode=True)
    assert running.applied_tolerance == pytest.approx(cfg.solver.runtime_tolerance)
    assert paused.applied_tolerance == pytest.approx(cfg.solver.pause_tolerance)
    assert paused.paused_mode


def test_adaptive_dt_grows_and_clamps():
    mesh, cfg = single_tet_mesh(), tet_config(
        time={"dt": 0.01, "adaptive": True, "min_dt": 0.005, "max_dt": 0.012},
        solver={
            "type": "pcg",
            "preconditioner": "block_jacobi",
            "tol_runtime": 1.0e-4,
            "tol_pause": 1.0e-6,
            # generous cap so few iterations trigger the growth branch
            "max_iters": 500,
        },
    )
    stepper, *_ = _build_stepper(mesh, cfg)
    t1 = stepper.step(0.0)
    assert t1.dt_increased
    assert stepper.current_dt == pytest.approx(min(0.01 * 1.1, 0.012))
    t2 = stepper.step(stepper.current_dt)
    assert t2.dt_increased
    assert t2.dt_clamped_max
    assert stepper.current_dt == pytest.approx(0.012)


def test_adaptive_dt_shrinks_on_nonconvergence():
    # needs more than one free node, else block-Jacobi solves exactly in one
    # iteration regardless of tolerance
    mesh = bar_mesh(3, 1, 1)
    cfg = bar_config(
        time={"dt": 0.01, "adaptive": True, "min_dt": 0.004, "max_dt": 0.02},
        solver={
            "type": "pcg",
            "preconditioner": "block_jacobi",
            # unreachable tolerance + tiny cap forces non-convergence
            "tol_runtime": 1.0e-30,
            "tol_pause": 1.0e-30,
            "max_iters": 2,
        },
    )
    stepper, *_ = _build_stepper(mesh, cfg)
    telemetry = stepper.step(0.0)
    assert not telemetry.pcg_converged
    assert telemetry.dt_decreased
    assert stepper.current_dt == pytest.approx(0.005)


def test_non_adaptive_dt_constant():
    mesh, cfg = single_tet_mesh(), tet_config()
    stepper, *_ = _build_stepper(mesh, cfg)
    dt0 = stepper.current_dt
    stepper.step(0.0)
    assert stepper.current_dt == dt0


def test_warm_start_reduces_iterations():
    mesh = bar_mesh(2, 1, 1)
    cfg = bar_config(
        time={"dt": 0.001, "adaptive": False, "min_dt": 0.0005, "max_dt": 0.002}
    )
    stepper, *_ = _build_stepper(mesh, cfg)
    iters = []
    for frame in range(6):
        telemetry = stepper.step(frame * stepper.current_dt)
        iters.append(telemetry.pcg_iterations)
    # warm start + converging transient: later solves get cheaper
    assert iters[-1] <= iters[0]


@pytest.mark.slow
def test_fp64_vectors_reproduce_oracle_to_1e6():
    """The precision.vectors fp64 debug mode (config.hpp:152-156) must
    reproduce the dense f64 oracle to better than 1e-6 relative
    displacement — the BASELINE.md accuracy target — where fp32 vectors
    land in the 1e-4..1e-5 band.  Also quantifies the fp32 error."""
    mesh = bar_mesh(3, 2, 2, hex_elements=True)
    cfg = bar_config(tol_runtime=1.0e-12, tol_pause=1.0e-12, max_iters=4000)
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)

    # dense f64 oracle, 2 frames
    assembly = oracle.assemble_linear_system(mesh, pre, mats)
    dirichlet = oracle.build_dirichlet_conditions(mesh, cfg)
    state = newmark.State.zeros(mesh.dof_count)

    results = {}
    for precision in ("fp32", "fp64"):
        model, st0, force = pack.build_packed_model(mesh, pre, cfg, mats)
        stepper = NewmarkStepper(
            model, st0, force, ray, cfg.solver, cfg.time,
            vector_precision=precision,
        )
        for frame in range(2):
            telemetry = stepper.step(frame * stepper.current_dt)
            assert telemetry.pcg_converged
        results[precision] = stepper.displacement().reshape(-1)

    state = newmark.State.zeros(mesh.dof_count)
    n = mesh.node_count
    model, st0, force = pack.build_packed_model(mesh, pre, cfg, mats)
    for frame in range(2):
        coeffs = newmark.make_coefficients(cfg.time.initial_dt)
        load = np.asarray(force)[:n].reshape(-1).astype(np.float64)
        dense = oracle.solve_newmark_step(
            assembly, ray, dirichlet, mesh, cfg, pre, coeffs, state,
            frame * cfg.time.initial_dt, 1.0e-14, 8000, external_load=load,
        )
        state = dense.state

    u_ref = dense.state.displacement
    scale = np.abs(u_ref).max()
    err64 = np.abs(results["fp64"] - u_ref).max() / scale
    err32 = np.abs(results["fp32"] - u_ref).max() / scale
    assert err64 < 1.0e-6, f"fp64-vector reproduction {err64:.2e} > 1e-6"
    assert err32 < 1.0e-3  # fp32 contract stays in its documented band
    assert err64 < err32  # and fp64 is strictly tighter


def test_named_scopes_in_lowered_program():
    """The profiler name scopes (the TPU analogue of the reference's RGP
    debug labels, vulkan_context.cpp:777-813) survive into the lowered
    program so jax.profiler traces group ops by phase."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.solver.stepper import newmark_step

    cfg = tet_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, force = build_structured_model(
        3, 3, 3, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e5),
    )
    step = partial(
        newmark_step, rayleigh_alpha=0.1, rayleigh_beta=1e-4
    )
    lowered = jax.jit(step).lower(
        model, model.zero_state(), force,
        jnp.float64(1e-3), jnp.float64(1e-4), jnp.int32(32),
    )
    text = lowered.as_text(debug_info=True)
    for scope in (
        "newmark_predictor",
        "effective_rhs",
        "pcg_solve",
        "pcg_matvec",
        "pcg_precondition",
        "newmark_update",
    ):
        assert scope in text, f"named scope '{scope}' missing from HLO"


@pytest.mark.slow
def test_warm_start_policy_solution_matches_predictor_trajectory():
    """warm_start_policy='solution' (the reference's previous-solution
    seed, newmark_stepper.cpp:1120-1133) and the default 'predictor' seed
    must produce the same trajectory to solver tolerance — the seed only
    changes the iteration count, never the converged solution (ADR-17)."""
    import jax.numpy as jnp
    from functools import partial

    from civiwave_tpu.solver.stepper import newmark_step

    mesh = bar_mesh(3, 2, 2, hex_elements=True)
    cfg = bar_config(tol_runtime=1.0e-8, max_iters=2000)
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    model, state0, force = pack.build_packed_model(mesh, pre, cfg, mats)

    results = {}
    for policy in ("solution", "predictor", "delta"):
        step = partial(
            newmark_step,
            rayleigh_alpha=ray.alpha,
            rayleigh_beta=ray.beta,
            warm_start_policy=policy,
        )
        s = state0
        iters = 0
        for _ in range(4):
            out = step(model, s, force, 1.0e-3, 1.0e-8, 2000)
            assert bool(out.pcg.converged)
            s = out.state
            iters += int(out.pcg.iterations)
        results[policy] = (np.asarray(s.displacement), iters)

    u_sol, _ = results["solution"]
    u_pred, _ = results["predictor"]
    u_delta, _ = results["delta"]
    scale = np.abs(u_sol).max()
    np.testing.assert_allclose(u_pred, u_sol, atol=1.0e-5 * scale)
    # "delta" (predictor + previous implicit correction) is trajectory-
    # equivalent too; at 50.3M/tol 2e-4 it measured a wash vs predictor
    # (24.5 vs 24.8 iters/step) — kept as an opt-in policy (ADR-17)
    np.testing.assert_allclose(u_delta, u_sol, atol=1.0e-5 * scale)


@pytest.mark.slow
def test_solver_settings_knobs_thread_into_stepper():
    """YAML solver.variant / solver.warm_start_policy reach the stepper
    (round-2 ADVICE: the 'solution' parity policy must be reachable from a
    production entry point), and a fused-variant stepper's trajectory
    matches the classic one."""
    import dataclasses

    mesh = bar_mesh(3, 2, 2, hex_elements=True)
    cfg = bar_config()
    solver_fused = dataclasses.replace(
        cfg.solver, variant="fused", warm_start_policy="solution"
    )

    stepper_classic, *_ = _build_stepper(mesh, cfg)
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    model, state, force = pack.build_packed_model(mesh, pre, cfg, mats)
    stepper_fused = NewmarkStepper(
        model, state, force, ray, solver_fused, cfg.time
    )
    assert stepper_fused.solver_variant == "fused"
    assert stepper_fused.warm_start_policy == "solution"
    # the YAML default is now 'auto' (ADR-22), which resolves to the
    # classic loop on small/CPU models inside solve_pcg
    assert stepper_classic.solver_variant == "auto"
    assert stepper_classic.warm_start_policy == "predictor"

    for frame in range(3):
        t = frame * 1.0e-3
        tel_c = stepper_classic.step(t)
        tel_f = stepper_fused.step(t)
        assert tel_c.pcg_converged and tel_f.pcg_converged
    u_c = stepper_classic.displacement()
    u_f = stepper_fused.displacement()
    scale = np.abs(u_c).max() + 1e-30
    np.testing.assert_allclose(u_f, u_c, atol=2e-4 * scale)
