"""Analytic validation matrix — physics grounded in closed forms.

The reference declares this matrix (/root/reference/docs/validation.md:8-23:
cantilever tip deflection vs beam theory, modal response, transient energy
balance) but never implemented it; every other test here and there pins
device results to a CPU oracle twin that shares the formulas, so a shared
formulation bug would be invisible.  These tests check against INDEPENDENT
closed-form mechanics:

1. slender-cantilever tip deflection vs Euler-Bernoulli + Timoshenko shear
   (static solve, structured AND general hex paths, plus a tet-path
   convergence check — tet4 is constant-strain and converges from the
   stiff side, documented in docs/validation.md);
2. lowest axial eigenfrequency of a fixed-free bar (nu = 0, so the 3-D
   model reduces exactly to the 1-D rod): free-vibration trajectory from
   a static stretch, period from zero crossings, vs f1 = c / (4 L);
3. transient energy balance under Rayleigh damping: external work =
   kinetic + strain + dissipated, using the DENSE oracle K for the energy
   forms (independent of the matrix-free operator being tested).

Measured errors are recorded in docs/validation.md's results table; the
assertion bands are set ~2x above the measured values.
"""

import numpy as np
import pytest

from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.physics import materials, oracle
from civiwave_tpu.solver.static import solve_static_jit
from civiwave_tpu.solver.stepper import newmark_step
from civiwave_tpu.utils.synthetic import box_mesh, cantilever_config


def _pack_model(mesh, cfg):
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, state, force = pack.build_packed_model(mesh, pre, cfg, mats)
    return pre, mats, model, state, force


# ---------------------------------------------------------------------------
# 1. cantilever tip deflection vs beam theory


def _beam_theory_deflection(length, width, depth, e_mod, nu, traction):
    """Tip deflection of an end-loaded cantilever: Euler-Bernoulli bending
    + Timoshenko shear (rectangular shear factor k = 10(1+nu)/(12+11nu))."""
    area = width * depth
    load = traction * area  # uniform end traction resultant
    inertia = width * depth**3 / 12.0
    g_mod = e_mod / (2.0 * (1.0 + nu))
    k_shear = 10.0 * (1.0 + nu) / (12.0 + 11.0 * nu)
    bending = load * length**3 / (3.0 * e_mod * inertia)
    shear = load * length / (k_shear * g_mod * area)
    return bending + shear


_E, _NU, _RHO = 2.0e11, 0.3, 7800.0
_TRACTION = -1.0e6


def _tip_deflection_general(nx, ny, nz, hex_elements, spacing=1.0):
    cfg = cantilever_config(traction=_TRACTION)
    mesh = box_mesh(nx, ny, nz, hex_elements=hex_elements, spacing=spacing)
    _, _, model, _, force = _pack_model(mesh, cfg)
    u, pcg = solve_static_jit(model, force, tolerance=1.0e-8)
    assert bool(pcg.converged)
    u_nodal = np.asarray(model.to_nodal(u))
    tip = np.isclose(mesh.node_positions[:, 0], nx * spacing)
    return float(u_nodal[tip, 2].mean())


def test_tip_deflection_hex_general_path():
    # 30x3x3 unit cells: L/h = 10 slender beam
    measured = _tip_deflection_general(30, 3, 3, hex_elements=True)
    analytic = _beam_theory_deflection(30.0, 3.0, 3.0, _E, _NU, _TRACTION)
    rel_err = abs(measured - analytic) / abs(analytic)
    # hex8 full integration converges from the stiff side (parasitic
    # shear + 3-D clamp restraint); measured ~4-5% low at this resolution
    assert rel_err < 0.10, (measured, analytic, rel_err)


def test_tip_deflection_hex_structured_path():
    from civiwave_tpu.mesh.structured import build_structured_model

    cfg = cantilever_config(traction=_TRACTION)
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, force = build_structured_model(
        30, 3, 3, mats[0], _RHO, traction=(0.0, 0.0, _TRACTION)
    )
    u, pcg = solve_static_jit(model, force, tolerance=1.0e-8)
    assert bool(pcg.converged)
    u_nodal = np.asarray(model.to_nodal(u)).reshape(31, 4, 4, 3)
    measured = float(u_nodal[30, :, :, 2].mean())
    analytic = _beam_theory_deflection(30.0, 3.0, 3.0, _E, _NU, _TRACTION)
    rel_err = abs(measured - analytic) / abs(analytic)
    assert rel_err < 0.10, (measured, analytic, rel_err)
    # and the two hex paths agree with each other far tighter
    general = _tip_deflection_general(30, 3, 3, hex_elements=True)
    assert abs(measured - general) / abs(analytic) < 5e-3


@pytest.mark.slow
def test_tip_deflection_tet_converges_toward_beam_theory():
    """tet4 is constant-strain: stiff at coarse resolution, converging
    toward the analytic value under refinement (monotone from below in
    magnitude).  Documents the measured convergence in docs/validation.md.
    """
    analytic = _beam_theory_deflection(30.0, 3.0, 3.0, _E, _NU, _TRACTION)
    coarse = _tip_deflection_general(30, 3, 3, hex_elements=False)
    # same physical beam at half the element size (spacing 0.5)
    fine = _tip_deflection_general(60, 6, 6, hex_elements=False, spacing=0.5)
    err_coarse = abs(coarse - analytic) / abs(analytic)
    err_fine = abs(fine - analytic) / abs(analytic)
    assert err_fine < err_coarse, (err_coarse, err_fine)
    assert err_fine < 0.25, (fine, analytic, err_fine)


# ---------------------------------------------------------------------------
# 2. lowest axial eigenfrequency of a fixed-free bar (nu = 0 -> exact rod)


def test_axial_eigenfrequency_free_vibration():
    length_cells = 24
    cfg = cantilever_config(
        traction=1.0e8,  # placeholder; loads overridden below
        materials=[
            {"name": "steel", "E": 2.0e11, "nu": 0.0, "rho": 7800.0}
        ],
        loads={
            "gravity": [0.0, 0.0, 0.0],
            "tractions": [
                {"group": "LOAD_FACE", "value": [1.0e8, 0.0, 0.0]}
            ],
        },
    )
    mesh = box_mesh(length_cells, 2, 2, hex_elements=True)
    _, _, model, _, force = _pack_model(mesh, cfg)

    # static stretch as the initial condition (1e-8: the f32-vector floor)
    u0, pcg = solve_static_jit(model, force, tolerance=1.0e-8)
    assert bool(pcg.converged)

    import jax
    import jax.numpy as jnp

    from civiwave_tpu.mesh.pack import SimState

    # consistent initial acceleration: a0 = M^-1 (0 - K u0) on free rows
    ku = model.apply_keff(u0, np.float32(1.0), np.float32(0.0))
    mass = np.asarray(model.lumped_mass)
    safe_m = np.where(mass > 0, mass, 1.0)[:, None]
    a0 = np.where(
        np.asarray(model.bc_mask), 0.0, -np.asarray(ku) / safe_m
    ).astype(np.float32)

    zero = jnp.zeros(model.vector_shape, jnp.float32)
    state = SimState(u0, zero, jnp.asarray(a0), u0)

    c_rod = np.sqrt(2.0e11 / 7800.0)
    f_analytic = c_rod / (4.0 * length_cells)
    period = 1.0 / f_analytic
    dt = period / 64.0

    step = jax.jit(
        lambda m, s, f: newmark_step(
            m, s, f, dt, 1.0e-10, 500,
            rayleigh_alpha=0.0, rayleigh_beta=0.0,
        )
    )
    # released: zero external force; record tip axial displacement
    tip_mask = np.isclose(mesh.node_positions[:, 0], length_cells)
    trace = []
    n_steps = 170  # ~2.6 periods
    for _ in range(n_steps):
        out = step(model, state, zero)
        state = out.state
        u_nodal = np.asarray(model.to_nodal(state.displacement))
        trace.append(float(u_nodal[tip_mask, 0].mean()))

    trace = np.asarray(trace)
    # period from upward zero crossings with linear interpolation
    sign = trace > 0
    ups = np.nonzero(~sign[:-1] & sign[1:])[0]
    assert len(ups) >= 2, "trajectory must cross zero at least twice"
    times = []
    for i in ups:
        frac = -trace[i] / (trace[i + 1] - trace[i])
        times.append((i + frac) * dt)
    measured_period = float(np.mean(np.diff(times)))
    f_measured = 1.0 / measured_period
    rel_err = abs(f_measured - f_analytic) / f_analytic
    assert rel_err < 0.02, (f_measured, f_analytic, rel_err)


# ---------------------------------------------------------------------------
# 3. transient energy balance under Rayleigh damping


def test_energy_balance_rayleigh():
    cfg = cantilever_config(traction=-1.0e6, tol_runtime=1.0e-10)
    mesh = box_mesh(4, 2, 2, hex_elements=True)
    pre, mats, model, state, force = _pack_model(mesh, cfg)
    ray = materials.compute_rayleigh(cfg.damping)

    # independent dense energy forms from the oracle assembly
    assembly = oracle.assemble_linear_system(mesh, pre, mats)
    k_dense = assembly.stiffness  # (3n, 3n) f64
    m_diag = assembly.mass_diag  # (3n,)

    import jax
    import jax.numpy as jnp

    dt = 1.0e-3
    # tol 1e-9 relative: tight enough for a ~1e-4 balance check; 1e-10
    # trips the breakdown telemetry at f64 machine precision
    step = jax.jit(
        lambda m, s, f: newmark_step(
            m, s, f, dt, 1.0e-9, 2000,
            rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
            vector_precision="fp64",
        )
    )
    # consistent initial acceleration a0 = M^-1 F: the discrete Newmark
    # energy identity assumes dynamic equilibrium at BOTH step endpoints;
    # starting from a = 0 under a suddenly-applied load breaks it at the
    # first step (~4% balance error, measured)
    mass = np.asarray(model.lumped_mass)
    safe_m = np.where(mass > 0, mass, 1.0)[:, None]
    a0 = np.where(
        np.asarray(model.bc_mask), 0.0, np.asarray(force) / safe_m
    )
    state = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), state)
    import dataclasses

    state = dataclasses.replace(
        state, acceleration=jnp.asarray(a0, jnp.float64)
    )
    f_host = np.asarray(model.to_nodal(force), np.float64).reshape(-1)

    def energies(u, v):
        kinetic = 0.5 * float(m_diag @ (v * v))
        strain = 0.5 * float(u @ (k_dense @ u))
        return kinetic, strain

    work = 0.0
    dissipated = 0.0
    u_prev = np.zeros_like(f_host)
    v_prev = np.zeros_like(f_host)
    n_steps = 40
    for _ in range(n_steps):
        out = step(model, state, force)
        assert bool(out.pcg.converged) or float(
            out.pcg.residual_norm
        ) < 1e-8 * float(out.pcg.rhs_norm)
        state = out.state
        u = np.asarray(model.to_nodal(state.displacement), np.float64).reshape(-1)
        v = np.asarray(model.to_nodal(state.velocity), np.float64).reshape(-1)
        du = u - u_prev
        work += float(f_host @ du)  # constant load: exact work increment
        v_mid = 0.5 * (v + v_prev)
        cv = ray.alpha * (m_diag * v_mid) + ray.beta * (k_dense @ v_mid)
        dissipated += dt * float(v_mid @ cv)
        u_prev, v_prev = u, v

    kinetic, strain = energies(u_prev, v_prev)
    balance = kinetic + strain + dissipated
    rel_err = abs(work - balance) / max(abs(work), 1e-30)
    # Newmark average acceleration is exactly energy-consistent for the
    # trapezoidal work/dissipation quadrature; residual error comes from
    # the PCG tolerance and the f64 transfer, measured ~1e-4
    assert rel_err < 2.0e-3, (work, kinetic, strain, dissipated, rel_err)
