"""Matrix-free vs dense parity — the heavyweight integration suite.

Mirrors /root/reference/tests/pcg_test.cpp:
* ``apply_keff`` output vs dense K_eff . x elementwise within
  max(1e-4, 3e-4 * |ref|) (pcg_test.cpp:255-256);
* ``solve_pcg`` displacement vs the dense oracle within 2.5e-4
  (pcg_test.cpp:358);
plus block-Jacobi and hex8 coverage beyond the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.ops.apply_keff import apply_keff
from civiwave_tpu.ops.block_jacobi import (
    apply_preconditioner,
    assemble_node_blocks,
    build_block_jacobi_inverse,
    invert_spd_3x3,
)
from civiwave_tpu.physics import materials, newmark, oracle
from civiwave_tpu.solver.pcg import solve_pcg
from support import bar_config, bar_mesh, single_tet_mesh, tet_config


def _setup(mesh, cfg, dt=0.01):
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    coeffs = newmark.make_coefficients(dt)
    model, state, force = pack.build_packed_model(mesh, pre, cfg, mats)
    assembly = oracle.assemble_linear_system(mesh, pre, mats)
    dirichlet = oracle.build_dirichlet_conditions(mesh, cfg)
    return pre, mats, ray, coeffs, model, state, force, assembly, dirichlet


def _dense_keff_apply(assembly, dirichlet, coeffs, ray, x_flat):
    """Dense twin of the matrix-free operator with identity Dirichlet rows."""
    scale = 1.0 + coeffs.a1 * ray.beta
    mass_factor = coeffs.a0 + coeffs.a1 * ray.alpha
    x_san = np.where(dirichlet.mask, 0.0, x_flat)
    out = scale * (assembly.stiffness @ x_san) + mass_factor * (
        assembly.mass_diag * x_san
    )
    return np.where(dirichlet.mask, x_flat, out)


@pytest.mark.parametrize("mesh_kind", ["tet", "bar_tet", "bar_hex"])
def test_apply_keff_matches_dense(mesh_kind, rng):
    if mesh_kind == "tet":
        mesh, cfg = single_tet_mesh(), tet_config()
    elif mesh_kind == "bar_tet":
        mesh, cfg = bar_mesh(3, 1, 1), bar_config()
    else:
        mesh, cfg = bar_mesh(3, 1, 1, hex_elements=True), bar_config()

    pre, mats, ray, coeffs, model, state, force, assembly, dirichlet = _setup(mesh, cfg)

    n = mesh.node_count
    x = rng.standard_normal((n, 3)).astype(np.float32) * 0.01
    x_pad = np.zeros((model.padded_node_count, 3), np.float32)
    x_pad[:n] = x

    scale = np.float32(1.0 + coeffs.a1 * ray.beta)
    mass_factor = np.float32(coeffs.a0 + coeffs.a1 * ray.alpha)
    got = np.asarray(
        jax.jit(apply_keff)(model, jnp.asarray(x_pad), scale, mass_factor)
    )[:n].reshape(-1)

    ref = _dense_keff_apply(assembly, dirichlet, coeffs, ray, x.reshape(-1).astype(np.float64))

    # pcg_test.cpp:255-256 tolerance: max(1e-4, 3e-4 * |ref|)
    tol = np.maximum(1e-4, 3e-4 * np.abs(ref))
    # scale tolerance by stiffness magnitude since E ~ 1e10 makes abs values huge
    tol = np.maximum(tol, 1e-6 * np.abs(ref).max())
    np.testing.assert_array_less(np.abs(got - ref), tol + 1e-30)


def test_apply_keff_identity_on_constrained(rng):
    mesh, cfg = single_tet_mesh(), tet_config()
    _, _, ray, coeffs, model, _, _, _, _ = _setup(mesh, cfg)
    x = rng.standard_normal((model.padded_node_count, 3)).astype(np.float32)
    out = np.asarray(apply_keff(model, jnp.asarray(x), 1.0, 0.0))
    mask = np.asarray(model.bc_mask)
    np.testing.assert_array_equal(out[mask], x[mask])


def test_block_jacobi_matches_dense_blocks(rng):
    mesh, cfg = bar_mesh(2, 1, 1), bar_config()
    pre, mats, ray, coeffs, model, _, _, assembly, dirichlet = _setup(mesh, cfg)
    scale = 1.0 + coeffs.a1 * ray.beta
    mass_factor = coeffs.a0 + coeffs.a1 * ray.alpha

    blocks = np.asarray(assemble_node_blocks(model, np.float32(scale), np.float32(mass_factor)))
    n = mesh.node_count
    keff = newmark.build_effective_stiffness(
        assembly.stiffness, assembly.mass_diag, ray, coeffs
    )
    for node in range(n):
        dense_block = keff[node * 3 : node * 3 + 3, node * 3 : node * 3 + 3]
        np.testing.assert_allclose(blocks[node], dense_block, rtol=3e-4)


def test_invert_spd_3x3_regular():
    m = jnp.asarray(
        np.array([[[4.0, 1.0, 0.0], [1.0, 3.0, 0.5], [0.0, 0.5, 2.0]]], np.float64)
    )
    inv = np.asarray(invert_spd_3x3(m))[0]
    np.testing.assert_allclose(inv @ np.asarray(m)[0], np.eye(3), atol=1e-12)


def test_invert_spd_3x3_singular_fallback():
    m = jnp.asarray(np.zeros((1, 3, 3), np.float64))
    inv = np.asarray(invert_spd_3x3(m))[0]
    # diagonal fallback 1/max(d, 1e-6) after failed regularization
    assert np.isfinite(inv).all()
    assert inv[0, 0] > 0.0


def test_preconditioner_zeroes_constrained(rng):
    mesh, cfg = single_tet_mesh(), tet_config()
    _, _, _, _, model, _, _, _, _ = _setup(mesh, cfg)
    binv = build_block_jacobi_inverse(model, 1.0, 0.0)
    r = jnp.asarray(rng.standard_normal((model.padded_node_count, 3)).astype(np.float32))
    z = np.asarray(apply_preconditioner(model, binv, r))
    mask = np.asarray(model.bc_mask)
    np.testing.assert_array_equal(z[mask], 0.0)


@pytest.mark.parametrize("mesh_kind", ["bar_tet", "bar_hex"])
@pytest.mark.slow
def test_solve_pcg_matches_dense_oracle(mesh_kind):
    """Full solve parity: matrix-free PCG vs dense-CG oracle
    (pcg_test.cpp:263-361)."""
    hex_elements = mesh_kind == "bar_hex"
    mesh = bar_mesh(3, 1, 1, hex_elements=hex_elements)
    cfg = bar_config()
    pre, mats, ray, coeffs, model, state, force, assembly, dirichlet = _setup(mesh, cfg)

    prev = newmark.State.zeros(mesh.dof_count)

    # shared effective RHS (with Dirichlet clamp) to scale tolerances:
    # the oracle takes an ABSOLUTE tolerance (solver.cpp:159-225), the
    # matrix-free solver a RELATIVE one (pcg.cpp:790)
    load = np.asarray(jax.device_get(force))[: mesh.node_count].reshape(-1)
    rhs_flat = newmark.build_effective_rhs(
        load.astype(np.float64), assembly.stiffness, assembly.mass_diag, ray, coeffs, prev
    )
    rhs_flat = np.where(
        dirichlet.mask, dirichlet.targets - prev.displacement, rhs_flat
    )
    rhs_norm = np.linalg.norm(rhs_flat)

    # 1e-8 relative: the dense K_eff condition number is ~1e12 for this
    # stiff bar, so diag-CG stalls below that
    dense = oracle.solve_newmark_step(
        assembly, ray, dirichlet, mesh, cfg, pre, coeffs, prev, 0.0,
        1.0e-8 * rhs_norm, 2000,
    )
    assert dense.stats.converged

    rhs = np.zeros((model.padded_node_count, 3), np.float32)
    rhs[: mesh.node_count] = rhs_flat.reshape(-1, 3).astype(np.float32)

    scale = np.float32(1.0 + coeffs.a1 * ray.beta)
    mass_factor = np.float32(coeffs.a0 + coeffs.a1 * ray.alpha)
    x0 = jnp.zeros((model.padded_node_count, 3), jnp.float32)
    solution, telemetry = jax.jit(solve_pcg, static_argnames="warm_start")(
        model, jnp.asarray(rhs), scale, mass_factor, 1.0e-7, 2000, x0, warm_start=False
    )
    assert bool(telemetry.converged)
    assert not bool(telemetry.breakdown)
    got = np.asarray(solution)[: mesh.node_count].reshape(-1)

    # displacement increment parity, pcg_test.cpp:358 tolerance 2.5e-4
    # (relative to the displacement scale)
    dense_delta = dense.state.displacement - prev.displacement
    scale_ref = np.abs(dense_delta).max() + 1e-30
    np.testing.assert_allclose(got, dense_delta, atol=2.5e-4 * scale_ref)


def test_solve_pcg_zero_rhs_converges_immediately():
    mesh, cfg = single_tet_mesh(), tet_config()
    _, _, ray, coeffs, model, _, _, _, _ = _setup(mesh, cfg)
    rhs = jnp.zeros((model.padded_node_count, 3), jnp.float32)
    x0 = jnp.zeros_like(rhs)
    solution, telemetry = solve_pcg(
        model, rhs, 1.0, 1.0, 1.0e-6, 100, x0, warm_start=False
    )
    assert int(telemetry.iterations) == 0
    assert bool(telemetry.converged)
    np.testing.assert_array_equal(np.asarray(solution), 0.0)


def test_solve_pcg_warm_start_reuses_solution():
    mesh = bar_mesh(2, 1, 1)
    cfg = bar_config()
    pre, mats, ray, coeffs, model, state, force, assembly, dirichlet = _setup(mesh, cfg)
    rhs_np = np.zeros((model.padded_node_count, 3), np.float32)
    rhs_np[: mesh.node_count] = (
        np.asarray(jax.device_get(force))[: mesh.node_count] * 1.0e-6
    )
    rhs = jnp.asarray(rhs_np)
    x0 = jnp.zeros_like(rhs)
    scale, mass_factor = np.float32(1.0), np.float32(coeffs.a0)
    sol1, tel1 = solve_pcg(model, rhs, scale, mass_factor, 1e-5, 500, x0, warm_start=False)
    sol2, tel2 = solve_pcg(model, rhs, scale, mass_factor, 1e-5, 500, sol1, warm_start=True)
    assert int(tel2.iterations) <= max(int(tel1.iterations) // 4, 1)


@pytest.mark.slow
def test_fp32_reduction_precision_converges():
    """The YAML precision.reductions=fp32 knob (config.hpp:152-156): dots
    reduce in f32; the solve still converges and the telemetry dtype
    follows the knob."""
    mesh, cfg = bar_mesh(3, 1, 1, hex_elements=True), bar_config()
    _, _, ray, coeffs, model, _, force, _, _ = _setup(mesh, cfg)
    rhs = jnp.where(model.bc_mask, model.bc_value, force)
    scale, mf = np.float32(1.0), np.float32(coeffs.a0)
    sol64, tel64 = solve_pcg(
        model, rhs, scale, mf, 1e-6, 500, jnp.zeros_like(rhs),
        warm_start=False,
    )
    sol32, tel32 = solve_pcg(
        model, rhs, scale, mf, 1e-6, 500, jnp.zeros_like(rhs),
        warm_start=False, reduction_dtype=jnp.float32,
    )
    assert bool(tel64.converged) and bool(tel32.converged)
    assert tel32.residual_norm.dtype == jnp.float32
    ref = np.abs(np.asarray(sol64)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(sol32), np.asarray(sol64), atol=1e-4 * ref
    )


def test_unrolled_hex_forces_match_allgp_einsum(rng):
    """The per-Gauss-point unrolled hex force phase (the memory-bounding
    form, ops/apply_keff.py) must equal the reference all-gp einsum to
    f32 summation-order noise."""
    from civiwave_tpu.mesh.pack import build_packed_model
    from civiwave_tpu.ops import apply_keff as ak
    from civiwave_tpu.ops.apply_keff import _stress
    from civiwave_tpu.utils.synthetic import box_mesh, cantilever_config

    cfg = cantilever_config()
    mesh = box_mesh(5, 4, 3, hex_elements=True)
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, state, _f = build_packed_model(mesh, pre, cfg, mats)
    x = jnp.asarray(
        rng.standard_normal((model.padded_node_count, 3)).astype(np.float32)
    )
    ss = np.float32(1.1)
    xs = ak.sanitize(model, x)
    out = np.asarray(ak.hex_forces(model, xs, ss))

    u_e = xs[model.conn_hex]
    # element-major view of the gp-major transposed table
    grads = jnp.transpose(model.grads_hex, (3, 0, 1, 2))  # (H, 8g, 8l, 3)
    g_tensor = jnp.einsum("hgla,hlb->hgab", grads, u_e)
    stress = _stress(
        g_tensor, model.lam_hex[:, None], model.mu_hex[:, None]
    )
    weighted = (model.vol_hex.T * ss)[:, :, None, None] * stress
    ref = np.asarray(
        jnp.einsum("hgla,hgab->hlb", grads, weighted).reshape(-1, 3)
    )
    np.testing.assert_allclose(
        out, ref, atol=1e-6 * np.abs(ref).max(), rtol=1e-5
    )


# ---------------------------------------------------------------------------
# fused (Chronopoulos-Gear single-reduction) variant
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mesh_kind", ["bar_tet", "bar_hex"])
@pytest.mark.slow
def test_fused_variant_matches_classic(mesh_kind):
    """solver.variant='fused' reproduces the classic trajectory at the
    production tolerances (2e-4 runtime / 1e-5 pause, docs/spec.md:28).

    The recurred s = A p drifts from the true product by f32 rounding, so
    at tolerances far tighter than the contract the fused variant needs
    extra iterations (measured: 49 vs 40 at 1e-7 on this kappa~1e12 bar);
    at the pause tolerance the iteration counts agree within a couple and
    the solutions match."""
    hex_elements = mesh_kind == "bar_hex"
    mesh = bar_mesh(3, 1, 1, hex_elements=hex_elements)
    cfg = bar_config()
    _, _, ray, coeffs, model, _, force, _, _ = _setup(mesh, cfg)
    rhs = jnp.where(model.bc_mask, model.bc_value, force)
    scale, mf = np.float32(1.0), np.float32(coeffs.a0)
    x0 = jnp.zeros_like(rhs)
    sol_c, tel_c = solve_pcg(
        model, rhs, scale, mf, 1e-5, 2000, x0, warm_start=False
    )
    sol_f, tel_f = solve_pcg(
        model, rhs, scale, mf, 1e-5, 2000, x0, warm_start=False,
        variant="fused",
    )
    assert bool(tel_c.converged) and bool(tel_f.converged)
    assert not bool(tel_f.breakdown)
    assert abs(int(tel_f.iterations) - int(tel_c.iterations)) <= max(
        2, int(0.15 * int(tel_c.iterations))
    )
    ref = np.abs(np.asarray(sol_c)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(sol_f), np.asarray(sol_c), atol=1e-4 * ref
    )


@pytest.mark.slow
def test_fused_variant_matches_dense_oracle():
    """Fused variant vs the dense oracle at the pcg_test.cpp:358 tolerance —
    the same parity bar the classic loop has to clear."""
    mesh = bar_mesh(3, 1, 1, hex_elements=True)
    cfg = bar_config()
    pre, mats, ray, coeffs, model, state, force, assembly, dirichlet = _setup(mesh, cfg)
    prev = newmark.State.zeros(mesh.dof_count)
    load = np.asarray(jax.device_get(force))[: mesh.node_count].reshape(-1)
    rhs_flat = newmark.build_effective_rhs(
        load.astype(np.float64), assembly.stiffness, assembly.mass_diag,
        ray, coeffs, prev,
    )
    rhs_flat = np.where(
        dirichlet.mask, dirichlet.targets - prev.displacement, rhs_flat
    )
    rhs_norm = np.linalg.norm(rhs_flat)
    dense = oracle.solve_newmark_step(
        assembly, ray, dirichlet, mesh, cfg, pre, coeffs, prev, 0.0,
        1.0e-8 * rhs_norm, 2000,
    )
    assert dense.stats.converged

    rhs = np.zeros((model.padded_node_count, 3), np.float32)
    rhs[: mesh.node_count] = rhs_flat.reshape(-1, 3).astype(np.float32)
    scale = np.float32(1.0 + coeffs.a1 * ray.beta)
    mass_factor = np.float32(coeffs.a0 + coeffs.a1 * ray.alpha)
    x0 = jnp.zeros((model.padded_node_count, 3), jnp.float32)
    solution, telemetry = jax.jit(
        solve_pcg, static_argnames=("warm_start", "variant")
    )(
        model, jnp.asarray(rhs), scale, mass_factor, 1.0e-7, 2000, x0,
        warm_start=False, variant="fused",
    )
    assert bool(telemetry.converged)
    got = np.asarray(solution)[: mesh.node_count].reshape(-1)
    dense_delta = dense.state.displacement - prev.displacement
    scale_ref = np.abs(dense_delta).max() + 1e-30
    np.testing.assert_allclose(got, dense_delta, atol=2.5e-4 * scale_ref)


def test_fused_variant_zero_rhs_converges_immediately():
    mesh, cfg = single_tet_mesh(), tet_config()
    _, _, ray, coeffs, model, _, _, _, _ = _setup(mesh, cfg)
    rhs = jnp.zeros((model.padded_node_count, 3), jnp.float32)
    x0 = jnp.zeros_like(rhs)
    solution, telemetry = solve_pcg(
        model, rhs, 1.0, 1.0, 1.0e-6, 100, x0, warm_start=False,
        variant="fused",
    )
    assert int(telemetry.iterations) == 0
    assert bool(telemetry.converged)
    np.testing.assert_array_equal(np.asarray(solution), 0.0)


# ---------------------------------------------------------------------------
# pipelined (Ghysels-Vanroose latency-hiding) variant
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mesh_kind", ["bar_tet", "bar_hex"])
@pytest.mark.slow
def test_pipelined_variant_matches_classic(mesh_kind):
    """solver.variant='pipelined' reproduces the classic trajectory at the
    production runtime tolerance (2e-4, docs/spec.md:28) with tight
    iteration parity.  At the 1e-5 pause tolerance the pipelined
    recurrences hit their f32 absolute-error floor on this kappa~1e12 bar
    and the periodic residual replacement rebuilds the Krylov information
    — more iterations, same solution (see solve_pcg_pipelined docstring)."""
    hex_elements = mesh_kind == "bar_hex"
    mesh = bar_mesh(3, 1, 1, hex_elements=hex_elements)
    cfg = bar_config()
    _, _, ray, coeffs, model, _, force, _, _ = _setup(mesh, cfg)
    rhs = jnp.where(model.bc_mask, model.bc_value, force)
    scale, mf = np.float32(1.0), np.float32(coeffs.a0)
    x0 = jnp.zeros_like(rhs)

    # production runtime tolerance: tight trajectory parity
    sol_c, tel_c = solve_pcg(
        model, rhs, scale, mf, 2e-4, 2000, x0, warm_start=False
    )
    sol_p, tel_p = solve_pcg(
        model, rhs, scale, mf, 2e-4, 2000, x0, warm_start=False,
        variant="pipelined",
    )
    assert bool(tel_c.converged) and bool(tel_p.converged)
    assert not bool(tel_p.breakdown)
    assert abs(int(tel_p.iterations) - int(tel_c.iterations)) <= max(
        3, int(0.2 * int(tel_c.iterations))
    )
    ref = np.abs(np.asarray(sol_c)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(sol_p), np.asarray(sol_c), atol=2e-3 * ref
    )

    # pause tolerance: replacement territory — same solution, bounded
    # extra iterations
    sol_c5, tel_c5 = solve_pcg(
        model, rhs, scale, mf, 1e-5, 2000, x0, warm_start=False
    )
    sol_p5, tel_p5 = solve_pcg(
        model, rhs, scale, mf, 1e-5, 2000, x0, warm_start=False,
        variant="pipelined",
    )
    assert bool(tel_c5.converged) and bool(tel_p5.converged)
    assert int(tel_p5.iterations) <= 3 * int(tel_c5.iterations) + 3
    ref5 = np.abs(np.asarray(sol_c5)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(sol_p5), np.asarray(sol_c5), atol=1e-4 * ref5
    )


@pytest.mark.slow
def test_pipelined_variant_matches_dense_oracle():
    """Pipelined variant vs the dense oracle at the pcg_test.cpp:358
    tolerance — the same parity bar the classic loop has to clear."""
    mesh = bar_mesh(3, 1, 1, hex_elements=True)
    cfg = bar_config()
    pre, mats, ray, coeffs, model, state, force, assembly, dirichlet = _setup(mesh, cfg)
    prev = newmark.State.zeros(mesh.dof_count)
    load = np.asarray(jax.device_get(force))[: mesh.node_count].reshape(-1)
    rhs_flat = newmark.build_effective_rhs(
        load.astype(np.float64), assembly.stiffness, assembly.mass_diag,
        ray, coeffs, prev,
    )
    rhs_flat = np.where(
        dirichlet.mask, dirichlet.targets - prev.displacement, rhs_flat
    )
    rhs_norm = np.linalg.norm(rhs_flat)
    dense = oracle.solve_newmark_step(
        assembly, ray, dirichlet, mesh, cfg, pre, coeffs, prev, 0.0,
        1.0e-8 * rhs_norm, 2000,
    )
    assert dense.stats.converged

    rhs = np.zeros((model.padded_node_count, 3), np.float32)
    rhs[: mesh.node_count] = rhs_flat.reshape(-1, 3).astype(np.float32)
    scale = np.float32(1.0 + coeffs.a1 * ray.beta)
    mass_factor = np.float32(coeffs.a0 + coeffs.a1 * ray.alpha)
    x0 = jnp.zeros((model.padded_node_count, 3), jnp.float32)
    solution, telemetry = jax.jit(
        solve_pcg, static_argnames=("warm_start", "variant")
    )(
        model, jnp.asarray(rhs), scale, mass_factor, 1.0e-7, 2000, x0,
        warm_start=False, variant="pipelined",
    )
    assert bool(telemetry.converged)
    got = np.asarray(solution)[: mesh.node_count].reshape(-1)
    dense_delta = dense.state.displacement - prev.displacement
    scale_ref = np.abs(dense_delta).max() + 1e-30
    np.testing.assert_allclose(got, dense_delta, atol=2.5e-4 * scale_ref)


def test_pipelined_variant_zero_rhs_converges_immediately():
    mesh, cfg = single_tet_mesh(), tet_config()
    _, _, ray, coeffs, model, _, _, _, _ = _setup(mesh, cfg)
    rhs = jnp.zeros((model.padded_node_count, 3), jnp.float32)
    x0 = jnp.zeros_like(rhs)
    solution, telemetry = solve_pcg(
        model, rhs, 1.0, 1.0, 1.0e-6, 100, x0, warm_start=False,
        variant="pipelined",
    )
    assert int(telemetry.iterations) == 0
    assert bool(telemetry.converged)
    np.testing.assert_array_equal(np.asarray(solution), 0.0)


def test_pipelined_max_iters_zero_reports_initial_convergence():
    """ADVICE r3: with max_iterations=0 and an already-converged x0 the
    pipelined variant must report converged=True with the true (finite)
    initial residual, matching the fused variant's pre-loop check —
    previously it reported converged=False with residual_norm=inf."""
    mesh, cfg = single_tet_mesh(), tet_config()
    _, _, ray, coeffs, model, _, _, _, _ = _setup(mesh, cfg)
    rhs = jnp.zeros((model.padded_node_count, 3), jnp.float32)
    x0 = jnp.zeros_like(rhs)
    _, telemetry = solve_pcg(
        model, rhs, 1.0, 1.0, 1.0e-6, 0, x0, warm_start=False,
        variant="pipelined",
    )
    assert int(telemetry.iterations) == 0
    assert bool(telemetry.converged)
    assert np.isfinite(float(telemetry.residual_norm))


@pytest.mark.slow
def test_pipelined_replace_every_zero_plumbs_through_dispatch():
    """ADVICE r3: replace_every is forwarded through the solve_pcg
    dispatch (and the solver.replace_every YAML knob) — replace_every=0
    disables residual replacement and still converges at the production
    tolerance, matching the default-period trajectory."""
    mesh = bar_mesh(3, 1, 1, hex_elements=True)
    cfg = bar_config()
    _, mats, ray, coeffs, model, state, force, assembly, dirichlet = _setup(
        mesh, cfg
    )
    rhs = jnp.where(model.bc_mask, model.bc_value, force).astype(jnp.float32)
    x0 = jnp.zeros((model.padded_node_count, 3), jnp.float32)
    sol_default, tel_default = solve_pcg(
        model, rhs, 1.0, 4.0e6, 2.0e-4, 200, x0, warm_start=False,
        variant="pipelined",
    )
    sol_off, tel_off = solve_pcg(
        model, rhs, 1.0, 4.0e6, 2.0e-4, 200, x0, warm_start=False,
        variant="pipelined", replace_every=0,
    )
    assert bool(tel_default.converged) and bool(tel_off.converged)
    scale = np.abs(np.asarray(sol_default)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(sol_off), np.asarray(sol_default), atol=5e-4 * scale
    )


def test_fused_dots_match_separate_dots(rng):
    from civiwave_tpu.solver.pcg import dot_f64, fused_dots

    a = jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32))
    fused = np.asarray(fused_dots([(a, b), (b, c), (a, a)]))
    sep = np.array([
        float(dot_f64(a, b)), float(dot_f64(b, c)), float(dot_f64(a, a))
    ])
    np.testing.assert_allclose(fused, sep, rtol=1e-14)


@pytest.mark.slow
def test_megafused_iteration_loop_matches_fused():
    """The whole-iteration-kernel loop (_solve_pcg_megafused, interpret
    mode) reproduces the fused variant's trajectory: same iteration
    count, matching solution, telemetry semantics intact.  The kernel
    folds the p/s recurrence, the x/r axpys, the block-Jacobi apply, the
    operator and all three dot partials into one Pallas pass (ADR-22:
    opt-in on v5e where it is bandwidth-serialized; built for
    higher-BW:VPU parts)."""
    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.ops import structured as sops
    from civiwave_tpu.solver.pcg import _solve_pcg_megafused, solve_pcg_fused
    from civiwave_tpu.utils.synthetic import cantilever_config

    cfg = cantilever_config(traction=-1.0e6)
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, force = build_structured_model(
        5, 4, 3, mats[0], cfg.materials[0].density,
        fixed_axis_planes=("x0",),
        traction=(0.0, 0.0, -1.0e6), traction_plane="x1",
    )  # 6 x-planes -> block 2
    ss, mf = np.float32(1.0), np.float32(4.0e6)
    pc = model.build_preconditioner(ss, mf)
    rhs = jnp.where(model.bc_mask, model.bc_value, force)
    x0 = jnp.zeros(model.vector_shape, jnp.float32)

    x_ref, tel_ref = solve_pcg_fused(
        model, rhs, ss, mf, 1e-8, 500, x0, warm_start=False,
        preconditioner=pc,
    )
    bundle = sops.build_fused_pcg_iteration(
        model, pc, ss, mf, interpret=True
    )
    assert bundle is not None
    x_m, tel_m = _solve_pcg_megafused(
        model, rhs, ss, mf, 1e-8, 500, x0, warm_start=False,
        reduction_dtype=jnp.float64, vector_dtype=jnp.float32,
        block_inverse=pc, bundle=bundle,
    )
    assert bool(tel_m.converged) and not bool(tel_m.breakdown)
    # dot chunking differs (768- vs 256-element f32 partial chunks), so
    # iterates drift at the ulp level; counts within 1, solutions match
    assert abs(int(tel_m.iterations) - int(tel_ref.iterations)) <= 1
    ref = np.abs(np.asarray(x_ref)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(x_m), np.asarray(x_ref), atol=2e-5 * ref
    )
