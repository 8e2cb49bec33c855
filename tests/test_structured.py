"""Structured fast path vs the general unstructured path — must be equal.

The structured stencil operator (component-separated (3, X, Y, Z) layout)
and the PackedModel gather operator compute the same physics on the same
box; this suite pins elementwise equality of the matvec, the preconditioner
blocks, and full Newmark steps, plus equality of the homogeneous
constant-stencil operator against the heterogeneous corner-gather operator
on uniform material grids.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.physics import materials
from civiwave_tpu.solver.pcg import solve_pcg
from civiwave_tpu.solver.stepper import newmark_step
from civiwave_tpu.utils.synthetic import box_mesh, cantilever_config

NX, NY, NZ = 4, 3, 2


@pytest.fixture(scope="module")
def both_models():
    cfg = cantilever_config(traction=-1.0e6)
    mesh = box_mesh(NX, NY, NZ, hex_elements=True)
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    packed, state, force_packed = pack.build_packed_model(
        mesh, pre, cfg, mats, pad_nodes=1, pad_elems=1
    )
    structured, force_structured = build_structured_model(
        NX,
        NY,
        NZ,
        mats[0],
        cfg.materials[0].density,
        fixed_axis_planes=("x0",),
        traction=(0.0, 0.0, -1.0e6),
        traction_plane="x1",
    )
    ray = materials.compute_rayleigh(cfg.damping)
    return packed, structured, force_packed, force_structured, ray


def _nodal(structured, csg_array):
    """CSG (c, X, Y, Z) -> (node_count, c...) nodal rows for comparisons."""
    return np.asarray(structured.to_nodal(jnp.asarray(csg_array)))


def test_metadata_and_tables_match(both_models):
    packed, structured, *_ = both_models
    assert structured.node_count == packed.node_count
    assert structured.homogeneous
    n = packed.node_count
    mass_nodal = np.asarray(structured.mass_grid).reshape(-1)[:n]
    np.testing.assert_allclose(
        mass_nodal, np.asarray(packed.lumped_mass)[:n], rtol=1e-6
    )
    bc_nodal = (
        np.asarray(structured.bc_mask).transpose(1, 2, 3, 0).reshape(-1, 3)[:n]
    )
    np.testing.assert_array_equal(bc_nodal, np.asarray(packed.bc_mask)[:n])
    np.testing.assert_allclose(
        np.asarray(structured.position0), np.asarray(packed.position0)
    )


def test_external_force_matches(both_models):
    packed, structured, force_packed, force_structured, _ = both_models
    np.testing.assert_allclose(
        _nodal(structured, force_structured),
        np.asarray(force_packed)[: packed.node_count],
        rtol=1e-6,
        atol=1e-3,
    )


def test_nodal_roundtrip(both_models):
    _, structured, _, force_structured, _ = both_models
    rows = structured.to_nodal(force_structured)
    back = structured.from_nodal(rows)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(force_structured), rtol=0, atol=0
    )


def test_apply_keff_matches(both_models, rng):
    packed, structured, *_ = both_models
    x = rng.standard_normal((packed.node_count, 3)).astype(np.float32) * 0.01
    scale, mf = np.float32(1.3), np.float32(2.5e5)
    out_packed = np.asarray(
        jax.jit(lambda m, v: m.apply_keff(v, scale, mf))(
            packed, jnp.asarray(x)
        )
    )[: packed.node_count]
    x_csg = structured.from_nodal(x)
    out_struct = _nodal(
        structured,
        jax.jit(lambda m, v: m.apply_keff(v, scale, mf))(structured, x_csg),
    )
    ref_scale = np.abs(out_packed).max()
    np.testing.assert_allclose(out_struct, out_packed, atol=3e-6 * ref_scale)


def test_homogeneous_stencil_matches_corner_path(both_models, rng):
    """The assembled constant stencil (+ boundary corrections) must equal
    the general corner-gather element loop on a uniform material grid."""
    import dataclasses

    _, structured, *_ = both_models
    assert structured.homogeneous
    hetero = dataclasses.replace(structured, homogeneous=False)
    x = jnp.asarray(
        rng.standard_normal(structured.vector_shape).astype(np.float32)
    )
    scale, mf = np.float32(1.1), np.float32(3.0e5)
    out_fast = np.asarray(
        jax.jit(lambda m, v: m.apply_keff(v, scale, mf))(structured, x)
    )
    out_general = np.asarray(
        jax.jit(lambda m, v: m.apply_keff(v, scale, mf))(hetero, x)
    )
    ref = np.abs(out_general).max()
    np.testing.assert_allclose(out_fast, out_general, atol=3e-6 * ref)


def test_heterogeneous_grid_selects_corner_path(both_models, rng):
    """A non-uniform material grid must flow through the corner path and
    reduce to the homogeneous answer when the variation is zeroed."""
    cfg = cantilever_config(traction=-1.0e6)
    mats = [materials.make_properties(m) for m in cfg.materials]
    lam0, mu0 = mats[0].lame.lam, mats[0].lame.mu
    lam_grid = np.full((NX, NY, NZ), lam0, np.float32)
    mu_grid = np.full((NX, NY, NZ), mu0, np.float32)
    lam_grid[0, 0, 0] *= 2.0  # genuinely heterogeneous
    model_het, _ = build_structured_model(
        NX, NY, NZ, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6), lam_grid=lam_grid, mu_grid=mu_grid,
    )
    assert not model_het.homogeneous
    # explicit uniform grids are detected as homogeneous
    model_uniform, _ = build_structured_model(
        NX, NY, NZ, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
        lam_grid=np.full((NX, NY, NZ), lam0, np.float32),
        mu_grid=np.full((NX, NY, NZ), mu0, np.float32),
    )
    assert model_uniform.homogeneous


def test_node_blocks_match(both_models):
    packed, structured, *_ = both_models
    scale, mf = np.float32(1.0), np.float32(1.0e5)
    n = packed.node_count
    blocks_packed = np.asarray(packed.assemble_node_blocks(scale, mf))[:n]
    blocks_struct = (
        np.asarray(structured.assemble_node_blocks(scale, mf))
        .transpose(2, 3, 4, 0, 1)
        .reshape(-1, 3, 3)[:n]
    )
    ref = np.abs(blocks_packed).max()
    np.testing.assert_allclose(blocks_struct, blocks_packed, atol=3e-6 * ref)


@pytest.mark.slow
def test_pcg_solution_matches(both_models):
    packed, structured, force_packed, force_structured, _ = both_models
    scale, mf = np.float32(1.0), np.float32(4.0e6)
    rhs_p = jnp.where(packed.bc_mask, packed.bc_value, force_packed)
    rhs_s = jnp.where(structured.bc_mask, structured.bc_value, force_structured)
    sol_p, tel_p = jax.jit(solve_pcg, static_argnames="warm_start")(
        packed, rhs_p, scale, mf, 1e-8, 1000, jnp.zeros_like(rhs_p),
        warm_start=False,
    )
    sol_s, tel_s = jax.jit(solve_pcg, static_argnames="warm_start")(
        structured, rhs_s, scale, mf, 1e-8, 1000, jnp.zeros_like(rhs_s),
        warm_start=False,
    )
    assert bool(tel_p.converged) and bool(tel_s.converged)
    sol_p = np.asarray(sol_p)[: packed.node_count]
    ref = np.abs(sol_p).max()
    np.testing.assert_allclose(
        _nodal(structured, sol_s), sol_p, atol=1e-4 * ref
    )


@pytest.mark.slow
def test_newmark_step_matches(both_models):
    packed, structured, force_packed, force_structured, ray = both_models

    def run(model, force):
        state = model.zero_state()
        out = None
        for _ in range(3):
            out = jax.jit(
                lambda m, s, f: newmark_step(
                    m, s, f, 1e-3, 1e-8, 1000,
                    rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
                )
            )(model, state, force)
            state = out.state
            assert bool(out.pcg.converged)
        return state

    state_p = run(packed, force_packed)
    state_s = run(structured, force_structured)
    n = packed.node_count
    u_p = np.asarray(state_p.displacement)[:n]
    v_p = np.asarray(state_p.velocity)[:n]
    u_s = _nodal(structured, state_s.displacement)
    v_s = _nodal(structured, state_s.velocity)
    np.testing.assert_allclose(u_s, u_p, atol=1e-4 * (np.abs(u_p).max() + 1e-30))
    np.testing.assert_allclose(v_s, v_p, atol=1e-3 * (np.abs(v_p).max() + 1e-30))


def test_pallas_interior_stencil_matches_xla(both_models, rng):
    """The Pallas slab kernel (interpret mode on CPU) must equal the XLA
    shifted-window interior stencil."""
    from civiwave_tpu.ops.pallas.structured_stencil import (
        interior_stencil_pallas,
        plane_fits,
    )
    from civiwave_tpu.ops.structured import _apply_taps, _stencil_tables

    _, structured, *_ = both_models
    assert plane_fits(structured.ny + 1, structured.nz + 1)
    interior, *_rest = _stencil_tables(
        structured.spacing, structured.lam0, structured.mu0
    )
    xs = jnp.asarray(
        rng.standard_normal(structured.vector_shape).astype(np.float32)
    )
    ref = np.asarray(_apply_taps(xs, interior))
    out = np.asarray(interior_stencil_pallas(xs, interior, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5 * (np.abs(ref).max() + 1e-30))


def test_face_correction_planes_match_bruteforce(both_models, rng):
    """Each face correction buffer must equal the brute-force restricted
    ghost sum it encodes (guards the masked-dense edge/corner folding)."""
    from civiwave_tpu.ops import structured as ops_mod

    _, structured, *_ = both_models
    x = jnp.asarray(
        rng.standard_normal(structured.vector_shape).astype(np.float32)
    )
    tables = ops_mod._stencil_tables(
        structured.spacing, structured.lam0, structured.mu0
    )
    _, faces, edges, corners = tables
    hi = (structured.nx, structured.ny, structured.nz)
    for (axis, side) in faces:
        sl, corr = ops_mod._face_correction(structured, x, axis, side, tables)
        # brute force: face term - assigned edges + assigned corners via
        # direct small-slice evaluation
        plane = x[sl]
        ref = np.array(ops_mod._apply_taps(plane, faces[(axis, side)]))
        rem = [a for a in range(3) if a != axis]
        for (a1, s1, a2, s2), etaps in edges.items():
            if a1 != axis or s1 != side:
                continue
            line_sl = [slice(None)] * 3
            line_sl[1 + rem.index(a2)] = 0 if s2 == 0 else hi[a2]
            line_sl = tuple(line_sl)
            ref[line_sl] -= np.asarray(
                ops_mod._apply_taps(plane[line_sl], etaps)
            )
        if axis == 0:
            for (sx, sy, sz), ctaps in corners.items():
                if sx != side:
                    continue
                pt = (
                    slice(None),
                    0 if sy == 0 else hi[1],
                    0 if sz == 0 else hi[2],
                )
                ref[pt] += np.asarray(ops_mod._apply_taps(plane[pt], ctaps))
        scale = np.abs(ref).max() + 1e-30
        np.testing.assert_allclose(np.asarray(corr), ref, atol=1e-5 * scale)


def test_direct_correction_form_matches_masked(both_models, rng, monkeypatch):
    """The large-grid direct correction form must equal the masked-dense
    small-grid form (both exact; see _DIRECT_CORRECTION_NODE_THRESHOLD)."""
    from civiwave_tpu.ops import structured as ops_mod

    _, structured, *_ = both_models
    x = jnp.asarray(
        rng.standard_normal(structured.vector_shape).astype(np.float32)
    )
    scale, mf = np.float32(1.2), np.float32(2.0e5)
    ref = np.asarray(
        jax.jit(lambda m, v: m.apply_keff(v, scale, mf))(structured, x)
    )
    monkeypatch.setattr(ops_mod, "_DIRECT_CORRECTION_NODE_THRESHOLD", 0)
    out = np.asarray(
        jax.jit(lambda m, v: m.apply_keff(v, scale, mf))(structured, x)
    )
    scale_ref = np.abs(ref).max() + 1e-30
    np.testing.assert_allclose(out, ref, atol=1e-5 * scale_ref)


def test_flat_interior_form_matches(both_models, rng, monkeypatch):
    """The flattened-lane interior form (large grids) must equal the
    (Y, Z)-plane form, including its z-edge bleed cancellation."""
    from civiwave_tpu.ops import structured as ops_mod

    _, structured, *_ = both_models
    x = jnp.asarray(
        rng.standard_normal(structured.vector_shape).astype(np.float32)
    )
    scale, mf = np.float32(1.1), np.float32(3.0e5)
    ref = np.asarray(
        jax.jit(lambda m, v: m.apply_keff(v, scale, mf))(structured, x)
    )
    monkeypatch.setattr(ops_mod, "_FLAT_INTERIOR_NODE_THRESHOLD", 0)
    out = np.asarray(
        jax.jit(lambda m, v: m.apply_keff(v, scale, mf))(structured, x)
    )
    scale_ref = np.abs(ref).max() + 1e-30
    np.testing.assert_allclose(out, ref, atol=1e-5 * scale_ref)


def test_fused_pallas_operator_matches(both_models, rng, monkeypatch):
    """The fully-fused pallas K_eff (interpret mode on CPU) must equal the
    XLA operator, including identity rows and boundary corrections."""
    import civiwave_tpu.ops.pallas.structured_stencil as psten
    from civiwave_tpu.ops import structured as ops_mod

    _, structured, *_ = both_models
    x = jnp.asarray(
        rng.standard_normal(structured.vector_shape).astype(np.float32)
    )
    scale, mf = np.float32(1.3), np.float32(2.5e5)
    ref = np.asarray(
        jax.jit(lambda m, v: m.apply_keff(v, scale, mf))(structured, x)
    )
    out = np.asarray(
        ops_mod._apply_fused_pallas.__wrapped__(structured, x, scale, mf)
        if hasattr(ops_mod._apply_fused_pallas, "__wrapped__")
        else _fused_interpret(ops_mod, psten, structured, x, scale, mf)
    )
    scale_ref = np.abs(ref).max() + 1e-30
    np.testing.assert_allclose(out, ref, atol=1e-5 * scale_ref)


def _fused_interpret(ops_mod, psten, model, x, scale, mf):
    """Run the fused kernel (the COMPLETE operator) in interpreter mode."""
    tables = ops_mod._stencil_tables(model.spacing, model.lam0, model.mu0)
    ss = jnp.asarray(scale, jnp.float32)
    return psten.apply_keff_fused_pallas(
        model, x, ss, mf, tables, interpret=True
    )


def test_compact_preconditioner_bitwise(both_models, rng):
    """Homogeneous grids dispatch to the class-table compact block-Jacobi
    form ((6, 3, 3, 3) table, one representative block per per-axis
    boundary-class combination) and its apply is BITWISE the full per-node
    (6, X, Y, Z) table apply — the assembled blocks are exactly
    class-separable, so deduplication loses nothing.  Covers the XLA
    expansion AND the Pallas kernel (interpret mode).  Reference analogue:
    pcg_precondition.slang always reads per-node rows; at <=150k DOF the
    table fits cache and deduplication was never worth it."""
    from civiwave_tpu.ops import structured as sops
    from civiwave_tpu.ops.pallas.block_jacobi_apply import (
        apply_block_jacobi_pallas,
    )

    _, structured, *_ = both_models
    ss, mf = np.float32(1.3), np.float32(4.0e6)
    built = structured.build_preconditioner(ss, mf)
    assert isinstance(built, sops.CompactBlockJacobi)
    assert built.table.shape == (6, 3, 3, 3)
    full = sops.build_block_jacobi_inverse_structured(structured, ss, mf)
    r = jnp.asarray(
        rng.standard_normal((3,) + full.shape[1:]), jnp.float32
    )
    z_full = sops.apply_preconditioner_structured(structured, full, r)
    z_compact = structured.apply_preconditioner(built, r)
    np.testing.assert_array_equal(np.asarray(z_compact), np.asarray(z_full))
    z_kernel = apply_block_jacobi_pallas(
        structured, built.table, r, interpret=True
    )
    # interpret mode under x64 contracts the coefficient expansion
    # differently (1-ulp deltas); any fixed SPD M^-1 is a valid
    # preconditioner, so ulp-level parity is the contract here
    np.testing.assert_allclose(
        np.asarray(z_kernel), np.asarray(z_full), rtol=1e-6, atol=0.0
    )

    # degenerate extents (no interior x class) must still be exact
    cfg = cantilever_config(traction=-1.0e6)
    mats = [materials.make_properties(m) for m in cfg.materials]
    tiny, _ = build_structured_model(
        1, 3, 3, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    full_t = sops.build_block_jacobi_inverse_structured(tiny, ss, mf)
    pc_t = tiny.build_preconditioner(ss, mf)
    r_t = jnp.asarray(
        rng.standard_normal((3,) + full_t.shape[1:]), jnp.float32
    )
    np.testing.assert_array_equal(
        np.asarray(tiny.apply_preconditioner(pc_t, r_t)),
        np.asarray(sops.apply_preconditioner_structured(tiny, full_t, r_t)),
    )
    np.testing.assert_allclose(
        np.asarray(
            apply_block_jacobi_pallas(tiny, pc_t.table, r_t, interpret=True)
        ),
        np.asarray(sops.apply_preconditioner_structured(tiny, full_t, r_t)),
        rtol=1e-6,
        atol=0.0,
    )


def test_pcg_nonzero_dirichlet_targets_structured():
    """PCG on the structured path with NONZERO Dirichlet targets: the
    solution must carry the targets exactly on constrained axes (the
    reference's per-axis value contract, config.cpp:500-567)."""
    cfg = cantilever_config(traction=-1.0e6)
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, force = build_structured_model(
        6, 4, 3, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
        fixes=[("x0", (True, True, True), (1.0e-4, None, -2.0e-4))],
    )
    ss, mf = np.float32(1.0), np.float32(4.0e6)
    rhs = jnp.where(model.bc_mask, model.bc_value, force)
    x0 = jnp.zeros(model.vector_shape, jnp.float32)
    solve = jax.jit(
        lambda m, r, x: solve_pcg(m, r, ss, mf, 1.0e-8, 500, x,
                                  warm_start=False)
    )
    x_ref, tel_ref = solve(model, rhs, x0)
    assert bool(tel_ref.converged)
    bc = np.asarray(model.bc_mask)
    np.testing.assert_array_equal(
        np.asarray(x_ref)[bc], np.asarray(rhs)[bc]
    )
    vals = np.asarray(model.bc_value)[:, 0]  # the x0 plane targets
    assert float(vals[0].max()) == pytest.approx(1.0e-4)
    assert float(vals[2].min()) == pytest.approx(-2.0e-4)


@pytest.mark.slow
def test_pc_keff_fused_kernel_matches(rng):
    """The fused pc+matvec mega kernel (interpret mode on CPU) must
    reproduce the composition — u = M^-1 r from the class table, then
    w = K_eff u — including identity rows, every boundary correction and
    the per-plane x-face pc classes.  Odd x-plane counts refuse (the
    kernel is blocked-only) and the model entry point falls back to the
    composition bitwise.  Reference analogue: pcg_precondition.slang
    followed by the ke_apply/gather pair as separate synchronized
    dispatches (newmark_stepper.cpp:787-841)."""
    from civiwave_tpu.ops import structured as sops
    from civiwave_tpu.ops.pallas.structured_stencil import (
        apply_pc_keff_fused_pallas,
    )

    cfg = cantilever_config(traction=-1.0e6)
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, _ = build_structured_model(
        5, 3, 2, mats[0], cfg.materials[0].density,
        fixed_axis_planes=("x0",),
        traction=(0.0, 0.0, -1.0e6), traction_plane="x1",
    )  # 6 x-planes -> block 2
    ss, mf = np.float32(1.3), np.float32(2.5e5)
    pc = model.build_preconditioner(ss, mf)
    assert isinstance(pc, sops.CompactBlockJacobi)
    r = jnp.asarray(
        rng.standard_normal(model.vector_shape).astype(np.float32)
    )
    u_ref = model.apply_preconditioner(pc, r)
    w_ref = model.apply_keff(u_ref, ss, mf)
    tables = sops._stencil_tables(model.spacing, model.lam0, model.mu0)
    out = apply_pc_keff_fused_pallas(
        model, pc.table, r, ss, mf, tables, interpret=True
    )
    assert out is not None
    u, w = out
    # interpret mode contracts the coefficient algebra differently than
    # the XLA twin (ulp-level deltas, scaled atol); on real TPU hardware
    # both pairs measured bitwise identical at 95^3 and 255^3
    scale_u = np.abs(np.asarray(u_ref)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(u_ref), atol=1e-6 * scale_u
    )
    scale_w = np.abs(np.asarray(w_ref)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(w_ref), atol=2e-5 * scale_w
    )

    # with_dots: the same pass also emits the iteration's three dot
    # products as row partials (ADR-22 addendum)
    from civiwave_tpu.solver.pcg import fused_dots

    u2, w2, pa, pb = apply_pc_keff_fused_pallas(
        model, pc.table, r, ss, mf, tables, with_dots=True, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(u2), np.asarray(u), atol=1e-6 * scale_u
    )
    np.testing.assert_allclose(
        np.asarray(w2), np.asarray(w), atol=2e-5 * scale_w
    )
    g_ref, d_ref, rr_ref = fused_dots([(r, u_ref), (w_ref, u_ref), (r, r)])
    assert float(jnp.sum(pa[:, 0].astype(jnp.float64))) == pytest.approx(
        float(g_ref), rel=1e-5
    )
    assert float(jnp.sum(pa[:, 1].astype(jnp.float64))) == pytest.approx(
        float(rr_ref), rel=1e-5
    )
    assert float(jnp.sum(pb[:, 0].astype(jnp.float64))) == pytest.approx(
        float(d_ref), rel=1e-5
    )

    # odd plane count: kernel refuses, model entry composes (bitwise)
    model_odd, _ = build_structured_model(
        4, 3, 2, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    pc_odd = model_odd.build_preconditioner(ss, mf)
    r_odd = jnp.asarray(
        rng.standard_normal(model_odd.vector_shape).astype(np.float32)
    )
    assert apply_pc_keff_fused_pallas(
        model_odd, pc_odd.table, r_odd, ss, mf,
        sops._stencil_tables(model_odd.spacing, model_odd.lam0,
                             model_odd.mu0),
        interpret=True,
    ) is None
    u2, w2 = model_odd.apply_pc_keff(pc_odd, r_odd, ss, mf)
    u2_ref = model_odd.apply_preconditioner(pc_odd, r_odd)
    np.testing.assert_array_equal(np.asarray(u2), np.asarray(u2_ref))
    np.testing.assert_array_equal(
        np.asarray(w2), np.asarray(model_odd.apply_keff(u2_ref, ss, mf))
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(pad_x_multiple=8),
        dict(pad_x_multiple=4, pad_y_multiple=2),
        dict(traction=(1e5, -2e5, 3e5), traction_plane="z1"),
        dict(gravity=(0.0, 0.0, -9.81), traction=(0.0, 0.0, -1e6)),
        dict(
            fixes=[
                ("x0", (True, False, True), (0.1, None, None)),
                ("y1", (False, True, False), (None, 2.5, None)),
            ]
        ),
        dict(absorb_planes=("y0", "z0"), traction=(0.0, 0.0, -1e6)),
        dict(
            spacing=(0.3, 0.7, 1.1),
            traction=(0.0, 0.0, -1e6),
            gravity=(1.0, 2.0, 3.0),
        ),
        # pads combined with non-X traction planes: the numpy fallback's
        # plane slice spans the X-padded grid while the share array spans
        # unpadded extents (round-4 advisor broadcast bug, now fixed)
        dict(pad_x_multiple=8, traction=(0.0, 0.0, -1e6),
             traction_plane="z1"),
        dict(pad_x_multiple=4, pad_y_multiple=2,
             traction=(2e5, 0.0, -1e6), traction_plane="y1"),
    ],
    ids=[
        "plain", "xpad", "xypad", "ztraction", "gravity", "fixes",
        "absorb", "spacing", "xpad_ztraction", "xypad_ytraction",
    ],
)
def test_device_build_matches_numpy(kw, monkeypatch):
    """The on-device homogeneous builder (ADR-31) is BIT-identical to the
    numpy reference path: every grid array is an f64 adjacency-count
    product whose power-of-two scalings commute with rounding."""
    cfg = cantilever_config()
    mat = materials.make_properties(cfg.materials[0])
    rho = cfg.materials[0].density
    monkeypatch.setenv("CIVIWAVE_DEVICE_BUILD", "1")
    md, fd = build_structured_model(5, 3, 4, mat, rho, **kw)
    monkeypatch.setenv("CIVIWAVE_DEVICE_BUILD", "0")
    mn, fn = build_structured_model(5, 3, 4, mat, rho, **kw)
    fields = [
        "lam_grid", "mu_grid", "mass_grid", "bc_mask", "bc_value",
        "position0",
    ]
    for name in fields:
        a = np.asarray(getattr(md, name))
        b = np.asarray(getattr(mn, name))
        assert a.shape == b.shape, (name, a.shape, b.shape)
        np.testing.assert_array_equal(a, b, err_msg=name)
    np.testing.assert_array_equal(np.asarray(fd), np.asarray(fn))
    for name in [
        "nx", "ny", "nz", "node_count", "padded_node_count", "pad_planes",
        "pad_rows", "spacing", "homogeneous", "lam0", "mu0", "absorb_faces",
        "rho_cp", "rho_cs",
    ]:
        assert getattr(md, name) == getattr(mn, name), name
