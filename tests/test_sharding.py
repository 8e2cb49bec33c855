"""Multi-device GSPMD tests on the 8-way virtual CPU mesh.

The reference never tests multi-device behavior (its sharding planner is
single-GPU buffer splitting); here the actual Newmark step runs sharded over
8 devices and must match the single-device result bit-for-tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.parallel.sharding import (
    make_device_mesh,
    model_shardings,
    shard_simulation,
    state_shardings,
)
from civiwave_tpu.physics import materials
from civiwave_tpu.solver.stepper import newmark_step
from support import bar_config, bar_mesh


@pytest.fixture(scope="module")
def eight_device_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_device_mesh(8)


def _build(n_devices):
    mesh = bar_mesh(4, 2, 2)
    cfg = bar_config()
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    model, state, force = pack.build_packed_model(
        mesh, pre, cfg, mats, pad_nodes=8 * n_devices, pad_elems=8 * n_devices
    )
    return mesh, cfg, ray, model, state, force


def test_sharded_arrays_land_on_all_devices(eight_device_mesh):
    _, _, _, model, state, force = _build(8)
    s_model, s_state, s_force = shard_simulation(
        model, state, force, eight_device_mesh
    )
    assert len(s_model.conn_hex.sharding.device_set) == 8
    assert len(s_state.displacement.sharding.device_set) == 8
    assert len(s_force.sharding.device_set) == 8
    # data integrity after resharding
    np.testing.assert_array_equal(
        np.asarray(s_model.conn_hex), np.asarray(model.conn_hex)
    )


def test_sharded_step_matches_single_device(eight_device_mesh):
    _, cfg, ray, model, state, force = _build(8)

    def step(m, s, f):
        return newmark_step(
            m,
            s,
            f,
            0.001,
            1.0e-7,
            500,
            rayleigh_alpha=ray.alpha,
            rayleigh_beta=ray.beta,
        )

    # single device
    out_single = jax.jit(step)(model, state, force)

    # sharded over 8 devices, with the shardings also pinned as explicit
    # jit in_shardings (constraint plumbing, not just device_put placement)
    s_model, s_state, s_force = shard_simulation(
        model, state, force, eight_device_mesh
    )
    m_shard = model_shardings(s_model, eight_device_mesh)
    s_shard = state_shardings(eight_device_mesh)
    f_shard = jax.sharding.NamedSharding(
        eight_device_mesh, jax.sharding.PartitionSpec("shard")
    )
    out_sharded = jax.jit(step, in_shardings=(m_shard, s_shard, f_shard))(
        s_model, s_state, s_force
    )

    u1 = np.asarray(out_single.state.displacement)
    u8 = np.asarray(out_sharded.state.displacement)
    scale = np.abs(u1).max() + 1e-30
    np.testing.assert_allclose(u8, u1, atol=1e-5 * scale)
    assert bool(out_sharded.pcg.converged)
    # sharded output keeps its sharding
    assert len(out_sharded.state.displacement.sharding.device_set) == 8


def test_sharded_multi_step_stability(eight_device_mesh):
    _, cfg, ray, model, state, force = _build(8)
    s_model, s_state, s_force = shard_simulation(
        model, state, force, eight_device_mesh
    )

    step = jax.jit(
        lambda m, s, f: newmark_step(
            m, s, f, 0.001, 1.0e-6, 400,
            rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
        )
    )
    for _ in range(3):
        out = step(s_model, s_state, s_force)
        s_state = out.state
        assert bool(out.pcg.converged)
    u = np.asarray(s_state.displacement)
    assert np.isfinite(u).all()
    assert np.abs(u).max() > 0.0


# ---------------------------------------------------------------------------
# structured X-slab sharding
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_structured_slab_sharding_matches_single_device(eight_device_mesh):
    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.parallel.sharding import shard_structured
    from civiwave_tpu.utils.synthetic import cantilever_config

    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    model, force = build_structured_model(
        6, 3, 3, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6), pad_x_multiple=8,
    )
    assert (model.nx + 1 + model.pad_planes) % 8 == 0
    state = model.zero_state()

    def step(m, s, f):
        return newmark_step(
            m, s, f, 0.001, 1.0e-7, 500,
            rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
        )

    out_single = jax.jit(step)(model, state, force)
    s_model, s_state, s_force = shard_structured(
        model, state, force, eight_device_mesh
    )
    out_sharded = jax.jit(step)(s_model, s_state, s_force)

    assert bool(out_sharded.pcg.converged)
    assert len(out_sharded.state.displacement.sharding.device_set) == 8
    u1 = np.asarray(out_single.state.displacement)
    u8 = np.asarray(out_sharded.state.displacement)
    np.testing.assert_allclose(u8, u1, atol=1e-5 * (np.abs(u1).max() + 1e-30))


# ---------------------------------------------------------------------------
# explicit halo exchange (shard_map + ppermute) — the multi-chip perf path
# ---------------------------------------------------------------------------


def _structured_fixture(dims, n_devices):
    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.utils.synthetic import cantilever_config

    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    model, force = build_structured_model(
        *dims, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6), pad_x_multiple=n_devices,
    )
    return model, force, ray


@pytest.mark.parametrize("use_kernel", [False, True])
@pytest.mark.parametrize(
    "dims,n_dev",
    # (15,4,4) x 4: x_local=4 — engages the interior/boundary overlap
    # split (ADR-28) under the kernel path
    [((6, 3, 3), 8), ((9, 4, 5), 4), ((15, 4, 4), 4)],
)
def test_structured_halo_operator_matches_unsharded(
    eight_device_mesh, use_kernel, dims, n_dev
):
    """The shard_map + ppermute operator (XLA local form AND the fused
    Pallas slab kernel in interpret mode) must equal the single-device
    operator elementwise.  Includes the one-plane-per-shard case (Xl=1)."""
    import dataclasses

    from civiwave_tpu.parallel.sharding import make_device_mesh, shard_structured

    model, force, _ = _structured_fixture(dims, n_dev)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3,) + model.grid_shape), jnp.float32)
    ss, mf = jnp.float32(1.01), jnp.float32(3.7)
    ref = jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(model, x)

    mesh = make_device_mesh(n_dev)
    s_model, _, _ = shard_structured(model, model.zero_state(), force, mesh)
    if use_kernel:
        s_model = dataclasses.replace(s_model, pallas_interpret=True)
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "shard")
        )
    )
    out = jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(s_model, xs)
    assert s_model.shard_mesh is not None  # halo path, not GSPMD fallback
    scale = float(jnp.abs(ref).max()) + 1e-30
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5 * scale
    )


def test_halo_overlap_split_matches_single_kernel(
    eight_device_mesh, monkeypatch
):
    """The interior/boundary overlap split (ADR-28) reproduces the
    single-kernel form to f32 rounding: the boundary planes run the
    single-plane kernel while the full form may take the 2-plane blocked
    kernel, whose dz-roll groups accumulate in a different order — a few
    ULPs on a handful of elements (measured 9/1200 at (15,4,4)x4), not a
    semantic difference (both forms independently match the unsharded
    operator at 1e-5)."""
    import dataclasses

    from civiwave_tpu.parallel.sharding import make_device_mesh, shard_structured

    model, force, _ = _structured_fixture((15, 4, 4), 4)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((3,) + model.grid_shape), jnp.float32)
    ss, mf = jnp.float32(1.01), jnp.float32(3.7)
    mesh = make_device_mesh(4)
    s_model, _, _ = shard_structured(model, model.zero_state(), force, mesh)
    s_model = dataclasses.replace(s_model, pallas_interpret=True)
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "shard")
        )
    )
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("CIVIWAVE_HALO_OVERLAP", flag)
        outs[flag] = np.asarray(
            jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(s_model, xs)
        )
    scale = np.abs(outs["0"]).max() + 1e-30
    np.testing.assert_allclose(outs["1"], outs["0"], atol=1e-6 * scale)


@pytest.mark.slow
def test_structured_sharded_step_with_pallas_kernel(eight_device_mesh):
    """Full sharded Newmark step with the fused Pallas slab kernel active
    per shard (interpret mode) matches the single-device step."""
    import dataclasses

    from civiwave_tpu.parallel.sharding import shard_structured

    model, force, ray = _structured_fixture((6, 3, 3), 8)
    state = model.zero_state()

    def step(m, s, f):
        return newmark_step(
            m, s, f, 0.001, 1.0e-7, 500,
            rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
        )

    out_single = jax.jit(step)(model, state, force)
    s_model, s_state, s_force = shard_structured(
        model, state, force, eight_device_mesh
    )
    s_model = dataclasses.replace(s_model, pallas_interpret=True)
    out_sharded = jax.jit(step)(s_model, s_state, s_force)

    assert bool(out_sharded.pcg.converged)
    u1 = np.asarray(out_single.state.displacement)
    u8 = np.asarray(out_sharded.state.displacement)
    np.testing.assert_allclose(u8, u1, atol=1e-5 * (np.abs(u1).max() + 1e-30))


# ---------------------------------------------------------------------------
# communication-reduced PCG: compiled-HLO collective-count proof
# ---------------------------------------------------------------------------

from functools import partial

from civiwave_tpu.parallel.collectives import pcg_body_collectives


def _compile_structured_step_hlo(mesh, variant):
    from civiwave_tpu.parallel.sharding import shard_structured
    from civiwave_tpu.solver.stepper import effective_scalars

    model, force, ray = _structured_fixture((15, 8, 8), 8)
    state = model.zero_state()
    s_model, s_state, s_force = shard_structured(model, state, force, mesh)
    ss, mf = effective_scalars(1e-3, ray.alpha, ray.beta)
    pc = jax.jit(lambda m, a, b: m.build_preconditioner(a, b))(s_model, ss, mf)
    step = jax.jit(
        partial(
            newmark_step,
            rayleigh_alpha=ray.alpha,
            rayleigh_beta=ray.beta,
            solver_variant=variant,
        )
    )
    return (
        step.lower(s_model, s_state, s_force, 1e-3, 2e-4, 120, preconditioner=pc)
        .compile()
        .as_text()
    )


@pytest.mark.slow
def test_pcg_iteration_collective_counts(eight_device_mesh):
    """Compiler-verified per-iteration collective counts on the sharded
    structured step (VERDICT round-2 item 1b): the fused Chronopoulos-Gear
    variant runs exactly ONE all-reduce per PCG iteration — a single (3,)
    f64 vector — where the classic 3-dot loop needs two sequential
    all-reduce points (p.Ap, then the XLA-merged {r.r, r.z} tuple).  Both
    keep the two halo collective-permutes of the X-slab stencil."""
    classic = pcg_body_collectives(
        _compile_structured_step_hlo(eight_device_mesh, "classic")
    )
    fused = pcg_body_collectives(
        _compile_structured_step_hlo(eight_device_mesh, "fused")
    )

    classic_ar = sum(n for (op, _), n in classic.items() if op == "all-reduce")
    fused_ar = sum(n for (op, _), n in fused.items() if op == "all-reduce")
    assert fused_ar == 1, f"fused variant should have 1 all-reduce: {fused}"
    assert classic_ar >= 2, f"classic should have >=2 all-reduces: {classic}"
    # the fused reduction is one (3,)-vector f64 all-reduce
    assert any(
        op == "all-reduce" and "f64[3]" in shape for (op, shape) in fused
    ), f"expected f64[3] fused all-reduce: {fused}"
    # halo exchange unchanged: 2 ghost-plane permutes in both variants
    classic_cp = sum(
        n for (op, _), n in classic.items() if op == "collective-permute"
    )
    fused_cp = sum(
        n for (op, _), n in fused.items() if op == "collective-permute"
    )
    assert classic_cp == fused_cp == 2


@pytest.mark.slow
def test_pipelined_collective_counts_and_overlap_structure(eight_device_mesh):
    """The pipelined (Ghysels-Vanroose) variant keeps the fused variant's
    collective budget — ONE (3,) f64 all-reduce + the 2 halo permutes per
    iteration — while restructuring the body so the all-reduce's result is
    first consumed AFTER the preconditioner+matvec pass, giving XLA's
    latency-hiding scheduler the window to overlap them (the overlap
    itself is a TPU scheduler behavior; what the HLO proves portably is
    the count and the single fused reduction).

    Scope note (ADVICE r3): pcg_body_collectives counts the while-body
    computation only.  The residual-replacement lax.cond branch is its own
    HLO computation carrying 2 additional halo permutes; it fires every
    `replace_every`-th iteration (default 10), so the true budget on those
    iterations is 1 AR + 4 CP.  The exclusion is deliberate — the steady-
    state per-iteration budget is what the latency projection uses — and
    is documented in ADR-25."""
    pipelined = pcg_body_collectives(
        _compile_structured_step_hlo(eight_device_mesh, "pipelined")
    )
    ar = sum(n for (op, _), n in pipelined.items() if op == "all-reduce")
    cp = sum(
        n for (op, _), n in pipelined.items() if op == "collective-permute"
    )
    assert ar == 1, f"pipelined variant should have 1 all-reduce: {pipelined}"
    assert cp == 2, f"expected 2 halo permutes: {pipelined}"
    assert any(
        op == "all-reduce" and "f64[3]" in shape for (op, shape) in pipelined
    ), f"expected f64[3] all-reduce: {pipelined}"


@pytest.mark.slow
def test_pipelined_variant_sharded_matches_classic_single_device(
    eight_device_mesh,
):
    """Pipelined variant + 8-way X-slab sharding vs classic single-device:
    same trajectory over 3 Newmark steps."""
    from civiwave_tpu.parallel.sharding import shard_structured

    model, force, ray = _structured_fixture((15, 8, 8), 8)
    state = model.zero_state()

    def make_step(variant):
        return jax.jit(
            partial(
                newmark_step,
                rayleigh_alpha=ray.alpha,
                rayleigh_beta=ray.beta,
                solver_variant=variant,
            )
        )

    classic_step = make_step("classic")
    pipelined_step = make_step("pipelined")

    s_model, s_state, s_force = shard_structured(
        model, state, force, eight_device_mesh
    )
    ref_state = state
    for _ in range(3):
        out_ref = classic_step(model, ref_state, force, 1e-3, 2e-4, 120)
        ref_state = out_ref.state
        out_sharded = pipelined_step(s_model, s_state, s_force, 1e-3, 2e-4, 120)
        s_state = out_sharded.state
        assert bool(out_sharded.pcg.converged)
        assert abs(
            int(out_sharded.pcg.iterations) - int(out_ref.pcg.iterations)
        ) <= max(3, int(0.2 * int(out_ref.pcg.iterations)))
        got = np.asarray(
            jax.device_get(out_sharded.state.displacement)
        )
        ref = np.asarray(jax.device_get(ref_state.displacement))
        scale_ref = np.abs(ref).max() + 1e-30
        np.testing.assert_allclose(got, ref, atol=2e-4 * scale_ref)


@pytest.mark.slow
def test_fused_variant_sharded_matches_classic_single_device(eight_device_mesh):
    """Trajectory parity across BOTH axes at once: fused variant + 8-way
    X-slab sharding vs classic single-device, 3 Newmark steps."""
    from civiwave_tpu.parallel.sharding import shard_structured

    model, force, ray = _structured_fixture((15, 8, 8), 8)
    state = model.zero_state()

    def make_step(variant):
        return jax.jit(
            partial(
                newmark_step,
                rayleigh_alpha=ray.alpha,
                rayleigh_beta=ray.beta,
                solver_variant=variant,
            )
        )

    classic_step = make_step("classic")
    fused_step = make_step("fused")

    s_model, s_state, s_force = shard_structured(
        model, state, force, eight_device_mesh
    )
    ref_state = state
    for _ in range(3):
        out_ref = classic_step(model, ref_state, force, 1e-3, 2e-4, 120)
        ref_state = out_ref.state
        out_sharded = fused_step(s_model, s_state, s_force, 1e-3, 2e-4, 120)
        s_state = out_sharded.state
        assert bool(out_sharded.pcg.converged)
        assert abs(
            int(out_sharded.pcg.iterations) - int(out_ref.pcg.iterations)
        ) <= max(2, int(0.15 * int(out_ref.pcg.iterations)))
    u_ref = np.asarray(ref_state.displacement)
    u_fused = np.asarray(s_state.displacement)
    scale = np.abs(u_ref).max() + 1e-30
    np.testing.assert_allclose(u_fused, u_ref, atol=2e-4 * scale)


@pytest.mark.slow
def test_heterogeneous_structured_sharded_matches_single_device(
    eight_device_mesh,
):
    """Heterogeneous material grids + X-slab sharding (round-2 VERDICT
    item 5): the material CELL grids shard along X with the solver
    vectors (no per-chip replication), the GSPMD corner-gather operator
    handles the +/-1 element-view halos, and the sharded step matches the
    single-device one.  The reference always supported multi-material
    (buffers.cpp:67-96) but never multi-device."""
    import dataclasses as dc

    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.parallel.sharding import shard_structured
    from civiwave_tpu.utils.synthetic import cantilever_config

    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    nx, ny, nz = 15, 6, 6
    rng = np.random.default_rng(11)
    lam0 = mats[0].lame.lam
    mu0 = mats[0].lame.mu
    lam_grid = lam0 * (1.0 + rng.uniform(0.0, 1.0, (nx, ny, nz)))
    mu_grid = mu0 * (1.0 + rng.uniform(0.0, 1.0, (nx, ny, nz)))
    model, force = build_structured_model(
        nx, ny, nz, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6), pad_x_multiple=8,
        lam_grid=lam_grid, mu_grid=mu_grid,
    )
    assert not model.homogeneous
    state = model.zero_state()

    def step(m, s, f):
        return newmark_step(
            m, s, f, 0.001, 1.0e-7, 500,
            rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
        )

    out_single = jax.jit(step)(model, state, force)
    s_model, s_state, s_force = shard_structured(
        model, state, force, eight_device_mesh
    )
    # material grids are genuinely distributed, not replicated
    assert len(s_model.lam_grid.sharding.device_set) == 8
    assert not s_model.lam_grid.sharding.is_fully_replicated
    out_sharded = jax.jit(step)(s_model, s_state, s_force)

    assert bool(out_sharded.pcg.converged)
    u1 = np.asarray(out_single.state.displacement)
    u8 = np.asarray(out_sharded.state.displacement)
    np.testing.assert_allclose(u8, u1, atol=1e-5 * (np.abs(u1).max() + 1e-30))


@pytest.mark.slow
def test_absorbing_structured_sharded_matches_single_device(
    eight_device_mesh,
):
    """Absorbing-face dashpots under X-slab sharding: the face-plane
    operator updates ride OUTSIDE shard_map on the GSPMD-sharded arrays,
    so a step with dashpots on four faces must reproduce the single-device
    trajectory (physics/absorbing.py, ADR-24)."""
    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.parallel.sharding import shard_structured
    from civiwave_tpu.utils.synthetic import cantilever_config

    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    model, force = build_structured_model(
        6, 3, 3, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6), pad_x_multiple=8,
        absorb_planes=("x1", "y0", "y1", "z0"),
    )
    state = model.zero_state()

    def step(m, s, f):
        return newmark_step(
            m, s, f, 0.001, 1.0e-7, 500,
            rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
        )

    out_single = jax.jit(step)(model, state, force)
    s_model, s_state, s_force = shard_structured(
        model, state, force, eight_device_mesh
    )
    assert s_model.absorb_faces == ("x1", "y0", "y1", "z0")
    out_sharded = jax.jit(step)(s_model, s_state, s_force)
    assert bool(out_sharded.pcg.converged)
    u1 = np.asarray(out_single.state.displacement)
    u8 = np.asarray(out_sharded.state.displacement)
    np.testing.assert_allclose(u8, u1, atol=1e-5 * (np.abs(u1).max() + 1e-30))


# ---------------------------------------------------------------------------
# 2-D (X, Y) slab decomposition (round-4 VERDICT item 3)
# ---------------------------------------------------------------------------


def _structured_fixture_2d(dims, npx, npy):
    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.utils.synthetic import cantilever_config

    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    model, force = build_structured_model(
        *dims, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
        pad_x_multiple=npx, pad_y_multiple=npy,
    )
    return model, force, ray


@pytest.mark.parametrize("use_kernel", [False, True])
@pytest.mark.parametrize(
    "dims,grid",
    # (9,4,5) x (2,4): ys=5 on 4 shards -> pad_rows=3 (dead +Y rows)
    [((6, 5, 4), (4, 2)), ((9, 4, 5), (2, 4)), ((7, 7, 3), (2, 2))],
)
def test_structured_2d_operator_matches_unsharded(
    eight_device_mesh, use_kernel, dims, grid
):
    """The 2-D (X, Y) shard_map operator — ghost ROWS along Y, ghost
    PLANES along X carrying the corner values through two hops — must
    equal the single-device operator elementwise on the live region, for
    both the ghost-Y fused Pallas kernel (interpret mode) and the GSPMD
    fallback, including dead +Y pad rows."""
    import dataclasses

    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.parallel.sharding import (
        make_device_mesh_2d,
        shard_structured,
    )
    from civiwave_tpu.utils.synthetic import cantilever_config

    npx, npy = grid
    model, force, _ = _structured_fixture_2d(dims, npx, npy)

    # unpadded single-chip reference
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    ref_model, _rf = build_structured_model(
        *dims, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    rng = np.random.default_rng(3)
    x_ref = jnp.asarray(
        rng.standard_normal((3,) + ref_model.grid_shape), jnp.float32
    )
    gx, gy, gz = model.grid_shape
    x_pad = jnp.zeros((3, gx, gy, gz), jnp.float32)
    x_pad = x_pad.at[:, : x_ref.shape[1], : x_ref.shape[2]].set(x_ref)

    ss, mf = jnp.float32(1.01), jnp.float32(3.7)
    ref = jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(ref_model, x_ref)

    mesh = make_device_mesh_2d(npx, npy)
    s_model, _, _ = shard_structured(
        model, model.zero_state(), force, mesh, axis_name_y="shard_y"
    )
    assert s_model.shard_axis_y == "shard_y"
    if use_kernel:
        s_model = dataclasses.replace(s_model, pallas_interpret=True)
    xs = jax.device_put(
        x_pad,
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "shard", "shard_y")
        ),
    )
    out = jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(s_model, xs)
    scale = float(jnp.abs(ref).max()) + 1e-30
    np.testing.assert_allclose(
        np.asarray(out)[:, : x_ref.shape[1], : x_ref.shape[2]],
        np.asarray(ref),
        atol=1e-5 * scale,
    )


def test_halo_overlap_split_2d_matches_single_kernel(
    eight_device_mesh, monkeypatch
):
    """ADR-28 on the 2-D mesh: the interior/boundary split — interior
    planes reading the Y-extended pre-X-exchange tile so the X plane
    permutes overlap the interior sweep — reproduces the single-kernel
    ghost-Y form to f32 rounding (same dz-roll grouping caveat as 1-D),
    and both match the unsharded operator at 1e-5."""
    import dataclasses

    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.parallel.sharding import (
        make_device_mesh_2d,
        shard_structured,
    )
    from civiwave_tpu.utils.synthetic import cantilever_config

    dims, npx, npy = (15, 7, 4), 4, 2
    model, force, _ = _structured_fixture_2d(dims, npx, npy)
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    ref_model, _rf = build_structured_model(
        *dims, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    rng = np.random.default_rng(29)
    x_ref = jnp.asarray(
        rng.standard_normal((3,) + ref_model.grid_shape), jnp.float32
    )
    gx, gy, gz = model.grid_shape
    x_pad = jnp.zeros((3, gx, gy, gz), jnp.float32)
    x_pad = x_pad.at[:, : x_ref.shape[1], : x_ref.shape[2]].set(x_ref)
    ss, mf = jnp.float32(1.01), jnp.float32(3.7)
    ref = jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(ref_model, x_ref)

    mesh = make_device_mesh_2d(npx, npy)
    s_model, _, _ = shard_structured(
        model, model.zero_state(), force, mesh, axis_name_y="shard_y"
    )
    s_model = dataclasses.replace(s_model, pallas_interpret=True)
    # x_local = 4: the split engages under the default/auto policy
    assert (model.nx + 1 + model.pad_planes) // npx == 4
    xs = jax.device_put(
        x_pad,
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "shard", "shard_y")
        ),
    )
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("CIVIWAVE_HALO_OVERLAP", flag)
        outs[flag] = np.asarray(
            jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(s_model, xs)
        )
    scale = np.abs(outs["0"]).max() + 1e-30
    np.testing.assert_allclose(outs["1"], outs["0"], atol=1e-6 * scale)
    ref_scale = float(jnp.abs(ref).max()) + 1e-30
    for flag in ("0", "1"):
        np.testing.assert_allclose(
            outs[flag][:, : x_ref.shape[1], : x_ref.shape[2]],
            np.asarray(ref),
            atol=1e-5 * ref_scale,
        )


@pytest.mark.slow
def test_structured_2d_step_matches_single_device(eight_device_mesh):
    """Full Newmark step over a (4, 2) device mesh with the ghost-Y fused
    kernel per shard (interpret mode) vs the single-device step."""
    import dataclasses

    from civiwave_tpu.parallel.sharding import (
        make_device_mesh_2d,
        shard_structured,
    )

    model, force, ray = _structured_fixture_2d((7, 5, 6), 4, 2)
    state = model.zero_state()

    def step(m, s, f):
        return newmark_step(
            m, s, f, 0.001, 1.0e-7, 500,
            rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
        )

    out_single = jax.jit(step)(model, state, force)
    mesh = make_device_mesh_2d(4, 2)
    s_model, s_state, s_force = shard_structured(
        model, state, force, mesh, axis_name_y="shard_y"
    )
    s_model = dataclasses.replace(s_model, pallas_interpret=True)
    out_sharded = jax.jit(step)(s_model, s_state, s_force)
    assert bool(out_sharded.pcg.converged)
    u1 = np.asarray(out_single.state.displacement)
    u8 = np.asarray(out_sharded.state.displacement)
    np.testing.assert_allclose(u8, u1, atol=1e-5 * (np.abs(u1).max() + 1e-30))


@pytest.mark.slow
def test_structured_2d_collective_counts(eight_device_mesh):
    """Compiler-verified 2-D halo budget: the fused variant keeps its ONE
    f64 (3,) all-reduce and issues exactly FOUR collective-permutes per
    PCG iteration (2 ghost rows along Y, then 2 Y-extended ghost planes
    along X whose ends carry the diagonal-corner values through two
    hops).  The loop-invariant bc-mask exchange hoists out of the while
    body, exactly as in the 1-D budget test.

    pallas_interpret forces the ghost-Y kernel path (the production TPU
    form) — without it CPU compiles the GSPMD fallback, whose implicit
    halo exchanges are correct but not the explicit 4-permute budget."""
    import dataclasses

    from civiwave_tpu.parallel.sharding import (
        make_device_mesh_2d,
        shard_structured,
    )
    from civiwave_tpu.solver.stepper import effective_scalars

    model, force, ray = _structured_fixture_2d((15, 8, 8), 4, 2)
    state = model.zero_state()
    mesh = make_device_mesh_2d(4, 2)
    s_model, s_state, s_force = shard_structured(
        model, state, force, mesh, axis_name_y="shard_y"
    )
    s_model = dataclasses.replace(s_model, pallas_interpret=True)
    ss, mf = effective_scalars(1e-3, ray.alpha, ray.beta)
    pc = jax.jit(lambda m, a, b: m.build_preconditioner(a, b))(s_model, ss, mf)
    step = jax.jit(
        partial(
            newmark_step,
            rayleigh_alpha=ray.alpha,
            rayleigh_beta=ray.beta,
            solver_variant="fused",
        )
    )
    hlo = (
        step.lower(s_model, s_state, s_force, 1e-3, 2e-4, 120, preconditioner=pc)
        .compile()
        .as_text()
    )
    fused = pcg_body_collectives(hlo)
    ar = sum(n for (op, _), n in fused.items() if op == "all-reduce")
    cp = sum(n for (op, _), n in fused.items() if op == "collective-permute")
    # the ONE logical (3,) f64 reduction lowers dimension-wise over the
    # 2-D mesh: one all-reduce per mesh axis (the standard torus
    # algorithm GSPMD picks) — 2 AR ops, still a single reduction point
    assert ar == 2, f"expected 2 axis-wise all-reduce ops: {fused}"
    assert all(
        "f64[3]" in shape
        for (op, shape) in fused
        if op == "all-reduce"
    ), f"expected f64[3] axis-wise all-reduces: {fused}"
    assert cp == 4, f"expected 4 halo permutes on a 2-D mesh: {fused}"


@pytest.mark.slow
def test_pipelined_variant_2d_matches_classic_single_device(
    eight_device_mesh,
):
    """Pipelined (Ghysels-Vanroose) variant over the 2-D (X, Y) mesh vs
    classic single-device: same trajectory over 2 Newmark steps — the
    basin feature stack (pipelined + 2-D decomposition) composes."""
    import dataclasses

    from civiwave_tpu.parallel.sharding import (
        make_device_mesh_2d,
        shard_structured,
    )

    model, force, ray = _structured_fixture_2d((7, 5, 6), 4, 2)
    state = model.zero_state()

    def make_step(variant):
        return jax.jit(
            partial(
                newmark_step,
                rayleigh_alpha=ray.alpha,
                rayleigh_beta=ray.beta,
                solver_variant=variant,
            )
        )

    classic_step = make_step("classic")
    pipelined_step = make_step("pipelined")
    mesh = make_device_mesh_2d(4, 2)
    s_model, s_state, s_force = shard_structured(
        model, state, force, mesh, axis_name_y="shard_y"
    )
    s_model = dataclasses.replace(s_model, pallas_interpret=True)
    ref_state = state
    for _ in range(2):
        out_ref = classic_step(model, ref_state, force, 1e-3, 2e-4, 120)
        ref_state = out_ref.state
        out_sharded = pipelined_step(
            s_model, s_state, s_force, 1e-3, 2e-4, 120
        )
        s_state = out_sharded.state
        assert bool(out_sharded.pcg.converged)
    got = np.asarray(s_state.displacement)
    ref = np.asarray(ref_state.displacement)
    scale = np.abs(ref).max() + 1e-30
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale)


@pytest.mark.slow
def test_heterogeneous_structured_2d_matches_single_device(
    eight_device_mesh,
):
    """Heterogeneous material grids on a 2-D (X, Y) device mesh: cell
    grids shard P(x, y) (Y-padded to the node extent), the GSPMD
    corner-gather operator handles both element-view halos, and the
    sharded step matches the single-device one."""
    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.parallel.sharding import (
        make_device_mesh_2d,
        shard_structured,
    )
    from civiwave_tpu.utils.synthetic import cantilever_config

    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    nx, ny, nz = 7, 4, 5  # ys=5 on npy=2 -> pad_rows=1 (dead Y row)
    rng = np.random.default_rng(23)
    lam0, mu0 = mats[0].lame.lam, mats[0].lame.mu
    model, force = build_structured_model(
        nx, ny, nz, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
        pad_x_multiple=4, pad_y_multiple=2,
        lam_grid=lam0 * (1.0 + rng.uniform(0.0, 1.0, (nx, ny, nz))),
        mu_grid=mu0 * (1.0 + rng.uniform(0.0, 1.0, (nx, ny, nz))),
    )
    assert not model.homogeneous and model.pad_rows == 1
    state = model.zero_state()

    def step(m, s, f):
        return newmark_step(
            m, s, f, 0.001, 1.0e-7, 500,
            rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
        )

    out_single = jax.jit(step)(model, state, force)
    mesh = make_device_mesh_2d(4, 2)
    s_model, s_state, s_force = shard_structured(
        model, state, force, mesh, axis_name_y="shard_y"
    )
    assert len(s_model.lam_grid.sharding.device_set) == 8
    assert not s_model.lam_grid.sharding.is_fully_replicated
    out_sharded = jax.jit(step)(s_model, s_state, s_force)
    assert bool(out_sharded.pcg.converged)
    u1 = np.asarray(out_single.state.displacement)
    u8 = np.asarray(out_sharded.state.displacement)
    np.testing.assert_allclose(u8, u1, atol=1e-5 * (np.abs(u1).max() + 1e-30))


@pytest.mark.slow
def test_absorbing_structured_2d_matches_single_device(eight_device_mesh):
    """Lysmer-Kuhlemeyer dashpots under the 2-D (X, Y) decomposition: the
    face-plane operator updates ride OUTSIDE shard_map on the GSPMD
    arrays with P(x, y) shardings, so the basin feature stack must
    reproduce the single-device trajectory on the 2-D mesh too."""
    import dataclasses

    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.parallel.sharding import (
        make_device_mesh_2d,
        shard_structured,
    )
    from civiwave_tpu.utils.synthetic import cantilever_config

    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    model, force = build_structured_model(
        7, 5, 4, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6), pad_x_multiple=4, pad_y_multiple=2,
        absorb_planes=("x1", "y0", "y1", "z0"),
    )
    state = model.zero_state()

    def step(m, s, f):
        return newmark_step(
            m, s, f, 0.001, 1.0e-7, 500,
            rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
        )

    out_single = jax.jit(step)(model, state, force)
    mesh = make_device_mesh_2d(4, 2)
    s_model, s_state, s_force = shard_structured(
        model, state, force, mesh, axis_name_y="shard_y"
    )
    assert s_model.absorb_faces == ("x1", "y0", "y1", "z0")
    s_model = dataclasses.replace(s_model, pallas_interpret=True)
    out_sharded = jax.jit(step)(s_model, s_state, s_force)
    assert bool(out_sharded.pcg.converged)
    u1 = np.asarray(out_single.state.displacement)
    u8 = np.asarray(out_sharded.state.displacement)
    np.testing.assert_allclose(u8, u1, atol=1e-5 * (np.abs(u1).max() + 1e-30))


# ---------------------------------------------------------------------------
# general-path banded halo exchange (parallel/general_halo.py, ADR-30)
# ---------------------------------------------------------------------------


def _general_fixture(dims, hex_elements, pad=64):
    from civiwave_tpu.utils.synthetic import box_mesh, cantilever_config

    mesh = box_mesh(*dims, hex_elements=hex_elements)
    cfg = cantilever_config()
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    model, state, force = pack.build_packed_model(
        mesh, pre, cfg, mats, pad_nodes=pad, pad_elems=pad
    )
    return model, state, force, ray


@pytest.mark.parametrize(
    "dims,hex_elements",
    [((24, 3, 3), True), ((20, 4, 3), False)],
)
def test_general_halo_operator_matches_unsharded(
    eight_device_mesh, dims, hex_elements
):
    """The banded halo-exchange matvec (2 ppermutes, per-shard element
    and assembly tables with LOCAL indices) equals the single-device
    operator elementwise, for both element blocks."""
    model, state, force, _ = _general_fixture(dims, hex_elements)
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.standard_normal((model.padded_node_count, 3)), jnp.float32
    )
    ss, mf = jnp.float32(1.01), jnp.float32(3.7)
    ref = jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(model, x)

    s_model, _, _ = shard_simulation(model, state, force, eight_device_mesh)
    assert s_model.halo_conn is not None, "plan should engage on this mesh"
    assert s_model.halo_ghost <= s_model.halo_local_nodes
    xs = jax.device_put(
        x,
        jax.sharding.NamedSharding(
            eight_device_mesh, jax.sharding.PartitionSpec("shard")
        ),
    )
    out = jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(s_model, xs)
    scale = float(jnp.abs(ref).max()) + 1e-30
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5 * scale
    )


def test_general_halo_step_matches_single_device(eight_device_mesh):
    """Full Newmark step through the halo-exchange operator vs the
    single-device step (the dots/axpys/preconditioner stay GSPMD around
    the shard_map matvec)."""
    model, state, force, ray = _general_fixture((24, 3, 3), True)

    def step(m, s, f):
        return newmark_step(
            m, s, f, 0.001, 1.0e-7, 500,
            rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
        )

    out_single = jax.jit(step)(model, state, force)
    s_model, s_state, s_force = shard_simulation(
        model, state, force, eight_device_mesh
    )
    assert s_model.halo_conn is not None
    out_sharded = jax.jit(step)(s_model, s_state, s_force)
    assert bool(out_sharded.pcg.converged)
    u1 = np.asarray(out_single.state.displacement)
    u8 = np.asarray(out_sharded.state.displacement)
    np.testing.assert_allclose(u8, u1, atol=1e-5 * (np.abs(u1).max() + 1e-30))


@pytest.mark.slow
def test_general_halo_collective_counts(eight_device_mesh):
    """Compiler-verified budget: the fused-variant PCG iteration through
    the halo operator issues exactly ONE f64 all-reduce (the fused dots)
    and TWO collective-permutes of (G, 3) rows — the x ghost receive and
    the force partial return.  GSPMD's implicit all-gathers are gone."""
    from functools import partial

    from civiwave_tpu.parallel.collectives import pcg_body_collectives
    from civiwave_tpu.solver.stepper import effective_scalars

    model, state, force, ray = _general_fixture((24, 3, 3), True)
    s_model, s_state, s_force = shard_simulation(
        model, state, force, eight_device_mesh
    )
    assert s_model.halo_conn is not None
    ss, mf = effective_scalars(1e-3, ray.alpha, ray.beta)
    pc = jax.jit(lambda m, a, b: m.build_preconditioner(a, b))(s_model, ss, mf)
    step = jax.jit(
        partial(
            newmark_step,
            rayleigh_alpha=ray.alpha,
            rayleigh_beta=ray.beta,
            solver_variant="fused",
        )
    )
    hlo = (
        step.lower(s_model, s_state, s_force, 1e-3, 2e-4, 120,
                   preconditioner=pc)
        .compile()
        .as_text()
    )
    ops = pcg_body_collectives(hlo)
    ar = sum(n for (op, _), n in ops.items() if op == "all-reduce")
    cp = sum(n for (op, _), n in ops.items() if op == "collective-permute")
    ag = sum(n for (op, _), n in ops.items() if op == "all-gather")
    assert ar == 1, f"expected the one fused f64 all-reduce: {ops}"
    assert cp == 2, f"expected 2 halo permutes per iteration: {ops}"
    assert ag == 0, f"halo path must not all-gather: {ops}"


def test_general_halo_fallback_paths(eight_device_mesh, monkeypatch):
    """Plans that cannot hold fall back to pure GSPMD: a bar whose node
    bandwidth exceeds one block (the original small fixture), and the
    explicit CIVIWAVE_GENERAL_HALO=0 opt-out."""
    _, _, _, model, state, force = _build(8)
    s_model, _, _ = shard_simulation(model, state, force, eight_device_mesh)
    assert s_model.halo_conn is None  # bandwidth > L on the 4x2x2 bar

    big, st, f, _ = _general_fixture((24, 3, 3), True)
    monkeypatch.setenv("CIVIWAVE_GENERAL_HALO", "0")
    s2, _, _ = shard_simulation(big, st, f, eight_device_mesh)
    assert s2.halo_conn is None
