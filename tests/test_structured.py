"""Structured fast path vs the general unstructured path — must be equal.

The structured stencil operator and the PackedModel gather operator compute
the same physics on the same box; this suite pins elementwise equality of
the matvec, the preconditioner blocks, and full Newmark steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.ops.block_jacobi import build_block_jacobi_inverse
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


def test_metadata_and_tables_match(both_models):
    packed, structured, *_ = both_models
    assert structured.node_count == packed.node_count
    np.testing.assert_allclose(
        np.asarray(structured.lumped_mass),
        np.asarray(packed.lumped_mass),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(structured.bc_mask), np.asarray(packed.bc_mask)
    )
    np.testing.assert_allclose(
        np.asarray(structured.position0), np.asarray(packed.position0)
    )


def test_external_force_matches(both_models):
    packed, structured, force_packed, force_structured, _ = both_models
    np.testing.assert_allclose(
        np.asarray(force_structured), np.asarray(force_packed), rtol=1e-6, atol=1e-3
    )


def test_apply_keff_matches(both_models, rng):
    packed, structured, *_ = both_models
    x = jnp.asarray(
        rng.standard_normal((packed.padded_node_count, 3)).astype(np.float32) * 0.01
    )
    scale, mf = np.float32(1.3), np.float32(2.5e5)
    out_packed = np.asarray(jax.jit(lambda m, v: m.apply_keff(v, scale, mf))(packed, x))
    out_struct = np.asarray(
        jax.jit(lambda m, v: m.apply_keff(v, scale, mf))(structured, x)
    )
    ref_scale = np.abs(out_packed).max()
    np.testing.assert_allclose(out_struct, out_packed, atol=3e-6 * ref_scale)


def test_node_blocks_match(both_models):
    packed, structured, *_ = both_models
    scale, mf = np.float32(1.0), np.float32(1.0e5)
    blocks_packed = np.asarray(packed.assemble_node_blocks(scale, mf))
    blocks_struct = np.asarray(structured.assemble_node_blocks(scale, mf))
    ref = np.abs(blocks_packed).max()
    np.testing.assert_allclose(blocks_struct, blocks_packed, atol=3e-6 * ref)


def test_pcg_solution_matches(both_models):
    packed, structured, force_packed, force_structured, _ = both_models
    scale, mf = np.float32(1.0), np.float32(4.0e6)
    rhs_p = jnp.where(packed.bc_mask, packed.bc_value, force_packed)
    rhs_s = jnp.where(structured.bc_mask, structured.bc_value, force_structured)
    x0p = jnp.zeros_like(rhs_p)
    sol_p, tel_p = jax.jit(solve_pcg, static_argnames="warm_start")(
        packed, rhs_p, scale, mf, 1e-8, 1000, x0p, warm_start=False
    )
    sol_s, tel_s = jax.jit(solve_pcg, static_argnames="warm_start")(
        structured, rhs_s, scale, mf, 1e-8, 1000, jnp.zeros_like(rhs_s), warm_start=False
    )
    assert bool(tel_p.converged) and bool(tel_s.converged)
    ref = np.abs(np.asarray(sol_p)).max()
    np.testing.assert_allclose(
        np.asarray(sol_s), np.asarray(sol_p), atol=1e-4 * ref
    )


def test_newmark_step_matches(both_models):
    packed, structured, force_packed, force_structured, ray = both_models
    from civiwave_tpu.mesh.pack import SimState, zero_state

    def run(model, force):
        state = zero_state(model) if hasattr(model, "force_row_count") else SimState(
            *(jnp.zeros((model.padded_node_count, 3), jnp.float32) for _ in range(4))
        )
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
        return np.asarray(state.displacement), np.asarray(state.velocity)

    u_p, v_p = run(packed, force_packed)
    u_s, v_s = run(structured, force_structured)
    np.testing.assert_allclose(u_s, u_p, atol=1e-4 * (np.abs(u_p).max() + 1e-30))
    np.testing.assert_allclose(v_s, v_p, atol=1e-3 * (np.abs(v_p).max() + 1e-30))
