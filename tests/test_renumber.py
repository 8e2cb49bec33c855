"""RCM node renumbering (mesh/renumber.py, ADR-32).

The reference's CSR gather is ordering-indifferent
(/root/reference/src/gpu/pcg.cpp:653-661); the rebuild's banded fast paths
(gather windows ADR-20, halo plan ADR-30) are bandwidth-gated.  These
tests prove that on a randomly shuffled node numbering — the worst case —
pack's RCM renumbering (a) keeps solutions identical to the unshuffled
mesh after inverse mapping, (b) re-engages the gather windows AND the
8-device banded halo plan, and (c) leaves the host-facing edges
(to_nodal/from_nodal, probes, time-curve forces) in original mesh order.
"""

import jax
import numpy as np
import pytest

from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.mesh.renumber import element_spans, plan_renumbering
from civiwave_tpu.parallel.sharding import make_device_mesh, shard_simulation
from civiwave_tpu.physics import materials
from civiwave_tpu.solver.stepper import NewmarkStepper
from civiwave_tpu.utils.synthetic import (
    box_mesh,
    cantilever_config,
    shuffle_mesh_nodes,
)


def _pack(mesh, cfg=None, **kw):
    cfg = cfg or cantilever_config()
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, state, force = pack.build_packed_model(mesh, pre, cfg, mats, **kw)
    return cfg, mats, model, state, force


def _shuffle_inverse(shuffled_mesh):
    """iperm[new_id] = old_id, recovered from original file ids (box_mesh
    numbers them 1..n in native order)."""
    return np.asarray(shuffled_mesh.node_original_ids, dtype=np.int64) - 1


# ---------------------------------------------------------------------------
# planning


def test_plan_improves_shuffled_spans():
    mesh = shuffle_mesh_nodes(box_mesh(6, 3, 3, hex_elements=True), seed=3)
    conn = [mesh.elements[:, :8]]
    native = element_spans(conn)
    pair = plan_renumbering(conn, mesh.node_count)
    assert pair is not None
    perm, iperm = pair
    assert sorted(perm) == list(range(mesh.node_count))
    np.testing.assert_array_equal(perm[iperm], np.arange(mesh.node_count))
    assert element_spans(conn, perm) < native


def test_plan_skips_when_no_improvement():
    # a single element is already optimal under any numbering
    mesh = box_mesh(1, 1, 1, hex_elements=True)
    assert plan_renumbering([mesh.elements], mesh.node_count) is None


# ---------------------------------------------------------------------------
# window / halo engagement


@pytest.mark.parametrize("hex_elements", [True, False])
def test_shuffled_pack_reengages_windows(hex_elements):
    mesh = shuffle_mesh_nodes(
        box_mesh(8, 4, 4, hex_elements=hex_elements), seed=11
    )
    _, _, model, _, _ = _pack(mesh)
    assert model.renumbered
    windows = model.xw_hex if hex_elements else model.xw_tet
    assert windows, "x-gather windows must engage after renumbering"
    assert model.aw, "assembly windows must engage after renumbering"


def test_escape_hatch_disables_renumbering(monkeypatch):
    monkeypatch.setenv("CIVIWAVE_RENUMBER", "0")
    mesh = shuffle_mesh_nodes(box_mesh(8, 4, 4, hex_elements=True), seed=11)
    _, _, model, _, _ = _pack(mesh)
    assert not model.renumbered
    assert model.perm_new_of_old is None


def test_shuffled_halo_plan_engages_on_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = shuffle_mesh_nodes(box_mesh(24, 3, 3, hex_elements=True), seed=5)
    _, _, model, state, force = _pack(mesh, pad_nodes=64, pad_elems=64)
    assert model.renumbered
    dmesh = make_device_mesh(8)
    s_model, s_state, s_force = shard_simulation(model, state, force, dmesh)
    assert s_model.halo_conn is not None, (
        "banded halo plan must engage on the renumbered bar"
    )
    # the sharded operator must match the single-device one through the
    # original-order nodal mapping
    rng = np.random.default_rng(0)
    x_nodal = rng.standard_normal((mesh.node_count, 3)).astype(np.float32)
    args = (np.float32(1.0), np.float32(2.0e6))
    y1 = np.asarray(
        model.to_nodal(model.apply_keff(model.from_nodal(x_nodal), *args))
    )
    y8 = np.asarray(
        s_model.to_nodal(
            jax.jit(
                lambda m, x: m.apply_keff(x, *args)
            )(s_model, s_model.from_nodal(x_nodal))
        )
    )
    scale = np.abs(y1).max() + 1e-30
    np.testing.assert_allclose(y8, y1, atol=1e-4 * scale)


# ---------------------------------------------------------------------------
# solution parity: shuffled == unshuffled after inverse mapping


@pytest.mark.parametrize("hex_elements", [True, False])
def test_shuffled_solution_matches_unshuffled(hex_elements):
    base = box_mesh(4, 2, 2, hex_elements=hex_elements)
    shuffled = shuffle_mesh_nodes(base, seed=7)
    iperm = _shuffle_inverse(shuffled)

    def run(mesh):
        cfg, _, model, state, force = _pack(mesh)
        ray = materials.compute_rayleigh(cfg.damping)
        stepper = NewmarkStepper(
            model, state, force, ray, cfg.solver, cfg.time
        )
        for k in range(3):
            t = stepper.step(k * cfg.time.initial_dt)
            assert t.pcg_converged
        return model, stepper

    model_a, stepper_a = run(base)
    model_b, stepper_b = run(shuffled)
    assert model_b.renumbered

    u_a = stepper_a.displacement()  # original numbering of `base`
    u_b = stepper_b.displacement()  # original numbering of `shuffled`
    scale = np.abs(u_a).max() + 1e-30
    # shuffled mesh's node j is base node iperm[j]
    np.testing.assert_allclose(u_b, u_a[iperm], atol=2e-5 * scale)
    v_a, v_b = stepper_a.velocity(), stepper_b.velocity()
    vscale = np.abs(v_a).max() + 1e-30
    np.testing.assert_allclose(v_b, v_a[iperm], atol=2e-4 * vscale)


def test_shuffled_solution_matches_without_renumbering(monkeypatch):
    """Ordering-indifference holds on the slow fallback too (escape
    hatch): correctness never depends on the RCM pass."""
    monkeypatch.setenv("CIVIWAVE_RENUMBER", "0")
    base = box_mesh(3, 2, 2, hex_elements=True)
    shuffled = shuffle_mesh_nodes(base, seed=13)
    iperm = _shuffle_inverse(shuffled)

    def one_step(mesh):
        cfg, _, model, state, force = _pack(mesh)
        ray = materials.compute_rayleigh(cfg.damping)
        stepper = NewmarkStepper(
            model, state, force, ray, cfg.solver, cfg.time
        )
        assert stepper.step(0.0).pcg_converged
        return model, stepper.displacement()

    model_a, u_a = one_step(base)
    model_b, u_b = one_step(shuffled)
    assert not model_b.renumbered
    scale = np.abs(u_a).max() + 1e-30
    np.testing.assert_allclose(u_b, u_a[iperm], atol=2e-5 * scale)


# ---------------------------------------------------------------------------
# host-facing edges


def test_to_from_nodal_roundtrip_under_renumbering():
    mesh = shuffle_mesh_nodes(box_mesh(5, 3, 2, hex_elements=True), seed=2)
    _, _, model, _, _ = _pack(mesh)
    assert model.renumbered
    rng = np.random.default_rng(1)
    rows = rng.standard_normal((mesh.node_count, 3)).astype(np.float32)
    back = np.asarray(model.to_nodal(model.from_nodal(rows)))
    np.testing.assert_array_equal(back, rows)
    # the internal layout really is permuted (not identity)
    internal = np.asarray(model.from_nodal(rows))[: mesh.node_count]
    assert not np.array_equal(internal, rows)


def test_positions_permute_consistently():
    """position0 in internal order must equal mesh positions routed
    through the same permutation to_nodal undoes."""
    mesh = shuffle_mesh_nodes(box_mesh(4, 3, 2, hex_elements=True), seed=9)
    _, _, model, _, _ = _pack(mesh)
    assert model.renumbered
    pos_back = np.asarray(model.to_nodal(model.position0))
    np.testing.assert_allclose(
        pos_back, mesh.node_positions.astype(np.float32), rtol=0, atol=0
    )


def test_external_force_lands_on_loaded_nodes():
    mesh = shuffle_mesh_nodes(box_mesh(4, 2, 2, hex_elements=True), seed=4)
    cfg, _, model, _, force = _pack(mesh)
    assert model.renumbered
    f_nodal = np.asarray(model.to_nodal(force))
    loaded = np.abs(f_nodal[:, 2]) > 0
    # the traction acts on the x = nx face: exactly those nodes load
    on_face = np.isclose(mesh.node_positions[:, 0], 4.0)
    np.testing.assert_array_equal(loaded, on_face)
