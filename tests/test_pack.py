"""Pack + shard planning: happy path, metadata sizing, fp32 clamping, and
error paths — the analogue of the reference's "EXHAUSTIVE(ish)"
pack_shard_upload_test.cpp (its upload planner has no TPU counterpart:
``jax.device_put`` with shardings replaces staging-ring scheduling).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.mesh.pack import clamp_to_f32
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.errors import PackError, ShardError
from civiwave_tpu.utils.synthetic import box_mesh, cantilever_config


@pytest.fixture(scope="module")
def packed():
    cfg = cantilever_config()
    mesh = box_mesh(2, 2, 2, hex_elements=True)
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    return pack.build_packed_model(mesh, pre, cfg, mats, pad_nodes=16, pad_elems=16)


def test_padded_sizing_and_noop_padding(packed):
    model, state, force = packed
    assert model.node_count == 27 and model.padded_node_count == 32
    assert model.hex_count == 8 and model.padded_hex_count == 16
    # padded nodes are fully constrained, massless no-ops (pack.cpp padding
    # semantics re-expressed for TPU tiling)
    bc = np.asarray(model.bc_mask)
    assert bc[model.node_count :].all()
    assert (np.asarray(model.lumped_mass)[model.node_count :] == 0).all()
    # padded hex rows repeat the last real element's conn (keeps gather
    # windows tight, ADR-20) with zero volume => zero force contribution
    conn = np.asarray(model.conn_hex)
    assert (conn[model.hex_count :] == conn[model.hex_count - 1]).all()
    assert (conn[model.hex_count :] < model.node_count).all()
    vol = np.asarray(model.vol_hex).T  # (H*, 8gp) element-major view
    assert (vol[model.hex_count :] == 0).all()
    # real rows: gp volumes sum to the cell volume (unit box cells)
    np.testing.assert_allclose(
        vol[: model.hex_count].sum(axis=1), 1.0, rtol=1e-5
    )


def test_csr_weights_cover_exactly_real_incidences(packed):
    model, *_ = packed
    w = np.asarray(model.csr_weight).reshape(
        model.padded_node_count, model.csr_degree
    )
    # every real corner incidence appears exactly once: 8 hexes x 8 corners
    assert w.sum() == model.hex_count * 8
    # padded nodes have no incidences
    assert (w[model.node_count :] == 0).all()


def test_fp32_clamping_semantics():
    """pack.cpp:41-57 — overflow clamps to +/-FLT_MAX; inf/nan verbatim."""
    big = np.float64(1.0e200)
    out = clamp_to_f32(np.array([big, -big, np.inf, -np.inf, np.nan, 1.5]))
    fmax = np.float32(np.finfo(np.float32).max)
    assert out[0] == fmax and out[1] == -fmax
    assert np.isposinf(out[2]) and np.isneginf(out[3]) and np.isnan(out[4])
    assert out[5] == np.float32(1.5)


def test_pack_rejects_bad_padding():
    cfg = cantilever_config()
    mesh = box_mesh(1, 1, 1, hex_elements=True)
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    with pytest.raises(PackError, match="padding multiples"):
        pack.build_packed_model(mesh, pre, cfg, mats, pad_nodes=0)


def test_pack_rejects_mismatched_preprocess():
    cfg = cantilever_config()
    mesh = box_mesh(1, 1, 1, hex_elements=True)
    pre = preprocess.run(mesh, cfg)
    mats = [materials.make_properties(m) for m in cfg.materials]
    bad = dataclasses.replace(pre, lumped_mass=pre.lumped_mass[:-1])
    with pytest.raises(PackError, match="lumped mass"):
        pack.build_packed_model(mesh, bad, cfg, mats)


def test_shard_rejects_indivisible_counts(packed):
    import jax

    from civiwave_tpu.parallel.sharding import make_device_mesh, shard_simulation

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model, state, force = packed  # padded to 16/32 — not divisible by 8*?
    mesh8 = make_device_mesh(8)
    bad = dataclasses.replace(model, padded_node_count=30)
    with pytest.raises(ShardError, match="divide the device-mesh"):
        shard_simulation(bad, state, force, mesh8)


def test_shard_structured_rejects_bad_x_extent():
    import jax

    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.parallel.sharding import make_device_mesh, shard_structured

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, force = build_structured_model(
        4, 2, 2, mats[0], cfg.materials[0].density
    )  # X = 5, not divisible by 8
    with pytest.raises(ShardError, match="X extent"):
        shard_structured(model, model.zero_state(), force, make_device_mesh(8))


def test_mesh_requests_beyond_devices_fail():
    from civiwave_tpu.parallel.sharding import make_device_mesh

    with pytest.raises(ShardError, match="more devices"):
        make_device_mesh(10_000)


def test_hex_tables_match_host_preprocess(packed):
    """The packed per-gp gradient/volume tables are the host preprocess
    values, f32-clamped, stored GP-MAJOR TRANSPOSED — (8gp, 8l, 3, H*) /
    (8gp, H*) — so the scalar-component operator reads contiguous (H*,)
    component streams."""
    model, *_ = packed
    cfg = cantilever_config()
    mesh = box_mesh(2, 2, 2, hex_elements=True)
    pre = preprocess.run(mesh, cfg)
    h = model.hex_count
    np.testing.assert_array_equal(
        np.asarray(model.grads_hex)[:, :, :, :h],
        clamp_to_f32(
            pre.quad_gradients.reshape(h, 8, 8, 3)
        ).transpose(1, 2, 3, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(model.vol_hex)[:, :h],
        clamp_to_f32(pre.quad_volume.reshape(h, 8)).T,
    )
