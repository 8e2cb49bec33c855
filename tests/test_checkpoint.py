"""Checkpoint/resume round-trip — capability the reference lacks."""

import numpy as np
import pytest

from civiwave_tpu.utils.checkpoint import CheckpointManager
from support import bar_config, bar_mesh
from test_stepper import _build_stepper


def test_checkpoint_roundtrip(tmp_path):
    mesh = bar_mesh(2, 1, 1)
    cfg = bar_config()
    stepper, *_ = _build_stepper(mesh, cfg)
    for frame in range(3):
        stepper.step(frame * stepper.current_dt)

    manager = CheckpointManager(str(tmp_path / "ckpt"))
    stepper.save_checkpoint(manager, wait=True)
    u_saved = stepper.displacement().copy()
    dt_saved = stepper.current_dt
    t_saved = stepper.accumulated_time

    # continue stepping, then roll back
    stepper.step(stepper.accumulated_time)
    assert not np.allclose(stepper.displacement(), u_saved)

    frame = stepper.restore_checkpoint(manager)
    assert frame == 3
    np.testing.assert_array_equal(stepper.displacement(), u_saved)
    assert stepper.current_dt == pytest.approx(dt_saved)
    assert stepper.accumulated_time == pytest.approx(t_saved)

    # resumed trajectory matches an uninterrupted one
    stepper.step(stepper.accumulated_time)
    resumed_u = stepper.displacement().copy()

    fresh, *_ = _build_stepper(mesh, cfg)
    for frame in range(4):
        fresh.step(frame * fresh.current_dt)
    np.testing.assert_allclose(resumed_u, fresh.displacement(), rtol=1e-6, atol=1e-12)
    manager.close()


def test_restore_without_checkpoint_raises(tmp_path):
    manager = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        manager.restore()


@pytest.mark.slow
def test_checkpoint_sharded_2d_roundtrip(tmp_path):
    """Sharded arrays round-trip through orbax: a 2-D (X, Y)-sharded
    structured SimState saves from device-mesh shards, restores on host,
    reshards, and resumes the exact trajectory."""
    import dataclasses
    from functools import partial

    import jax

    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.parallel.sharding import (
        make_device_mesh_2d,
        shard_structured,
    )
    from civiwave_tpu.physics import materials
    from civiwave_tpu.solver.stepper import newmark_step
    from civiwave_tpu.utils.synthetic import cantilever_config

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    model, force = build_structured_model(
        7, 5, 4, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6), pad_x_multiple=4, pad_y_multiple=2,
    )
    mesh = make_device_mesh_2d(4, 2)
    s_model, s_state, s_force = shard_structured(
        model, model.zero_state(), force, mesh, axis_name_y="shard_y"
    )
    s_model = dataclasses.replace(s_model, pallas_interpret=True)
    step = jax.jit(
        partial(
            newmark_step, rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta
        )
    )

    st = s_state
    for _ in range(2):
        st = step(s_model, st, s_force, 1e-3, 1e-6, 200).state
    assert len(st.displacement.sharding.device_set) == 8

    manager = CheckpointManager(str(tmp_path / "ckpt2d"))
    manager.save(2, st, 1e-3, 2e-3, wait=True)
    restored, dt, t, frame = manager.restore()
    assert (dt, t, frame) == (1e-3, 2e-3, 2)
    np.testing.assert_array_equal(
        np.asarray(restored.displacement), np.asarray(st.displacement)
    )

    # reshard the restored state and resume; equals the uninterrupted run
    resharded = jax.tree.map(
        lambda a, ref: jax.device_put(a, ref.sharding), restored, st
    )
    resumed = step(s_model, resharded, s_force, 1e-3, 1e-6, 200).state
    uninterrupted = step(s_model, st, s_force, 1e-3, 1e-6, 200).state
    np.testing.assert_array_equal(
        np.asarray(resumed.displacement),
        np.asarray(uninterrupted.displacement),
    )
    manager.close()
