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
