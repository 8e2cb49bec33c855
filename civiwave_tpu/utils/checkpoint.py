"""Checkpoint / resume for long simulations (orbax-backed).

The reference has NO checkpointing — VTU frames are its only persisted
state and are not re-loadable (SURVEY.md section 5); the viewer keeps an
in-memory baseline snapshot at most (viewer.cpp:283-316).  This module is
the deliberate improvement called out in the build plan: the full kinematic
state (u, v, a, PCG warm-start), the adaptive dt, the frame index, and the
simulation clock round-trip through orbax — including sharded arrays on a
device mesh, written asynchronously without stalling the step loop.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..mesh.pack import SimState


class CheckpointManager:
    """Thin orbax wrapper storing SimState + stepper scalars per frame."""

    def __init__(self, directory: str, max_to_keep: int = 3) -> None:
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        )
        self._manager = ocp.CheckpointManager(self.directory, options=options)

    def save(
        self,
        frame_index: int,
        state: SimState,
        current_dt: float,
        accumulated_time: float,
        wait: bool = False,
    ) -> None:
        payload = {
            "displacement": state.displacement,
            "velocity": state.velocity,
            "acceleration": state.acceleration,
            "warm_x": state.warm_x,
            "scalars": {
                "current_dt": np.float64(current_dt),
                "accumulated_time": np.float64(accumulated_time),
                "frame_index": np.int64(frame_index),
            },
        }
        self._manager.save(frame_index, args=ocp.args.StandardSave(payload))
        if wait:
            self._manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def restore(self, frame_index: Optional[int] = None):
        """Returns (SimState, current_dt, accumulated_time, frame_index)."""
        step = frame_index if frame_index is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self.directory}"
            )
        payload = self._manager.restore(step)
        state = SimState(
            displacement=jax.numpy.asarray(payload["displacement"]),
            velocity=jax.numpy.asarray(payload["velocity"]),
            acceleration=jax.numpy.asarray(payload["acceleration"]),
            warm_x=jax.numpy.asarray(payload["warm_x"]),
        )
        scalars = payload["scalars"]
        return (
            state,
            float(scalars["current_dt"]),
            float(scalars["accumulated_time"]),
            int(scalars["frame_index"]),
        )

    def close(self) -> None:
        self._manager.wait_until_finished()
        self._manager.close()
