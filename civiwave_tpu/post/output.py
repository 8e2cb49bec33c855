"""Per-frame output orchestration.

Rebuild of /root/reference/src/post/output_manager.cpp:35-87: every frame
computes derived fields, writes ``vtu/frame_{:05d}.vtu`` when
``frame % vtu_stride == 0``, and appends probe rows to
``probes/probes.csv``.

Two managers share the layout: :class:`OutputManager` (general gather
path, host derived fields) and :class:`StructuredOutputManager` (device
derived fields + O(1) probe sampling — the output path that scales to the
50M-DOF streamed-VTU demo).  VTU frames are written on a background thread
(bounded queue) so disk IO overlaps the next solve steps — the reference
wrote synchronously and only ever faced 150k DOF (vtu_writer.cpp:171-291).
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np

from ..config.schema import OutputSettings
from ..mesh.model import Mesh
from ..mesh.preprocess import PreprocessOutputs
from .derived import DerivedFieldSet, compute_derived_fields
from .probes import ProbeLogger
from .vtu import write_vtu


class AsyncWriter:
    """Background frame writer: a bounded queue + one worker thread, so a
    VTU dump overlaps the following solve steps instead of stalling them.
    Exceptions surface on the next submit/flush."""

    def __init__(self, max_pending: int = 2) -> None:
        self._queue: queue.Queue = queue.Queue(maxsize=max_pending)
        self._error = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                self._queue.task_done()
                return
            fn, args = item
            try:
                fn(*args)
            except BaseException as exc:  # surfaced on submit/flush
                self._error = exc
            finally:
                self._queue.task_done()

    def _raise_pending(self) -> None:
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def submit(self, fn, *args) -> None:
        self._raise_pending()
        self._queue.put((fn, args))

    def flush(self) -> None:
        self._queue.join()
        self._raise_pending()

    def close(self) -> None:
        self.flush()
        self._queue.put(None)
        self._queue.join()


class OutputManager:
    """Owns the output directory layout (output_manager.hpp:41)."""

    def __init__(
        self,
        output_root: str,
        settings: OutputSettings,
        mesh: Mesh,
        preprocess: PreprocessOutputs,
        stiffness_6x6: np.ndarray,
        async_vtu: bool = True,
    ) -> None:
        self.output_root = output_root
        self.settings = settings
        self.mesh = mesh
        self.preprocess = preprocess
        self.stiffness_6x6 = np.asarray(stiffness_6x6)
        self.probe_logger = ProbeLogger(
            os.path.join(output_root, "probes", "probes.csv"), settings.probes
        )
        self._writer = AsyncWriter() if async_vtu else None

    def handle_from_stepper(
        self, simulation_time: float, frame_index: int, stepper
    ) -> None:
        """Pull the nodal views from the stepper and run the frame."""
        self.handle_frame(
            simulation_time,
            frame_index,
            stepper.displacement(),
            stepper.velocity(),
            stepper.acceleration(),
        )

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def handle_frame(
        self,
        simulation_time: float,
        frame_index: int,
        displacement: np.ndarray,
        velocity: np.ndarray,
        acceleration: np.ndarray,
    ) -> DerivedFieldSet:
        """Derived fields -> VTU (strided) -> probe CSV
        (output_manager.cpp:71-87)."""
        derived = compute_derived_fields(
            self.preprocess,
            self.stiffness_6x6,
            displacement,
            self.mesh.node_count,
            self.mesh.element_count,
        )
        if frame_index % max(self.settings.vtu_stride, 1) == 0:
            path = os.path.join(
                self.output_root, "vtu", f"frame_{frame_index:05d}.vtu"
            )
            args = (
                path, self.mesh, displacement, velocity, acceleration,
                derived, simulation_time, frame_index,
            )
            if self._writer is not None:
                self._writer.submit(write_vtu, *args)
            else:
                write_vtu(*args)
        self.probe_logger.log_frame(
            simulation_time,
            frame_index,
            displacement,
            velocity,
            acceleration,
            derived,
        )
        return derived


class StructuredOutputManager:
    """Output path for the structured fast path: derived fields jitted on
    device (post/structured_fields.py), probe rows sampled O(1) per frame,
    full-field transfers only on VTU frames, VTU written asynchronously.
    """

    def __init__(
        self,
        output_root: str,
        settings: OutputSettings,
        model,
        async_vtu: bool = True,
    ) -> None:
        self.output_root = output_root
        self.settings = settings
        self.model = model
        self.probe_logger = ProbeLogger(
            os.path.join(output_root, "probes", "probes.csv"), settings.probes
        )
        self._writer = AsyncWriter() if async_vtu else None

    def handle_from_stepper(
        self, simulation_time: float, frame_index: int, stepper
    ) -> None:
        from .structured_fields import (
            compute_structured_derived,
            derived_to_host,
            probe_derived_host,
            probe_samples,
        )
        from .vtu import write_vtu_structured

        model = self.model
        state = stepper.state
        if frame_index % max(self.settings.vtu_stride, 1) == 0:
            device_fields = compute_structured_derived(
                model, state.displacement
            )
            derived = derived_to_host(model, device_fields)
            u = np.asarray(model.to_nodal(state.displacement))
            v = np.asarray(model.to_nodal(state.velocity))
            a = np.asarray(model.to_nodal(state.acceleration))
            x0 = np.asarray(model.position0[: model.node_count], np.float32)
            path = os.path.join(
                self.output_root, "vtu", f"frame_{frame_index:05d}.vtu"
            )
            # implicit-connectivity writer: no cell-topology arrays on host
            args = (
                path, model.nx, model.ny, model.nz, x0 + u, u, v, a,
                derived, simulation_time, frame_index,
            )
            if self._writer is not None:
                self._writer.submit(write_vtu_structured, *args)
            else:
                write_vtu_structured(*args)
        if self.settings.probes:
            probes = tuple(int(p) for p in self.settings.probes)
            kin, windows = probe_samples(model, state, probes)
            derived_rows = probe_derived_host(model, probes, windows)
            self.probe_logger.log_sampled(
                simulation_time,
                frame_index,
                model.node_count,
                np.asarray(kin),
                derived_rows,
            )

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()
