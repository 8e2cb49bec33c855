"""Per-frame output orchestration.

Rebuild of /root/reference/src/post/output_manager.cpp:35-87: every frame
computes derived fields, writes ``vtu/frame_{:05d}.vtu`` when
``frame % vtu_stride == 0``, and appends probe rows to
``probes/probes.csv``.
"""

from __future__ import annotations

import os

import numpy as np

from ..config.schema import OutputSettings
from ..mesh.model import Mesh
from ..mesh.preprocess import PreprocessOutputs
from .derived import DerivedFieldSet, compute_derived_fields
from .probes import ProbeLogger
from .vtu import write_vtu


class OutputManager:
    """Owns the output directory layout (output_manager.hpp:41)."""

    def __init__(
        self,
        output_root: str,
        settings: OutputSettings,
        mesh: Mesh,
        preprocess: PreprocessOutputs,
        stiffness_6x6: np.ndarray,
    ) -> None:
        self.output_root = output_root
        self.settings = settings
        self.mesh = mesh
        self.preprocess = preprocess
        self.stiffness_6x6 = np.asarray(stiffness_6x6)
        self.probe_logger = ProbeLogger(
            os.path.join(output_root, "probes", "probes.csv"), settings.probes
        )

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
            write_vtu(
                path,
                self.mesh,
                displacement,
                velocity,
                acceleration,
                derived,
                simulation_time,
                frame_index,
            )
        self.probe_logger.log_frame(
            simulation_time,
            frame_index,
            displacement,
            velocity,
            acceleration,
            derived,
        )
        return derived
