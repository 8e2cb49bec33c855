"""Binary VTU (UnstructuredGrid) writer.

Byte-format rebuild of /root/reference/src/post/vtu_writer.cpp:171-297:
appended raw encoding with UInt32 block headers, little-endian, PointData
(displacement/velocity/acceleration 3-comp, nodal strain/stress 6-comp
Voigt, von Mises scalar), CellData (element strain/stress/von Mises),
deformed points = x0 + u, VTK cell types 10 (tet4) / 12 (hex8), FieldData
time + frame.  Output opens in ParaView interchangeably with reference
output.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from ..mesh.model import Mesh, SENTINEL
from ..utils.errors import VtuError
from .derived import DerivedFieldSet

_VTK_TETRA = 10
_VTK_HEX = 12


def _blocks_and_offsets(arrays: List[np.ndarray]) -> tuple:
    """Appended-data blob: each block is u32 byte-count + raw bytes
    (vtu_writer.cpp:138-152)."""
    blob = bytearray()
    offsets = []
    for arr in arrays:
        raw = np.ascontiguousarray(arr).tobytes()
        offsets.append(len(blob))
        blob += np.uint32(len(raw)).tobytes()
        blob += raw
    return bytes(blob), offsets


def _cells_arrays(mesh: Mesh):
    """Vectorized connectivity/offsets/types (the per-element Python loop
    took seconds per frame at 300k+ elements)."""
    counts = mesh.element_node_counts.astype(np.int32)
    if counts.size == 0:
        return (
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
            np.zeros(0, np.uint8),
        )
    valid = np.arange(mesh.elements.shape[1])[None, :] < counts[:, None]
    connectivity = mesh.elements[valid].astype(np.int32)  # row-major ragged
    cell_offsets = np.cumsum(counts, dtype=np.int32)
    cell_types = np.where(counts == 4, _VTK_TETRA, _VTK_HEX).astype(np.uint8)
    return connectivity, cell_offsets, cell_types


def write_vtu(
    path: str,
    mesh: Mesh,
    displacement: np.ndarray,  # (N, 3) f32
    velocity: np.ndarray,
    acceleration: np.ndarray,
    derived: DerivedFieldSet,
    simulation_time: float,
    frame_index: int,
) -> None:
    """Write one frame (vtu_writer.cpp:171-291).

    Dispatches to the native C++ writer (native/vtu_fast.cpp) when the
    toolchain is available; the pure-Python path below is byte-identical.
    """
    try:
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)

        n = mesh.node_count
        points = (mesh.node_positions.astype(np.float32) + displacement[:n]).astype(
            np.float32
        )

        connectivity, cell_offsets, cell_types = _cells_arrays(mesh)

        point_arrays = [
            ("displacement", 3, displacement[:n].astype(np.float32)),
            ("velocity", 3, velocity[:n].astype(np.float32)),
            ("acceleration", 3, acceleration[:n].astype(np.float32)),
            ("strain_node", 6, derived.node_strain.astype(np.float32)),
            ("stress_node", 6, derived.node_stress.astype(np.float32)),
            ("von_mises_node", 1, derived.node_von_mises.astype(np.float32)),
        ]
        cell_arrays = [
            ("strain_elem", 6, derived.element_strain.astype(np.float32)),
            ("stress_elem", 6, derived.element_stress.astype(np.float32)),
            ("von_mises_elem", 1, derived.element_von_mises.astype(np.float32)),
        ]

        from . import native_vtu

        if native_vtu.available():
            status = native_vtu.write_vtu_native(
                path,
                points,
                connectivity,
                cell_offsets,
                cell_types,
                point_arrays,
                cell_arrays,
                simulation_time,
                frame_index,
            )
            if status != 0:
                raise VtuError(
                    f"native VTU writer failed (status {status})", [str(path)]
                )
            return

        blob, offs = _blocks_and_offsets(
            [a for _, _, a in point_arrays]
            + [a for _, _, a in cell_arrays]
            + [points, connectivity, cell_offsets, cell_types]
        )
        point_offs = offs[: len(point_arrays)]
        cell_offs = offs[len(point_arrays) : len(point_arrays) + len(cell_arrays)]
        points_off, conn_off, offsets_off, types_off = offs[-4:]

        with open(path, "wb") as f:

            def w(text: str) -> None:
                f.write(text.encode("ascii"))

            w('<?xml version="1.0"?>\n')
            w(
                '<VTKFile type="UnstructuredGrid" version="1.0" '
                'byte_order="LittleEndian" header_type="UInt32">\n'
            )
            w("  <UnstructuredGrid>\n")
            w("    <FieldData>\n")
            w(
                f'      <DataArray type="Float64" Name="time" NumberOfTuples="1">'
                f"{simulation_time:.17g}</DataArray>\n"
            )
            w(
                f'      <DataArray type="UInt32" Name="frame" NumberOfTuples="1">'
                f"{frame_index}</DataArray>\n"
            )
            w("    </FieldData>\n")
            w(
                f'    <Piece NumberOfPoints="{n}" '
                f'NumberOfCells="{mesh.element_count}">\n'
            )

            w('      <PointData Scalars="von_mises_node">\n')
            for (name, comps, _), off in zip(point_arrays, point_offs):
                w(
                    f'        <DataArray type="Float32" Name="{name}" '
                    f'NumberOfComponents="{comps}" format="appended" '
                    f'offset="{off}"/>\n'
                )
            w("      </PointData>\n")

            w('      <CellData Scalars="von_mises_elem">\n')
            for (name, comps, _), off in zip(cell_arrays, cell_offs):
                w(
                    f'        <DataArray type="Float32" Name="{name}" '
                    f'NumberOfComponents="{comps}" format="appended" '
                    f'offset="{off}"/>\n'
                )
            w("      </CellData>\n")

            w("      <Points>\n")
            w(
                f'        <DataArray type="Float32" NumberOfComponents="3" '
                f'format="appended" offset="{points_off}"/>\n'
            )
            w("      </Points>\n")

            w("      <Cells>\n")
            w(
                f'        <DataArray type="Int32" Name="connectivity" '
                f'format="appended" offset="{conn_off}"/>\n'
            )
            w(
                f'        <DataArray type="Int32" Name="offsets" '
                f'format="appended" offset="{offsets_off}"/>\n'
            )
            w(
                f'        <DataArray type="UInt8" Name="types" '
                f'format="appended" offset="{types_off}"/>\n'
            )
            w("      </Cells>\n")

            w("    </Piece>\n")
            w("  </UnstructuredGrid>\n")
            w('  <AppendedData encoding="raw">\n')
            w("_")
            f.write(blob)
            w("\n  </AppendedData>\n")
            w("</VTKFile>\n")
    except OSError as exc:
        raise VtuError(str(exc), [str(path)]) from None
