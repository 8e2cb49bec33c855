"""Banded-window gather path vs the unwindowed operator (ADR-20).

The windowed x-gather / assembly is a TPU gather-emitter optimization
(gated off on CPU); these tests force it on and pin exact agreement with
the unwindowed forms, plus the pack-time window invariants.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.ops import apply_keff as ops
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import box_mesh, cantilever_config


def _model(nx, ny, nz, hex_elements):
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    mesh = box_mesh(nx, ny, nz, hex_elements=hex_elements)
    pre = preprocess.run(mesh, cfg)
    model, state, force = pack.build_packed_model(mesh, pre, cfg, mats)
    return model


@pytest.mark.parametrize("hex_elements", [True, False])
def test_windows_planned_for_single_block_boxes(hex_elements):
    model = _model(12, 10, 9, hex_elements)
    windows = model.xw_hex if hex_elements else model.xw_tet
    assert windows, "x windows should plan for a banded box"
    assert model.aw, "assembly windows should plan for a single-block mesh"
    # windows cover every element exactly once, in order
    e_pad = model.padded_hex_count if hex_elements else model.padded_tet_count
    covered = 0
    for e0, ec, lo, size in windows:
        assert e0 == covered
        covered += ec
    assert covered == e_pad
    # every chunk's corner ids are inside its window
    conn = np.asarray(model.conn_hex if hex_elements else model.conn_tet)
    for e0, ec, lo, size in windows:
        chunk = conn[e0 : e0 + ec]
        assert chunk.min() >= lo and chunk.max() < lo + size
    # assembly chunks cover every node; csr indices sit in their windows
    rpe = 8 if hex_elements else 4
    csr = np.asarray(model.csr_idx)
    covered = 0
    for n0, ncnt, e_lo, e_cnt in model.aw:
        assert n0 == covered
        covered += ncnt
        rows = csr[n0 : n0 + ncnt]
        assert rows.min() >= e_lo * rpe
        assert rows.max() < (e_lo + e_cnt) * rpe
    assert covered == model.padded_node_count


@pytest.mark.parametrize("hex_elements", [True, False])
def test_windowed_matches_unwindowed(hex_elements, monkeypatch):
    model = _model(11, 9, 8, hex_elements)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(model.vector_shape).astype(np.float32))
    ss, mf = np.float32(1.3), np.float32(2.5e5)

    monkeypatch.setenv("CIVIWAVE_GATHER_WINDOWS", "0")
    ref = np.asarray(ops.apply_keff(model, x, ss, mf))
    monkeypatch.setenv("CIVIWAVE_GATHER_WINDOWS", "1")
    got = np.asarray(ops.apply_keff(model, x, ss, mf))

    scale = np.abs(ref).max()
    # same multiplies in the same order; only the assembly's slot-sum
    # association differs (windowed sums (nc,3) terms, unwindowed (N,3))
    np.testing.assert_allclose(got, ref, atol=1e-6 * scale, rtol=1e-6)


def test_mixed_meshes_plan_no_assembly_windows():
    """Replace the last hex cell of a box with its 6-tet split: a mixed
    tet+hex mesh must fall back to the unwindowed assembly (aw == ())."""
    from civiwave_tpu.mesh.model import SENTINEL
    from civiwave_tpu.utils.synthetic import _TET_CORNERS

    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    mesh = box_mesh(4, 4, 4, hex_elements=True)
    last_hex = mesh.elements[-1]
    tets = last_hex[_TET_CORNERS]  # (6, 4)
    tet_rows = np.full((6, 8), SENTINEL, dtype=np.int32)
    tet_rows[:, :4] = tets
    mesh.elements = np.concatenate([mesh.elements[:-1], tet_rows])
    mesh.element_node_counts = np.concatenate(
        [mesh.element_node_counts[:-1], np.full(6, 4, dtype=np.int32)]
    )
    mesh.element_physical_group = np.concatenate(
        [mesh.element_physical_group[:-1], np.full(6, 3, dtype=np.int64)]
    )
    mesh.element_original_ids = np.arange(
        1, len(mesh.elements) + 1, dtype=np.int64
    )
    pre = preprocess.run(mesh, cfg)
    model, _s, _f = pack.build_packed_model(mesh, pre, cfg, mats)
    assert model.padded_tet_count and model.padded_hex_count
    assert model.aw == ()  # mixed blocks: unwindowed assembly fallback
    # the operator still runs (fallback path) with windows forced on
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(model.vector_shape).astype(np.float32))
    out = np.asarray(ops.apply_keff(model, x, np.float32(1.0), np.float32(1.0)))
    assert np.isfinite(out).all()
