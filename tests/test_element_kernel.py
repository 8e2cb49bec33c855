"""Pallas element-force kernel vs the XLA scalar-component form.

The general path's force phase has two implementations of the same math
(ops/apply_keff.py streams vs ops/pallas/element_forces.py kernel); the
TPU default routes aligned blocks onto the kernel.  These tests pin the
kernel's logic on CPU through the Pallas interpreter.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.ops import apply_keff as ops
from civiwave_tpu.ops.pallas.element_forces import BLOCK_ELEMS
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import box_mesh, cantilever_config


@pytest.fixture(scope="module")
def hex_model():
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    mesh = box_mesh(16, 16, 16, hex_elements=True)  # exactly BLOCK_ELEMS hexes
    pre = preprocess.run(mesh, cfg)
    model, _state, _force = pack.build_packed_model(mesh, pre, cfg, mats)
    return model


def test_block_alignment(hex_model):
    assert hex_model.padded_hex_count == BLOCK_ELEMS


@pytest.mark.slow
def test_hex_kernel_matches_stream_math(hex_model, monkeypatch):
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.standard_normal(hex_model.vector_shape).astype(np.float32)
    )
    xs = ops.sanitize(hex_model, x)
    ss = np.float32(1.0)

    monkeypatch.setenv("CIVIWAVE_ELEMENT_KERNEL", "xla")
    ref = np.asarray(ops.hex_forces(hex_model, xs, ss))

    monkeypatch.setenv("CIVIWAVE_ELEMENT_KERNEL", "interpret")
    got = np.asarray(ops.hex_forces(hex_model, xs, ss))

    scale = np.abs(ref).max()
    assert np.allclose(got, ref, atol=1e-5 * scale, rtol=1e-5)


def test_tet_kernel_matches_stream_math(monkeypatch):
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    mesh = box_mesh(9, 9, 9, hex_elements=False)  # 6*729 = 4374 tets -> pads to 2*BLOCK
    pre = preprocess.run(mesh, cfg)
    model, _state, _force = pack.build_packed_model(mesh, pre, cfg, mats)
    assert model.padded_tet_count % BLOCK_ELEMS == 0
    assert model.padded_tet_count >= BLOCK_ELEMS

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(model.vector_shape).astype(np.float32))
    xs = ops.sanitize(model, x)
    ss = np.float32(1.0)

    monkeypatch.setenv("CIVIWAVE_ELEMENT_KERNEL", "xla")
    ref = np.asarray(ops.tet_forces(model, xs, ss))

    monkeypatch.setenv("CIVIWAVE_ELEMENT_KERNEL", "interpret")
    got = np.asarray(ops.tet_forces(model, xs, ss))

    scale = np.abs(ref).max()
    assert np.allclose(got, ref, atol=1e-5 * scale, rtol=1e-5)


def test_unaligned_blocks_fall_back_to_xla(monkeypatch):
    """Small / unaligned element blocks must keep working on every
    backend choice (the kernel gate falls back to the stream math)."""
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    mesh = box_mesh(3, 3, 3, hex_elements=True)
    pre = preprocess.run(mesh, cfg)
    model, _state, _force = pack.build_packed_model(mesh, pre, cfg, mats)
    assert model.padded_hex_count < BLOCK_ELEMS

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(model.vector_shape).astype(np.float32))
    monkeypatch.setenv("CIVIWAVE_ELEMENT_KERNEL", "interpret")
    out = np.asarray(
        ops.apply_keff(model, x, np.float32(1.0), np.float32(1.0))
    )
    assert np.isfinite(out).all()
