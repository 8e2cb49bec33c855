"""Validate the 2-D (X, Y) sharded structured operator against single-chip.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python experiments/validate_2d.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import dataclasses

import jax

# sitecustomize imports jax before this script runs, so env vars alone are
# too late — force the CPU backend through the config (as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import jax.numpy as jnp
import numpy as np

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.parallel.sharding import (
    make_device_mesh_2d,
    shard_structured,
)
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import cantilever_config

cfg = cantilever_config()
mats = [materials.make_properties(m) for m in cfg.materials]

for dims, (npx, npy) in [
    ((6, 5, 4), (4, 2)),
    ((9, 4, 5), (2, 4)),
    ((7, 7, 3), (2, 2)),
]:
    # single-chip reference WITHOUT padding
    ref_model, _ = build_structured_model(
        *dims, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    model, force = build_structured_model(
        *dims, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
        pad_x_multiple=npx, pad_y_multiple=npy,
    )
    rng = np.random.default_rng(11)
    x_ref = jnp.asarray(
        rng.standard_normal((3,) + ref_model.grid_shape), jnp.float32
    )
    # embed into the padded grid (dead rows/planes zero)
    gx, gy, gz = model.grid_shape
    x_pad = jnp.zeros((3, gx, gy, gz), jnp.float32)
    x_pad = x_pad.at[:, : x_ref.shape[1], : x_ref.shape[2]].set(x_ref)

    ss, mf = jnp.float32(1.01), jnp.float32(3.7)
    ref = jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(ref_model, x_ref)

    # padded single-chip (sanity of pad_rows wiring alone)
    pad1 = jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(model, x_pad)
    np.testing.assert_allclose(
        np.asarray(pad1)[:, : x_ref.shape[1], : x_ref.shape[2]],
        np.asarray(ref), atol=1e-5 * float(jnp.abs(ref).max()),
    )
    print(f"dims={dims} pad single-chip OK (pad_rows={model.pad_rows})")

    mesh = make_device_mesh_2d(npx, npy)
    s_model, _, _ = shard_structured(
        model, model.zero_state(), force, mesh, axis_name_y="shard_y"
    )
    s_model = dataclasses.replace(s_model, pallas_interpret=True)
    xs = jax.device_put(
        x_pad,
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "shard", "shard_y")
        ),
    )
    out = jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(s_model, xs)
    assert s_model.shard_axis_y is not None
    scale = float(jnp.abs(ref).max()) + 1e-30
    err = float(
        jnp.abs(
            out[:, : x_ref.shape[1], : x_ref.shape[2]] - ref
        ).max()
    )
    print(f"dims={dims} mesh=({npx},{npy}) kernel max err = {err:.3e} "
          f"(scale {scale:.3e})")
    np.testing.assert_allclose(
        np.asarray(out)[:, : x_ref.shape[1], : x_ref.shape[2]],
        np.asarray(ref), atol=1e-5 * scale,
    )
    print("  -> 2-D sharded parity OK")
print("ALL OK")
