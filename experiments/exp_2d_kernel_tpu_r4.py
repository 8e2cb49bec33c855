"""Ghost-Y slab kernel through REAL Mosaic on one chip (round 4).

The 2-D (X, Y) path's ghost-Y kernel variant is parity-pinned in
interpret mode on the CPU mesh; Mosaic can reject constructs the
interpreter accepts, so this compiles + runs the actual kernel on the
TPU via a (1, 1) device mesh (ppermutes exchange nothing; ghost rows
read zero fill) and checks it elementwise against the single-chip
operator, then times it.

Usage: python experiments/exp_2d_kernel_tpu_r4.py [nx ny nz]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from civiwave_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.parallel.sharding import (
    make_device_mesh_2d,
    shard_structured,
)
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import cantilever_config

dims = (
    tuple(int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (96, 86, 86)
)
cfg = cantilever_config()
mats = [materials.make_properties(m) for m in cfg.materials]
model, force = build_structured_model(
    *dims, mats[0], cfg.materials[0].density, traction=(0.0, 0.0, -1.0e6),
)
print(f"dims={dims} dof={model.dof_count:,} device={jax.devices()[0]}",
      flush=True)

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((3,) + model.grid_shape), np.float32)
ss, mf = np.float32(1.0), np.float32(4.0e6)

ref = jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(model, x0)

mesh = make_device_mesh_2d(1, 1)
s_model, _, _ = shard_structured(
    model, model.zero_state(), force, mesh, axis_name_y="shard_y"
)
assert s_model.shard_axis_y == "shard_y"
t0 = time.perf_counter()
out = jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(s_model, x0)
err = float(jnp.abs(out - ref).max())
scale = float(jnp.abs(ref).max())
print(f"2-D ghost-Y kernel (real Mosaic): compile+first "
      f"{time.perf_counter()-t0:.1f}s, max err {err:.3e} "
      f"(scale {scale:.3e})", flush=True)
assert err <= 1e-5 * scale, "2-D kernel mismatch on hardware"

rescale = np.float32(1.0 / 2.0e11)
inner = 32


@jax.jit
def chain(m, x):
    def body(_, y):
        return m.apply_keff(y, ss, mf) * rescale

    return jax.lax.fori_loop(0, inner, body, x)


y = chain(s_model, x0)
chk = float(jnp.sum(jnp.abs(y[0, 5, 5, :64])))
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    y = chain(s_model, x0)
    chk = float(jnp.sum(jnp.abs(y[0, 5, 5, :64])))
    best = min(best, time.perf_counter() - t0)
print(f"2-D ghost-Y kernel: {best/inner*1e3:.3f} ms/matvec (chk {chk:.5e})",
      flush=True)
print("OK", flush=True)
