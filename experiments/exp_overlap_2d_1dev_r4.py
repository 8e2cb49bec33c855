"""2-D overlap split (ADR-28) on a 1x1 device mesh, real chip: regression
check.

The 2-D (X, Y) halo operator now reuses the interior/boundary kernel
split so the X plane-permutes overlap the interior sweep.  On one chip
the permutes are no-ops but the split's two extra kernel launches and
the Y-extended interior input are real — this measures on/off to pin
that the split is free at production tile shapes, mirroring
exp_overlap_1dev_r4.py for the 1-D path.

Usage: python experiments/exp_overlap_2d_1dev_r4.py [nx ny nz]
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
from civiwave_tpu.parallel.sharding import make_device_mesh_2d, shard_structured
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
mesh = make_device_mesh_2d(1, 1)
s_model, _, _ = shard_structured(
    model, model.zero_state(), force, mesh, axis_name_y="shard_y"
)
assert s_model.shard_axis_y is not None, "expected the 2-D halo path"
print(f"dims={dims} dof={model.dof_count:,} device={jax.devices()[0]}",
      flush=True)

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((3,) + model.grid_shape), np.float32)
ss, mf = np.float32(1.0), np.float32(4.0e6)
rescale = np.float32(1.0 / 2.0e11)
inner = 32

for flag in ("0", "1"):
    os.environ["CIVIWAVE_HALO_OVERLAP"] = flag

    @jax.jit
    def chain(m, x):
        def body(_, y):
            return m.apply_keff(y, ss, mf) * rescale

        return jax.lax.fori_loop(0, inner, body, x)

    t0 = time.perf_counter()
    y = chain(s_model, x0)
    chk = float(jnp.sum(jnp.abs(y[0, 5, 5, :64])))
    print(f"  2d overlap={flag}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        y = chain(s_model, x0)
        chk = float(jnp.sum(jnp.abs(y[0, 5, 5, :64])))
        best = min(best, time.perf_counter() - t0)
    print(
        f"  2d overlap={flag}: {best/inner*1e3:.3f} ms/matvec (chk {chk:.5e})",
        flush=True,
    )
