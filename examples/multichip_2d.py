"""2-D (X, Y) multi-chip decomposition — runnable demo.

Runs the structured Newmark solver sharded over a 2-D device mesh.  On a
real pod this uses the chips it finds (hybrid DCN-aware layout across
slices); on a laptop/CI it runs on virtual CPU devices so the complete
multi-chip code path (shard_map, ppermute ghost rows/planes, psum
reductions) executes without TPU hardware.

    python examples/multichip_2d.py            # 4x2 virtual CPU mesh
    python examples/multichip_2d.py 2 2        # npx npy

See ADR-26 (docs/decisions.md) for the halo protocol, and
tests/test_sharding.py for the parity + collective-budget pins.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

npx = int(sys.argv[1]) if len(sys.argv) > 1 else 4
npy = int(sys.argv[2]) if len(sys.argv) > 2 else 2

if len(jax.devices()) < npx * npy:
    # virtual CPU devices — jax is typically already initialized (a
    # sitecustomize may import it at interpreter start), so clear the
    # backends before switching platforms (as __graft_entry__ does)
    from jax._src import xla_bridge

    xla_bridge._clear_backends()
    xla_bridge.get_backend.cache_clear()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", npx * npy)

import dataclasses

import jax.numpy as jnp

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.parallel.sharding import (
    make_device_mesh_2d,
    shard_structured,
)
from civiwave_tpu.physics import materials
from civiwave_tpu.solver.stepper import newmark_step
from civiwave_tpu.utils.synthetic import cantilever_config

cfg = cantilever_config()
mats = [materials.make_properties(m) for m in cfg.materials]
ray = materials.compute_rayleigh(cfg.damping)

# a hex cantilever; pad_x/pad_y make the grid divide the device mesh
model, force = build_structured_model(
    15, 7, 6, mats[0], cfg.materials[0].density,
    traction=(0.0, 0.0, -1.0e6),
    pad_x_multiple=npx, pad_y_multiple=npy,
)
mesh = make_device_mesh_2d(npx, npy)
s_model, s_state, s_force = shard_structured(
    model, model.zero_state(), force, mesh, axis_name_y="shard_y"
)
if jax.default_backend() != "tpu":
    # the ghost-Y slab kernel needs Mosaic; CPU runs it via the interpreter
    s_model = dataclasses.replace(s_model, pallas_interpret=True)

print(
    f"{model.dof_count:,} DOF over a {npx}x{npy} "
    f"{jax.default_backend()} mesh "
    f"(pad_planes={model.pad_planes}, pad_rows={model.pad_rows})"
)

step = jax.jit(
    partial(newmark_step, rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta)
)
state = s_state
for frame in range(5):
    t0 = time.perf_counter()
    out = step(s_model, state, s_force, 1.0e-3, 2.0e-4, 120)
    state = out.state
    tip = float(jnp.abs(state.displacement).max())
    print(
        f"frame {frame}: {int(out.pcg.iterations)} PCG iters, "
        f"converged={bool(out.pcg.converged)}, |u|max={tip:.3e} m, "
        f"{time.perf_counter()-t0:.2f}s"
    )
assert len(state.displacement.sharding.device_set) == npx * npy
print("2-D sharded run OK")
