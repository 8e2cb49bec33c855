"""Compile the real streaming fused kernel at a small grid ON TPU (bypass
the size gate by calling apply_keff_fused_pallas directly)."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.ops import structured as ops_mod
from civiwave_tpu.ops.pallas import structured_stencil as psten
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import cantilever_config

n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
cfg = cantilever_config()
mats = [materials.make_properties(m) for m in cfg.materials]
model, _ = build_structured_model(
    n, n, n, mats[0], cfg.materials[0].density, traction=(0.0, 0.0, -1.0e6)
)
x = jnp.asarray(
    np.random.default_rng(1).standard_normal(model.vector_shape), jnp.float32
)
ss, mf = np.float32(1.3), np.float32(2.5e5)
tables = ops_mod._stencil_tables(model.spacing, model.lam0, model.mu0)
out = jax.jit(
    lambda m, v: psten.apply_keff_fused_pallas(m, v, ss, mf, tables)
)(model, x)
ref = np.asarray(
    jax.jit(lambda m, v: m.apply_keff(v, ss, mf))(model, x)
)
err = np.abs(np.asarray(out) - ref).max() / (np.abs(ref).max() + 1e-30)
print("rel err", err)
assert err < 1e-5, err
print("OK")
