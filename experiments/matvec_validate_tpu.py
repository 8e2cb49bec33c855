"""Elementwise-validate the fused Pallas matvec against the XLA path ON
THE TPU (interpret-mode parity on CPU does not rule out a Mosaic
miscompile — an optimization_barrier variant once miscompiled silently).

Usage: python experiments/matvec_validate_tpu.py [nx]
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import cantilever_config


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, _ = build_structured_model(
        n, n, n, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    print(f"dof={model.dof_count:,}", file=sys.stderr, flush=True)
    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal(model.vector_shape),
        jnp.float32,
    )
    ss, mf = np.float32(1.3), np.float32(2.5e5)

    @jax.jit
    def mv(m, x):
        return m.apply_keff(x, ss, mf)

    out_kernel = np.asarray(mv(model, x0))
    model_xla = dataclasses.replace(model, use_pallas=False)
    out_xla = np.asarray(mv(model_xla, x0))
    scale = np.abs(out_xla).max() + 1e-30
    err = np.abs(out_kernel - out_xla).max() / scale
    print(f"max rel err kernel vs XLA: {err:.3e}")
    assert err < 1e-5, err
    print("OK")


if __name__ == "__main__":
    main()
