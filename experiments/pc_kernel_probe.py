"""Bisect the pc-apply kernel cost at scale: copy floor vs mask vs apply.

Variants over the same (3, X, Y, Z) stream with B-plane slabs:
  copy      out = r                          (floor: r read + out write)
  mask      out = where(free != 0, r, 0)     (+ int8 bc stream + cast)
  apply     full class-scalar apply          (the real kernel)
  applynb   apply without the bc stream      (mask folded out)

Usage: python experiments/pc_kernel_probe.py [nx] [B]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.ops import structured as sops
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import cantilever_config


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench(fn, r, iters=30):
    def sync(x):
        return float(x.ravel()[x.size // 2])

    sync(fn(r, 2))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(r, iters)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def make_variant(name, model, block):
    x_planes, y, z = model.grid_shape
    vec_spec = pl.BlockSpec(
        (3, block, y, z),
        lambda i: (i * 0, i, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    bc8 = model.bc_mask.astype(jnp.int8)
    cp = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)

    if name == "copy":
        def kernel(r_ref, o_ref):
            o_ref[...] = r_ref[...]

        def run(r):
            return pl.pallas_call(
                kernel, grid=(x_planes // block,),
                in_specs=[vec_spec], out_specs=vec_spec,
                out_shape=jax.ShapeDtypeStruct(r.shape, jnp.float32),
                compiler_params=cp,
            )(r)
    elif name == "mask":
        def kernel(r_ref, b_ref, o_ref):
            free = 1.0 - b_ref[...].astype(jnp.float32)
            o_ref[...] = jnp.where(free != 0.0, r_ref[...], 0.0)

        def run(r):
            return pl.pallas_call(
                kernel, grid=(x_planes // block,),
                in_specs=[vec_spec, vec_spec], out_specs=vec_spec,
                out_shape=jax.ShapeDtypeStruct(r.shape, jnp.float32),
                compiler_params=cp,
            )(r, bc8)
    elif name == "diag":
        # diagonal-only apply: 3 muls, no component mixing, no bc
        def kernel(r_ref, o_ref):
            o_ref[...] = r_ref[...] * np.float32(0.5)

        def run(r):
            return pl.pallas_call(
                kernel, grid=(x_planes // block,),
                in_specs=[vec_spec], out_specs=vec_spec,
                out_shape=jax.ShapeDtypeStruct(r.shape, jnp.float32),
                compiler_params=cp,
            )(r)
    elif name == "mix":
        # 3x3 scalar mix without bc/boundary handling
        def kernel(r_ref, o_ref):
            r = r_ref[...]
            r0, r1, r2 = r[0], r[1], r[2]
            c = [np.float32(0.1 * (i + 1)) for i in range(6)]
            o_ref[...] = jnp.stack([
                c[0] * r0 + c[3] * r1 + c[4] * r2,
                c[3] * r0 + c[1] * r1 + c[5] * r2,
                c[4] * r0 + c[5] * r1 + c[2] * r2,
            ])

        def run(r):
            return pl.pallas_call(
                kernel, grid=(x_planes // block,),
                in_specs=[vec_spec], out_specs=vec_spec,
                out_shape=jax.ShapeDtypeStruct(r.shape, jnp.float32),
                compiler_params=cp,
            )(r)
    else:
        raise SystemExit(f"unknown variant {name}")

    @jax.jit
    def chain(r, n):
        def body(_, x):
            return run(x)

        return jax.lax.fori_loop(0, n, body, r)

    from functools import partial
    return partial(jax.jit, static_argnums=1)(
        lambda r, n: chain(r, n)
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 255
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    model, _ = build_structured_model(
        n, n, n, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    log(f"grid {n}^3, dof={model.dof_count:,}, B={block}")
    key = jax.random.PRNGKey(0)
    r = jax.random.normal(key, model.vector_shape, jnp.float32)
    gib = r.nbytes / 2**30
    for name in ("copy", "diag", "mix", "mask"):
        ms = bench(make_variant(name, model, block), r)
        bw = 2 * r.nbytes / (ms * 1e-3) / 1e9
        log(f"{name:6s}: {ms:7.3f} ms   ({bw:6.0f} GB/s r+out, r={gib:.2f} GiB)")

    # the real kernel for comparison
    ss, mf = np.float32(1.3), np.float32(4.0e6)
    pc = jax.jit(lambda m: sops.build_compact_block_jacobi(m, ss, mf))(model)
    from functools import partial
    from civiwave_tpu.ops.pallas.block_jacobi_apply import (
        apply_block_jacobi_pallas,
    )

    @partial(jax.jit, static_argnums=2)
    def chain_real(rr, tab, nn):
        def body(_, x):
            return apply_block_jacobi_pallas(model, tab, x)

        return jax.lax.fori_loop(0, nn, body, rr)

    ms = bench(lambda rr, nn: chain_real(rr, pc.table, nn), r)
    log(f"real  : {ms:7.3f} ms")


if __name__ == "__main__":
    main()
