"""Prototype: Pallas streaming hex element-forces kernel (ADR-20).

The XLA scalar-component hex force phase measures 18.6 ms at 945k DOF —
memory-bound on unfused (H,)-stream intermediates (theoretical floor
~0.4 ms: 240 MB of table reads + ~0.8 GFLOP of VPU work).  This kernel
streams all tables through VMEM in (Hqb, 128)-tile blocks and keeps every
intermediate in registers/VMEM.

IO (all H-major streams, H reshaped to (Hq, 128)):
  grads (192, Hq, 128)  = (8gp, 8l, 3a) gradient component streams
  u     (24, Hq, 128)   = (8l, 3b) gathered displacement streams
  volss (8, Hq, 128)    = per-gp detJ * stiffness_scale
  lamu  (2, Hq, 128)    = lam, mu streams
  out   (24, Hq, 128)   = (8l, 3b) force component streams

Run: python experiments/exp_pallas_elem.py [H] [Hqb]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def hex_forces_kernel(g_ref, u_ref, v_ref, lm_ref, o_ref):
    u = [[u_ref[l * 3 + b] for b in range(3)] for l in range(8)]
    lam = lm_ref[0]
    mu = lm_ref[1]
    f = [[None] * 3 for _ in range(8)]
    for g in range(8):
        gr = [
            [g_ref[(g * 8 + l) * 3 + a] for a in range(3)] for l in range(8)
        ]
        vs = v_ref[g]
        G = [
            [sum(gr[l][a] * u[l][b] for l in range(8)) for b in range(3)]
            for a in range(3)
        ]
        tr = G[0][0] + G[1][1] + G[2][2]
        S = [
            [
                vs
                * (
                    mu * (G[a][b] + G[b][a])
                    + (lam * tr if a == b else 0.0)
                )
                for b in range(3)
            ]
            for a in range(3)
        ]
        for l in range(8):
            for b in range(3):
                contrib = sum(gr[l][a] * S[a][b] for a in range(3))
                f[l][b] = contrib if f[l][b] is None else f[l][b] + contrib
    for l in range(8):
        for b in range(3):
            o_ref[l * 3 + b] = f[l][b]


def hex_forces_pallas(grads, u, volss, lamu, hqb=32, interpret=False):
    _, hq, _ = u.shape
    grid = (hq // hqb,)
    bs = lambda rows: pl.BlockSpec(
        (rows, hqb, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        hex_forces_kernel,
        out_shape=jax.ShapeDtypeStruct((24, hq, 128), jnp.float32),
        grid=grid,
        in_specs=[bs(192), bs(24), bs(8), bs(2)],
        out_specs=bs(24),
        interpret=interpret,
    )(grads, u, volss, lamu)


def fetch(y):
    f = y.ravel()
    return float(jnp.sum(jnp.abs(f[f.size // 2 : f.size // 2 + 8])))


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 301056
    hqb = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    H = ((H + 128 * hqb - 1) // (128 * hqb)) * (128 * hqb)
    hq = H // 128
    print(f"H={H:,} (Hq={hq}, block {hqb}x128={hqb*128} hexes)", flush=True)
    rng = np.random.default_rng(0)
    grads = jnp.asarray(rng.standard_normal((192, hq, 128)).astype(np.float32) * 0.1)
    u = jnp.asarray(rng.standard_normal((24, hq, 128)).astype(np.float32))
    volss = jnp.asarray(rng.random((8, hq, 128)).astype(np.float32))
    lamu = jnp.asarray(rng.random((2, hq, 128)).astype(np.float32) + 0.5)

    # correctness vs the plain stream math on a small slice
    def ref_streams(grads, u, volss, lamu):
        uu = [[u[l * 3 + b] for b in range(3)] for l in range(8)]
        lam, mu = lamu[0], lamu[1]
        f = [[None] * 3 for _ in range(8)]
        for g in range(8):
            gr = [[grads[(g * 8 + l) * 3 + a] for a in range(3)] for l in range(8)]
            vs = volss[g]
            G = [[sum(gr[l][a] * uu[l][b] for l in range(8)) for b in range(3)] for a in range(3)]
            tr = G[0][0] + G[1][1] + G[2][2]
            S = [[vs * (mu * (G[a][b] + G[b][a]) + (lam * tr if a == b else 0.0)) for b in range(3)] for a in range(3)]
            for l in range(8):
                for b in range(3):
                    c = sum(gr[l][a] * S[a][b] for a in range(3))
                    f[l][b] = c if f[l][b] is None else f[l][b] + c
        return jnp.stack([f[l][b] for l in range(8) for b in range(3)])

    small = slice(0, hqb)
    ref = jax.jit(ref_streams)(grads[:, small], u[:, small], volss[:, small], lamu[:, small])
    got = jax.jit(lambda *a: hex_forces_pallas(*a, hqb=hqb))(
        grads[:, small], u[:, small], volss[:, small], lamu[:, small]
    )
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-30))
    print(f"correctness vs stream math: rel err {err:.2e}", flush=True)

    K = 16

    def chained(grads, u, volss, lamu):
        def body(_, u):
            f = hex_forces_pallas(grads, u, volss, lamu, hqb=hqb)
            return u * 0.999 + f * 1e-13

        return jax.lax.fori_loop(0, K, body, u)

    jr = jax.jit(chained)
    t0 = time.perf_counter()
    c = fetch(jr(grads, u, volss, lamu))
    print(f"compile+run {time.perf_counter()-t0:.1f}s checksum {c:.3e}", flush=True)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        c = fetch(jr(grads, u, volss, lamu))
        best = min(best, time.perf_counter() - t0)
    print(
        f"hex element kernel: {best/K*1e3:.2f} ms per {H:,}-hex force phase "
        f"(checksum {c:.3e})",
        flush=True,
    )
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
