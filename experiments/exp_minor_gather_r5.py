"""Round-5: can the general path gather in COMPONENT-MAJOR layout?

exp_windowed_phases_r5 showed the windowed x-gather phase costs 8.31 ms
at 66^3 while the synthetic windowed gather of the same row count runs
2.85 ms (exp_gather_windows) — the delta is the (E,24)<->(24,E) stream
relayouts AROUND the gathers, not the gathers.  If a (3, W) table
gathers along its MINOR axis at comparable speed, both matvec phases can
produce/consume streams directly and the transposes disappear.

Cases (66^3-like sizes: W=65536 window, E=287,496 hexes, 5 chunks):
  row      per-chunk flat row gather from (W,3), elementwise use (floor)
  row_t    row + per-chunk reshape(ec,24).T + concat  (the shipped form)
  minor    per-chunk: winT=(3,W) slice, 8 slot gathers winT[:, idx] ->
           (3,ec) each, concat to (24,ec)  (proposed x-gather)
  minor1   same but ONE gather with the full (ec*8,) flat index ->
           (3, ec*8)  (fewer, bigger gathers)
  asm_now  assembly as shipped: seg(24,Ec) -> .T.reshape(-1,3) rows,
           flat row gather (ncnt*8), weighted sum
  asm_cp   corner-partitioned assembly: 8 minor gathers from the
           (24,E) streams directly (no transpose), weighted sum
  xpose    cost of the bare relayouts for reference
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(y):
    f = y.ravel()
    return float(jnp.sum(jnp.abs(f[:8])))


def timeit(fn, args, label, K=16, reps=4):
    jr = jax.jit(fn)
    t0 = time.perf_counter()
    c = fetch(jr(*args))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        c = fetch(jr(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:<10} {best/K*1e3:8.2f} ms/iter (compile {comp:.1f}s, c={c:.2e})",
          flush=True)
    return best / K


def main():
    rng = np.random.default_rng(0)
    N = 301_056  # 67^3 nodes padded
    E = 290_816  # 287,496 hexes padded
    W = 65_536
    C = 5
    K = 16
    ec = E // C  # 58,163 -> use exact split
    ecs = [E // C] * C
    ecs[-1] += E - sum(ecs)
    los = [min(i * (N // C), N - W) for i in range(C)]

    x = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    xT = jnp.asarray(np.ascontiguousarray(np.asarray(x).T))
    # per-chunk local indices (ec, 8) in [0, W)
    idx = [
        jnp.asarray(rng.integers(0, W, size=(c, 8), dtype=np.int32))
        for c in ecs
    ]
    streams = jnp.asarray(
        rng.standard_normal((24, E)).astype(np.float32)
    )
    ncnt = N // C
    # assembly CSR per chunk: (ncnt, 8) row indices into (Ec*8) rows
    aidx = [
        jnp.asarray(rng.integers(0, c * 8, size=(ncnt, 8), dtype=np.int32))
        for c in ecs
    ]
    # corner-partitioned: (ncnt,) element index per corner slot
    cidx = [
        jnp.asarray(rng.integers(0, c, size=(8, ncnt), dtype=np.int32))
        for c in ecs
    ]
    w8 = jnp.asarray(rng.standard_normal((C, ncnt, 8)).astype(np.float32))

    def row(x):
        def body(_, xv):
            acc = 0.0
            for c in range(C):
                win = jax.lax.dynamic_slice(xv, (los[c], 0), (W, 3))
                g = jax.lax.optimization_barrier(win[idx[c].reshape(-1)])
                acc = acc + jnp.sum(jnp.abs(g[::97, 0]))
            return xv * 0.9999 + acc * 1e-12
        return jax.lax.fori_loop(0, K, body, x)

    def row_t(x):
        def body(_, xv):
            parts = []
            for c in range(C):
                win = jax.lax.dynamic_slice(xv, (los[c], 0), (W, 3))
                g = jax.lax.optimization_barrier(win[idx[c].reshape(-1)])
                parts.append(g.reshape(ecs[c], 24).T)
            us = jnp.concatenate(parts, axis=1)
            return xv * 0.9999 + jnp.sum(jnp.abs(us[:, ::97])) * 1e-12
        return jax.lax.fori_loop(0, K, body, x)

    def minor(xt):
        def body(_, xv):
            parts = []
            for c in range(C):
                winT = jax.lax.dynamic_slice(xv, (0, los[c]), (3, W))
                rows = [
                    jax.lax.optimization_barrier(winT[:, idx[c][:, l]])
                    for l in range(8)
                ]
                parts.append(jnp.concatenate(rows, axis=0))
            us = jnp.concatenate(parts, axis=1)
            return xv * 0.9999 + jnp.sum(jnp.abs(us[:, ::97])) * 1e-12
        return jax.lax.fori_loop(0, K, body, xt)

    def minor1(xt):
        def body(_, xv):
            parts = []
            for c in range(C):
                winT = jax.lax.dynamic_slice(xv, (0, los[c]), (3, W))
                g = jax.lax.optimization_barrier(
                    winT[:, idx[c].T.reshape(-1)]
                )  # (3, 8*ec) slot-major
                parts.append(g.reshape(24, ecs[c]))
            us = jnp.concatenate(parts, axis=1)
            return xv * 0.9999 + jnp.sum(jnp.abs(us[:, ::97])) * 1e-12
        return jax.lax.fori_loop(0, K, body, xt)

    def asm_now(f):
        def body(_, fs):
            outs = []
            e0 = 0
            for c in range(C):
                seg = jax.lax.dynamic_slice(fs, (0, e0), (24, ecs[c]))
                rows_c = seg.T.reshape(-1, 3)
                g = jax.lax.optimization_barrier(
                    rows_c[aidx[c].reshape(-1)]
                ).reshape(ncnt, 8, 3)
                outs.append(sum(g[:, k, :] * w8[c, :, k:k+1] for k in range(8)))
                e0 += ecs[c]
            out = jnp.concatenate(outs, axis=0)
            return fs * 0.9999 + jnp.sum(jnp.abs(out[::97, 0])) * 1e-12
        return jax.lax.fori_loop(0, K, body, f)

    def asm_cp(f):
        def body(_, fs):
            outs = []
            e0 = 0
            for c in range(C):
                seg = jax.lax.dynamic_slice(fs, (0, e0), (24, ecs[c]))
                acc = None
                for l in range(8):
                    tri = seg[l * 3:(l + 1) * 3]  # (3, Ec) view
                    g = jax.lax.optimization_barrier(tri[:, cidx[c][l]])
                    term = g * w8[c, :, l][None, :]
                    acc = term if acc is None else acc + term
                outs.append(acc)  # (3, ncnt)
                e0 += ecs[c]
            out = jnp.concatenate(outs, axis=1)
            return fs * 0.9999 + jnp.sum(jnp.abs(out[0, ::97])) * 1e-12
        return jax.lax.fori_loop(0, K, body, f)

    def xpose(f):
        def body(_, fs):
            r = jax.lax.optimization_barrier(fs.T)
            return fs * 0.9999 + jnp.sum(jnp.abs(r[::97, 0])) * 1e-12
        return jax.lax.fori_loop(0, K, body, f)

    M = E * 8
    t = timeit(row, (x,), "row", K)
    print(f"             = {t/M*1e9:.2f} ns/row over {M:,} rows")
    timeit(row_t, (x,), "row_t", K)
    t = timeit(minor, (xT,), "minor", K)
    print(f"             = {t/M*1e9:.2f} ns/row")
    t = timeit(minor1, (xT,), "minor1", K)
    print(f"             = {t/M*1e9:.2f} ns/row")
    t = timeit(asm_now, (streams,), "asm_now", K)
    print(f"             = {t/(C*ncnt*8)*1e9:.2f} ns/row")
    t = timeit(asm_cp, (streams,), "asm_cp", K)
    print(f"             = {t/(C*ncnt*8)*1e9:.2f} ns/row")
    timeit(xpose, (streams,), "xpose(24,E)", K)
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
