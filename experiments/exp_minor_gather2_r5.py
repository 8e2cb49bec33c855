"""Round-5 probe v2: x-gather + assembly redesign candidates, clean timing.

Feedback rule: the gather TABLE is the loop carry, updated by a dense
aligned slice of the gather output (no strided slices, no partial
concat consumption — v1 and exp_gather_windows let XLA dead-code whole
chunks).  Sizes mimic the 66^3 hex bench (301k nodes, 290k elements).

x-gather candidates (M = 8*E = 2.33M gathered units):
  r_direct   (N,3) full-table row gather (the nowin fallback)
  r_win      5 x 65k-row windows + barrier (the shipped ADR-20 form)
  r_win_nb   same, no optimization_barrier
  m_direct   (3,N) full-table minor-axis gather, flat slot-major index
  m_win      windowed minor gather (3,W) + barrier
  m_win_nb   same, no barrier
  pair_win   paired windows (W,6): 4 row-gathers/element + half-select

assembly candidates (R = 8*N rows):
  a_now      shipped: 15 chunks, seg.T.reshape row table, row gather,
             weighted sum
  a_cp       corner-partitioned: 8 minor gathers from (3,Ec) stream
             triples per chunk, no transpose
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(y):
    f = y if isinstance(y, jax.Array) else y[0]
    f = f.ravel()
    return float(jnp.sum(jnp.abs(f[:8])))


def timeit(fn, args, label, per, K=16, reps=4):
    jr = jax.jit(fn)
    t0 = time.perf_counter()
    c = fetch(jr(*args))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        c = fetch(jr(*args))
        best = min(best, time.perf_counter() - t0)
    print(
        f"  {label:<10} {best/K*1e3:8.2f} ms/iter = {best/K/per*1e9:5.2f} "
        f"ns/unit (compile {comp:.1f}s, c={c:.2e})",
        flush=True,
    )
    return best / K


def main():
    rng = np.random.default_rng(0)
    N = 301_056
    E = 290_816
    W = 65_536
    C = 5
    K = 16
    ecs = [E // C] * C
    ecs[-1] += E - sum(ecs)
    los = [min(i * ((N - W) // (C - 1)), N - W) for i in range(C)]

    x0 = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    xT0 = jnp.asarray(np.ascontiguousarray(np.asarray(x0).T))
    idx = [
        jnp.asarray(rng.integers(0, W, size=(c, 8), dtype=np.int32))
        for c in ecs
    ]
    idx_glob = jnp.asarray(rng.integers(0, N, size=(E, 8), dtype=np.int32))
    M = 8 * E

    def r_direct(x):
        def body(_, t):
            g = t[idx_glob.reshape(-1)]  # (M, 3)
            return t * 0.999 + 0.001 * g[:N]
        return jax.lax.fori_loop(0, K, body, x)

    def make_r_win(barrier):
        def r_win(x):
            def body(_, t):
                parts = []
                for c in range(C):
                    win = jax.lax.dynamic_slice(t, (los[c], 0), (W, 3))
                    g = win[idx[c].reshape(-1)]
                    if barrier:
                        g = jax.lax.optimization_barrier(g)
                    parts.append(g)
                g = jnp.concatenate(parts, axis=0)
                # every chunk's output feeds back (no DCE): sum of
                # aligned slices, all dense
                fb = g[:N]
                for c in range(1, C):
                    o = sum(ecs[:c]) * 8
                    fb = fb + jax.lax.dynamic_slice(g, (o, 0), (N, 3))
                return t * 0.999 + 0.0002 * fb
            return jax.lax.fori_loop(0, K, body, x)
        return r_win

    def m_direct(xt):
        def body(_, t):
            g = t[:, idx_glob.T.reshape(-1)]  # (3, 8*E) slot-major
            return t * 0.999 + 0.001 * g[:, :N]
        return jax.lax.fori_loop(0, K, body, xt)

    def make_m_win(barrier):
        def m_win(xt):
            def body(_, t):
                parts = []
                for c in range(C):
                    winT = jax.lax.dynamic_slice(t, (0, los[c]), (3, W))
                    g = winT[:, idx[c].T.reshape(-1)]  # (3, 8*ec)
                    if barrier:
                        g = jax.lax.optimization_barrier(g)
                    parts.append(g)
                fb = None
                for c in range(C):
                    p = jax.lax.dynamic_slice(parts[c], (0, 0), (3, N))
                    fb = p if fb is None else fb + p
                return t * 0.999 + 0.0002 * fb
            return jax.lax.fori_loop(0, K, body, xt)
        return m_win

    # paired: table (W, 6) built per window by shifted concat; slots
    # pre-paired so 4 gathered rows serve 8 corners
    pidx = [
        jnp.asarray(rng.integers(0, W - 1, size=(c, 4), dtype=np.int32))
        for c in ecs
    ]

    def pair_win(x):
        def body(_, t):
            parts = []
            for c in range(C):
                win = jax.lax.dynamic_slice(t, (los[c], 0), (W, 3))
                p6 = jnp.concatenate([win[:-1], win[1:]], axis=1)  # (W-1,6)
                g = jax.lax.optimization_barrier(p6[pidx[c].reshape(-1)])
                parts.append(g)  # (4*ec, 6)
            g = jnp.concatenate(parts, axis=0)
            fb = g[:N, :3] + g[:N, 3:]
            return t * 0.999 + 0.0002 * fb
        return jax.lax.fori_loop(0, K, body, x)

    print(f"x-gather: {M:,} units")
    timeit(r_direct, (x0,), "r_direct", M, K)
    timeit(make_r_win(True), (x0,), "r_win", M, K)
    timeit(make_r_win(False), (x0,), "r_win_nb", M, K)
    timeit(m_direct, (xT0,), "m_direct", M, K)
    timeit(make_m_win(True), (xT0,), "m_win", M, K)
    timeit(make_m_win(False), (xT0,), "m_win_nb", M, K)
    timeit(pair_win, (x0,), "pair_win", M, K)  # ns per CORNER (M units)

    # ---- assembly ----
    CA = 15
    ncs = [N // CA] * CA
    ncs[-1] += N - sum(ncs)
    eas = [E // CA] * CA  # element window per chunk (~19.4k, 230 KB*3)
    eas[-1] += E - sum(eas)
    e0s = np.cumsum([0] + eas[:-1]).tolist()
    R = 8 * N
    streams0 = jnp.asarray(rng.standard_normal((24, E)).astype(np.float32))
    aidx = [
        jnp.asarray(
            rng.integers(0, ea * 8, size=(nc, 8), dtype=np.int32)
        )
        for nc, ea in zip(ncs, eas)
    ]
    cidx = [
        jnp.asarray(rng.integers(0, ea, size=(8, nc), dtype=np.int32))
        for nc, ea in zip(ncs, eas)
    ]
    w8 = [
        jnp.asarray(rng.standard_normal((nc, 8)).astype(np.float32))
        for nc in ncs
    ]

    def a_now(f):
        def body(_, fs):
            outs = []
            for c in range(CA):
                seg = jax.lax.dynamic_slice(fs, (0, e0s[c]), (24, eas[c]))
                rows_c = seg.T.reshape(-1, 3)
                g = jax.lax.optimization_barrier(rows_c[aidx[c].reshape(-1)])
                gw = g.reshape(ncs[c], 8, 3)
                outs.append(
                    sum(gw[:, k, :] * w8[c][:, k : k + 1] for k in range(8))
                )
            out = jnp.concatenate(outs, axis=0)  # (N, 3)
            return fs * 0.999 + 1.0e-9 * jnp.mean(out)
        return jax.lax.fori_loop(0, K, body, f)

    def a_cp(f):
        def body(_, fs):
            outs = []
            for c in range(CA):
                seg = jax.lax.dynamic_slice(fs, (0, e0s[c]), (24, eas[c]))
                acc = None
                for l in range(8):
                    tri = jax.lax.slice(
                        seg, (l * 3, 0), (l * 3 + 3, eas[c])
                    )
                    g = jax.lax.optimization_barrier(tri[:, cidx[c][l]])
                    term = g * w8[c][:, l][None, :]
                    acc = term if acc is None else acc + term
                outs.append(acc)  # (3, nc)
            out = jnp.concatenate(outs, axis=1)  # (3, N)
            return fs * 0.999 + 1.0e-9 * jnp.mean(out)
        return jax.lax.fori_loop(0, K, body, f)

    print(f"assembly: {R:,} rows")
    timeit(a_now, (streams0,), "a_now", R, K)
    timeit(a_cp, (streams0,), "a_cp", R, K)
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
