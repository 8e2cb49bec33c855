"""Round-5 probe v3: offset-pattern (oct) gather pipelines for the
general-path matvec.

pair_win (probe v2) showed a (W,6) computed-temp pair table gathers at
1.06 ns/corner vs 4.95 for the shipped row windows.  The generalization:
when every element in a chunk reads corners at the SAME 8 offsets from
its base row (true for sorted box-like numberings, chunk-validated at
pack time), a (W,24) table built from 8 shifted slices serves all 8
corners in ONE gathered row per element.  The minor-axis variant emits
the (24,ec) stream layout directly — zero transposes.  Same trick for
assembly (8 constant force-row offsets per node).

All tables are computed temps (shifted-slice concats); indices random
(rate is index-value-independent, established in r2/r4 probes).

Cases (66^3 sizes; ns are per CORNER for x, per CSR row for asm):
  x_ship     shipped windowed row pipeline incl. reshape+transpose
  x_copy     shipped + forced-copy window table
  x_pair     pair table, 4 rows/elem, + reshape+transpose to streams
  x_oct      oct table (W,24), 1 row/elem, + transpose to streams
  x_octm     octT (24,W) minor gather -> (24,ec) directly
  a_ship     shipped assembly (seg.T rows + row gather + wsum)
  a_oct      oct rows table (Wr,24), 1 row/node, wsum of triples
  a_octm     octT minor -> (24,ncnt), wsum of triples -> (3,ncnt)
  t_n3       edge transpose (N,3)->(3,N)
  t_sub      (8,3,ec)-row permutation of a (24,E) array (sublane reorder)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(y):
    return float(jnp.sum(jnp.abs(y.ravel()[:8])))


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
        f"  {label:<8} {best/K*1e3:8.2f} ms/iter = {best/K/per*1e9:5.2f} "
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
    M = 8 * E

    # ALL arrays generated on device (host uploads crawl over the relay)
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 64))
    x0 = jax.random.normal(next(ks), (N, 3), jnp.float32)
    xT0 = jnp.asarray(x0.T)
    idx8 = [
        jax.random.randint(next(ks), (c, 8), 0, W, jnp.int32) for c in ecs
    ]
    idx4 = [
        jax.random.randint(next(ks), (c, 4), 0, W - 1, jnp.int32)
        for c in ecs
    ]
    # oct base indices: one per element, in [0, W - span); span ~ 2100
    SPAN = 2112
    idx1 = [
        jax.random.randint(next(ks), (c,), 0, W - SPAN, jnp.int32)
        for c in ecs
    ]
    offs = np.sort(rng.choice(SPAN, size=8, replace=False)).astype(int)

    def feedback(t, parts, shape_slice):
        fb = None
        for p in parts:
            s = shape_slice(p)
            fb = s if fb is None else fb + s
        return t * 0.999 + 0.0002 * fb

    def x_ship(x):
        def body(_, t):
            parts = []
            for c in range(C):
                win = jax.lax.dynamic_slice(t, (los[c], 0), (W, 3))
                g = jax.lax.optimization_barrier(win[idx8[c].reshape(-1)])
                parts.append(g.reshape(ecs[c], 24).T)  # (24, ec)
            us = jnp.concatenate(parts, axis=1)
            fb = jnp.concatenate([us[:3].T + us[3:6].T, t[E:]], axis=0)
            return t * 0.999 + 0.0002 * fb
        return jax.lax.fori_loop(0, K, body, x)

    def x_copy(x):
        def body(_, t):
            parts = []
            for c in range(C):
                win = jax.lax.dynamic_slice(t, (los[c], 0), (W, 3))
                win = jax.lax.optimization_barrier(win * np.float32(1.0))
                g = jax.lax.optimization_barrier(win[idx8[c].reshape(-1)])
                parts.append(g.reshape(ecs[c], 24).T)
            us = jnp.concatenate(parts, axis=1)
            fb = jnp.concatenate([us[:3].T + us[3:6].T, t[E:]], axis=0)
            return t * 0.999 + 0.0002 * fb
        return jax.lax.fori_loop(0, K, body, x)

    def x_pair(x):
        def body(_, t):
            parts = []
            for c in range(C):
                win = jax.lax.dynamic_slice(t, (los[c], 0), (W, 3))
                p6 = jnp.concatenate([win[:-1], win[1:]], axis=1)
                g = jax.lax.optimization_barrier(p6[idx4[c].reshape(-1)])
                parts.append(g.reshape(ecs[c], 24).T)
            us = jnp.concatenate(parts, axis=1)
            fb = jnp.concatenate([us[:3].T + us[3:6].T, t[E:]], axis=0)
            return t * 0.999 + 0.0002 * fb
        return jax.lax.fori_loop(0, K, body, x)

    def x_oct(x):
        def body(_, t):
            parts = []
            for c in range(C):
                win = jax.lax.dynamic_slice(t, (los[c], 0), (W, 3))
                o24 = jnp.concatenate(
                    [win[o : W - SPAN + o] for o in offs], axis=1
                )  # (W-SPAN, 24)
                g = jax.lax.optimization_barrier(o24[idx1[c]])  # (ec, 24)
                parts.append(g.T)
            us = jnp.concatenate(parts, axis=1)
            fb = jnp.concatenate([us[:3].T + us[3:6].T, t[E:]], axis=0)
            return t * 0.999 + 0.0002 * fb
        return jax.lax.fori_loop(0, K, body, x)

    def x_octm(xt):
        def body(_, t):
            parts = []
            for c in range(C):
                winT = jax.lax.dynamic_slice(t, (0, los[c]), (3, W))
                oT = jnp.concatenate(
                    [winT[:, o : W - SPAN + o] for o in offs], axis=0
                )  # (24, W-SPAN)
                g = jax.lax.optimization_barrier(oT[:, idx1[c]])  # (24, ec)
                parts.append(g)
            us = jnp.concatenate(parts, axis=1)
            fb = jnp.concatenate([us[:3] + us[3:6], t[:, E:]], axis=1)
            return t * 0.999 + 0.0002 * fb
        return jax.lax.fori_loop(0, K, body, xt)

    print(f"x-gather, {M:,} corners:")
    timeit(x_ship, (x0,), "x_ship", M, K)
    timeit(x_copy, (x0,), "x_copy", M, K)
    timeit(x_pair, (x0,), "x_pair", M, K)
    timeit(x_oct, (x0,), "x_oct", M, K)
    timeit(x_octm, (xT0,), "x_octm", M, K)

    # ---- assembly ----
    CA = 15
    ncs = [N // CA] * CA
    ncs[-1] += N - sum(ncs)
    eas = [E // CA] * CA
    eas[-1] += E - sum(eas)
    e0s = np.cumsum([0] + eas[:-1]).tolist()
    R = 8 * N
    streams0 = jax.random.normal(next(ks), (24, E), jnp.float32)
    aidx = [
        jax.random.randint(next(ks), (nc, 8), 0, ea * 8, jnp.int32)
        for nc, ea in zip(ncs, eas)
    ]
    ASPAN = 8 * 300
    aidx1 = [
        jax.random.randint(next(ks), (nc,), 0, ea * 8 - ASPAN, jnp.int32)
        for nc, ea in zip(ncs, eas)
    ]
    aoffs = np.sort(rng.choice(ASPAN, size=8, replace=False)).astype(int)
    w8 = [
        jax.random.normal(next(ks), (nc, 8), jnp.float32) for nc in ncs
    ]
    w8T = [jnp.swapaxes(w, 0, 1)[None] for w in w8]

    def a_ship(f):
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
            out = jnp.concatenate(outs, axis=0)
            return fs * 0.999 + 1.0e-9 * jnp.mean(out)
        return jax.lax.fori_loop(0, K, body, f)

    def a_oct(f):
        def body(_, fs):
            outs = []
            for c in range(CA):
                seg = jax.lax.dynamic_slice(fs, (0, e0s[c]), (24, eas[c]))
                rows_c = seg.T.reshape(-1, 3)  # (ea*8, 3)
                nr = eas[c] * 8 - ASPAN
                o24 = jnp.concatenate(
                    [rows_c[o : nr + o] for o in aoffs], axis=1
                )  # (nr, 24)
                g = jax.lax.optimization_barrier(o24[aidx1[c]])  # (nc, 24)
                gw = g.reshape(ncs[c], 8, 3)
                outs.append(
                    sum(gw[:, k, :] * w8[c][:, k : k + 1] for k in range(8))
                )
            out = jnp.concatenate(outs, axis=0)
            return fs * 0.999 + 1.0e-9 * jnp.mean(out)
        return jax.lax.fori_loop(0, K, body, f)

    def a_octm(f):
        def body(_, fs):
            outs = []
            for c in range(CA):
                seg = jax.lax.dynamic_slice(fs, (0, e0s[c]), (24, eas[c]))
                # stream rows are already component-major: build the
                # transposed oct table by row-concatenating SHIFTED
                # reshapes: row l*3+b of seg shifted by aoffs[k] in
                # element units only works when offsets are multiples of
                # 8 (element-aligned) — here we emulate the general form
                # via the flat (3, ea*8) relayout
                rT = seg.T.reshape(-1, 3).T  # (3, ea*8) one relayout
                nr = eas[c] * 8 - ASPAN
                oT = jnp.concatenate(
                    [rT[:, o : nr + o] for o in aoffs], axis=0
                )  # (24, nr)
                g = jax.lax.optimization_barrier(oT[:, aidx1[c]])  # (24, nc)
                gg = g.reshape(8, 3, ncs[c])
                outs.append(jnp.einsum("kbn,kn->bn", gg, w8T[c][0]))
            out = jnp.concatenate(outs, axis=1)
            return fs * 0.999 + 1.0e-9 * jnp.mean(out)
        return jax.lax.fori_loop(0, K, body, f)

    print(f"assembly, {R:,} rows:")
    timeit(a_ship, (streams0,), "a_ship", R, K)
    timeit(a_oct, (streams0,), "a_oct", R, K)
    timeit(a_octm, (streams0,), "a_octm", R, K)

    def t_n3(x):
        def body(_, t):
            r = jax.lax.optimization_barrier(t.T)
            return t * 0.999 + 0.0002 * r.T
        return jax.lax.fori_loop(0, K, body, x)

    perm = np.argsort((np.arange(24) % 4) * 8 + np.arange(24) // 4)

    def t_sub(f):
        def body(_, fs):
            r = jax.lax.optimization_barrier(fs[perm])
            return fs * 0.999 + 0.0002 * r
        return jax.lax.fori_loop(0, K, body, f)

    print("edges:")
    timeit(t_n3, (x0,), "t_n3", N, K)
    timeit(t_sub, (streams0,), "t_sub", E, K)
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
