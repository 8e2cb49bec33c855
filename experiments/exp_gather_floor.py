"""Gather-floor microbenchmark (ADR-20 evidence).

ADR-18 measured the general path's floor as two ~13 ms random row gathers
at 945k DOF: the x-gather (``x[conn_hex]``, (H,8) rows from the (N,3)
displacement table) and the CSR assembly gather (``rows[csr_idx[:,d]]``,
D slots of (N,) rows from the (R,3) force-row table).  VERDICT round 2
asks whether (i) node/element ordering (RCM/Morton) or (ii) a Pallas
VMEM-resident gather can break that floor.

This script isolates the gather itself: one jitted fori_loop chains K
iterations of [row gather -> reshape -> slice -> axpy feedback] so the
measured time is the gather (+ cheap vector tail), not dispatch.  Index
distributions probe the locality question:

* box     — the lexicographic box connectivity (bandwidth ~ (ny+1)(nz+1))
* morton  — the same connectivity under a Morton (Z-order) node permutation
* random  — uniform random rows (worst case / arbitrary Gmsh ordering)
* sorted  — all indices sorted ascending (degenerate best case)

Table layouts probe the lowering question:

* (N,3)   — the shipped layout (rows lane-pad 3 -> 128)
* (3,N)   — component streams, 3 scalar gathers from 1-D tables
* (N,8)   — sublane-width rows
* take128 — (N,128) full-lane rows (gather granularity = 1 vreg row)

Run on the real chip:  python experiments/exp_gather_floor.py [nx]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(y):
    """Force completion via a host fetch (block_until_ready is unreliable
    on the axon relay)."""
    flat = y.ravel()
    return float(jnp.sum(jnp.abs(flat[flat.size // 2 : flat.size // 2 + 8])))


def bench(fn, x, label, inner, work_desc, reps=4):
    jitted = jax.jit(fn)
    t0 = time.perf_counter()
    y = jitted(x)
    c = fetch(y)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = jitted(x)
        c = fetch(y)
        best = min(best, time.perf_counter() - t0)
    per = best / inner * 1e3
    print(
        f"  {label:<34} {per:7.2f} ms/iter   ({work_desc}, compile {compile_s:.1f}s, checksum {c:.2e})",
        flush=True,
    )
    return per


def morton_perm(xs, ys, zs):
    """Node permutation: new_id = rank of morton(i,j,k).  Returns perm such
    that new_positions = old_positions[perm_old_of_new] — we need the map
    old_id -> new_id to renumber connectivity."""
    ii, jj, kk = np.meshgrid(
        np.arange(xs), np.arange(ys), np.arange(zs), indexing="ij"
    )

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 32)) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << 16)) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << 8)) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << 4)) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << 2)) & np.uint64(0x1249249249249249)
        return v

    code = (
        spread(ii.reshape(-1))
        | (spread(jj.reshape(-1)) << np.uint64(1))
        | (spread(kk.reshape(-1)) << np.uint64(2))
    )
    order = np.argsort(code, kind="stable")  # old ids in new order
    old_to_new = np.empty(len(order), dtype=np.int64)
    old_to_new[order] = np.arange(len(order))
    return old_to_new


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 67
    xs = ys = zs = nx + 1
    n = xs * ys * zs
    h = nx * nx * nx
    n_pad = ((n + 1023) // 1024) * 1024
    h_pad = ((h + 1023) // 1024) * 1024
    r = h_pad * 8
    print(
        f"grid {nx}^3: nodes={n:,} (pad {n_pad:,}) hexes={h:,} (pad {h_pad:,}) "
        f"force rows={r:,}  dof={3*n:,}"
    )

    def nid(i, j, k):
        return (i * ys + j) * zs + k

    ii, jj, kk = np.meshgrid(
        np.arange(nx), np.arange(nx), np.arange(nx), indexing="ij"
    )
    ii, jj, kk = ii.reshape(-1), jj.reshape(-1), kk.reshape(-1)
    conn_box = np.stack(
        [
            nid(ii, jj, kk), nid(ii + 1, jj, kk),
            nid(ii + 1, jj + 1, kk), nid(ii, jj + 1, kk),
            nid(ii, jj, kk + 1), nid(ii + 1, jj, kk + 1),
            nid(ii + 1, jj + 1, kk + 1), nid(ii, jj + 1, kk + 1),
        ],
        axis=1,
    ).astype(np.int32)
    conn_box = np.concatenate(
        [conn_box, np.zeros((h_pad - h, 8), np.int32)], axis=0
    )

    rng = np.random.default_rng(0)
    conn_random = rng.integers(0, n, size=(h_pad, 8), dtype=np.int32)
    conn_sorted = np.sort(conn_box.reshape(-1)).reshape(h_pad, 8)
    old_to_new = morton_perm(xs, ys, zs)
    conn_morton = old_to_new[conn_box].astype(np.int32)

    K = 16

    # ---------------- x-gather: (H,8) rows from (N,3) --------------------
    print("\nx-gather (H*8 row reads) + transpose to (8,3,H) [shipped form]:")
    x0 = jnp.asarray(rng.standard_normal((n_pad, 3)).astype(np.float32))
    for name, conn in [
        ("box", conn_box),
        ("morton", conn_morton),
        ("random", conn_random),
        ("sorted", conn_sorted),
    ]:
        cj = jnp.asarray(conn)

        def chain(x, cj=cj):
            def body(_, x):
                g = jnp.transpose(x[cj], (1, 2, 0))  # (8,3,H)
                back = g[0].T  # (H,3) contiguous slice, no gather
                return x * 0.999 + 0.001 * jnp.zeros_like(x).at[:h_pad].set(back)

            return jax.lax.fori_loop(0, K, body, x)

        bench(chain, x0, f"gather+transpose[{name}]", K, f"{h_pad*8:,} rows")

    print("\nx-gather WITHOUT the transpose (raw (H,8,3) out):")
    for name, conn in [("box", conn_box), ("random", conn_random)]:
        cj = jnp.asarray(conn)

        def chain(x, cj=cj):
            def body(_, x):
                g = x[cj]  # (H,8,3)
                back = g[:, 0, :]
                return x * 0.999 + 0.001 * jnp.zeros_like(x).at[:h_pad].set(back)

            return jax.lax.fori_loop(0, K, body, x)

        bench(chain, x0, f"gather-raw[{name}]", K, f"{h_pad*8:,} rows")

    # ---------------- layout variants on the box distribution -------------
    print("\nlayout variants (box indices):")
    cj = jnp.asarray(conn_box)

    xT = jnp.asarray(rng.standard_normal((3, n_pad)).astype(np.float32))

    def chain_T(x):
        def body(_, x):
            g0 = x[0][cj]  # (H,8) scalar gather per component
            g1 = x[1][cj]
            g2 = x[2][cj]
            back = jnp.stack([g0[:, 0], g1[:, 0], g2[:, 0]], axis=0)  # (3,H)
            return x * 0.999 + 0.001 * jnp.zeros_like(x).at[:, :h_pad].set(back)

        return jax.lax.fori_loop(0, K, body, x)

    bench(chain_T, xT, "gather (3,N) 3x scalar", K, f"3x {h_pad*8:,} elems")

    x8 = jnp.asarray(rng.standard_normal((n_pad, 8)).astype(np.float32))

    def chain_8(x):
        def body(_, x):
            g = x[cj]  # (H,8,8)
            back = g[:, 0, :]
            return x * 0.999 + 0.001 * jnp.zeros_like(x).at[:h_pad].set(back)

        return jax.lax.fori_loop(0, K, body, x)

    bench(chain_8, x8, "gather rows of (N,8)", K, f"{h_pad*8:,} rows x 32B")

    x128 = jnp.asarray(rng.standard_normal((n_pad, 128)).astype(np.float32))
    cj1 = jnp.asarray(conn_box[:, :1])  # 1 slot only to bound memory

    def chain_128(x):
        def body(_, x):
            g = x[cj1]  # (H,1,128)
            back = g[:, 0, :]
            return x * 0.999 + 0.001 * jnp.zeros_like(x).at[:h_pad].set(back)

        return jax.lax.fori_loop(0, K, body, x)

    bench(chain_128, x128, "gather rows of (N,128) [1 slot]", K, f"{h_pad:,} rows x 512B")

    # ---------------- CSR-assembly gather: D slots from (R,3) -------------
    print("\nCSR-assembly gather (D=8 unrolled slots of (N,) rows from (R,3)):")
    rows0 = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32))
    # box-ish csr: node's incident rows are within a local window
    csr_box = np.minimum(
        (np.arange(n_pad, dtype=np.int64)[:, None] * r // n_pad)
        + np.arange(8, dtype=np.int64)[None, :] * 9,
        r - 1,
    ).astype(np.int32)
    csr_random = rng.integers(0, r, size=(n_pad, 8), dtype=np.int32)
    w = jnp.asarray(np.ones((n_pad, 8), np.float32))
    for name, csr in [("local", csr_box), ("random", csr_random)]:
        csr_j = jnp.asarray(csr)

        def chain_csr(rows, csr_j=csr_j):
            def body(_, rows):
                out = None
                for d in range(8):
                    term = rows[csr_j[:, d]] * w[:, d, None]
                    out = term if out is None else out + term
                return rows * 0.999 + 0.001 * jnp.zeros_like(rows).at[:n_pad].set(out)

            return jax.lax.fori_loop(0, K, body, rows)

        bench(chain_csr, rows0, f"csr-gather[{name}]", K, f"{n_pad*8:,} rows")

    print(f"\ndevice: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
