"""Measure MXU one-hot-matmul row gathers vs the gather unit (round 4).

ADR-20 found XLA's row gather floors at ~1.5-2.8 ns/row even with a
VMEM-resident table, regardless of index locality.  The remaining idea
from VERDICT r3 #1 is two-level blocking: per block of rows, a SMALL
(<=1024-row) dynamic_slice window + selection done ON THE MXU as a
one-hot matmul (bf16 one-hot is exact; the f32 table splits exactly into
2-3 bf16 parts: v == b1+b2+b3 bitwise for normal floats).

Rates to beat (v5e, ADR-20): 5.9 ns/row HBM, 1.5-2.8 ns/row VMEM window.

Run on the real chip: python experiments/exp_onehot_gather.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 315_000          # table rows (~945k DOF worth of nodes)
R_BLK = 1024         # gathered rows per block
G = 2304             # blocks  -> R = 2.36M rows (~8 rows/elem at 295k elems)
R = R_BLK * G

rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))


def make_indices(w):
    """Block-local random indices within a W-span sliding window."""
    bases = np.minimum(
        (np.arange(G) * max((N - w) // max(G - 1, 1), 1)), N - w
    ).astype(np.int32)
    local = rng.integers(0, w, size=(G, R_BLK), dtype=np.int32)
    return jnp.asarray(bases), jnp.asarray(local)


def bf16_parts(v, k):
    parts = []
    rem = v
    for _ in range(k):
        p = rem.astype(jnp.bfloat16)
        parts.append(p)
        rem = rem - p.astype(jnp.float32)
    return parts


def time_fn(fn, *args, inner=8, reps=5, label=""):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = float(f(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = float(f(*args))
        best = min(best, time.perf_counter() - t0)
    per_row = best / inner / R * 1e9
    print(f"{label:34s} {per_row:7.3f} ns/row  (best {best*1e3:8.2f} ms, "
          f"compile {compile_s:.1f}s, chk {out:.4e})", flush=True)
    return per_row


def chain(body, x0, inner=8):
    """Chain `inner` dependent invocations; returns a checksum scalar."""
    def step(i, carry):
        return body(carry)
    y = jax.lax.fori_loop(0, inner, step, x0)
    return jnp.sum(jnp.abs(y[:64]))


# ---- baseline: flat HBM gather -------------------------------------------
bases, local = make_indices(4096)
flat_idx = (bases[:, None] + local).reshape(-1)


def hbm_gather(x):
    def body(t):
        g = t[flat_idx]
        # fold back to table size so the chain stays shaped (use first N)
        return jax.lax.dynamic_slice(g, (0, 0), (N, 3)) * np.float32(0.5) + x
    return chain(body, x)


# ---- current design: dyn-slice window + gather unit ----------------------
def win_gather(x, w, bases, local, variant):
    k2 = None
    if variant.startswith("onehot"):
        k2 = int(variant[-1])

    def one_block(t, b, idx):
        win = jax.lax.dynamic_slice(t, (b, 0), (w, 3))
        if k2 is None:
            return jax.lax.optimization_barrier(win[idx])
        iota = jax.lax.broadcasted_iota(jnp.int32, (R_BLK, w), 1)
        oh = (idx[:, None] == iota).astype(jnp.bfloat16)
        acc = None
        for p in bf16_parts(win, k2):
            y = jax.lax.dot_general(
                oh, p, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
        return acc

    def body(t):
        out = jax.vmap(one_block, in_axes=(None, 0, 0))(t, bases, local)
        out = out.reshape(-1, 3)
        return jax.lax.dynamic_slice(out, (0, 0), (N, 3)) * np.float32(0.5) + x
    return chain(body, x)


print(f"table {N} rows | R = {R/1e6:.2f}M gathered rows | device "
      f"{jax.devices()[0]}", flush=True)
time_fn(hbm_gather, table, label="flat HBM gather")
for w in (256, 512, 1024, 2048):
    bases, local = make_indices(w)
    time_fn(lambda t, b=bases, l=local, w=w: win_gather(t, w, b, l, "gather"),
            table, label=f"win dyn-slice + gather  W={w}")
    for k in (2, 3):
        time_fn(
            lambda t, b=bases, l=local, w=w, k=k: win_gather(
                t, w, b, l, f"onehot{k}"
            ),
            table, label=f"win one-hot bf16x{k}    W={w}",
        )
