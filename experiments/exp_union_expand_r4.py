"""Cost of one-hot re-expansion for union-group gathers (ADR-27 follow-up).

Design under test: gather the UNION of 8 consecutive elements' corners
(~27-36 distinct rows per group instead of 64) from the big table, then
re-expand to the 64 per-corner rows with a tiny (64, 32) one-hot matmul
per group.  The union gather saves big-table rows; this probe measures
whether the re-expansion einsum is cheap enough to matter
(945k-DOF-scale: G=36864 groups).

Usage: python experiments/exp_union_expand_r4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

G = 36_864  # 294,912 elements / 8
U = 32      # padded union size
R = 64      # 8 elements x 8 corners

rng = np.random.default_rng(0)
win = jnp.asarray(rng.standard_normal((G, U, 3)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, U, size=(G, R), dtype=np.int32))


def bf16_parts(v, k=2):
    parts, rem = [], v
    for _ in range(k):
        p = rem.astype(jnp.bfloat16)
        parts.append(p)
        rem = rem - p.astype(jnp.float32)
    return parts


@jax.jit
def expand_onehot(w, ix):
    def body(_, carry):
        iota = jax.lax.broadcasted_iota(jnp.int32, (G, R, U), 2)
        oh = (ix[:, :, None] == iota).astype(jnp.bfloat16)
        acc = None
        for p in bf16_parts(carry):
            y = jax.lax.dot_general(
                oh, p, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, R, 3)
            acc = y if acc is None else acc + y
        # fold back to (G, U, 3) so the chain stays shaped
        return acc[:, :U] * np.float32(0.5) + w

    return jnp.sum(jnp.abs(jax.lax.fori_loop(0, 8, body, w)[:, 0, :]))


@jax.jit
def expand_gather(w, ix):
    """The gather-unit alternative for the same expansion."""
    def body(_, carry):
        y = jnp.take_along_axis(carry, ix[:, :, None], axis=1)  # (G, R, 3)
        return y[:, :U] * np.float32(0.5) + w

    return jnp.sum(jnp.abs(jax.lax.fori_loop(0, 8, body, w)[:, 0, :]))


for name, fn in (("one-hot bf16x2", expand_onehot),
                 ("take_along_axis", expand_gather)):
    t0 = time.perf_counter()
    out = float(fn(win, idx))
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = float(fn(win, idx))
        best = min(best, time.perf_counter() - t0)
    per_row = best / 8 / (G * R) * 1e9
    print(f"{name}: {best*1e3:.2f} ms/8 expansions = {per_row:.3f} ns/row "
          f"(chk {out:.4e})", flush=True)
