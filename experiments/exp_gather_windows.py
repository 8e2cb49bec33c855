import time, sys
import jax, jax.numpy as jnp, numpy as np

def fetch(y):
    f = y.ravel(); return float(jnp.sum(jnp.abs(f[:8])))

def timeit(jr, args, K, label, reps=4):
    t0 = time.perf_counter(); c = fetch(jr(*args)); comp = time.perf_counter()-t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); c = fetch(jr(*args)); best = min(best, time.perf_counter()-t0)
    print(f"{label:<44} {best/K*1e3:7.2f} ms ({comp:.1f}s compile, c={c:.2e})", flush=True)

M = 2_408_448
N = 315_392
K = 16
rng = np.random.default_rng(0)
tab = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))

# cliff probe
for nrows in (131072, 262144):
    t2 = jnp.asarray(rng.standard_normal((nrows, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, nrows, size=(M,), dtype=np.int32))
    def run(t, i):
        def body(_, t):
            return t * 0.999 + 0.001 * t[i][:t.shape[0]]
        return jax.lax.fori_loop(0, K, body, t)
    timeit(jax.jit(run), (t2, idx), K, f"direct gather, table {nrows:,} rows")

# windowed: C chunks, each gathers M/C rows from a W-row slice
for C, W in ((5, 65536), (10, 32768), (40, 8192)):
    Mc = M // C
    # window c covers rows [c*N//C - pad, +W); indices local, in-range by construction
    los = [min(max(0, c * N // C - 1024), N - W) for c in range(C)]
    idx_local = [
        rng.integers(0, W, size=(Mc,), dtype=np.int32) for _ in range(C)
    ]
    idx_local = [jnp.asarray(i) for i in idx_local]
    def run_windowed(t):
        def body(_, t):
            outs = []
            for c in range(C):
                w = jax.lax.dynamic_slice(t, (los[c], 0), (W, 3))
                outs.append(w[idx_local[c]])
            g = jnp.concatenate(outs, axis=0)
            return t * 0.999 + 0.001 * g[:t.shape[0]]
        return jax.lax.fori_loop(0, K, body, t)
    timeit(jax.jit(run_windowed), (tab,), K, f"windowed gather, {C} x {W:,}-row windows")
print(jax.devices()[0])
