import time
import jax, jax.numpy as jnp, numpy as np

def fetch(y):
    y0 = y[0] if isinstance(y, (tuple, list)) else y
    f = y0.ravel(); return float(jnp.sum(jnp.abs(f[:8])))

def timeit(jr, args, K, label, reps=4):
    t0 = time.perf_counter(); c = fetch(jr(*args)); comp = time.perf_counter()-t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); c = fetch(jr(*args)); best = min(best, time.perf_counter()-t0)
    print(f"{label:<64} {best/K*1e3:7.2f} ms ({comp:.1f}s compile, c={c:.2e})", flush=True)

K = 16
N = 315_392
NC, W = 40, 65536
M = 2_408_448
mc = -(-M // NC)
M = mc * NC
rng = np.random.default_rng(0)

# A: separate small tables, PLAIN consumer (concat + slice)
chunks = [jnp.asarray(rng.standard_normal((W, 3)).astype(np.float32)) for _ in range(NC)]
idxs = [jnp.asarray(rng.integers(0, W, size=(mc,), dtype=np.int32)) for _ in range(NC)]
def runA(chunks):
    def body(_, chunks):
        outs = [chunks[c][idxs[c]] for c in range(NC)]
        g = jnp.concatenate(outs, axis=0)          # (M,3)
        upd = g[: W]
        return [c * 0.999 + 1e-4 * upd for c in chunks]
    return jax.lax.fori_loop(0, K, body, list(chunks))
timeit(jax.jit(runA), (chunks,), K, "A: 40 small tables, plain concat consumer")

# B: single (N,3) source + windows, reshape-SUM consumer
tab = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
los = [min(max(0, int(c * N / NC) - 1024), N - W) for c in range(NC)]
nsum = M // 8
def runB(t):
    def body(_, t):
        outs = []
        for c in range(NC):
            win = jax.lax.dynamic_slice(t, (los[c], 0), (W, 3))
            outs.append(win[idxs[c]])
        g = jnp.concatenate(outs, axis=0)             # (M,3)
        out = jnp.sum(g.reshape(nsum, 8, 3), axis=1)  # (M/8,3)
        return t * 0.999 + 1e-4 * jnp.zeros_like(t).at[: out.shape[0]].set(out[:t.shape[0]])
    return jax.lax.fori_loop(0, K, body, t)
timeit(jax.jit(runB), (tab,), K, "B: (N,3) source windows, reshape-sum consumer")
print(jax.devices()[0])
