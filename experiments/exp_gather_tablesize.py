import time, sys
import jax, jax.numpy as jnp, numpy as np

def fetch(y):
    f = y.ravel(); return float(jnp.sum(jnp.abs(f[:8])))

M = 2_408_448
K = 16
rng = np.random.default_rng(0)
for nrows in (1024, 8192, 65536, 315392):
    tab = jnp.asarray(rng.standard_normal((nrows, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, nrows, size=(M,), dtype=np.int32))
    def run(t, i):
        def body(_, t):
            g = t[i]            # (M,3)
            back = g[:t.shape[0]]
            return t * 0.999 + 0.001 * back
        return jax.lax.fori_loop(0, K, body, t)
    jr = jax.jit(run)
    t0 = time.perf_counter(); c = fetch(jr(tab, idx)); comp = time.perf_counter()-t0
    best = min(
        (lambda: (lambda s: (fetch(jr(tab, idx)), time.perf_counter()-s))(time.perf_counter()))()[1]
        for _ in range(4)
    )
    print(f"table {nrows:>8,} rows: {best/K*1e3:7.2f} ms per {M:,}-row gather "
          f"({best/K/M*1e9:.2f} ns/row, compile {comp:.1f}s, c={c:.2e})", flush=True)
print(jax.devices()[0])
