import time
import jax
import jax.numpy as jnp

from civiwave_tpu.mesh.structured import build_structured_model
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.compile_cache import enable_persistent_cache
from civiwave_tpu.utils.synthetic import cantilever_config

enable_persistent_cache()
cfg = cantilever_config()
mat = materials.make_properties(cfg.materials[0])
rho = cfg.materials[0].density

n = 255
t0 = time.perf_counter()
model, force = build_structured_model(
    n, n, n, mat, rho, traction=(0.0, 0.0, -1.0e6)
)
t1 = time.perf_counter()
# force every array resident + a host fetch to prove it
arrs = [model.lam_grid, model.mu_grid, model.mass_grid, model.bc_mask,
        model.bc_value, model.position0, force]
for a in arrs:
    a.block_until_ready()
chk = float(jnp.sum(model.mass_grid)) + float(jnp.sum(force))
t2 = time.perf_counter()
print(f"build call: {t1-t0:.1f}s; ready+fetch: {t2-t1:.1f}s; total {t2-t0:.1f}s")
print(f"checksum {chk:.6e}; device {jax.devices()[0]}")
