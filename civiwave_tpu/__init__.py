"""civiwave_tpu — TPU-native matrix-free structural-dynamics FEM framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of CiviWave-FEM
(reference: C++26 + Vulkan/Slang, mounted read-only at /root/reference):
YAML scenarios, Gmsh 4.1 meshes, 3D linear elasticity (tet4 + hex8),
matrix-free element-by-element K_eff, block-Jacobi PCG with FP32 vectors and
FP64 reductions, implicit Newmark-beta with adaptive dt, Rayleigh damping,
derived strain/stress/von Mises fields, binary VTU + CSV probe output — with
GSPMD mesh partitioning replacing the reference's single-device buffer
sharding.
"""

import os as _os

import jax as _jax

# The framework's precision contract is FP32 vectors + FP64 reductions
# (reference README.md:14, docs/spec.md:16).  FP64 must be enabled in JAX for
# the reduction path; hot-loop arrays are explicitly f32 everywhere.  Opt out
# with CIVIWAVE_NO_X64=1 (reductions then silently degrade to f32).
if not _os.environ.get("CIVIWAVE_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
