"""Device packing: mesh + preprocess + config -> JAX pytrees.

TPU-native replacement for /root/reference/src/mesh/pack.cpp:61-235.  The
reference packs SoA float vectors for Vulkan descriptor buffers; here the
product is two pytrees of jnp arrays:

* :class:`PackedModel` — time-invariant tables (connectivity, gradients,
  volumes, materials, masses, boundary conditions).  These are the analogue
  of the 17 logical GPU buffers (buffers.cpp:67-96).
* :class:`SimState` — the evolving kinematic state (u, v, a) plus the PCG
  warm-start vector (solver.vector.x in the reference).

Semantics preserved from the reference:
* fp64 -> fp32 conversion clamps to +/-FLT_MAX instead of producing inf
  (pack.cpp:41-57);
* connectivity padding uses a sentinel — here the sentinel is ``node_count``
  (one virtual dump row appended at gather/scatter time) instead of
  UINT32_MAX, because a valid index keeps every gather in-bounds under XLA;
* ``bc_mask`` is (N, 3) bool (the reference packs 3-bit masks,
  pack.cpp:159-175); ``bc_value`` holds per-axis targets;
* external force is assembled at ``load_time_seconds`` (pack.cpp:107-113).

TPU additions:
* node and quadrature-row counts are padded up to multiples of ``pad_nodes``
  / ``pad_quads`` so arrays tile cleanly onto (8, 128) vregs and shard evenly
  over device meshes.  Padded nodes are fully Dirichlet-constrained with zero
  targets and zero mass, making them exact no-ops in the solver; padded rows
  have zero gradients/volume and point at the dump row.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import Config
from ..physics import loads as loads_mod
from ..physics import oracle
from ..physics.materials import ElasticProperties, material_tables
from ..utils.errors import PackError
from .model import Mesh, SENTINEL
from .preprocess import PreprocessOutputs

_FLT_MAX = np.float32(np.finfo(np.float32).max)


def clamp_to_f32(values: np.ndarray) -> np.ndarray:
    """fp64 -> fp32 with +/-FLT_MAX clamping (pack.cpp:41-57)."""
    values = np.asarray(values, dtype=np.float64)
    finite = np.isfinite(values)
    clipped = np.clip(values, -np.float64(_FLT_MAX), np.float64(_FLT_MAX))
    out = np.where(finite, clipped, values)  # keep inf/nan verbatim
    return out.astype(np.float32)


def _round_up(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PackedModel:
    """Time-invariant device tables (quadrature-row layout).

    Shapes use N* = padded node count, Q* = padded quadrature-row count.
    ``conn`` indexes into arrays of length N* + 1; index N* is the dump row.
    """

    # per quadrature row
    conn: jax.Array  # (Q*, 8) int32 — padded with dump-row index
    gradients: jax.Array  # (Q*, 8, 3) f32
    volume: jax.Array  # (Q*,) f32
    lam_q: jax.Array  # (Q*,) f32 — per-row first Lame parameter
    mu_q: jax.Array  # (Q*,) f32 — per-row shear modulus
    material_index: jax.Array  # (Q*,) int32
    # per node
    position0: jax.Array  # (N*, 3) f32
    lumped_mass: jax.Array  # (N*,) f32
    bc_mask: jax.Array  # (N*, 3) bool
    bc_value: jax.Array  # (N*, 3) f32
    # per material
    lam: jax.Array  # (M,) f32
    mu: jax.Array  # (M,) f32
    stiffness_6x6: jax.Array  # (M, 6, 6) f32
    # static metadata
    node_count: int = field(metadata=dict(static=True), default=0)
    padded_node_count: int = field(metadata=dict(static=True), default=0)
    quad_count: int = field(metadata=dict(static=True), default=0)
    padded_quad_count: int = field(metadata=dict(static=True), default=0)
    element_count: int = field(metadata=dict(static=True), default=0)

    @property
    def dof_count(self) -> int:
        return self.node_count * 3


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SimState:
    """Evolving kinematic state + PCG warm-start vector, all (N*, 3) f32."""

    displacement: jax.Array
    velocity: jax.Array
    acceleration: jax.Array
    warm_x: jax.Array  # previous PCG solution (solver.vector.x)


def zero_state(model: PackedModel) -> SimState:
    shape = (model.padded_node_count, 3)
    zeros = jnp.zeros(shape, dtype=jnp.float32)
    return SimState(zeros, zeros, zeros, zeros)


def build_packed_model(
    mesh: Mesh,
    preprocess: PreprocessOutputs,
    cfg: Config,
    materials: Sequence[ElasticProperties],
    pad_nodes: int = 8,
    pad_quads: int = 8,
) -> Tuple[PackedModel, SimState, jax.Array]:
    """Pack everything for device residency (pack.cpp:61-235).

    Returns (model, initial_state, external_force) where external_force is
    the (N*, 3) f32 load vector at t=0.
    """
    if pad_nodes < 1 or pad_quads < 1:
        raise PackError(
            "padding multiples must be >= 1", ["PackingParameters"]
        )

    n = mesh.node_count
    q = preprocess.quad_count
    if n != preprocess.lumped_mass.shape[0]:
        raise PackError(
            "preprocess lumped mass count mismatches mesh nodes",
            ["nodes", str(n), "lumped_mass", str(preprocess.lumped_mass.shape[0])],
        )

    n_pad = _round_up(max(n, 1), pad_nodes)
    q_pad = _round_up(max(q, 1), pad_quads)

    # --- per-node tables -------------------------------------------------
    position0 = np.zeros((n_pad, 3), dtype=np.float32)
    position0[:n] = clamp_to_f32(mesh.node_positions)

    lumped_mass = np.zeros(n_pad, dtype=np.float32)
    lumped_mass[:n] = clamp_to_f32(preprocess.lumped_mass)

    dirichlet = oracle.build_dirichlet_conditions(mesh, cfg)
    bc_mask = np.zeros((n_pad, 3), dtype=bool)
    bc_mask[:n] = dirichlet.mask.reshape(n, 3)
    bc_mask[n:] = True  # padded nodes are fully constrained no-ops
    bc_value = np.zeros((n_pad, 3), dtype=np.float32)
    bc_value[:n] = clamp_to_f32(dirichlet.targets.reshape(n, 3))

    load = loads_mod.assemble_load_vector(mesh, cfg, preprocess, 0.0)
    external_force = np.zeros((n_pad, 3), dtype=np.float32)
    external_force[:n] = clamp_to_f32(load)

    # --- per-row tables ----------------------------------------------------
    dump = n_pad  # virtual dump row index
    conn = np.full((q_pad, 8), dump, dtype=np.int32)
    src_conn = preprocess.quad_connectivity
    conn[:q] = np.where(src_conn == SENTINEL, dump, src_conn)

    gradients = np.zeros((q_pad, 8, 3), dtype=np.float32)
    gradients[:q] = clamp_to_f32(preprocess.quad_gradients)

    volume = np.zeros(q_pad, dtype=np.float32)
    volume[:q] = clamp_to_f32(preprocess.quad_volume)

    material_index = np.zeros(q_pad, dtype=np.int32)
    material_index[:q] = preprocess.quad_material_index

    lam_np, mu_np, d_np = material_tables(materials)
    lam_q = np.zeros(q_pad, dtype=np.float32)
    mu_q = np.zeros(q_pad, dtype=np.float32)
    lam_q[:q] = clamp_to_f32(lam_np[preprocess.quad_material_index])
    mu_q[:q] = clamp_to_f32(mu_np[preprocess.quad_material_index])

    model = PackedModel(
        conn=jnp.asarray(conn),
        gradients=jnp.asarray(gradients),
        volume=jnp.asarray(volume),
        lam_q=jnp.asarray(lam_q),
        mu_q=jnp.asarray(mu_q),
        material_index=jnp.asarray(material_index),
        position0=jnp.asarray(position0),
        lumped_mass=jnp.asarray(lumped_mass),
        bc_mask=jnp.asarray(bc_mask),
        bc_value=jnp.asarray(bc_value),
        lam=jnp.asarray(clamp_to_f32(lam_np)),
        mu=jnp.asarray(clamp_to_f32(mu_np)),
        stiffness_6x6=jnp.asarray(clamp_to_f32(d_np)),
        node_count=n,
        padded_node_count=n_pad,
        quad_count=q,
        padded_quad_count=q_pad,
        element_count=mesh.element_count,
    )
    return model, zero_state(model), jnp.asarray(external_force)
