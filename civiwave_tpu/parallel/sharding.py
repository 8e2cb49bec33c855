"""GSPMD sharding of the packed model over a TPU device mesh.

This replaces the reference's single-device descriptor-buffer sharding
(/root/reference/src/gpu/sharding.cpp:39-144 splits logical buffers into
<=2 GiB VkBuffers on ONE device) with true multi-chip partitioning:

* quadrature rows shard along the element axis (``conn``, ``gradients``,
  ``volume``, per-row material constants);
* nodes shard along the node axis (state, masses, BCs, forces);
* material tables replicate.

With these input shardings, the jitted Newmark step runs unchanged: XLA
GSPMD partitions the element einsums per shard, turns the ``segment_sum``
scatter into the required cross-chip combination for boundary nodes (the
halo-exchange role of ke_gather_node.slang's CSR gather), and lowers the
FP64 dot products to per-shard partials + ``psum`` over ICI — directly
replacing pcg_dot_partials/pcg_reduce_final.slang.

``build_packed_model(pad_nodes=8*n_devices, pad_elems=8*n_devices)`` makes
every axis evenly divisible, so no resharding is needed at dispatch.
Explicit owner-computes halo exchange via ``shard_map``/``ppermute`` (to
keep the gather local to ICI neighbors) is the planned next optimization;
GSPMD correctness comes first.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mesh.pack import PackedModel, SimState
from ..utils.errors import ShardError


def make_device_mesh(n_devices: int | None = None, axis_name: str = "shard") -> Mesh:
    """1-D device mesh over the first ``n_devices`` visible devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ShardError(
            "requested more devices than visible",
            [f"requested={n_devices}", f"visible={len(devices)}"],
        )
    return Mesh(np.asarray(devices[:n_devices]), (axis_name,))


def make_device_mesh_2d(
    npx: int, npy: int, axis_names: Tuple[str, str] = ("shard", "shard_y")
) -> Mesh:
    """2-D (X, Y) device mesh over the first ``npx*npy`` visible devices.

    The X axis varies slowest so X-neighbor halo planes (the big ones)
    ride adjacent ICI links on a physically-ordered device list.

    Multi-slice (DCN-connected) topologies: when the visible devices span
    multiple slices and the slice count divides ``npx``, the mesh is laid
    out hybrid — the X axis strides ACROSS slices so only the two ghost
    planes at each slice boundary cross DCN per matvec, while all Y ghost
    rows and every other X exchange stay on ICI (the scaling-book recipe:
    put the least-frequent/most-contiguous axis on the slow network).
    Single-slice (and CPU-virtual) topologies take the flat layout."""
    devices = jax.devices()
    need = npx * npy
    if need > len(devices):
        raise ShardError(
            "requested more devices than visible",
            [f"requested={need}", f"visible={len(devices)}"],
        )
    slices = sorted({getattr(d, "slice_index", 0) for d in devices[:need]})
    n_slices = len(slices)
    if n_slices > 1 and npx % n_slices == 0:
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_hybrid_device_mesh(
                (npx // n_slices, npy),
                (n_slices, 1),
                devices=devices[:need],
            )
            return Mesh(grid, axis_names)
        except Exception:  # noqa: BLE001 — fall back to the flat layout
            pass
    grid = np.asarray(devices[:need]).reshape(npx, npy)
    return Mesh(grid, axis_names)


def model_shardings(
    model: PackedModel, mesh: Mesh, axis_name: str = "shard"
) -> PackedModel:
    """A PackedModel-shaped pytree of NamedShardings (static metadata kept
    from ``model`` so the treedefs match for device_put/jit)."""
    import dataclasses

    row = NamedSharding(mesh, P(axis_name))  # shard leading axis
    rep = NamedSharding(mesh, P())  # replicate
    extra = {}
    if model.damp_blocks is not None:
        extra["damp_blocks"] = row
    if model.perm_new_of_old is not None:
        # RCM permutation tables (ADR-32): (N*,) rows, used only at the
        # host-facing to_nodal/from_nodal edges
        extra["perm_new_of_old"] = row
        extra["perm_old_of_new"] = row
    # oct-plan tables (ADR-33): element- and node-aligned rows
    if model.oct_base_tet is not None:
        extra["oct_base_tet"] = row
    if model.oct_base_hex is not None:
        extra["oct_base_hex"] = row
    if model.oa_col is not None:
        extra["oa_col"] = row
        extra["oa_w"] = row
    if model.halo_conn is not None:
        # halo tables shard their per-shard-stacked axis (trailing for the
        # transposed gradient/volume streams)
        tet = model.halo_block == "tet"
        extra.update(
            halo_conn=row,
            halo_grads=NamedSharding(
                mesh,
                P(None, None, axis_name)
                if tet
                else P(None, None, None, axis_name),
            ),
            halo_vol=row if tet else NamedSharding(mesh, P(None, axis_name)),
            halo_lam=row,
            halo_mu=row,
            halo_csr_idx=row,
            halo_csr_weight=row,
        )
    return dataclasses.replace(
        model,
        **extra,
        conn_tet=row,
        # node-major transposed tet table shards its trailing element axis
        grads_tet=NamedSharding(mesh, P(None, None, axis_name)),
        vol_tet=row,
        lam_tet=row,
        mu_tet=row,
        mat_tet=row,
        conn_hex=row,
        # gp-major transposed tables shard their trailing element axis
        grads_hex=NamedSharding(mesh, P(None, None, None, axis_name)),
        vol_hex=NamedSharding(mesh, P(None, axis_name)),
        lam_hex=row,
        mu_hex=row,
        mat_hex=row,
        csr_idx=row,
        csr_weight=row,
        position0=row,
        lumped_mass=row,
        bc_mask=row,
        bc_value=row,
        lam=rep,
        mu=rep,
        stiffness_6x6=rep,
    )


def state_shardings(mesh: Mesh, axis_name: str = "shard") -> SimState:
    row = NamedSharding(mesh, P(axis_name))
    return SimState(row, row, row, row)


def shard_structured(model, state: SimState, external_force, mesh: Mesh,
                     axis_name: str = "shard",
                     axis_name_y: str | None = None):
    """Shard a StructuredModel simulation into X-slabs over ``mesh``.

    Solver vectors are component-separated ``(3, X, Y, Z)`` grids; sharding
    the X axis (dim 1) with ``pad_x_multiple = n_devices`` gives an exact
    X-slab decomposition, so GSPMD turns the stencil's shifted slices into
    neighbor halo exchanges (collective-permute of one (Y, Z) plane per step
    over ICI).  Material grids and the small host-facing tables replicate.

    Passing ``axis_name_y`` (with a 2-D ``mesh`` carrying both axes, see
    :func:`make_device_mesh_2d`) decomposes into (X, Y) tiles instead —
    build with ``pad_x_multiple=npx, pad_y_multiple=npy``.  The matvec then
    exchanges one ghost ROW per Y neighbor and one ghost PLANE per X
    neighbor (ops/structured_sharded._apply_keff_2d); at pod scale this
    beats thin 1-D slabs whose halo volume approaches slab volume.
    """
    import dataclasses

    if axis_name_y is None and len(mesh.axis_names) == 2 and all(
        a in mesh.axis_names for a in (axis_name, "shard_y")
    ):
        axis_name_y = "shard_y"  # a 2-D default mesh implies 2-D slabs
    npx = int(mesh.shape[axis_name])
    if (model.nx + 1 + model.pad_planes) % npx:
        raise ShardError(
            "grid X extent must divide the device mesh "
            "(build with pad_x_multiple=n_devices)",
            [f"X={model.nx + 1 + model.pad_planes}", f"devices={npx}"],
        )
    if axis_name_y is not None:
        npy = int(mesh.shape[axis_name_y])
        if (model.ny + 1 + model.pad_rows) % npy:
            raise ShardError(
                "grid Y extent must divide the device mesh "
                "(build with pad_y_multiple=mesh.shape[axis_name_y])",
                [f"Y={model.ny + 1 + model.pad_rows}", f"devices={npy}"],
            )
    yspec = axis_name_y  # None on 1-D meshes => replicated along Y
    vec = NamedSharding(mesh, P(None, axis_name, yspec))  # (3, X, Y, Z)
    grid = NamedSharding(mesh, P(axis_name, yspec))  # (X, Y, Z)
    rep = NamedSharding(mesh, P())
    # homogeneous grids run the explicit shard_map + ppermute halo operator
    # (ops/structured_sharded.py) so the fused Pallas slab kernel executes
    # per shard; heterogeneous grids stay on the GSPMD corner-gather form,
    # with the MATERIAL CELL GRIDS sharded along X too (each chip holds
    # its slab of lam/mu; GSPMD inserts the one-plane halo exchange the
    # +/-1 element-view shifts need) — a replicated 50M-cell material
    # pair would cost ~400 MB of HBM per chip for nothing.  The cell axis
    # (nx) is one shorter than the padded node axis, so GSPMD pads the
    # last shard internally; correctness is pinned by
    # tests/test_sharding.py::test_heterogeneous_structured_sharded.
    model = dataclasses.replace(
        model, shard_mesh=mesh, shard_axis=axis_name,
        shard_axis_y=axis_name_y,
    )
    m_shard = dataclasses.replace(
        model,
        lam_grid=grid,
        mu_grid=grid,
        mass_grid=grid,
        bc_mask=vec,
        bc_value=vec,
        position0=rep,
    )
    s_shard = SimState(vec, vec, vec, vec)
    return (
        jax.device_put(model, m_shard),
        jax.device_put(state, s_shard),
        jax.device_put(external_force, vec),
    )


def shard_simulation(
    model: PackedModel,
    state: SimState,
    external_force: jax.Array,
    mesh: Mesh,
    axis_name: str = "shard",
) -> Tuple[PackedModel, SimState, jax.Array]:
    """device_put the packed pytrees with row shardings over ``mesh``.

    Requires padded_node_count and padded element counts to be divisible by the
    mesh size (use ``pad_nodes=8*n``, ``pad_elems=8*n`` when packing).
    """
    n = mesh.devices.size
    if (
        model.padded_tet_count % n
        or model.padded_hex_count % n
        or model.padded_node_count % n
    ):
        raise ShardError(
            "padded counts must divide the device-mesh size "
            "(pack with pad_nodes/pad_elems = 8 * n_devices)",
            [
                f"tets={model.padded_tet_count}",
                f"hexes={model.padded_hex_count}",
                f"nodes={model.padded_node_count}",
                f"devices={n}",
            ],
        )
    # Attach the banded halo-exchange plan when the mesh admits one
    # (single element type, bandwidth <= one node block): the matvec then
    # runs shard-locally with 2 small ppermutes instead of GSPMD's
    # implicit full-vector all-gathers (parallel/general_halo.py).
    # CIVIWAVE_GENERAL_HALO=0 forces pure GSPMD (A/B + fallback).
    import dataclasses
    import os

    if n > 1 and os.environ.get("CIVIWAVE_GENERAL_HALO", "auto") != "0":
        # (n == 1 keeps the single-chip path with its ADR-20 banded
        # windows — the halo tables would shadow them for no benefit)
        from .general_halo import plan_general_halo

        plan = plan_general_halo(model, n)
        if plan is not None:
            import jax.numpy as jnp

            model = dataclasses.replace(
                model,
                shard_mesh=mesh,
                shard_axis=axis_name,
                halo_block=plan["halo_block"],
                halo_local_nodes=plan["halo_local_nodes"],
                halo_ghost=plan["halo_ghost"],
                halo_elems=plan["halo_elems"],
                halo_conn=jnp.asarray(plan["halo_conn"]),
                halo_grads=jnp.asarray(plan["halo_grads"]),
                halo_vol=jnp.asarray(plan["halo_vol"]),
                halo_lam=jnp.asarray(plan["halo_lam"]),
                halo_mu=jnp.asarray(plan["halo_mu"]),
                halo_csr_idx=jnp.asarray(plan["halo_csr_idx"]),
                halo_csr_weight=jnp.asarray(plan["halo_csr_weight"]),
            )

    m_shard = model_shardings(model, mesh, axis_name)
    s_shard = state_shardings(mesh, axis_name)
    row = NamedSharding(mesh, P(axis_name))

    sharded_model = jax.device_put(model, m_shard)
    sharded_state = jax.device_put(state, s_shard)
    sharded_force = jax.device_put(external_force, row)
    return sharded_model, sharded_state, sharded_force
