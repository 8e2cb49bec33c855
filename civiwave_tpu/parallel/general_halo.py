"""Banded halo-exchange plan for the general (unstructured Gmsh) path.

The GSPMD row sharding in :mod:`parallel.sharding` is correct at any
mesh, but its implicit lowering all-gathers the full displacement vector
into every chip's element gather and re-distributes the scattered force
rows — O(N) bytes over ICI per matvec.  This planner exploits the SAME
structural fact ADR-20's banded windows do: pack sorts elements by min
corner node, so a contiguous block partition of the node axis induces a
contiguous element partition whose cross-shard reach is bounded by the
mesh's node bandwidth B:

* nodes split into S contiguous blocks of L = N*/S rows (the pack's
  ``pad_nodes = 8*n_devices`` already makes this exact);
* element e (sorted by min corner) belongs to the shard owning its min
  corner — a contiguous range per shard, padded to the max count E_s
  with dead rows (zero gradients/volume = exact no-ops);
* every node an element touches lies in [own block, own block + G) where
  G = max over shards of the overhang past the block end, G <= B.

One matvec then needs exactly TWO neighbor permutes (the FEM analogue of
ring halo exchange, same protocol as the structured X-slab path in
ops/structured_sharded.py):

1. receive the +1 neighbor's first G sanitized displacement rows
   (``ppermute`` backward) — the element gather reads only
   [s*L, (s+1)*L + G);
2. assemble per shard over L+G node rows from the shard's OWN force rows
   (each (node, element) incidence lives on exactly one shard), then
   send the G ghost-row partial sums forward and add — the owner-computes
   combination ke_gather_node.slang's atomic-free gather implies once
   nodes are partitioned (SURVEY.md section 5).

Everything else in the PCG iteration (preconditioner apply, axpys, f64
dots -> psum) stays GSPMD row-sharded.  A second win rides along: the
per-shard gather tables (x window (L+G) x 3, force rows E_s*rpe x 3)
shrink with S toward the ~1-4 MB VMEM-residency regime where XLA's
gather runs 2-4x the HBM rate (ADR-20) — sharding restores the table
residence the single-chip general path lost at multi-M DOF.

Planning falls back to pure GSPMD (returns None) when: the mesh mixes
tet and hex blocks, counts do not divide the shard count, the bandwidth
exceeds one block (G > L, e.g. a pathological node ordering), or a
shard-local node exceeds the global CSR degree (cannot happen — a
shard's incidences are a subset of the global node's — but asserted).

Reference analogue being replaced: /root/reference/src/gpu/sharding.cpp
(single-device <=2 GiB buffer splitting) had no multi-device story; the
TPU rebuild's north star (BASELINE config #4, "1M-DOF sharded EBE matvec
with halo exchange on v5e-8") is exactly this plan.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _round_up(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


def plan_general_halo(model, n_shards: int) -> Optional[dict]:
    """Numpy halo plan for a single-element-type PackedModel.

    Returns the halo table set (numpy arrays + static ints) or None when
    the model cannot be planned (caller stays on pure GSPMD).
    """
    if n_shards < 1:
        return None
    has_tet = bool(model.padded_tet_count)
    has_hex = bool(model.padded_hex_count)
    if has_tet == has_hex:  # mixed or empty: fall back
        return None
    block = "tet" if has_tet else "hex"
    n_pad = int(model.padded_node_count)
    if n_pad % n_shards:
        return None
    L = n_pad // n_shards

    if block == "tet":
        conn_g = np.asarray(model.conn_tet)
        grads_g = np.asarray(model.grads_tet)  # (4, 3, T*)
        vol_g = np.asarray(model.vol_tet)  # (T*,)
        lam_g = np.asarray(model.lam_tet)
        mu_g = np.asarray(model.mu_tet)
        e_real = int(model.tet_count)
        nl = 4
    else:
        conn_g = np.asarray(model.conn_hex)
        grads_g = np.asarray(model.grads_hex)  # (8, 8, 3, H*)
        vol_g = np.asarray(model.vol_hex)  # (8, H*)
        lam_g = np.asarray(model.lam_hex)
        mu_g = np.asarray(model.mu_hex)
        e_real = int(model.hex_count)
        nl = 8
    e_pad = conn_g.shape[0]
    if not e_pad:
        return None

    emin = conn_g.min(axis=1).astype(np.int64)
    emax = conn_g.max(axis=1).astype(np.int64)
    if np.any(np.diff(emin) < 0):
        return None  # pack guarantees min-corner sort; bail if violated

    bounds = np.searchsorted(emin, np.arange(n_shards + 1) * L).astype(
        np.int64
    )
    counts = np.diff(bounds)
    ghost = 0
    for s in range(n_shards):
        if counts[s]:
            reach = int(emax[bounds[s] : bounds[s + 1]].max())
            ghost = max(ghost, reach - ((s + 1) * L - 1))
    ghost = max(ghost, 0)
    if ghost > L:
        return None  # bandwidth exceeds one block: halo protocol invalid

    e_s = int(counts.max())
    if e_s == 0:
        return None
    # align to the Pallas element-kernel block when the shard is large
    # enough to use it (same rule as pack's _elem_pad)
    from ..ops.pallas.element_forces import BLOCK_ELEMS

    if e_s >= BLOCK_ELEMS:
        e_s = _round_up(e_s, BLOCK_ELEMS)

    degree = int(model.csr_degree)
    halo_conn = np.zeros((n_shards * e_s, nl), dtype=np.int32)
    halo_grads = np.zeros(grads_g.shape[:-1] + (n_shards * e_s,), np.float32)
    halo_vol = np.zeros(vol_g.shape[:-1] + (n_shards * e_s,), np.float32)
    halo_lam = np.zeros(n_shards * e_s, dtype=np.float32)
    halo_mu = np.zeros(n_shards * e_s, dtype=np.float32)
    halo_csr_idx = np.zeros((n_shards * (L + ghost), degree), np.int32)
    halo_csr_w = np.zeros((n_shards * (L + ghost), degree), np.float32)

    for s in range(n_shards):
        b0, b1 = int(bounds[s]), int(bounds[s + 1])
        cnt = b1 - b0
        if not cnt:
            continue
        lo = s * L
        base_e = s * e_s
        halo_conn[base_e : base_e + cnt] = conn_g[b0:b1] - lo
        halo_grads[..., base_e : base_e + cnt] = grads_g[..., b0:b1]
        halo_vol[..., base_e : base_e + cnt] = vol_g[..., b0:b1]
        halo_lam[base_e : base_e + cnt] = lam_g[b0:b1]
        halo_mu[base_e : base_e + cnt] = mu_g[b0:b1]
        # CSR over the shard's REAL elements only (padded global rows
        # repeat the last real conn but carry zero gradients/volume)
        r1 = min(b1, e_real)
        if r1 <= b0:
            continue
        cl = conn_g[b0:r1].astype(np.int64) - lo
        nodes = cl.reshape(-1)
        rows_local = (
            np.arange(r1 - b0, dtype=np.int64)[:, None] * nl
            + np.arange(nl, dtype=np.int64)[None, :]
        ).reshape(-1)
        order = np.argsort(nodes, kind="stable")
        ns, rs = nodes[order], rows_local[order]
        slot = np.arange(len(ns)) - np.searchsorted(ns, ns)
        if slot.size and int(slot.max()) >= degree:
            return None  # cannot happen (subset of global incidences)
        base_n = s * (L + ghost)
        halo_csr_idx[base_n + ns, slot] = rs
        halo_csr_w[base_n + ns, slot] = 1.0

    return dict(
        halo_block=block,
        halo_local_nodes=L,
        halo_ghost=ghost,
        halo_elems=e_s,
        halo_conn=halo_conn,
        halo_grads=halo_grads,
        halo_vol=halo_vol,
        halo_lam=halo_lam,
        halo_mu=halo_mu,
        halo_csr_idx=halo_csr_idx,
        halo_csr_weight=halo_csr_w,
    )
