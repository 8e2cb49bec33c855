"""Device packing: mesh + preprocess + config -> JAX pytrees.

TPU-native replacement for /root/reference/src/mesh/pack.cpp:61-235.  The
reference packs SoA float vectors for Vulkan descriptor buffers; here the
product is two pytrees of jnp arrays:

* :class:`PackedModel` — time-invariant tables (connectivity, gradients,
  volumes, materials, masses, boundary conditions, assembly indices).
  These are the analogue of the 17 logical GPU buffers (buffers.cpp:67-96).
* :class:`SimState` — the evolving kinematic state (u, v, a) plus the PCG
  warm-start vector (solver.vector.x in the reference).

Layout design (performance-critical, measured on TPU v5e):

* **Element-type blocks.**  Tets and hexes get separate tables so each runs
  its optimal kernel: tet rows are (T, 4, 3) constant gradients; hex rows
  are (H, 8gp, 8node, 3) Gauss tables with per-gp volumes.  Nodal
  displacements are gathered ONCE per element (not per Gauss point) and gp
  forces are reduced per element before assembly — an 8x traffic saving
  over the flat quadrature-row layout for hexes.
* **Gather-based assembly (dual CSR).**  The scatter-add (segment_sum) is
  ~8x slower than a gather on TPU, so assembly uses the reference's own
  no-float-atomics idea (ke_gather_node.slang, docs/spec.md:35): a padded
  per-node incidence table ``csr_idx (N*, D)`` indexing into the
  concatenated per-element force rows, with 0/1 weights for padding.

Semantics preserved from the reference:
* fp64 -> fp32 conversion clamps to +/-FLT_MAX instead of producing inf
  (pack.cpp:41-57);
* connectivity padding: the reference pads with UINT32_MAX sentinels
  (pack.cpp:180-192); here padded slots point at node 0 with zero gradients
  so every gather/scatter stays in-bounds and contributes exact zeros;
* ``bc_mask`` is (N, 3) bool (the reference packs 3-bit masks,
  pack.cpp:159-175); ``bc_value`` holds per-axis targets;
* external force is assembled at ``load_time_seconds`` (pack.cpp:107-113).

TPU padding: node and element counts round up to ``pad_nodes``/``pad_elems``
multiples so arrays tile onto (8, 128) vregs and shard evenly over device
meshes.  Padded nodes are fully Dirichlet-constrained with zero targets and
zero mass — exact no-ops in the solver.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

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

# Banded-window planning for the general-path gathers (ADR-20).  XLA's row
# gather runs ~4x faster when the table operand is small enough for the
# memory assigner to stage in VMEM (~1-4 MB); windows above these sizes or
# meshes needing more than MAX_WINDOWS chunks fall back to the unwindowed
# gather (always correct, HBM-rate).
X_WINDOW_NODES = 65536  # x-gather window: rows of the (N*, 3) table
A_WINDOW_ROWS = 196608  # assembly window: rows of the force-row table
MAX_WINDOWS = 64

# Offset-pattern (oct) gather planning (ADR-33).  When every element in a
# chunk reads its corners at the SAME per-slot offsets from its min
# corner (true for box-like numberings), ONE gathered 24-wide row per
# element replaces 8 row gathers — measured 3.1x on the x-phase at 66^3.
# The assembly analogue gathers ONE 24-wide stream column per node.
OCT_X_WINDOW = 65536  # node rows per x-phase oct window
OCT_A_COLS = 65536  # stream columns per assembly oct table
OCT_MAX_WINDOWS = 64


def _plan_element_windows(
    conn: np.ndarray, e_pad: int, window: int
) -> tuple:
    """Greedy chunks of elements whose corner-node ids fit a ``window``-row
    span.  ``conn`` holds the REAL elements (sorted by min corner); padded
    elements [len(conn), e_pad) are appended to the last chunk (their conn
    rows are copies of the last real element).  Returns a tuple of
    (e_start, e_count, lo, size) or () when planning fails."""
    e = len(conn)
    if not e:
        return ()
    emin = conn.min(axis=1)
    emax = conn.max(axis=1)
    chunks = []
    i = 0
    while i < e:
        if len(chunks) >= MAX_WINDOWS:
            return ()
        runmax = np.maximum.accumulate(emax[i:])
        spans = runmax - emin[i]  # emin sorted => window lo = emin[i]
        fit = int(np.searchsorted(spans > window - 1, True))
        if fit == 0:  # single element exceeds the window
            return ()
        j = min(i + fit, e)
        lo = int(emin[i])
        size = int(runmax[j - i - 1]) + 1 - lo
        chunks.append([i, j - i, lo, size])
        i = j
    chunks[-1][1] += e_pad - e  # padded tail rides the last chunk
    return tuple(tuple(c) for c in chunks)


def _plan_assembly_windows(
    conn: np.ndarray, n_pad: int, rpe: int, window_rows: int
) -> tuple:
    """Greedy node chunks whose incident force rows fit a ``window_rows``
    span.  Elements are sorted by min corner, so per-node incident-element
    ranges are monotone-ish; nodes with no incidences inherit the running
    range.  Returns ((n_start, n_count, e_lo, e_count), ...) or ()."""
    e = len(conn)
    if not e:
        return ()
    nodes = conn.reshape(-1).astype(np.int64)
    elems = np.repeat(np.arange(e, dtype=np.int64), conn.shape[1])
    order = np.argsort(nodes, kind="stable")
    nodes_s = nodes[order]
    elems_s = elems[order]
    counts = np.bincount(nodes_s, minlength=n_pad)
    starts = np.zeros(n_pad, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    has = counts > 0
    emin = np.zeros(n_pad, dtype=np.int64)
    emax = np.zeros(n_pad, dtype=np.int64)
    idx = np.minimum(starts, len(elems_s) - 1)
    emin_r = np.minimum.reduceat(elems_s, idx)
    emax_r = np.maximum.reduceat(elems_s, idx)
    emin[has] = emin_r[has]
    emax[has] = emax_r[has]
    # forward-fill empty nodes with the previous real range so chunk spans
    # stay monotone (their weights are all zero — any in-window idx works)
    if not has.all():
        fill = np.where(has, np.arange(n_pad), -1)
        np.maximum.accumulate(fill, out=fill)
        first = int(np.argmax(has)) if has.any() else 0
        fill[fill < 0] = first if has.any() else 0
        emin = emin[np.maximum(fill, 0)]
        emax = emax[np.maximum(fill, 0)]
    window_elems = window_rows // rpe
    chunks = []
    i = 0
    while i < n_pad:
        if len(chunks) >= MAX_WINDOWS:
            return ()
        runmax = np.maximum.accumulate(emax[i:])
        runmin = np.minimum.accumulate(emin[i:])
        spans = runmax - runmin
        fit = int(np.searchsorted(spans > window_elems - 1, True))
        if fit == 0:
            return ()
        j = min(i + fit, n_pad)
        e_lo = int(runmin[j - i - 1])
        e_cnt = int(runmax[j - i - 1]) + 1 - e_lo
        chunks.append((i, j - i, e_lo, e_cnt))
        i = j
    return tuple(chunks)


def _plan_oct_x_windows(
    conn: np.ndarray, e_pad: int, window: int
) -> Tuple[tuple, Optional[np.ndarray]]:
    """Offset-pattern x-gather plan (ADR-33).

    Greedy element chunks in which EVERY element's per-slot corner
    offsets ``conn[e] - conn[e].min()`` equal the chunk's pattern, and
    the chunk's node reach fits a ``window``-row span.  Each chunk then
    gathers ONE row per element from a (L, nl*3) table built by
    concatenating ``nl`` shifted slices of the window.

    Returns ``(chunks, base)`` where chunks is a tuple of
    ``(e0, ec, lo, L, offs)`` — ``offs`` the per-slot offsets — and
    ``base`` the (e_pad,) per-element table row ``emin`` (global node
    ids; the apply subtracts the chunk ``lo``), or ``((), None)`` when
    the mesh's numbering is not offset-regular enough.
    """
    e = len(conn)
    if not e:
        return (), None
    emin = conn.min(axis=1).astype(np.int64)
    rel = conn - emin[:, None]  # (e, nl) per-slot offsets
    span = rel.max(axis=1)
    if int(span.max()) >= window:
        return (), None
    # pattern-change boundaries: any slot's offset differs from previous
    change = np.empty(e, dtype=bool)
    change[0] = True
    change[1:] = (rel[1:] != rel[:-1]).any(axis=1)
    chunks = []
    i = 0
    while i < e:
        if len(chunks) >= OCT_MAX_WINDOWS:
            return (), None
        offs = rel[i]
        sp = int(offs.max())
        # run of equal patterns starting at i
        nxt = np.flatnonzero(change[i + 1 :])
        run_end = i + 1 + (int(nxt[0]) if nxt.size else e - (i + 1))
        # window constraint: emin sorted => lo = emin[i]; reach is
        # emin[j-1] + sp
        lo = int(emin[i])
        fit = int(
            np.searchsorted(emin[i:run_end], lo + window - sp, side="left")
        )
        if fit == 0:
            return (), None
        j = i + fit
        size = int(emin[j - 1]) + sp + 1 - lo
        chunks.append([i, j - i, lo, size - sp, tuple(int(o) for o in offs)])
        i = j
    chunks[-1][1] += e_pad - e  # padded tail repeats the last real conn
    base = np.zeros(e_pad, dtype=np.int32)
    base[:e] = emin
    base[e:] = emin[e - 1] if e else 0
    return tuple(
        (c[0], c[1], c[2], c[3], c[4]) for c in chunks
    ), base


def _plan_oct_assembly(
    conn: np.ndarray, n_pad: int, e_pad: int, degree: int, cols: int
) -> Tuple[tuple, Optional[np.ndarray], Optional[np.ndarray]]:
    """Offset-pattern assembly plan (ADR-33).

    Finds ONE global incidence pattern ``((de_k, l_k), ...)`` — the
    modal pattern of full-degree nodes: node ``n``'s incident force
    contributions live at ``streams[l_k*3+b, a(n) + de_k]`` for a single
    per-node column ``a(n)``.  Assembly then gathers ONE 24-wide column
    per node from a per-chunk table of ``nl`` shifted stream triples.
    Lower-degree (boundary) nodes embed into the pattern with zero
    weights on unmatched slots.

    Returns ``(chunks, col, weights)``: chunks a tuple of
    ``(n0, ncnt, e_lo, L, pattern)``, ``col`` the (n_pad,) absolute
    column ``a(n)``, ``weights`` the (n_pad, K) slot weights; or
    ``((), None, None)`` when no single pattern covers the mesh.
    """
    e, nl = conn.shape if conn.size else (0, 0)
    if not e:
        return (), None, None
    nodes = conn.reshape(-1).astype(np.int64)
    elems = np.repeat(np.arange(e, dtype=np.int64), nl)
    slots = np.tile(np.arange(nl, dtype=np.int64), e)
    order = np.lexsort((slots, elems, nodes))
    ns, es, ls = nodes[order], elems[order], slots[order]
    counts = np.bincount(ns, minlength=n_pad)
    dmax = int(counts.max()) if counts.size else 0
    if dmax == 0 or dmax > degree:
        return (), None, None
    starts = np.zeros(n_pad, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])

    # pattern of the full-degree nodes: encode each node's incidence
    # list as (de*nl + l) rows relative to its min incident element
    full = np.flatnonzero(counts == dmax)
    if not full.size:
        return (), None, None
    fi = starts[full][:, None] + np.arange(dmax)[None, :]
    f_e = es[fi]
    f_l = ls[fi]
    f_de = f_e - f_e[:, :1]
    codes = f_de * nl + f_l  # (F, dmax) already sorted (e-major)
    uniq = np.unique(codes, axis=0)
    if len(uniq) > 1:
        return (), None, None  # full-degree nodes disagree: not oct-regular
    modal = uniq[0]
    pat_de = (modal // nl).astype(np.int64)
    pat_l = (modal % nl).astype(np.int64)
    span = int(pat_de.max())
    K = dmax

    # embed every node: find j such that every incidence (e_i, l_i)
    # matches a distinct pattern slot with e_i == j + de_k, l_i == l_k.
    # Candidate j from the FIRST incidence against each pattern slot
    # with the same corner slot l.
    col = np.zeros(n_pad, dtype=np.int64)
    weights = np.zeros((n_pad, K), dtype=np.float32)
    live = np.flatnonzero(counts > 0)
    if not live.size:
        return (), None, None
    li_starts = starts[live]
    li_counts = counts[live]
    first_e = es[li_starts]
    first_l = ls[li_starts]
    # pattern-slot lookup: for (de, l) -> slot k (dense table)
    lut = -np.ones((span + 1) * nl, dtype=np.int64)
    lut[pat_de * nl + pat_l] = np.arange(K)
    matched = np.zeros(live.size, dtype=bool)
    for k0 in range(K):
        # j if the first incidence sits at pattern slot k0; boundary
        # nodes routinely need NEGATIVE j (their earliest incidence
        # matches a high-offset slot) — the apply zero-pads the table
        # slices on both sides, and only zero-weight slots land in pads
        cand = first_e - pat_de[k0]
        ok = (~matched) & (first_l == pat_l[k0])
        idx_try = np.flatnonzero(ok)
        if not idx_try.size:
            continue
        good = np.ones(idx_try.size, dtype=bool)
        wk = np.zeros((idx_try.size, K), dtype=np.float32)
        for pos in range(dmax):
            has = li_counts[idx_try] > pos
            gi = li_starts[idx_try] + np.minimum(
                pos, li_counts[idx_try] - 1
            )
            de = es[gi] - cand[idx_try]
            l = ls[gi]
            inb = (de >= 0) & (de <= span)
            code = np.where(inb, de * nl + l, 0)
            kk = np.where(inb, lut[code], -1)
            slot_ok = (kk >= 0) | ~has
            good &= slot_ok
            kk_safe = np.maximum(kk, 0)
            rowsel = np.arange(idx_try.size)
            add = (has & (kk >= 0)).astype(np.float32)
            wk[rowsel, kk_safe] += add
        good &= (wk <= 1.0).all(axis=1)  # injective slot assignment
        hit = idx_try[good]
        matched[hit] = True
        col[live[hit]] = cand[hit]
        weights[live[hit]] = wk[good]
    if not matched.all():
        return (), None, None

    # empty nodes: forward-fill columns so chunk spans stay monotone
    # (their weights are all zero — any in-window column works)
    has = counts > 0
    if not has.all():
        fill = np.where(has, np.arange(n_pad), -1)
        np.maximum.accumulate(fill, out=fill)
        first = int(np.argmax(has))
        fill[fill < 0] = first
        col = col[fill]

    # greedy node chunks over col with an L-column table window
    L_max = cols - span
    if L_max <= 0:
        return (), None, None
    chunks = []
    i = 0
    while i < n_pad:
        if len(chunks) >= OCT_MAX_WINDOWS:
            return (), None, None
        runmax = np.maximum.accumulate(col[i:])
        runmin = np.minimum.accumulate(col[i:])
        spans = runmax - runmin
        fit = int(np.searchsorted(spans > L_max - 1, True))
        if fit == 0:
            return (), None, None
        j = min(i + fit, n_pad)
        e_lo = int(runmin[j - i - 1])
        L = int(runmax[j - i - 1]) + 1 - e_lo
        # slices whose columns overhang the padded element axis are
        # zero-padded by the apply (only zero-weight slots can land
        # there: a real incidence always references a real element)
        chunks.append(
            (
                i,
                j - i,
                e_lo,
                L,
                tuple(
                    (int(d), int(l)) for d, l in zip(pat_de, pat_l)
                ),
            )
        )
        i = j
    return tuple(chunks), col.astype(np.int32), weights


def clamp_to_f32(values: np.ndarray) -> np.ndarray:
    """fp64 -> fp32 with +/-FLT_MAX clamping (pack.cpp:41-57).

    Single-pass fast path: cast first, then repair only the (rare) entries
    that overflowed to inf from a finite f64 — at multi-GB table sizes the
    previous isfinite + clip + where pipeline cost 4 full f64 passes and
    ~17 s of the 524k-hex pack."""
    values = np.asarray(values)
    if values.dtype == np.float32:
        return values  # already in range by construction
    values = np.ascontiguousarray(values, dtype=np.float64)
    with np.errstate(over="ignore", invalid="ignore"):
        out = values.astype(np.float32)
    flat_out = out.reshape(-1)
    overflow = np.flatnonzero(np.isinf(flat_out))
    if overflow.size:
        src = values.reshape(-1)[overflow]
        finite = np.isfinite(src)  # keep real inf/nan verbatim
        flat_out[overflow[finite]] = np.sign(src[finite]).astype(
            np.float32
        ) * _FLT_MAX
    return out


def _round_up(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PackedModel:
    """Time-invariant device tables (element-type-blocked layout).

    Shapes use N* / T* / H* = padded node / tet / hex counts.  Padded conn
    slots point at node 0 with zero gradients (exact no-ops).  The assembly
    tables index into the concatenated force-row array
    ``concat(tet_forces.reshape(T*x4, 3), hex_forces.reshape(H*x8, 3))``.
    """

    # Element tables keep natural row shapes (streamed sequentially by the
    # chunked operators; ops/apply_keff.py's layout lesson records the
    # measured dead ends: flat-1-D scalar gathers and on-device gradient
    # recompute were both slower than streaming stored tables).
    # tet block (single quadrature point, constant gradients).  Gradients
    # are stored NODE-MAJOR TRANSPOSED — (4l, 3, T*) — for the same reason
    # as the hex tables below: the scalar-component operator reads each of
    # the 12 gradient components as a contiguous (T*,) stream.
    conn_tet: jax.Array  # (T*, 4) int32
    grads_tet: jax.Array  # (4l, 3, T*) f32
    vol_tet: jax.Array  # (T*,) f32
    lam_tet: jax.Array  # (T*,) f32
    mu_tet: jax.Array  # (T*,) f32
    mat_tet: jax.Array  # (T*,) int32
    # hex block (2x2x2 Gauss).  The gradient/volume tables are stored
    # GP-MAJOR TRANSPOSED — (8gp, 8l, 3, H*) / (8gp, H*) — so the
    # scalar-component operator (ops/apply_keff.hex_forces) slices
    # contiguous (H*,) component streams; element-major (H*, 8, 8, 3)
    # storage would turn each of the 192 component reads into a
    # 768-byte-stride scatter of 4-byte loads.
    conn_hex: jax.Array  # (H*, 8) int32
    grads_hex: jax.Array  # (8gp, 8l, 3, H*) f32
    vol_hex: jax.Array  # (8gp, H*) f32 — detJ per gp
    lam_hex: jax.Array  # (H*,) f32
    mu_hex: jax.Array  # (H*,) f32
    mat_hex: jax.Array  # (H*,) int32
    # gather-based assembly (dual CSR, fixed max degree D = csr_degree)
    csr_idx: jax.Array  # (N*, D) int32 — rows of the force-row array
    csr_weight: jax.Array  # (N*, D) f32 — 1 for real incidences, 0 for pads
    # per node
    position0: jax.Array  # (N*, 3) f32
    lumped_mass: jax.Array  # (N*,) f32
    bc_mask: jax.Array  # (N*, 3) bool
    bc_value: jax.Array  # (N*, 3) f32
    # per material
    lam: jax.Array  # (M,) f32
    mu: jax.Array  # (M,) f32
    stiffness_6x6: jax.Array  # (M, 6, 6) f32
    # Lysmer-Kuhlemeyer absorbing dashpots (physics/absorbing.py; None
    # when the scenario declares no absorbing groups).  damp_blocks is the
    # (N*, 6) sym-packed per-node C; damp_factor is the Newmark a1 scalar
    # the stepper injects per step (K_eff += a1 C) — None outside a step.
    damp_blocks: Optional[jax.Array] = None
    damp_factor: Optional[jax.Array] = None
    # banded halo-exchange tables (parallel/general_halo.py; attached by
    # shard_simulation when the mesh is plannable, None on single-chip
    # models).  Element tables are per-shard padded copies with LOCAL
    # node indices; the CSR covers L+G rows per shard over local force
    # rows.  The GSPMD tables above stay resident for the preconditioner
    # build and fallback paths.
    halo_conn: Optional[jax.Array] = None  # (S*E_s, nl) int32 local
    halo_grads: Optional[jax.Array] = None  # tet (4,3,S*E_s) / hex gp-major
    halo_vol: Optional[jax.Array] = None  # (S*E_s,) / (8, S*E_s)
    halo_lam: Optional[jax.Array] = None  # (S*E_s,)
    halo_mu: Optional[jax.Array] = None  # (S*E_s,)
    halo_csr_idx: Optional[jax.Array] = None  # (S*(L+G), D) int32 local
    halo_csr_weight: Optional[jax.Array] = None  # (S*(L+G), D) f32
    # RCM node renumbering (mesh/renumber.py, ADR-32; None = identity).
    # perm_new_of_old[old_id] = internal id; perm_old_of_new inverts it.
    # Both are padded to N* with an identity tail so they row-shard with
    # the node axis; to_nodal/from_nodal translate at the host edges.
    perm_new_of_old: Optional[jax.Array] = None  # (N*,) int32
    perm_old_of_new: Optional[jax.Array] = None  # (N*,) int32
    # offset-pattern (oct) gather tables (ADR-33; None/() = not planned).
    # oct_base_*: per-element table row (the element's min corner id);
    # oa_col: per-node absolute stream column; oa_w: per-node pattern-
    # slot weights (0 = unmatched/boundary slot).
    oct_base_tet: Optional[jax.Array] = None  # (T*,) int32
    oct_base_hex: Optional[jax.Array] = None  # (H*,) int32
    oa_col: Optional[jax.Array] = None  # (N*,) int32
    oa_w: Optional[jax.Array] = None  # (N*, K) f32
    # static metadata
    node_count: int = field(metadata=dict(static=True), default=0)
    padded_node_count: int = field(metadata=dict(static=True), default=0)
    tet_count: int = field(metadata=dict(static=True), default=0)
    padded_tet_count: int = field(metadata=dict(static=True), default=0)
    hex_count: int = field(metadata=dict(static=True), default=0)
    padded_hex_count: int = field(metadata=dict(static=True), default=0)
    element_count: int = field(metadata=dict(static=True), default=0)
    csr_degree: int = field(metadata=dict(static=True), default=8)
    # static gate for the absorbing term (False = zero-cost legacy path)
    has_damping: bool = field(metadata=dict(static=True), default=False)
    # banded gather windows (ADR-20); () = unwindowed fallback.  Elements
    # are pack-sorted by min corner node so corner ids per chunk span a
    # bounded window of the x table, and per-node incident rows span a
    # bounded window of the force-row table.
    xw_tet: tuple = field(metadata=dict(static=True), default=())
    xw_hex: tuple = field(metadata=dict(static=True), default=())
    # assembly windows ((n_start, n_count, e_lo, e_count), ...) — planned
    # only for single-element-type meshes (rows of one block)
    aw: tuple = field(metadata=dict(static=True), default=())
    # oct plans (ADR-33): x chunks (e0, ec, lo, L, offs); assembly
    # chunks (n0, ncnt, e_lo, L, pattern of (de, l) pairs)
    xo_tet: tuple = field(metadata=dict(static=True), default=())
    xo_hex: tuple = field(metadata=dict(static=True), default=())
    oa_oct: tuple = field(metadata=dict(static=True), default=())
    # halo-plan statics (parallel/general_halo.py; shard_mesh mirrors the
    # StructuredModel pattern — the Mesh handle rides the treedef)
    shard_mesh: Optional[object] = field(
        metadata=dict(static=True), default=None
    )
    shard_axis: str = field(metadata=dict(static=True), default="shard")
    halo_block: str = field(metadata=dict(static=True), default="")
    halo_local_nodes: int = field(metadata=dict(static=True), default=0)
    halo_ghost: int = field(metadata=dict(static=True), default=0)
    halo_elems: int = field(metadata=dict(static=True), default=0)

    @property
    def dof_count(self) -> int:
        return self.node_count * 3

    @property
    def force_row_count(self) -> int:
        return self.padded_tet_count * 4 + self.padded_hex_count * 8

    # --- operator protocol (shared with StructuredModel) ------------------
    # Models own their solver-vector layout: PackedModel vectors are
    # (N*, 3) nodal rows; StructuredModel vectors are component-separated
    # (3, X, Y, Z) grids.  The PCG/Newmark stack is layout-agnostic and
    # reaches layout-dependent pieces only through this protocol.
    @property
    def vector_shape(self) -> Tuple[int, ...]:
        return (self.padded_node_count, 3)

    @property
    def mass_b(self) -> jax.Array:
        """Lumped mass broadcastable against solver vectors."""
        return self.lumped_mass[:, None]

    def zero_state(self) -> "SimState":
        z = jnp.zeros(self.vector_shape, jnp.float32)
        return SimState(z, z, z, z)

    @property
    def renumbered(self) -> bool:
        """Whether pack applied an RCM node permutation (ADR-32)."""
        return self.perm_new_of_old is not None

    def to_nodal(self, vector: jax.Array) -> jax.Array:
        """Solver vector -> (node_count, 3) nodal rows in the MESH's
        original node order (inverse-permuting any RCM renumbering)."""
        if self.perm_new_of_old is not None:
            vector = vector[self.perm_new_of_old]
        return vector[: self.node_count]

    def from_nodal(self, rows) -> jax.Array:
        """(node_count, 3) rows in original mesh order -> solver vector."""
        rows = jnp.asarray(rows, jnp.float32)[: self.node_count]
        full = (
            jnp.zeros(self.vector_shape, jnp.float32)
            .at[: self.node_count]
            .set(rows)
        )
        if self.perm_old_of_new is not None:
            full = full[self.perm_old_of_new]
        return full

    def apply_keff(self, x, stiffness_scale, mass_factor):
        if self.halo_conn is not None and self.shard_mesh is not None:
            from ..ops.general_sharded import apply_keff_general_sharded

            return apply_keff_general_sharded(
                self, x, stiffness_scale, mass_factor
            )
        from ..ops import apply_keff as _ops

        return _ops.apply_keff(self, x, stiffness_scale, mass_factor)

    def assemble_node_blocks(self, stiffness_scale, mass_factor):
        from ..ops import block_jacobi as _ops

        return _ops.assemble_node_blocks(self, stiffness_scale, mass_factor)

    def build_preconditioner(self, stiffness_scale, mass_factor):
        from ..ops import block_jacobi as _ops

        return _ops.build_block_jacobi_inverse(
            self, stiffness_scale, mass_factor
        )

    def apply_preconditioner(self, block_inverse, residual):
        from ..ops import block_jacobi as _ops

        return _ops.apply_preconditioner(self, block_inverse, residual)

    def apply_pc_keff(self, block_inverse, residual, stiffness_scale,
                      mass_factor):
        """(u, w) = (M^-1 r, K_eff u) — plain composition on the general
        path; the structured model overrides this with a fused kernel."""
        u = self.apply_preconditioner(block_inverse, residual)
        return u, self.apply_keff(u, stiffness_scale, mass_factor)

    def absorbing_force(self, v: jax.Array) -> jax.Array:
        """C v from the Lysmer-Kuhlemeyer dashpots, zeroed on constrained
        axes (zero array when the scenario has no absorbing boundaries) —
        the damping-force contribution the Newmark RHS adds as
        C (a1 u + a4 v + a5 a), mirroring the reference's Rayleigh mass
        term shape (newmark.cpp:102-133)."""
        if not self.has_damping:
            return jnp.zeros_like(v)
        from ..physics.absorbing import sym_apply

        return jnp.where(self.bc_mask, 0.0, sym_apply(self.damp_blocks, v))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SimState:
    """Evolving kinematic state + PCG warm-start vector, all (N*, 3) f32."""

    displacement: jax.Array
    velocity: jax.Array
    acceleration: jax.Array
    warm_x: jax.Array  # previous PCG solution (solver.vector.x)


def zero_state(model) -> SimState:
    """Zero kinematic state in the model's vector layout."""
    return model.zero_state()


def _build_dual_csr(
    conn_tet: np.ndarray,
    conn_hex: np.ndarray,
    t_pad: int,
    n_pad: int,
    pad_degree: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-node incidence table into the concatenated force-row array.

    Force rows: tet element e slot l -> row e*4 + l; hex element e slot l
    -> row t_pad*4 + e*8 + l.  Padded entries index row 0 with weight 0.
    """
    entries_nodes = []
    entries_rows = []
    if conn_tet.size:
        t = conn_tet.shape[0]
        rows = (
            np.arange(t, dtype=np.int64)[:, None] * 4
            + np.arange(4, dtype=np.int64)[None, :]
        )
        entries_nodes.append(conn_tet.reshape(-1).astype(np.int64))
        entries_rows.append(rows.reshape(-1))
    if conn_hex.size:
        h = conn_hex.shape[0]
        rows = (
            t_pad * 4
            + np.arange(h, dtype=np.int64)[:, None] * 8
            + np.arange(8, dtype=np.int64)[None, :]
        )
        entries_nodes.append(conn_hex.reshape(-1).astype(np.int64))
        entries_rows.append(rows.reshape(-1))

    if entries_nodes:
        nodes = np.concatenate(entries_nodes)
        rows = np.concatenate(entries_rows)
    else:
        nodes = np.zeros(0, np.int64)
        rows = np.zeros(0, np.int64)

    counts = np.bincount(nodes, minlength=n_pad)
    max_degree = int(counts.max()) if counts.size else 0
    degree = max(_round_up(max(max_degree, 1), pad_degree), pad_degree)

    csr_idx = np.zeros((n_pad, degree), dtype=np.int32)
    csr_weight = np.zeros((n_pad, degree), dtype=np.float32)
    order = np.argsort(nodes, kind="stable")
    nodes_sorted = nodes[order]
    rows_sorted = rows[order]
    offsets = np.zeros(n_pad + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    # vectorized ragged fill: position within each node's run
    position = np.arange(len(nodes_sorted)) - offsets[nodes_sorted]
    csr_idx[nodes_sorted, position] = rows_sorted.astype(np.int32)
    csr_weight[nodes_sorted, position] = 1.0
    return csr_idx, csr_weight


def build_packed_model(
    mesh: Mesh,
    preprocess: PreprocessOutputs,
    cfg: Config,
    materials: Sequence[ElasticProperties],
    pad_nodes: int = 8,
    pad_elems: int = 8,
) -> Tuple[PackedModel, SimState, jax.Array]:
    """Pack everything for device residency (pack.cpp:61-235).

    Returns (model, initial_state, external_force) where external_force is
    the (N*, 3) f32 load vector at t=0.
    """
    if pad_nodes < 1 or pad_elems < 1:
        raise PackError("padding multiples must be >= 1", ["PackingParameters"])

    n = mesh.node_count
    if n != preprocess.lumped_mass.shape[0]:
        raise PackError(
            "preprocess lumped mass count mismatches mesh nodes",
            ["nodes", str(n), "lumped_mass", str(preprocess.lumped_mass.shape[0])],
        )

    n_pad = _round_up(max(n, 1), pad_nodes)

    # --- RCM node renumbering (ADR-32) -----------------------------------
    # Applied only when it strictly tightens the element-span metric the
    # banded windows and halo plan are gated on; identity (None) keeps the
    # mesh's native order at zero cost.  CIVIWAVE_RENUMBER=0 disables.
    perm = iperm = None
    if os.environ.get("CIVIWAVE_RENUMBER", "auto") != "0" and n > 1:
        from .renumber import plan_renumbering

        tet_rows = preprocess.tet_connectivity[:, :4]
        pair = plan_renumbering(
            [tet_rows, preprocess.hex_connectivity],
            n,
            positions=mesh.node_positions,
        )
        if pair is not None:
            perm, iperm = pair

    def _pnode(arr: np.ndarray) -> np.ndarray:
        """Original-order per-node rows -> internal (renumbered) order."""
        return arr if iperm is None else arr[iperm]

    # --- per-node tables -------------------------------------------------
    position0 = np.zeros((n_pad, 3), dtype=np.float32)
    position0[:n] = _pnode(clamp_to_f32(mesh.node_positions))

    lumped_mass = np.zeros(n_pad, dtype=np.float32)
    lumped_mass[:n] = _pnode(clamp_to_f32(preprocess.lumped_mass))

    dirichlet = oracle.build_dirichlet_conditions(mesh, cfg)
    bc_mask = np.zeros((n_pad, 3), dtype=bool)
    bc_mask[:n] = _pnode(dirichlet.mask.reshape(n, 3))
    bc_mask[n:] = True  # padded nodes are fully constrained no-ops
    bc_value = np.zeros((n_pad, 3), dtype=np.float32)
    bc_value[:n] = _pnode(clamp_to_f32(dirichlet.targets.reshape(n, 3)))

    # Lysmer-Kuhlemeyer absorbing dashpots (extension; None when the YAML
    # declares no boundaries.absorbing groups)
    from ..physics import absorbing as absorbing_mod

    damp_np = absorbing_mod.assemble_dashpots(mesh, preprocess, cfg, materials)
    if damp_np is not None:
        padded = np.zeros((n_pad, 6), dtype=np.float32)
        padded[:n] = _pnode(clamp_to_f32(damp_np))
        damp_blocks = jnp.asarray(padded)
    else:
        damp_blocks = None

    load = loads_mod.assemble_load_vector(mesh, cfg, preprocess, 0.0)
    external_force = np.zeros((n_pad, 3), dtype=np.float32)
    external_force[:n] = _pnode(clamp_to_f32(load))

    # --- element blocks ----------------------------------------------------
    lam_np, mu_np, d_np = material_tables(materials)

    is_tet = mesh.element_node_counts == 4
    is_hex = mesh.element_node_counts == 8
    tet_elems = np.nonzero(is_tet)[0]
    hex_elems = np.nonzero(is_hex)[0]
    t, h = tet_elems.size, hex_elems.size
    # large element blocks align to the Pallas streaming-kernel block
    # (ops/pallas/element_forces.BLOCK_ELEMS) so the force phase can run
    # on-kernel; dead padded elements are exact no-ops (zero gradients)
    from ..ops.pallas.element_forces import BLOCK_ELEMS

    def _elem_pad(count: int) -> int:
        if not count:
            return 0
        if count >= BLOCK_ELEMS:
            return _round_up(count, max(pad_elems, BLOCK_ELEMS))
        return _round_up(count, pad_elems)

    t_pad = _elem_pad(t)
    h_pad = _elem_pad(h)

    # preprocess emits element-type-blocked tables (tet block + gp-major
    # hex block) — see mesh/preprocess.py PreprocessOutputs
    conn_tet = np.zeros((t_pad, 4), dtype=np.int32)
    grads_tet = np.zeros((4, 3, t_pad), dtype=np.float32)
    vol_tet = np.zeros(t_pad, dtype=np.float32)
    lam_tet = np.zeros(t_pad, dtype=np.float32)
    mu_tet = np.zeros(t_pad, dtype=np.float32)
    mat_tet = np.zeros(t_pad, dtype=np.int32)
    if t:
        rows = preprocess.tet_connectivity
        rows = np.where(rows[:, :4] == SENTINEL, 0, rows[:, :4])
        if perm is not None:
            rows = perm[rows].astype(np.int32)
        # sort by min corner node: bounds the per-chunk node window for
        # the banded x-gather and keeps per-node incident rows local for
        # the banded assembly (ADR-20); internal order only
        order = np.argsort(rows.min(axis=1), kind="stable")
        conn_tet[:t] = rows[order]
        conn_tet[t:] = conn_tet[t - 1] if t else 0  # pad inside the window
        grads_tet[:, :, :t] = clamp_to_f32(
            preprocess.tet_gradients[order]
        ).transpose(1, 2, 0)
        vol_tet[:t] = clamp_to_f32(preprocess.tet_volume[order])
        mat_idx = preprocess.tet_material[order]
        mat_tet[:t] = mat_idx
        lam_tet[:t] = clamp_to_f32(lam_np[mat_idx])
        mu_tet[:t] = clamp_to_f32(mu_np[mat_idx])

    conn_hex = np.zeros((h_pad, 8), dtype=np.int32)
    grads_hex = np.zeros((8, 8, 3, h_pad), dtype=np.float32)
    vol_hex = np.zeros((8, h_pad), dtype=np.float32)
    lam_hex = np.zeros(h_pad, dtype=np.float32)
    mu_hex = np.zeros(h_pad, dtype=np.float32)
    mat_hex = np.zeros(h_pad, dtype=np.int32)
    if h:
        rows = preprocess.hex_connectivity
        rows = np.where(rows == SENTINEL, 0, rows)
        if perm is not None:
            rows = perm[rows].astype(np.int32)
        order = np.argsort(rows.min(axis=1), kind="stable")
        conn_hex[:h] = rows[order]
        conn_hex[h:] = conn_hex[h - 1] if h else 0  # pad inside the window
        # preprocess emits hex gradients directly in the gp-major device
        # layout — no element-major materialization or transpose at scale
        grads_hex[:, :, :, :h] = clamp_to_f32(
            preprocess.hex_gradients_gp[:, :, :, order]
        )
        vol_hex[:, :h] = clamp_to_f32(preprocess.hex_detj[:, order])
        mat_idx = preprocess.hex_material[order]
        mat_hex[:h] = mat_idx
        lam_hex[:h] = clamp_to_f32(lam_np[mat_idx])
        mu_hex[:h] = clamp_to_f32(mu_np[mat_idx])

    # padded-element conn repeats the last real element with zero
    # volume/gradients (exact no-ops that stay inside gather windows);
    # restrict CSR to REAL incidences only
    csr_idx, csr_weight = _build_dual_csr(
        conn_tet[:t] if t else np.zeros((0, 4), np.int32),
        conn_hex[:h] if h else np.zeros((0, 8), np.int32),
        t_pad,
        n_pad,
    )

    # --- banded gather windows (ADR-20) ------------------------------------
    xw_tet = _plan_element_windows(conn_tet[:t], t_pad, X_WINDOW_NODES) if t else ()
    xw_hex = _plan_element_windows(conn_hex[:h], h_pad, X_WINDOW_NODES) if h else ()

    # --- offset-pattern (oct) plans (ADR-33) --------------------------------
    oct_xwin = int(os.environ.get("CIVIWAVE_OCT_XWIN", OCT_X_WINDOW))
    oct_acols = int(os.environ.get("CIVIWAVE_OCT_ACOLS", OCT_A_COLS))
    xo_tet, oct_base_tet = (
        _plan_oct_x_windows(conn_tet[:t], t_pad, oct_xwin)
        if t
        else ((), None)
    )
    xo_hex, oct_base_hex = (
        _plan_oct_x_windows(conn_hex[:h], h_pad, oct_xwin)
        if h
        else ((), None)
    )
    oa_oct, oa_col, oa_w = (), None, None
    if bool(t) != bool(h):
        oa_oct, oa_col, oa_w = _plan_oct_assembly(
            conn_tet[:t] if t else conn_hex[:h],
            n_pad,
            t_pad if t else h_pad,
            int(csr_idx.shape[1]),
            oct_acols,
        )

    aw = ()
    if bool(t) != bool(h):  # single element type: rows come from one block
        rpe = 4 if t else 8
        conn_real = conn_tet[:t] if t else conn_hex[:h]
        aw = _plan_assembly_windows(conn_real, n_pad, rpe, A_WINDOW_ROWS)
        if aw:
            # padded CSR slots point at their chunk's first row so every
            # gathered index is window-local (weights are zero)
            for n0, ncnt, e_lo, _e_cnt in aw:
                pad_slots = csr_weight[n0 : n0 + ncnt] == 0.0
                csr_idx[n0 : n0 + ncnt][pad_slots] = e_lo * rpe

    if perm is not None:
        perm_pad = np.arange(n_pad, dtype=np.int32)
        perm_pad[:n] = perm
        iperm_pad = np.arange(n_pad, dtype=np.int32)
        iperm_pad[:n] = iperm
        perm_new_of_old = jnp.asarray(perm_pad)
        perm_old_of_new = jnp.asarray(iperm_pad)
    else:
        perm_new_of_old = perm_old_of_new = None

    model = PackedModel(
        perm_new_of_old=perm_new_of_old,
        perm_old_of_new=perm_old_of_new,
        conn_tet=jnp.asarray(conn_tet),
        grads_tet=jnp.asarray(grads_tet),
        vol_tet=jnp.asarray(vol_tet),
        lam_tet=jnp.asarray(lam_tet),
        mu_tet=jnp.asarray(mu_tet),
        mat_tet=jnp.asarray(mat_tet),
        conn_hex=jnp.asarray(conn_hex),
        grads_hex=jnp.asarray(grads_hex),
        vol_hex=jnp.asarray(vol_hex),
        lam_hex=jnp.asarray(lam_hex),
        mu_hex=jnp.asarray(mu_hex),
        mat_hex=jnp.asarray(mat_hex),
        csr_idx=jnp.asarray(csr_idx),
        csr_weight=jnp.asarray(csr_weight),
        position0=jnp.asarray(position0),
        lumped_mass=jnp.asarray(lumped_mass),
        bc_mask=jnp.asarray(bc_mask),
        bc_value=jnp.asarray(bc_value),
        lam=jnp.asarray(clamp_to_f32(lam_np)),
        mu=jnp.asarray(clamp_to_f32(mu_np)),
        stiffness_6x6=jnp.asarray(clamp_to_f32(d_np)),
        damp_blocks=damp_blocks,
        has_damping=damp_blocks is not None,
        node_count=n,
        padded_node_count=n_pad,
        tet_count=t,
        padded_tet_count=t_pad,
        hex_count=h,
        padded_hex_count=h_pad,
        element_count=mesh.element_count,
        csr_degree=int(csr_idx.shape[1]),
        xw_tet=xw_tet,
        xw_hex=xw_hex,
        aw=aw,
        xo_tet=xo_tet if xo_tet and oct_base_tet is not None else (),
        xo_hex=xo_hex if xo_hex and oct_base_hex is not None else (),
        oct_base_tet=(
            jnp.asarray(oct_base_tet)
            if xo_tet and oct_base_tet is not None
            else None
        ),
        oct_base_hex=(
            jnp.asarray(oct_base_hex)
            if xo_hex and oct_base_hex is not None
            else None
        ),
        oa_oct=oa_oct if oa_oct else (),
        oa_col=jnp.asarray(oa_col) if oa_oct else None,
        oa_w=jnp.asarray(oa_w) if oa_oct else None,
    )
    return model, zero_state(model), jnp.asarray(external_force)
