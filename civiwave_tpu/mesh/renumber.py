"""Bandwidth-reducing node renumbering (reverse Cuthill-McKee) — ADR-32.

The fast general-path machinery is bandwidth-gated: the banded VMEM
gather windows (ADR-20, mesh/pack.py X_WINDOW_NODES / A_WINDOW_ROWS) and
the banded halo-exchange plan (ADR-30, parallel/general_halo.py) engage
only when every element's corner-node ids span a bounded window of the
node axis.  Synthetic boxes are numbered that way; real Gmsh output
frequently is not.  The reference's CSR gather is ordering-indifferent
(/root/reference/src/gpu/pcg.cpp:653-661) — it pays the same cost on any
numbering.  To match that robustness WITHOUT giving up the banded fast
paths, pack renumbers nodes with RCM whenever the mesh's native numbering
is strictly worse, and inverse-permutes at the host-facing edges
(``PackedModel.to_nodal``/``from_nodal`` — the single funnel through
which VTU frames, probe rows, the viewer's force injection, and stepper
accessors flow; checkpoints store internal-layout state and the
permutation is a pure function of the mesh, so resume is consistent).

``CIVIWAVE_RENUMBER=0`` is the escape hatch (identity numbering).

The node graph is the FEM connectivity graph: nodes adjacent iff they
share an element.  Built sparsely as ``B.T @ B`` from the (E, nl)
element-node incidence; scipy's ``reverse_cuthill_mckee`` (C
implementation) orders it.  Decision metric: lexicographic
(max element span, sum of element spans) — max span is what gates the
halo plan's ghost depth, the sum tracks window count.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

# Offset-pattern feasibility thresholds (ADR-33).  The oct gather plans
# need (a) few per-slot offset-pattern RUNS in min-corner-sorted element
# order (each run costs at least one chunk against pack's 64-chunk cap)
# and (b) element spans inside the x-window budget.
OCT_RUNS_OK = 48
OCT_WINDOW = 65536


def oct_pattern_runs(
    conn_blocks: Sequence[np.ndarray], perm: Optional[np.ndarray] = None
) -> int:
    """Max over blocks of the number of per-slot offset-pattern runs
    after sorting elements by min corner id — the chunk-count driver
    for the oct gather plans (ADR-33; mesh/pack._plan_oct_x_windows).
    A numbering with few runs lets ONE gathered 24-wide row per element
    replace 8 narrow row gathers."""
    worst = 0
    for conn in conn_blocks:
        if conn is None or not len(conn):
            continue
        c = perm[conn] if perm is not None else np.asarray(conn)
        emin = c.min(axis=1)
        order = np.argsort(emin, kind="stable")
        rel = c[order] - emin[order][:, None]
        runs = 1
        if len(rel) > 1:
            runs += int((rel[1:] != rel[:-1]).any(axis=1).sum())
        worst = max(worst, runs)
    return worst


def plan_geometric(positions: np.ndarray) -> Optional[np.ndarray]:
    """Coordinate-lexicographic numbering: sort nodes by quantized
    (slow, mid, fast) axis ranks with the fewest-distinct-values axes
    fastest.  On any grid-like mesh (whatever its file-order shuffle)
    this recovers a numbering whose element corner offsets are
    per-slot CONSTANT — the property the oct gathers need — where RCM's
    BFS level sets bound bandwidth but scramble offsets."""
    p = np.asarray(positions, dtype=np.float64)
    if p.ndim != 2 or p.shape[1] != 3 or not len(p):
        return None
    ranks = []
    counts = []
    for a in range(3):
        c = p[:, a]
        ext = float(c.max() - c.min())
        if ext <= 0.0:
            ranks.append(np.zeros(len(p), dtype=np.int64))
            counts.append(1)
            continue
        q = np.round((c - c.min()) / (ext * 1.0e-9))  # snap float noise
        _u, inv = np.unique(q, return_inverse=True)
        ranks.append(inv.astype(np.int64))
        counts.append(len(_u))
    fast, mid, slow = np.argsort(np.asarray(counts), kind="stable")
    order = np.lexsort((ranks[fast], ranks[mid], ranks[slow]))
    perm = np.empty(len(p), dtype=np.int64)
    perm[order] = np.arange(len(p), dtype=np.int64)
    return perm


def element_spans(
    conn_blocks: Sequence[np.ndarray], perm: Optional[np.ndarray] = None
) -> Tuple[int, int]:
    """(max, sum) of per-element corner-id spans under ``perm`` (identity
    when None).  Lower is better; max bounds the halo ghost depth."""
    worst = 0
    total = 0
    for conn in conn_blocks:
        if conn is None or not len(conn):
            continue
        c = perm[conn] if perm is not None else conn
        spans = c.max(axis=1) - c.min(axis=1)
        worst = max(worst, int(spans.max()))
        total += int(spans.sum())
    return worst, total


def plan_rcm(
    conn_blocks: Sequence[np.ndarray], node_count: int
) -> Optional[np.ndarray]:
    """RCM permutation ``perm[old_id] = new_id`` over the FEM node graph,
    or None when scipy is unavailable or the mesh has no elements."""
    try:
        from scipy import sparse
        from scipy.sparse.csgraph import reverse_cuthill_mckee
    except ImportError:  # pragma: no cover — scipy is in the image
        return None
    rows_l = []
    cols_l = []
    e_total = 0
    for conn in conn_blocks:
        if conn is None or not len(conn):
            continue
        e, nl = conn.shape
        rows_l.append(
            np.repeat(np.arange(e_total, e_total + e, dtype=np.int64), nl)
        )
        cols_l.append(conn.reshape(-1).astype(np.int64))
        e_total += e
    if not e_total:
        return None
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    incidence = sparse.coo_matrix(
        (np.ones(len(rows), dtype=np.int32), (rows, cols)),
        shape=(e_total, node_count),
    ).tocsr()
    adjacency = (incidence.T @ incidence).tocsr()
    order = reverse_cuthill_mckee(adjacency, symmetric_mode=True)
    perm = np.empty(node_count, dtype=np.int64)
    perm[np.asarray(order, dtype=np.int64)] = np.arange(
        node_count, dtype=np.int64
    )
    return perm


def plan_renumbering(
    conn_blocks: Sequence[np.ndarray],
    node_count: int,
    big_span: int = 4096,
    positions: Optional[np.ndarray] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(perm, inverse_perm) when a renumbering MATERIALLY improves the
    numbering, else None (keep the mesh's native order).

    Two candidates, tried in order of what they unlock (ADR-32/33):

    1. **Geometric** (coordinate-lex, needs ``positions``): chosen when
       the native numbering is NOT oct-regular but the geometric one is
       — it then re-enables the one-gather-per-element oct fast path
       (measured 2.8x on the matvec), which outranks any bandwidth
       delta.  A native numbering that is already oct-regular is never
       churned.
    2. **RCM**: the ADR-32 bandwidth rule — chosen when it at least
       halves the native max element span, or the native span exceeds
       ``big_span`` and RCM improves it at all.  Bounds the banded
       window budgets and the halo plan's ghost depth on meshes with no
       recoverable grid structure.

    ``perm[old_id] = new_id``; ``inverse_perm[new_id] = old_id``.
    Deterministic in the mesh alone, so checkpoint resume and multi-host
    packing agree on the layout.
    """
    if node_count <= 1:
        return None
    native = element_spans(conn_blocks)
    if native[0] <= 0:
        return None

    native_oct = (
        native[0] < OCT_WINDOW
        and oct_pattern_runs(conn_blocks) <= OCT_RUNS_OK
    )
    if not native_oct and positions is not None:
        geo = plan_geometric(positions)
        if geo is not None and len(geo) == node_count:
            geo_span = element_spans(conn_blocks, geo)
            if (
                geo_span[0] < OCT_WINDOW
                and oct_pattern_runs(conn_blocks, geo) <= OCT_RUNS_OK
            ):
                return geo, np.argsort(geo)

    perm = plan_rcm(conn_blocks, node_count)
    if perm is None:
        return None
    renumbered = element_spans(conn_blocks, perm)
    if renumbered[0] >= native[0]:
        return None
    if native[0] < 2 * renumbered[0] and native[0] <= big_span:
        return None
    return perm, np.argsort(perm)
