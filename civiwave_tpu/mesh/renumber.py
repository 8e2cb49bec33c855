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
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(perm, inverse_perm) when RCM MATERIALLY improves the max element
    span, else None (keep the mesh's native numbering).

    "Material" means the RCM max span at least halves the native one, or
    the native span exceeds ``big_span`` (the regime where the absolute
    bandwidth starts threatening the window budgets / per-shard halo
    blocks) and RCM improves it at all.  Marginal reshuffles of
    already-banded numberings (synthetic boxes, well-ordered Gmsh output)
    are deliberately skipped: the banded machinery engages either way, so
    re-laying-out every table would churn layouts for zero perf gain.

    ``perm[old_id] = new_id``; ``inverse_perm[new_id] = old_id``.
    Deterministic in the mesh alone, so checkpoint resume and multi-host
    packing agree on the layout.
    """
    if node_count <= 1:
        return None
    native = element_spans(conn_blocks)
    if native[0] <= 0:
        return None
    perm = plan_rcm(conn_blocks, node_count)
    if perm is None:
        return None
    renumbered = element_spans(conn_blocks, perm)
    if renumbered[0] >= native[0]:
        return None
    if native[0] < 2 * renumbered[0] and native[0] <= big_span:
        return None
    return perm, np.argsort(perm)
