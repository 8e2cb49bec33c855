"""Compiled-HLO collective accounting for the sharded solver.

The multi-chip projection in README.md used hand math for the number of
collectives each PCG iteration issues; these helpers extract the truth from
the compiled program instead.  Used by tests/test_sharding.py (the
collective-count regression test) and bench_multichip.py (the perf-model
harness that emits per-shard-count projections).

There is no reference analogue — the reference is single-GPU
(/root/reference/include/cwf/gpu/sharding.hpp:104-106); its reduction
kernels (pcg_dot_partials/pcg_reduce_final.slang) are what the all-reduces
here replace.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, Tuple

_COLLECTIVE_DEF = re.compile(
    r"=\s*((?:\([^)]*\)|\S+))\s+"
    r"(all-reduce|collective-permute|all-gather|reduce-scatter|all-to-all)\("
)
_COMP_HEADER = re.compile(r"^(%[\w\.\-]+)\s*\(.*\)\s*->")


def collectives_by_computation(hlo_text: str) -> Dict[str, Counter]:
    """Collective ops *defined* per HLO computation.

    Counts only definitions (``%x = shape all-reduce(...)``), not operand
    mentions.  Returns {computation_name: Counter{(op, shape): n}}.
    """
    out: Dict[str, Counter] = {}
    cur = None
    for line in hlo_text.splitlines():
        header = _COMP_HEADER.match(line)
        if header:
            cur = header.group(1)
            out[cur] = Counter()
        elif cur is not None:
            m = _COLLECTIVE_DEF.search(line)
            if m:
                out[cur][(m.group(2), m.group(1))] += 1
    return {name: ops for name, ops in out.items() if ops}


def pcg_body_collectives(hlo_text: str) -> Counter:
    """Collectives inside the PCG while-loop body.

    GSPMD renames the widened while body to ``%wide.region...``; the PCG
    loop is the only while loop in the Newmark step, so the wide region
    holding collectives is its body.  Raises if none is found (e.g. the
    program was not partitioned).
    """
    comps = collectives_by_computation(hlo_text)
    candidates = {n: ops for n, ops in comps.items() if "wide" in n}
    if not candidates:
        raise ValueError("no while-body computation with collectives found")
    return max(candidates.values(), key=lambda c: sum(c.values()))


def summarize(ops: Counter) -> Dict[str, int]:
    """Counter{(op, shape): n} -> {op: total} totals."""
    totals: Dict[str, int] = {}
    for (op, _shape), n in ops.items():
        totals[op] = totals.get(op, 0) + n
    return totals


def per_iteration_counts(hlo_text: str) -> Tuple[int, int]:
    """(all_reduces, collective_permutes) per PCG iteration of a compiled
    sharded Newmark step."""
    totals = summarize(pcg_body_collectives(hlo_text))
    return totals.get("all-reduce", 0), totals.get("collective-permute", 0)
