"""Collectives audit: assert a compiled SPMD module moves no per-example
tensors across devices/hosts (SURVEY.md section 2.4: cross-chip traffic is
limited to scalar stopping-rule / loss reductions).

Used by bench_scaling.py (single-controller CPU mesh) and
scripts/multihost_demo.py (2-process cluster). This caught a real bug in
round 2: linearize_dynamics' (T-1)*B flatten merged the batch-sharded axis
with time and XLA all-gathered every example's trajectory to every device.
"""
from __future__ import annotations

import re
from typing import List, Tuple

# the defined value's type is either one token (f32[8]{0}) or, for async
# -start ops, a parenthesized tuple with spaces ((f32[8], f32[8])) -- match
# both so a module whose only large shapes sit on the -start line still trips
_COLL_DEF = re.compile(
    r"=\s*(?:\([^)]*\)|\S+)\s+"
    r"(?:all-reduce|all-gather|reduce-scatter|collective-permute"
    r"|all-to-all)(?:-start|-done)?\("
)
_SHAPE = re.compile(r"[a-z0-9]+\[([0-9,]*)\]")


def _max_elems(line: str) -> int:
    """Largest element count among the shapes printed on an HLO line
    (covers both the result shape -- the large side of an all-gather,
    printed before the op name -- and the operand shapes)."""
    tots = [1]
    for m in _SHAPE.finditer(line):
        dims = [int(d) for d in m.group(1).split(",") if d]
        tot = 1
        for d in dims:
            tot *= d
        tots.append(tot)
    return max(tots)


def audit_collectives(hlo: str, batch: int) -> Tuple[List[str], List[str]]:
    """Returns (collective_definition_lines, offending_lines).

    A line is a collective only if it DEFINES one (``= shape all-gather(``
    anchor) -- consumer instructions that merely reference a collective's
    result (e.g. ``broadcast(f32[] %all-reduce.2)``) are excluded, since
    their own large shapes are local. Legit collectives are scalar
    reductions over the batch ([batch] elements at most: the stopping-rule
    pmax / loss psum); anything larger moved per-example data.
    """
    colls = [line for line in hlo.splitlines() if _COLL_DEF.search(line)]
    big = [c for c in colls if _max_elems(c) > batch]
    return colls, big
