"""Tree analyses: memory usage, FLOP/byte accounting per node.

Reference parity: indigo/analyses.py (Memusage visitor — unverified, mount
empty; SURVEY.md §2). The reference used this to pre-allocate intermediates;
XLA allocates for us, so here the analyses feed the roofline report instead:
bytes of payload per node and bytes moved / FLOPs per apply.
"""
from __future__ import annotations

import numpy as np

from .operators import Operator
from .transforms import Visitor

__all__ = ["Memusage", "memusage_report", "apply_cost"]


class Memusage(Visitor):
    """Collect (name, shape, payload bytes) rows for every node."""

    def __init__(self):
        self.rows = []

    def generic_visit(self, node):
        own = node.memusage() - sum(c.memusage() for c in node.children())
        self.rows.append((node.name, node.shape, int(own)))
        for c in node.children():
            self.visit(c)
        return node


def memusage_report(op: Operator) -> str:
    v = Memusage()
    v.visit(op)
    total = op.memusage()
    lines = [f"{'node':<16} {'shape':<20} {'payload':>12}"]
    for name, shape, b in v.rows:
        lines.append(f"{name:<16} {str(shape):<20} {b:>12,}")
    lines.append(f"{'TOTAL':<16} {'':<20} {total:>12,}")
    return "\n".join(lines)


def apply_cost(op: Operator, ncols: int = 1):
    """Estimate (flops, hbm_bytes) for one forward apply with K columns.

    Used by bench.py for the speed-of-light roofline comparison
    (north star: "per-apply time at roofline"). Complex multiply-add is
    counted as 8 flops.

    The per-node formulas live on the operator contract itself
    (``Operator.cost``) so a new leaf that forgets its cost fails loudly
    with NotImplementedError instead of silently contributing zero to the
    roofline denominators (round-3 advisory: string-dispatch here let
    renamed/subclassed leaves report 0 bytes with no test failing).
    """
    return op.cost(ncols)
