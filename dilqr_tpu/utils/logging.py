"""Console iteration logging.

Equivalent of the reference's markdown-ish table logger (util.table_log,
util.py:79-101): header printed once per tag, then one row per call. Used
by the host-side training loops; inside jitted solves use
``debug_table_log`` which routes through jax.debug.callback.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax

_seen_tables = set()


def table_log(tag: str, d: Sequence[Tuple]) -> None:
    def print_row(r):
        print("| " + " | ".join(r) + " |")

    if tag not in _seen_tables:
        print_row([str(e[0]) for e in d])
        _seen_tables.add(tag)
    s = []
    for di in d:
        assert len(di) in (2, 3)
        if len(di) == 3:
            _, e, fmt = di
            s.append(fmt.format(e))
        else:
            s.append(str(di[1]))
    print_row(s)


def debug_table_log(tag: str, **scalars) -> None:
    """table_log from inside traced code (one row per executed iteration).
    Mirrors the reference's per-iteration solver table (mpc.py:287-297)."""

    def cb(**kw):
        table_log(tag, [(k, float(v), "{:.4e}") for k, v in kw.items()])

    jax.debug.callback(cb, **scalars)
