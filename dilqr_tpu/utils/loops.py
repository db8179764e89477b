"""Loop combinators: early-exit while_loop for inference, fixed-trip-count
masked scan for reverse-mode differentiability (BackwardMode.UNROLL).

``lax.while_loop`` is not reverse-differentiable in JAX; the UNROLL gradient
oracle (SURVEY.md section 7 item 3, BASELINE config #4) therefore needs every
data-dependent loop expressed as a bounded ``lax.scan`` whose body is gated
by ``lax.cond``. Both paths share the same cond/body functions so the
semantics are identical; the scan path simply always pays max_steps trips.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
from jax import lax


def bounded_while(
    cond_fn: Callable[[Any], jax.Array],
    body_fn: Callable[[Any], Any],
    init: Any,
    max_steps: int,
    unroll: bool = False,
) -> Any:
    """Run ``body_fn`` while ``cond_fn`` holds, at most ``max_steps`` times.

    cond_fn must already incorporate any iteration-count bound it needs
    (it receives the full carry). With ``unroll=True`` the loop is a
    fixed-length scan of ``lax.cond(pred, body, identity)`` steps, which is
    reverse-differentiable.
    """
    if not unroll:
        return lax.while_loop(cond_fn, body_fn, init)

    def step(carry, _):
        carry = lax.cond(cond_fn(carry), body_fn, lambda c: c, carry)
        return carry, None

    carry, _ = lax.scan(step, init, None, length=max_steps)
    return carry
