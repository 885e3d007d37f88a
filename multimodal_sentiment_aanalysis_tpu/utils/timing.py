"""Trustworthy timing primitives for TPU measurement (net-new).

The single canonical home of the timing barrier every bench/profile
harness in this repo depends on. Two hard-won rules (CLAUDE.md):

1. ``jax.block_until_ready`` is NOT a reliable completion barrier over
   the remote 'axon' TPU tunnel — measured returning in 0.3 ms on
   freshly submitted work that took 225 s. Every timing boundary must
   force a host transfer of an output leaf instead (:func:`host_sync`).
2. The tunnel MEMOIZES byte-identical executions: repeated calls of a
   jitted fn with the same arguments can return fake ~0.03 ms results.
   Vary the inputs between reps (:func:`timed_fresh`) or time programs
   whose carried state changes every call (training steps are safe).

Previously ~17 scripts carried private copies of these helpers; any
refinement of the barrier had to be hand-applied everywhere. Import
from here instead.
"""

from __future__ import annotations

import time

import numpy as np


def host_sync(out) -> None:
    """Force completion of ``out`` by pulling one leaf to the host.

    The only trustworthy barrier over the axon tunnel (see module
    docstring); also correct on local backends.
    """
    import jax

    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]


def timed(fn, *args, reps: int = 3) -> float:
    """Best-of-``reps`` wall seconds of ``fn(*args)``, host-synced.

    Calls with the SAME args each rep — only safe for programs whose
    execution cannot be memoized (e.g. stateful chains); for pure
    functions use :func:`timed_fresh`.
    """
    host_sync(fn(*args))  # warm-up / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        host_sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def timed_out(fn, *args, reps: int = 3):
    """Like :func:`timed` but also returns the last output."""
    out = fn(*args)
    host_sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        host_sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def timed_fresh(fn, argf, reps: int = 3) -> float:
    """Best-of-``reps`` wall seconds with FRESH args per rep.

    ``argf(i) -> args tuple`` must yield different input values each rep
    so the tunnel cannot memoize the execution (rule 2 above).
    """
    host_sync(fn(*argf(0)))
    best = float("inf")
    for i in range(1, reps + 1):
        a = argf(i)
        t0 = time.perf_counter()
        host_sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best
