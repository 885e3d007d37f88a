"""Seeding utilities.

Counterpart of reference ``common/utils.py:97-100`` (``seed_all``), for the
JAX world: one integer seed fans out to a ``jax.random`` key plus a numpy
Generator for host-side shuffles/pair sampling.
"""

from __future__ import annotations

import jax
import numpy as np


def seed_all(seed: int = 42) -> tuple[jax.Array, np.random.Generator]:
    """Returns (jax key, numpy Generator) both derived from ``seed``."""
    np.random.seed(seed)  # legacy global for sklearn-style consumers
    return jax.random.key(seed), np.random.default_rng(seed)
