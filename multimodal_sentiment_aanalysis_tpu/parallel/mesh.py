"""Device mesh helpers.

The reference has no distributed layer at all (SURVEY.md §2: the only trace
is a DataParallel checkpoint-prefix vestige, reference ``Tester.py:32-33``,
and ``gpu_ids: [0]`` in ``config/config.yaml:36``). This module is therefore
net-new, built the TPU way: a 1-D ``jax.sharding.Mesh`` over all local
devices with a ``data`` axis; gradients ride ICI via ``psum``/``pmean``
collectives inserted either explicitly (``shard_map``) or by GSPMD.

A 1-chip mesh degenerates to the single-device path with zero overhead, so
v5e-1 runs the same code (SURVEY.md §5 last row).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, axis_name: str = "data", devices=None
) -> Mesh:
    """1-D mesh over (the first n of) the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(mesh: Mesh, tree: Any, axis_name: str = "data") -> Any:
    """Place a pytree with leaves sharded along their leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Place a pytree fully replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
