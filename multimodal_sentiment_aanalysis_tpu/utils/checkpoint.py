"""Checkpointing.

Replaces the reference's ``torch.save/load(state_dict)`` flow
(``Trainer.py:107-117,261-262``, ``MultiTaskTrainer.py:517-521,665-673``,
``Tester.py:29-35``) with msgpack pytree serialization via
``flax.serialization``. Semantics preserved:

- "best on val loss" checkpoint plus a metrics-encoded final filename
- the loader accepts dicts whose keys carry a ``module.`` prefix (the
  reference strips the DataParallel prefix on load, ``Tester.py:32-33``)

Unlike the reference, optimizer state and step counters are serialized too,
so training is resumable (SURVEY.md §5 flags resume as a reference gap).
"""

from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization


def save_checkpoint(path: str, tree: Any) -> str:
    """Serialize a pytree (params / full train state) to msgpack."""
    path = str(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.to_bytes(jax.device_get(tree))
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    """Load a msgpack checkpoint into the structure of ``target``."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(target, data)


def strip_module_prefix(state_dict: dict) -> dict:
    """Strip a uniform ``module.`` key prefix (DataParallel-style ckpts).

    Parity with reference ``Tester.py:29-35``: only strips when *all* keys
    carry the prefix.
    """
    keys = list(state_dict.keys())
    if keys and all(k.startswith("module.") for k in keys):
        return {k[len("module.") :]: v for k, v in state_dict.items()}
    return state_dict


def metrics_checkpoint_name(
    prefix: str, metrics: dict[str, float], suffix: str = ".msgpack"
) -> str:
    """Metrics-encoded checkpoint filename.

    Mirrors the reference's habit of baking metrics into the final filename
    (``MultiTaskTrainer.py:665``, ``Trainer.py:261``).
    """
    parts = [prefix] + [f"{k}{v:.4f}" for k, v in metrics.items()]
    return "_".join(parts) + suffix
