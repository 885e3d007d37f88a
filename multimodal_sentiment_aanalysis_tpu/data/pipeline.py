"""Device-resident data pipeline.

This replaces the reference's torch ``DataLoader(num_workers=4,
pin_memory=True)`` + per-batch ``.to(device)`` loop (reference
``dataLoader/MultiTaskTrainer.py:187-195``, ``data/Dataset.py:169-180``) with
the idiomatic TPU design: the full dataset (~36 MB) is ``device_put`` once
into HBM, and batches are pure ``jnp.take`` gathers *inside* jit. Epochs are
expressed as a static ``(n_batches, batch)`` int32 index matrix so a whole
epoch can run as one ``lax.scan``.

Variable-size last batches (480 % 64 != 0) are handled with wrap-around
padding plus a validity mask that downstream losses/metrics consume —
static shapes everywhere, as XLA requires.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np


def epoch_batch_indices(
    n: int,
    batch_size: int,
    rng: np.random.Generator | None = None,
    shuffle: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Static-shape epoch index plan.

    Returns ``(indices, mask)`` of shape ``(n_batches, batch_size)``:
    ``indices`` covers a (shuffled) epoch with the tail batch wrap-padded,
    ``mask`` is 1.0 for real samples and 0.0 for padding.
    """
    order = np.arange(n)
    if shuffle:
        if rng is None:
            rng = np.random.default_rng(0)
        order = rng.permutation(n)
    n_batches = -(-n // batch_size)
    padded = n_batches * batch_size
    pad = np.resize(order, padded)  # wrap-around padding
    mask = np.zeros(padded, np.float32)
    mask[:n] = 1.0
    return (
        pad.reshape(n_batches, batch_size).astype(np.int32),
        mask.reshape(n_batches, batch_size),
    )


class DeviceDataset:
    """A dict of arrays resident on device, gathered per batch inside jit."""

    def __init__(self, arrays: dict[str, np.ndarray], device=None):
        self.n = len(next(iter(arrays.values())))
        for k, v in arrays.items():
            assert len(v) == self.n, f"length mismatch for {k}"
        self.arrays = {
            k: jax.device_put(jnp.asarray(v), device) for k, v in arrays.items()
        }

    def __len__(self) -> int:
        return self.n

    def gather(self, idx: jnp.ndarray) -> dict[str, jnp.ndarray]:
        """Batch gather; jit-safe (idx may be traced)."""
        return {k: jnp.take(v, idx, axis=0) for k, v in self.arrays.items()}

    def subset(self, idx: np.ndarray) -> "DeviceDataset":
        """Materialize a row subset (host-side, once per experiment)."""
        out = object.__new__(DeviceDataset)
        out.n = len(idx)
        idx_dev = jnp.asarray(idx)
        out.arrays = {k: jnp.take(v, idx_dev, axis=0) for k, v in self.arrays.items()}
        return out

    def batches(
        self,
        batch_size: int,
        rng: np.random.Generator | None = None,
        shuffle: bool = True,
    ) -> Iterator[tuple[dict[str, jnp.ndarray], jnp.ndarray]]:
        """Python-level batch iterator (for host-driven loops / eval)."""
        indices, mask = epoch_batch_indices(self.n, batch_size, rng, shuffle)
        for b in range(indices.shape[0]):
            idx = jnp.asarray(indices[b])
            yield self.gather(idx), jnp.asarray(mask[b])

    def epoch_plan(
        self,
        batch_size: int,
        rng: np.random.Generator | None = None,
        shuffle: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Device-resident (indices, mask) for a whole-epoch lax.scan."""
        indices, mask = epoch_batch_indices(self.n, batch_size, rng, shuffle)
        return jnp.asarray(indices), jnp.asarray(mask)


@partial(jax.jit, static_argnames=("n", "batch_size"))
def epoch_plan_on_device(
    key: jax.Array, n: int, batch_size: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Jit-compiled epoch plan: shuffle + pad + mask entirely on device.

    Removes even the host-side permutation from the step path; used by the
    fully-fused multi-epoch program
    :meth:`..train.vloso.VectorizedLOSOTrainer.train_epochs_fused` (one ``lax.scan``
    over epochs, plans drawn per epoch inside jit).
    """
    order = jax.random.permutation(key, n)
    n_batches = -(-n // batch_size)
    padded = n_batches * batch_size
    reps = -(-padded // n)
    tiled = jnp.tile(order, reps)[:padded]
    mask = (jnp.arange(padded) < n).astype(jnp.float32)
    return (
        tiled.reshape(n_batches, batch_size).astype(jnp.int32),
        mask.reshape(n_batches, batch_size),
    )
