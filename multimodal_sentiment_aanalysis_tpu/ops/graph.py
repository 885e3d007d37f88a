"""Electrode-graph construction for GCN-style models.

TPU-native rebuild of reference ``common/process_graph.py:25-181`` (dormant
GCN infrastructure — no live call site in the reference, kept for parity):

- dense all-pairs electrode adjacency (``processing_adjacency``, ``:34-56``)
- distance-based weights ``min(1, delta / d^2)`` from 3-D electrode
  positions, with hemisphere-symmetric pairs flipped negative via ``-1``
  (``processing_weights``, ``:59-120``)
- symmetric normalization ``D^-1/2 A D^-1/2`` (``normalization``, ``:164-181``)
- ``.mat``-file caching -> ``.npz`` caching here (``createGraphStructer``,
  ``:123-161``)

TPU design: the reference builds one giant ``batch*ch x batch*ch``
block-diagonal ``scipy.sparse`` matrix (a CPU-GPU sparse idiom).  On TPU the
idiomatic layout is a single dense ``(ch, ch)`` matrix broadcast over the
batch — per-graph GCN propagation is then a batched dense matmul that maps
straight onto the MXU, and no sparse scatter/gather is needed.  ``ch`` is 32
(or 62), so dense is also strictly smaller than the reference's COO triplets.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

# hemisphere-symmetric electrode pairs whose weight is shifted by -1
# (reference ``processing_weights``, ``common/process_graph.py:63-96``)
SYMMETRIC_PAIRS: dict[int, list[list[int]]] = {
    62: [
        [0, 2], [3, 4], [6, 12], [15, 21], [24, 30], [33, 39], [42, 48],
        [51, 55], [58, 60],
        [2, 0], [4, 3], [12, 6], [21, 15], [30, 24], [39, 33], [48, 42],
        [55, 51], [60, 58],
    ],
    32: [
        [0, 16], [1, 17], [4, 21], [8, 26], [13, 31],
        [16, 0], [17, 1], [21, 4], [26, 8], [31, 13],
    ],
}
DEFAULT_PAIRS = [[0, 30], [4, 26], [9, 20], [14, 16]]


def synthetic_electrode_positions(ch_nums: int = 32, seed: int = 0) -> np.ndarray:
    """Plausible (ch, 3) electrode coordinates on a unit sphere cap, for use
    when the reference's ``channels_pos_{ch}.xlsx`` is not available."""
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, ch_nums)
    phi = rng.uniform(0, np.pi / 2, ch_nums)
    r = 9.0  # ~cm, so /10 lands in the reference's coordinate scale
    return np.stack(
        [r * np.sin(phi) * np.cos(theta), r * np.sin(phi) * np.sin(theta),
         r * np.cos(phi)], axis=1)


def load_electrode_positions(path: str) -> np.ndarray:
    """Read (ch, 3) positions from the reference's xlsx layout (columns
    1:4 of each row; reference ``processing_weights``, ``:102-104``)."""
    import pandas as pd

    pos = pd.read_excel(path)
    return pos.iloc[:, 1:4].to_numpy(dtype=np.float64)


def distance_weights(positions: np.ndarray, delta: float = 5.0,
                     symmetric_pairs: list[list[int]] | None = None) -> np.ndarray:
    """Dense (ch, ch) distance weights, vectorized.

    Reference semantics (``processing_weights``, ``:106-116``): coordinates
    are divided by 10; ``w = min(1, delta / ||xi - xj||^2)``; self-links get
    1; hemisphere-symmetric pairs get ``w - 1`` (a negative link).
    """
    ch = positions.shape[0]
    if symmetric_pairs is None:
        symmetric_pairs = SYMMETRIC_PAIRS.get(ch, DEFAULT_PAIRS)
    p = np.asarray(positions, np.float64) / 10.0
    d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    with np.errstate(divide="ignore"):
        w = np.minimum(1.0, delta / np.where(d2 == 0, np.inf, d2))
    w[d2 == 0] = 1.0
    for i, j in symmetric_pairs:
        w[i, j] -= 1.0
    return w


def normalize_adjacency(adj: jnp.ndarray) -> jnp.ndarray:
    """Symmetric normalization ``D^-1/2 A D^-1/2`` (reference
    ``normalization``, ``:164-181``; note it does NOT add self-loops — the
    ``A + I`` line is commented out there, and self-links already carry
    weight 1 from ``distance_weights``)."""
    degree = adj.sum(axis=-1)
    d_inv_sqrt = jnp.power(degree, -0.5)
    return adj * d_inv_sqrt[..., :, None] * d_inv_sqrt[..., None, :]


def graph_indicator(batch_size: int, ch_nums: int) -> np.ndarray:
    """Node->graph id vector (reference ``createGraphStructer``, ``:144-150``)."""
    return np.repeat(np.arange(batch_size, dtype=np.int64), ch_nums)


def create_graph_structure(
    ch_nums: int = 32,
    positions: np.ndarray | None = None,
    cache_dir: str | None = None,
    delta: float = 5.0,
) -> jnp.ndarray:
    """Normalized dense (ch, ch) adjacency, cached as ``.npz``.

    The batched equivalent of the reference's block-diagonal sparse matrix is
    ``jnp.broadcast_to(adj, (batch, ch, ch))`` at the call site — XLA never
    materializes the broadcast.
    """
    cache_path = None
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
        cache_path = os.path.join(cache_dir, f"adj_norm_{ch_nums}.npz")
        if os.path.exists(cache_path):
            return jnp.asarray(np.load(cache_path)["adj"])
    if positions is None:
        positions = synthetic_electrode_positions(ch_nums)
    adj = np.asarray(
        normalize_adjacency(jnp.asarray(distance_weights(positions, delta)))
    )
    if cache_path is not None:
        np.savez(cache_path, adj=adj)
    return jnp.asarray(adj)


def initialize_graph(batch_size: int, ch_nums: int = 32,
                     positions: np.ndarray | None = None,
                     cache_dir: str | None = None):
    """Parity wrapper for reference ``initialize_graph`` (``:25-31``):
    returns (batched normalized adjacency, graph_indicator)."""
    adj = create_graph_structure(ch_nums, positions, cache_dir)
    return (
        jnp.broadcast_to(adj, (batch_size, ch_nums, ch_nums)),
        jnp.asarray(graph_indicator(batch_size, ch_nums)),
    )
