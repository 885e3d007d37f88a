"""Contrastive pair construction.

TPU-native counterpart of reference ``dataLoader/DataLoader.py:76-140``
(``_build_contrastive_pairs``): within each training subject, every unordered
sample pair is labeled positive iff both arousal and valence agree; positive
and negative pairs are balanced by down-sampling the larger class, then
shuffled. The reference does this with an O(n^2) Python double loop per
subject; here the pair matrix is vectorized with numpy (upper-triangle masks)
and sampling uses a seeded ``np.random.Generator``.

The output is a pair *index* array rather than materialized tensors — the
device-resident pipeline gathers views with ``jnp.take`` at step time, so
pairs cost 2 ints each instead of 2 full samples (the reference materializes
six full tensors, ``DataLoader.py:125-131``).
"""

from __future__ import annotations

import numpy as np


def build_contrastive_pairs(
    arousal: np.ndarray,
    valence: np.ndarray,
    subject_ids: np.ndarray,
    seed: int | np.random.Generator = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Build balanced positive/negative pair indices per subject.

    Args:
        arousal, valence: (N,) int label arrays (train split).
        subject_ids: (N,) int subject index per sample.
        seed: int seed or numpy Generator for the balanced subsample+shuffle.

    Returns:
        pair_indices: (P, 2) int32 array of sample index pairs.
        pair_labels: (P,) float32, 1.0 iff both labels agree.
    """
    rng = (
        seed
        if isinstance(seed, np.random.Generator)
        else np.random.default_rng(seed)
    )
    all_pairs: list[np.ndarray] = []
    all_labels: list[np.ndarray] = []

    for subj in np.unique(subject_ids):
        idx = np.where(subject_ids == subj)[0]
        n = len(idx)
        if n < 2:
            continue
        # upper-triangle (i < j) pair grid, vectorized
        ii, jj = np.triu_indices(n, k=1)
        a, v = arousal[idx], valence[idx]
        pos_mask = (a[ii] == a[jj]) & (v[ii] == v[jj])
        pos_pairs = np.stack([idx[ii[pos_mask]], idx[jj[pos_mask]]], axis=1)
        neg_pairs = np.stack([idx[ii[~pos_mask]], idx[jj[~pos_mask]]], axis=1)

        # skip subjects lacking either class (reference DataLoader.py:101-102)
        if len(pos_pairs) == 0 or len(neg_pairs) == 0:
            continue

        # balance classes by down-sampling the larger (reference :104-109)
        num_keep = min(len(pos_pairs), len(neg_pairs))
        pos_sel = pos_pairs[rng.choice(len(pos_pairs), num_keep, replace=False)]
        neg_sel = neg_pairs[rng.choice(len(neg_pairs), num_keep, replace=False)]
        pairs = np.concatenate([pos_sel, neg_sel], axis=0)
        labels = np.concatenate(
            [np.ones(num_keep, np.float32), np.zeros(num_keep, np.float32)]
        )
        perm = rng.permutation(len(pairs))
        all_pairs.append(pairs[perm])
        all_labels.append(labels[perm])

    if not all_pairs:
        return np.zeros((0, 2), np.int32), np.zeros((0,), np.float32)
    return (
        np.concatenate(all_pairs).astype(np.int32),
        np.concatenate(all_labels).astype(np.float32),
    )
