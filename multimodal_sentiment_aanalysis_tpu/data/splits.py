"""Split policies as pure index functions.

The reference encodes three split policies plus a K-fold variant inside its
loaders; here they are pure functions over index arrays so they compose with
the device-resident pipeline and are trivially testable:

- LOSO by subject block: reference ``dataLoader/DataLoader.py:45-55`` and
  ``data/Dataset.py:86-113``
- subject-level holdout 80/5/15: reference
  ``dataLoader/MultimodalDataLoader.py:78-110``
- per-subject fixed-count 16/1/3: reference
  ``dataLoader/CrossSubjectDataLoader.py:74-100``
- KFold(n_splits, shuffle, seed 42): reference ``data/Dataset.py:115-138``
- binary-label filter (keep {0,2}, map 2->1): reference
  ``data/Dataset.py:69-78``
"""

from __future__ import annotations

import numpy as np
from sklearn.model_selection import KFold, train_test_split


def subject_ids_array(n_subjects: int, ex_nums: int) -> np.ndarray:
    """Dense per-sample subject index array, samples grouped by subject."""
    return np.repeat(np.arange(n_subjects), ex_nums)


def loso_split(
    n_subjects: int, ex_nums: int, test_subject_index: int
) -> tuple[np.ndarray, np.ndarray]:
    """Leave-one-subject-out: samples of one subject are the test set.

    ``test_subject_index`` is the positional index of the held-out subject in
    the subject list (reference ``DataLoader.py:47``:
    ``subject_lists.index(test_subject_id)``).
    """
    subject_ids = subject_ids_array(n_subjects, ex_nums)
    test_mask = subject_ids == test_subject_index
    idx = np.arange(n_subjects * ex_nums)
    return idx[~test_mask], idx[test_mask]


def subject_holdout_split(
    n_subjects: int,
    ex_nums: int,
    test_size: float = 0.15,
    val_size: float = 0.05,
    random_state: int = 42,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split whole *subjects* into train/val/test sets.

    Reference ``dataLoader/MultimodalDataLoader.py:78-110`` — two chained
    sklearn ``train_test_split`` calls over unique subject ids, then sample
    masks via ``np.isin``. Uses sklearn for exact index parity.
    """
    subject_ids = subject_ids_array(n_subjects, ex_nums)
    unique_subjects = np.unique(subject_ids)
    subjects_train, subjects_temp = train_test_split(
        unique_subjects, test_size=test_size + val_size, random_state=random_state
    )
    subjects_val, subjects_test = train_test_split(
        subjects_temp,
        test_size=test_size / (test_size + val_size),
        random_state=random_state,
    )
    idx = np.arange(len(subject_ids))
    return (
        idx[np.isin(subject_ids, subjects_train)],
        idx[np.isin(subject_ids, subjects_val)],
        idx[np.isin(subject_ids, subjects_test)],
    )


def per_subject_count_split(
    n_subjects: int,
    ex_nums: int,
    train_samples: int = 16,
    val_samples: int = 1,
    random_state: int = 42,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Within each subject: fixed train/val/test sample counts.

    Reference ``dataLoader/CrossSubjectDataLoader.py:74-100``. Note the
    reference reseeds ``np.random.seed(random_state)`` inside the per-subject
    loop, so every subject gets the *same* shuffle permutation — reproduced
    here for index parity.
    """
    subject_ids = subject_ids_array(n_subjects, ex_nums)
    train_idx: list[int] = []
    val_idx: list[int] = []
    test_idx: list[int] = []
    for subject in np.unique(subject_ids):
        sub_idx = np.where(subject_ids == subject)[0]
        np.random.seed(random_state)  # intentional per-subject reseed (parity)
        np.random.shuffle(sub_idx)
        train_idx.extend(sub_idx[:train_samples])
        val_idx.extend(sub_idx[train_samples : train_samples + val_samples])
        test_idx.extend(sub_idx[train_samples + val_samples :])
    return np.array(train_idx), np.array(val_idx), np.array(test_idx)


def kfold_split(
    n_samples: int,
    n_splits: int,
    current_split: int,
    random_state: int = 42,
    indices: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Shuffled K-fold over (optionally pre-filtered) indices.

    Reference ``data/Dataset.py:115-138``: sklearn KFold(shuffle=True,
    random_state=42) over ``self.indices``; the selected fold's positions are
    then mapped back through ``indices``.
    """
    if not (0 <= current_split < n_splits):
        raise ValueError("current_split must be in the range [0, n_splits)")
    if indices is None:
        indices = np.arange(n_samples)
    kf = KFold(n_splits=n_splits, shuffle=True, random_state=random_state)
    for i, (train_pos, test_pos) in enumerate(kf.split(indices)):
        if i == current_split:
            return indices[train_pos], indices[test_pos]
    raise AssertionError("unreachable")


def binary_label_filter(labels: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Keep labels {0, 2}; map 2 -> 1. Returns (kept_indices, mapped_labels).

    Reference ``data/Dataset.py:69-78``. Note the reference maps the *full*
    label array (it only filters via the returned indices); we return both the
    indices and the full mapped array to match.
    """
    indices = np.where((labels == 0) | (labels == 2))[0]
    mapped = np.where(labels == 2, 1, labels)
    return indices, mapped


def loso_block_split(
    n_samples: int,
    ex_nums: int,
    test_person: int,
    indices: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Block LOSO used by the dict-style dataset.

    Reference ``data/Dataset.py:86-113``: the test block is
    ``[test_person*ex_nums, (test_person+1)*ex_nums)`` intersected with the
    (possibly binary-filtered) index set; train is the set difference.
    """
    assert test_person < (n_samples // ex_nums), "test_person out of range"
    if indices is None:
        indices = np.arange(n_samples)
    start, end = test_person * ex_nums, (test_person + 1) * ex_nums
    test_indices = indices[(indices >= start) & (indices < end)]
    train_indices = np.setdiff1d(indices, test_indices)
    return train_indices, test_indices
