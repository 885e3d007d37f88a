"""ME-MHACL data ingest: ``.npy``-backed dataset.

TPU-native rebuild of reference ``ME-MHACL/data_loader.py:7-77``:
``EmotionDataset`` loads four pre-saved numpy arrays — EEG (N, 32, 585),
eye (N, 38), physio (N, 230), binary labels (N, 2) — and the
``ContrastiveDataset`` wrapper produces two Gaussian-noise views per sample.

Here ingest returns the plain arrays-dict the device pipeline consumes
(:class:`..data.pipeline.DeviceDataset`); the two-view augmentation happens
*inside* the jitted pretraining step (:func:`..data.augment.two_views`)
instead of per sample on the host, and the 80/20 random split
(reference ``ME-MHACL/train.py:29-32``) is a pure index function.
"""

from __future__ import annotations

import numpy as np


def load_emotion_npy(
    eeg_path: str, eye_path: str, phy_path: str, label_path: str
) -> dict[str, np.ndarray]:
    """Load the four ``.npy`` files into the standard arrays dict.

    Shapes asserted like the reference (``data_loader.py:18``); the (N, 2)
    label matrix splits into ``arousal``/``valence`` columns
    (``ME-MHACL/train.py:103-105``).
    """
    eeg = np.load(eeg_path)
    eye = np.load(eye_path)
    phy = np.load(phy_path)
    labels = np.load(label_path)
    assert len(eeg) == len(eye) == len(phy) == len(labels), "length mismatch"
    assert labels.ndim == 2 and labels.shape[1] == 2, "labels must be (N, 2)"
    return {
        "eeg": eeg.astype(np.float32),
        "eye": eye.astype(np.float32),
        "pps": phy.astype(np.float32),
        "arousal": labels[:, 0].astype(np.int64),
        "valence": labels[:, 1].astype(np.int64),
    }


def make_synthetic_emotion_arrays(
    n: int = 128, seed: int = 0, planted_signal: float = 1.0
) -> dict[str, np.ndarray]:
    """Synthetic stand-in with the ME-MHACL shapes and binary labels."""
    rng = np.random.default_rng(seed)
    arousal = rng.integers(0, 2, n).astype(np.int64)
    valence = rng.integers(0, 2, n).astype(np.int64)
    sig = planted_signal * arousal[:, None, None].astype(np.float32)
    return {
        "eeg": (rng.normal(size=(n, 32, 585)) + sig).astype(np.float32),
        "eye": (rng.normal(size=(n, 38)) + sig[:, :, 0]).astype(np.float32),
        "pps": (rng.normal(size=(n, 230)) + sig[:, :, 0]).astype(np.float32),
        "arousal": arousal,
        "valence": valence,
    }


def random_split_indices(
    n: int, train_frac: float = 0.8, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """80/20 random split (reference ``ME-MHACL/train.py:29-32``
    ``random_split`` semantics: shuffled indices, first chunk trains)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    n_train = int(train_frac * n)
    return order[:n_train], order[n_train:]
