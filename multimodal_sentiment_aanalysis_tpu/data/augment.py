"""Data augmentation, device-side.

The reference augments on the host per sample (``ME-MHACL/data_loader.py:40-48``
Gaussian noise; ``common/data_process.py:96-136`` sliding windows). Here the
augmentations are jittable JAX functions applied to whole device-resident
batches — two fresh views are generated inside the training step, fused by XLA
into the encoder forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_views(
    key: jax.Array,
    eeg: jnp.ndarray,
    eye: jnp.ndarray,
    pps: jnp.ndarray,
    noise_eeg: float = 0.01,
    noise_eye: float = 0.05,
    noise_pps: float = 0.05,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One Gaussian-noise view per modality.

    Parity with reference ``ME-MHACL/data_loader.py:40-48``
    (``default_augment``), vectorized over the batch.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    return (
        eeg + noise_eeg * jax.random.normal(k1, eeg.shape, eeg.dtype),
        eye + noise_eye * jax.random.normal(k2, eye.shape, eye.dtype),
        pps + noise_pps * jax.random.normal(k3, pps.shape, pps.dtype),
    )


def two_views(key: jax.Array, eeg, eye, pps, **noise):
    """Two independent augmented views (ME-MHACL ContrastiveDataset parity,
    reference ``ME-MHACL/data_loader.py:51-77``)."""
    ka, kb = jax.random.split(key)
    return gaussian_views(ka, eeg, eye, pps, **noise), gaussian_views(
        kb, eeg, eye, pps, **noise
    )


def sliding_window(
    trial: np.ndarray, label, win_len: int, overlap: float
) -> tuple[np.ndarray, np.ndarray]:
    """Sliding-window augmentation of one trial (host-side precompute).

    Reference ``common/data_process.py:96-136`` (``re_data_slide``), minus the
    in-loop filtering (exposed separately in :mod:`..ops.dsp`). ``trial`` is
    (samples, channels); returns (windows, labels).
    """
    if overlap == 0:
        win_num = trial.shape[0] // win_len
        chans = trial.shape[1]
        used = win_num * win_len
        new_trial = trial[:used, :].reshape(win_num, win_len, chans)
    else:
        step = int(win_len * (1 - overlap))
        starts = []
        start = 0
        end = 0
        # reproduce the reference's loop bound semantics exactly
        while end < len(trial) - win_len:
            end = start + win_len
            starts.append(start)
            start += step
        new_trial = np.asarray([trial[s : s + win_len] for s in starts])
    new_label = np.asarray([label] * len(new_trial))
    return new_trial, new_label


def align_modalities(
    eeg_data: np.ndarray, eye_track_data: np.ndarray, f1: int = 256, f2: int = 60
) -> tuple[np.ndarray, np.ndarray]:
    """Trim two modality streams to the common duration.

    Reference ``common/data_process.py:138-157`` (``data_align``).
    """
    time1 = len(eeg_data) / f1
    time2 = len(eye_track_data) / f2
    min_time = min(time1, time2)
    return eeg_data[: int(min_time * f1)], eye_track_data[: int(min_time * f2)]
