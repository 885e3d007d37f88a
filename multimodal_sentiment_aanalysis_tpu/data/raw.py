"""Raw dataset ingest.

TPU-native counterpart of reference ``data/RawData.py:15-38``: a MAHNOB-HCI
style dataset ships as a single pickle with keys
``['raw_data', 'features', 'arousal_label', 'valence_label', 'subject_list',
'ch_info', 'info']`` (documented in reference ``train.txt:2``). The whole
dataset is ~36 MB, so ingest is a one-shot host load; everything downstream is
device-resident.

Because the actual ``hci_data.pkl`` is not distributed, this module also
provides a deterministic synthetic generator with the identical schema for
tests and benchmarks.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np

from ..config import DEFAULT_SUBJECT_LISTS

# Canonical modality shapes (reference printData.py:27-29, train.txt:2-14):
#   eeg raw:  (480, 32, 585)   per-sample EEG time series
#   eye feat: (24, 20, 38)     per-subject-per-trial feature vectors
#   pps feat: (24, 20, 230)
EEG_CHANNELS = 32
EEG_TIME = 585
EYE_DIM = 38
PPS_DIM = 230
N_TRIALS_PER_SUBJECT = 20


def _load_any_pickle(path: str) -> Any:
    """Load a joblib- or plain-pickle file.

    joblib's default (uncompressed) format is plain pickle, so
    ``pickle.load`` covers both; fall back to joblib for compressed files.
    """
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception:
        import joblib  # optional dependency; only needed for compressed dumps

        return joblib.load(path)


class RawData:
    """Reads the preprocessed dataset pickle into a dict.

    API-parity with reference ``data/RawData.py:15-38`` (``RawData(path).data``).
    """

    def __init__(self, data_path: str):
        self.data_path = data_path
        self.data = self.load_data()

    def load_data(self) -> dict:
        assert os.path.exists(self.data_path), (
            f"data path does not exist: {self.data_path}"
        )
        data = _load_any_pickle(self.data_path)
        return data


def make_synthetic_hci_data(
    seed: int = 42,
    n_subjects: int = 24,
    ex_nums: int = N_TRIALS_PER_SUBJECT,
    subject_lists: list[int] | None = None,
    planted_signal: float = 1.0,
) -> dict:
    """Deterministic synthetic dataset with the reference pickle schema.

    Shapes match reference ``train.txt:2-14`` / ``printData.py:27-29``.
    A class-conditional mean shift (``planted_signal``) is planted into every
    modality so that learning curves are meaningful in tests: a working model
    must beat chance on this data.
    """
    if subject_lists is None:
        subject_lists = list(DEFAULT_SUBJECT_LISTS)[:n_subjects]
    rng = np.random.default_rng(seed)
    n = n_subjects * ex_nums

    arousal = rng.integers(0, 3, size=n).astype(np.int64)
    valence = rng.integers(0, 3, size=n).astype(np.int64)

    # class-conditional signature vectors per modality
    eeg_sig = rng.normal(size=(3, EEG_CHANNELS, EEG_TIME)).astype(np.float32)
    eye_sig = rng.normal(size=(3, EYE_DIM)).astype(np.float32)
    pps_sig = rng.normal(size=(3, PPS_DIM)).astype(np.float32)

    eeg = rng.normal(size=(n, EEG_CHANNELS, EEG_TIME)).astype(np.float32)
    eeg += planted_signal * eeg_sig[arousal]
    eeg += 0.5 * planted_signal * eeg_sig[valence][:, ::-1, :]

    eye = rng.normal(size=(n_subjects, ex_nums, EYE_DIM)).astype(np.float32)
    eye += planted_signal * eye_sig[arousal].reshape(n_subjects, ex_nums, EYE_DIM)
    pps = rng.normal(size=(n_subjects, ex_nums, PPS_DIM)).astype(np.float32)
    pps += planted_signal * pps_sig[valence].reshape(n_subjects, ex_nums, PPS_DIM)

    # a sprinkle of NaNs in non-EEG features to exercise nan_to_num parity
    nan_idx = rng.integers(0, eye.size, size=5)
    eye.reshape(-1)[nan_idx] = np.nan

    return {
        "raw_data": {"eeg": eeg.copy()},
        "features": {"eeg": eeg, "eye": eye, "pps": pps},
        "arousal_label": arousal,
        "valence_label": valence,
        "subject_list": np.array(subject_lists),
        "ch_info": [f"EEG{i}" for i in range(EEG_CHANNELS)],
        "info": "synthetic MAHNOB-HCI-schema dataset (deterministic, seeded)",
    }


def save_pickle(data: dict, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f)
