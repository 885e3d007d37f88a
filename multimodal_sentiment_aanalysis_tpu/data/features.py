"""Feature assembly and normalization.

TPU-native counterpart of reference ``data/LoadFeatures.py:24-142``
(``DataFeatures``). The semantics are reproduced exactly (they define the
numerics the models see):

1. prefer precomputed ``data['features'][modality]`` (reference ``:72-85``)
2. ``np.nan_to_num`` every modality (reference ``:79``)
3. non-EEG modalities get a global z-score followed by a global min-max
   (reference ``_normalize``, ``:130-142``), then are flattened
   ``(S, E, D) -> (S*E, D)`` (reference ``:87-90``)
4. optional dataset-level per-feature Z-score with the ``std == 0 -> 1``
   guard (reference ``:107-114``) or a min-max over the last axis
   (reference ``common/utils.py:42-58``)
5. labels come from ``{label_type}_label`` (reference ``:121-128``)

Everything is pure numpy on the host — this runs once per experiment; the
result is immediately placed on device by :mod:`.pipeline`.
"""

from __future__ import annotations

import numpy as np

from .raw import RawData


def _global_norm(features: np.ndarray) -> np.ndarray:
    """Global z-score then global min-max (reference LoadFeatures.py:130-142)."""
    features = (features - np.mean(features)) / np.std(features)
    features = (features - features.min()) / (features.max() - features.min())
    return features


def zscore_normalize(features: np.ndarray) -> np.ndarray:
    """Dataset-level per-feature Z-score with std==0 guard.

    Reference ``data/LoadFeatures.py:107-114``.
    """
    mean = np.mean(features, axis=0)
    std = np.std(features, axis=0)
    std = np.where(std == 0, 1.0, std)
    return (features - mean) / std


def minmax_normalize_lastaxis(data: np.ndarray) -> np.ndarray:
    """Min-max over the last axis with eps guard.

    Reference ``common/utils.py:53-58`` (``normlize_data_np``).
    """
    lo = np.min(data, axis=-1, keepdims=True)
    hi = np.max(data, axis=-1, keepdims=True)
    return (data - lo) / ((hi - lo) + 1e-9)


def per_subject_zscore(data: np.ndarray, sub_nums: int, ex_nums: int) -> np.ndarray:
    """Per-subject Z-score to remove inter-subject offsets.

    Reference ``common/utils.py:76-95`` (``Z_score_Normlisze``): reshape to
    (subjects, trials, -1), normalize over the trial axis with nan-aware
    statistics, reshape back.
    """
    eps = 1e-8
    orig_shape = data.shape
    r = data.reshape(sub_nums, ex_nums, -1)
    means = np.nanmean(r, axis=1, keepdims=True)
    stds = np.nanstd(r, axis=1, keepdims=True) + eps
    return ((r - means) / stds).reshape(orig_shape)


def assemble_features(
    data: dict,
    modalities: list[str],
    subject_lists: list[int] | None = None,
    norm: str | None = "Z_score",
    label_type: str = "arousal",
) -> tuple[dict[str, np.ndarray], np.ndarray]:
    """Assemble per-modality feature arrays + labels from a raw data dict.

    Pure-function equivalent of the reference ``DataFeatures.__init__``
    pipeline (``data/LoadFeatures.py:26-128``). Returns
    ``(features, labels)`` where ``features[m]`` is float array shaped
    ``(N, ...)`` and ``labels`` is the ``{label_type}_label`` array.
    """
    if "features" not in data:
        raise NotImplementedError(
            "raw-signal feature extraction path is not wired in the reference "
            "either (its load_<modality>_features dispatch targets undefined "
            "methods, reference LoadFeatures.py:69-71); supply a dict with a "
            "'features' key or use multimodal_sentiment_aanalysis_tpu.ops.dsp "
            "to extract features explicitly"
        )

    features: dict[str, np.ndarray] = {}
    for modality in modalities:
        assert modality in data["features"], f"dataset lacks modality {modality}"
        feature = np.array(data["features"][modality], copy=True)
        feature = np.nan_to_num(feature)
        if "eeg" not in modality:
            feature = _global_norm(feature)
            feature = feature.reshape(-1, feature.shape[-1])
        features[modality] = feature

        if norm == "Z_score":
            features[modality] = zscore_normalize(features[modality])
        elif norm == "Min_Max":
            features[modality] = minmax_normalize_lastaxis(features[modality])

    label_key = "label" if label_type == "ruiwen" else f"{label_type}_label"
    assert label_key in data, f"dataset lacks label key {label_key}"
    label = data[label_key]
    if not isinstance(label, np.ndarray):
        label = np.concatenate(label)
    return features, label


def au_group_normalize(
    features: np.ndarray, n_au_points: int = 17, features_per_au: int = 7
) -> np.ndarray:
    """Per-AU-group normalization: each facial action unit's 7-feature block
    is independently z-scored then min-maxed (reference
    ``data/LoadFeatures.py:160-185``, ``AuFeatures._normalize``)."""
    features = np.array(features, copy=True, dtype=np.float64)
    for au in range(n_au_points):
        lo, hi = au * features_per_au, (au + 1) * features_per_au
        blk = features[:, lo:hi]
        blk = (blk - blk.mean()) / blk.std()
        blk = (blk - blk.min()) / (blk.max() - blk.min())
        features[:, lo:hi] = blk
    return features


class AuFeatures:
    """Facial action-unit feature loader (reference
    ``data/LoadFeatures.py:145-235``): per-subject ``{subject}.npy`` files
    under ``<data_dir>/au_feature/``, concatenated and NaN-scrubbed.
    Unused by the HCI pipeline (its dataset ships no AU files) — kept for
    API parity with the AU branch."""

    def __init__(self, au_data, subject_lists, data_path: str):
        self.au_data = au_data
        self.subject_lists = subject_lists
        self.data_path = data_path
        self.au_features: np.ndarray | None = None

    _normalize = staticmethod(au_group_normalize)

    def compute_au_features(self, feature_dir_name: str = "au_feature") -> np.ndarray:
        import os

        au_dir = os.path.join(os.path.dirname(self.data_path), feature_dir_name)
        if not os.path.exists(au_dir):
            raise FileNotFoundError(f"feature directory missing: {au_dir}")
        parts = []
        for subject in self.subject_lists:
            path = os.path.join(au_dir, f"{subject}.npy")
            if not os.path.exists(path):
                raise FileNotFoundError(f"missing file: {path}")
            parts.append(np.load(path))
        self.au_features = np.nan_to_num(np.concatenate(parts, axis=0))
        return self.au_features

    def get_features(self) -> np.ndarray:
        if self.au_features is None:
            self.au_features = self.compute_au_features()
        return self.au_features


class DataFeatures:
    """Class facade over :func:`assemble_features`.

    API-parity with reference ``data/LoadFeatures.py:24-128``:
    ``DataFeatures(path, modalities, subject_lists, Norm, label_type)``
    exposing ``.features[modality]`` and ``.label``.
    """

    def __init__(
        self,
        data_path: str,
        modalities: list[str] = ("eeg", "eye", "pps"),
        subject_lists: list[int] | None = None,
        Norm: str | None = None,
        label_type: str = "",
    ):
        self.data_path = data_path
        self.subject_lists = subject_lists
        self.ex_nums = 20
        raw = RawData(data_path)
        self.features, self.label = assemble_features(
            raw.data,
            modalities=list(modalities),
            subject_lists=subject_lists,
            norm=Norm,
            label_type=label_type,
        )
