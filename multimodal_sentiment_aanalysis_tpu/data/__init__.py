from .raw import RawData, make_synthetic_hci_data, save_pickle
from .features import DataFeatures, assemble_features, zscore_normalize
from .splits import (
    loso_split,
    subject_holdout_split,
    per_subject_count_split,
    kfold_split,
    binary_label_filter,
)
from .pairs import build_contrastive_pairs
from .pipeline import DeviceDataset, epoch_batch_indices
from .dataset import FeatureDataset, load_data
from .memhacl import (
    load_emotion_npy,
    make_synthetic_emotion_arrays,
    random_split_indices,
)

__all__ = [
    "RawData",
    "make_synthetic_hci_data",
    "save_pickle",
    "DataFeatures",
    "assemble_features",
    "zscore_normalize",
    "loso_split",
    "subject_holdout_split",
    "per_subject_count_split",
    "kfold_split",
    "binary_label_filter",
    "build_contrastive_pairs",
    "DeviceDataset",
    "epoch_batch_indices",
    "FeatureDataset",
    "load_data",
    "load_emotion_npy",
    "make_synthetic_emotion_arrays",
    "random_split_indices",
]
