"""Configuration system.

Mirrors the reference's single-YAML config schema (reference
``config/config.yaml:1-39`` and the loader ``main.py:12-16`` /
``common/utils.py:234-242``) as typed dataclasses, while staying
YAML-compatible: ``load_config(path)`` accepts the same keys.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import yaml

# The 24 MAHNOB-HCI subjects used throughout the reference
# (reference dataLoader/DataLoader.py:14, config/config.yaml:20).
DEFAULT_SUBJECT_LISTS = [
    1, 2, 4, 5, 6, 7, 8, 10, 11, 13, 14, 17, 18, 19, 20, 21, 22, 23, 24,
    26, 27, 28, 29, 30,
]




class _DictAccess:
    """Reference code reads config like ``config["data"]["HCI"]["ex_nums"]``;
    every config dataclass supports that item access."""

    def __getitem__(self, key: str):
        return getattr(self, key)

@dataclass
class HCIDataConfig(_DictAccess):
    """Dataset-layout keys (reference config/config.yaml:18-27)."""

    data_path: str = "HCI_DATA/hci_data.pkl"
    subject_lists: list[int] = field(
        default_factory=lambda: list(DEFAULT_SUBJECT_LISTS)
    )
    modalities: list[str] = field(default_factory=lambda: ["eeg", "eye", "pps"])
    input_size: list[int] = field(default_factory=lambda: [960, 38, 230])
    input_dim: int = 585
    label_type: str = "arousal"
    num_workers: int = 4  # kept for YAML compat; the TPU pipeline is device-resident
    ch_nums: int = 32
    ex_nums: int = 20


@dataclass
class DataConfig(_DictAccess):
    name: str = "HCI"
    HCI: HCIDataConfig = field(default_factory=HCIDataConfig)


@dataclass
class TrainingConfig(_DictAccess):
    """Reference config/config.yaml:3-13."""

    ex_name: str = "HCI two modality fusion"
    batch_size: int = 64
    epochs: int = 300
    learning_rate: float = 1e-4
    weight_decay: float = 2e-3
    optimizer: str = "adam"
    loss_function: str = "cross_entropy"
    dependent: bool = True
    n_folds: int = 10
    using_modalities: list[str] = field(
        default_factory=lambda: ["eeg", "eye", "pps"]
    )


@dataclass
class LoggingConfig(_DictAccess):
    log_dir: str = "logs"
    model_dir: str = "outputs"
    save_best_only: bool = True


@dataclass
class DeviceConfig(_DictAccess):
    """TPU-native device settings (replaces the reference's gpu/gpu_ids)."""

    mesh_shape: list[int] = field(default_factory=lambda: [1])
    mesh_axes: list[str] = field(default_factory=lambda: ["data"])
    # kept for YAML compatibility with the reference
    gpu: bool = True
    gpu_ids: list[int] = field(default_factory=lambda: [0])


@dataclass
class Config:
    model: Any = None
    training: TrainingConfig = field(default_factory=TrainingConfig)
    data: DataConfig = field(default_factory=DataConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    device: DeviceConfig = field(default_factory=DeviceConfig)
    seed: int = 42
    num_classes: int = 3

    # --- dict-style access for reference-API compatibility -------------
    # Reference code reads config like config["training"]["batch_size"].
    def __getitem__(self, key: str) -> Any:
        value = getattr(self, key)
        return value

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def _dataclass_from_dict(cls, data: dict):
    if not dataclasses.is_dataclass(cls) or not isinstance(data, dict):
        return data
    kwargs = {}
    field_types = {f.name: f.type for f in dataclasses.fields(cls)}
    hints = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in data.items():
        if key not in field_types:
            continue
        f = hints[key]
        sub_cls = _resolve_type(f)
        if dataclasses.is_dataclass(sub_cls) and isinstance(value, dict):
            kwargs[key] = _dataclass_from_dict(sub_cls, value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def _resolve_type(f: dataclasses.Field):
    mapping = {
        "training": TrainingConfig,
        "data": DataConfig,
        "HCI": HCIDataConfig,
        "logging": LoggingConfig,
        "device": DeviceConfig,
    }
    return mapping.get(f.name)


def load_config(config_path: str | None = None) -> Config:
    """Load a YAML config with the reference's schema into a typed Config.

    Mirrors reference ``main.py:12-16``. Missing keys take defaults, so
    reference YAML files load unchanged.
    """
    if config_path is None:
        return Config()
    with open(config_path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}
    cfg = Config()
    if "training" in raw and raw["training"]:
        cfg.training = _dataclass_from_dict(TrainingConfig, raw["training"])
    if "data" in raw and raw["data"]:
        data_raw = dict(raw["data"])
        hci_raw = data_raw.pop("HCI", None)
        cfg.data = _dataclass_from_dict(DataConfig, data_raw)
        if hci_raw:
            cfg.data.HCI = _dataclass_from_dict(HCIDataConfig, hci_raw)
    if "logging" in raw and raw["logging"]:
        cfg.logging = _dataclass_from_dict(LoggingConfig, raw["logging"])
    if "device" in raw and raw["device"]:
        cfg.device = _dataclass_from_dict(DeviceConfig, raw["device"])
    for key in ("seed", "num_classes"):
        if key in raw:
            setattr(cfg, key, raw[key])
    return cfg


def flatten_config(cfg: Config | dict, parent_key: str = "") -> dict:
    """Flatten a nested config into dotted keys.

    Equivalent of reference ``common/utils.py:259-272`` (``dict_format``):
    nested dicts become ``a.b`` keys and lists become comma-joined strings.
    Used by the experiment-history CSV appender.
    """
    if isinstance(cfg, Config):
        cfg = cfg.to_dict()
    items: list[tuple[str, Any]] = []
    for key, value in cfg.items():
        new_key = f"{parent_key}.{key}" if parent_key else key
        if isinstance(value, dict):
            items.extend(flatten_config(value, new_key).items())
        elif isinstance(value, list):
            items.append((new_key, ",".join(str(v) for v in value)))
        else:
            items.append((new_key, value))
    return dict(items)
