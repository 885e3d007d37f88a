"""Test configuration.

Tests run on a virtual 8-device CPU mesh so every sharding/collective path is
exercised without TPU hardware (SURVEY.md §4). Env vars must be set before
jax initializes its backends, hence the top-of-module placement.
"""

import os

# Force the CPU backend: the image pins JAX_PLATFORMS=axon (the TPU tunnel),
# but tests must run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag wins.
jax.config.update("jax_platforms", "cpu")
# float32-exact matmuls for the torch-parity tests
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Every test not marked ``slow`` gets ``fast``, so ``pytest -m fast``
    is a <5-min subset that still touches every package module."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def hci_data():
    from multimodal_sentiment_aanalysis_tpu.data import make_synthetic_hci_data

    return make_synthetic_hci_data(seed=42)


@pytest.fixture(scope="session")
def hci_pickle(tmp_path_factory, hci_data):
    from multimodal_sentiment_aanalysis_tpu.data import save_pickle

    path = tmp_path_factory.mktemp("data") / "hci_data.pkl"
    save_pickle(hci_data, str(path))
    return str(path)


@pytest.fixture(scope="session")
def assembled(hci_data):
    from multimodal_sentiment_aanalysis_tpu.data import assemble_features

    feats, label = assemble_features(
        hci_data, ["eeg", "eye", "pps"], norm="Z_score", label_type="arousal"
    )
    return feats, label


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
