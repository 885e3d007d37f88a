"""DSP + feature-extraction + graph ops: parity vs scipy/numpy references.

Mirrors the behavior of reference ``common/data_process.py``,
``common/feature_extract.py`` and ``common/process_graph.py`` (SURVEY.md §2
#22-#27), with scipy/numpy golden implementations written out independently
here.
"""

import math

import numpy as np
import pytest
from scipy import signal

from multimodal_sentiment_aanalysis_tpu.ops import (
    all_frequency_features,
    all_timedomain_features,
    bin_power,
    butterworth_filter,
    create_graph_structure,
    data_align,
    differential_entropy,
    distance_weights,
    filter_data,
    filter_data_notch,
    graph_indicator,
    hjorth,
    initialize_graph,
    min_max_trial,
    normalize_adjacency,
    power_spectral_density,
    re_data_slide,
    signal_energy,
    split_train_test_unimodal,
    synthetic_electrode_positions,
    welch_psd,
    z_score_trial,
)


@pytest.fixture()
def trial(rng):
    return rng.normal(size=(585, 32))


class TestFiltering:
    def test_filter_data_matches_scipy_filtfilt(self, trial):
        ours = np.asarray(filter_data(1, 50, trial, fs=250))
        b, a = signal.butter(4, [2 * 1 / 250, 2 * 50 / 250], "bandpass")
        ref = np.stack(
            [signal.filtfilt(b, a, trial[:, c]) for c in range(32)], axis=1
        )
        np.testing.assert_allclose(ours, ref, atol=5e-4)

    def test_butterworth_filter_channel_major(self, trial):
        x = trial.T  # (channels, time)
        ours = np.asarray(butterworth_filter(x, 256, 1, 70, order=3))
        b, a = signal.butter(3, [1 / 128, 70 / 128], "bandpass")
        ref = np.stack([signal.filtfilt(b, a, x[c]) for c in range(32)])
        np.testing.assert_allclose(ours, ref, atol=5e-4)

    def test_butterworth_cutoff_clamping(self, trial):
        # hcf > nyquist clamps to nyquist; lcf <= 0 clamps to 2
        x = trial.T
        ours = np.asarray(butterworth_filter(x, 128, lcf=0, hcf=200, order=3))
        b, a = signal.butter(3, [2 / 64, 64 / 64 - 1e-9], "bandpass")
        assert np.isfinite(ours).all()

    def test_notch_matches_scipy(self, trial):
        ours = np.asarray(filter_data_notch(60, 5, trial, fs=250))
        b, a = signal.iirnotch(60 / 125, 5)
        ref = np.stack(
            [signal.filtfilt(b, a, trial[:, c]) for c in range(32)], axis=1
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestNormalizationAndWindows:
    def test_min_max_trial(self, rng):
        w = rng.normal(size=(5, 100, 8))
        out = np.asarray(min_max_trial(w))
        assert out.min() >= 0 and out.max() <= 1 + 1e-6
        np.testing.assert_allclose(out.min(axis=1), 0, atol=1e-6)

    def test_z_score_trial(self, rng):
        w = rng.normal(size=(5, 100, 8))
        out = np.asarray(z_score_trial(w))
        np.testing.assert_allclose(out.mean(axis=1), 0, atol=1e-5)
        np.testing.assert_allclose(out.std(axis=1), 1, atol=1e-4)

    def test_sliding_windows_no_overlap(self, trial):
        w, labels = re_data_slide(trial, 2, 128, 0.0)
        assert w.shape == (585 // 128, 128, 32)
        np.testing.assert_array_equal(labels, [2] * w.shape[0])
        np.testing.assert_allclose(np.asarray(w)[0], trial[:128], atol=1e-6)

    def test_sliding_windows_with_overlap_match_reference_loop(self, trial):
        w, _ = re_data_slide(trial, 1, 128, 0.5)
        # reference loop (data_process.py:117-126)
        start = end = 0
        step = int(128 * 0.5)
        ref = []
        while end < len(trial) - 128:
            end = start + 128
            ref.append(trial[start:end])
            start += step
        ref = [r for r in ref if r.shape[0] == 128]
        assert w.shape[0] == len(ref)
        np.testing.assert_allclose(np.asarray(w), np.stack(ref), atol=1e-6)

    def test_data_align(self, rng):
        eeg = rng.normal(size=(2560, 32))
        eye = rng.normal(size=(660, 4))
        a, b = data_align(eeg, eye, f1=256, f2=60)
        assert len(a) / 256 == len(b) / 60

    def test_split_dependent_reproducible(self, rng):
        data = rng.normal(size=(40, 10, 4))
        label = rng.integers(0, 3, 40)
        tr_d, tr_l, te_d, te_l = split_train_test_unimodal(
            data, label, "dependent", split_rate=0.7, random_seed=11
        )
        assert len(tr_d) + len(te_d) == 40
        tr2, *_ = split_train_test_unimodal(
            data, label, "dependent", split_rate=0.7, random_seed=11
        )
        np.testing.assert_array_equal(tr_d, tr2)


class TestTimeDomainFeatures:
    def test_energy(self, trial):
        np.testing.assert_allclose(
            np.asarray(signal_energy(trial)), (trial**2).sum(0), rtol=1e-5
        )

    def test_hjorth_matches_reference_formulation(self, trial):
        h = np.asarray(hjorth(trial))
        assert h.shape == (96,)
        c0 = trial[:, 0]
        d = np.insert(np.diff(c0), 0, 0)
        n = len(c0)
        m2 = (d**2).sum() / n
        tp = (c0**2).sum()
        m4 = ((d[1:] - d[:-1]) ** 2).sum() / n
        act = ((c0 - c0.mean()) ** 2).mean()
        assert abs(h[0] - act) < 1e-5
        assert abs(h[32] - math.sqrt(m2 / tp)) < 1e-6
        assert abs(h[64] - math.sqrt(m4 * tp / m2 / m2)) < 1e-4

    def test_all_timedomain(self, trial):
        f = np.asarray(all_timedomain_features(trial))
        assert f.shape == (128,)
        np.testing.assert_allclose(f[:32], (trial**2).sum(0), rtol=1e-5)


class TestFrequencyDomainFeatures:
    def test_welch_matches_scipy(self, trial):
        freqs, pxx = welch_psd(trial, fs=256, nperseg=500, noverlap=125)
        rf, rp = signal.welch(trial.T, fs=256, nperseg=500, noverlap=125)
        np.testing.assert_allclose(freqs, rf)
        np.testing.assert_allclose(np.asarray(pxx), rp, atol=1e-5 * abs(rp).max())

    def test_psd_bands_match_reference_formula(self, trial):
        ours = np.asarray(power_spectral_density(trial, 256))
        rf, rp = signal.welch(trial.T, fs=256, nperseg=500, noverlap=125)
        band = [1, 4, 8, 13, 31, 75]
        ret = []
        for i in range(5):
            sel = (rf >= band[i]) & (rf < band[i + 1])
            ret.append(rp[:, sel].mean(1))
        ref = np.log(np.array(ret) / np.sum(ret, axis=0))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_differential_entropy_matches_reference_formula(self, trial):
        de = np.asarray(differential_entropy(trial, 256))
        band = [1, 4, 8, 13, 31, 70]
        ref = np.zeros((5, 32))
        for i in range(5):
            b, a = signal.butter(3, [band[i] / 128, band[i + 1] / 128], "bandpass")
            sub = np.stack([signal.filtfilt(b, a, trial[:, c]) for c in range(32)])
            var = np.var(sub, axis=1, ddof=1)
            ref[i] = np.log(2 * math.pi * math.e * var) / 2
        np.testing.assert_allclose(de, ref, atol=2e-3)

    def test_bin_power_matches_reference_formula(self, trial):
        band = [1, 4, 8, 13, 31, 75]
        bp = np.asarray(bin_power(trial, 256, band))
        c = np.abs(np.fft.fft(trial[:, 0]))
        n = trial.shape[0]
        ref0 = [
            c[int(np.floor(band[i] / 256 * n)) : int(np.floor(band[i + 1] / 256 * n))].sum()
            for i in range(5)
        ]
        np.testing.assert_allclose(bp[:, 0], ref0, rtol=1e-5)

    def test_all_frequency_features_shape(self, trial):
        f = np.asarray(all_frequency_features(trial))
        assert f.shape == (5, 96)
        assert np.isfinite(f).all()


class TestGraph:
    def test_distance_weights_reference_semantics(self):
        pos = synthetic_electrode_positions(32, seed=1)
        w = distance_weights(pos)
        assert w.shape == (32, 32)
        np.testing.assert_allclose(np.diag(w), 1.0)
        # generic entries match min(1, delta/d^2)
        p = pos / 10.0
        d2 = ((p[2] - p[3]) ** 2).sum()
        assert abs(w[2, 3] - min(1.0, 5.0 / d2)) < 1e-12
        # symmetric pairs shifted by -1
        d2s = ((p[0] - p[16]) ** 2).sum()
        assert abs(w[0, 16] - (min(1.0, 5.0 / d2s) - 1.0)) < 1e-12

    def test_normalize_adjacency(self):
        pos = synthetic_electrode_positions(32, seed=1)
        adj = np.abs(distance_weights(pos))
        norm = np.asarray(normalize_adjacency(adj))
        deg = adj.sum(1)
        ref = adj / np.sqrt(np.outer(deg, deg))
        np.testing.assert_allclose(norm, ref, rtol=1e-5)

    def test_initialize_graph_batched(self, tmp_path):
        adj, gi = initialize_graph(4, 32, cache_dir=str(tmp_path))
        assert adj.shape == (4, 32, 32)
        np.testing.assert_array_equal(np.asarray(gi), graph_indicator(4, 32))
        # cache round-trip
        a2 = create_graph_structure(32, cache_dir=str(tmp_path))
        np.testing.assert_allclose(np.asarray(adj[0]), np.asarray(a2), atol=1e-7)
