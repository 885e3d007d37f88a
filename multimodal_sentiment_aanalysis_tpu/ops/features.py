"""Feature extraction: time-domain and frequency-domain EEG features.

TPU-native rebuild of reference ``common/feature_extract.py``:

- signal energy (``get_engery``, ``:31-45``)
- Hjorth activity / mobility / complexity (``:47-118``)
- combined time-domain vector (``get_all_timedomain_feature``, ``:121-132``)
- differential entropy per frequency band via Butterworth sub-banding
  (``compute_DE``, ``:138-160``)
- Welch power spectral density per band (``compute_power_spectral_density``,
  ``:162-184``)
- FFT bin power (``compute_bin_power``, ``:186-226``)
- combined frequency-domain matrix (``compute_all_frequency_feature``,
  ``:228-241``)

All functions take one trial as ``(samples, channels)`` (the reference
convention) and are pure jax.numpy — ``batched(fn)`` vmaps any of them over
a leading trial axis so a whole dataset extracts in one XLA program,
replacing the reference's per-channel Python loops.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dsp import butterworth_filter

DEFAULT_BAND = (1, 4, 8, 13, 31, 75)
DE_BAND = (1, 4, 8, 13, 31, 70)


def batched(fn, *args, **kwargs):
    """vmap a per-trial feature fn over a leading (trial/batch) axis."""
    return jax.vmap(partial(fn, *args, **kwargs) if args or kwargs else fn)


# ---------------------------------------------------------------------------
# time domain
# ---------------------------------------------------------------------------

def signal_energy(trial: jnp.ndarray) -> jnp.ndarray:
    """Per-channel energy sum(x^2) (reference ``get_engery``, ``:31-45``)."""
    return jnp.sum(jnp.square(trial), axis=0)


def hjorth_activity(trial: jnp.ndarray) -> jnp.ndarray:
    """Variance of the mean-centered signal (reference ``:47-62``)."""
    centered = trial - trial.mean(axis=0, keepdims=True)
    return jnp.mean(jnp.square(centered), axis=0)


def hjorth_mobility_complexity(trial: jnp.ndarray):
    """Mobility/complexity with the reference's exact formulation
    (``:64-118``): first difference with a 0 inserted at the front,
    TP = sum x^2 (not centered), M4 = mean of squared second differences.
    """
    n = trial.shape[0]
    d = jnp.diff(trial, axis=0)
    d = jnp.concatenate([jnp.zeros_like(trial[:1]), d], axis=0)
    m2 = jnp.sum(jnp.square(d), axis=0) / n
    tp = jnp.sum(jnp.square(trial), axis=0)
    dd = d[1:] - d[:-1]
    m4 = jnp.sum(jnp.square(dd), axis=0) / n
    mobility = jnp.sqrt(m2 / tp)
    complexity = jnp.sqrt(m4 * tp / (m2 * m2))
    return mobility, complexity


def hjorth(trial: jnp.ndarray) -> jnp.ndarray:
    """[activity | mobility | complexity] concat (reference ``:106-118``)."""
    act = hjorth_activity(trial)
    mob, comp = hjorth_mobility_complexity(trial)
    return jnp.concatenate([act, mob, comp])


def all_timedomain_features(trial: jnp.ndarray) -> jnp.ndarray:
    """[energy | activity | mobility | complexity] (reference ``:121-132``)."""
    act = hjorth_activity(trial)
    mob, comp = hjorth_mobility_complexity(trial)
    return jnp.concatenate([signal_energy(trial), act, mob, comp])


# ---------------------------------------------------------------------------
# frequency domain
# ---------------------------------------------------------------------------

def differential_entropy(trial, fs: float = 256, band=DE_BAND) -> jnp.ndarray:
    """Per-band differential entropy log(2*pi*e*var)/2 after Butterworth
    sub-banding (reference ``compute_DE``, ``:138-160``); var uses ddof=1.

    Returns (n_bands, channels) like the reference.
    """
    trial = jnp.asarray(trial)
    x = trial.T  # (channels, samples)
    n = x.shape[1]
    de = []
    for i in range(len(band) - 1):
        sub = butterworth_filter(x, fs, band[i], band[i + 1], order=3)
        var = jnp.sum(jnp.square(sub - sub.mean(axis=1, keepdims=True)), axis=1) / (n - 1)
        de.append(jnp.log(2 * math.pi * math.e * var) / 2)
    return jnp.stack(de)  # (bands, channels)


def _hann_periodic(n: int) -> np.ndarray:
    """Periodic Hann window (scipy ``get_window('hann', n)`` semantics)."""
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def welch_psd(trial, fs: float = 256, nperseg: int = 500, noverlap: int | None = None):
    """Welch PSD of (samples, channels) -> (freqs, (channels, n_freqs)).

    Matches ``scipy.signal.welch(x, fs, nperseg=..., noverlap=...)`` defaults:
    periodic Hann window, constant detrend per segment, density scaling,
    one-sided spectrum.
    """
    trial = jnp.asarray(trial)
    x = trial.T  # (channels, samples)
    n = x.shape[1]
    nperseg = min(nperseg, n)
    if noverlap is None:
        noverlap = nperseg // 2
    step = nperseg - noverlap
    starts = np.arange(0, n - nperseg + 1, step)
    win = _hann_periodic(nperseg)
    scale = 1.0 / (fs * (win**2).sum())

    idx = starts[:, None] + np.arange(nperseg)[None, :]  # (S, nperseg)
    segs = x[:, jnp.asarray(idx)]  # (channels, S, nperseg)
    segs = segs - segs.mean(axis=-1, keepdims=True)  # detrend='constant'
    segs = segs * jnp.asarray(win, segs.dtype)
    spec = jnp.fft.rfft(segs, axis=-1)
    pxx = (spec.real**2 + spec.imag**2) * scale
    # one-sided doubling, except DC and (for even nperseg) Nyquist
    last = pxx.shape[-1] - 1 if nperseg % 2 == 0 else pxx.shape[-1]
    doubler = jnp.ones(pxx.shape[-1]).at[1:last].set(2.0)
    pxx = pxx * doubler
    pxx = pxx.mean(axis=1)  # average over segments
    freqs = np.fft.rfftfreq(nperseg, 1.0 / fs)
    return freqs, pxx


def power_spectral_density(trial, fs: float = 256, band=DEFAULT_BAND,
                           sliding_window: int = 500, overlap: float = 0.25):
    """Log band-power ratios from Welch PSD (reference
    ``compute_power_spectral_density``, ``:162-184``).

    Returns (n_bands, channels).
    """
    noverlap = int(sliding_window * overlap)
    freqs, pxx = welch_psd(trial, fs, sliding_window, noverlap)
    freqs = jnp.asarray(freqs)
    out = []
    for i in range(len(band) - 1):
        sel = (freqs >= band[i]) & (freqs < band[i + 1])
        w = sel.astype(pxx.dtype)
        out.append((pxx * w).sum(axis=1) / jnp.maximum(w.sum(), 1.0))
    ret = jnp.stack(out)  # (bands, channels)
    return jnp.log(ret / ret.sum(axis=0, keepdims=True))


def bin_power(trial, fs: float = 256, band=DEFAULT_BAND) -> jnp.ndarray:
    """Per-band FFT magnitude sums (reference ``compute_bin_power``,
    ``:186-226``). Returns (n_bands, channels) like the reference
    (it vstacks per-channel rows then transposes)."""
    trial = jnp.asarray(trial)
    x = trial.T  # (channels, samples)
    n = x.shape[1]
    c = jnp.abs(jnp.fft.fft(x, axis=1))
    powers = []
    for i in range(len(band) - 1):
        lo = int(np.floor(band[i] / fs * n))
        hi = int(np.floor(band[i + 1] / fs * n))
        powers.append(c[:, lo:hi].sum(axis=1))
    return jnp.stack(powers, axis=0)  # (bands, channels)


def all_frequency_features(trial, fs: float = 256, band=DEFAULT_BAND) -> jnp.ndarray:
    """[PSD | DE | bin_power] concat along the channel axis (reference
    ``compute_all_frequency_feature``, ``:228-241``): each part is
    (bands, channels), giving (bands, 3*channels)."""
    f1 = power_spectral_density(trial, fs, band)
    f2 = differential_entropy(trial, fs, band)
    f3 = bin_power(trial, fs, band)
    return jnp.concatenate([f1, f2, f3], axis=1)
