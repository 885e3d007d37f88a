"""Signal-processing ops: IIR filtering, normalization, windowing, alignment.

TPU-native rebuild of the reference DSP toolbox ``common/data_process.py``:

- Butterworth band-pass in two calling conventions
  (``filter_data`` sample-major, ``common/data_process.py:8-25``;
  ``butterworth_filter`` channel-major with cutoff clamping, ``:27-55``)
- IIR notch (``filter_data_notch``, ``:57-75``)
- per-trial min-max / z-score normalization (``:77-94``)
- sliding-window augmentation (``re_data_slide``, ``:96-136``)
- EEG/eye sample-rate alignment (``data_align``, ``:138-157``)
- dependent/independent trial split (``split_train_test_unimodal``, ``:159-202``)

Design: filter COEFFICIENTS are designed on the host (scipy, microseconds of
scalar math), but the FILTERING — the O(channels x time) hot loop the
reference runs channel-by-channel in Python — is a jitted, vmapped
``lax.scan`` implementing zero-phase ``filtfilt`` with scipy-compatible odd
padding and steady-state initial conditions. Whole (batch, channel, time)
stacks filter in one XLA program.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# host-side filter design (coefficients only; scipy does scalar math here)
# ---------------------------------------------------------------------------

def butter_bandpass(order: int, low: float, high: float, fs: float):
    """Butterworth band-pass (b, a) with cutoffs in Hz."""
    from scipy import signal

    b, a = signal.butter(order, [2 * low / fs, 2 * high / fs], "bandpass")
    return np.asarray(b), np.asarray(a)


def iirnotch(notch_freq: float, q: float, fs: float):
    """IIR notch (b, a) at ``notch_freq`` Hz with quality factor ``q``."""
    from scipy import signal

    b, a = signal.iirnotch(w0=notch_freq / (fs / 2), Q=q)
    return np.asarray(b), np.asarray(a)


# ---------------------------------------------------------------------------
# device-side filtering
#
# High-order Butterworth band-passes with low cutoffs are numerically
# UNSTABLE in float32 transposed-direct-form (the (b, a) recursion the
# reference's scipy runs in float64).  TPUs are float32 machines, so the
# filter runs as a cascade of second-order sections (biquads) instead —
# stable in float32 and still one fused lax.scan over time.
# ---------------------------------------------------------------------------

def _sosfilt_1d(sos: jnp.ndarray, x: jnp.ndarray, zi: jnp.ndarray):
    """Cascaded-biquad IIR filter over a 1-D signal via lax.scan.

    ``sos``: (S, 6) scipy second-order-section rows [b0 b1 b2 1 a1 a2];
    ``zi``: (S, 2) per-section transposed-direct-form-II state.
    """
    n_sections = sos.shape[0]

    def step(z, xt):
        new_z = []
        for s in range(n_sections):
            b0, b1, b2, _, a1, a2 = (sos[s, i] for i in range(6))
            yt = b0 * xt + z[s, 0]
            z0 = b1 * xt - a1 * yt + z[s, 1]
            z1 = b2 * xt - a2 * yt
            new_z.append(jnp.stack([z0, z1]))
            xt = yt
        return jnp.stack(new_z), xt

    _, y = jax.lax.scan(step, zi, x)
    return y


def _filtfilt_1d(sos: jnp.ndarray, zi: jnp.ndarray, padlen: int, x: jnp.ndarray):
    """Zero-phase filtering of a 1-D signal, scipy ``filtfilt`` semantics
    (odd extension of length ``padlen`` at both ends)."""
    left = 2 * x[0] - x[1 : padlen + 1][::-1]
    right = 2 * x[-1] - x[-padlen - 1 : -1][::-1]
    ext = jnp.concatenate([left, x, right])
    y = _sosfilt_1d(sos, ext, zi * ext[0])
    y = _sosfilt_1d(sos, y[::-1], zi * y[-1])[::-1]
    return y[padlen:-padlen]


def filtfilt(b, a, x, axis: int = -1):
    """Zero-phase IIR filter along ``axis``; vmapped over all other axes.

    Matches ``scipy.signal.filtfilt(b, a, x)`` to float32 tolerance.  The
    (b, a) transfer function is factored into second-order sections on the
    host; the filtering itself is a jitted scan, batched over every other
    axis, so a whole (batch, channel, time) stack runs in one XLA program.
    """
    from scipy import signal

    sos = signal.tf2sos(np.asarray(b, np.float64), np.asarray(a, np.float64))
    zi = signal.sosfilt_zi(sos)  # (S, 2), steady-state for unit input
    padlen = 3 * max(len(np.atleast_1d(a)), len(np.atleast_1d(b)))
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    sos_d = jnp.asarray(sos, dtype)
    zi_d = jnp.asarray(zi, dtype)
    x = jnp.asarray(x, dtype)
    x = jnp.moveaxis(x, axis, -1)
    lead = x.shape[:-1]
    flat = x.reshape((-1, x.shape[-1]))
    y = jax.jit(jax.vmap(partial(_filtfilt_1d, sos_d, zi_d, padlen)))(flat)
    return jnp.moveaxis(y.reshape(lead + (x.shape[-1],)), -1, axis)


def filter_data(low: float, high: float, data, fs: float = 250):
    """Band-pass, sample-major ``(time, channels)`` convention
    (reference ``filter_data``, ``common/data_process.py:8-25``)."""
    b, a = butter_bandpass(4, low, high, fs)
    return filtfilt(b, a, jnp.asarray(data), axis=0)


def butterworth_filter(data_raw, fs: float, lcf: float = 1, hcf: float = 70,
                       order: int = 4):
    """Band-pass, channel-major ``(channels, time)`` convention with the
    reference's cutoff clamping (``common/data_process.py:27-55``).

    Documented deviation: the reference clamps ``hcf`` to exactly ``fs/2``,
    which scipy's filter design rejects (normalized cutoff must be < 1);
    here it clamps just below Nyquist so the clamped path actually works.
    """
    if hcf >= fs / 2:
        hcf = 0.999 * fs / 2
    if lcf <= 0 or lcf > fs / 2 or lcf >= hcf:
        lcf = 2
    b, a = butter_bandpass(order, lcf, hcf, fs)
    return filtfilt(b, a, jnp.asarray(data_raw), axis=-1)


def filter_data_notch(notch_freq: float, q: float, data, fs: float = 250):
    """Notch filter, sample-major convention
    (reference ``filter_data_notch``, ``common/data_process.py:57-75``)."""
    b, a = iirnotch(notch_freq, q, fs)
    return filtfilt(b, a, jnp.asarray(data), axis=0)


# ---------------------------------------------------------------------------
# normalization (reference :77-94) — batched, jittable
# ---------------------------------------------------------------------------

@jax.jit
def min_max_trial(trial: jnp.ndarray) -> jnp.ndarray:
    """Per-window, per-channel min-max to [0, 1]; input (windows, time, ch)."""
    lo = trial.min(axis=1, keepdims=True)
    hi = trial.max(axis=1, keepdims=True)
    rng = jnp.where(hi - lo == 0, 1.0, hi - lo)
    return (trial - lo) / rng


@jax.jit
def z_score_trial(trial: jnp.ndarray) -> jnp.ndarray:
    """Per-window, per-channel z-score (sklearn ``preprocessing.scale``
    semantics: population std, std==0 -> leave centered)."""
    mean = trial.mean(axis=1, keepdims=True)
    std = trial.std(axis=1, keepdims=True)
    std = jnp.where(std == 0, 1.0, std)
    return (trial - mean) / std


# ---------------------------------------------------------------------------
# sliding-window augmentation (reference :96-136)
# ---------------------------------------------------------------------------

def sliding_window_indices(n_samples: int, win_len: int, overlap: float):
    """Start indices of the reference's augmentation windows.

    Reproduces the exact loop bounds of ``re_data_slide``
    (``common/data_process.py:114-126``) including the quirk that the loop
    condition tests the PREVIOUS window's end, so the final window may
    overrun and is clipped by Python slicing semantics in the reference;
    here overrunning windows are dropped for static shapes, which matches
    because ``len(trial) - win_len`` bounds guarantee in-range windows for
    step sizes dividing the range.
    """
    if overlap == 0:
        win_num = n_samples // win_len
        return np.arange(win_num) * win_len
    step = int(win_len * (1 - overlap))
    starts = []
    start = end = 0
    while end < n_samples - win_len:
        end = start + win_len
        starts.append(start)
        start += step
    return np.asarray([s for s in starts if s + win_len <= n_samples], np.int64)


def re_data_slide(trial, label, win_len: int, overlap: float,
                  is_filter: bool = False, norm_method: str | None = None):
    """Sliding-window augmentation of one trial -> (windows, win_len, ch).

    Index plan on host, gather + filter + normalize on device in one program
    (reference does this per window in Python).
    """
    trial = jnp.asarray(trial)
    if is_filter:
        trial = filter_data(1, 50, trial)
        trial = filter_data_notch(60, 5, trial)
    starts = sliding_window_indices(trial.shape[0], win_len, overlap)
    idx = starts[:, None] + np.arange(win_len)[None, :]
    windows = jnp.take(trial, jnp.asarray(idx), axis=0)  # (W, win_len, ch)
    if norm_method == "min_max":
        windows = min_max_trial(windows)
    elif norm_method == "z_score":
        windows = z_score_trial(windows)
    new_label = np.asarray([label] * windows.shape[0])
    return windows, new_label


def data_align(eeg_data, eye_track_data, f1: float = 256, f2: float = 60):
    """Clip two modality streams to the same wall-clock duration
    (reference ``data_align``, ``common/data_process.py:138-157``)."""
    t1 = len(eeg_data) / f1
    t2 = len(eye_track_data) / f2
    t = min(t1, t2)
    return eeg_data[: int(t * f1)], eye_track_data[: int(t * f2)]


def split_train_test_unimodal(data, label, mode: str, split_rate: float = 0.7,
                              random_seed: int = 11):
    """Dependent/independent trial-level split (reference
    ``common/data_process.py:159-202``), bit-matching its ``random.shuffle``
    index order."""
    import random as _random

    data = np.asarray(data)
    label = np.asarray(label)
    if mode == "dependent":
        indices = list(range(len(data)))
        _random.seed(random_seed)
        _random.shuffle(indices)
        split_idx = int(math.floor((1 - split_rate) * len(indices)))
        train_idx, test_idx = indices[split_idx:], indices[:split_idx]
        return data[train_idx], label[train_idx], data[test_idx], label[test_idx]
    if mode == "independent":
        tr_d, tr_l, te_d, te_l = [], [], [], []
        for item in range(len(data)):
            indices = list(range(len(data[item])))
            _random.seed(random_seed)
            _random.shuffle(indices)
            split_idx = int(math.floor((1 - split_rate) * len(indices)))
            train_idx, test_idx = indices[split_idx:], indices[:split_idx]
            tr_d.append(data[item][train_idx])
            tr_l.append(label[item][train_idx])
            te_d.append(data[item][test_idx])
            te_l.append(label[item][test_idx])
        return (np.concatenate(tr_d), np.concatenate(tr_l),
                np.concatenate(te_d), np.concatenate(te_l))
    raise ValueError(f"unknown mode {mode!r}")
