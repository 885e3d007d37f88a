"""Pre-flight composition validation in disposable subprocesses.

Part of the failure-detection/recovery subsystem (SURVEY.md §5; the
reference has no counterpart — net-new, prompted by the round-2 review's
"dispatch guard" ask). The fused TPU kernels carry a characterized,
XLA-schedule-dependent runtime fault class (``kernels/lstm.py`` "Known
issue"): a handful of *profiling-only* compositions fault at run time
with "TPU device error", and WHICH composition faults shifts with any
change to the surrounding graph. Every production program is validated
clean per revision, but a NEW composition (a changed objective, a new
ablation, different model dims) has no such guarantee — and a TPU device
fault poisons the whole client process, so it cannot be probed
in-process.

This module makes that validation a first-class, scriptable operation:

- :func:`run_canary` executes a named zero-arg callable in a FRESH
  python subprocess and reports clean/fault without risking the caller.
- :func:`default_canary` is the shipped canary: a fused-dispatch
  vectorized-LOSO training invocation at flagship model dims on the
  synthetic dataset — the composition every production trainer embeds.
  (On the TPU tunnel one canary costs a compile, typically 1–5 min.)
- :func:`ensure_safe_dispatch` walks the documented mitigation ladder
  (full fused → ``MSA_LSTM_BWDC=0`` → ``MSA_LSTM_XPROJ=0`` →
  ``MSA_FUSED_LSTM=0`` → all kernels off) until a canary runs clean,
  then applies the winning switches to the CURRENT process (both the
  in-process dispatch globals and ``os.environ``, so later subprocesses
  inherit) and returns the per-rung results.

CLI: training subcommands accept ``--preflight`` (see ``cli.py``), and
the module runs standalone::

    python -m multimodal_sentiment_aanalysis_tpu.utils.preflight \
        [--target pkg.mod:callable] [--ladder] [--timeout 1800]
"""

from __future__ import annotations

import dataclasses
import os
import subprocess
import sys
from typing import Mapping, Sequence

DEFAULT_TARGET = (
    "multimodal_sentiment_aanalysis_tpu.utils.preflight:default_canary"
)

#: Mitigation ladder from kernels/lstm.py (fault-class history), cheapest
#: revert first: v9→v8 segmented backward, v7→v6 backward split, v6→v5
#: input projection, the all-jnp LSTM, and finally every Pallas kernel
#: off. (Rounds 3-4 carried an ``MSA_INFONCE_MULTI=0`` rung for a
#: quarantined stacked-InfoNCE kernel; the r5 bisection attributed that
#: fault to THIS ladder's LSTM family — the restructured contrastive
#: graph crashed even in pure jnp, and ran clean with the fused LSTM off
#: — and the stacked path was deleted, so the rung is gone with it.)
MITIGATION_LADDER: tuple[dict[str, str], ...] = (
    {},
    {"MSA_LSTM_SEGBWD": "0"},
    {"MSA_LSTM_BWDC": "0"},
    {"MSA_LSTM_XPROJ": "0"},
    {"MSA_FUSED_LSTM": "0"},
    {"MSA_FUSED_LSTM": "0", "MSA_FUSED_STEM": "0",
     "MSA_FUSED_INFONCE": "0"},
)


@dataclasses.dataclass(frozen=True)
class PreflightResult:
    ok: bool
    returncode: int | None  # None = timeout
    env: dict[str, str]  # overrides the canary ran under
    output_tail: str  # last lines of the child's merged stdout/stderr

    def describe(self) -> str:
        tag = "clean" if self.ok else (
            "TIMEOUT" if self.returncode is None else f"rc={self.returncode}"
        )
        env = " ".join(f"{k}={v}" for k, v in self.env.items()) or "(default)"
        return f"[{tag}] {env}"


def run_canary(
    target: str = DEFAULT_TARGET,
    env: Mapping[str, str] | None = None,
    timeout: float = 1800.0,
    tail_lines: int = 30,
) -> PreflightResult:
    """Run ``module:callable`` (zero-arg) in a fresh python subprocess.

    A device fault kills the child — never this process. ``ok`` means the
    child exited 0 within ``timeout`` seconds. The child inherits this
    process's environment with ``env`` overlaid.
    """
    mod, _, fn = target.partition(":")
    if not (mod and fn):
        raise ValueError(f"target must be 'module:callable', got {target!r}")
    code = (
        "import importlib, sys\n"
        f"importlib.import_module({mod!r}).{fn}()\n"
    )
    child_env = dict(os.environ)
    child_env.update(env or {})
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=child_env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            timeout=timeout,
            text=True,
            errors="replace",
        )
        rc: int | None = proc.returncode
        out = proc.stdout or ""
    except subprocess.TimeoutExpired as e:
        rc = None
        raw = e.stdout or b""
        out = raw.decode(errors="replace") if isinstance(raw, bytes) else raw
    tail = "\n".join(out.splitlines()[-tail_lines:])
    return PreflightResult(
        ok=rc == 0, returncode=rc, env=dict(env or {}), output_tail=tail
    )


def apply_dispatch_env(env: Mapping[str, str]) -> None:
    """Apply a mitigation rung to the CURRENT process.

    Sets both ``os.environ`` (so subprocesses inherit) and the in-process
    dispatch switches (the ``MSA_*`` env vars are read once at module
    import, so a live process must flip the globals too).
    """
    os.environ.update(env)
    from ..kernels import conv_stem_train as _cst
    from ..kernels import lstm as _lstm
    from ..ops import losses as _losses
    from ..ops import rnn as _rnn

    if env.get("MSA_FUSED_LSTM") == "0":
        _rnn.enable_fused_dispatch(False)
    if env.get("MSA_LSTM_XPROJ") == "0":
        _lstm._XPROJ_ENABLED = False
    if env.get("MSA_LSTM_SEGBWD") == "0":
        _lstm._SEGBWD_ENABLED = False
    if env.get("MSA_LSTM_BWDC") == "0":
        _lstm._BWDC_ENABLED = False
    if env.get("MSA_FUSED_STEM") == "0":
        _cst.enable_dispatch(False)
    if env.get("MSA_FUSED_INFONCE") == "0":
        _losses.enable_fused_infonce(False)


def ensure_safe_dispatch(
    target: str = DEFAULT_TARGET,
    ladder: Sequence[Mapping[str, str]] = MITIGATION_LADDER,
    timeout: float = 1800.0,
    verbose: bool = True,
) -> tuple[dict[str, str] | None, list[PreflightResult]]:
    """Walk the mitigation ladder until a canary runs clean.

    Returns ``(winning_env, results)``. On success the winning rung is
    applied to the current process via :func:`apply_dispatch_env` (the
    first rung is empty, so the common all-clean case changes nothing).
    ``winning_env is None`` means no rung passed — the composition fails
    even with every kernel off, i.e. the problem is not kernel dispatch.
    """
    results: list[PreflightResult] = []
    for rung in ladder:
        res = run_canary(target, env=rung, timeout=timeout)
        results.append(res)
        if verbose:
            print(f"preflight {res.describe()}", file=sys.stderr, flush=True)
        if res.ok:
            apply_dispatch_env(dict(rung))
            return dict(rung), results
    return None, results


# ---------------------------------------------------------------------------
# shipped canaries
# ---------------------------------------------------------------------------


def default_canary() -> None:
    """One fused-dispatch vectorized-LOSO training invocation, flagship
    model dims (BiLSTM hidden 128, T=585 — the shapes every fused kernel
    dispatches at on TPU), 6 synthetic subjects, 2 chained epochs.

    This is the composition the production trainers embed: gather →
    forward (fused stem + fused LSTM + fused InfoNCE) → backward → clip →
    AdamW → metrics, scanned over batches and epochs. Exits 0 iff the
    program compiles AND executes cleanly; a device fault kills this
    process, which the parent reports as a failed rung.
    """
    import numpy as np

    import jax

    from ..data import (
        DeviceDataset,
        assemble_features,
        make_synthetic_hci_data,
    )
    from ..models import MultimodalTransformerModel
    from ..train import VectorizedLOSOTrainer

    data = make_synthetic_hci_data(seed=0, n_subjects=6, ex_nums=20)
    feats, _ = assemble_features(
        data, ["eeg", "eye", "pps"], norm="Z_score", label_type="arousal"
    )
    arrays = {
        "eeg": feats["eeg"].astype(np.float32),
        "eye": feats["eye"].astype(np.float32),
        "pps": feats["pps"].astype(np.float32),
        "arousal": np.asarray(data["arousal_label"]).reshape(-1).astype(np.int64),
        "valence": np.asarray(data["valence_label"]).reshape(-1).astype(np.int64),
    }
    trainer = VectorizedLOSOTrainer(
        MultimodalTransformerModel(), DeviceDataset(arrays), 6, 20,
        batch_size=64,
    )
    trainer.train_epochs_fused(2)
    # Force completion with a host transfer: jax.block_until_ready is not
    # a reliable barrier over the axon tunnel (see bench.py::_sync).
    np.asarray(jax.tree.leaves(trainer.params)[0]).ravel()[0]


# selftest targets for the unit tests (cheap, no TPU, no model build)
def _selftest_clean() -> None:
    pass


def _selftest_fault() -> None:
    # simulate a device fault killing the worker (SIGABRT-style exit)
    os._exit(134)


def _selftest_env_gated() -> None:
    """Faults unless the all-jnp rung is active — exercises the ladder."""
    if os.environ.get("MSA_FUSED_LSTM") != "0":
        os._exit(134)


def _main(argv: Sequence[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--target", default=DEFAULT_TARGET,
                    help="module:callable to validate (zero-arg)")
    ap.add_argument("--ladder", action="store_true",
                    help="walk the mitigation ladder instead of one run")
    ap.add_argument("--timeout", type=float, default=1800.0)
    args = ap.parse_args(argv)
    if args.ladder:
        win, results = ensure_safe_dispatch(args.target, timeout=args.timeout)
        for r in results:
            print(r.describe())
        if win is None:
            print("no rung passed — not a kernel-dispatch problem")
            return 1
        print(f"safe dispatch: {win or '(default — all kernels on)'}")
        return 0
    res = run_canary(args.target, timeout=args.timeout)
    print(res.describe())
    if not res.ok:
        print(res.output_tail)
    return 0 if res.ok else 1


if __name__ == "__main__":
    raise SystemExit(_main())
