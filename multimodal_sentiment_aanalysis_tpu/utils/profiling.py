"""Tracing / profiling / graph-dump utilities.

The reference's only observability is tqdm it/s timing (``Trainer.py:50``)
and hiddenlayer/torchviz graph dumps (``printData.py:1``, the committed
``multimodal_full`` artifacts). The TPU-native equivalents (SURVEY.md §5):

- :func:`timed` / :class:`StepTimer` — ``block_until_ready`` wall-clock
  timing of jitted callables (async dispatch makes naive timing meaningless)
- :func:`trace` — ``jax.profiler`` trace context writing a TensorBoard-
  compatible profile directory
- :func:`dump_jaxpr` / :func:`dump_hlo` — graph dumps of a jitted function
  (the analog of the reference's autograd-graph artifacts)
- :func:`enable_nan_debugging` — ``jax_debug_nans`` as the global analog of
  the reference's per-batch NaN guards (``Trainer.py:63-76``)
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 1, **kwargs):
    """Mean wall-clock seconds per call of a (jitted) callable.

    Blocks on the result each iteration so async dispatch cannot hide work.
    Returns (mean_seconds, last_result).
    """
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return (time.perf_counter() - t0) / iters, result


class StepTimer:
    """Accumulates per-step wall times; reports it/s like the reference tqdm."""

    def __init__(self) -> None:
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc: Any) -> None:
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def rate(self, items_per_step: int = 1) -> float:
        """Items per second (e.g. samples/s at a given batch size)."""
        return items_per_step / self.mean if self.times else 0.0


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def dump_jaxpr(fn: Callable, *example_args, path: str | None = None, **kw) -> str:
    """Render the jaxpr of ``fn`` at the example arguments."""
    text = str(jax.make_jaxpr(fn, **kw)(*example_args))
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def dump_hlo(fn: Callable, *example_args, path: str | None = None,
             optimized: bool = False) -> str:
    """Render StableHLO (or backend-optimized HLO) of ``fn``."""
    lowered = jax.jit(fn).lower(*example_args)
    text = (
        lowered.compile().as_text() if optimized else lowered.as_text()
    )
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def enable_nan_debugging(enable: bool = True) -> None:
    """Global NaN tripwire: any jitted op producing NaN raises immediately
    (the whole-program analog of the reference's skip-batch NaN guards)."""
    jax.config.update("jax_debug_nans", enable)
