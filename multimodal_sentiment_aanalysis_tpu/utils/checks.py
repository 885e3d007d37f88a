"""Functionalized runtime checks (SURVEY §5 race/sanitizer row).

The reference's only numeric guard is a per-batch host-side NaN check
(``Trainer.py:63-76``). This framework keeps two stronger analogs:

- ``utils.profiling.enable_nan_debugging`` — the whole-program
  ``jax_debug_nans`` tripwire (CLI ``--debug-nans``), which aborts on the
  first NaN but interacts poorly with scan-compiled epochs (it re-runs
  the program un-jitted to localize the fault).
- this module — ``jax.experimental.checkify`` wrappers that
  FUNCTIONALIZE the checks: the wrapped program threads an error value
  through ``jit``/``lax.scan``/``vmap`` and re-raises on the host after
  the step, so a whole scan-compiled epoch can be audited without
  changing its structure and without falling back to op-by-op mode.

Coverage note: checkify instruments the jnp paths — including every
Pallas kernel's jnp twin and interpret mode, which the A/B parity tests
in ``tests/test_kernels.py`` pin against the Mosaic build. The
Mosaic-compiled kernel bodies themselves are opaque custom calls; to
audit a fused program, disable kernel dispatch first
(``MSA_FUSED_LSTM=0 MSA_FUSED_STEM=0 MSA_FUSED_INFONCE=0`` or the
``enable_*`` switches) so the identical-math jnp paths run under the
checks.
"""

from __future__ import annotations

import functools

from jax.experimental import checkify as _checkify

#: NaN/Inf production, out-of-bounds gather/scatter, and division by zero.
DEFAULT_CHECKS = (
    _checkify.float_checks | _checkify.index_checks | _checkify.div_checks
)


def checkified(fn, errors=None, jit: bool = False):
    """Wrap ``fn`` to raise on NaN/Inf, OOB indexing, or div-by-zero
    anywhere inside — including ``lax.scan``/``vmap`` bodies.

    Returns a callable with ``fn``'s signature. The checks are
    functionalized (carried as a value through the traced program), then
    re-raised host-side after each call, so the wrapper composes with
    ``jit`` — pass ``jit=True`` to compile the checked program here.

    Example — audit one vectorized train epoch::

        from multimodal_sentiment_aanalysis_tpu.ops import rnn
        rnn.enable_fused_dispatch(False)   # run the jnp twin under checks
        audited = checkified(trainer._epoch_fn, jit=True)
        audited(params, opt_state, ...)    # raises on the first bad value
    """
    errs = DEFAULT_CHECKS if errors is None else errors
    checked = _checkify.checkify(fn, errors=errs)
    if jit:
        import jax

        checked = jax.jit(checked)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()  # no-op when clean; JaxRuntimeError with location else
        return out

    return wrapper
