"""Functionalized runtime checks (utils/checks.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sentiment_aanalysis_tpu.utils.checks import checkified

pytestmark = pytest.mark.fast


def test_clean_fn_passes_through():
    fn = checkified(lambda x: x * 2 + 1, jit=True)
    np.testing.assert_allclose(fn(jnp.arange(4.0)), [1, 3, 5, 7])


def test_nan_raises():
    fn = checkified(lambda x: jnp.log(x), jit=True)
    with pytest.raises(Exception, match="nan"):
        fn(jnp.asarray([-1.0]))


def test_oob_gather_raises():
    fn = checkified(lambda v, i: jnp.take(v, i, axis=0), jit=True)
    with pytest.raises(Exception, match="out-of-bounds"):
        fn(jnp.arange(3.0), jnp.asarray([10]))


def test_nan_inside_scan_body_is_located():
    """The headline capability vs jax_debug_nans: a scan-compiled loop is
    audited without restructuring — the error surfaces after the call."""

    def epoch(xs):
        def body(c, x):
            return c, jnp.sqrt(x)  # negative x at one step -> NaN

        return jax.lax.scan(body, 0.0, xs)[1]

    xs = jnp.asarray([1.0, 4.0, -9.0, 16.0])
    with pytest.raises(Exception, match="nan"):
        checkified(epoch, jit=True)(xs)
    # clean input runs through the SAME wrapped program
    np.testing.assert_allclose(
        checkified(epoch, jit=True)(jnp.abs(xs)), [1, 2, 3, 4]
    )


def test_vmapped_model_step_audit():
    """checkified composes with vmap (the vectorized-LOSO shape)."""

    def step(w, x):
        return jnp.mean(jnp.log(x @ w))

    ws = jnp.ones((3, 4, 2))
    xs = jnp.ones((3, 5, 4))
    audited = checkified(jax.vmap(step), jit=True)
    assert np.isfinite(np.asarray(audited(ws, xs))).all()
    with pytest.raises(Exception, match="nan"):
        audited(-ws, xs)
