"""Serving engine parity: fused/collapsed inference forward vs model.apply."""

import jax
import numpy as np

from multimodal_sentiment_aanalysis_tpu.eval.serving import build_serving_forward
from multimodal_sentiment_aanalysis_tpu.models import MultimodalTransformerModel


def test_serving_matches_model_apply(rng):
    eeg = rng.normal(size=(6, 32, 585)).astype(np.float32)
    eye = rng.normal(size=(6, 38)).astype(np.float32)
    pps = rng.normal(size=(6, 230)).astype(np.float32)

    model = MultimodalTransformerModel()
    variables = model.init(jax.random.key(0), eeg[:2], eye[:2], pps[:2])
    # make running stats non-trivial so BN folding is actually exercised
    variables = jax.tree.map(lambda x: x, variables)  # unfreeze-safe copy
    bs = jax.tree.map(
        lambda x: x + 0.05 * np.float32(1.0), variables["batch_stats"]
    )
    variables = {"params": variables["params"], "batch_stats": bs}

    ref_a, ref_v = model.apply(variables, eeg, eye, pps)

    # jnp fallback path (exactly the serving math, no pallas)
    fwd = build_serving_forward(variables, use_pallas=False)
    out_a, out_v = fwd(eeg, eye, pps)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v),
                               rtol=1e-4, atol=1e-4)

    # pallas kernels in interpret mode on CPU
    fwd_k = build_serving_forward(variables, use_pallas=True)
    k_a, k_v = fwd_k(eeg, eye, pps)
    np.testing.assert_allclose(np.asarray(k_a), np.asarray(ref_a),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(k_v), np.asarray(ref_v),
                               rtol=1e-4, atol=1e-4)
