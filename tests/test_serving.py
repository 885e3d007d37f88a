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


def test_serving_bf16_agrees_with_fp32(rng):
    import jax.numpy as jnp

    eeg = rng.normal(size=(16, 32, 585)).astype(np.float32)
    eye = rng.normal(size=(16, 38)).astype(np.float32)
    pps = rng.normal(size=(16, 230)).astype(np.float32)

    model = MultimodalTransformerModel()
    variables = model.init(jax.random.key(0), eeg[:2], eye[:2], pps[:2])
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    f32 = build_serving_forward(variables, use_pallas=False)
    f16 = build_serving_forward(variables, use_pallas=False,
                                compute_dtype=jnp.bfloat16)
    a32, v32 = f32(eeg, eye, pps)
    a16, v16 = f16(eeg, eye, pps)
    assert a16.dtype == np.float32 and v16.dtype == np.float32
    # bf16 has ~3 decimal digits; logits track loosely and argmax agrees
    np.testing.assert_allclose(np.asarray(a16), np.asarray(a32),
                               rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(v16), np.asarray(v32),
                               rtol=0.1, atol=0.1)
    assert (np.argmax(a16, -1) == np.argmax(a32, -1)).mean() >= 0.9
    assert (np.argmax(v16, -1) == np.argmax(v32, -1)).mean() >= 0.9


def test_export_serving_roundtrip(rng, tmp_path):
    from multimodal_sentiment_aanalysis_tpu.eval.export import (
        export_serving,
        load_serving,
    )

    eeg = rng.normal(size=(8, 32, 585)).astype(np.float32)
    eye = rng.normal(size=(8, 38)).astype(np.float32)
    pps = rng.normal(size=(8, 230)).astype(np.float32)

    model = MultimodalTransformerModel()
    variables = model.init(jax.random.key(0), eeg[:2], eye[:2], pps[:2])
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    fwd = build_serving_forward(variables, use_pallas=False)
    ref_a, ref_v = fwd(eeg, eye, pps)

    # fixed-batch artifact, written to disk, loaded without the model
    p = str(tmp_path / "serving.shlo")
    export_serving(variables, p, batch_size=8, use_pallas=False)
    loaded = load_serving(p)
    out_a, out_v = loaded(eeg, eye, pps)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-5)

    # batch-polymorphic artifact: ONE export serves any batch size
    blob = export_serving(variables)  # batch_size=None
    poly = load_serving(blob)
    a8, _ = poly(eeg, eye, pps)
    a3, v3 = poly(eeg[:3], eye[:3], pps[:3])
    np.testing.assert_allclose(np.asarray(a8), np.asarray(ref_a),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a3), np.asarray(ref_a[:3]),
                               rtol=1e-5, atol=1e-5)
    assert v3.shape == (3, 3)


def test_export_serving_bf16(rng, tmp_path):
    import jax.numpy as jnp

    from multimodal_sentiment_aanalysis_tpu.eval.export import (
        export_serving,
        load_serving,
    )

    eeg = rng.normal(size=(4, 32, 585)).astype(np.float32)
    eye = rng.normal(size=(4, 38)).astype(np.float32)
    pps = rng.normal(size=(4, 230)).astype(np.float32)

    model = MultimodalTransformerModel()
    variables = model.init(jax.random.key(0), eeg[:2], eye[:2], pps[:2])
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    f32 = build_serving_forward(variables, use_pallas=False)
    a32, _ = f32(eeg, eye, pps)

    blob = export_serving(variables, compute_dtype=jnp.bfloat16)
    a16, v16 = load_serving(blob)(eeg, eye, pps)
    assert np.asarray(a16).dtype == np.float32
    np.testing.assert_allclose(np.asarray(a16), np.asarray(a32),
                               rtol=0.1, atol=0.1)


def test_serving_int8_agrees_with_fp32(rng):
    """Int8 PTQ forward (eval/quantization.py): logit closeness + argmax
    agreement vs the fp32 serving forward, both glue dtypes."""
    import jax.numpy as jnp

    from multimodal_sentiment_aanalysis_tpu.eval.quantization import (
        build_quantized_serving_forward,
    )

    eeg = rng.normal(size=(16, 32, 585)).astype(np.float32)
    eye = rng.normal(size=(16, 38)).astype(np.float32)
    pps = rng.normal(size=(16, 230)).astype(np.float32)

    model = MultimodalTransformerModel()
    variables = model.init(jax.random.key(0), eeg[:2], eye[:2], pps[:2])
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    f32 = build_serving_forward(variables, use_pallas=False)
    a32, v32 = (np.asarray(x) for x in f32(eeg, eye, pps))

    for dt in (jnp.bfloat16, jnp.float32):
        q8 = build_quantized_serving_forward(variables, compute_dtype=dt)
        a8, v8 = (np.asarray(x) for x in q8(eeg, eye, pps))
        assert a8.dtype == np.float32 and v8.dtype == np.float32
        # per-channel weights + dynamic row scales: <=10% of logit range
        # (measured 5-7% at init scale on CPU, 2026-08-19)
        for ref, got in ((a32, a8), (v32, v8)):
            assert np.max(np.abs(ref - got)) <= 0.1 * np.max(np.abs(ref))
            assert (np.argmax(ref, -1) == np.argmax(got, -1)).mean() >= 0.9
