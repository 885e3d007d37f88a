"""Serving-forward batch sweep (VERDICT r2 item 10).

bench.py measured 0.97 ms/batch-64 at ~6.3% MFU; this sweeps the batch
size to see whether the seq-1-collapsed forward is latency/gather-bound
(throughput should climb with batch if so) and where it saturates.
Each config runs SERVE_K distinct gathered batches inside one scan
(fresh random plans per invocation; results forced to host).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SERVE_K = 100
BATCHES = (8, 32, 64, 128, 256, 512)

# --batches=1024,2048 overrides the sweep points. --pallas-stem /
# --xla-stem force the fp32 forward's stem (default follows
# build_serving_forward: XLA, after the 2026-08-18 A/B found the Pallas
# serving stem loses at every batch size — table in eval/serving.py).
for _a in sys.argv:
    if _a.startswith("--batches="):
        BATCHES = tuple(int(x) for x in _a.split("=", 1)[1].split(","))


def main():
    from multimodal_sentiment_aanalysis_tpu.data import (
        DeviceDataset,
        assemble_features,
        make_synthetic_hci_data,
    )
    from multimodal_sentiment_aanalysis_tpu.eval.serving import (
        build_serving_forward,
    )
    from multimodal_sentiment_aanalysis_tpu.models import (
        MultimodalTransformerModel,
    )

    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)

    data = make_synthetic_hci_data(seed=42)
    feats, _ = assemble_features(
        data, ["eeg", "eye", "pps"], norm="Z_score", label_type="arousal"
    )
    arrays = {
        "eeg": feats["eeg"].astype(np.float32),
        "eye": feats["eye"].astype(np.float32),
        "pps": feats["pps"].astype(np.float32),
    }
    ds = DeviceDataset(arrays)

    model = MultimodalTransformerModel()
    variables = model.init(
        jax.random.key(0), arrays["eeg"][:2], arrays["eye"][:2],
        arrays["pps"][:2],
    )
    v = {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}
    fwd = build_serving_forward(
        v, use_pallas=True if "--pallas-stem" in sys.argv
        else (False if "--xla-stem" in sys.argv else None))
    if "--bf16" in sys.argv or "--int8" in sys.argv:
        fwd32 = fwd
        if "--int8" in sys.argv:
            from multimodal_sentiment_aanalysis_tpu.eval.quantization import (
                build_quantized_serving_forward,
            )

            lbl = "int8"
            fwd = build_quantized_serving_forward(v)
        else:
            lbl = "bf16"
            fwd = build_serving_forward(v, compute_dtype=jnp.bfloat16)
        # argmax agreement vs the fp32 forward on one big batch
        probe = {k: a[:256] for k, a in ds.arrays.items()}
        a32, v32 = fwd32(probe["eeg"], probe["eye"], probe["pps"])
        a16, v16 = fwd(probe["eeg"], probe["eye"], probe["pps"])
        agree = float(np.mean(
            (np.argmax(a32, -1) == np.argmax(a16, -1))
            & (np.argmax(v32, -1) == np.argmax(v16, -1))))
        print(f"{lbl} argmax agreement vs fp32 (B=256): {agree:.4f}",
              flush=True)
    pool = ds.arrays
    rng = np.random.default_rng(3)

    for b in BATCHES:
        @jax.jit
        def serve_many(idxs):
            def body(_, idx):
                a, v = fwd(
                    jnp.take(pool["eeg"], idx, axis=0),
                    jnp.take(pool["eye"], idx, axis=0),
                    jnp.take(pool["pps"], idx, axis=0),
                )
                return None, (a.argmax(-1).sum(), v.argmax(-1).sum())

            return jax.lax.scan(body, None, idxs)[1]

        plan = lambda: jnp.asarray(
            rng.integers(0, ds.n, (SERVE_K, b)).astype(np.int32))
        out = serve_many(plan())
        _ = float(out[0].sum())  # host sync forces real execution
        best = 1e9
        for _i in range(3):
            t0 = time.perf_counter()
            out = serve_many(plan())
            _ = float(out[0].sum()) + float(out[1].sum())
            best = min(best, time.perf_counter() - t0)
        lat = best / SERVE_K * 1e3
        print(f"B={b:4d}: {lat:7.3f} ms/batch, "
              f"{SERVE_K * b / best:9.0f} samples/s", flush=True)


if __name__ == "__main__":
    main()
