"""Benchmark harness.

Headline metric: end-to-end LOSO training throughput. The reference's only
published numbers are from its leave-one-subject-out experiment loop —
24 sequentially trained models at 1.66–2.08 s/iteration, batch 64
(~31–36 samples/s end-to-end; BASELINE.md, derived from ``train.txt:15``).
The TPU-native equivalent trains all 24 LOSO models in ONE vmapped program
(:class:`train.vloso.VectorizedLOSOTrainer`) over the device-resident
dataset; throughput counts the same unit the reference's number counts —
training samples consumed per second across the LOSO experiment.

``vs_baseline`` is the speedup over the 33.5 samples/s midpoint.
A secondary single-model step throughput is logged to stderr.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 33.5  # reference end-to-end LOSO training rate
BATCH = 64
WARMUP_EPOCHS = 2
TIMED_EPOCHS = 20


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from multimodal_sentiment_aanalysis_tpu.data import (
        DeviceDataset,
        assemble_features,
        make_synthetic_hci_data,
    )
    from multimodal_sentiment_aanalysis_tpu.models import (
        MultimodalTransformerModel,
    )
    from multimodal_sentiment_aanalysis_tpu.train import VectorizedLOSOTrainer

    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind})")

    data = make_synthetic_hci_data(seed=42)
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
    n_subjects = arrays["arousal"].shape[0] // 20
    ds = DeviceDataset(arrays)

    trainer = VectorizedLOSOTrainer(
        MultimodalTransformerModel(), ds, n_subjects, 20, batch_size=BATCH
    )

    t0 = time.perf_counter()
    for _ in range(WARMUP_EPOCHS):
        trainer.train_epoch()
    jax.block_until_ready(trainer.params)
    log(f"compile+{WARMUP_EPOCHS} warm-up epochs: {time.perf_counter() - t0:.1f}s")

    n_train = trainer.train_idx.shape[1]
    samples_per_epoch = n_subjects * (n_train // BATCH) * BATCH
    t0 = time.perf_counter()
    for _ in range(TIMED_EPOCHS):
        trainer.train_epoch()
    jax.block_until_ready(trainer.params)
    elapsed = time.perf_counter() - t0

    samples_per_sec = TIMED_EPOCHS * samples_per_epoch / elapsed
    log(
        f"{TIMED_EPOCHS} epochs x {n_subjects} LOSO models "
        f"(batch {BATCH}) in {elapsed:.3f}s -> {samples_per_sec:.0f} samples/s"
    )
    ev = trainer.evaluate()
    log(f"sanity eval: mean arousal acc {float(ev['a_acc'].mean()):.2%}")

    print(
        json.dumps(
            {
                "metric": "e2e_loso_train_throughput_b64",
                "value": round(samples_per_sec, 1),
                "unit": "samples/sec/chip",
                "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
