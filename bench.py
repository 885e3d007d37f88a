"""Benchmark harness.

Measures end-to-end training throughput (samples/sec/chip) of the full
multimodal training step — forward incl. the three supervised-contrastive
losses, backward, clip, AdamW update — at the reference's shapes
(EEG (B,32,585), eye (B,38), pps (B,230)) and batch size 64.

Baseline: the reference's committed run logs give 1.66–2.08 s/iteration at
batch 64 (~31–36 samples/s end-to-end; BASELINE.md, derived from
``train.txt:15`` et seq.).  ``vs_baseline`` is the speedup over the 33.5
samples/s midpoint.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 33.5  # reference end-to-end training throughput
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
        loso_split,
        make_synthetic_hci_data,
    )
    from multimodal_sentiment_aanalysis_tpu.models import (
        MultimodalTransformerModel,
    )
    from multimodal_sentiment_aanalysis_tpu.train import Trainer

    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind})")

    data = make_synthetic_hci_data(seed=42)
    feats, _ = assemble_features(
        data, ["eeg", "eye", "pps"], norm="Z_score", label_type="arousal"
    )
    arousal = np.asarray(data["arousal_label"]).reshape(-1).astype(np.int64)
    valence = np.asarray(data["valence_label"]).reshape(-1).astype(np.int64)
    arrays = {
        "eeg": feats["eeg"].astype(np.float32),
        "eye": feats["eye"].astype(np.float32),
        "pps": feats["pps"].astype(np.float32),
        "arousal": arousal,
        "valence": valence,
    }
    n_subjects = arousal.shape[0] // 20
    train_idx, test_idx = loso_split(n_subjects, 20, 0)
    full = DeviceDataset(arrays)
    train_ds, test_ds = full.subset(train_idx), full.subset(test_idx)

    trainer = Trainer(
        model=MultimodalTransformerModel(),
        train_data=train_ds,
        test_data=test_ds,
        batch_size=BATCH,
        checkpoint_dir="/tmp",
        verbose=False,
    )

    # warm-up: compiles the scanned epoch program (2 epochs so any
    # signature-change recompile is absorbed before timing)
    t0 = time.perf_counter()
    for e in range(WARMUP_EPOCHS):
        trainer.train_epoch(e)
    jax.block_until_ready(trainer.params)
    log(f"compile+{WARMUP_EPOCHS} warm-up epochs: {time.perf_counter() - t0:.1f}s")

    steps_per_epoch = -(-len(train_ds) // BATCH)
    t0 = time.perf_counter()
    for e in range(TIMED_EPOCHS):
        trainer.train_epoch(e + 1)
    jax.block_until_ready(trainer.params)
    elapsed = time.perf_counter() - t0

    n_samples = TIMED_EPOCHS * len(train_ds)
    samples_per_sec = n_samples / elapsed
    log(
        f"{TIMED_EPOCHS} epochs x {steps_per_epoch} steps (batch {BATCH}) in "
        f"{elapsed:.3f}s -> {samples_per_sec:.1f} samples/s"
    )

    print(
        json.dumps(
            {
                "metric": "train_throughput_full_multimodal_step_b64",
                "value": round(samples_per_sec, 1),
                "unit": "samples/sec/chip",
                "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
