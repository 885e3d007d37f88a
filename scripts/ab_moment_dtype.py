"""A/B: Adam moment storage dtype (fp32 vs bf16) in the fused vloso program.

The optimizer update is HBM-roofline-bound (CLAUDE.md step budget: 4.5 ms
of the fp32 step for 3.8 GB/update of read{p,g,m,v}+write{p,m,v}); storing
m/v in bfloat16 (:func:`train.state.adamw_lowp`) removes ~1.4 GB of that
traffic. This times the same fused 20-epoch vloso program per (compute
dtype, moment dtype) combo.

Usage: python scripts/ab_moment_dtype.py [--dtypes bfloat16,float32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 64
EPOCHS = 20


from multimodal_sentiment_aanalysis_tpu.utils.timing import host_sync as _sync


def run_config(name, model_cls, ds, n_subjects, dtype, moment_dtype):
    import jax

    from multimodal_sentiment_aanalysis_tpu.train import VectorizedLOSOTrainer

    trainer = VectorizedLOSOTrainer(
        model_cls(), ds, n_subjects, 20, batch_size=BATCH,
        compute_dtype=dtype, moment_dtype=moment_dtype,
    )
    fused = trainer._build_fused(EPOCHS)
    args = (trainer.params, trainer.batch_stats, trainer.opt_state,
            trainer.dropout_keys, jax.random.key(7))
    t0 = time.perf_counter()
    compiled = fused.lower(*args).compile()
    compile_s = time.perf_counter() - t0

    p, bs, opt, dk, _ = compiled(*args)
    _sync(p)
    t0 = time.perf_counter()
    p, bs, opt, dk, _ = compiled(p, bs, opt, dk, jax.random.key(8))
    _sync(p)
    elapsed = time.perf_counter() - t0

    # sanity: the low-precision run must still train (finite params + acc)
    trainer.params, trainer.batch_stats = p, bs
    ev = trainer.evaluate()
    acc = float(np.mean(ev["a_acc"]))

    n_train = trainer.train_idx.shape[1]
    sps = EPOCHS * trainer.n_total * n_train / elapsed
    print(f"{name:36s} compile {compile_s:6.1f}s  {elapsed:6.3f}s -> "
          f"{sps:8.0f} samples/s  (20-epoch arousal acc {acc:.2%})",
          flush=True)
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtypes", default="bfloat16")
    args = ap.parse_args()

    import jax

    from multimodal_sentiment_aanalysis_tpu.data import (
        DeviceDataset, assemble_features, make_synthetic_hci_data,
    )
    from multimodal_sentiment_aanalysis_tpu.models import (
        MultimodalTransformerModel,
    )

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

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
    ex_nums = 20
    n_subjects = arrays["arousal"].shape[0] // ex_nums
    ds = DeviceDataset(arrays)

    results = {}
    for dtype in args.dtypes.split(","):
        cd = None if dtype == "float32" else dtype
        for md in (None, "bfloat16"):
            name = f"compute={dtype} moments={md or 'float32'}"
            results[name] = run_config(
                name, MultimodalTransformerModel, ds, n_subjects, cd, md)
    best = max(results, key=results.get)
    print(f"best: {best} ({results[best]:.0f} samples/s)")


if __name__ == "__main__":
    main()
