"""bf16 fused-kernel A/B on TPU: which Pallas dispatches help in bf16?

Wiring the fused train stem + fused InfoNCE (round 3) moved the fp32
vloso headline 27.6k -> 32.2k samples/s but the bf16 config went
37.1k -> 35.5k: at least one kernel is a bf16 LOSS. Each config here
compiles and times the same fused 20-epoch vloso program (bench.py
config 2) with a different dispatch set. Trainer is rebuilt per config
(dispatch flags are read at trace time).

Usage: python scripts/ab_bf16_fused.py [--configs all|stem,infonce,...]
"""
import argparse
import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 64
EPOCHS = 20


from multimodal_sentiment_aanalysis_tpu.utils.timing import host_sync as _sync


@contextlib.contextmanager
def dispatches(stem: bool, infonce: bool, lstm: bool):
    from multimodal_sentiment_aanalysis_tpu.kernels import (
        conv_stem_train as cst,
    )
    from multimodal_sentiment_aanalysis_tpu.ops import losses, rnn

    old = (cst.enable_dispatch(stem), losses.enable_fused_infonce(infonce),
           rnn.enable_fused_dispatch(lstm))
    try:
        yield
    finally:
        cst.enable_dispatch(old[0])
        losses.enable_fused_infonce(old[1])
        rnn.enable_fused_dispatch(old[2])


def run_config(name, model_cls, ds, n_subjects, dtype, stem, infonce, lstm):
    import jax

    from multimodal_sentiment_aanalysis_tpu.train import VectorizedLOSOTrainer

    with dispatches(stem, infonce, lstm):
        trainer = VectorizedLOSOTrainer(
            model_cls(), ds, n_subjects, 20, batch_size=BATCH,
            compute_dtype=dtype,
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

    n_train = trainer.train_idx.shape[1]
    sps = EPOCHS * trainer.n_total * n_train / elapsed
    print(f"{name:28s} compile {compile_s:6.1f}s  "
          f"{elapsed:6.3f}s -> {sps:8.0f} samples/s", flush=True)
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--configs", default="all")
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

    combos = {
        "all-fused": (True, True, True),
        "no-stem": (False, True, True),
        "no-infonce": (True, False, True),
        "no-stem-no-infonce": (False, False, True),
    }
    want = (list(combos) if args.configs == "all"
            else args.configs.split(","))
    results = {}
    for name in want:
        stem, infonce, lstm = combos[name]
        results[name] = run_config(
            name, MultimodalTransformerModel, ds, n_subjects, args.dtype,
            stem, infonce, lstm,
        )
    best = max(results, key=results.get)
    print(f"best: {best} ({results[best]:.0f} samples/s)")


if __name__ == "__main__":
    main()
