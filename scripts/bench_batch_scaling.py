"""Batch-size scaling sweep of the fused vectorized-LOSO trainer.

The bench headline runs the reference-faithful B=64 (``Trainer.py``'s
batch size). That batch is small for a v5e MXU: every GEMM in the step
has a 64-row (per-model) operand, and the measured fp32 MFU is ~11%.
This sweep measures the same fused 20-epoch program at B ∈ {64, 128,
256} in fp32 and bf16 to answer: is the step's low MFU a *structural*
property of the framework, or just the workload's small batch?

Samples per epoch are constant (the LOSO split), so larger B means
fewer, bigger steps per epoch — same total work, higher arithmetic
intensity.

Results (TPU v5e, 20 fused epochs x 24 models, 2026-08-19):

====  =====  ==========  ======  ===========================
B     dtype  samples/s   MFU     notes
====  =====  ==========  ======  ===========================
64    fp32   37,292      11.05%  reference-faithful headline
64    bf16   44,432      13.21%
128   fp32   50,696      15.00%  fp32 sweet spot
128   bf16   59,663      17.69%
256   fp32   23,320       6.90%  fused LSTM bwd exceeds VMEM
                                 (146M/128M) -> auto-fallback
                                 to the XLA recurrence
256   bf16   61,059      18.10%  fused still fits (bf16 halves
                                 the kernel windows)
====  =====  ==========  ======  ===========================

Verdict: the B=64 step is NOT the framework's ceiling — MFU is a
workload property. Scaling per-model batch 4x lifts bf16 throughput
1.37x to 61k samples/s / 18.1% MFU. fp32 is capped at B=128 by the
fused LSTM backward's VMEM envelope (kernels/lstm.py
fused_bwd_vmem_fits); past it the automatic XLA-recurrence fallback
keeps the program correct but costs ~2.2x. Larger batches change
optimization dynamics vs the reference, so the bench headline stays
B=64; `vloso --batch-size` exposes the lever.

Usage: python scripts/bench_batch_scaling.py [--batches=64,128,256]
       [--dtypes=fp32,bf16]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # reuses its fused-vloso harness + FLOP counting


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

    batches = [64, 128, 256]
    dtypes = ["fp32", "bf16"]
    for a in sys.argv[1:]:
        if a.startswith("--batches="):
            batches = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--dtypes="):
            dtypes = a.split("=", 1)[1].split(",")

    dev = jax.devices()[0]
    bench.log(f"device: {dev.platform} ({dev.device_kind})")
    peak = bench.PEAK_FLOPS.get(dev.device_kind)

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

    rows = []
    for b in batches:
        for dt in dtypes:
            kw = ({} if dt == "fp32" else
                  dict(compute_dtype="bfloat16", moment_dtype="bfloat16"))
            bench.log(f"[B={b} {dt}]")
            bench.BATCH = b  # bench_fused_vloso reads the module global
            try:
                sps, mfu, _ = bench.bench_fused_vloso(
                    MultimodalTransformerModel, ds, n_subjects, peak, **kw)
            except Exception as e:
                bench.log(f"  failed: {e!r}")
                rows.append((b, dt, None, None))
                continue
            rows.append((b, dt, sps, mfu))

    print(f"{'B':>5} {'dtype':>6} {'samples/s':>12} {'MFU':>8}")
    for b, dt, sps, mfu in rows:
        if sps is None:
            print(f"{b:>5} {dt:>6} {'FAILED':>12}")
        else:
            print(f"{b:>5} {dt:>6} {sps:>12.0f} "
                  f"{(f'{mfu:.2%}' if mfu else 'n/a'):>8}")


if __name__ == "__main__":
    main()
