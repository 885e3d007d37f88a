"""Attribute the serving latency floor (VERDICT r3 item 8).

The batch sweep (eval/serving.py table) shows the forward is
latency-bound below B~128: B=8 costs 0.679 ms/batch vs B=64's 0.835 —
a ~0.6-0.8 ms floor nearly independent of batch. The sweep's scan-of-K
timing already amortizes the tunnel dispatch, so the floor is IN-PROGRAM.
This script attributes it by timing staged slices of the same serving
graph (same helpers, same weights) at several batch sizes, each as a
100-batch chained scan with host-sync timing:

- ``gather``      : the per-batch row gather alone
- ``stem``        : + the two folded conv/BN/GELU/pool stages + freq MLP
- ``eeg``         : + the 2-layer BiLSTM + fusion (full EEG branch)
- ``full``        : the production forward (adds eye/pps subnets,
                    cross-modal, fusion stack, heads)

Expected shape of the answer: the BiLSTM is a serial chain of ~73x2x2
lane-starved steps whose latency does not scale with batch — if
``eeg - stem`` is flat across B while ``stem`` and ``full - eeg`` grow,
the floor is the recurrence, and the documented mitigation is batching
(the sweep's conclusion 2), not kernel work.

Results (TPU v5e, 2026-08-19) landed as eval/serving.py conclusion 4:
the hypothesis below was REFUTED — the gather-only stage already costs
0.26-0.36 ms (74% of the B=8 total) and every model stage's delta
scales with batch, so the floor is per-iteration program overhead, not
the recurrence.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SERVE_K = 100
BATCHES = (8, 64, 256)


def main():
    from multimodal_sentiment_aanalysis_tpu.data import (
        DeviceDataset,
        assemble_features,
        make_synthetic_hci_data,
    )
    from multimodal_sentiment_aanalysis_tpu.eval import serving as sv
    from multimodal_sentiment_aanalysis_tpu.models import (
        MultimodalTransformerModel,
    )
    from multimodal_sentiment_aanalysis_tpu.ops.rnn import bilstm_layer
    from multimodal_sentiment_aanalysis_tpu.utils.timing import host_sync

    from multimodal_sentiment_aanalysis_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)

    data = make_synthetic_hci_data(seed=42)
    feats, _ = assemble_features(
        data, ["eeg", "eye", "pps"], norm="Z_score", label_type="arousal"
    )
    arrays = {
        "eeg": jnp.asarray(feats["eeg"].astype(np.float32)),
        "eye": jnp.asarray(feats["eye"].astype(np.float32)),
        "pps": jnp.asarray(feats["pps"].astype(np.float32)),
    }
    n = arrays["eeg"].shape[0]

    model = MultimodalTransformerModel()
    variables = model.init(
        jax.random.key(0), arrays["eeg"][:2], arrays["eye"][:2],
        arrays["pps"][:2],
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    p, st = params["eeg_net"], stats["eeg_net"]
    full_fwd = sv.build_serving_forward(
        {"params": params, "batch_stats": stats})

    def stem_only(eeg):
        from multimodal_sentiment_aanalysis_tpu.models.eeg import (
            conv1d,
            max_pool1d,
        )
        from multimodal_sentiment_aanalysis_tpu.kernels.conv_stem import (
            fold_bn,
        )

        xt = jnp.transpose(eeg, (0, 2, 1))
        s1, h1 = fold_bn(p["bn1"]["scale"], p["bn1"]["bias"],
                         st["bn1"]["mean"], st["bn1"]["var"],
                         p["conv1_bias"])
        s2, h2 = fold_bn(p["bn2"]["scale"], p["bn2"]["bias"],
                         st["bn2"]["mean"], st["bn2"]["var"],
                         p["conv2_bias"])
        h = conv1d(xt, p["conv1_weight"], jnp.zeros_like(p["conv1_bias"]), 7)
        h = max_pool1d(sv._gelu(h * s1 + h1), 4)
        h = conv1d(h, p["conv2_weight"], jnp.zeros_like(p["conv2_bias"]), 2)
        h = max_pool1d(sv._gelu(h * s2 + h2), 2)
        freq = sv._gelu(sv._dense(p["freq1"], eeg.mean(axis=1)))
        return h, sv._dense(p["freq2"], freq)

    def eeg_branch(eeg):
        h, freq = stem_only(eeg)
        for k in range(2):
            h = bilstm_layer(
                h,
                (p[f"lstm{k}_w_ih_fwd"], p[f"lstm{k}_w_hh_fwd"],
                 p[f"lstm{k}_b_ih_fwd"], p[f"lstm{k}_b_hh_fwd"]),
                (p[f"lstm{k}_w_ih_bwd"], p[f"lstm{k}_w_hh_bwd"],
                 p[f"lstm{k}_b_ih_bwd"], p[f"lstm{k}_b_hh_bwd"]),
            )
        fused = jnp.concatenate([h.mean(axis=1), freq], axis=1)
        return sv._gelu(sv._ln(
            p["fusion_ln"], sv._dense(p["fusion_dense"], fused)))

    stages = {
        "gather": lambda e, y, pp: (e.sum() + y.sum() + pp.sum()),
        "stem": lambda e, y, pp: stem_only(e)[0].sum(),
        "eeg": lambda e, y, pp: eeg_branch(e).sum(),
        "full": lambda e, y, pp: sum(x.sum() for x in full_fwd(e, y, pp)),
    }

    rng = np.random.default_rng(3)
    print(f"{'B':>5}  " + "".join(f"{k:>9}" for k in stages)
          + "   (ms/batch, scan of {})".format(SERVE_K), flush=True)
    for B in BATCHES:
        row = []
        for name, fn in stages.items():
            @jax.jit
            def serve_many(idxs, fn=fn):
                def body(acc, idx):
                    out = fn(
                        jnp.take(arrays["eeg"], idx, axis=0),
                        jnp.take(arrays["eye"], idx, axis=0),
                        jnp.take(arrays["pps"], idx, axis=0),
                    )
                    return acc + out.astype(jnp.float32), None
                return jax.lax.scan(body, jnp.float32(0.0), idxs)[0]

            plan = lambda: jnp.asarray(
                rng.integers(0, n, (SERVE_K, B)).astype(np.int32))
            host_sync(serve_many(plan()))  # compile + warm
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                host_sync(serve_many(plan()))
                best = min(best, time.perf_counter() - t0)
            row.append(best / SERVE_K * 1e3)
        print(f"{B:>5}  " + "".join(f"{v:>9.3f}" for v in row), flush=True)


if __name__ == "__main__":
    main()
