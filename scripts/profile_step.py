"""Ablation profile of the full vmapped train step on TPU.

The component profile (profile_bf16.py) accounts for only ~28 ms (BiLSTM
16 + conv stem 12) of the ~64 ms fp32 vmapped step (S=24 models, B=64).
This times the REAL VectorizedLOSOTrainer step and ablations of it to
attribute the rest:

- full          : the real train step (loss = CE both heads + 3 InfoNCE,
                  dropout on, AdamW update)
- no-dropout    : dropout disabled (isolates threefry mask generation)
- ce-only       : contrastive losses dropped from the objective
- no-update     : grads computed but optimizer update skipped
- fwd-only      : forward + loss only (no backward)
- fwd-eval      : eval-mode forward (running-stats BN, no dropout) —
                  vs fwd-only isolates train-mode BN + dropout fwd cost

Each variant is timed as a chained 30-step scan (state feeds forward, so
the tunnel cannot memoize).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_CHAIN = 30
BATCH = 64


from multimodal_sentiment_aanalysis_tpu.utils.timing import host_sync as _sync


def timed(fn, *args, reps=3):
    _sync(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import optax

    from multimodal_sentiment_aanalysis_tpu.data import (
        DeviceDataset,
        assemble_features,
        make_synthetic_hci_data,
    )
    from multimodal_sentiment_aanalysis_tpu.models import (
        MultimodalTransformerModel,
    )
    from multimodal_sentiment_aanalysis_tpu.ops.losses import (
        masked_cross_entropy,
    )
    from multimodal_sentiment_aanalysis_tpu.train import VectorizedLOSOTrainer
    from multimodal_sentiment_aanalysis_tpu.train.state import (
        clip_by_global_norm,
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
        "arousal": np.asarray(data["arousal_label"]).reshape(-1).astype(np.int64),
        "valence": np.asarray(data["valence_label"]).reshape(-1).astype(np.int64),
    }
    n_subjects = arrays["arousal"].shape[0] // 20
    ds = DeviceDataset(arrays)
    trainer = VectorizedLOSOTrainer(
        MultimodalTransformerModel(), ds, n_subjects, 20, batch_size=BATCH
    )
    S = trainer.n_total

    from multimodal_sentiment_aanalysis_tpu.train.state import cast_floating

    bf16 = "--bf16" in sys.argv  # profile the bf16-compute step instead
    if bf16:
        print("compute dtype: bfloat16 (fp32 master params)", flush=True)

    def variant_step(dropout: bool, contrastive: bool, update: bool,
                     backward: bool, train_mode: bool = True):
        model = (MultimodalTransformerModel() if dropout
                 else MultimodalTransformerModel(dropout=0.0))

        def _cast(params, batch):
            if not bf16:
                return params, batch
            params = {"model": cast_floating(params["model"], jnp.bfloat16),
                      "trainer": params["trainer"]}
            batch = dict(batch)
            for k in ("eeg", "eye", "pps"):
                batch[k] = batch[k].astype(jnp.bfloat16)
            return params, batch

        def loss_fn(params, batch_stats, batch, key):
            params, batch = _cast(params, batch)
            if not train_mode:
                if bf16:  # eval BN consumes running stats: cast them too,
                    # else (h - fp32_mean) silently promotes the whole
                    # post-BN graph back to fp32
                    batch_stats = cast_floating(batch_stats, jnp.bfloat16)
                outs = model.apply(
                    {"params": params["model"], "batch_stats": batch_stats},
                    batch["eeg"], batch["eye"], batch["pps"],
                    labels=(batch["arousal"], batch["valence"],
                            batch["mask"]),
                    train=False,
                )
                a, v, c1, c2, c3 = (x.astype(jnp.float32) for x in outs)
                loss = (masked_cross_entropy(a, batch["arousal"],
                                             batch["mask"])
                        + masked_cross_entropy(v, batch["valence"],
                                               batch["mask"]))
                if contrastive:
                    loss = loss + params["trainer"][
                        "contrastive_weight"][0] * (c1 + c2 + c3)
                return loss, batch_stats
            outs, mutated = model.apply(
                {"params": params["model"], "batch_stats": batch_stats},
                batch["eeg"], batch["eye"], batch["pps"],
                labels=(batch["arousal"], batch["valence"], batch["mask"]),
                train=True, mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            a, v, c1, c2, c3 = (x.astype(jnp.float32) for x in outs)
            loss = (masked_cross_entropy(a, batch["arousal"], batch["mask"])
                    + masked_cross_entropy(v, batch["valence"], batch["mask"]))
            if contrastive:
                loss = loss + params["trainer"]["contrastive_weight"][0] * (
                    c1 + c2 + c3)
            new_bs = mutated["batch_stats"]
            if bf16:  # mirror the trainer: BN stats accumulate in fp32
                new_bs = cast_floating(new_bs, jnp.float32)
            return loss, new_bs

        def one(params, bs, opt, key, idx):
            batch = {k: jnp.take(v, idx, axis=0)
                     for k, v in trainer.data.arrays.items()}
            batch["mask"] = jnp.ones(idx.shape[0], jnp.float32)
            key, dk = jax.random.split(key)
            if backward:
                (loss, nbs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, bs, batch, dk)
                if update:
                    grads, _ = clip_by_global_norm(grads, 1.0)
                    updates, opt = trainer.tx.update(grads, opt, params)
                    params = optax.apply_updates(params, updates)
                else:
                    # consume grads so they can't be DCE'd
                    params = jax.tree.map(
                        lambda p, g: p + 1e-12 * g, params, grads)
            else:
                loss, nbs = loss_fn(params, bs, batch, dk)
                params = jax.tree.map(lambda p: p + 1e-12 * loss, params)
            return params, nbs, opt, key

        def chained(params, bs, opt, key, idx):
            def body(carry, _):
                params, bs, opt, key = carry
                params, bs, opt, key = jax.vmap(
                    one, in_axes=(0, 0, 0, 0, 0)
                )(params, bs, opt, key, idx)
                return (params, bs, opt, key), None

            (params, bs, opt, key), _ = jax.lax.scan(
                body, (params, bs, opt, key), None, length=N_CHAIN)
            return params

        return jax.jit(chained, compiler_options=compiler_options)

    # --compiler-options=key=val,key=val passthrough (XLA DebugOptions
    # names, e.g. xla_tpu_scoped_vmem_limit_kib=65536) for A/B'ing
    # compiler knobs on the REAL step program
    compiler_options = None
    for a in sys.argv:
        if a.startswith("--compiler-options="):
            compiler_options = {}
            for kv in a.split("=", 1)[1].split(","):
                k, v = kv.split("=", 1)
                compiler_options[k] = v
            print("compiler_options:", compiler_options, flush=True)

    idx = jnp.tile(jnp.arange(BATCH, dtype=jnp.int32)[None], (S, 1))
    args0 = (trainer.params, trainer.batch_stats, trainer.opt_state,
             trainer.dropout_keys, idx)

    variants = [
        ("full", dict(dropout=True, contrastive=True, update=True, backward=True)),
        ("no-dropout", dict(dropout=False, contrastive=True, update=True, backward=True)),
        ("fwd-only", dict(dropout=True, contrastive=True, update=False, backward=False)),
        ("fwd-eval", dict(dropout=True, contrastive=True, update=False,
                          backward=False, train_mode=False)),
        # LAST TWO: ablation compositions that have faulted the fused LSTM
        # kernel on the tunnel (kernels/lstm.py "Known issue"; the faulting
        # member MOVED with the kernel revision — no-update faulted with
        # v5/v6, ce-only faults with v7) — keeping them at the end lets the
        # default run collect every other number first
        ("no-update", dict(dropout=True, contrastive=True, update=False, backward=True)),
        ("ce-only", dict(dropout=True, contrastive=False, update=True, backward=True)),
    ]
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    if only:
        variants = [(n, kw) for n, kw in variants if n in only]
    if "--no-lstm-kernel" in sys.argv:
        from multimodal_sentiment_aanalysis_tpu.ops import rnn as _rnn

        _rnn.enable_fused_dispatch(False)
    if "--flat" in sys.argv:
        # optax.flatten: run AdamW on ONE concatenated vector instead of
        # ~150 leaves x 24 models — measures per-leaf op overhead
        import optax as _optax

        tx_flat = _optax.flatten(_optax.adamw(1e-4, weight_decay=0.01))
        flat_opt = jax.vmap(tx_flat.init)(trainer.params)
        trainer.tx = tx_flat
        args0 = (trainer.params, trainer.batch_stats, flat_opt,
                 trainer.dropout_keys, idx)
        variants = [("full-flat", variants[0][1])]
        fn = variant_step(**variants[0][1])
        t = timed(fn, *args0)
        print(f"full-flat  : {t / N_CHAIN * 1e3:7.3f} ms/step", flush=True)
        return
    if "--rbg" in sys.argv:
        # rbg keys: XLA RngBitGenerator instead of threefry for the
        # dropout masks — same distribution, far cheaper bit generation
        rbg_keys = jax.random.split(
            jax.random.key(43, impl="rbg"), S)
        args0 = args0[:3] + (rbg_keys,) + args0[4:]
        variants = [("full-rbg", variants[0][1])]
    for name, kw in variants:
        fn = variant_step(**kw)
        t = timed(fn, *args0)
        print(f"{name:11s}: {t / N_CHAIN * 1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
