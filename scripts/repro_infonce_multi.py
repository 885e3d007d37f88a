"""Repro + bisection record: the "stacked multi-InfoNCE" device fault.

HISTORY. Rounds 3-4 shipped an opt-in stacked multi-loss InfoNCE Pallas
kernel (all G losses x all S vmapped models in ONE launch, custom_vmap)
behind ``MSA_INFONCE_MULTI=1``. It was parity-correct and
standalone-clean, but enabling it in the full-model composition crashed
the TPU worker, and the fault was filed as "the stacked kernel's own".
Round 5 bisected that attribution on hardware and found it WRONG; the
kernel (and its opt-in) were deleted — see
``ops/losses.py::supervised_infonce_multi`` and the git history of
``kernels/contrastive.py`` for the code.

BISECTION TABLE (TPU v5e, 2026-08-20, this harness — the vmapped S-model
train step chained 30x in one scan; "crash" = "UNAVAILABLE: TPU worker
process crashed or restarted"):

    contrastive slice                      fused LSTM   result
    G single Pallas calls (production)     v9 on        CLEAN  (396 s)
    stacked Pallas, whole-array block      v9 on        crash
    stacked Pallas, 8-group grid           v9 on        crash
    batched jnp restructure (NO Pallas)    v9 on        crash
    batched jnp restructure (NO Pallas)    OFF (XLA)    CLEAN  (1458 s)

CONCLUSION. The fault is NOT in the stacked kernel: the identical graph
restructure implemented in pure jnp crashes the same way, and removing
the fused LSTM from that same program makes it run clean. The trigger is
the fused-LSTM schedule-sensitivity family (``kernels/lstm.py``
"Device-fault class"): restructuring the adjacent contrastive graph
shifts the XLA schedule into a faulting shape. Production compositions
are validated clean per revision; ``utils/preflight.py``'s LSTM ladder
is the designed mitigation for novel compositions.

USAGE (run in a subprocess — a fault takes the worker down):

    python scripts/repro_infonce_multi.py                 # control: CLEAN
    python scripts/repro_infonce_multi.py restructured    # reproduces crash
    MSA_FUSED_LSTM=0 python scripts/repro_infonce_multi.py restructured
                                                          # CLEAN again

The "restructured" mode monkeypatches ``supervised_infonce_multi`` with
the batched-jnp form below (the exact custom_vmap/custom_vjp structure
the deleted kernel used, minus the Pallas launch) — the minimal measured
reproducer of the fault. Exit 0 iff the program compiles AND executes.
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

_EPS = 1e-12
_NEG = -1e30


# --- the restructured multi-loss form (jnp body of the deleted kernel) -----


def _run_multi_jnp(n1s, n2, lab, valid):
    """(N, B, F) x2, (N, B) labels/valid -> (N,) losses; same masking/LSE
    order as ops.losses.supervised_infonce, batched over the group axis."""
    sim = jnp.einsum("nbf,ncf->nbc", n1s, n2)
    pos = (lab[:, :, None] == lab[:, None, :]).astype(jnp.float32)
    b = sim.shape[-1]
    pos = pos * (1.0 - jnp.eye(b, dtype=jnp.float32))
    pos = pos * valid[:, :, None] * valid[:, None, :]
    sim = jnp.where(valid[:, None, :] > 0, sim, _NEG)
    sim = sim - jnp.max(sim, axis=2, keepdims=True)
    e = jnp.exp(sim)
    p = (e * pos).sum(axis=2)
    a = e.sum(axis=2)
    loss = -jnp.log((p + _EPS) / (a + _EPS))
    num = (loss * valid).sum(axis=1)
    den = jnp.maximum(valid.sum(axis=1), 1.0)
    return num / den


@jax.custom_batching.custom_vmap
def _vm_multi(n1s, n2, lab, valid):
    return _run_multi_jnp(n1s, n2, lab, valid)


@_vm_multi.def_vmap
def _vm_multi_rule(axis_size, in_batched, n1s, n2, lab, valid):
    # the S-model vmap flattens onto the group axis: one (S*G)-group call
    args = [
        v if bb else jnp.broadcast_to(v[None], (axis_size,) + v.shape)
        for v, bb in zip((n1s, n2, lab, valid), in_batched)
    ]
    g = args[0].shape[1]
    flat = [v.reshape((axis_size * g,) + v.shape[2:]) for v in args]
    return _run_multi_jnp(*flat).reshape(axis_size, g), True


@jax.custom_vjp
def _multi_core(n1, n2, labels, valid, temp):
    return _vm_multi(n1 / temp, n2, labels, valid)


def _multi_fwd(n1, n2, labels, valid, temp):
    return _vm_multi(n1 / temp, n2, labels, valid), (
        n1, n2, labels, valid, temp)


def _multi_bwd(res, g):
    n1, n2, labels, valid, temp = res
    in_dtype = n1.dtype
    f1 = n1.astype(jnp.float32)
    f2 = n2.astype(jnp.float32)
    raw = jnp.einsum("gbf,gcf->gbc", f1, f2)
    sim = raw / temp
    pos = (labels[:, :, None] == labels[:, None, :]).astype(jnp.float32)
    b = sim.shape[-1]
    pos = pos * (1.0 - jnp.eye(b, dtype=jnp.float32))
    v = valid.astype(jnp.float32)
    pos = pos * v[:, :, None] * v[:, None, :]
    sim = jnp.where(v[:, None, :] > 0, sim, _NEG)
    shifted = sim - jnp.max(sim, axis=2, keepdims=True)
    e = jnp.exp(shifted)
    p = (e * pos).sum(axis=2, keepdims=True)
    a = e.sum(axis=2, keepdims=True)
    nv = jnp.maximum(v.sum(axis=1), 1.0)  # (G,)
    w = (v[:, :, None] / nv[:, None, None]) * g[:, None, None]
    grad_s = w * (e / (a + _EPS) - pos * e / (p + _EPS))
    r = w * (a / (a + _EPS) - p / (p + _EPS))
    is_max = (shifted == 0.0).astype(jnp.float32)
    is_max = is_max / is_max.sum(axis=2, keepdims=True)
    grad_s = grad_s - r * is_max
    dn1 = (jnp.einsum("gbc,gcf->gbf", grad_s, f2) / temp).astype(in_dtype)
    dn2 = (jnp.einsum("gbc,gbf->gcf", grad_s, f1) / temp).astype(in_dtype)
    dtemp = -(grad_s * raw).sum() / (temp * temp)
    return dn1, dn2, None, None, dtemp.reshape(jnp.shape(res[4]))


_multi_core.defvjp(_multi_fwd, _multi_bwd)


def _l2norm(x, axis, eps=_EPS):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def restructured_supervised_infonce_multi(
    feats1, feats2, labels, temperature, mask=None
):
    """Signature-compatible stand-in for
    ``ops.losses.supervised_infonce_multi`` — the restructured form."""
    g, b, _ = feats1.shape
    valid = (jnp.ones((b,), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
    pad = (-b) % 8
    if pad:
        feats1 = jnp.pad(feats1, ((0, 0), (0, pad), (0, 0)))
        feats2 = jnp.pad(feats2, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, (0, pad), constant_values=-1)
        valid = jnp.pad(valid, (0, pad))
    n1 = _l2norm(feats1, axis=2)
    n2 = _l2norm(feats2, axis=2)
    lab = jnp.broadcast_to(labels[None], (g,) + labels.shape)
    val = jnp.broadcast_to(valid[None], (g,) + valid.shape)
    temp = jnp.asarray(temperature, jnp.float32).reshape(())
    return _multi_core(n1, n2, lab, val, temp)


def main() -> None:
    import optax

    restructured = "restructured" in sys.argv[1:]

    from multimodal_sentiment_aanalysis_tpu.data import (
        DeviceDataset,
        assemble_features,
        make_synthetic_hci_data,
    )
    from multimodal_sentiment_aanalysis_tpu.models import (
        MultimodalTransformerModel,
        fusion_model as fusion_mod,
    )
    from multimodal_sentiment_aanalysis_tpu.ops import losses as losses_mod
    from multimodal_sentiment_aanalysis_tpu.ops.losses import (
        masked_cross_entropy,
    )
    from multimodal_sentiment_aanalysis_tpu.train import VectorizedLOSOTrainer
    from multimodal_sentiment_aanalysis_tpu.train.state import (
        clip_by_global_norm,
    )

    if restructured:
        # the model module binds the name at import time — patch both
        losses_mod.supervised_infonce_multi = (
            restructured_supervised_infonce_multi)
        fusion_mod.supervised_infonce_multi = (
            restructured_supervised_infonce_multi)

    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    print("contrastive slice:",
          "restructured (batched jnp custom_vmap/custom_vjp)"
          if restructured else "production (G single calls)",
          "| MSA_FUSED_LSTM=", os.environ.get("MSA_FUSED_LSTM", "1"),
          flush=True)

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
    model = MultimodalTransformerModel()

    def loss_fn(params, batch_stats, batch, key):
        outs, mutated = model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            batch["eeg"], batch["eye"], batch["pps"],
            labels=(batch["arousal"], batch["valence"], batch["mask"]),
            train=True, mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        a, v, c1, c2, c3 = outs
        loss = (masked_cross_entropy(a, batch["arousal"], batch["mask"])
                + masked_cross_entropy(v, batch["valence"], batch["mask"]))
        loss = loss + params["trainer"]["contrastive_weight"][0] * (
            c1 + c2 + c3)
        return loss, mutated["batch_stats"]

    def one(params, bs, opt, key, idx):
        batch = {k: jnp.take(v, idx, axis=0)
                 for k, v in trainer.data.arrays.items()}
        batch["mask"] = jnp.ones(idx.shape[0], jnp.float32)
        key, dk = jax.random.split(key)
        (loss, nbs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, bs, batch, dk)
        grads, _ = clip_by_global_norm(grads, 1.0)
        updates, opt = trainer.tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return params, nbs, opt, key

    @jax.jit
    def chained(params, bs, opt, key, idx):
        def body(carry, _):
            params, bs, opt, key = carry
            params, bs, opt, key = jax.vmap(one)(params, bs, opt, key, idx)
            return (params, bs, opt, key), None

        (params, bs, opt, key), _ = jax.lax.scan(
            body, (params, bs, opt, key), None, length=N_CHAIN)
        return params

    idx = jnp.tile(jnp.arange(BATCH, dtype=jnp.int32)[None], (S, 1))
    t0 = time.perf_counter()
    out = chained(trainer.params, trainer.batch_stats, trainer.opt_state,
                  trainer.dropout_keys, idx)
    # host transfer IS the sync (jax.block_until_ready is unreliable over
    # the axon tunnel; see bench.py::_sync)
    leaf = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    print(f"clean: {N_CHAIN}-chain full step ran in "
          f"{time.perf_counter() - t0:.1f}s (leaf {leaf:.6f})", flush=True)


if __name__ == "__main__":
    main()
