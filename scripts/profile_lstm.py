"""Where does the vloso train step's time go? TPU ablation timing.

Times (on the real chip, memoization-safe via chained lax.scan):
1. the full vmapped train step (S=24, B=64)
2. bilstm_stack alone at the model's real shape, fwd and fwd+bwd
3. the train step with the BiLSTM monkeypatched to a cheap dense stand-in
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

S, B, T, I, H = 24, 64, 73, 256, 128
N_CHAIN = 30


from multimodal_sentiment_aanalysis_tpu.utils.timing import host_sync as _sync


def timed(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def chain(f, n=N_CHAIN):
    """x -> scan of f n times (data-dependent chain defeats memoization)."""
    def g(x):
        def body(c, _):
            return f(c), None
        return jax.lax.scan(body, x, None, length=n)[0]
    return jax.jit(g)


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)

    from multimodal_sentiment_aanalysis_tpu.ops.rnn import bilstm_stack

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S, B, T, I)).astype(np.float32))

    def layer_params(key, i_dim):
        ks = jax.random.split(key, 8)
        mk = lambda k, shp: 0.05 * jax.random.normal(k, shp, jnp.float32)
        return {
            "w_ih_fwd": mk(ks[0], (4 * H, i_dim)),
            "w_hh_fwd": mk(ks[1], (4 * H, H)),
            "b_ih_fwd": mk(ks[2], (4 * H,)),
            "b_hh_fwd": mk(ks[3], (4 * H,)),
            "w_ih_bwd": mk(ks[4], (4 * H, i_dim)),
            "w_hh_bwd": mk(ks[5], (4 * H, H)),
            "b_ih_bwd": mk(ks[6], (4 * H,)),
            "b_hh_bwd": mk(ks[7], (4 * H,)),
        }

    keys = jax.random.split(jax.random.key(0), 2)
    layers = [layer_params(keys[0], I), layer_params(keys[1], 2 * H)]

    # --- 2: bilstm alone, vmapped over S ------------------------------
    stack = lambda xx: jax.vmap(lambda xb: bilstm_stack(xb, layers))(xx)
    fwd = chain(stack)
    t, _ = timed(fwd, x)
    print(f"bilstm_stack fwd (S={S},B={B},T={T}): {t / N_CHAIN * 1e3:.3f} ms", flush=True)

    def loss(xx):
        return jnp.sum(stack(xx) ** 2) * 1e-6

    def fwdbwd(xx):
        v, g = jax.value_and_grad(loss)(xx)
        return xx + 1e-9 * g

    fb = chain(fwdbwd)
    t, _ = timed(fb, x)
    print(f"bilstm_stack fwd+bwd: {t / N_CHAIN * 1e3:.3f} ms", flush=True)

    # --- 1/3: full vmapped train step vs LSTM-ablated ------------------
    from multimodal_sentiment_aanalysis_tpu.data import DeviceDataset
    from multimodal_sentiment_aanalysis_tpu.models import MultimodalTransformerModel
    from multimodal_sentiment_aanalysis_tpu.train import VectorizedLOSOTrainer

    def build(n_sub=S):
        n = n_sub * 20
        lab = rng.integers(0, 3, n)
        arrays = {
            "eeg": rng.normal(size=(n, 32, 585)).astype(np.float32),
            "eye": rng.normal(size=(n, 38)).astype(np.float32),
            "pps": rng.normal(size=(n, 230)).astype(np.float32),
            "arousal": lab.astype(np.int64),
            "valence": rng.integers(0, 3, n).astype(np.int64),
        }
        return VectorizedLOSOTrainer(
            MultimodalTransformerModel(), DeviceDataset(arrays), n_sub, 20,
            batch_size=B,
        )

    tr = build()
    tr.train_epoch()  # compile
    t0 = time.perf_counter(); tr.train_epoch(); _sync(tr.params)
    full_epoch = time.perf_counter() - t0
    nb = tr.train_idx.shape[1] // B
    print(f"full train epoch: {full_epoch * 1e3:.1f} ms ({nb} steps -> "
          f"{full_epoch / nb * 1e3:.2f} ms/step)", flush=True)

    # ablate the recurrence: monkeypatch bilstm_layer to a dense stand-in
    import multimodal_sentiment_aanalysis_tpu.models.eeg as eeg_mod

    orig = eeg_mod.bilstm_layer

    def fake_bilstm(xb, fwd_p, bwd_p, unroll=None):
        wf, wb = fwd_p[0], bwd_p[0]  # (4H, I)
        a = xb @ wf[: 2 * H].T
        b = xb @ wb[: 2 * H].T
        return jnp.tanh(a + b)

    eeg_mod.bilstm_layer = fake_bilstm
    try:
        tr2 = build()
        tr2.train_epoch()
        t0 = time.perf_counter(); tr2.train_epoch(); _sync(tr2.params)
        abl_epoch = time.perf_counter() - t0
        print(f"LSTM-ablated epoch: {abl_epoch * 1e3:.1f} ms "
              f"({abl_epoch / nb * 1e3:.2f} ms/step)", flush=True)
        print(f"=> recurrence share of step: "
              f"{(full_epoch - abl_epoch) / full_epoch:.1%}", flush=True)
    finally:
        eeg_mod.bilstm_layer = orig


if __name__ == "__main__":
    main()
