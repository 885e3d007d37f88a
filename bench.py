"""Benchmark harness.

Headline metric: end-to-end LOSO training throughput. The reference's only
published numbers are from its leave-one-subject-out experiment loop —
24 sequentially trained models at 1.66–2.08 s/iteration, batch 64
(~31–36 samples/s end-to-end; BASELINE.md, derived from ``train.txt:15``).
The TPU-native equivalent trains all 24 LOSO models in ONE vmapped program
(:class:`train.vloso.VectorizedLOSOTrainer`) over the device-resident
dataset; throughput counts the same unit the reference's number counts —
training samples consumed per second across the LOSO experiment. Since
round 2 the timed program is the fused multi-epoch form (`train_epochs_fused`: one
``lax.scan`` over epochs, on-device batch plans, full tail coverage via
wrap-pad masks).

Secondary configs (logged to stderr and carried in the JSON line's
``extra`` field):

- ``vloso_bf16``  — the same fused program with bfloat16 compute
  (float32 master params) and bfloat16 Adam moment storage
  (``train.state.adamw_lowp``; hardware A/B 2026-08-17
  ``scripts/ab_moment_dtype.py``: 40.2k vs 39.8k samples/s at identical
  sanity accuracy), the native-MXU-rate path;
- ``phased``      — vectorized phased-curriculum throughput: ALL subjects'
  curricula in one vmapped program per phase — the reference's actual
  flagship workload (``dataLoader/MultiTaskTrainer.py:556-673``), subject
  axis vectorized since round 3 (round 2 benched one subject at a time);
- ``serving``     — inference forward (``eval/serving.py``) latency and
  throughput over a scan of distinct batches (distinct per invocation:
  the TPU tunnel memoizes byte-identical executions, so pure-fn timing
  loops must vary their inputs);
- ``*_b128`` / ``*_b256`` — the same fused program at per-model batch 128
  (fp32 + bf16) and 256 (fp32): MFU is a workload property and B=64 is
  kept reference-faithful for the headline, but larger batches are the
  measured-better deployment configs (round-3 sweep
  ``scripts/bench_batch_scaling.py``: fp32 B=128 50.7k samples/s at
  MFU 15.0%); fp32 B=256 additionally exercises the v8 batch-blocked
  LSTM backward that removed the 146M/128M scoped-VMEM cliff;
- ``vloso_fp32_es`` — the early-stop/plateau-LR program
  (``--early-stop`` semantics: per-epoch held-out eval + (S,) schedule
  lanes inside the fused scan), same throughput unit;
- ``*_mfu``       — model FLOP utilization per config: XLA cost-analysis
  FLOPs of the un-scanned step, lowered for the CPU backend (the axon TPU
  backend's lowered cost_analysis yields nothing; the count is platform-
  independent) with the Pallas LSTM dispatch off (cost analysis cannot
  see into custom calls), divided by elapsed time and the chip's bf16
  peak (conservative for the fp32 config).

Measurement method (round 4): every training config's timed window is the
MIN over ``REPS=3`` back-to-back invocations of the compiled multi-epoch
program (state chains forward between invocations, so the tunnel cannot
memoize and each window is a genuine re-execution). BENCH_r03 recorded
~10% run-to-run variance on a single-window bf16 number vs the same-day
in-repo measurement; min-of-3 brings repeat-run agreement within ~3%
(within ONE run the 3 windows agree within ~0.2-0.3%; the ~3% figure is
run-to-run — different processes, different tunnel sessions).

``vs_baseline`` is the speedup over the 33.5 samples/s midpoint.

Result emission (round 5): the full JSON result line is printed and
flushed IMMEDIATELY after the headline config, then RE-printed with the
grown ``extra`` after every subsequent config — a consumer takes the
LAST JSON line on stdout, so a driver timeout costs only the unreached
extras, never the headline (BENCH_r04 was ``rc: 124, parsed: null``
because round 4 printed once at the very end). A total wall-clock budget
(``MSA_BENCH_BUDGET_S``, default 1500 s) is checked before every config
after the headline; exceeded -> remaining configs are skipped with a
logged note and recorded in ``extra["skipped"]``. Config order puts the
reference-semantics early-stop program FIRST among the extras, before
the batch-scaling deployment points.

Prints JSON lines {"metric", "value", "unit", "vs_baseline", "extra"};
the last one is the result.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache. The remote TPU compile of the fp32
# fused program varies from 3 to 16 minutes run to run; the cache makes a
# repeat benchmark of an unchanged program skip the compile (probe over
# the axon tunnel 2026-08-18: 138 s first process -> 0.62 s warm — the
# jax.config route works where the JAX_COMPILATION_CACHE_DIR env var was
# observed not to; see utils/compilation_cache.py). MSA_COMPILE_CACHE=0
# opts out for clean-compile measurement runs.
from multimodal_sentiment_aanalysis_tpu.utils.compilation_cache import (
    cache_enabled_by_env as _cache_on,
    enable_compilation_cache as _enable_cache,
)

if _cache_on():
    _enable_cache()

BASELINE_SAMPLES_PER_SEC = 33.5  # reference end-to-end LOSO training rate
BATCH = 64
TIMED_EPOCHS = 20
REPS = 3  # timed windows per training config; the metric is their min
PHASED_WARM = 2
PHASED_TIMED = 10
SERVE_K = 100  # batches per serving scan

# bf16 MXU peak per chip. v5e (TPU v5 lite): 197 TFLOP/s. Used for every
# config's MFU (conservative for fp32, which can't exceed the bf16 rate).
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v4": 275e12}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# -- persistent-compile-cache observability (round-5 verdict item 2) --------
# The builder's sessions measure 138 s -> 0.62 s warm-cache repeats, yet
# every driver-environment compile in BENCH_r03/r04 paid 40-172 s. Make the
# cache's state and per-compile effect visible so cold/unwritable/rekeyed
# caches are diagnosable from the bench stderr alone.
#
# HIT detection uses JAX's own monitoring events, not wall time: a cache
# hit over the axon tunnel still ships the deserialized executable
# (~150 MB for the fused LOSO program) through the relay and loads it
# server-side, which measured 4.1 s on an idle box but 835 s when a
# CPU-bound process contended the single host core (2026-08-21) — so a
# slow compile does NOT imply a miss, and the r5 first-cut wall-time
# classifier mislabeled exactly that case.


def _install_cache_event_listener() -> None:
    """Count '/jax/compilation_cache/cache_hits' monitoring events so
    log_cache_effect can report true hits instead of inferring from
    wall time."""
    if getattr(_install_cache_event_listener, "_done", False):
        return
    _install_cache_event_listener._done = True
    log_cache_effect._hits = 0
    try:
        from jax._src import monitoring

        def _on_event(event: str, **kw) -> None:
            if event == "/jax/compilation_cache/cache_hits":
                log_cache_effect._hits += 1

        monitoring.register_event_listener(_on_event)
    except Exception as e:  # pragma: no cover - jax internals moved
        log(f"  cache event listener unavailable ({e!r}); "
            "falling back to entry-growth-only classification")


def _cache_dir() -> str | None:
    if not _cache_on():
        return None
    from multimodal_sentiment_aanalysis_tpu.utils.compilation_cache import (
        DEFAULT_CACHE_DIR,
    )

    return os.environ.get("MSA_COMPILE_CACHE_DIR") or DEFAULT_CACHE_DIR


def _cache_state() -> tuple[int, int]:
    """(entry count, total bytes) of the persistent cache dir."""
    d = _cache_dir()
    if not d or not os.path.isdir(d):
        return 0, 0
    n = b = 0
    for f in os.listdir(d):
        if f.endswith("-cache"):
            n += 1
            try:
                b += os.path.getsize(os.path.join(d, f))
            except OSError:
                pass
    return n, b


def log_cache_header() -> None:
    d = _cache_dir()
    if d is None:
        log("compile cache: DISABLED (MSA_COMPILE_CACHE=0)")
        return
    n, b = _cache_state()
    writable = os.access(d, os.W_OK) if os.path.isdir(d) else False
    log_cache_effect._last_n = n  # baseline for per-compile growth deltas
    _install_cache_event_listener()
    log(f"compile cache: dir={d} entries={n} size={b / 2**20:.0f}MiB "
        f"writable={writable}")


def log_cache_effect(tag: str, compile_s: float) -> None:
    """Classify one compile as a cache hit or miss. Hits are counted from
    JAX's monitoring events (ground truth); entry-count growth shows
    whether a miss persisted its executable. Wall time is reported but
    never used to classify — a tunnel hit still pays executable shipping
    + server load, which is seconds idle but can reach minutes under
    host-CPU contention."""
    n, _ = _cache_state()
    grew = n - getattr(log_cache_effect, "_last_n", n)
    log_cache_effect._last_n = n
    hits = getattr(log_cache_effect, "_hits", 0)
    hit_delta = hits - getattr(log_cache_effect, "_last_hits", 0)
    log_cache_effect._last_hits = hits
    if hit_delta > 0 and grew == 0:
        verdict = f"HIT ({hit_delta} cached programs)"
    elif hit_delta > 0:
        verdict = f"PARTIAL ({hit_delta} hits, {grew} new entries)"
    elif grew > 0:
        verdict = "MISS (persisted)"
    else:
        verdict = "MISS (not persisted)"
    log(f"  cache[{tag}]: {verdict} compile={compile_s:.1f}s "
        f"entries_now={n} (+{max(grew, 0)})")


from multimodal_sentiment_aanalysis_tpu.utils.timing import host_sync as _sync


import contextlib


@contextlib.contextmanager
def _pure_xla():
    """Disable every TPU Pallas dispatch (LSTM, train stem, InfoNCE) and
    force full scan unrolls around a FLOP-counting lowering: XLA's cost
    analysis cannot see inside custom calls, and a CPU lowering of a TPU
    Pallas call fails outright."""
    from multimodal_sentiment_aanalysis_tpu.kernels import (
        conv_stem_train as _cst,
    )
    from multimodal_sentiment_aanalysis_tpu.ops import losses as _losses
    from multimodal_sentiment_aanalysis_tpu.ops import rnn as _rnn

    old_rnn = _rnn.enable_fused_dispatch(False)
    old_cst = _cst.enable_dispatch(False)
    old_inf = _losses.enable_fused_infonce(False)
    old_unroll = _rnn._FORCE_FULL_UNROLL
    _rnn._FORCE_FULL_UNROLL = True
    try:
        yield
    finally:
        _rnn.enable_fused_dispatch(old_rnn)
        _cst.enable_dispatch(old_cst)
        _losses.enable_fused_infonce(old_inf)
        _rnn._FORCE_FULL_UNROLL = old_unroll


def _flops(lowered_or_compiled) -> float | None:
    """FLOPs from XLA's cost analysis. NOTE: a ``while`` loop's body is
    counted ONCE, not x trip-count, so this must be fed a program with NO
    remaining loops (a single un-scanned train step / forward); the caller
    multiplies by the step count. The counting lowerings below run on the
    CPU backend, where the BiLSTM scan would lower to a while loop — they
    therefore also set ``ops.rnn._FORCE_FULL_UNROLL`` so the recurrence
    unrolls and every step's FLOPs are visible to the analysis."""
    try:
        ca = lowered_or_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"]) if ca and "flops" in ca else None
    except Exception:
        return None


def _train_step_flops(trainer) -> float | None:
    """Analytic FLOPs of ONE vmapped train step (all LOSO models, one
    batch each): lower the un-scanned step and read XLA's cost analysis —
    no backend compile needed."""
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_sentiment_aanalysis_tpu.train.state import (
        clip_by_global_norm,
    )

    arrays = trainer.data.arrays

    def one(params, bs, opt, key, idx):
        batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
        batch["mask"] = jnp.ones(idx.shape[0], jnp.float32)
        (_, (nbs, _)), grads = jax.value_and_grad(
            trainer._loss_fn, has_aux=True
        )(params, bs, batch, key)
        grads, _ = clip_by_global_norm(grads, trainer.clip_norm)
        updates, nopt = trainer.tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), nbs, nopt

    idx = jnp.zeros((trainer.n_total, trainer.batch_size), jnp.int32)
    # Lower via the pure-XLA scan path (cost_analysis cannot count FLOPs
    # inside the fused Pallas LSTM custom call; same math either way) and
    # for the CPU backend (the axon TPU backend's lowered cost_analysis
    # returns nothing / stalls — CPU HLO analysis runs locally and the
    # FLOP count is platform-independent).
    with _pure_xla(), jax.default_device(jax.devices("cpu")[0]):
        lowered = jax.jit(jax.vmap(one)).lower(
            trainer.params, trainer.batch_stats, trainer.opt_state,
            trainer.dropout_keys, idx,
        )
    return _flops(lowered)


def bench_fused_vloso(model_cls, ds, n_subjects, peak, compute_dtype=None,
                      moment_dtype=None, batch=BATCH, reps=REPS):
    """Compile the fused E-epoch LOSO program AOT, run one warm-up
    invocation, then take the MIN wall-clock over ``reps`` timed
    invocations (state chains between them — genuine re-executions the
    tunnel cannot memoize). Returns (samples/sec, mfu or None, trainer)."""
    import jax

    from multimodal_sentiment_aanalysis_tpu.train import VectorizedLOSOTrainer

    trainer = VectorizedLOSOTrainer(
        model_cls(), ds, n_subjects, 20, batch_size=batch,
        compute_dtype=compute_dtype, moment_dtype=moment_dtype,
    )
    fused = trainer._build_fused(TIMED_EPOCHS)
    args = (
        trainer.params, trainer.batch_stats, trainer.opt_state,
        trainer.dropout_keys, jax.random.key(7),
    )
    t0 = time.perf_counter()
    compiled = fused.lower(*args).compile()
    compile_s = time.perf_counter() - t0
    log(f"  compile: {compile_s:.1f}s")
    log_cache_effect(f"vloso_b{batch}", compile_s)
    step_flops = _train_step_flops(trainer)

    t0 = time.perf_counter()
    p, bs, opt, dk, _ = compiled(*args)
    _sync(p)
    log(f"  warm-up invocation ({TIMED_EPOCHS} epochs): "
        f"{time.perf_counter() - t0:.1f}s")

    elapsed = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        p, bs, opt, dk, totals = compiled(p, bs, opt, dk,
                                          jax.random.key(8 + r))
        _sync(p)
        window = time.perf_counter() - t0
        log(f"  window {r + 1}/{reps}: {window:.3f}s")
        elapsed = min(elapsed, window)

    n_train = trainer.train_idx.shape[1]  # valid rows per model-epoch
    nb = -(-n_train // trainer.batch_size)  # wrap-padded batches per epoch
    samples = TIMED_EPOCHS * trainer.n_total * n_train
    sps = samples / elapsed
    total_flops = step_flops * nb * TIMED_EPOCHS if step_flops else None
    mfu = total_flops / elapsed / peak if (total_flops and peak) else None
    # keep trainer state for the sanity eval / serving weights
    trainer.params, trainer.batch_stats = p, bs
    log(f"  {TIMED_EPOCHS} epochs x {trainer.n_total} LOSO models in "
        f"{elapsed:.3f}s (min of {reps}) -> {sps:.0f} samples/s"
        + (f", MFU {mfu:.2%}" if mfu is not None else ""))
    return sps, mfu, trainer


def bench_vloso_early_stop(model_cls, ds, n_subjects):
    """Throughput of the early-stop/plateau-LR fused program (per-epoch
    held-out eval + (S,) schedule lanes inside the scan), at the
    REFERENCE'S schedule settings (patience 5, ``Trainer.py:107-117``).
    Subjects that stop mid-window keep costing compute — a vmapped lane
    freezes its updates, it doesn't leave the program — so the throughput
    number times the control overhead regardless of when stops land, and
    the run doubles as the stop-epoch-distribution record the reference's
    ``train.txt`` 'Early stopping triggered' lines provide.

    Returns (samples/sec, per-subject stop-epoch list: 0 = never
    stopped within the run)."""
    import jax

    from multimodal_sentiment_aanalysis_tpu.train import VectorizedLOSOTrainer

    trainer = VectorizedLOSOTrainer(
        model_cls(), ds, n_subjects, 20, batch_size=BATCH,
        early_stop=True,
    )
    t0 = time.perf_counter()
    trainer.train_epochs_fused(TIMED_EPOCHS)  # compile + warm-up
    warm_s = time.perf_counter() - t0
    log(f"  compile + warm-up: {warm_s:.1f}s")
    log_cache_effect("vloso_es", warm_s)
    elapsed = float("inf")
    reps = 2
    for r in range(reps):
        t0 = time.perf_counter()
        trainer.train_epochs_fused(TIMED_EPOCHS)
        _sync(trainer.params)
        elapsed = min(elapsed, time.perf_counter() - t0)
    n_train = trainer.train_idx.shape[1]
    sps = TIMED_EPOCHS * trainer.n_total * n_train / elapsed
    log(f"  {TIMED_EPOCHS} early-stop epochs x {trainer.n_total} models in "
        f"{elapsed:.3f}s (min of {reps}) -> {sps:.0f} samples/s")
    stop = [
        int(e) for e in np.asarray(
            jax.device_get(trainer.sched["stop_epoch"])
        )[: trainer.n_subjects]
    ]
    log("  " + trainer.stop_report().replace("\n", "\n  "))
    return sps, stop


def bench_phased(model_cls, full_ds, n_subjects, ex_nums):
    """Vectorized phased-curriculum throughput — the reference's flagship
    loop (24 sequential ``MultiTaskTrainer.run`` calls, ``main.py:62-68``)
    as ONE vmapped device program per phase: ALL subjects' fusion_arousal
    phases (train + per-epoch eval, per-epoch optimizer re-init) run
    simultaneously (``train.vphased.VectorizedPhasedTrainer``; per-subject
    equivalence to the sequential loop pinned in tests/test_vphased.py).
    Round 2 benched the single-subject fused phase at 14.8k samples/s;
    the subject axis was the missing parallelism. Each invocation consumes
    fresh host-RNG batch plans, so the tunnel cannot memoize repeats."""
    import jax

    from multimodal_sentiment_aanalysis_tpu.train import (
        VectorizedPhasedTrainer,
    )

    vt = VectorizedPhasedTrainer(
        model_cls(), full_ds, n_subjects, ex_nums, batch_size=BATCH,
        rng_impl="rbg", verbose=False,
    )
    t0 = time.perf_counter()
    vt.run_phase("fusion_arousal", PHASED_TIMED)  # device_get inside syncs
    _sync(vt.params)
    log(f"  compile + warm-up phase ({PHASED_TIMED} epochs x "
        f"{n_subjects} subjects): {time.perf_counter() - t0:.1f}s")

    n_train = vt.train_idx.shape[1]
    t0 = time.perf_counter()
    vt.run_phase("fusion_arousal", PHASED_TIMED)  # device_get inside syncs
    _sync(vt.params)
    elapsed = time.perf_counter() - t0
    sps = PHASED_TIMED * n_subjects * n_train / elapsed
    log(f"  {PHASED_TIMED} phased epochs x {n_subjects} subjects "
        f"(incl. per-epoch eval) in {elapsed:.3f}s -> {sps:.0f} samples/s")
    return sps


def bench_serving(trainer, ds, peak):
    """Inference latency/throughput via one scan over SERVE_K distinct
    gathered batches (device-resident pool; fresh index plan per
    invocation so the tunnel cannot memoize)."""
    import jax
    import jax.numpy as jnp

    from multimodal_sentiment_aanalysis_tpu.eval.serving import (
        build_serving_forward,
    )

    variables = {
        "params": jax.tree.map(lambda x: x[0], trainer.params["model"]),
        "batch_stats": jax.tree.map(lambda x: x[0], trainer.batch_stats),
    }
    fwd = build_serving_forward(variables)
    arrays = ds.arrays

    def build_serve_many(f):
        @jax.jit
        def serve_many(idxs):  # (K, B) -> per-batch argmax predictions
            def body(_, idx):
                a, v = f(
                    jnp.take(arrays["eeg"], idx, axis=0),
                    jnp.take(arrays["eye"], idx, axis=0),
                    jnp.take(arrays["pps"], idx, axis=0),
                )
                return None, (a.argmax(-1), v.argmax(-1))

            return jax.lax.scan(body, None, idxs)[1]

        return serve_many

    rng = np.random.default_rng(3)
    plan = lambda: jnp.asarray(
        rng.integers(0, ds.n, (SERVE_K, BATCH)).astype(np.int32)
    )
    lowered = build_serve_many(fwd).lower(plan())
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    log(f"  compile: {compile_s:.1f}s")
    log_cache_effect("serving", compile_s)
    # per-batch FLOPs from the un-scanned forward (see _flops note). The
    # serving graph embeds Pallas custom calls (conv stem, and the LSTM
    # off-dispatch) that cost_analysis cannot see inside, so lower the
    # pure-XLA eval forward of the same model instead — same logits, BN
    # un-folded (a slight FLOP overcount, i.e. MFU reads conservative).
    sample = {k: jnp.take(v, jnp.arange(BATCH), axis=0) for k, v in
              arrays.items() if k in ("eeg", "eye", "pps")}
    with _pure_xla(), jax.default_device(jax.devices("cpu")[0]):
        batch_flops = _flops(jax.jit(
            lambda e, y, p: trainer.model.apply(variables, e, y, p)
        ).lower(sample["eeg"], sample["eye"], sample["pps"]))

    _sync(compiled(plan()))  # warm-up, distinct plan
    t0 = time.perf_counter()
    out = compiled(plan())  # timed, another distinct plan
    _sync(out)
    elapsed = time.perf_counter() - t0

    lat_ms = elapsed / SERVE_K * 1e3
    sps = SERVE_K * BATCH / elapsed
    mfu = (batch_flops * SERVE_K / elapsed / peak
           if (batch_flops and peak) else None)
    log(f"  {SERVE_K} batches of {BATCH} in {elapsed:.3f}s -> "
        f"{lat_ms:.3f} ms/batch, {sps:.0f} samples/s"
        + (f", MFU {mfu:.2%}" if mfu is not None else ""))

    # bf16 throughput config at the deployment-recommended batch (the
    # forward is latency-bound below B~128; bf16 wins from B=512 up —
    # sweep table in eval/serving.py). Its own try: a failure here must
    # not discard the fp32 metrics already measured above.
    sps16 = None
    try:
        B16 = 512
        fwd16 = build_serving_forward(variables, compute_dtype=jnp.bfloat16)
        serve16 = build_serve_many(fwd16)
        plan16 = lambda: jnp.asarray(
            rng.integers(0, ds.n, (SERVE_K, B16)).astype(np.int32))
        _sync(serve16(plan16()))  # compile + warm-up
        t0 = time.perf_counter()
        out = serve16(plan16())
        _sync(out)
        e16 = time.perf_counter() - t0
        sps16 = SERVE_K * B16 / e16
        log(f"  bf16 B={B16}: {SERVE_K} batches in {e16:.3f}s -> "
            f"{e16 / SERVE_K * 1e3:.3f} ms/batch, {sps16:.0f} samples/s")
    except Exception as e:
        log(f"  bf16 serving config failed: {e!r}")
    return lat_ms, sps, mfu, sps16


def _setup_data():
    from multimodal_sentiment_aanalysis_tpu.data import (
        DeviceDataset,
        assemble_features,
        make_synthetic_hci_data,
    )

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
    return DeviceDataset(arrays), arrays["arousal"].shape[0] // ex_nums, ex_nums


ONE_CONFIGS = {
    # tag -> (batch, compute_dtype, moment_dtype)
    "vloso_fp32_b128": (128, None, None),
    "vloso_bf16_b128": (128, "bfloat16", "bfloat16"),
    "vloso_fp32_b256": (256, None, None),
    "vloso_bf16_b256": (256, "bfloat16", "bfloat16"),
    # MFU-knee probe (round-5 verdict item 7): v9's segmented backward
    # scales VMEM with its batch block Bb, not B, so B=512 is reachable.
    "vloso_bf16_b512": (512, "bfloat16", "bfloat16"),
}


def run_one(tag: str) -> None:
    """Run a single secondary config and print its extras as one JSON line
    (used by main() via subprocess for HBM isolation)."""
    import jax

    from multimodal_sentiment_aanalysis_tpu.models import (
        MultimodalTransformerModel,
    )

    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind)
    log_cache_header()
    ds, n_subjects, _ = _setup_data()
    payload: dict = {}
    if tag == "vloso_fp32_es":
        sps_es, stop = bench_vloso_early_stop(
            MultimodalTransformerModel, ds, n_subjects)
        payload["vloso_fp32_es_samples_per_sec"] = round(sps_es, 1)
        payload["es_stop_epochs"] = stop
    else:
        b, cdt, mdt = ONE_CONFIGS[tag]
        sps_b, mfu_b, _ = bench_fused_vloso(
            MultimodalTransformerModel, ds, n_subjects, peak,
            compute_dtype=cdt, moment_dtype=mdt, batch=b, reps=2,
        )
        payload[f"{tag}_samples_per_sec"] = round(sps_b, 1)
        if mfu_b is not None:
            payload[f"{tag}_mfu"] = round(mfu_b, 4)
    print(json.dumps(payload))


def main() -> None:
    import jax

    from multimodal_sentiment_aanalysis_tpu.models import (
        MultimodalTransformerModel,
    )

    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind})")
    log_cache_header()
    peak = PEAK_FLOPS.get(dev.device_kind)
    budget = float(os.environ.get("MSA_BENCH_BUDGET_S", "1500"))
    t_start = time.perf_counter()

    def remaining() -> float:
        return budget - (time.perf_counter() - t_start)

    ds, n_subjects, ex_nums = _setup_data()
    extra: dict = {}
    skipped: list[str] = []

    def emit(sps_fp32: float) -> None:
        """Print the FULL result line now (flushed); the consumer takes the
        LAST JSON line on stdout, so every re-emission supersedes the
        previous one and a kill between configs costs only the unreached
        extras (BENCH_r04 lesson: one print at the end lost the round)."""
        if skipped:
            extra["skipped"] = list(skipped)
        print(
            json.dumps(
                {
                    "metric": "e2e_loso_train_throughput_b64",
                    "value": round(sps_fp32, 1),
                    "unit": "samples/sec/chip",
                    "vs_baseline": round(
                        sps_fp32 / BASELINE_SAMPLES_PER_SEC, 2),
                    "extra": extra,
                }
            ),
            flush=True,
        )

    log("[1/8] fused vectorized-LOSO training, fp32 (headline)")
    sps_fp32, mfu_fp32, trainer = bench_fused_vloso(
        MultimodalTransformerModel, ds, n_subjects, peak
    )
    if mfu_fp32 is not None:
        extra["vloso_fp32_mfu_vs_bf16_peak"] = round(mfu_fp32, 4)
    emit(sps_fp32)  # headline secured before anything else runs

    ev = trainer.evaluate()
    acc = float(ev["a_acc"].mean())
    log(f"  sanity eval: mean arousal acc {acc:.2%}")
    extra["vloso_fp32_sanity_arousal_acc"] = round(acc, 4)
    emit(sps_fp32)

    def over_budget(tag: str, need_s: float = 120.0) -> bool:
        r = remaining()
        if r < need_s:
            log(f"  SKIP {tag}: {r:.0f}s left of {budget:.0f}s budget")
            skipped.append(tag)
            return True
        return False

    # Secondary configs, each in its OWN subprocess (HBM isolation: every
    # config allocates its own 24-model params+moments, and accumulating
    # them in one process RESOURCE_EXHAUSTED the chip from the B=256
    # config on, 2026-08-19; exit frees everything and a failure cannot
    # poison later configs). ORDER: the early-stop program — the
    # reference's actual training semantics (Trainer.py:107-117) — runs
    # FIRST; the batch-scaling deployment extras follow; the B=512 knee
    # probe, phased, and serving close. A budget exhaustion therefore
    # drops deployment extras before reference-relevant numbers.
    import subprocess

    subprocess_tags = (
        "vloso_fp32_es",
        "vloso_fp32_b128", "vloso_bf16_b128", "vloso_fp32_b256",
        "vloso_bf16_b256", "vloso_bf16_b512",
    )
    for i, tag in enumerate(subprocess_tags):
        log(f"[{2 + i}/8] isolated config {tag}")
        if over_budget(tag):
            continue
        try:
            out = subprocess.run(
                [sys.executable, __file__, f"--one={tag}"],
                capture_output=True, text=True,
                timeout=max(remaining(), 60.0),
            )
            stderr_lines = out.stderr.splitlines()
            if out.returncode != 0 or not out.stdout.strip():
                # Failed compile/run: a compiler VMEM dump can be hundreds
                # of lines — keep the tail, which carries the actual error.
                for line in stderr_lines[-12:]:
                    log(f"  {line}")
                log(f"  {tag} FAILED (exit {out.returncode}, "
                    f"{len(stderr_lines)} stderr lines)")
                continue
            for line in stderr_lines:
                log(f"  {line}")
            payload = json.loads(out.stdout.strip().splitlines()[-1])
            extra.update(payload)
            emit(sps_fp32)
        except Exception as e:
            log(f"  {tag} failed: {e!r}")

    # bf16 B=64 runs in-process (only 2 live trainers incl. the headline's,
    # measured fine) so its trainer can sanity-eval without a re-setup.
    log("[8/8] in-process configs: bf16, phased, serving")
    if not over_budget("vloso_bf16"):
        try:
            sps_bf16, mfu_bf16, trainer16 = bench_fused_vloso(
                MultimodalTransformerModel, ds, n_subjects, peak,
                compute_dtype="bfloat16", moment_dtype="bfloat16",
            )
            extra["vloso_bf16_samples_per_sec"] = round(sps_bf16, 1)
            if mfu_bf16 is not None:
                extra["vloso_bf16_mfu"] = round(mfu_bf16, 4)
            acc16 = float(trainer16.evaluate()["a_acc"].mean())
            log(f"  sanity eval: mean arousal acc {acc16:.2%}")
            extra["vloso_bf16_sanity_arousal_acc"] = round(acc16, 4)
            del trainer16  # free the stacked params/moments
            emit(sps_fp32)
        except Exception as e:  # never lose earlier results to this config
            log(f"  bf16 config failed: {e!r}")
    import gc

    gc.collect()

    if not over_budget("phased"):
        try:
            extra["phased_samples_per_sec"] = round(
                bench_phased(MultimodalTransformerModel, ds, n_subjects,
                             ex_nums), 1
            )
            emit(sps_fp32)
        except Exception as e:
            log(f"  phased config failed: {e!r}")

    if not over_budget("serving"):
        try:
            lat_ms, serve_sps, serve_mfu, serve_sps16 = bench_serving(
                trainer, ds, peak)
            extra["serving_latency_ms_b64"] = round(lat_ms, 3)
            extra["serving_samples_per_sec"] = round(serve_sps, 1)
            if serve_mfu is not None:
                extra["serving_mfu"] = round(serve_mfu, 4)
            if serve_sps16 is not None:
                extra["serving_bf16_b512_samples_per_sec"] = round(
                    serve_sps16, 1)
        except Exception as e:
            log(f"  serving config failed: {e!r}")

    extra["bench_wall_s"] = round(time.perf_counter() - t_start, 1)
    emit(sps_fp32)


if __name__ == "__main__":
    one = [a for a in sys.argv[1:] if a.startswith("--one=")]
    if one:
        run_one(one[0].split("=", 1)[1])
    else:
        main()
