"""Command-line drivers.

TPU-native rebuild of the reference's L5 entry points (SURVEY.md §1):

- ``phased``  — LOSO outer loop over the 5-phase curriculum trainer
  (reference ``main.py:52-68`` -> ``MultiTaskTrainer.run(50,70,50,10,100)``)
- ``simclr``  — contrastive pretrain -> frozen-encoder finetune LOSO loop
  (reference ``train.py:141-205``)
- ``single``  — single-stage CE+contrastive trainer with early stopping
  (reference ``Trainer.py:9-263`` driven per subject)
- ``eval``    — checkpoint evaluation with classification report + confusion
  matrices (reference ``main.py:34-49`` -> ``Tester``)
- ``inspect`` — first-batch shape sanity check (reference ``printData.py:21-31``)
- ``export``  — checkpoint -> self-contained StableHLO serving artifact
  (net-new deployment path; the reference can only re-load ``.pth`` into
  the Python model class, ``Tester.py:29-35``)

Every subcommand accepts ``--synthetic`` (deterministic generated dataset
with the reference pickle schema) or ``--data /path/to/hci_data.pkl``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _load_arrays(args) -> tuple[dict, int]:
    """Dataset -> normalized feature arrays dict; returns (arrays, ex_nums)."""
    from .data import assemble_features, make_synthetic_hci_data
    from .data.raw import RawData

    if getattr(args, "tiny", False):
        # smoke mode: 3 subjects x 8 trials, EEG time sliced to 64 —
        # pairs with the shrunken model dims from _model_kwargs. A --data
        # pickle (same tiny shape) still loads, so the on-disk ingest path
        # (RawData, reference data/RawData.py:29-38) is CI-testable.
        args.ex_nums = 8
        if args.data and not args.synthetic:
            data = RawData(args.data).data
        else:
            data = make_synthetic_hci_data(seed=args.seed, n_subjects=3,
                                           ex_nums=8)
    elif args.synthetic or not args.data:
        data = make_synthetic_hci_data(seed=args.seed)
    else:
        data = RawData(args.data).data
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
    if getattr(args, "tiny", False):
        arrays["eeg"] = np.ascontiguousarray(arrays["eeg"][:, :, :64])
    ex_nums = args.ex_nums
    return arrays, ex_nums


def _model_kwargs(args) -> dict:
    """Model-dim overrides for --tiny smoke mode."""
    if getattr(args, "tiny", False):
        return {"feat_dim": 32, "eeg_time": 64}
    return {}


def _subject_range(args, n_subjects: int) -> list[int]:
    if args.subjects:
        return [int(s) for s in args.subjects.split(",")]
    return list(range(n_subjects))


def cmd_phased(args) -> None:
    """LOSO loop over the phased multi-task trainer (reference main.py)."""
    import jax

    from .data import DeviceDataset, loso_split
    from .eval.reporting import plot_subject_accuracies
    from .models import MultimodalTransformerModel
    from .train import MultiTaskTrainer

    arrays, ex_nums = _load_arrays(args)
    n_subjects = arrays["arousal"].shape[0] // ex_nums
    full = DeviceDataset(arrays)
    os.makedirs(args.checkpoint_dir, exist_ok=True)

    model = MultimodalTransformerModel(**_model_kwargs(args))
    if args.vectorized:
        _phased_vectorized(args, model, full, n_subjects, ex_nums)
        return
    mesh = None
    if args.dp:
        # batch-DP for the sequential loop: batch rows sharded over all
        # local devices, XLA inserts the collectives (GSPMD)
        from .parallel import make_mesh

        mesh = make_mesh()
    trainer = None
    tester = None
    results: dict[int, dict[str, float]] = {}
    history: dict[int, dict] = {}
    for sid in _subject_range(args, n_subjects):
        tr_idx, te_idx = loso_split(n_subjects, ex_nums, sid)
        train_ds, test_ds = full.subset(tr_idx), full.subset(te_idx)
        # seed+sid: each subject trains from a fresh init, as in the
        # reference, where the torch global RNG advances between the
        # per-subject model re-instantiations (main.py:66)
        if trainer is None:
            trainer = MultiTaskTrainer(
                model, train_ds, test_ds, test_person=sid,
                checkpoint_dir=args.checkpoint_dir, seed=args.seed + sid,
                verbose=not args.quiet,
                reset_optimizer_each_epoch=not args.no_reset_optimizer,
                fused_phases=args.fused_phases, mesh=mesh,
            )
        else:
            # shapes are identical across subjects: reuse compiled programs
            trainer.reset(train_ds, test_ds, test_person=sid,
                          seed=args.seed + sid)
        print(f"===== LOSO test subject {sid} =====")
        final = trainer.run(*args.epochs, save=True, plot=not args.no_plots)
        results[sid] = final
        print(
            f"subject {sid}: arousal acc {final.get('a_acc', float('nan')):.2%} "
            f"valence acc {final.get('v_acc', float('nan')):.2%}"
        )
        if args.history_dir:
            from .eval import Myreport, Tester
            from .eval.reporting import accumulate_confusion

            variables = {"params": trainer.params,
                         "batch_stats": trainer.batch_stats}
            if tester is None:
                tester = Tester(model, test_ds, variables=variables)
            else:
                # identical shapes: reuse the jitted predict across subjects
                tester.test_data, tester.variables = test_ds, variables
            r = tester.evaluate(verbose=False, plot_dir=args.checkpoint_dir)
            preds = r["arousal"]["predictions"]
            labels = r["arousal"]["labels"]
            cm = accumulate_confusion(
                preds, labels, np.zeros((3, 3), np.int64)
            )
            f1 = float(np.nan_to_num(Myreport().report_f1score(cm)).mean())
            history[sid] = {
                "epoch": sum(args.epochs),
                "acc": float(r["arousal"]["accuracy"]),
                "loss": float(r["arousal"]["loss"]),
                "f1-score": f1,
                "cm": cm,
            }
    a = float(np.mean([r.get("a_acc", float("nan")) for r in results.values()]))
    v = float(np.mean([r.get("v_acc", float("nan")) for r in results.values()]))
    print(f"LOSO mean: arousal {a:.2%} valence {v:.2%}")
    if args.history_dir and history:
        import datetime

        from .config import Config
        from .eval.reporting import save_history

        cfg = Config()
        cfg.logging.log_dir = args.history_dir
        path = save_history(
            cfg, "HCI",
            datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"), history,
        )
        print(f"history appended to {path}")
    if not args.no_plots:
        plot_subject_accuracies(
            [results[k]["a_acc"] for k in sorted(results)],
            f"{args.checkpoint_dir}/subject_accuracies.png",
        )
    _write_results(args, {"per_subject": {str(k): v for k, v in results.items()},
                          "mean_arousal_acc": a, "mean_valence_acc": v})


def _phased_vectorized(args, model, full, n_subjects, ex_nums) -> None:
    """All subjects' 5-phase curricula in one program per phase
    (:class:`train.vphased.VectorizedPhasedTrainer`) — the TPU-native form
    of the reference's flagship 24-run sequential loop."""
    import numpy as np

    from .eval.reporting import plot_subject_accuracies
    from .train import VectorizedPhasedTrainer

    if args.subjects:
        print("note: --vectorized trains ALL subjects; --subjects ignored")
    mesh = None
    if args.dp:
        from .parallel import make_mesh

        mesh = make_mesh()
    trainer = VectorizedPhasedTrainer(
        model, full, n_subjects, ex_nums, seed=args.seed,
        compute_dtype="bfloat16" if args.bf16 else None,
        mesh=mesh, verbose=not args.quiet,
        reset_optimizer_each_epoch=not args.no_reset_optimizer,
        early_stop=getattr(args, "early_stop", False),
    )
    if getattr(args, "resume", None):
        trainer.restore_state(args.resume)
        print(f"resumed from {args.resume}")
    res = trainer.run(*args.epochs)
    if getattr(args, "early_stop", False) and not args.quiet:
        for ph in trainer._phase_sched:
            print(trainer.stop_report(ph))
    if getattr(args, "save_state", None):
        print(f"state saved to {trainer.save_state(args.save_state)}")
    for sid in range(n_subjects):
        print(
            f"subject {sid}: arousal acc "
            f"{res['per_subject_arousal'][sid]:.2%} valence acc "
            f"{res['per_subject_valence'][sid]:.2%}"
        )
    print(
        f"LOSO mean: arousal {res['mean_arousal_acc']:.2%} "
        f"valence {res['mean_valence_acc']:.2%}"
    )
    trainer.save_checkpoints(args.checkpoint_dir)
    if args.history_dir:
        import datetime

        from .config import Config
        from .eval import Myreport, Tester
        from .eval.reporting import accumulate_confusion, save_history

        history: dict[int, dict] = {}
        tester = None
        for sid in range(n_subjects):
            test_ds = full.subset(trainer.test_idx[sid])
            variables = trainer.subject_variables(sid)
            if tester is None:
                tester = Tester(model, test_ds, variables=variables)
            else:
                tester.test_data, tester.variables = test_ds, variables
            r = tester.evaluate(verbose=False, plot_dir=args.checkpoint_dir)
            cm = accumulate_confusion(
                r["arousal"]["predictions"], r["arousal"]["labels"],
                np.zeros((3, 3), np.int64),
            )
            f1 = float(np.nan_to_num(Myreport().report_f1score(cm)).mean())
            history[sid] = {
                "epoch": sum(args.epochs),
                "acc": float(r["arousal"]["accuracy"]),
                "loss": float(r["arousal"]["loss"]),
                "f1-score": f1,
                "cm": cm,
            }
        cfg = Config()
        cfg.logging.log_dir = args.history_dir
        path = save_history(
            cfg, "HCI",
            datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"), history,
        )
        print(f"history appended to {path}")
    if not args.no_plots:
        plot_subject_accuracies(
            [float(x) for x in res["per_subject_arousal"]],
            f"{args.checkpoint_dir}/subject_accuracies.png",
        )
    _write_results(args, {
        "per_subject": {
            str(s): {
                "a_acc": float(res["per_subject_arousal"][s]),
                "v_acc": float(res["per_subject_valence"][s]),
            }
            for s in range(n_subjects)
        },
        "mean_arousal_acc": res["mean_arousal_acc"],
        "mean_valence_acc": res["mean_valence_acc"],
    })


def cmd_simclr(args) -> None:
    """Contrastive pretrain -> frozen finetune LOSO loop (reference train.py)."""
    from .data import DeviceDataset, build_contrastive_pairs, loso_split
    from .data.splits import subject_ids_array
    from .models import Classifier, MultiModalEncoder, ProjectionHead
    from .train import contrastive_pretrain, finetune

    arrays, ex_nums = _load_arrays(args)
    n_subjects = arrays["arousal"].shape[0] // ex_nums
    full = DeviceDataset(arrays)
    subject_ids = subject_ids_array(n_subjects, ex_nums)

    mk = _model_kwargs(args)
    if mk:
        encoder = MultiModalEncoder(feat_dim=mk["feat_dim"],
                                    eeg_time=mk["eeg_time"])
        projector = ProjectionHead(in_dim=mk["feat_dim"])
        classifier = Classifier(in_dim=mk["feat_dim"])
    else:
        encoder = MultiModalEncoder()
        projector = ProjectionHead()
        classifier = Classifier()

    if getattr(args, "vectorized", False):
        from .train import VectorizedSimCLRTrainer

        if args.subjects:
            print("note: --vectorized trains ALL subjects; --subjects ignored")
        trainer = VectorizedSimCLRTrainer(
            encoder, projector, classifier, full, n_subjects, ex_nums,
            seed=args.seed, verbose=not args.quiet,
        )
        out = trainer.run(args.pretrain_epochs, args.finetune_epochs)
        per = out["per_subject"]
        print(f"LOSO mean: arousal {out['mean_arousal_acc']:.2%} "
              f"valence {out['mean_valence_acc']:.2%}")
        _write_results(args, {
            "per_subject": {
                str(s): {"a_acc": float(per["a_acc"][s]),
                         "v_acc": float(per["v_acc"][s])}
                for s in range(n_subjects)
            },
            "mean_arousal_acc": out["mean_arousal_acc"],
            "mean_valence_acc": out["mean_valence_acc"],
        })
        return

    results = {}
    for sid in _subject_range(args, n_subjects):
        tr_idx, te_idx = loso_split(n_subjects, ex_nums, sid)
        train_ds, test_ds = full.subset(tr_idx), full.subset(te_idx)
        pair_idx, pair_lab = build_contrastive_pairs(
            arrays["arousal"][tr_idx], arrays["valence"][tr_idx],
            subject_ids[tr_idx], seed=args.seed,
        )
        print(f"===== LOSO test subject {sid} ({len(pair_idx)} pairs) =====")
        enc_vars, _, _ = contrastive_pretrain(
            encoder, projector, train_ds, pair_idx, pair_lab,
            num_epochs=args.pretrain_epochs, seed=args.seed,
            verbose=not args.quiet,
        )
        _, final = finetune(
            encoder, enc_vars, classifier, train_ds, test_ds,
            num_epochs=args.finetune_epochs, seed=args.seed,
            verbose=not args.quiet,
        )
        results[sid] = final
        print(
            f"subject {sid}: arousal acc {final['a_acc']:.2%} "
            f"valence acc {final['v_acc']:.2%}"
        )
    a = float(np.mean([r.get("a_acc", float("nan")) for r in results.values()]))
    v = float(np.mean([r.get("v_acc", float("nan")) for r in results.values()]))
    print(f"LOSO mean: arousal {a:.2%} valence {v:.2%}")
    _write_results(args, {"per_subject": {str(k): v for k, v in results.items()},
                          "mean_arousal_acc": a, "mean_valence_acc": v})


def cmd_single(args) -> None:
    """Single-stage CE+contrastive trainer per subject (reference Trainer.py)."""
    from .data import DeviceDataset, loso_split
    from .models import MultimodalTransformerModel
    from .train import Trainer

    arrays, ex_nums = _load_arrays(args)
    n_subjects = arrays["arousal"].shape[0] // ex_nums
    full = DeviceDataset(arrays)
    os.makedirs(args.checkpoint_dir, exist_ok=True)

    results = {}
    for sid in _subject_range(args, n_subjects):
        tr_idx, te_idx = loso_split(n_subjects, ex_nums, sid)
        trainer = Trainer(
            MultimodalTransformerModel(**_model_kwargs(args)), full.subset(tr_idx),
            full.subset(te_idx), checkpoint_dir=args.checkpoint_dir,
            seed=args.seed, verbose=not args.quiet,
        )
        print(f"===== LOSO test subject {sid} =====")
        trainer.run(args.epochs[0], test_person=sid)
        results[sid] = {
            "test_acc": trainer.test_acc[-1], "test_loss": trainer.test_loss[-1]
        }
        print(f"subject {sid}: test acc {trainer.test_acc[-1]:.2%}")
    a = float(np.mean([r["test_acc"] for r in results.values()]))
    print(f"LOSO mean arousal acc: {a:.2%}")
    _write_results(args, {"per_subject": {str(k): v for k, v in results.items()},
                          "mean_arousal_acc": a})


def cmd_vloso(args) -> None:
    """Vectorized LOSO: train every held-out-subject model simultaneously in
    one vmapped program (TPU-native replacement for the reference's 24-run
    sequential loop, main.py:62-68)."""
    from .data import DeviceDataset
    from .models import MultimodalTransformerModel
    from .train import VectorizedLOSOTrainer

    arrays, ex_nums = _load_arrays(args)
    n_subjects = arrays["arousal"].shape[0] // ex_nums
    mesh = None
    if args.dp:
        from .parallel import make_mesh

        mesh = make_mesh()
    trainer = VectorizedLOSOTrainer(
        MultimodalTransformerModel(**_model_kwargs(args)), DeviceDataset(arrays),
        n_subjects, ex_nums, seed=args.seed,
        batch_size=args.batch_size,
        compute_dtype="bfloat16" if args.bf16 else None,
        mesh=mesh,
        early_stop=args.early_stop,
        es_patience=args.es_patience,
    )
    if getattr(args, "resume", None):
        trainer.restore_state(args.resume)
        print(f"resumed from {args.resume}")
    res = trainer.run(
        args.epochs[0], verbose=not args.quiet, fused=args.fused,
        chunk=args.chunk,
    )
    out = {
        "mean_arousal_acc": res["mean_arousal_acc"],
        "mean_valence_acc": res["mean_valence_acc"],
        "per_subject_arousal": [float(x) for x in res["per_subject_arousal"]],
        "per_subject_valence": [float(x) for x in res["per_subject_valence"]],
    }
    if args.early_stop:
        out["stop_epochs"] = [int(x) for x in res["stop_epochs"]]
        out["final_arousal_acc"] = res["final_arousal_acc"]
        out["final_valence_acc"] = res["final_valence_acc"]
    if getattr(args, "save_state", None):
        print(f"state saved to {trainer.save_state(args.save_state)}")
    _write_results(args, out)


def cmd_memhacl(args) -> None:
    """ME-MHACL stack: NT-Xent pretrain on the full set, then joint
    encoder+classifier finetune on an 80/20 split (reference ME-MHACL/train.py)."""
    from .data import DeviceDataset
    from .data.memhacl import (
        load_emotion_npy,
        make_synthetic_emotion_arrays,
        random_split_indices,
    )
    from .models import MEMHACLClassifier, MEMHACLEncoder, ProjectionHead
    from .train import memhacl_finetune, memhacl_pretrain

    if args.npy_dir and not args.synthetic:
        d = args.npy_dir
        arrays = load_emotion_npy(
            f"{d}/eeg_data.npy", f"{d}/eye_data.npy",
            f"{d}/physio_data.npy", f"{d}/labels.npy",
        )
    else:
        arrays = make_synthetic_emotion_arrays(n=args.n_samples, seed=args.seed)
    full = DeviceDataset(arrays)
    tr_idx, va_idx = random_split_indices(len(full), 0.8, seed=args.seed)

    encoder = MEMHACLEncoder()
    enc_vars, _, _ = memhacl_pretrain(
        encoder, ProjectionHead(), full,
        num_epochs=args.pretrain_epochs, seed=args.seed,
        verbose=not args.quiet,
    )
    _, _, metrics = memhacl_finetune(
        encoder, enc_vars, MEMHACLClassifier(),
        full.subset(tr_idx), full.subset(va_idx),
        num_epochs=args.finetune_epochs, seed=args.seed,
        verbose=not args.quiet,
    )
    print(
        f"final: arousal acc {metrics['a_acc']:.2%} "
        f"valence acc {metrics['v_acc']:.2%}"
    )
    _write_results(args, metrics)


def cmd_eval(args) -> None:
    """Evaluate a checkpoint on one held-out subject (reference Tester)."""
    from .data import DeviceDataset, loso_split
    from .eval import Tester
    from .models import MultimodalTransformerModel

    arrays, ex_nums = _load_arrays(args)
    n_subjects = arrays["arousal"].shape[0] // ex_nums
    full = DeviceDataset(arrays)
    sid = int(args.subjects or 0)
    _, te_idx = loso_split(n_subjects, ex_nums, sid)
    tester = Tester(MultimodalTransformerModel(**_model_kwargs(args)),
                    full.subset(te_idx))
    results = tester.run(model_path=args.model_path, plot_dir=args.checkpoint_dir)
    _write_results(args, {
        "arousal_accuracy": results["arousal"]["accuracy"],
        "valence_accuracy": results["valence"]["accuracy"],
    })


def cmd_export(args) -> None:
    """Export a checkpoint to a self-contained StableHLO serving artifact.

    Deployment path the reference lacks (its serving story is re-loading a
    ``.pth`` state_dict into the Python model class, ``Tester.py:29-35``):
    the artifact bakes the weights into the lowered program and is callable
    from any JAX process without this package (``eval.export.load_serving``).
    """
    import jax
    import jax.numpy as jnp

    from .eval.export import export_serving
    from .models import MultimodalTransformerModel

    arrays, _ = _load_arrays(args)
    kw = _model_kwargs(args)
    model = MultimodalTransformerModel(**kw)

    def init_variables():
        # template for msgpack restore / fresh-init export; torch
        # checkpoints build variables from scratch and skip this compile
        sample = {k: v[:1] for k, v in arrays.items()}
        v = model.init(jax.random.key(args.seed),
                       sample["eeg"], sample["eye"], sample["pps"])
        return {"params": v["params"],
                "batch_stats": v.get("batch_stats", {})}

    if args.model_path:
        if args.model_path.endswith((".pt", ".pth")):
            from .models.torch_import import load_torch_checkpoint

            variables = load_torch_checkpoint(args.model_path)
        else:
            from .utils.checkpoint import load_checkpoint

            variables = load_checkpoint(args.model_path, init_variables())
        print(f"loaded checkpoint {args.model_path}")
    else:
        variables = init_variables()
        print("no --model-path: exporting freshly initialized weights "
              "(smoke mode)")

    schema = tuple(
        (tuple(arrays[k].shape[1:]), jnp.float32) for k in ("eeg", "eye", "pps")
    )
    blob = export_serving(
        variables, args.output,
        batch_size=args.batch_size,
        feat_dim=kw.get("feat_dim", 256),
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        input_schema=schema,
        platforms=args.platforms.split(",") if args.platforms else None,
    )
    batch = "polymorphic" if args.batch_size is None else str(args.batch_size)
    print(f"wrote {len(blob)} bytes to {args.output} "
          f"(batch={batch}{', bf16' if args.bf16 else ''})")
    _write_results(args, {"artifact_bytes": len(blob), "output": args.output})


def cmd_inspect(args) -> None:
    """First-batch shape sanity check (reference printData.py:21-31)."""
    from .data import DeviceDataset

    arrays, ex_nums = _load_arrays(args)
    ds = DeviceDataset(arrays)
    batch, mask = next(ds.batches(args.batch_size, shuffle=False))
    print(f"eeg:     {batch['eeg'].shape}   expected (B, 32, 585)")
    print(f"eye:     {batch['eye'].shape}          expected (B, 38)")
    print(f"pps:     {batch['pps'].shape}         expected (B, 230)")
    print(f"arousal: {batch['arousal'].shape}  valence: {batch['valence'].shape}")
    print(f"samples: {len(ds)} ({len(ds) // ex_nums} subjects x {ex_nums} trials)")
    for name in ("eeg", "eye", "pps"):
        x = np.asarray(batch[name])
        assert np.isfinite(x).all(), f"non-finite values in {name}"
    print("finite-check: OK")


def _write_results(args, payload: dict) -> None:
    if getattr(args, "results_json", None):
        with open(args.results_json, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"results written to {args.results_json}")


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data", default=None, help="path to hci_data.pkl")
    p.add_argument("--synthetic", action="store_true",
                   help="use the deterministic synthetic dataset")
    p.add_argument("--tiny", action="store_true",
                   help="smoke mode: 3-subject synthetic set + shrunken "
                        "model dims (fast compile; for CI and dry runs)")
    p.add_argument("--subjects", default=None,
                   help="comma-separated held-out subject indices (default all)")
    p.add_argument("--ex-nums", type=int, default=20, dest="ex_nums")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--checkpoint-dir", default="./checkpoints")
    p.add_argument("--results-json", default=None)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--no-plots", action="store_true")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                   help="force a JAX platform (the TPU plugin ignores "
                        "JAX_PLATFORMS; this sets the config flag before "
                        "backend init)")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="disable the persistent XLA compilation cache "
                        "(on by default: repeat invocations of the same "
                        "program skip the multi-minute TPU compile; see "
                        "utils/compilation_cache.py)")
    p.add_argument("--debug-nans", action="store_true",
                   help="global NaN tripwire: any op producing NaN raises "
                        "(whole-program analog of the reference's per-batch "
                        "NaN guards)")
    p.add_argument("--preflight", action="store_true",
                   help="validate the fused-kernel composition in a "
                        "disposable subprocess before training, walking the "
                        "mitigation ladder on a fault (costs one extra "
                        "compile; see utils/preflight.py)")


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        prog="multimodal_sentiment_aanalysis_tpu",
        description="TPU-native multimodal sentiment/emotion framework",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("phased", help="5-phase curriculum LOSO training")
    _add_common(p)
    p.add_argument("--epochs", type=int, nargs=5, default=[50, 70, 50, 10, 100],
                   metavar=("E_EEG", "E_EYE", "E_PPS", "E2", "E3"))
    p.add_argument("--history-dir", default=None,
                   help="append per-experiment acc/F1/CM row to a history CSV "
                        "in this directory (reference common/utils.py history)")
    p.add_argument("--no-reset-optimizer", action="store_true",
                   help="keep Adam moments and plateau-scheduler state across "
                        "epochs (the documented improvement over the "
                        "reference's per-epoch optimizer rebuild quirk, "
                        "MultiTaskTrainer.py:181,237,293,351,412)")
    p.add_argument("--fused-phases", action="store_true",
                   help="run each curriculum phase as ONE device program "
                        "(per-epoch optimizer reset + eval fused in; parity "
                        "mode only — removes per-epoch host round-trips)")
    p.add_argument("--early-stop", action="store_true", dest="early_stop",
                   help="with --vectorized: per-subject per-phase early "
                        "stopping as (S,) lanes inside the fused phase scan "
                        "(the reference's dormant early_stopping method, "
                        "MultiTaskTrainer.py:517-527); combine with "
                        "--no-reset-optimizer to also let the plateau LR "
                        "fire per subject")
    p.add_argument("--vectorized", action="store_true",
                   help="train ALL subjects' curricula simultaneously: one "
                        "vmapped device program per phase "
                        "(train.vphased.VectorizedPhasedTrainer); "
                        "per-subject math identical to the sequential loop")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (float32 master params); "
                        "--vectorized only")
    p.add_argument("--dp", action="store_true",
                   help="multi-device scale-out: with --vectorized, shard "
                        "the subject axis over all local devices; in the "
                        "sequential loop, shard each batch's rows (GSPMD "
                        "batch-DP, XLA-inserted collectives)")
    p.add_argument("--save-state", default=None, dest="save_state",
                   help="with --vectorized: write a full-state resume "
                        "checkpoint (all subjects) after the run")
    p.add_argument("--resume", default=None,
                   help="with --vectorized: restore a --save-state "
                        "checkpoint before training (phase-boundary resume)")
    p.set_defaults(fn=cmd_phased)

    p = sub.add_parser("simclr", help="contrastive pretrain + finetune LOSO")
    _add_common(p)
    p.add_argument("--pretrain-epochs", type=int, default=50)
    p.add_argument("--finetune-epochs", type=int, default=30)
    p.add_argument("--vectorized", action="store_true",
                   help="train ALL subjects' pretrain+finetune runs in one "
                        "vmapped program per epoch "
                        "(train.vsimclr.VectorizedSimCLRTrainer)")
    p.set_defaults(fn=cmd_simclr)

    p = sub.add_parser("single", help="single-stage CE+contrastive trainer")
    _add_common(p)
    p.add_argument("--epochs", type=int, nargs=1, default=[300])
    p.set_defaults(fn=cmd_single)

    p = sub.add_parser(
        "vloso", help="vectorized LOSO: all subject models in one program"
    )
    _add_common(p)
    p.add_argument("--epochs", type=int, nargs=1, default=[100])
    p.add_argument("--batch-size", type=int, default=64, dest="batch_size",
                   help="per-model batch (64 = reference-faithful; larger "
                        "batches raise MFU — B=128 was measured 1.36x the "
                        "B=64 throughput, scripts/bench_batch_scaling.py — "
                        "but change optimization dynamics)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (float32 master params)")
    p.add_argument("--dp", action="store_true",
                   help="shard the LOSO subject axis over all local devices "
                        "(data-parallel scale-out; 1 device degenerates to "
                        "the single-chip program)")
    p.add_argument("--fused", action="store_true",
                   help="compile all epochs into ONE program with on-device "
                        "batch plans (no host work in the loop)")
    p.add_argument("--early-stop", action="store_true", dest="early_stop",
                   help="per-subject early stopping (patience 5, best-"
                        "checkpoint capture) + ReduceLROnPlateau, the "
                        "reference Trainer's semantics, run INSIDE the "
                        "fused program as (S,) schedule lanes; --epochs "
                        "becomes an upper bound")
    p.add_argument("--es-patience", type=int, default=5, dest="es_patience",
                   help="early-stop patience (reference default 5)")
    p.add_argument("--chunk", type=int, default=None,
                   help="with --early-stop --fused: epochs per compiled "
                        "chunk (default 8); the run exits at the first "
                        "chunk boundary where every subject has stopped")
    p.add_argument("--save-state", default=None, dest="save_state",
                   help="write a full-state resume checkpoint (params, BN "
                        "stats, optimizer, RNG streams for all models) "
                        "after the run")
    p.add_argument("--resume", default=None,
                   help="restore a --save-state checkpoint before training")
    p.set_defaults(fn=cmd_vloso)

    p = sub.add_parser("memhacl", help="ME-MHACL pretrain + joint finetune")
    _add_common(p)
    p.add_argument("--npy-dir", default=None,
                   help="directory with eeg_data/eye_data/physio_data/labels .npy")
    p.add_argument("--n-samples", type=int, default=128,
                   help="synthetic dataset size")
    p.add_argument("--pretrain-epochs", type=int, default=50)
    p.add_argument("--finetune-epochs", type=int, default=30)
    p.set_defaults(fn=cmd_memhacl)

    p = sub.add_parser("eval", help="evaluate a checkpoint (Tester)")
    _add_common(p)
    p.add_argument("--model-path", required=True)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser(
        "export", help="export a checkpoint to a StableHLO serving artifact"
    )
    _add_common(p)
    p.add_argument("--model-path", default=None,
                   help="checkpoint to export (msgpack, or a reference "
                        "torch .pt/.pth); freshly initialized weights if "
                        "omitted (smoke mode)")
    p.add_argument("--output", required=True,
                   help="artifact file to write (e.g. serving.shlo)")
    p.add_argument("--batch-size", type=int, default=None,
                   help="fix the batch dim (default: batch-polymorphic — "
                        "one artifact serves any batch size)")
    p.add_argument("--bf16", action="store_true",
                   help="bake bf16-cast weights into the artifact; logits "
                        "return fp32")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering platforms to bake in "
                        "(e.g. cpu,tpu — ONE artifact then runs on both); "
                        "default: the exporting process's backend only")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("inspect", help="first-batch shape sanity check")
    _add_common(p)
    p.add_argument("--batch-size", type=int, default=64)
    p.set_defaults(fn=cmd_inspect)

    args = parser.parse_args(argv)
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
    # Persistent compile cache: default-on except under a forced-CPU probe
    # (CPU compiles take seconds, and XLA:CPU's AOT reloads log noisy
    # machine-feature warnings; the multi-minute compiles this saves are
    # all on the TPU path).
    if not getattr(args, "no_compile_cache", False) and args.platform != "cpu":
        from .utils.compilation_cache import (
            cache_enabled_by_env,
            enable_compilation_cache,
        )

        if cache_enabled_by_env():
            enable_compilation_cache()
    if getattr(args, "debug_nans", False):
        from .utils import enable_nan_debugging

        enable_nan_debugging(True)
    if getattr(args, "preflight", False):
        from .utils.preflight import ensure_safe_dispatch

        win, _ = ensure_safe_dispatch()
        if win is None:
            print("preflight: no mitigation rung passed — aborting "
                  "(not a kernel-dispatch problem)", file=sys.stderr)
            raise SystemExit(1)
        if win:
            print(f"preflight: running with mitigations {win}",
                  file=sys.stderr)
    args.fn(args)


if __name__ == "__main__":
    main()
