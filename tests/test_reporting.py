"""Reporting toolbox tests: CM math, report strings, history CSV, plots."""

import numpy as np
import pytest


class TestConfusionMath:
    def test_accumulate_confusion(self):
        from multimodal_sentiment_aanalysis_tpu.eval.reporting import (
            accumulate_confusion,
        )

        cm = np.zeros((3, 3), np.int64)
        accumulate_confusion([0, 1, 2, 2], [0, 2, 2, 1], cm)
        assert cm[0, 0] == 1  # pred 0 / true 0
        assert cm[1, 2] == 1  # pred 1 / true 2
        assert cm[2, 2] == 1
        assert cm[2, 1] == 1
        assert cm.sum() == 4

    def test_normalize_cm_matches_reference_formula(self):
        """Bit-match the reference normalize_cm (common/utils.py:245-256)."""
        from multimodal_sentiment_aanalysis_tpu.eval.reporting import normalize_cm

        rng = np.random.default_rng(0)
        cm = rng.integers(0, 50, size=(3, 3))

        # reference formula, verbatim semantics
        ref = cm.T.astype("float")
        ref = ref / ref.sum(axis=1)[:, np.newaxis]
        for i in range(ref.shape[0]):
            for j in range(ref.shape[1]):
                if int(ref[i, j] * 100 + 0.5) == 0:
                    ref[i, j] = 0
        np.testing.assert_allclose(normalize_cm(cm), ref)

    def test_normalize_cm_zeroes_sub_percent_cells(self):
        from multimodal_sentiment_aanalysis_tpu.eval.reporting import normalize_cm

        cm = np.array([[1000, 0], [1, 1000]])  # cm[1,0]=1 -> 0.1% of its col
        out = normalize_cm(cm)
        assert out[0, 1] == 0.0  # transposed position of the 0.1% cell
        assert out[0, 0] > 0.99

    def test_myreport_f1_matches_sklearn(self):
        from sklearn.metrics import f1_score

        from multimodal_sentiment_aanalysis_tpu.eval.reporting import Myreport

        rng = np.random.default_rng(1)
        y_true = rng.integers(0, 3, 100)
        y_pred = rng.integers(0, 3, 100)
        rep = Myreport()
        text = rep.report(y_true, y_pred, ["a", "b", "c"])
        assert "accuracy is" in text
        cm = rep._confusion
        f1 = rep.report_f1score(cm)
        sk = f1_score(y_true, y_pred, average=None, zero_division=0)
        np.testing.assert_allclose(np.nan_to_num(f1), sk, atol=1e-9)


class TestHistoryCSV:
    @pytest.fixture()
    def history(self):
        rng = np.random.default_rng(0)
        return {
            s: {
                "epoch": 10,
                "acc": float(rng.uniform(0.5, 1.0)),
                "loss": float(rng.uniform(0.1, 1.0)),
                "f1-score": float(rng.uniform(0.5, 1.0)),
                "cm": rng.integers(0, 10, (3, 3)),
            }
            for s in range(3)
        }

    def test_history2df_mean_std_rows(self, history):
        from multimodal_sentiment_aanalysis_tpu.eval.reporting import history2df

        df = history2df(history)
        assert list(df.columns) == [
            "subject", "epoch", "acc", "loss", "f1-score", "cm",
        ]
        assert list(df["subject"])[-2:] == ["Mean", "Std"]
        accs = [history[s]["acc"] for s in range(3)]
        assert df[df.subject == "Mean"]["acc"].iloc[0] == pytest.approx(
            np.mean(accs)
        )

    def test_save_history_appends_on_matching_columns(self, history, tmp_path):
        from multimodal_sentiment_aanalysis_tpu.config import Config
        from multimodal_sentiment_aanalysis_tpu.eval.reporting import save_history

        import pandas as pd

        cfg = Config()
        cfg.logging.log_dir = str(tmp_path)
        p1 = save_history(cfg, "HCI", "2026-01-01 00:00:00", history)
        p2 = save_history(cfg, "HCI", "2026-01-02 00:00:00", history)
        assert p1 == p2  # same schema -> appended, not a new file
        df = pd.read_csv(p1)
        assert len(df) == 2
        assert "Acc/Std" in df.columns and "F1/Std" in df.columns

    def test_parse_cm_roundtrip(self):
        from multimodal_sentiment_aanalysis_tpu.eval.reporting import parse_cm

        cm = np.arange(9).reshape(3, 3)
        s = ",".join(map(str, cm.flatten()))
        np.testing.assert_array_equal(parse_cm(s), cm)


class TestPlots:
    def test_plot_writers_create_files(self, tmp_path):
        from multimodal_sentiment_aanalysis_tpu.eval.reporting import (
            plot_confusion_matrix,
            plot_progress,
            plot_subject_accuracies,
        )

        cm = np.array([[5, 1], [2, 7]])
        p = plot_confusion_matrix(cm, str(tmp_path / "cm.png"), normalize=True)
        assert (tmp_path / "cm.png").exists(), p
        metrics = {
            "train": {"loss": [1.0, 0.5], "a_acc": [0.4, 0.6], "v_acc": [0.4, 0.5]},
            "test": {"loss": [1.1, 0.6], "a_acc": [0.3, 0.5], "v_acc": [0.3, 0.4]},
        }
        plot_progress(metrics, str(tmp_path / "prog.png"))
        assert (tmp_path / "prog.png").exists()
        plot_subject_accuracies([0.5, 0.7], str(tmp_path / "subj.png"))
        assert (tmp_path / "subj.png").exists()
