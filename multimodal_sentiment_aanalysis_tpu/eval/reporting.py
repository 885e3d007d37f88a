"""Metrics reports, plots, and the experiment-history CSV appender.

Counterpart of the reference's reporting toolbox:

- :class:`Myreport` — precision/recall/F1 from a confusion matrix
  (reference ``common/utils.py:168-212``)
- :func:`plot_progress` — 2-panel loss/accuracy curves
  (``MultiTaskTrainer.py:529-553``, ``Trainer.py:168-190``)
- :func:`plot_confusion_matrix` — CM heatmap saved to file
  (``Tester.py:100-110``, ``common/utils.py:103-133``)
- :func:`plot_subject_accuracies` — per-subject accuracy bars + mean
  (``common/utils.py:136-162``)
- :func:`history2df` / :func:`save_history` — experiment history CSV
  appender keyed by config-column match (``common/utils.py:289-412``)

All plotting uses the Agg backend and writes files (headless TPU hosts).
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..config import Config, flatten_config  # noqa: E402


def accumulate_confusion(preds, labels, conf_matrix):
    """In-place CM accumulation (reference common/utils.py:19-22)."""
    for p, t in zip(np.asarray(preds), np.asarray(labels)):
        conf_matrix[p, t] += 1
    return conf_matrix


def normalize_cm(cm: np.ndarray) -> np.ndarray:
    """Transpose-then-row-normalize a confusion matrix, zeroing cells that
    round to <1% (reference ``common/utils.py:245-256``).

    The reference stores CMs with rows=predictions/cols=true (see
    :func:`accumulate_confusion`); the transpose flips to rows=true before
    normalizing, so each output row is the per-true-class prediction
    distribution. Cells where ``int(v*100 + 0.5) == 0`` are zeroed so the
    heatmap annotation layer stays legible.
    """
    cm = np.asarray(cm, dtype=float).T
    cm = cm / cm.sum(axis=1, keepdims=True)
    cm[np.floor(cm * 100 + 0.5).astype(int) == 0] = 0.0
    return cm


class Myreport:
    """Confusion-matrix-derived precision/recall/F1 report.

    Matches reference ``common/utils.py:168-212`` conventions: rows are
    predictions, columns are true labels; precision = diag / row-sum,
    recall = diag / col-sum.
    """

    def __init__(self):
        self._confusion: np.ndarray | None = None

    def _statistics_confusion(self, y_true, y_predict, num_cls: int):
        cm = np.zeros((num_cls, num_cls))
        for t, p in zip(np.asarray(y_true), np.asarray(y_predict)):
            cm[p][t] += 1
        self._confusion = cm

    def _acc(self):
        return np.sum(self._confusion.diagonal()) / np.sum(self._confusion)

    def _precision(self):
        return self._confusion.diagonal() / np.sum(self._confusion, axis=1)

    def _recall(self):
        return self._confusion.diagonal() / np.sum(self._confusion, axis=0)

    @staticmethod
    def _f1(pc, rc):
        return 2 * np.multiply(pc, rc) / (pc + rc)

    def report(self, y_true, y_predict, class_names) -> str:
        self._statistics_confusion(y_true, y_predict, num_cls=len(class_names))
        pc, rc = self._precision(), self._recall()
        f1 = self._f1(pc, rc)
        lines = ["Class Name\tprecision\trecall\tf1-score"]
        for i, name in enumerate(class_names):
            lines.append(f"{name}\t{pc[i]:.2f}\t{rc[i]:.2f}\t{f1[i]:.2f}")
        lines.append(f"accuracy is {self._acc():.2f}")
        return "\n".join(lines)

    def report_f1score(self, cm) -> np.ndarray:
        self._confusion = np.asarray(cm)
        pc, rc = self._precision(), self._recall()
        return self._f1(pc, rc)


def plot_progress(metrics: dict, save_path: str) -> str:
    """Loss + accuracy curves, two panels (reference MultiTaskTrainer:529-553)."""
    fig, axes = plt.subplots(1, 2, figsize=(15, 6))
    axes[0].plot(metrics["train"]["loss"], label="Train Loss")
    axes[0].plot(metrics["test"]["loss"], label="Test Loss")
    axes[0].set_title("Loss Curves")
    axes[0].set_xlabel("Epoch")
    axes[0].set_ylabel("Loss")
    axes[0].legend()

    axes[1].plot(metrics["train"]["a_acc"], "--", label="Train Arousal Acc")
    axes[1].plot(metrics["train"]["v_acc"], "--", label="Train Valence Acc")
    axes[1].plot(metrics["test"]["a_acc"], label="Test Arousal Acc")
    axes[1].plot(metrics["test"]["v_acc"], label="Test Valence Acc")
    axes[1].set_title("Accuracy Curves")
    axes[1].set_xlabel("Epoch")
    axes[1].set_ylabel("Accuracy")
    axes[1].legend()

    fig.tight_layout()
    fig.savefig(save_path)
    plt.close(fig)
    return save_path


def plot_confusion_matrix(
    cm: np.ndarray,
    save_path: str,
    class_names: list[str] | None = None,
    normalize: bool = False,
    title: str = "Confusion Matrix",
) -> str:
    """CM heatmap saved to file (reference Tester.py:100-110)."""
    cm = np.asarray(cm, dtype=float)
    if normalize:
        cm = cm / cm.sum(axis=1, keepdims=True)
    if class_names is None:
        class_names = [f"Class {i}" for i in range(cm.shape[0])]
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(cm, interpolation="nearest", cmap=plt.cm.Blues)
    fig.colorbar(im)
    ax.set_xticks(range(len(class_names)), class_names, rotation=45)
    ax.set_yticks(range(len(class_names)), class_names)
    fmt = "%.2f" if normalize else "%d"
    thresh = cm.max() / 2.0
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            ax.text(
                j, i, fmt % cm[i, j], ha="center",
                color="white" if cm[i, j] > thresh else "black",
            )
    ax.set_title(title)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    fig.tight_layout()
    fig.savefig(save_path)
    plt.close(fig)
    return save_path


def plot_subject_accuracies(
    subject_acc: list[float], save_path: str, x_label: str = "Subject Number"
) -> str:
    """Per-subject accuracy bars with a trailing mean bar
    (reference common/utils.py:136-162)."""
    accs = list(subject_acc) + [float(np.mean(subject_acc))]
    labels = [str(i + 1) for i in range(len(subject_acc))] + ["Mean"]
    fig, ax = plt.subplots(figsize=(max(8, len(accs) * 0.7), 5))
    ax.bar(range(len(accs)), accs)
    for i, a in enumerate(accs):
        ax.text(i, a, f"{a:.2f}", ha="center", va="bottom", fontsize=10)
    ax.set_xticks(range(len(accs)), labels)
    ax.set_xlabel(x_label)
    ax.set_ylabel("Acc")
    fig.tight_layout()
    fig.savefig(save_path)
    plt.close(fig)
    return save_path


# ---------------------------------------------------------------------------
# experiment-history CSV appender
# ---------------------------------------------------------------------------

def parse_cm(cm_str: str) -> np.ndarray:
    """Parse a flattened CM string back to an int array
    (reference common/utils.py:275-286 handles the bracketed variant; here the
    canonical storage is comma-joined ints with a known class count)."""
    values = list(map(int, re.findall(r"-?\d+", cm_str)))
    n = int(round(len(values) ** 0.5))
    return np.array(values).reshape(n, n)


def history2df(history: dict):
    """Per-subject history -> DataFrame with Mean/Std rows
    (reference common/utils.py:289-338)."""
    import pandas as pd

    rows = []
    for subject, d in history.items():
        cm_str = ",".join(map(str, np.asarray(d["cm"]).flatten()))
        rows.append(
            [subject, d["epoch"], d["acc"], d["loss"], d["f1-score"], cm_str]
        )
    for name, fn in (("Mean", np.mean), ("Std", np.std)):
        rows.append(
            [
                name,
                fn([d["epoch"] for d in history.values()]),
                fn([d["acc"] for d in history.values()]),
                fn([d["loss"] for d in history.values()]),
                fn([d["f1-score"] for d in history.values()]),
                None,
            ]
        )
    return pd.DataFrame(
        rows, columns=["subject", "epoch", "acc", "loss", "f1-score", "cm"]
    )


def save_history(config: Config | dict, data_name: str, timestamp: str, history: dict) -> str:
    """Append one experiment row (flattened config + per-subject acc/f1) to a
    history CSV whose columns match; create a new file otherwise.

    Reference ``common/utils.py:341-412``.
    """
    import pandas as pd

    if isinstance(config, Config):
        log_dir = config.logging.log_dir
        dependent = config.training.dependent
        n_folds = config.training.n_folds
        subject_lists = config.data.HCI.subject_lists
    else:
        log_dir = config["logging"]["log_dir"]
        dependent = config["training"]["dependent"]
        n_folds = config["training"]["n_folds"]
        subject_lists = config["data"]["HCI"]["subject_lists"]

    save_dir = Path(log_dir)
    os.makedirs(save_dir, exist_ok=True)

    flat = flatten_config(config if isinstance(config, dict) else config.to_dict())
    flat = {"timestamp": timestamp, **flat}
    config_df = pd.DataFrame(flat, index=[0])

    metric_df = history2df(history)
    cm_total = np.sum(
        [parse_cm(s) for s in metric_df["cm"].dropna()], axis=0
    )
    cm_str = np.array2string(cm_total, separator=",")

    fmt = metric_df.drop(columns=["epoch", "loss", "cm"]).set_index("subject").T
    fmt = fmt.map(lambda x: f"{x:.4f}")
    combined = fmt.loc["acc"] + "/" + fmt.loc["f1-score"]
    new_df = pd.DataFrame([combined]).reset_index(drop=True)
    config_df = pd.concat([config_df, new_df], axis=1)

    config_df = config_df.rename(columns={"Mean": "Acc/Std", "Std": "F1/Std"})
    config_df["cm"] = cm_str

    existing = [
        save_dir / f for f in os.listdir(save_dir) if f.startswith("history")
    ]
    for path in existing:
        old_df = pd.read_csv(path)
        if old_df.columns.astype(str).equals(config_df.columns.astype(str)):
            config_df.to_csv(path, mode="a", header=False, index=False)
            return str(path)

    folds = n_folds if dependent else len(subject_lists)
    path = save_dir / f"history_{data_name}_{folds}_{len(existing)}.csv"
    config_df.to_csv(path, index=False)
    return str(path)
