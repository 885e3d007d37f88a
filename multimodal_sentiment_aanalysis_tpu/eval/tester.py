"""Evaluation / inference engine.

TPU-native rebuild of reference ``Tester.py:9-133``, defined for the
dual-head model (the reference's evaluator assumes a single logits tensor
and is incompatible with its own flagship model's 2-tuple output,
``Tester.py:53`` vs ``MultimodalModel.py:319-320`` — documented deviation;
this Tester evaluates both heads explicitly and reports per-head metrics).

Capabilities mapped 1:1:

- checkpoint load incl. ``module.``-prefix stripping (``:29-35``)
- full eval loop accumulating preds/labels/probs (``:37-84``) — here a
  single jitted scan over the device-resident test set
- sklearn classification report (``:86-98``)
- confusion-matrix heatmap saved to file (``:100-110``)
- ``predict_single`` one-sample API (``:112-127``)
- ``run(model_path)`` orchestration (``:129-133``)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import DeviceDataset
from ..ops.losses import masked_cross_entropy
from ..utils.checkpoint import load_checkpoint, strip_module_prefix


class Tester:
    def __init__(self, model, test_data: DeviceDataset, variables: dict | None = None):
        self.model = model
        self.test_data = test_data
        self.variables = variables
        self._predict = jax.jit(
            lambda variables, eeg, eye, pps: model.apply(variables, eeg, eye, pps)
        )

    # ------------------------------------------------------------------
    def load_model(self, model_path: str) -> None:
        """Load a checkpoint into the model's variable structure.

        ``.pt``/``.pth`` paths are treated as reference torch
        ``state_dict`` checkpoints and converted via
        :mod:`..models.torch_import` (migration path: trained reference
        models evaluate here without retraining); anything else is this
        framework's msgpack format."""
        if model_path.endswith((".pt", ".pth")):
            from ..models.torch_import import load_torch_checkpoint

            self.variables = load_torch_checkpoint(model_path)
            print(f"Loaded torch reference weights from {model_path}")
            return
        if self.variables is None:
            sample = {k: v[:1] for k, v in self.test_data.arrays.items()}
            self.variables = self.model.init(
                jax.random.key(0), sample["eeg"], sample["eye"], sample["pps"]
            )
        target = {
            "params": self.variables["params"],
            "batch_stats": self.variables.get("batch_stats", {}),
        }
        loaded = load_checkpoint(model_path, target)
        if isinstance(loaded, dict):
            loaded = strip_module_prefix(loaded)
        self.variables = loaded
        print(f"Loaded model weights from {model_path}")

    # ------------------------------------------------------------------
    def evaluate(self, verbose: bool = True, batch_size: int = 64, plot_dir: str = ".") -> dict:
        assert self.variables is not None, "call load_model() or pass variables"
        arrays = self.test_data.arrays
        n = len(self.test_data)

        plan_idx, plan_mask = self.test_data.epoch_plan(batch_size, shuffle=False)
        all_a_logits, all_v_logits = [], []
        for b in range(plan_idx.shape[0]):
            batch = {k: jnp.take(v, plan_idx[b], axis=0) for k, v in arrays.items()}
            a_logits, v_logits = self._predict(
                self.variables, batch["eeg"], batch["eye"], batch["pps"]
            )
            all_a_logits.append(np.asarray(a_logits))
            all_v_logits.append(np.asarray(v_logits))
        a_logits = np.concatenate(all_a_logits)[:n]
        v_logits = np.concatenate(all_v_logits)[:n]

        a_labels = np.asarray(arrays["arousal"])[:n]
        v_labels = np.asarray(arrays["valence"])[:n]

        results = {}
        for head, logits, labels in (
            ("arousal", a_logits, a_labels),
            ("valence", v_logits, v_labels),
        ):
            probs = jax.nn.softmax(jnp.asarray(logits), axis=1)
            preds = np.argmax(logits, axis=1)
            loss = float(
                masked_cross_entropy(
                    jnp.asarray(logits), jnp.asarray(labels),
                    jnp.ones(len(labels), jnp.float32),
                )
            )
            results[head] = {
                "loss": loss,
                "accuracy": float((preds == labels).mean()),
                "predictions": preds,
                "labels": labels,
                "probabilities": np.asarray(probs),
            }

        if verbose:
            self._print_metrics(results)
            for head in ("arousal", "valence"):
                self._plot_confusion_matrix(
                    results[head]["labels"],
                    results[head]["predictions"],
                    f"{plot_dir}/confusion_{head}.png",
                )
        return results

    # ------------------------------------------------------------------
    @staticmethod
    def _print_metrics(results: dict) -> None:
        from sklearn.metrics import classification_report

        print("=" * 40)
        for head, r in results.items():
            print(f"[{head}] loss {r['loss']:.4f} accuracy {r['accuracy']:.2%}")
            names = [f"Class {i}" for i in range(len(np.unique(r["labels"])))]
            print(
                classification_report(
                    r["labels"], r["predictions"], target_names=names,
                    zero_division=0,
                )
            )
        print("=" * 40)

    @staticmethod
    def _plot_confusion_matrix(labels, preds, save_path: str) -> str:
        from sklearn.metrics import confusion_matrix

        from .reporting import plot_confusion_matrix

        cm = confusion_matrix(labels, preds)
        return plot_confusion_matrix(cm, save_path)

    # ------------------------------------------------------------------
    def predict_single(self, data_dict: dict[str, np.ndarray]) -> dict:
        """One-sample prediction (reference Tester.py:112-127), dual-head."""
        assert self.variables is not None
        eeg = jnp.asarray(data_dict["eeg"])[None]
        eye = jnp.asarray(data_dict["eye"])[None]
        pps = jnp.asarray(data_dict["pps"])[None]
        a_logits, v_logits = self._predict(self.variables, eeg, eye, pps)
        return {
            "arousal": {
                "prediction": int(jnp.argmax(a_logits, axis=1)[0]),
                "probabilities": np.asarray(jax.nn.softmax(a_logits, axis=1)[0]),
            },
            "valence": {
                "prediction": int(jnp.argmax(v_logits, axis=1)[0]),
                "probabilities": np.asarray(jax.nn.softmax(v_logits, axis=1)[0]),
            },
        }

    def run(self, model_path: str | None = None, **kwargs) -> dict:
        if model_path is not None:
            self.load_model(model_path)
        return self.evaluate(**kwargs)
