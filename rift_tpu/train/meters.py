"""Meter protocol: stateful metric accumulators with `update`/`compute`.

Parity with the reference Meter protocol (SURVEY.md §5: any object with
update(outputs, targets)/compute() registered per split):
- `MeterClassification` — accuracy (ref: datasets/modelnet40.py:105-118);
- `MeterRegistration` — succ/rre/rte/rmse/reg_time/rmse_succ
  (ref: deepgmr_mn40.py:101-164);
- `MeterShapeNetIoU` — per-shape mean IoU (ref: datasets/shapenet.py:159-202).
"""
from __future__ import annotations

import numpy as np


class MeterClassification:
    def __init__(self):
        self.correct = 0
        self.total = 0

    def update(self, logits: np.ndarray, labels: np.ndarray) -> None:
        pred = np.argmax(np.asarray(logits), axis=-1)
        self.correct += int((pred == np.asarray(labels)).sum())
        self.total += len(labels)

    def compute(self) -> float:
        return self.correct / max(self.total, 1)


class MeterRegistration:
    """Accumulates per-pair metric dicts (from registration.metrics.pair_errors)
    plus wall-clock solver time."""

    def __init__(self):
        self.sums = {"rre": 0.0, "rte": 0.0, "rmse": 0.0, "succ": 0.0,
                     "rmse_succ": 0.0, "reg_time": 0.0}
        self.num = 0

    def update(self, errors: dict, reg_time: float = 0.0) -> None:
        batch = np.asarray(errors["rre"]).shape[0] if np.ndim(errors["rre"]) else 1
        for key in ("rre", "rte", "rmse", "succ", "rmse_succ"):
            self.sums[key] += float(np.sum(np.asarray(errors[key])))
        self.sums["reg_time"] += reg_time
        self.num += batch

    def compute(self) -> dict:
        n = max(self.num, 1)
        return {k: v / n for k, v in self.sums.items()}


class MeterRPMNet:
    """RPM-Net metric family accumulator (ref: mn40_hdf.py:274-478 meter):
    r_mse/r_mae/t_mse/t_mae are root-mean/mean of squared/absolute
    components, err_r_deg/err_t/chamfer are plain means."""

    KEYS = ("r_mse", "r_mae", "t_mse", "t_mae", "err_r_deg", "err_t", "chamfer")

    def __init__(self):
        self.sums = {k: 0.0 for k in self.KEYS}
        self.num = 0

    def update(self, metrics: dict) -> None:
        first = np.asarray(metrics["err_r_deg"])
        batch = first.shape[0] if first.ndim else 1
        for key in self.KEYS:
            self.sums[key] += float(np.sum(np.asarray(metrics[key])))
        self.num += batch

    def compute(self) -> dict:
        n = max(self.num, 1)
        out = {k: v / n for k, v in self.sums.items()}
        out["r_mse"] = float(np.sqrt(out["r_mse"]))  # reported as RMSE
        out["t_mse"] = float(np.sqrt(out["t_mse"]))
        return out


class MeterReflection:
    """Accuracy of the 4-way PCA-reflection head
    (ref: modelnet40_4class.py MeterModelNet40: reflect_acc)."""

    def __init__(self):
        self.correct = 0
        self.num = 0

    def update(self, logits: np.ndarray, labels) -> None:
        # labels may be the (class, reflection) tuple batch [b, 2]
        labels = np.asarray(labels)
        if labels.ndim == 2:
            labels = labels[:, 1]
        pred = np.argmax(np.asarray(logits), axis=-1)
        self.correct += int((pred == labels).sum())
        self.num += len(labels)

    def compute(self) -> dict:
        return {"reflect_acc": self.correct / max(self.num, 1)}


class MeterShapeNetIoU:
    """Mean IoU over parts, averaged per shape then over shapes
    (ref: shapenet.py:177-199 semantics: IoU of each part present in the
    union of gt/pred, averaged per instance)."""

    def __init__(self, num_classes: int = 50):
        self.num_classes = num_classes
        self.iou_sum = 0.0
        self.num = 0

    def update(self, logits: np.ndarray, labels: np.ndarray) -> None:
        pred = np.argmax(np.asarray(logits), axis=-1)  # [b, n]
        labels = np.asarray(labels)
        for i in range(pred.shape[0]):
            parts = np.union1d(np.unique(pred[i]), np.unique(labels[i]))
            ious = []
            for part in parts:
                inter = np.sum((pred[i] == part) & (labels[i] == part))
                union = np.sum((pred[i] == part) | (labels[i] == part))
                ious.append(inter / union if union else 1.0)
            self.iou_sum += float(np.mean(ious))
            self.num += 1

    def compute(self) -> float:
        return self.iou_sum / max(self.num, 1)
