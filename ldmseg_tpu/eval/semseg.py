"""Streaming mIoU meter (reference: ldmseg/evaluations/semseg_evaluation.py).

TPU re-design: per-batch TP/FP/FN are computed on device in one vectorized
pass over all classes (the reference loops classes in python); the
distributed all_reduce disappears because update() runs on globally-batched
arrays inside jit when desired.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def confusion_counts(
    pred: jnp.ndarray, gt: jnp.ndarray, num_classes: int, ignore_index: int = 0
) -> jnp.ndarray:
    """Returns [3, num_classes] int32 (tp, fp, fn); jittable."""
    valid = gt != ignore_index
    classes = jnp.arange(num_classes)
    p = pred.reshape(-1)[None, :] == classes[:, None]
    g = gt.reshape(-1)[None, :] == classes[:, None]
    v = valid.reshape(-1)[None, :]
    tp = jnp.sum(p & g & v, axis=1)
    fp = jnp.sum(p & ~g & v, axis=1)
    fn = jnp.sum(~p & g & v, axis=1)
    return jnp.stack([tp, fp, fn])


class SemsegMeter:
    def __init__(
        self,
        num_classes: int,
        class_names: Optional[List[str]] = None,
        has_bg: bool = False,
        ignore_index: int = 0,
    ):
        self.num_classes = num_classes + int(has_bg)
        self.class_names = class_names
        self.ignore_index = ignore_index
        self._fn = jax.jit(
            confusion_counts, static_argnames=("num_classes", "ignore_index")
        )
        self.reset()

    def reset(self):
        self.counts = np.zeros((3, self.num_classes), dtype=np.int64)

    def update(self, pred, gt):
        out = self._fn(
            jnp.asarray(pred), jnp.asarray(gt),
            num_classes=self.num_classes, ignore_index=self.ignore_index,
        )
        self.counts += np.asarray(out, dtype=np.int64)

    def synchronize_between_processes(self):
        import jax as _jax

        if _jax.process_count() > 1:  # pragma: no cover - multihost only
            from jax.experimental import multihost_utils

            total = multihost_utils.process_allgather(self.counts)
            self.counts = np.sum(total, axis=0)

    def return_score(self, verbose: bool = False, name: str = "dataset"):
        tp, fp, fn = self.counts
        jac = tp / np.maximum(tp + fp + fn, 1e-8)
        result = {"jaccards_all_categs": jac.tolist(), "mIoU": float(jac.mean())}
        print(f"Semantic segmentation eval - {name}: mIoU {100 * result['mIoU']:.2f}")
        if verbose and self.class_names:
            for i, n in enumerate(self.class_names[: self.num_classes]):
                print(f"  IoU {n}: {100 * jac[i]:.2f}")
        return result
