"""Classification metrics and score utilities.

Behavioral parity targets: /root/reference/ops/metrics.py and the duplicate
softmax in /root/reference/ops/utils.py:37-39.
"""

from __future__ import annotations

import numpy as np


def softmax(raw_score: np.ndarray, T: float = 1.0) -> np.ndarray:
    """Numerically-stable softmax over the last axis with temperature ``T``."""
    raw_score = np.asarray(raw_score)
    exp_s = np.exp((raw_score - raw_score.max(axis=-1)[..., None]) * T)
    return exp_s / exp_s.sum(axis=-1)[..., None]


def top_k_hit(label_set, scores: np.ndarray, k: int = 3):
    """Whether any ground-truth label is in the top-k predictions."""
    idx = np.argsort(scores)[-k:]
    return len(label_set.intersection(idx)) > 0, 1


def top_k_accuracy(score_dict, video_list, k: int) -> float:
    """Video-level top-k accuracy over a DB video list."""
    video_labels = [set(i.num_label for i in v.instances) for v in video_list]
    hits = np.array([top_k_hit(lb, score_dict[v.id], k=k)
                     for v, lb in zip(video_list, video_labels) if v.id in score_dict])
    totals = hits.sum(axis=0).astype(float)
    return totals[0] / totals[1]


def video_mean_ap(score_dict, video_list) -> float:
    """Macro-averaged AP of video-level multi-label classification."""
    from sklearn.metrics import average_precision_score

    avail_labels = [set(i.num_label for i in v.instances)
                    for v in video_list if v.id in score_dict]
    pred = np.array([score_dict[v.id] for v in video_list if v.id in score_dict])
    gt = np.zeros(pred.shape)
    for i in range(pred.shape[0]):
        gt[i, list(avail_labels[i])] = 1
    return average_precision_score(gt, pred, average="macro")


def mean_class_accuracy(scores: np.ndarray, labels: np.ndarray) -> float:
    """Mean of per-class accuracies (balanced accuracy)."""
    from sklearn.metrics import confusion_matrix

    pred = np.argmax(scores, axis=1)
    cf = confusion_matrix(labels, pred).astype(float)
    return float(np.mean(np.diag(cf) / cf.sum(axis=1)))


def top_k_acc(lb_set, scores: np.ndarray, k: int = 3):
    """(hits, total) of ground-truth labels found in the top-k predictions."""
    idx = np.argsort(scores)[-k:]
    return len(lb_set.intersection(idx)), len(lb_set)
