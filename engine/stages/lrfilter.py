"""Trained logistic-regression quality filter (from scratch, deterministic).

The third model in the engine's quality stack — after the char-n-gram NB
language identifier (langid.py) and the n-gram LM perplexity scorer
(perplexity.py) comes a TRAINED filter: the CCNet / fastText-classifier
style of quality model. The reference hand-sets its quality thresholds
(reference: src/checker/range_checker.py:122-173, checks/check_range.sql);
this stage LEARNS the keep/drop decision boundary from labeled examples
instead, stacking the upstream models' scores (lang agreement, perplexity)
with the byte-level metrics as features.

Physical plan — the production shape for classifier-based filtering:

- **feature extraction streams** over the corpus (ScoreStage kernels: one
  byte-view pass per block, langid/LM models object-store-cached per
  worker); the emitted feature table is ~90 bytes/row — a ~10,000x
  reduction of the corpus, cheap to materialize as a Dataset;
- **training data is a bounded deterministic hash-sample** (<= sample_cap
  rows ever reach the driver — classifier training sets are always
  bounded; at 100 TB it is the sample, not the corpus, that fits a
  trainer). The sample is chosen by smallest (splitmix64(row_id), row_id),
  so it is identical at any parallelism and any corpus partitioning;
- **full-batch gradient descent runs driver-local in float64** over the
  canonically-sorted sample: a single deterministic process, no
  cross-worker float accumulation, hence parallelism-invariant weights.
  (Distributed iterative fitting is demonstrated elsewhere in this repo by
  k-means, clustering.py; a <=65k-row dense GD does not earn a cluster.)
- **scoring streams**: the tiny (w, mean, std) model is captured by value
  in the map closure (one object-store copy), each block emits
  |violation_classes| x 3 integer confusion partials, merged driver-side
  in Python ints.

Everything reported is integer-exact or a single order-free float
expression, so the output table is bit-identical across parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..corpus import DROP_CLASSES

#: Feature names, in column order. All features are int64, pre-quantized
#: at the indicated scale so the feature table is exact (no floats cross
#: block boundaries).
FEATURES = (
    "log_chars_x1000",    # log2(n_chars+1) * 1000 — catches empty/too-short/too-long
    "alpha_x1000",        # alpha_ratio * 1000 — catches symbol soup
    "log_maxline_x1000",  # log2(max_line_len+1) * 1000 — catches minified lines
    "log_lines_x1000",    # log2(n_lines+1) * 1000 — structure proxy
    "lang_missing",       # 1000 if claimed lang is NULL
    "lang_agree",         # 1000 if langid prediction == claimed lang
    "lang_conf_x1000",    # langid confidence * 1000
    "log_ppl_x1000",      # log2(min(ppl,1e6)+1) * 1000 — catches gibberish
)


def features_from_scored(t: pa.Table) -> np.ndarray:
    """ScoreStage-augmented batch -> (n, len(FEATURES)) int64 matrix.

    Input needs columns n_chars, alpha_ratio, max_line_len, n_lines,
    lang, lang_pred, lang_conf, ppl (all appended by ScoreStage).
    Vectorized; every value a pure function of the row.
    """
    n_chars = t["n_chars"].to_numpy().astype(np.float64)
    alpha = t["alpha_ratio"].to_numpy()
    max_line = t["max_line_len"].to_numpy().astype(np.float64)
    n_lines = t["n_lines"].to_numpy().astype(np.float64)
    lang = t["lang"]
    if isinstance(lang, pa.ChunkedArray):
        lang = lang.combine_chunks()
    missing = pc.is_null(lang).to_numpy(zero_copy_only=False)
    agree = pc.equal(pc.fill_null(lang, "\x00"), t["lang_pred"]).to_numpy(
        zero_copy_only=False)
    conf = t["lang_conf"].to_numpy()
    ppl = np.minimum(t["ppl"].to_numpy(), 1e6)

    cols = [
        np.rint(1000.0 * np.log2(n_chars + 1.0)),
        np.rint(1000.0 * alpha),
        np.rint(1000.0 * np.log2(max_line + 1.0)),
        np.rint(1000.0 * np.log2(n_lines + 1.0)),
        np.where(missing, 1000.0, 0.0),
        np.where(agree, 1000.0, 0.0),
        np.rint(1000.0 * conf),
        np.rint(1000.0 * np.log2(ppl + 1.0)),
    ]
    return np.stack(cols, axis=1).astype(np.int64)


def drop_labels(cls_col) -> np.ndarray:
    """violation_class column -> int8 labels (1 = golden verdict is drop).

    The ``duplicate`` class is NOT label-decidable from content (the kept
    representative has byte-identical text to its dropped copies) — callers
    exclude it from both training and evaluation.
    """
    if isinstance(cls_col, pa.ChunkedArray):
        cls_col = cls_col.combine_chunks()
    mask = pc.is_in(cls_col, value_set=pa.array(sorted(DROP_CLASSES)))
    return mask.to_numpy(zero_copy_only=False).astype(np.int8)


def _sigmoid(z: np.ndarray) -> np.ndarray:
    """Numerically stable logistic."""
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def train_logreg(
    X: np.ndarray,
    y: np.ndarray,
    *,
    iters: int = 300,
    lr: float = 1.0,
    l2: float = 1e-4,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[float]]:
    """Full-batch GD logistic regression on an int64 feature matrix.

    Returns (w, mean, std, losses): w has len(FEATURES)+1 entries (bias
    last); mean/std are the standardization constants (std floored at 1 so
    constant features stay harmless). Deterministic for a fixed (X, y) —
    callers sort the sample canonically (by row_id) before calling.
    """
    n, d = X.shape
    Xf = X.astype(np.float64)
    mean = Xf.mean(axis=0)
    std = np.maximum(Xf.std(axis=0), 1.0)
    Z = np.concatenate([(Xf - mean) / std, np.ones((n, 1))], axis=1)
    yf = y.astype(np.float64)
    w = np.zeros(d + 1)
    losses: list[float] = []
    for _ in range(iters):
        p = _sigmoid(Z @ w)
        eps = 1e-12
        losses.append(float(
            -(yf * np.log(p + eps) + (1.0 - yf) * np.log(1.0 - p + eps)).mean()
            + 0.5 * l2 * float(w[:-1] @ w[:-1])))
        grad = Z.T @ (p - yf) / n
        grad[:-1] += l2 * w[:-1]
        w = w - lr * grad
    return w, mean, std, losses


def predict_drop(feats: np.ndarray, w: np.ndarray, mean: np.ndarray,
                 std: np.ndarray) -> np.ndarray:
    """int64 feature matrix -> bool drop mask (p >= 0.5 <=> z @ w >= 0).

    The decision is a sign test on one dot product per row — no float
    threshold comparison ambiguity beyond IEEE determinism, which holds
    because (w, mean, std) are fixed broadcast constants and each row's
    product is evaluated independently of batching.
    """
    Zrow = (feats.astype(np.float64) - mean) / std
    return (Zrow @ w[:-1] + w[-1]) >= 0.0


def drop_prob_bins(feats: np.ndarray, w: np.ndarray, mean: np.ndarray,
                   std: np.ndarray, n_bins: int = 10) -> np.ndarray:
    """Predicted drop-probability decile per row (int8 0..n_bins-1) —
    feeds the calibration (reliability) profile. Deterministic for the
    same reason as predict_drop: (w, mean, std) are fixed constants and
    each row's sigmoid is evaluated independently of batching; the bin
    edge test is one float comparison on that per-row value."""
    Zrow = (feats.astype(np.float64) - mean) / std
    p = _sigmoid(Zrow @ w[:-1] + w[-1])
    return np.minimum((p * n_bins).astype(np.int64),
                      n_bins - 1).astype(np.int8)
