"""Distributed full-batch logistic regression — model-based quality/language
filtering for corpus curation (the learned complement of the heuristic
textstats filters; cf. the fastText-style quality classifiers used by CCNet
(Wenzek et al. 2020) and GPT-3-style pretraining filters).

Training shape per round (fixed rounds, synchronous full-batch GD on mean
log-loss): the weight vector broadcasts via closure, features stream through
ONE map_batches computing per-block gradient partial sums; each per-row
contribution (sigmoid(w·x) − y)·x_j is quantized to 2^20 fixed point with
floor(c·2^20 + 0.5) BEFORE summation — the partial sums are exact int64, so
learned weights are BIT-identical across any block structure (the
``stages/transe.py`` partition-invariance scheme) and an unrolled SQL
mirror reproduces training bit-for-bit (floor(x+0.5) has identical
semantics in numpy and DuckDB, unlike rint/round which disagree on ties).
The driver folds only (n_features+1)-sized int64 partials per round.

Bit-parity discipline: every float expression is evaluated ELEMENTWISE in
a fixed left-to-right order (z = w0 + w1·x1 + w2·x2, contrib = err·x_j·2^20
+ 0.5) — no BLAS dot, whose accumulation order/FMA differs from SQL's
expression evaluation.  The one remaining libm surface is exp() (numpy vs
DuckDB may differ in the last ulp); the 2^20 quantization slack makes a
boundary flip from a 1-ulp input difference vanishingly rare.

Scoring: one vectorized pass attaching sigmoid(w·x).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FIXED_POINT = 1 << 20


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # the SQL mirror's exact formulation: 1/(1+exp(-z))
    return 1.0 / (1.0 + np.exp(-z))


def _z(t: pa.Table, w: np.ndarray, feature_cols: list[str]) -> np.ndarray:
    """w0 + w1·x1 + ... strictly left to right — the SQL expression order."""
    z = np.full(t.num_rows, w[0])
    for j, c in enumerate(feature_cols):
        z = z + w[j + 1] * np.asarray(t.column(c), dtype=np.float64)
    return z


def train_logreg(features_ds, *, feature_cols: list[str], label_col: str,
                 rounds: int = 4, lr: float = 1.0) -> np.ndarray:
    """Fixed-round full-batch GD; returns float64 weights
    [bias, *feature_cols].  ``features_ds`` columns must be float64
    (label in {0.0, 1.0}).  Deterministic and partition-invariant by the
    fixed-point construction above."""
    k = len(feature_cols)
    n = features_ds.count()
    if n == 0:
        return np.zeros(k + 1)
    w = np.zeros(k + 1)

    def grad_partial(t: pa.Table, _w: np.ndarray) -> pa.Table:
        err = _sigmoid(_z(t, _w, feature_cols)) \
            - np.asarray(t.column(label_col), dtype=np.float64)
        sums = np.empty(k + 1, dtype=np.int64)
        sums[0] = np.floor(err * float(FIXED_POINT) + 0.5) \
            .astype(np.int64).sum()
        for j, c in enumerate(feature_cols):
            xj = np.asarray(t.column(c), dtype=np.float64)
            sums[j + 1] = np.floor(err * xj * float(FIXED_POINT) + 0.5) \
                .astype(np.int64).sum()
        return pa.Table.from_arrays(
            [pa.array(np.arange(k + 1, dtype=np.int64)),
             pa.array(sums, pa.int64())],
            names=["j", "g"])

    for _ in range(rounds):
        g = np.zeros(k + 1, dtype=np.int64)
        for row in features_ds.map_batches(
                lambda t, _w=w.copy(): grad_partial(t, _w),
                batch_format="pyarrow").take_all():
            g[row["j"]] += row["g"]
        w = w - lr * (g.astype(np.float64) / FIXED_POINT) / n
    return w


def score_logreg(features_ds, w: np.ndarray, *,
                 feature_cols: list[str], id_col: str,
                 round_digits: int = 6):
    """Attach score = sigmoid(w·x) (rounded) and pred = rounded score >=
    0.5; one vectorized pass, weights captured by closure."""
    from ..functions.fputil import np_round_away

    def score(t: pa.Table) -> pa.Table:
        s = np_round_away(_sigmoid(_z(t, w, feature_cols)), round_digits)
        return pa.Table.from_arrays(
            [t.column(id_col), pa.array(s, pa.float64()),
             pa.array(s >= 0.5)],
            names=[id_col, "score", "pred"])

    return features_ds.map_batches(score, batch_format="pyarrow")


def roc_auc(scored_ds, *, score_col: str, label_col: str,
            round_digits: int = 6):
    """Exact ROC AUC (Mann-Whitney U with average-rank tie handling) —
    the model-evaluation companion of :func:`train_logreg`: the
    probability a random positive outscores a random negative, ties at
    half credit.

    Scale shape: NO global sort of the data.  Per-block pre-combine to
    (score -> n_pos, n) partials, then ONE auto_hash_aggregate on the
    score key — whose cardinality is bounded by the scorer's rounding
    (round_digits=6 on [0,1] gives <= 1e6+1 distinct keys REGARDLESS of
    corpus size), so the folded aggregate is a bounded table the driver
    finishes with a vectorized cumsum.

    Bit-parity discipline: the grouped formulation
    AUC = sum_s pos_s * (2*neg_below_s + neg_s) / (2 * n_pos * n_neg)
    keeps the numerator in EXACT int64 arithmetic (order-independent,
    hence partition-invariant and identical to the DuckDB mirror's
    HUGEINT sum); only the final single division is float.  int64 bound:
    numerator <= n_pos*2*n_neg <= n^2/2 — exact up to ~4e9 rows.

    Returns a one-row Dataset {auc, n_pos, n_neg}; auc is NULL when a
    class is absent."""
    from .groupagg import auto_hash_aggregate
    from ..functions.fputil import np_round_away

    def partials(t: pa.Table) -> pa.Table:
        y = np.asarray(t.column(label_col), dtype=np.float64)
        return pa.Table.from_arrays(
            [t.column(score_col),
             pa.array((y >= 0.5).astype(np.int64), pa.int64()),
             pa.array(np.ones(t.num_rows, dtype=np.int64), pa.int64())],
            names=[score_col, "pos", "n"])

    grouped = auto_hash_aggregate(
        scored_ds.map_batches(partials, batch_format="pyarrow"),
        [score_col], [("pos", "sum"), ("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        s = t.column(score_col).to_numpy(zero_copy_only=False)
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(s, kind="stable")
        pos, neg = pos[order], (n - pos)[order]
        n_pos, n_neg = int(pos.sum()), int(neg.sum())
        if n_pos == 0 or n_neg == 0:
            auc = None
        else:
            neg_below = np.concatenate(([0], np.cumsum(neg)[:-1]))
            num = int(np.sum(pos * (2 * neg_below + neg)))
            auc = float(np_round_away(
                np.array([num / (2.0 * n_pos * n_neg)]), round_digits)[0])
        return pa.Table.from_arrays(
            [pa.array([auc], pa.float64()),
             pa.array([n_pos], pa.int64()), pa.array([n_neg], pa.int64())],
            names=["auc", "n_pos", "n_neg"])

    # the grouped table is bounded by score cardinality (<= 1e6+1), not
    # data size — one node finishes it
    return grouped.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)
