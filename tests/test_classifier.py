"""In-engine logistic quality classifier: the distributed GD must equal an
independent numpy implementation of the same full-batch recurrence (the
oracle-parity suite separately proves Spark == DuckDB on the registered
queries; this pins both to ground truth)."""

from __future__ import annotations

import numpy as np
import pytest

from vectordb_from_scratch_spark.operators.classifier import (
    GD_ETA,
    GD_ITERS,
    doc_features,
    score_documents,
    train_weights,
)
from vectordb_from_scratch_spark.session import load_table


@pytest.fixture(scope="module")
def feat(spark, sf_small):
    return doc_features(load_table(spark, sf_small, "documents"))


def _numpy_gd(X, y, iters=GD_ITERS, eta=GD_ETA):
    w = np.zeros(X.shape[1])
    for _ in range(iters):
        s = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - eta * ((s - y)[:, None] * X).mean(axis=0)
    return w


def test_train_matches_numpy_reference(spark, feat):
    pdf = feat.toPandas().sort_values("doc_id")
    X = pdf[["b", "f1", "f2", "f3", "f4"]].to_numpy()
    y = pdf["y"].to_numpy()
    want = _numpy_gd(X, y)
    got = train_weights(feat).collect()[0]
    np.testing.assert_allclose(
        [got["wb"], got["w1"], got["w2"], got["w3"], got["w4"]],
        want,
        rtol=1e-9,
    )


def test_scores_match_numpy_and_separate_classes(spark, sf_small, feat):
    pdf = feat.toPandas().sort_values("doc_id").reset_index(drop=True)
    X = pdf[["b", "f1", "f2", "f3", "f4"]].to_numpy()
    y = pdf["y"].to_numpy()
    w = _numpy_gd(X, y)
    want = 1.0 / (1.0 + np.exp(-(X @ w)))
    got = (
        score_documents(load_table(spark, sf_small, "documents"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(got["score"].to_numpy(), want, atol=1e-6)
    # the model must have learned SOMETHING separable: mean score of the
    # positive class strictly above the negative class
    assert got.loc[got.y == 1, "score"].mean() > got.loc[got.y == 0, "score"].mean()


def test_single_declarative_plan_no_collect(spark, feat):
    """The T-iteration train is one plan: T feature scans glued by
    broadcast exchanges, no CartesianProduct, no Python UDFs."""
    from vectordb_from_scratch_spark import plans

    p = plans.physical_plan(train_weights(feat))
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p
    # one 1-row broadcast glue join per post-step-1 iteration (formatted
    # mode lists each node twice -> 2 counted per real join)
    assert p.count("BroadcastNestedLoopJoin") == 2 * (GD_ITERS - 1)
