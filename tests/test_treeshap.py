"""Exact TreeSHAP for pyspark.ml GBT (operators/treeshap.py).

The strongest available check without the shap package: TreeSHAP is
BY DEFINITION the Shapley value of the tree-path-dependent
conditional expectation (cover-weighted branch averaging), so a
brute-force enumeration of all feature subsets over the same
expectation function must agree exactly. Plus the two structural
axioms: local accuracy (sum phi + base == margin) and Spark parity
(probability == sigmoid(2 * margin) on the serialized trees).
"""

from __future__ import annotations

from itertools import combinations
from math import factorial

import numpy as np
import pytest
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.treeshap import (
    explain_predictions_treeshap,
    extract_gbt_trees,
    gbt_margin,
    shap_values,
)

FEATS = ["f1", "f2", "f3", "f4", "f5"]


@pytest.fixture(scope="module")
def fitted(spark):
    from genetics_spark_coloc_spark.operators.l2g import train_l2g_model

    rows = []
    for i in range(400):
        f = [
            ((i * 7) % 19) / 19.0,
            ((i * 11 + 3) % 23) / 23.0,
            ((i * 5) % 17) / 17.0,
            ((i * 3) % 29) / 29.0,
            ((i * 13) % 31) / 31.0,
        ]
        label = 1.0 if (f[0] + 0.5 * f[2] > 0.8) != (f[3] > 0.6) else 0.0
        rows.append((f"L{i}", f"G{i}", *f, label))
    df = spark.createDataFrame(
        rows, ["studyLocusId", "geneId", *FEATS, "goldStandardSet"]
    )
    model = train_l2g_model(df, feature_names=FEATS, max_iter=8)
    X = np.array([r[2:7] for r in rows[:30]], dtype=float)
    return model, df, X


def _expvalue(tree, x, S):
    left, right = tree["children_left"], tree["children_right"]
    feat, thr = tree["feature"], tree["threshold"]
    val, cov = tree["value"], tree["cover"]

    def rec(j):
        if left[j] < 0:
            return val[j]
        d = feat[j]
        if d in S:
            return rec(left[j] if x[d] <= thr[j] else right[j])
        return (cov[left[j]] * rec(left[j]) + cov[right[j]] * rec(right[j])) / cov[j]

    return rec(0)


def _brute_shap(tree, x, m):
    phi = np.zeros(m + 1)
    for j in range(m):
        rest = [k for k in range(m) if k != j]
        for r in range(len(rest) + 1):
            for S in combinations(rest, r):
                w = factorial(len(S)) * factorial(m - len(S) - 1) / factorial(m)
                phi[j] += w * (
                    _expvalue(tree, x, set(S) | {j}) - _expvalue(tree, x, set(S))
                )
    phi[m] = _expvalue(tree, x, set())
    return phi


class TestTreeShapExact:
    def test_margin_reconstruction_matches_spark_probability(self, fitted):
        """Serialized trees reproduce Spark's transform exactly:
        probability == 1 / (1 + e^(-2 * margin))."""
        from pyspark.ml.functions import vector_to_array

        model, df, X = fitted
        trees, w = extract_gbt_trees(model, len(FEATS))
        marg = gbt_margin(trees, w, X)
        probs = (
            model.transform(df.limit(30))
            .select(vector_to_array(F.col("probability"))[1].alias("p"))
            .toPandas()["p"]
            .to_numpy()
        )
        assert np.abs(probs - 1.0 / (1.0 + np.exp(-2.0 * marg))).max() < 1e-12

    def test_local_accuracy(self, fitted):
        model, _, X = fitted
        trees, w = extract_gbt_trees(model, len(FEATS))
        phi = shap_values(trees, w, X)
        marg = gbt_margin(trees, w, X)
        assert np.abs(phi.sum(axis=1) - marg).max() < 1e-10

    def test_matches_bruteforce_shapley(self, fitted):
        """Per-tree recursion equals the 2^M subset enumeration of
        the cover-based conditional expectation — the defining
        property of TreeSHAP (reference parity target:
        l2g_prediction.py's shap TreeExplainer computes exactly
        this)."""
        model, _, X = fitted
        trees, w = extract_gbt_trees(model, len(FEATS))
        phi = shap_values(trees, w, X[:5])
        for i in range(5):
            expected = np.zeros(len(FEATS) + 1)
            for t, wt in zip(trees, w):
                expected += wt * _brute_shap(t, X[i], len(FEATS))
            assert np.abs(expected - phi[i]).max() < 1e-10

    def test_distributed_operator(self, fitted):
        """mapInPandas end-to-end: one row per input, local accuracy
        on every row, feature order preserved, nulls imputed to 0."""
        model, df, X = fitted
        out_df = explain_predictions_treeshap(
            model, df.limit(25).withColumn("f2", F.lit(None).cast("double")), FEATS
        )
        out = out_df.toPandas()
        assert len(out) == 25
        for _, r in out.iterrows():
            total = r["shapBaseValue"] + sum(s["shapValue"] for s in r["features"])
            assert abs(total - r["margin"]) < 1e-10
            assert [s["name"] for s in r["features"]] == FEATS
            f2 = next(s for s in r["features"] if s["name"] == "f2")
            assert f2["value"] == 0.0

    def test_single_pass_plan(self, fitted):
        """The explainer is ONE ArrowEvalPython-free mapInPandas pass
        over the matrix — no N+1 transform joins like the occlusion
        fallback."""
        model, df, _ = fitted
        plan = explain_predictions_treeshap(model, df, FEATS)._jdf.queryExecution(
        ).executedPlan().toString()
        assert plan.count("MapInPandas") == 1
        assert "Join" not in plan

    def test_l2g_predictions_entity_with_shap(self, fitted):
        """Entity-shaped output validates against the registered
        l2g_predictions schema and scores equal model.transform."""
        from pyspark.ml.functions import vector_to_array

        from genetics_spark_coloc_spark.core.schema_registry import get_schema
        from genetics_spark_coloc_spark.operators.treeshap import (
            l2g_predictions_with_shap,
        )

        model, df, _ = fitted
        out_df = l2g_predictions_with_shap(model, df.limit(20), FEATS)
        entity = get_schema("l2g_predictions")
        assert [f.name for f in out_df.schema.fields] == [
            f.name for f in entity.fields
        ]
        out = out_df.toPandas().set_index("studyLocusId")
        ref = (
            model.transform(df.limit(20))
            .select(
                "studyLocusId",
                vector_to_array(F.col("probability"))[1].alias("p"),
            )
            .toPandas()
            .set_index("studyLocusId")
        )
        joined = out.join(ref)
        assert (joined["score"] - joined["p"]).abs().max() < 1e-12
        row = out.iloc[0]
        assert len(row["features"]) == len(FEATS)
        assert row["shapBaseValue"] is not None

    def test_pattern_dedupe_equals_per_row_recursion(self, fitted):
        """The decision-pattern dedupe in shap_values must be a pure
        optimization: identical phi to running the recursion per row,
        including on batches with duplicated rows."""
        from genetics_spark_coloc_spark.operators.treeshap import (
            _tree_shap_single,
        )

        model, _, X = fitted
        trees, w = extract_gbt_trees(model, len(FEATS))
        Xdup = np.vstack([X, X[:3], X[:1]])  # force repeated patterns
        fast = shap_values(trees, w, Xdup)
        slow = np.zeros_like(fast)
        for t, wt in zip(trees, w):
            for i in range(len(Xdup)):
                phi = np.zeros(len(FEATS) + 1)
                _tree_shap_single(t, Xdup[i], phi)
                slow[i] += wt * phi
        assert np.abs(fast - slow).max() < 1e-12
