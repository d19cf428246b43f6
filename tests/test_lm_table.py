"""Stupid-Backoff n-gram LM family (r14 additive layer): the
``ngram_lm_table`` / ``lm_stupid_backoff_score`` operators and the
``lm_table`` / ``lm_score`` steps — the CCNet perplexity-filter loop
(train a model ONCE on a reference corpus, score every crawl against
the frozen artifact) expressed as the house at-rest-evidence pattern:
additive count shards, leased crash-safe compaction, doctor fsck
kind.

Ground truth everywhere is a pure-Python Counter replay of the exact
scheme (Brants et al. 2007 raw relative frequencies, alpha backoff,
add-one unigram OOV floor) — the same device as the line_freq
property tests.
"""

from __future__ import annotations

import math
import os
import random
from collections import Counter

import pytest

from genetics_spark_coloc_spark.operators.text import (
    lm_stupid_backoff_score,
    ngram_lm_table,
)
from genetics_spark_coloc_spark.session import (
    WriterLeaseHeld,
    acquire_writer_lease,
    release_writer_lease,
)
from genetics_spark_coloc_spark.steps import run_step


def _py_counts(texts, order=3):
    cnt = Counter()
    for t in texts:
        toks = t.lower().split()
        for n in range(1, order + 1):
            for i in range(len(toks) - n + 1):
                cnt[" ".join(toks[i : i + n])] += 1
    return cnt


def _py_scores(cnt, score_docs, order=3, alpha=0.4):
    unis = [g for g in cnt if " " not in g]
    n_tot = sum(cnt[g] for g in unis)
    v = len(unis)

    def s1(w):
        return (cnt.get(w, 0) + 1.0) / (n_tot + v)

    def s2(a, w):
        if cnt.get(f"{a} {w}", 0) > 0 and cnt.get(a, 0) > 0:
            return cnt[f"{a} {w}"] / cnt[a]
        return alpha * s1(w)

    def s3(u, a, w):
        if cnt.get(f"{u} {a} {w}", 0) > 0 and cnt.get(f"{u} {a}", 0) > 0:
            return cnt[f"{u} {a} {w}"] / cnt[f"{u} {a}"]
        return alpha * s2(a, w)

    out = {}
    for did, t in score_docs:
        toks = t.lower().split()
        if not toks:
            out[did] = (0, None, None)
            continue
        logs = []
        for i, w in enumerate(toks):
            if i == 0 or order == 1:
                s = s1(w)
            elif i == 1 or order == 2:
                s = s2(toks[i - 1], w)
            else:
                s = s3(toks[i - 2], toks[i - 1], w)
            logs.append(math.log(s))
        alp = sum(logs) / len(logs)
        out[did] = (len(toks), round(alp, 6), round(math.exp(-alp), 6))
    return out


def _assert_scores(got_rows, expected):
    got = {
        r["docId"]: (r["nTokens"], r["avgLogScore"], r["pseudoPerplexity"])
        for r in got_rows
    }
    assert set(got) == set(expected)
    for d, e in expected.items():
        g = got[d]
        assert g[0] == e[0], (d, g, e)
        for i in (1, 2):
            if e[i] is None:
                assert g[i] is None, (d, g, e)
            else:
                assert abs(g[i] - e[i]) < 1.5e-6, (d, g, e)


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the hat"),
    (3, "a dog ran"),
    (4, ""),
    (5, "solo"),
    (6, "the the the"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestOperator:
    def test_self_trained_matches_python_replay(self, spark):
        exp = _py_scores(_py_counts([t for _, t in DOCS]), DOCS)
        _assert_scores(lm_stupid_backoff_score(_df(spark, DOCS)).collect(), exp)

    def test_frozen_model_scores_oov_through_unigram_floor(self, spark):
        train = DOCS[:3]
        model = ngram_lm_table(_df(spark, train))
        delta = [(10, "zebra quux the cat"), (11, "the cat sat on the mat")]
        exp = _py_scores(_py_counts([t for _, t in train]), delta)
        _assert_scores(
            lm_stupid_backoff_score(_df(spark, delta), lm=model).collect(), exp
        )
        # the OOV doc must actually be penalized vs the in-model doc
        assert exp[10][1] < exp[11][1]

    def test_empty_model_yields_null_scores_not_an_error(self, spark):
        model = ngram_lm_table(_df(spark, DOCS)).filter("1=0")
        rows = lm_stupid_backoff_score(_df(spark, DOCS[:2]), lm=model).collect()
        assert all(r["avgLogScore"] is None for r in rows)
        assert all(r["nTokens"] > 0 for r in rows)

    def test_order2_matches_python_replay(self, spark):
        exp = _py_scores(
            _py_counts([t for _, t in DOCS], order=2), DOCS, order=2
        )
        _assert_scores(
            lm_stupid_backoff_score(_df(spark, DOCS), order=2).collect(), exp
        )

    def test_additive_shards_reaggregated_before_scoring(self, spark):
        # the model arg may be a multi-shard table with duplicate gram
        # rows — the documented additive contract
        half = ngram_lm_table(_df(spark, DOCS[:3]))
        other = ngram_lm_table(_df(spark, DOCS[3:]))
        sharded = half.unionByName(other)
        whole = ngram_lm_table(_df(spark, DOCS))
        a = lm_stupid_backoff_score(_df(spark, DOCS), lm=sharded).collect()
        b = lm_stupid_backoff_score(_df(spark, DOCS), lm=whole).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_invalid_order_raises(self, spark):
        with pytest.raises(ValueError, match="order"):
            lm_stupid_backoff_score(_df(spark, DOCS), order=4)
        with pytest.raises(ValueError, match="order"):
            ngram_lm_table(_df(spark, DOCS), order=0)

    @pytest.mark.parametrize("seed", [7, 23])
    def test_property_random_corpus_matches_replay(self, spark, seed):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 9))))
            for i in range(40)
        ]
        exp = _py_scores(_py_counts([t for _, t in docs]), docs)
        _assert_scores(lm_stupid_backoff_score(_df(spark, docs)).collect(), exp)


class TestStep:
    def _write(self, spark, rows, tmp_path, name):
        p = str(tmp_path / name)
        _df(spark, rows).write.parquet(p)
        return p

    def _agg(self, spark, path):
        return {
            tuple(r)
            for r in spark.read.parquet(path)
            .groupBy("gram", "n")
            .sum("cnt")
            .collect()
        }

    def test_append_shard_equals_one_shot_build(self, spark, tmp_path):
        c1 = self._write(spark, DOCS[:3], tmp_path, "c1")
        c2 = self._write(spark, DOCS[3:], tmp_path, "c2")
        cu = self._write(spark, DOCS, tmp_path, "cu")
        model = str(tmp_path / "model")
        run_step(spark, "lm_table", {"corpus": c1}, model)
        run_step(
            spark, "lm_table", {"corpus": c2}, model, params={"mode": "append"}
        )
        oneshot = str(tmp_path / "oneshot")
        run_step(spark, "lm_table", {"corpus": cu}, oneshot)
        assert self._agg(spark, model) == self._agg(spark, oneshot)

        # compact: one row per gram, aggregate bit-exact
        run_step(
            spark,
            "lm_table",
            {"corpus": model},
            model,
            params={"mode": "compact"},
        )
        rows = spark.read.parquet(model).collect()
        assert len(rows) == len({r["gram"] for r in rows})
        assert self._agg(spark, model) == self._agg(spark, oneshot)

    def test_frozen_step_scoring_equals_library(self, spark, tmp_path):
        c1 = self._write(spark, DOCS[:3], tmp_path, "c1")
        delta = self._write(spark, DOCS[3:], tmp_path, "delta")
        model = str(tmp_path / "model")
        run_step(spark, "lm_table", {"corpus": c1}, model)
        got = run_step(
            spark,
            "lm_score",
            {"docs": delta},
            str(tmp_path / "scored"),
            params={"model": model},
        ).collect()
        lib = lm_stupid_backoff_score(
            spark.read.parquet(delta), lm=spark.read.parquet(model)
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, lib))
        # and it matches the python replay of the frozen scheme
        exp = _py_scores(_py_counts([t for _, t in DOCS[:3]]), DOCS[3:])
        _assert_scores(got, exp)

    def test_min_count_append_refused_prune_at_compact(self, spark, tmp_path):
        c1 = self._write(spark, DOCS[:3], tmp_path, "c1")
        model = str(tmp_path / "model")
        run_step(spark, "lm_table", {"corpus": c1}, model)
        with pytest.raises(ValueError, match="under-counts"):
            run_step(
                spark,
                "lm_table",
                {"corpus": c1},
                model,
                params={"mode": "append", "min_count": 2},
            )
        run_step(
            spark,
            "lm_table",
            {"corpus": model},
            model,
            params={"mode": "compact", "min_count": 2},
        )
        left = spark.read.parquet(model)
        assert left.filter("cnt < 2").count() == 0
        assert left.count() > 0

    def test_maintenance_is_leased(self, spark, tmp_path):
        c1 = self._write(spark, DOCS[:3], tmp_path, "c1")
        model = str(tmp_path / "model")
        run_step(spark, "lm_table", {"corpus": c1}, model)
        token = acquire_writer_lease(spark, model, "test:holder")
        try:
            for mode in ("append", "compact"):
                with pytest.raises(WriterLeaseHeld, match="test:holder"):
                    run_step(
                        spark,
                        "lm_table",
                        {"corpus": c1 if mode == "append" else model},
                        model,
                        params={"mode": mode},
                    )
        finally:
            release_writer_lease(spark, model, token)
        # released: maintenance proceeds again
        run_step(
            spark, "lm_table", {"corpus": c1}, model, params={"mode": "append"}
        )

    def test_score_consumer_finishes_interrupted_compact(self, spark, tmp_path):
        import shutil

        c1 = self._write(spark, DOCS[:3], tmp_path, "c1")
        delta = self._write(spark, DOCS[3:], tmp_path, "delta")
        model = str(tmp_path / "model")
        run_step(spark, "lm_table", {"corpus": c1}, model)
        before = self._agg(spark, model)
        # plant the committed-tmp-after-delete crash window of the
        # shared overwrite protocol: tmp (with _SUCCESS) exists, the
        # target is gone
        shutil.move(model, model + "__compacting")
        scored = run_step(
            spark,
            "lm_score",
            {"docs": delta},
            str(tmp_path / "scored"),
            params={"model": model},
        ).collect()
        assert not os.path.exists(model + "__compacting")
        assert self._agg(spark, model) == before
        exp = _py_scores(_py_counts([t for _, t in DOCS[:3]]), DOCS[3:])
        _assert_scores(scored, exp)


class TestDoctor:
    def test_healthy_and_poisoned_shard(self, spark, tmp_path):
        c1 = str(tmp_path / "c1")
        _df(spark, DOCS).write.parquet(c1)
        model = str(tmp_path / "model")
        run_step(spark, "lm_table", {"corpus": c1}, model)
        rep = {
            r["check"]: r["status"]
            for r in run_step(
                spark,
                "doctor",
                {"index": model},
                write=False,
                params={"kind": "lm_table"},
            ).collect()
        }
        assert set(rep.values()) == {"ok"}, rep

        # a shard whose bigram continuations outnumber the context's
        # unigram count cannot come from any corpus snapshot — the
        # count-monotonicity invariant fails loudly
        spark.createDataFrame(
            [("zzz qqq", 2, 50)], "gram string, n int, cnt long"
        ).write.mode("append").parquet(model)
        rep2 = {
            r["check"]: r["status"]
            for r in run_step(
                spark,
                "doctor",
                {"index": model},
                write=False,
                params={"kind": "lm_table"},
            ).collect()
        }
        assert rep2["prefix_consistency"] == "failed", rep2
        assert rep2["counts_table"] == "ok"

    def test_order_mismatch_row_fails_counts_check(self, spark, tmp_path):
        c1 = str(tmp_path / "c1")
        _df(spark, DOCS).write.parquet(c1)
        model = str(tmp_path / "model")
        run_step(spark, "lm_table", {"corpus": c1}, model)
        spark.createDataFrame(
            [("one two three", 2, 1)], "gram string, n int, cnt long"
        ).write.mode("append").parquet(model)
        rep = {
            r["check"]: r["status"]
            for r in run_step(
                spark,
                "doctor",
                {"index": model},
                write=False,
                params={"kind": "lm_table"},
            ).collect()
        }
        assert rep["counts_table"] == "failed", rep


def test_streaming_lm_score_replay_parity(spark, tmp_path):
    """The streaming perplexity filter: replaying a delta corpus
    through streaming_lm_score in multiple triggers reproduces the
    frozen-model batch operator exactly — documents never interact
    and every count comes from the persisted model, so trigger
    slicing cannot change the result. A planted interrupted model
    compaction is finished by the consumer before the first read."""
    import shutil

    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_lm_score,
    )

    corpus = _df(spark, DOCS)
    model_path = str(tmp_path / "stream_lm_model.parquet")
    ngram_lm_table(corpus).write.parquet(model_path)
    # plant the committed-tmp-after-delete window of the crash-safe
    # overwrite protocol: the stream must heal it, not fail
    shutil.move(model_path, model_path + "__compacting")

    delta = _df(
        spark,
        [(300 + i, f"the cat sat zebra{i} on quux the mat") for i in range(9)],
    )
    src = str(tmp_path / "stream_lm_src")
    delta.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = []
    writer = streaming_lm_score(
        stream,
        model_path,
        on_batch=lambda scored, epoch: got.extend(scored.collect()),
    )
    q = (
        writer.option("checkpointLocation", str(tmp_path / "stream_lm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    assert os.path.exists(model_path)

    batch = lm_stupid_backoff_score(
        delta, lm=spark.read.parquet(model_path)
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(got) == 9 and all(r["avgLogScore"] is not None for r in got)
