"""BM25 inverted-index family (r14 additive layer): bm25_postings /
bm25_search operators and the bm25_index / bm25_query steps — the
at-rest retrieval shape (index once, every query touches only its own
terms' pfx partitions) whose scores are bit-identical to the direct
corpus-scanning ``bm25_scores``.
"""

from __future__ import annotations

import json
import os
import zlib

import pytest
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.text import (
    bm25_corpus_stats,
    bm25_postings,
    bm25_scores,
    bm25_search,
)
from genetics_spark_coloc_spark.session import (
    WriterLeaseHeld,
    acquire_writer_lease,
    release_writer_lease,
)
from genetics_spark_coloc_spark.steps import run_step

DOCS = [
    (1, "spark shuffles the hash join build side"),
    (2, "broadcast hash join beats shuffle join on small dims"),
    (3, "a vector index prunes the search space"),
    (4, "the the the repeated stopword document"),
    (5, ""),
    (6, "hash hash hash collisions"),
]
QUERY = ["hash", "join", "vector"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestOperator:
    def test_index_backed_equals_direct(self, spark):
        docs = _df(spark, DOCS)
        direct = {
            r["docId"]: (r["dl"], r["score"])
            for r in bm25_scores(docs, QUERY).collect()
        }
        got = {
            r["docId"]: (r["dl"], r["score"])
            for r in bm25_search(
                bm25_postings(docs), QUERY, bm25_corpus_stats(docs)
            ).collect()
        }
        assert got == direct
        # the empty and non-matching docs are excluded, matchers kept
        assert set(got) == {1, 2, 3, 6}

    def test_pfx_is_sparkside_crc32(self, spark):
        rows = bm25_postings(_df(spark, DOCS), n_pfx=16).collect()
        assert rows
        for r in rows:
            assert r["pfx"] == zlib.crc32(r["term"].encode()) % 16

    def test_duplicate_and_case_variant_query_terms_count_once(self, spark):
        # both forms are SET-semantic over the query: "HASH hash" is
        # the query {hash} — before r14 the direct form double-counted
        # repeated terms and diverged from the index-backed form
        docs = _df(spark, DOCS)
        base_direct = bm25_scores(docs, QUERY).collect()
        dup_direct = bm25_scores(
            docs, QUERY + ["HASH", "hash", "Join"]
        ).collect()
        assert sorted(map(tuple, base_direct)) == sorted(map(tuple, dup_direct))
        dup_idx = bm25_search(
            bm25_postings(docs),
            QUERY + ["HASH", "hash", "Join"],
            bm25_corpus_stats(docs),
        ).collect()
        assert sorted(map(tuple, dup_idx)) == sorted(map(tuple, base_direct))

    def test_unknown_term_contributes_nothing(self, spark):
        docs = _df(spark, DOCS)
        base = bm25_search(
            bm25_postings(docs), QUERY, bm25_corpus_stats(docs)
        ).collect()
        plus = bm25_search(
            bm25_postings(docs),
            QUERY + ["zzzunseen"],
            bm25_corpus_stats(docs),
        ).collect()
        assert sorted(map(tuple, base)) == sorted(map(tuple, plus))


class TestStep:
    def _corpus(self, spark, rows, tmp_path, name):
        p = str(tmp_path / name)
        _df(spark, rows).write.parquet(p)
        return p

    def test_build_append_equals_one_shot(self, spark, tmp_path):
        c1 = self._corpus(spark, DOCS[:3], tmp_path, "c1")
        c2 = self._corpus(spark, DOCS[3:], tmp_path, "c2")
        cu = self._corpus(spark, DOCS, tmp_path, "cu")
        idx = str(tmp_path / "idx")
        run_step(spark, "bm25_index", {"corpus": c1}, idx)
        run_step(
            spark, "bm25_index", {"corpus": c2}, idx, params={"mode": "append"}
        )
        got = run_step(
            spark,
            "bm25_query",
            {"index": idx},
            str(tmp_path / "hits"),
            params={"query": "hash join vector"},
        ).collect()
        direct = bm25_scores(spark.read.parquet(cu), QUERY).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, direct))
        meta = json.load(open(os.path.join(idx, "_bm25_meta.json")))
        assert meta["n_docs"] == len(DOCS)

    def test_query_scan_statically_prunes_partitions(self, spark, tmp_path):
        c = self._corpus(spark, DOCS, tmp_path, "c")
        idx = str(tmp_path / "idx")
        run_step(spark, "bm25_index", {"corpus": c}, idx)
        hits = run_step(
            spark,
            "bm25_query",
            {"index": idx},
            None,
            params={"query": "vector"},
            write=False,
        )
        plan = hits._jdf.queryExecution().executedPlan().toString()
        want = zlib.crc32(b"vector") % 64
        assert f"pfx#" in plan and "PartitionFilters" in plan, plan
        # only the one term partition survives pruning: the scan's
        # partition filter pins pfx to the term's crc32 bucket
        assert f"({want})" in plan or f"[{want}]" in plan or f" {want})" in plan, plan

    def test_top_k_orders_by_score(self, spark, tmp_path):
        c = self._corpus(spark, DOCS, tmp_path, "c")
        idx = str(tmp_path / "idx")
        run_step(spark, "bm25_index", {"corpus": c}, idx)
        top = run_step(
            spark,
            "bm25_query",
            {"index": idx},
            str(tmp_path / "top"),
            params={"query": "hash join vector", "top_k": 2},
        ).collect()
        full = run_step(
            spark,
            "bm25_query",
            {"index": idx},
            str(tmp_path / "full"),
            params={"query": "hash join vector"},
        ).collect()
        best = sorted(full, key=lambda r: (-r["score"], r["docId"]))[:2]
        assert [tuple(r) for r in top] == [tuple(r) for r in best]

    def test_empty_query_refused(self, spark, tmp_path):
        c = self._corpus(spark, DOCS, tmp_path, "c")
        idx = str(tmp_path / "idx")
        run_step(spark, "bm25_index", {"corpus": c}, idx)
        with pytest.raises(ValueError, match="at least one term"):
            run_step(
                spark,
                "bm25_query",
                {"index": idx},
                None,
                params={"query": "  "},
                write=False,
            )

    def test_maintenance_is_leased(self, spark, tmp_path):
        c = self._corpus(spark, DOCS[:3], tmp_path, "c")
        idx = str(tmp_path / "idx")
        run_step(spark, "bm25_index", {"corpus": c}, idx)
        token = acquire_writer_lease(spark, idx, "test:holder")
        try:
            with pytest.raises(WriterLeaseHeld, match="test:holder"):
                run_step(
                    spark,
                    "bm25_index",
                    {"corpus": c},
                    idx,
                    params={"mode": "append"},
                )
        finally:
            release_writer_lease(spark, idx, token)

    def test_query_finishes_interrupted_meta_write(self, spark, tmp_path):
        c = self._corpus(spark, DOCS, tmp_path, "c")
        idx = str(tmp_path / "idx")
        run_step(spark, "bm25_index", {"corpus": c}, idx)
        meta_path = os.path.join(idx, "_bm25_meta.json")
        # plant the committed-tmp-after-delete window of the text
        # protocol: target gone, complete content at the tmp sibling
        os.rename(meta_path, meta_path + "__txn")
        got = run_step(
            spark,
            "bm25_query",
            {"index": idx},
            None,
            params={"query": "hash"},
            write=False,
        ).collect()
        assert os.path.exists(meta_path)
        assert got


class TestDoctor:
    def _build(self, spark, tmp_path):
        c = str(tmp_path / "c")
        _df(spark, DOCS).write.parquet(c)
        idx = str(tmp_path / "idx")
        run_step(spark, "bm25_index", {"corpus": c}, idx)
        return idx

    def _doctor(self, spark, idx):
        return {
            r["check"]: r["status"]
            for r in run_step(
                spark,
                "doctor",
                {"index": idx},
                write=False,
                params={"kind": "bm25"},
            ).collect()
        }

    def test_healthy(self, spark, tmp_path):
        rep = self._doctor(spark, self._build(spark, tmp_path))
        assert set(rep.values()) == {"ok"}, rep
        assert "postings_consistent" in rep

    def test_refed_document_detected(self, spark, tmp_path):
        idx = self._build(spark, tmp_path)
        # re-append the SAME corpus: duplicate (term, doc) postings
        c = str(tmp_path / "c")
        run_step(
            spark, "bm25_index", {"corpus": c}, idx, params={"mode": "append"}
        )
        rep = self._doctor(spark, idx)
        assert rep["postings_consistent"] == "failed", rep

    def test_torn_meta_repaired(self, spark, tmp_path):
        idx = self._build(spark, tmp_path)
        meta_path = os.path.join(idx, "_bm25_meta.json")
        os.rename(meta_path, meta_path + "__txn")
        rep = self._doctor(spark, idx)
        assert rep["meta_readable"] == "repaired", rep
        assert rep["postings_consistent"] == "ok"


class TestAppendCrashContract:
    def test_orphan_epoch_invisible_swept_and_rerunnable(self, spark, tmp_path):
        """The epoch-committed append: a crash between the postings
        write and the meta commit leaves an orphan appendEpoch
        partition. Queries must not see it, the doctor sweeps it, and
        re-running the SAME append converges to the one-shot index."""
        c1 = str(tmp_path / "c1")
        c2 = str(tmp_path / "c2")
        cu = str(tmp_path / "cu")
        _df(spark, DOCS[:3]).write.parquet(c1)
        _df(spark, DOCS[3:]).write.parquet(c2)
        _df(spark, DOCS).write.parquet(cu)
        idx = str(tmp_path / "idx")
        run_step(spark, "bm25_index", {"corpus": c1}, idx)

        def hits():
            return sorted(
                map(
                    tuple,
                    run_step(
                        spark,
                        "bm25_query",
                        {"index": idx},
                        None,
                        params={"query": "hash join vector"},
                        write=False,
                    ).collect(),
                )
            )

        before = hits()
        # plant the crash: the delta's postings land under epoch 1 but
        # the meta commit never happens
        from genetics_spark_coloc_spark.operators.text import bm25_postings

        bm25_postings(spark.read.parquet(c2)).withColumn(
            "appendEpoch", F.lit(1)
        ).write.partitionBy("appendEpoch", "pfx").mode("append").parquet(idx)
        # 1) invisible to queries: the index serves its pre-append state
        assert hits() == before
        # 2) the doctor sweeps the orphan and everything else is ok
        rep = {
            r["check"]: r["status"]
            for r in run_step(
                spark,
                "doctor",
                {"index": idx},
                write=False,
                params={"kind": "bm25"},
            ).collect()
        }
        assert rep["uncommitted_epochs"] == "repaired", rep
        assert rep["postings_consistent"] == "ok", rep
        assert not os.path.exists(os.path.join(idx, "appendEpoch=1"))
        # 3) the interrupted append re-runs to the one-shot result
        run_step(
            spark, "bm25_index", {"corpus": c2}, idx, params={"mode": "append"}
        )
        oneshot = str(tmp_path / "oneshot")
        run_step(spark, "bm25_index", {"corpus": cu}, oneshot)
        got = hits()
        want = sorted(
            map(
                tuple,
                run_step(
                    spark,
                    "bm25_query",
                    {"index": oneshot},
                    None,
                    params={"query": "hash join vector"},
                    write=False,
                ).collect(),
            )
        )
        assert got == want

    def test_append_start_sweeps_previous_orphan(self, spark, tmp_path):
        """An interrupted append followed directly by another append
        (no doctor in between) must not double the delta: the append
        itself sweeps orphan epochs first."""
        c1 = str(tmp_path / "c1")
        c2 = str(tmp_path / "c2")
        _df(spark, DOCS[:3]).write.parquet(c1)
        _df(spark, DOCS[3:]).write.parquet(c2)
        idx = str(tmp_path / "idx")
        run_step(spark, "bm25_index", {"corpus": c1}, idx)
        from genetics_spark_coloc_spark.operators.text import bm25_postings

        bm25_postings(spark.read.parquet(c2)).withColumn(
            "appendEpoch", F.lit(1)
        ).write.partitionBy("appendEpoch", "pfx").mode("append").parquet(idx)
        run_step(
            spark, "bm25_index", {"corpus": c2}, idx, params={"mode": "append"}
        )
        rep = {
            r["check"]: r["status"]
            for r in run_step(
                spark,
                "doctor",
                {"index": idx},
                write=False,
                params={"kind": "bm25"},
            ).collect()
        }
        assert rep["postings_consistent"] == "ok", rep
        assert rep["uncommitted_epochs"] == "ok", rep
