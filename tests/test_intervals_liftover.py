"""Tests: per-source interval parsers + chain-file liftover.

Gene-linking, score semantics, and constants per source mirror
datasource/intervals/{andersson,javierre,jung,thurman}.py; the
andersson/jung/thurman raw fixtures reuse the reference's own sample
files when mounted.
"""

from __future__ import annotations

import os
import textwrap

import pytest
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.liftover import (
    chain_to_df,
    liftover_intervals,
    parse_chain_text,
)
from genetics_spark_coloc_spark.sources.intervals import (
    parse_andersson,
    parse_javierre,
    parse_jung,
    parse_thurman,
)

DATA = "/root/reference/tests/gentropy/data_samples"


def _symbols(spark, rows):
    return spark.createDataFrame(
        rows, "geneSymbol: string, geneId: string, tss: long, chromosome: string"
    )


class TestAndersson:
    def test_parse_inline(self, spark):
        raw = spark.createDataFrame(
            [
                {"name": "chr1:1000-2000;NM_1;GENEA;R:0.4;FDR:0", "score": 500},
                {"name": "chr1:1000-2000;NM_2;GENEA;R:0.2;FDR:0", "score": 250},
                {"name": "chrUn_x:1-2;NM_3;GENEB;R:0.1;FDR:0", "score": 100},
            ],
            "name: string, score: int",
        )
        out = parse_andersson(
            raw, _symbols(spark, [("GENEA", "ENSG1", 1500, "1")])
        ).collect()
        # non-canonical chromosome dropped; max score per region/gene;
        # permille score
        assert len(out) == 1
        r = out[0]
        assert r["chromosome"] == "1" and r["geneId"] == "ENSG1"
        assert r["resourceScore"] == pytest.approx(0.5)
        assert r["datasourceId"] == "andersson2014"
        assert r["datatypeId"] == "fantom5"

    def test_tss_distance_guard(self, spark):
        raw = spark.createDataFrame(
            [{"name": "chr1:1000-2000;NM_1;GENEA;R:0.4;FDR:0", "score": 500}],
            "name: string, score: int",
        )
        far = _symbols(spark, [("GENEA", "ENSG1", 5_000_000, "1")])
        out = parse_andersson(raw, far).collect()
        assert len(out) == 1 and out[0]["geneId"] is None  # left join keeps row

    @pytest.mark.skipif(not os.path.isdir(DATA), reason="reference samples absent")
    def test_parse_reference_sample(self, spark):
        # the sample has a `track` line then a header line; an explicit
        # schema + DROPMALFORMED drops both (the reference reads it the
        # same way, andersson.py:35-47)
        raw = (
            spark.read.option("delimiter", "\t")
            .option("mode", "DROPMALFORMED")
            .schema(
                "chrom string, chromStart int, chromEnd int, name string, score int"
            )
            .csv(f"{DATA}/andersson_sample.bed")
            .filter(F.col("chrom").startswith("chr") & F.col("score").isNotNull())
            .select("name", "score")
        )
        symbols = _symbols(spark, [("SAMD11", "ENSG000187634", 860000, "1")])
        out = parse_andersson(raw, symbols)
        rows = out.filter(F.col("geneId").isNotNull()).collect()
        assert len(rows) >= 1
        assert all(0 <= r["resourceScore"] <= 1 for r in rows)


class TestJavierre:
    def test_parse_inline(self, spark):
        raw = spark.createDataFrame(
            [
                # bait fragment in name; other fragment overlaps gene body
                {"chrom": "chr1", "start": 5000, "end": 6000,
                 "name": "chr1:9000-9500,7.5", "bio_feature": "Mon"},
                # score missing -> dropped
                {"chrom": "chr1", "start": 5000, "end": 6000,
                 "name": "chr1:9000-9500", "bio_feature": "Mon"},
                # chrom mismatch with name -> dropped
                {"chrom": "chr2", "start": 5000, "end": 6000,
                 "name": "chr1:9000-9500,3.0", "bio_feature": "Mon"},
            ],
            "chrom: string, start: int, end: int, name: string, bio_feature: string",
        )
        genes = spark.createDataFrame(
            [{"chromosome": "1", "start": 4500, "end": 5500,
              "geneId": "ENSG1", "tss": 4600}],
            "chromosome: string, start: long, end: long, geneId: string, tss: long",
        )
        out = parse_javierre(raw, genes).collect()
        assert len(out) == 1
        r = out[0]
        # output interval is the SCORED bait fragment
        assert (r["chromosome"], r["start"], r["end"]) == ("1", 9000, 9500)
        assert r["resourceScore"] == pytest.approx(7.5)
        assert r["geneId"] == "ENSG1" and r["biofeature"] == "Mon"
        assert r["datasourceId"] == "javierre2016"


class TestJung:
    def test_parse_inline(self, spark):
        raw = spark.createDataFrame(
            [
                {"Promoter": "GENEA;GENEB", "Interacting_fragment": "chr1.100.200",
                 "Tissue_type": "Liver"},
            ]
        )
        symbols = _symbols(
            spark, [("GENEA", "ENSG1", 0, "1"), ("GENEB", "ENSG2", 0, "1")]
        )
        out = parse_jung(raw, symbols).collect()
        got = {(r["geneId"], r["biofeature"]) for r in out}
        assert got == {("ENSG1", "Liver"), ("ENSG2", "Liver")}
        assert all(r["resourceScore"] == 1.0 for r in out)
        assert all(r["datasourceId"] == "jung2019" for r in out)


class TestThurman:
    def test_parse_inline(self, spark):
        raw = spark.createDataFrame(
            [
                {"chrom": "chr1", "start": 100, "end": 200,
                 "gene_name": "GENEA", "score": 0.8},
                # same symbol, wrong chromosome -> dropped (join is
                # chromosome-qualified for this source)
                {"chrom": "chr2", "start": 100, "end": 200,
                 "gene_name": "GENEA", "score": 0.9},
            ],
            "chrom: string, start: int, end: int, gene_name: string, score: double",
        )
        out = parse_thurman(
            raw, _symbols(spark, [("GENEA", "ENSG1", 0, "1")])
        ).collect()
        assert len(out) == 1
        assert out[0]["resourceScore"] == pytest.approx(0.8)
        assert out[0]["datasourceId"] == "thurman2012"


CHAIN_TEXT = textwrap.dedent(
    """\
    chain 1000 chr1 10000 + 1000 2000 chr1 20000 + 5000 6000 1
    400 100 100
    500

    chain 900 chr2 10000 + 0 1000 chr2 20000 - 19000 20000 2
    1000
    """
)


class TestLiftover:
    def test_parse_chain_text(self):
        blocks = parse_chain_text(CHAIN_TEXT)
        # chr1 (chain 0): two blocks [1000,1400) -> 5000+, [1500,2000) -> 5500+
        assert blocks[0] == (0, "1", 1000, 1400, "1", 5000, "+", 20000)
        assert blocks[1] == (0, "1", 1500, 2000, "1", 5500, "+", 20000)
        # chr2 (chain 1): one negative-strand block
        assert blocks[2] == (1, "2", 0, 1000, "2", 19000, "-", 20000)

    def test_interval_conversion(self, spark, tmp_path):
        p = tmp_path / "test.chain"
        p.write_text(CHAIN_TEXT)
        chain = chain_to_df(spark, str(p))
        df = spark.createDataFrame(
            [
                {"chrom": "1", "start": 1100, "end": 1300},   # inside block 1
                {"chrom": "1", "start": 1100, "end": 1700},   # spans the gap
                {"chrom": "1", "start": 9000, "end": 9100},   # unmapped
            ],
            "chrom: string, start: long, end: long",
        )
        out = liftover_intervals(df, chain, max_difference=100).collect()
        mapped = {(r["start"], r["end"]): (r["mapped_start"], r["mapped_end"]) for r in out}
        # offset +4000 inside block 1
        assert mapped[(1100, 1300)] == (5100, 5300)
        # spanning interval: start block offset +4000, end block offset
        # +4000 (5500-1500) -> length preserved within tolerance
        assert mapped[(1100, 1700)] == (5100, 5700)
        assert (9000, 9100) not in mapped

    def test_negative_strand(self, spark, tmp_path):
        p = tmp_path / "neg.chain"
        p.write_text(CHAIN_TEXT)
        chain = chain_to_df(spark, str(p))
        df = spark.createDataFrame(
            [{"chrom": "2", "start": 100, "end": 200}],
            "chrom: string, start: long, end: long",
        )
        out = liftover_intervals(df, chain).collect()
        assert len(out) == 1
        r = out[0]
        # pos p -> qSize - (qStart + p) - 1 = 20000 - 19000 - p - 1
        assert (r["mapped_start"], r["mapped_end"]) == (799, 899)

    def test_length_drift_filter(self, spark, tmp_path):
        p = tmp_path / "drift.chain"
        p.write_text(CHAIN_TEXT)
        chain = chain_to_df(spark, str(p))
        # start in block1, end in block2: mapped length drifts by dt-dq=0
        # here; craft a big drift via max_difference=0 on spanning row
        df = spark.createDataFrame(
            [{"chrom": "1", "start": 1399, "end": 1500}],
            "chrom: string, start: long, end: long",
        )
        out = liftover_intervals(df, chain, max_difference=0).collect()
        # start maps in block1 (offset 399 -> 5399), end in block2
        # (offset 0 -> 5500): length 101 vs original 101 -> kept
        assert len(out) == 1
