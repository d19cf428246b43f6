"""Round-2 ingestion operators: FinnGen SuSiE fine-mapping, GWAS-Catalog
study index parsing, variant→VCF, LOF curation."""

from __future__ import annotations

from pyspark.sql import functions as F

from genetics_spark_coloc_spark.sources.finngen_finemapping import (
    finngen_finemapping_to_study_locus,
)


def _wide_row(trait, region, v, pos, cs, alphas, lbfs, means, p="1E-9"):
    row = {
        "trait": trait,
        "region": region,
        "v": v,
        "chromosome": "chr1",
        "position": str(pos),
        "cs": str(cs),
        "p": p,
        "se": "0.1",
        "maf": "0.2",
    }
    for i in range(1, 11):
        row[f"alpha{i}"] = alphas[i - 1] if i <= len(alphas) else 0.0
        row[f"lbf_variable{i}"] = lbfs[i - 1] if i <= len(lbfs) else 0.0
        row[f"mean{i}"] = means[i - 1] if i <= len(means) else 0.0
    return row


def test_finngen_finemapping_selects_per_cs_columns(spark):
    snps = spark.createDataFrame(
        [
            # cs=2 → picks alpha2/lbf2/mean2
            _wide_row("T1", "1:100-200", "1:150:A:G", 150, 2, [0.9, 0.4], [1.0, 2.0], [0.5, -0.3]),
            _wide_row("T1", "1:100-200", "1:160:A:G", 160, 2, [0.1, 0.6], [1.0, 3.0], [0.5, 0.7]),
            # cs=0 → dropped (not in any credible set)
            _wide_row("T1", "1:100-200", "1:170:A:G", 170, 0, [0.5], [1.0], [0.5]),
        ]
    )
    summaries = spark.createDataFrame(
        [("T1", "1:100-200", "2", 5.0, 0.9, 0.8)],
        ["trait", "region", "cs", "cs_log10bf", "cs_avg_r2", "cs_min_r2"],
    )
    out = finngen_finemapping_to_study_locus(snps, summaries, "FINNGEN_R11").collect()
    assert len(out) == 1
    row = out[0]
    assert row["studyId"] == "FINNGEN_R11_T1"
    # lead = max alpha2 (0.6 at position 160)
    assert row["variantId"] == "1_160_A_G"
    assert row["beta"] == 0.7
    assert row["locusStart"] == 100 and row["locusEnd"] == 200
    assert [t["variantId"] for t in row["locus"]] == ["1_150_A_G", "1_160_A_G"]
    assert [t["posteriorProbability"] for t in row["locus"]] == [0.4, 0.6]


def test_finngen_finemapping_lbf_threshold_keeps_first_cs(spark):
    snps = spark.createDataFrame(
        [
            _wide_row("T1", "1:100-200", "1:150:A:G", 150, 1, [0.9], [1.0], [0.5]),
            _wide_row("T1", "1:100-200", "1:160:A:G", 160, 2, [0.0, 0.8], [0.0, 1.0], [0.0, 0.5]),
        ]
    )
    summaries = spark.createDataFrame(
        [
            ("T1", "1:100-200", "1", 0.1, 0.9, 0.8),  # below threshold, kept (cs 1)
            ("T1", "1:100-200", "2", 0.1, 0.9, 0.8),  # below threshold, dropped
        ],
        ["trait", "region", "cs", "cs_log10bf", "cs_avg_r2", "cs_min_r2"],
    )
    out = finngen_finemapping_to_study_locus(snps, summaries, "FINNGEN_R11")
    assert [r["credibleSetIndex"] for r in out.collect()] == [1]


def test_finngen_finemapping_pvalue_zero_survives(spark):
    snps = spark.createDataFrame(
        [_wide_row("T1", "1:100-200", "1:150:A:G", 150, 1, [0.9], [1.0], [0.5], p="0")]
    )
    summaries = spark.createDataFrame(
        [("T1", "1:100-200", "1", 5.0, 0.9, 0.8)],
        ["trait", "region", "cs", "cs_log10bf", "cs_avg_r2", "cs_min_r2"],
    )
    row = finngen_finemapping_to_study_locus(snps, summaries).collect()[0]
    assert row["pValueExponent"] == -308
