"""Tests for study-locus maintenance ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.study_locus_ops import (
    annotate_purity,
    assign_study_locus_id,
    hash_long_variant_ids,
    process_locus_breaker_output,
)


def test_assign_study_locus_id_deterministic(spark):
    df = spark.createDataFrame(
        [("S1", "v1"), ("S1", "v1"), ("S1", "v2")], ["studyId", "variantId"]
    )
    ids = [r["studyLocusId"] for r in df.select(assign_study_locus_id()).collect()]
    assert ids[0] == ids[1] != ids[2]
    assert len(ids[0]) == 32  # md5 hex


def test_hash_long_variant_ids(spark):
    short = "1_100_A_G"
    long = "2_200_" + "A" * 400 + "_G"
    df = spark.createDataFrame([(short,), (long,)], ["variantId"])
    out = [r["v"] for r in df.select(hash_long_variant_ids(F.col("variantId")).alias("v")).collect()]
    assert out[0] == short
    assert out[1].startswith("2_200_h") and len(out[1]) < 50


def test_annotate_purity(spark):
    df = spark.createDataFrame(
        [
            ("L1", [{"variantId": "a", "r2Overall": 0.8}, {"variantId": "b", "r2Overall": 0.6}]),
            ("L2", []),
        ],
        "studyLocusId: string, locus: array<struct<variantId: string, r2Overall: double>>",
    )
    rows = {r["studyLocusId"]: r for r in annotate_purity(df).collect()}
    assert rows["L1"]["purityMeanR2"] == pytest.approx(0.7)
    assert rows["L1"]["purityMinR2"] == pytest.approx(0.6)
    assert rows["L2"]["purityMeanR2"] is None


def test_process_locus_breaker_output(spark):
    lbc = spark.createDataFrame(
        [
            ("S1", "1", 500_000, "1_500000_A_C", 400_000, 600_000),   # small, kept
            ("S1", "1", 5_000_000, "1_5000000_A_C", 4_000_000, 7_000_000),  # large, split
        ],
        "studyId: string, chromosome: string, position: int, variantId: string, "
        "locusStart: int, locusEnd: int",
    )
    wbc = spark.createDataFrame(
        [
            ("S1", "1", 4_500_000, "1_4500000_A_C"),  # inside large locus
            ("S1", "1", 6_500_000, "1_6500000_A_C"),  # inside large locus
            ("S1", "1", 9_000_000, "1_9000000_A_C"),  # outside
        ],
        "studyId: string, chromosome: string, position: int, variantId: string",
    )
    out = process_locus_breaker_output(lbc, wbc, large_loci_size=1_500_000).collect()
    by_variant = {r["variantId"]: r for r in out}
    assert set(by_variant) == {"1_500000_A_C", "1_4500000_A_C", "1_6500000_A_C"}
    split = by_variant["1_4500000_A_C"]
    assert split["locusStart"] == 4_500_000 - 750_000
    assert split["locusEnd"] == 4_500_000 + 750_000
    assert by_variant["1_500000_A_C"]["locusStart"] == 400_000  # untouched


def test_credible_set_log10bf_matches_reference_doctest(spark):
    from genetics_spark_coloc_spark.operators.credible_sets import (
        credible_set_log10bf,
    )

    # the reference's own doctest value (study_locus.py:645-651)
    out = (
        spark.createDataFrame([([0.2, 0.1, 0.05, 0.0],)], "logBF: array<double>")
        .select(F.round(credible_set_log10bf(F.col("logBF")), 7).alias("bf"))
        .collect()[0]["bf"]
    )
    assert out == pytest.approx(0.6412604, abs=1e-7)


def test_filter_credible_set_and_ld_set(spark):
    from genetics_spark_coloc_spark.operators.credible_sets import (
        filter_credible_set,
        filter_ld_set,
        unique_variants_in_locus,
    )

    df = spark.createDataFrame(
        [
            {
                "studyLocusId": "L1",
                "variantId": "1_10_A_G",
                "locus": [
                    {"variantId": "1_10_A_G", "posteriorProbability": 0.94},
                    {"variantId": "1_20_A_G", "posteriorProbability": 0.05},
                    {"variantId": "2_30_A_G", "posteriorProbability": 0.01},
                ],
            }
        ],
        "studyLocusId: string, variantId: string, "
        "locus: array<struct<variantId: string, posteriorProbability: double>>",
    )
    filtered = filter_credible_set(df, "is95CredibleSet").collect()[0]["locus"]
    # exclusive prefix sums: 0 < .95 (keep), .94 < .95 (keep), .99 >= .95 (drop)
    assert [t["variantId"] for t in filtered] == ["1_10_A_G", "1_20_A_G"]

    uniq = {
        (r["variantId"], r["chromosome"])
        for r in unique_variants_in_locus(df).collect()
    }
    assert ("2_30_A_G", "2") in uniq and len(uniq) == 3

    ld = spark.createDataFrame(
        [
            {"ldSet": [{"tagVariantId": "a", "r2Overall": 0.9},
                       {"tagVariantId": "b", "r2Overall": 0.3}]},
            {"ldSet": None},
        ],
        "ldSet: array<struct<tagVariantId: string, r2Overall: double>>",
    )
    out = ld.select(filter_ld_set(F.col("ldSet"), 0.5).alias("f")).collect()
    assert [t["tagVariantId"] for t in out[0]["f"]] == ["a"]
    assert out[1]["f"] is None


def test_aggregate_and_map_ancestries(spark):
    from genetics_spark_coloc_spark.operators.study_index_ops import (
        aggregate_and_map_ancestries,
    )

    df = spark.createDataFrame(
        [
            {
                "discoverySamples": [
                    {"ancestry": "European", "sampleSize": 100.0},
                    {"ancestry": "East Asian", "sampleSize": 50.0},
                    {"ancestry": "South Asian", "sampleSize": 50.0},
                ]
            }
        ],
        "discoverySamples: array<struct<ancestry: string, sampleSize: double>>",
    )
    pops = df.select(
        F.explode(aggregate_and_map_ancestries(F.col("discoverySamples"))).alias("p")
    ).select("p.ldPopulation", "p.relativeSampleSize").collect()
    weights = {r["ldPopulation"]: r["relativeSampleSize"] for r in pops}
    # East + South Asian merge into eas: 100/200 nfe, 100/200 eas
    assert weights == {"nfe": pytest.approx(0.5), "eas": pytest.approx(0.5)}


def test_flag_trans_qtls_unit(spark):
    from genetics_spark_coloc_spark.operators.annotation import flag_trans_qtls

    study_locus = spark.createDataFrame(
        [
            {"studyLocusId": "Lcis", "studyId": "Q1",
             "locus": [{"variantId": "1_1000_A_G"}]},
            {"studyLocusId": "Ltrans", "studyId": "Q1",
             "locus": [{"variantId": "2_1000_A_G"}]},
            {"studyLocusId": "Lgwas", "studyId": "G1",
             "locus": [{"variantId": "1_1000_A_G"}]},
        ],
        "studyLocusId: string, studyId: string, locus: array<struct<variantId: string>>",
    )
    study_index = spark.createDataFrame(
        [("Q1", "eqtl", "GENE1"), ("G1", "gwas", None)],
        "studyId: string, studyType: string, geneId: string",
    )
    target_index = spark.createDataFrame(
        [{"id": "GENE1", "tss": 2000,
          "genomicLocation": {"chromosome": "1"}}],
        "id: string, tss: long, genomicLocation: struct<chromosome: string>",
    )
    rows = {
        r["studyLocusId"]: r["isTransQtl"]
        for r in flag_trans_qtls(study_locus, study_index, target_index).collect()
    }
    assert rows == {"Lcis": False, "Ltrans": True, "Lgwas": None}


def test_validate_chromosome_label_and_max_maf(spark):
    from genetics_spark_coloc_spark.operators.annotation import (
        max_maf,
        validate_chromosome_label,
    )

    df = spark.createDataFrame(
        [("L1", "1"), ("L2", "chr7"), ("L3", "MT")],
        "studyLocusId: string, chromosome: string",
    )
    rows = {
        r["studyLocusId"]: r["qualityControls"]
        for r in validate_chromosome_label(df).collect()
    }
    assert rows["L1"] == [] and rows["L3"] == []
    assert rows["L2"] == ["Chromosome not in 1:22, X, Y, XY or MT"]

    af = spark.createDataFrame(
        [
            {"alleleFrequencies": [
                {"populationName": "nfe", "alleleFrequency": 0.97},
                {"populationName": "afr", "alleleFrequency": 0.2},
            ]}
        ],
        "alleleFrequencies: array<struct<populationName: string, alleleFrequency: double>>",
    )
    out = af.select(max_maf(F.col("alleleFrequencies")).alias("m")).collect()[0]["m"]
    # 0.97 folds to 0.03; max(0.03, 0.2) = 0.2
    assert out == pytest.approx(0.2)


def test_annotate_sumstats_qc_flags(spark):
    from genetics_spark_coloc_spark.operators.study_index_ops import (
        annotate_sumstats_qc,
    )

    studies = spark.createDataFrame(
        [("S1",), ("S2",), ("S3",)], "studyId: string"
    )
    qc = spark.createDataFrame(
        [
            # S1 clean; S2 fails mean-beta + gc-lambda; S3 absent
            ("S1", 0.01, 0.0, 0.01, 1.0, 5_000_000.0),
            ("S2", 0.5, 0.0, 0.01, 3.0, 5_000_000.0),
        ],
        "studyId: string, mean_beta: double, mean_diff_pz: double, "
        "se_diff_pz: double, gc_lambda: double, n_variants: double",
    )
    rows = {
        r["studyId"]: (r["hasSumstats"], sorted(r["qualityControls"]))
        for r in annotate_sumstats_qc(studies, qc).collect()
    }
    assert rows["S1"] == (True, [])
    assert rows["S2"] == (
        True,
        [
            "The GC lambda value is not within the expected range",
            "The mean beta QC check value is not within the expected range",
        ],
    )
    assert rows["S3"] == (
        False,
        ["Harmonized summary statistics are not available or empty"],
    )


def test_deconvolute_studies(spark):
    from genetics_spark_coloc_spark.operators.study_index_ops import (
        deconvolute_studies,
    )

    df = spark.createDataFrame(
        [
            # top-hit source: no sumstats, flagged not-curated + no-sumstats
            ("S1", "gwas", False,
             ["GWAS Catalog study has not been curated by Open Targets",
              "Harmonized summary statistics are not available or empty"],
             "trait long", ["EFO1", "EFO2"]),
            # sumstats source for the same study
            ("S1", "eqtl", True, [], "trait short", ["EFO1"]),
            # lone top-hit study: keeps the sumstats-not-available flag
            ("S2", "gwas", False,
             ["Harmonized summary statistics are not available or empty"],
             "t2", ["EFO9"]),
        ],
        "studyId: string, studyType: string, hasSumstats: boolean, "
        "qualityControls: array<string>, traitFromSource: string, "
        "traitFromSourceMappedIds: array<string>",
    )
    rows = {r["studyId"]: r for r in deconvolute_studies(df).collect()}
    s1 = rows["S1"]
    # curation flag dropped (row had no sumstats), not-available flag dropped
    # (another source has sumstats) -> no flags survive
    assert s1["qualityControls"] == []
    assert s1["hasSumstats"] is True
    assert s1["studyType"] == "eqtl,gwas"
    # most granular trait = fewest mapped ids
    assert s1["traitFromSource"] == "trait short"
    assert s1["traitFromSourceMappedIds"] == ["EFO1"]
    s2 = rows["S2"]
    assert s2["qualityControls"] == [
        "Harmonized summary statistics are not available or empty"
    ]
    assert s2["hasSumstats"] is False


def test_validate_unique_study_locus_id(spark):
    from genetics_spark_coloc_spark.operators.study_locus_ops import (
        validate_unique_study_locus_id,
    )

    df = spark.createDataFrame(
        [("SL1", "a"), ("SL1", "b"), ("SL2", "c")],
        "studyLocusId: string, payload: string",
    )
    rows = validate_unique_study_locus_id(df).collect()
    flags = {(r["studyLocusId"], r["payload"]): r["qualityControls"] for r in rows}
    assert flags[("SL1", "a")] == ["Non-unique study locus identifier"]
    assert flags[("SL1", "b")] == ["Non-unique study locus identifier"]
    assert flags[("SL2", "c")] == []
