"""Tests for annotation/validation operators + GC-lambda QC."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.annotation import (
    enforce_struct_schema,
    flag_invalid_variants,
    intervals_to_gene_tss,
    map_column_values,
    most_severe_consequence,
    validate_study_locus,
    write_vcf,
)


def test_map_column_values(spark):
    df = spark.createDataFrame([("gwas",), ("eqtl",), ("unknown",)], ["t"])
    out = df.select(
        map_column_values(F.col("t"), {"gwas": "GWAS study", "eqtl": "eQTL study"}, default="other").alias("label")
    ).collect()
    assert [r["label"] for r in out] == ["GWAS study", "eQTL study", "other"]


def test_enforce_struct_schema(spark):
    df = spark.createDataFrame(
        [({"a": 1, "extra": "x"},)], "s: struct<a: int, extra: string>"
    )
    out = df.select(
        enforce_struct_schema(F.col("s"), "struct<a: int, b: double>").alias("s")
    ).collect()[0]["s"]
    assert out["a"] == 1 and out["b"] is None
    assert "extra" not in out.asDict()


def test_most_severe_consequence(spark):
    df = spark.createDataFrame(
        [(["intron_variant", "missense_variant", "synonymous_variant"],),
         (["intergenic_variant"],),
         ([],)],
        "terms: array<string>",
    )
    out = [r["msc"] for r in df.select(most_severe_consequence(F.col("terms")).alias("msc")).collect()]
    assert out == ["missense_variant", "intergenic_variant", None]


def test_validate_study_locus(spark):
    loci = spark.createDataFrame(
        [("L1", "S1", None), ("L2", "S_MISSING", None)],
        "studyLocusId: string, studyId: string, qualityControls: array<string>",
    )
    studies = spark.createDataFrame([("S1",)], "studyId: string")
    out = {r["studyLocusId"]: r["qualityControls"] for r in validate_study_locus(loci, studies).collect()}
    assert out["L1"] is None or out["L1"] == []
    assert out["L2"] and "Study not found" in out["L2"][0]


def test_flag_invalid_variants(spark):
    loci = spark.createDataFrame(
        [("L1", "1_100_A_G", None), ("L2", "99_100_A_G", None), ("L3", "garbage", None),
         ("L4", "X_5_AT_G", None)],
        "studyLocusId: string, variantId: string, qualityControls: array<string>",
    )
    out = {r["studyLocusId"]: r["qualityControls"] for r in flag_invalid_variants(loci).collect()}
    assert not out["L1"]
    assert out["L2"] and out["L3"]
    assert not out["L4"]  # indel alleles are valid ACGT strings


def test_intervals_to_gene_tss(spark):
    intervals = spark.createDataFrame(
        [("1", 1000, 2000, "E1", 0.9, "andersson", None)],
        "chromosome: string, start: int, end: int, geneId: string, score: double, "
        "datasourceId: string, biosampleId: string",
    )
    targets = spark.createDataFrame(
        [
            {"id": "Gnear", "tss": 2500, "genomicLocation": {"chromosome": "1", "start": 1, "end": 2}},
            {"id": "Gfar", "tss": 900_000, "genomicLocation": {"chromosome": "1", "start": 1, "end": 2}},
            {"id": "Gother", "tss": 2500, "genomicLocation": {"chromosome": "2", "start": 1, "end": 2}},
        ],
        "id: string, tss: long, genomicLocation: struct<chromosome: string, start: long, end: long>",
    )
    out = intervals_to_gene_tss(intervals, targets, max_distance=250_000).collect()
    # only the same-chromosome nearby gene joins
    assert len(out) == 1
    assert out[0]["tssGeneId"] == "Gnear"


def test_write_vcf_roundtrip(spark, tmp_path):
    vi = spark.createDataFrame(
        [("1_100_A_G", "1", 100, "A", "G")],
        "variantId: string, chromosome: string, position: int, referenceAllele: string, alternateAllele: string",
    )
    out_dir = str(tmp_path / "vcf")
    write_vcf(vi, out_dir)
    back = spark.read.option("sep", "\t").option("header", True).csv(out_dir)
    row = back.collect()[0]
    assert row["#CHROM"] == "1" and row["POS"] == "100" and row["REF"] == "A"


def test_variant_effect_normalisers(spark):
    from genetics_spark_coloc_spark.operators.variant_effect import (
        get_loftee,
        normalise_variant_effect,
    )

    df = spark.createDataFrame(
        [
            {"variantId": "v1", "variantEffect": [
                {"method": "CADD", "assessment": None, "score": 15.0},
                {"method": "GERP", "assessment": None, "score": 7.0},
                {"method": "LOFTEE", "assessment": "LC", "score": None},
                {"method": "PolyPhen", "assessment": "unknown", "score": 0.5},
                {"method": "SpliceAI", "assessment": None, "score": 0.42},
            ]}
        ],
        "variantId: string, variantEffect: array<struct<method: string, assessment: string, score: double>>",
    )
    out = df.select(
        F.explode(normalise_variant_effect(F.col("variantEffect"))).alias("ve")
    ).select("ve.method", "ve.normalisedScore").collect()
    norm = {r["method"]: r["normalisedScore"] for r in out}
    assert norm["CADD"] == pytest.approx(0.25)     # 15 in 10-20 band -> 0..0.5
    assert norm["GERP"] == pytest.approx(1.0)      # >6 saturates
    assert norm["LOFTEE"] == pytest.approx(0.85)
    assert norm["PolyPhen"] is None                # unknown -> null
    assert norm["SpliceAI"] == pytest.approx(0.42) # passthrough

    loftee_df = spark.createDataFrame(
        [
            {"variantId": "v1", "transcriptConsequences": [
                {"targetId": "G1", "lofteePrediction": "HC"},
                {"targetId": "G2", "lofteePrediction": None},
            ]}
        ],
        "variantId: string, transcriptConsequences: array<struct<targetId: string, lofteePrediction: string>>",
    )
    rows = get_loftee(loftee_df).collect()
    assert len(rows) == 1 and rows[0]["isHighQualityPlof"] is True


def test_annotate_with_amino_acid_consequences(spark):
    from genetics_spark_coloc_spark.operators.variant_effect import (
        annotate_with_amino_acid_consequences,
    )

    vi = spark.createDataFrame(
        [
            {
                "variantId": "v1",
                "transcriptConsequences": [
                    {"targetId": "G1", "aminoAcidChange": "A100T",
                     "uniprotAccessions": ["P1", "P2"]},
                    {"targetId": "G2", "aminoAcidChange": None,
                     "uniprotAccessions": None},
                ],
                "variantEffect": [
                    {"method": "CADD", "assessment": None, "score": 10.0}
                ],
            },
            {
                "variantId": "v2",
                "transcriptConsequences": [
                    {"targetId": "G3", "aminoAcidChange": None,
                     "uniprotAccessions": None}
                ],
                "variantEffect": [],
            },
        ],
        "variantId: string, transcriptConsequences: array<struct<targetId: string, "
        "aminoAcidChange: string, uniprotAccessions: array<string>>>, "
        "variantEffect: array<struct<method: string, assessment: string, score: double>>",
    )
    annotation = spark.createDataFrame(
        [
            {"uniprotAccession": "P1", "aminoAcidChange": "A100T",
             "variantEffect": [
                 {"method": "AlphaMissense", "assessment": None, "score": 0.9}
             ]}
        ],
        "uniprotAccession: string, aminoAcidChange: string, "
        "variantEffect: array<struct<method: string, assessment: string, score: double>>",
    )
    rows = {r["variantId"]: r for r in
            annotate_with_amino_acid_consequences(vi, annotation).collect()}
    # v1 enriched via P1 (richest row wins over the unenriched P2 row)
    methods = sorted(e["method"] for e in rows["v1"]["variantEffect"])
    assert methods == ["AlphaMissense", "CADD"]
    # v2 untouched, still present
    assert rows["v2"]["variantEffect"] == []
