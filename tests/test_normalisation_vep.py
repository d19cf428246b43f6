"""Tests for normalisation, partitioned writes, VEP JSONL parsing,
plus hypothesis property tests for the p-value algebra."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.functions.pvalue import split_pvalue
from genetics_spark_coloc_spark.operators.normalisation import (
    liftover_coordinates,
    normalise_column,
    write_partitioned_by_chromosome,
)
from genetics_spark_coloc_spark.sources.vep import read_vep_jsonl


def test_normalise_column_matches_reference_example(spark):
    # reference doctest (spark_helpers.py:227-238): [5, 50, 1000] ->
    # [0.0, 0.05, 1.0]
    df = spark.createDataFrame([(5,), (50,), (1000,)], ["value"])
    out = {r["value"]: r["norm_value"] for r in normalise_column(df, "value", "norm_value").collect()}
    assert out == {5: 0.0, 50: 0.05, 1000: 1.0}


def test_normalise_column_constant(spark):
    df = spark.createDataFrame([(7,), (7,)], ["value"])
    out = [r["n"] for r in normalise_column(df, "value", "n").collect()]
    assert out == [0.0, 0.0]


def test_liftover_unavailable_raises(spark):
    df = spark.createDataFrame([("1", 100)], "chromosome: string, position: int")
    with pytest.raises(NotImplementedError, match="pyliftover"):
        liftover_coordinates(df, "/nonexistent.chain")


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [("1", 10, 0.1), ("2", 20, 0.2), ("X", 30, 0.3)],
        "chromosome: string, position: int, beta: double",
    )
    path = str(tmp_path / "by_chrom")
    write_partitioned_by_chromosome(df, path)
    back = spark.read.parquet(path).filter(F.col("chromosome") == "2")
    assert back.count() == 1
    # partition pruning: only the chromosome=2 directory is scanned
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "chromosome=2" in plan or "PartitionFilters" in plan


VEP_LINES = [
    {
        "id": "rs1",
        "seq_region_name": "1",
        "start": 1000,
        "allele_string": "A/G",
        "most_severe_consequence": "missense_variant",
        "transcript_consequences": [
            {
                "gene_id": "ENSG0001",
                "transcript_id": "ENST01",
                "biotype": "protein_coding",
                "canonical": 1,
                "consequence_terms": ["missense_variant", "splice_region_variant"],
                "distance": 0,
            },
            {
                "gene_id": "ENSG0002",
                "transcript_id": "ENST02",
                "biotype": "lncRNA",
                "canonical": 0,
                "consequence_terms": ["upstream_gene_variant"],
                "distance": 4500,
            },
        ],
    },
    {
        "id": "rs2",
        "seq_region_name": "2",
        "start": 2000,
        "allele_string": "C/T",
        "most_severe_consequence": "intergenic_variant",
        "transcript_consequences": None,
    },
]


def test_read_vep_jsonl(spark, tmp_path):
    p = tmp_path / "vep.jsonl"
    p.write_text("\n".join(json.dumps(line) for line in VEP_LINES))
    rows = {r["variantId"]: r for r in read_vep_jsonl(spark, str(p)).collect()}
    r1 = rows["1_1000_A_G"]
    assert r1["chromosome"] == "1" and r1["referenceAllele"] == "A"
    assert r1["mostSevereConsequence"] == "missense_variant"
    csq = {c["targetId"]: c for c in r1["transcriptConsequences"]}
    assert csq["ENSG0001"]["isEnsemblCanonical"] is True
    assert csq["ENSG0001"]["consequenceScore"] == pytest.approx(0.7)  # missense
    assert csq["ENSG0002"]["consequenceScore"] == pytest.approx(0.25)  # upstream
    r2 = rows["2_2000_C_T"]
    # no transcript terms -> falls back to VEP's own
    # most_severe_consequence (reference vep_parser.py:712)
    assert r2["mostSevereConsequence"] == "intergenic_variant"
    assert r2["transcriptConsequences"] is None


# ---------------------------------------------------------- property tests
@given(st.floats(min_value=1e-310, max_value=1.0, exclude_max=False, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_split_pvalue_roundtrip(p):
    mantissa, exponent = split_pvalue(p)
    assert 1.0 <= mantissa < 10.0 or (mantissa == 1.0 and exponent == 0)
    # recomposition is within float tolerance
    assert mantissa * 10.0**exponent == pytest.approx(p, rel=1e-6)


@given(
    st.floats(min_value=1.0, max_value=9.99, allow_nan=False),
    st.integers(min_value=-300, max_value=-1),
)
@settings(max_examples=100, deadline=None)
def test_pvalue_pair_ordering_consistent(mantissa, exponent):
    """Pair comparison agrees with float comparison wherever floats
    can represent the value."""
    from genetics_spark_coloc_spark.functions.pvalue import split_pvalue

    p = mantissa * 10.0**exponent
    threshold = 5e-8
    t_m, t_e = split_pvalue(threshold)
    pair_lte = (exponent < t_e) or (exponent == t_e and mantissa <= t_m)
    assert pair_lte == (p <= threshold) or abs(p - threshold) / threshold < 1e-9


VEP_BREADTH_LINES = [
    {
        "id": "rs10",
        "seq_region_name": "3",
        "start": 500,
        "allele_string": "G/C",
        "most_severe_consequence": "missense_variant",
        "transcript_consequences": [
            {
                "gene_id": "ENSG0009",
                "transcript_id": "ENST09",
                "biotype": "protein_coding",
                "canonical": 1,
                "consequence_terms": ["missense_variant"],
                "distance": 0,
                "cadd_phred": 23.5,
                "polyphen_score": 0.95,
                "polyphen_prediction": "probably_damaging",
                "sift_score": 0.01,
                "sift_prediction": "deleterious",
                "lof": "HC",
                "lof_filter": None,
                "conservation": 4.9,
                "hgvsg": "3:g.500G>C",
            },
            {
                "gene_id": "ENSG0010",
                "transcript_id": "ENST10",
                "biotype": "protein_coding",
                "canonical": 0,
                "consequence_terms": ["synonymous_variant"],
                "distance": 0,
                "cadd_phred": 25.0,
            },
        ],
        "regulatory_feature_consequences": [
            {
                "regulatory_feature_id": "ENSR0001",
                "biotype": "promoter",
                "consequence_terms": ["regulatory_region_variant"],
            }
        ],
    },
    {
        "id": "rs11",
        "seq_region_name": "4",
        "start": 900,
        "allele_string": "T/A",
        "most_severe_consequence": "intergenic_variant",
        "intergenic_consequences": [
            {
                "consequence_terms": ["intergenic_variant"],
                "cadd_phred": 1.2,
                "conservation": -0.3,
                "hgvsg": "4:g.900T>A",
            }
        ],
    },
]


def test_vep_effects_regulatory_intergenic(spark, tmp_path):
    """Breadth extension (reference vep_parser.py:348-500, 604-911):
    per-method effect entries from the top-scoring transcript, the
    intergenic fallback, the regulatory block, and HGVS ids."""
    p = tmp_path / "vep2.jsonl"
    p.write_text("\n".join(json.dumps(line) for line in VEP_BREADTH_LINES))
    rows = {r["variantId"]: r for r in read_vep_jsonl(spark, str(p)).collect()}

    r = rows["3_500_G_C"]
    effects = {e["method"]: e for e in r["variantEffect"]}
    # CADD comes from the HIGHEST-scoring transcript (non-canonical, 25.0)
    assert effects["CADD"]["score"] == pytest.approx(25.0)
    assert effects["CADD"]["targetId"] == "ENSG0010"
    assert effects["PolyPhen"]["assessment"] == "probably_damaging"
    assert effects["SIFT"]["score"] == pytest.approx(0.01)
    assert effects["LOFTEE"]["assessment"] == "HC"
    assert effects["GERP"]["score"] == pytest.approx(4.9)
    assert effects["VEP"]["assessment"] == "missense_variant"
    assert r["hgvsId"] == "3:g.500G>C"
    reg = r["regulatoryFeatureConsequences"]
    assert len(reg) == 1 and reg[0]["regulatoryFeatureId"] == "ENSR0001"
    assert reg[0]["biotype"] == "promoter"

    r2 = rows["4_900_T_A"]
    effects2 = {e["method"]: e for e in r2["variantEffect"]}
    # intergenic fallback: CADD + GERP from the intergenic block, VEP
    # prediction from the input's own most_severe_consequence
    assert effects2["CADD"]["score"] == pytest.approx(1.2)
    assert effects2["GERP"]["score"] == pytest.approx(-0.3)
    assert "PolyPhen" not in effects2
    assert effects2["VEP"]["assessment"] == "intergenic_variant"
    assert r2["mostSevereConsequence"] == "intergenic_variant"
    assert r2["hgvsId"] == "4:g.900T>A"
