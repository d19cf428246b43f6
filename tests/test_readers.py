"""Reader tests over synthetic raw files (GWAS-Catalog old/new formats,
FinnGen, intervals)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.sources.readers import (
    flip_allele,
    neglog_pvalue_to_mantissa_and_exponent,
    parse_pvalue_string,
    read_finngen_sumstats,
    read_gwas_catalog_sumstats,
    read_intervals_bed,
    variant_type,
)

NEW_FORMAT = """hm_chrom\thm_pos\thm_other_allele\thm_effect_allele\tp_value\thm_beta\tstandard_error\teffect_allele_frequency\tn
1\t1000\tA\tG\t5e-8\t0.1\t0.01\t0.3\t50000
2\t2000\tC\tT\t1e-12\t-0.2\t0.02\t0.1\t50000
3\t\tA\tG\t1e-9\t0.3\t0.01\t0.2\t50000
4\t4000\tA\tG\t1e-9\t0\t0.01\t0.2\t50000
"""

OLD_FORMAT = """chromosome\tbase_pair_location\tother_allele\teffect_allele\tneg_log_10_p_value\todds_ratio
1\t1500\tA\tG\t7.5\t1.1
"""


def test_gwas_catalog_new_format(spark, tmp_path):
    p = tmp_path / "GCST123.tsv"
    p.write_text(NEW_FORMAT)
    df = read_gwas_catalog_sumstats(spark, str(p), "GCST123")
    rows = {r["variantId"]: r for r in df.collect()}
    # row 3 dropped (no position), row 4 dropped (zero beta)
    assert set(rows) == {"1_1000_A_G", "2_2000_C_T"}
    r = rows["1_1000_A_G"]
    assert (r["pValueMantissa"], r["pValueExponent"]) == (5.0, -8)
    assert r["beta"] == 0.1 and r["standardError"] == 0.01
    assert r["studyId"] == "GCST123"


def test_gwas_catalog_old_format_or_to_beta(spark, tmp_path):
    import math

    p = tmp_path / "GCST999.tsv"
    p.write_text(OLD_FORMAT)
    r = read_gwas_catalog_sumstats(spark, str(p), "GCST999").collect()[0]
    # neglog 7.5 -> p = 10^-7.5 = 3.1623e-8
    assert r["pValueExponent"] == -8
    assert r["pValueMantissa"] == pytest.approx(3.1623, abs=1e-4)
    # odds ratio converted: beta = ln(1.1), SE dropped (no native beta)
    assert r["beta"] == pytest.approx(math.log(1.1))
    assert r["standardError"] is None


FINNGEN = (
    "#chrom\tpos\tref\talt\trsids\tnearest_genes\tpval\tmlogp\tbeta\tsebeta\taf_alt\taf_alt_cases\taf_alt_controls\n"
    "1\t5000\tA\tT\trs1\tGENE1\t2.5e-10\t9.6\t0.25\t0.04\t0.35\t0.36\t0.34\n"
    "X\tbadpos\tA\tT\trs2\tGENE2\t0.5\t0.3\t0.1\t0.04\t0.35\t0.36\t0.34\n"
)


def test_finngen_reader(spark, tmp_path):
    p = tmp_path / "FINNGEN_R9_AB1.tsv"
    p.write_text(FINNGEN)
    rows = read_finngen_sumstats(spark, str(p)).collect()
    assert len(rows) == 1  # bad position row dropped
    r = rows[0]
    assert r["studyId"] == "FINNGEN_R9_AB1"
    assert r["variantId"] == "1_5000_A_T"
    assert (r["pValueMantissa"], r["pValueExponent"]) == (pytest.approx(2.5), -10)
    assert r["standardError"] == 0.04


INTERVALS = "chrom\tstart\tend\tgene_id\tscore\nchr1\t100\t500\tENSG0001\t0.8\nchrZ\tnot_an_int\t\t\t\n"


def test_intervals_reader_drops_malformed(spark, tmp_path):
    p = tmp_path / "intervals.tsv"
    p.write_text(INTERVALS)
    rows = read_intervals_bed(spark, str(p), "andersson").collect()
    assert len(rows) == 1
    assert rows[0]["chromosome"] == "1"
    assert rows[0]["geneId"] == "ENSG0001"
    assert rows[0]["datasourceId"] == "andersson"


def test_parse_pvalue_string(spark):
    df = spark.createDataFrame(
        [("5e-8",), ("0.001",), ("5.3E-320",), ("0.5",)], ["p"]
    )
    rows = df.select(*parse_pvalue_string(F.col("p"))).collect()
    assert (rows[0][0], rows[0][1]) == (5.0, -8)
    assert (rows[1][0], rows[1][1]) == (1.0, -3)
    assert (rows[2][0], rows[2][1]) == (pytest.approx(5.3), -320)  # sub-normal survives
    assert (rows[3][0], rows[3][1]) == (5.0, -1)


def test_neglog_decompose(spark):
    df = spark.createDataFrame([(7.5,), (8.0,), (320.3,)], ["nl"])
    rows = df.select(*neglog_pvalue_to_mantissa_and_exponent(F.col("nl"))).collect()
    assert rows[0][1] == -8 and rows[0][0] == pytest.approx(3.1623, abs=1e-4)
    assert rows[1][1] == -8 and rows[1][0] == pytest.approx(1.0)
    assert rows[2][1] == -321 and rows[2][0] == pytest.approx(5.0119, abs=1e-4)


def test_variant_type_and_flip(spark):
    df = spark.createDataFrame(
        [("A", "T"), ("A", "G"), ("AT", "A")], ["ref", "alt"]
    )
    out = df.select(
        variant_type(F.col("ref"), F.col("alt")).alias("vt"),
        flip_allele(F.col("ref")).alias("flipped"),
    ).collect()
    assert [r["vt"] for r in out] == ["snp_c", "snp_n", "indel"]
    assert out[2]["flipped"] == "AT"[::-1].translate(str.maketrans("ACGT", "TGCA"))


def test_neglog_pvalue_to_mantissa_and_exponent(spark):
    from genetics_spark_coloc_spark.functions.pvalue import (
        neglog_pvalue_to_mantissa_and_exponent,
    )

    rows = (
        spark.createDataFrame([(4.56,), (2109.23,)], "nlp: double")
        .select(*neglog_pvalue_to_mantissa_and_exponent(F.col("nlp")))
        .collect()
    )
    # reference doctest values (spark_helpers.py:266-276)
    assert rows[0]["pValueMantissa"] == pytest.approx(2.7542286, abs=1e-6)
    assert rows[0]["pValueExponent"] == -5
    assert rows[1]["pValueMantissa"] == pytest.approx(5.8884363, abs=1e-6)
    assert rows[1]["pValueExponent"] == -2110


def test_read_ukb_ppp_sumstats(spark):
    from genetics_spark_coloc_spark.operators.harmonise import (
        annotation_both_orientations,
    )
    from genetics_spark_coloc_spark.sources.readers import read_ukb_ppp_sumstats

    raw = spark.createDataFrame(
        [
            # direct orientation
            ("S1", "1", 100, "A", "G", 0.4, 0.99, 0.5, 0.1, 7.0, 1000),
            # flipped orientation (canonical is G/A at 200)
            ("S1", "1", 200, "A", "G", 0.3, 0.99, -0.2, 0.1, 4.56, 1000),
        ],
        "studyId: string, chromosome: string, GENPOS: int, ALLELE0: string, "
        "ALLELE1: string, A1FREQ: double, INFO: double, BETA: double, SE: double, "
        "LOG10P: double, N: int",
    )
    canonical = spark.createDataFrame(
        [("1_100_A_G", "1", 100, "A", "G"), ("1_200_G_A", "1", 200, "G", "A")],
        "variantId: string, chromosome: string, position: int, "
        "refAllele: string, altAllele: string",
    )
    out = {
        r["variantId"]: r
        for r in read_ukb_ppp_sumstats(
            raw, annotation_both_orientations(canonical)
        ).collect()
    }
    assert out["1_100_A_G"]["beta"] == pytest.approx(0.5)
    # orientation flip negates beta
    assert out["1_200_G_A"]["beta"] == pytest.approx(0.2)
    assert out["1_200_G_A"]["pValueExponent"] == -5
    assert out["1_200_G_A"]["sampleSize"] == 1000


def test_harmonise_association_effect_to_beta(spark):
    from genetics_spark_coloc_spark.sources.gwas_catalog_assoc import (
        harmonise_association_effect_to_beta,
    )

    # the reference's own doctest table (associations.py:1014-1029)
    data = [
        ("rs123-T", "A", "T", 0.1, "[0.08-0.12] unit increase"),  # palindromic
        ("rs123-C", "G", "T", 0.1, "[0.08-0.12] unit increase"),  # beta flipped
        ("rs123-T", "C", "T", 0.1, "[0.08-0.12] unit increase"),  # beta kept
        ("rs123-T", "C", "T", 0.1, "[0.08-0.12]"),                # odds ratio
        ("rs123-C", "G", "T", 0.1, "[0.08-0.12]"),                # OR flipped
    ]
    df = spark.createDataFrame(
        data,
        "`STRONGEST SNP-RISK ALLELE`: string, referenceAllele: string, "
        "alternateAllele: string, `OR or BETA`: double, `95% CI (TEXT)`: string",
    )
    rows = harmonise_association_effect_to_beta(df).collect()
    betas = [r["beta"] for r in rows]
    ses = [r["standardError"] for r in rows]
    assert betas[0] is None and ses[0] is None
    assert betas[1] == pytest.approx(-0.1)
    assert ses[1] == pytest.approx(0.0102040814, abs=1e-6)
    assert betas[2] == pytest.approx(0.1)
    assert betas[3] == pytest.approx(-2.3025850929940455)  # ln(0.1)
    assert ses[3] is None
    assert betas[4] == pytest.approx(2.302585092994046)    # ln(1/0.1)


def test_gwas_assoc_qc_and_pvalue_helpers(spark):
    from genetics_spark_coloc_spark.sources.gwas_catalog_assoc import (
        convert_gnomad_position_to_ensembl,
        normalise_pvalue_text,
        parse_gwas_pvalue,
        qc_association_all,
    )

    # position conversion doctest (associations.py:52-62)
    pos = spark.createDataFrame(
        [(1, "A", "C"), (2, "AA", "C"), (3, "A", "AA")], ["p", "r", "a"]
    ).select(
        convert_gnomad_position_to_ensembl(
            F.col("p"), F.col("r"), F.col("a")
        ).alias("np")
    ).collect()
    assert [r["np"] for r in pos] == [1, 3, 4]

    # p-value parsing doctest (associations.py:80-92)
    pv = spark.createDataFrame(
        [("1.0",), ("0.5",), ("1E-20",), ("3E-3",)], ["v"]
    ).select(*parse_gwas_pvalue(F.col("v"))).collect()
    assert [(r[0], r[1]) for r in pv] == [(1.0, 1), (0.5, 1), (1.0, -20), (3.0, -3)]

    # pValueText normalisation doctest subset (associations.py:115-127)
    txt = spark.createDataFrame(
        [("European Ancestry",), ("African ancestry",), ("(progression)",), (None,)],
        "t: string",
    ).select(normalise_pvalue_text(F.col("t")).alias("n")).collect()
    assert txt[0]["n"] == ["EA"] and txt[1]["n"] == ["AA"]
    assert txt[2]["n"] is None and txt[3]["n"] is None

    # QC flag family over a mixed row set
    df = spark.createDataFrame(
        [
            # clean significant association
            ("1", "1000", "C", "T", "rs1-T", 1.0, -9),
            # composite + subsignificant
            ("1", "1000", "C", "T", "rs1-T; rs2-A", 2.0, -3),
            # missing location + palindromic + unmapped
            (None, None, "A", None, "rs3-A", 1.0, -9),
        ],
        "chromosome: string, position: string, ref: string, alt: string, "
        "risk: string, mant: double, expo: int",
    )
    rows = df.select(
        qc_association_all(
            F.lit(None).cast("array<string>"),
            F.col("chromosome"),
            F.col("position"),
            F.col("ref"),
            F.col("alt"),
            F.col("risk"),
            F.col("mant"),
            F.col("expo"),
            5e-8,
        ).alias("qc")
    ).collect()
    assert rows[0]["qc"] == []
    # composite rows also trip the arity-inconsistency check
    # (1 chromosome vs 2 risk alleles), as in the reference
    assert sorted(rows[1]["qc"]) == [
        "Composite association",
        "Subsignificant p-value",
        "Variant inconsistency",
    ]
    assert sorted(rows[2]["qc"]) == [
        "Incomplete genomic mapping",
        "No mapping in GnomAd",
    ]


def test_gnomad_variant_mapping(spark):
    from genetics_spark_coloc_spark.sources.gwas_catalog_assoc import (
        check_concordance,
        compare_rsids,
        flag_mappings_to_retain,
        map_variants_to_gnomad_variants,
    )

    # doctest tables (associations.py:313-336, 360-386, 416-436)
    rs = spark.createDataFrame(
        [(1, ["rs123", "rs523"], ["rs123"]), (2, [], ["rs123"]),
         (3, ["rs123", "rs523"], []), (4, [], [])],
        ["id", "gnomad", "gwas"],
    ).select(compare_rsids(F.col("gnomad"), F.col("gwas")).alias("m")).collect()
    assert [r["m"] for r in rs] == [True, False, False, False]

    fl = spark.createDataFrame(
        [(1, False), (1, False), (2, False), (2, True), (3, True), (3, True)],
        ["id", "filter"],
    ).select(
        "id", "filter",
        flag_mappings_to_retain(F.col("id"), F.col("filter")).alias("keep"),
    ).collect()
    keep = {(r["id"], r["filter"]): r["keep"] for r in fl}
    assert keep[(1, False)] is True      # no sibling passes -> keep all
    assert keep[(2, False)] is False     # a sibling passes -> drop failures
    assert keep[(2, True)] is True
    assert keep[(3, True)] is True

    cc = spark.createDataFrame(
        [("A", "A", "G"), ("A", "T", "G"), ("A", "C", "G"),
         ("A", "A", "?"), (None, None, "A")],
        ["risk", "ref", "alt"],
    ).select(
        check_concordance(F.col("risk"), F.col("ref"), F.col("alt")).alias("c")
    ).collect()
    assert [r["c"] for r in cc] == [True, True, False, True, True]

    # end-to-end: two candidates at one position; the sibling with
    # mismatched rsIDs AND discordant alleles is dropped (either
    # retain-filter alone would keep it, per the reference's OR)
    assoc = spark.createDataFrame(
        [("r1", "1", "100", "rs111", "111", "rs111-A")],
        "rowId: string, CHR_ID: string, CHR_POS: string, SNPS: string, "
        "`SNP_ID_CURRENT`: string, `STRONGEST SNP-RISK ALLELE`: string",
    )
    vi = spark.createDataFrame(
        [
            ("1_100_A_G", "1", 100, "A", "G", ["rs111"],
             [{"populationName": "nfe", "alleleFrequency": 0.3}]),
            # risk allele A is discordant with C/G on both strands
            ("1_100_C_G", "1", 100, "C", "G", ["rs999"],
             [{"populationName": "nfe", "alleleFrequency": 0.4}]),
        ],
        "variantId: string, chromosome: string, position: int, "
        "referenceAllele: string, alternateAllele: string, rsIds: array<string>, "
        "alleleFrequencies: array<struct<populationName: string, alleleFrequency: double>>",
    )
    out = map_variants_to_gnomad_variants(assoc, vi).collect()
    assert len(out) == 1 and out[0]["variantId"] == "1_100_A_G"
