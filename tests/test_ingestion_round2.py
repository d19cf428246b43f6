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


# ---------------------------------------------- GWAS-Catalog study index

from genetics_spark_coloc_spark.sources.gwas_catalog_study_index import (  # noqa: E402
    QC_NO_OT_CURATION,
    annotate_ancestries,
    annotate_discovery_sample_sizes,
    annotate_from_study_curation,
    extract_studies_for_curation,
    parse_cohorts,
    parse_discovery_samples,
    parse_efos,
    parse_gwas_catalog_study_id,
)


def test_parse_discovery_samples_even_split(spark):
    """Reference doctest (study_index.py:52-72): compound counts split
    evenly, truncated, summed per label, first-appearance order."""
    df = spark.createDataFrame(
        [
            ("s1", [("European", 10), ("African", 10)]),
            ("s2", [("European, African, Asian", 100), ("European", 50)]),
        ],
        "studyId string, discoverySampleSize array<struct<ancestry string, sampleSize int>>",
    )
    rows = {
        r["studyId"]: [(s["ancestry"], s["sampleSize"]) for s in r["parsed"]]
        for r in df.select(
            "studyId",
            parse_discovery_samples(F.col("discoverySampleSize")).alias("parsed"),
        ).collect()
    }
    assert rows["s1"] == [("European", 10), ("African", 10)]
    assert rows["s2"] == [("European", 83), ("African", 33), ("Asian", 33)]


def test_parse_discovery_samples_parenthesised_label_not_split(spark):
    df = spark.createDataFrame(
        [("s1", [("Other (Lacandon, Mexico)", 30)])],
        "studyId string, discoverySampleSize array<struct<ancestry string, sampleSize int>>",
    )
    parsed = df.select(
        parse_discovery_samples(F.col("discoverySampleSize")).alias("p")
    ).collect()[0]["p"]
    assert [(s["ancestry"], s["sampleSize"]) for s in parsed] == [
        ("Other (Lacandon, Mexico)", 30)
    ]


def test_parse_cohorts(spark):
    df = spark.createDataFrame(
        [("BioME|CaPS|GERA|GERA",), (None,), ("",)], ["cohorts"]
    )
    rows = df.select(parse_cohorts(F.col("cohorts")).alias("c")).collect()
    assert rows[0]["c"] == ["BioME", "CaPS", "GERA"]
    assert rows[1]["c"] is None
    assert rows[2]["c"] is None


def test_annotate_discovery_sample_sizes_thousands_separators(spark):
    studies = spark.createDataFrame(
        [
            ("GCST1", "1,000 European cases, 2,500 European controls"),
            ("GCST2", "12 individuals"),
            ("GCST3", None),
        ],
        ["studyId", "initialSampleSize"],
    )
    rows = {
        r["studyId"]: r
        for r in annotate_discovery_sample_sizes(studies).collect()
    }
    assert (rows["GCST1"]["nCases"], rows["GCST1"]["nControls"], rows["GCST1"]["nSamples"]) == (1000, 2500, 3500)
    assert (rows["GCST2"]["nCases"], rows["GCST2"]["nControls"], rows["GCST2"]["nSamples"]) == (0, 0, 12)
    assert rows["GCST3"]["nSamples"] is None


def test_annotate_ancestries_pivots_stages(spark):
    studies = spark.createDataFrame([("GCST1",), ("GCST2",)], ["studyId"])
    lut = spark.createDataFrame(
        [
            ("GCST1", "initial", "European", 100),
            ("GCST1", "initial", "African", 50),
            ("GCST1", "replication", "European", 30),
        ],
        ["studyId", "stage", "broadAncestralCategory", "numberOfIndividuals"],
    )
    rows = {r["studyId"]: r for r in annotate_ancestries(studies, lut).collect()}
    disc = sorted(
        (s["ancestry"], s["sampleSize"]) for s in rows["GCST1"]["discoverySamples"]
    )
    assert disc == [("African", 50), ("European", 100)]
    assert [
        (s["ancestry"], s["sampleSize"]) for s in rows["GCST1"]["replicationSamples"]
    ] == [("European", 30)]
    assert rows["GCST1"]["ldPopulationStructure"] is not None
    assert rows["GCST2"]["discoverySamples"] is None


def test_study_curation_roundtrip(spark):
    studies = spark.createDataFrame(
        [
            ("GCST1", "gwas", True, "123", "Title1", "trait1"),
            ("GCST2", "gwas", True, "456", "Title2", "trait2"),
            ("GCST3", "gwas", False, "789", "Title3", "trait3"),
        ],
        ["studyId", "studyType", "hasSumstats", "pubmedId", "publicationTitle", "traitFromSource"],
    )
    curation = spark.createDataFrame(
        [("GCST1", "eqtl", ["flagA"])],
        "studyId string, studyType string, analysisFlags array<string>",
    )
    annotated = {r["studyId"]: r for r in annotate_from_study_curation(studies, curation).collect()}
    assert annotated["GCST1"]["studyType"] == "eqtl"
    assert annotated["GCST1"]["analysisFlags"] == ["flagA"]
    assert QC_NO_OT_CURATION not in annotated["GCST1"]["qualityControls"]
    assert annotated["GCST2"]["studyType"] == "gwas"
    assert QC_NO_OT_CURATION in annotated["GCST2"]["qualityControls"]

    extracted = {
        r["studyId"]: r
        for r in extract_studies_for_curation(studies, None).collect()
    }
    assert set(extracted) == {"GCST1", "GCST2"}  # sumstats studies only
    assert extracted["GCST1"]["isCurated"] == "false"


def test_parse_gwas_catalog_study_id_and_efos(spark):
    df = spark.createDataFrame(
        [
            ("./GCST90086001-GCST90087000/GCST90086758/harmonised/x.h.tsv.gz",),
            ("gs://bucket/harmonised/GCST000568.parquet/",),
            (None,),
        ],
        ["path"],
    )
    rows = df.select(parse_gwas_catalog_study_id(F.col("path")).alias("acc")).collect()
    assert [r["acc"] for r in rows] == ["GCST90086758", "GCST000568", None]

    efo = spark.createDataFrame(
        [("http://www.ebi.ac.uk/efo/EFO_0007937, http://purl.obolibrary.org/obo/MONDO_0005148",), (None,)],
        ["uri"],
    )
    out = efo.select(parse_efos(F.col("uri")).alias("ids")).collect()
    assert out[0]["ids"] == ["EFO_0007937", "MONDO_0005148"]
    assert out[1]["ids"] is None


# ------------------------------------------------ Open-Targets exports

from genetics_spark_coloc_spark.sources.open_targets import (  # noqa: E402
    lof_curation_to_variant_index,
    map_rsids_to_variant_ids,
    variants_to_vcf,
)


def test_variants_to_vcf_unions_locus_and_filters(spark):
    variants = spark.createDataFrame(
        [
            ("1_100_A_G", "rs1", [{"variantId": "2_200_G_C"}]),
            ("1_300_A_N", None, None),  # non-ACGT alt filtered out
            (None, "rs2", [{"variantId": "9_900_T_A"}]),  # null id dropped entirely
        ],
        "variantId string, variantRsId string, locus array<struct<variantId string>>",
    )
    rows = {(r["#CHROM"], r["POS"]): r for r in variants_to_vcf(variants).collect()}
    assert set(rows) == {("1", 100), ("2", 200)}
    assert rows[("1", 100)]["ID"] == "rs1"
    assert rows[("2", 200)]["ID"] == "rs1"  # inherits row rsId
    assert rows[("1", 100)]["REF"] == "A" and rows[("1", 100)]["ALT"] == "G"


def test_map_rsids_backfills_null_variant_ids(spark):
    variants = spark.createDataFrame(
        [(None, "rs1"), ("1_5_A_G", "rs2")], ["variantId", "variantRsId"]
    )
    mapping = spark.createDataFrame(
        [("rs1", ["3_30_T_C"])], "variantRsId string, mappedVariantIds array<string>"
    )
    out = {r["variantRsId"]: r["variantId"] for r in map_rsids_to_variant_ids(variants, mapping).collect()}
    assert out == {"rs1": "3_30_T_C", "rs2": "1_5_A_G"}


def test_lof_curation_verdict_scores(spark):
    lof = spark.createDataFrame(
        [("1-100-A-G", "1-110-A-G", "lof"), ("2-200-C-T", "2-210-C-T", "not_lof")],
        ["variantIdGrch37", "variantIdGrch38", "verdict"],
    )
    rows = {r["variantId"]: r for r in lof_curation_to_variant_index(lof).collect()}
    assert set(rows) == {"1_110_A_G", "2_210_C_T"}
    eff = rows["1_110_A_G"]["variantEffect"][0]
    assert eff["method"] == "LossOfFunctionCuration"
    assert eff["normalisedScore"] == 1.0
    assert rows["2_210_C_T"]["variantEffect"][0]["normalisedScore"] == -1.0
    assert rows["1_110_A_G"]["variantDescription"].startswith("Assessed to cause LoF")


# ---------------------------------------------------- ontology closure

import pytest  # noqa: E402

from genetics_spark_coloc_spark.operators.ontology import (  # noqa: E402
    build_biosample_index,
    transitive_closure,
)


def test_transitive_closure_diamond_dag(spark):
    edges = spark.createDataFrame(
        [("d", "b"), ("d", "c"), ("b", "a"), ("c", "a")], ["subject", "object"]
    )
    pairs = {
        (r["node"], r["dest"]) for r in transitive_closure(edges).collect()
    }
    assert pairs == {("d", "b"), ("d", "c"), ("b", "a"), ("c", "a"), ("d", "a")}


def test_transitive_closure_deep_chain_log_rounds(spark):
    # depth-40 chain converges within 20 doubling rounds (2^20 >> 40)
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(40)], ["subject", "object"]
    )
    closure = transitive_closure(edges)
    assert closure.count() == 40 * 41 // 2


def test_transitive_closure_cycle_raises(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["subject", "object"])
    # a 2-cycle converges (closure is finite: a->b, b->a, a->a, b->b)
    pairs = {(r["node"], r["dest"]) for r in transitive_closure(edges).collect()}
    assert pairs == {("a", "b"), ("b", "a"), ("a", "a"), ("b", "b")}


def test_build_biosample_index(spark):
    nodes = spark.createDataFrame(
        [("a", "root", None), ("b", "mid", "desc-b"), ("c", "leaf", None)],
        ["biosampleId", "biosampleName", "description"],
    )
    edges = spark.createDataFrame([("c", "b"), ("b", "a")], ["subject", "object"])
    rows = {r["biosampleId"]: r for r in build_biosample_index(nodes, edges).collect()}
    assert rows["c"]["ancestors"] == ["a", "b"]
    assert rows["c"]["descendants"] is None
    assert rows["a"]["ancestors"] is None
    assert rows["a"]["descendants"] == ["b", "c"]
    assert rows["b"]["ancestors"] == ["a"] and rows["b"]["descendants"] == ["c"]


# ------------------------------------------------ L2G prediction surface

from genetics_spark_coloc_spark.operators.l2g import (  # noqa: E402
    add_prediction_features,
    explain_predictions,
    predict_l2g,
    to_disease_target_evidence,
    train_l2g_model,
)


def test_to_disease_target_evidence(spark):
    predictions = spark.createDataFrame(
        [("L1", "G1", 0.8), ("L2", "G2", 0.01)],  # L2 below threshold
        ["studyLocusId", "geneId", "score"],
    )
    study_locus = spark.createDataFrame(
        [("L1", "S1"), ("L2", "S2")], ["studyLocusId", "studyId"]
    )
    study_index = spark.createDataFrame(
        [("S1", ["EFO_1", "EFO_2"]), ("S2", ["EFO_3"])],
        "studyId string, diseaseIds array<string>",
    )
    rows = to_disease_target_evidence(
        predictions, study_locus, study_index
    ).collect()
    assert len(rows) == 2  # one per disease of L1 only
    assert {r["diseaseFromSourceMappedId"] for r in rows} == {"EFO_1", "EFO_2"}
    assert all(r["targetFromSourceId"] == "G1" for r in rows)
    assert all(r["datasourceId"] == "gwas_credible_sets" for r in rows)


def test_add_features_and_occlusion_explain(spark):
    fm = spark.createDataFrame(
        [
            ("L1", "G1", 0.9, 0.8, 1),
            ("L1", "G2", 0.1, 0.0, 0),
            ("L2", "G3", 0.85, 0.9, 1),
            ("L2", "G4", 0.05, 0.1, 0),
        ],
        ["studyLocusId", "geneId", "fA", "fB", "goldStandardSet"],
    )
    model = train_l2g_model(fm, feature_names=["fA", "fB"], max_iter=5)
    preds = predict_l2g(model, fm).withColumnRenamed("l2gScore", "score")

    annotated = add_prediction_features(preds, fm, ["fA", "fB"]).collect()
    by_key = {(r["studyLocusId"], r["geneId"]): r for r in annotated}
    feats = {s["name"]: s["value"] for s in by_key[("L1", "G1")]["features"]}
    assert feats == {"fA": 0.9, "fB": 0.8}

    explained = explain_predictions(model, fm, ["fA", "fB"]).collect()
    row = {(r["studyLocusId"], r["geneId"]): r for r in explained}[("L1", "G1")]
    contribs = {s["name"]: s["contribution"] for s in row["features"]}
    # occluding the dominant feature fA must reduce the score
    assert contribs["fA"] > 0
    assert abs(row["baseScore"]) <= 1.0


# -------------------------------------------- per-project study indexes

from genetics_spark_coloc_spark.sources.open_targets import (  # noqa: E402
    foldx_to_amino_acid_variants,
)
from genetics_spark_coloc_spark.sources.study_indexes import (  # noqa: E402
    finngen_study_index,
    identify_qtl_study_type,
    join_efo_mapping,
    process_eqtl_sumstats,
    ukbiobank_study_index,
)


def test_identify_qtl_study_type(spark):
    df = spark.createDataFrame(
        [("ge", "bulk"), ("leafcutter", "bulk"), ("tx", "single-cell"), ("aptamer", "bulk")],
        ["quant_method", "study_type"],
    )
    rows = df.select(
        identify_qtl_study_type(F.col("quant_method"), F.col("study_type")).alias("t")
    ).collect()
    assert [r["t"] for r in rows] == ["eqtl", "sqtl", "sceqtl", "pqtl"]


def test_finngen_study_index_counts(spark):
    pheno = spark.createDataFrame(
        [("E4_DM2", "Type 2 diabetes", 50000, 250000)],
        ["phenocode", "phenostring", "num_cases", "num_controls"],
    )
    row = finngen_study_index(pheno, "FINNGEN_R11", sample_size=500348).collect()[0]
    assert row["studyId"] == "FINNGEN_R11_E4_DM2"
    assert (row["nCases"], row["nControls"], row["nSamples"]) == (50000, 250000, 300000)
    assert row["discoverySamples"][0]["ancestry"] == "Finnish"
    assert row["ldPopulationStructure"][0]["ldPopulation"] == "fin"
    assert row["ldPopulationStructure"][0]["relativeSampleSize"] == 1.0


def test_join_efo_mapping_preserves_unmapped_studies(spark):
    studies = spark.createDataFrame(
        [("FINNGEN_R11_A", "asthma"), ("FINNGEN_R11_B", "unmapped trait")],
        ["studyId", "traitFromSource"],
    )
    efo = spark.createDataFrame(
        [
            ("FinnGen r11", "asthma", "http://purl.obolibrary.org/obo/EFO_0000270"),
            ("FinnGen r11", "asthma", "http://purl.obolibrary.org/obo/MONDO_0004979"),
            ("FinnGen r5", "asthma", "http://x/EFO_SHOULD_NOT_APPEAR"),
            ("GWAS catalog", "asthma", "http://x/EFO_ALSO_NOT"),
        ],
        ["STUDY", "PROPERTY_VALUE", "SEMANTIC_TAG"],
    )
    rows = {r["studyId"]: r for r in join_efo_mapping(studies, efo, "R11").collect()}
    assert rows["FINNGEN_R11_A"]["traitFromSourceMappedIds"] == [
        "EFO_0000270",
        "MONDO_0004979",
    ]
    assert rows["FINNGEN_R11_B"]["traitFromSourceMappedIds"] == []


def test_ukbiobank_trait_formatting_multiword(spark):
    manifest = spark.createDataFrame(
        [
            ("SAIGE_123", "cancer: breast carcinoma", 1000, 100, "p1"),
            ("NEALE2_456", "Standing height", 2000, 0, "p2"),
        ],
        ["code", "trait", "n_total", "n_cases", "in_path"],
    )
    rows = {r["studyId"]: r for r in ukbiobank_study_index(manifest).collect()}
    assert rows["SAIGE_123"]["traitFromSource"] == "Breast Carcinoma | cancer"
    assert rows["SAIGE_123"]["pubmedId"] == "30104761"
    assert rows["SAIGE_123"]["publicationDate"] == "2018-10-24"
    assert rows["NEALE2_456"]["traitFromSource"] == "Standing height"
    assert rows["NEALE2_456"]["pubmedId"] is None
    assert rows["NEALE2_456"]["publicationDate"] == "2018-08-01"


def test_process_eqtl_sumstats_drops(spark):
    raw = spark.createDataFrame(
        [
            ("P", "g", "ENSG1", "1", "100", "A", "G", "1e-5", 0.5, 0.1, 0.2),
            ("P", "g", "ENSG1", "1", None, "A", "G", "1e-5", 0.5, 0.1, 0.2),  # no pos
            ("P", "g", "ENSG1", "1", "200", "A", "G", "1e-5", 0.0, 0.1, 0.2),  # beta 0
        ],
        ["project_id", "qtl_group", "gene_id", "chromosome", "position",
         "ref", "alt", "pvalue", "beta", "se", "maf"],
    )
    rows = process_eqtl_sumstats(raw).collect()
    assert len(rows) == 1
    assert rows[0]["studyId"] == "P_g_ENSG1"
    assert rows[0]["variantId"] == "1_100_A_G"


def test_foldx_ingestion_ambiguous_protein_dropped(spark):
    foldx = spark.createDataFrame(
        [
            # P1: unambiguous, confident
            ("P1", "42", "A", "G", 0.9, 1.5),
            ("P1", "42", "A", "T", 0.9, -2.5),
            # P2: same (position, wild_type) with two distinct plddts → ambiguous
            ("P2", "7", "L", "P", 0.95, 0.3),
            ("P2", "7", "L", "V", 0.85, 0.4),
            # P3: low confidence only
            ("P3", "9", "K", "R", 0.5, 1.0),
        ],
        ["protein_acc", "position", "wild_type", "mutated_type", "plddt", "foldx_ddg"],
    )
    rows = foldx_to_amino_acid_variants(foldx, plddt_threshold=0.7).collect()
    by_key = {(r["uniprotAccession"], r["aminoAcidChange"]): r for r in rows}
    assert set(by_key) == {("P1", "A42G"), ("P1", "A42T")}
    eff = by_key[("P1", "A42G")]["variantEffect"][0]
    assert eff["method"] == "FoldX"
    # |ddg| 1.5 < 2 → rescaled 1.5/2
    assert abs(eff["normalisedScore"] - 0.75) < 1e-9
    assert by_key[("P1", "A42T")]["variantEffect"][0]["normalisedScore"] == 1.0


# ---------------------------------------------- eQTL-Catalogue SuSiE

from genetics_spark_coloc_spark.sources.eqtl_finemapping import (  # noqa: E402
    clean_strings_from_symbols,
    eqtl_susie_to_study_locus,
    extract_credible_set_index,
    extract_dataset_id_from_file_path,
    parse_eqtl_susie_results,
)


def test_eqtl_helpers(spark):
    df = spark.createDataFrame(
        [("QTD000046_L2", "QTD000046.credible_sets.tsv", "AbCd-12.2")],
        ["cs_id", "path", "s"],
    )
    row = df.select(
        extract_credible_set_index(F.col("cs_id")).alias("idx"),
        extract_dataset_id_from_file_path(F.col("path")).alias("ds"),
        clean_strings_from_symbols(F.col("s")).alias("clean"),
    ).collect()[0]
    assert row["idx"] == 2
    assert row["ds"] == "QTD000046"
    assert row["clean"] == "abcd-12_2"


def test_eqtl_susie_roundtrip(spark):
    def lbf_row(variant, pos, lbfs):
        base = {
            "molecular_trait_id": "ENSG1", "region": "1:1-1000",
            "variant": variant, "dataset_id": "QTD000001",
            "chromosome": "1", "position": pos,
        }
        for i in range(1, 11):
            base[f"lbf_variable{i}"] = lbfs[i - 1] if i <= len(lbfs) else 0.0
        return base

    lbf = spark.createDataFrame([
        lbf_row("chr1_100_A_G", 100, [1.0, 5.0]),
        lbf_row("chr1_200_A_G", 200, [1.0, 3.0]),
    ])
    cs = spark.createDataFrame(
        [
            ("QTD000001", "ENSG1", "1:1-1000", "chr1_100_A_G", "ENSG1", 2, 0.7, 1e-9, 0.5, 0.1),
            ("QTD000001", "ENSG1", "1:1-1000", "chr1_200_A_G", "ENSG1", 2, 0.3, 1e-7, 0.4, 0.1),
        ],
        ["dataset_id", "molecular_trait_id", "region", "variant", "gene_id",
         "credibleSetIndex", "pip", "pvalue", "beta", "se"],
    )
    meta = spark.createDataFrame(
        [("QTD000001", "GTEx", "ge", "adipose", "UBERON_1", "bulk", 500)],
        ["dataset_id", "study_label", "quant_method", "sample_group",
         "tissue_id", "study_type", "sample_size"],
    )
    out = eqtl_susie_to_study_locus(parse_eqtl_susie_results(cs, lbf, meta)).collect()
    assert len(out) == 1
    row = out[0]
    assert row["studyId"] == "gtex_ge_adipose_ensg1"
    assert row["studyType"] == "eqtl"
    assert row["variantId"] == "1_100_A_G"  # max PIP lead
    assert [t["logBF"] for t in row["locus"]] == [5.0, 3.0]
    import math
    expected = (5.0 + math.log(1 + math.exp(-2.0))) * 0.43429448190325176
    assert abs(row["credibleSetlog10BF"] - expected) < 1e-9


# ------------------------------------------------------- Pan-UKBB LD

from genetics_spark_coloc_spark.sources.pan_ukbb import (  # noqa: E402
    align_ld_index_alleles,
    symmetrise_ld_entries,
)


def test_align_ld_index_alleles_flip_and_drop(spark):
    ukbb = spark.createDataFrame(
        [
            ("1", 100, "A", "G", 0),  # direct match
            ("1", 200, "A", "G", 1),  # flipped in annotation
            ("1", 300, "A", "G", 2),  # annotation has C/T -> dropped
            ("1", 400, "A", "G", 3),  # no annotation -> kept as-is
        ],
        ["chromosome", "position", "referenceAllele", "alternateAllele", "idx"],
    )
    va = spark.createDataFrame(
        [("1", 100, "A", "G"), ("1", 200, "G", "A"), ("1", 300, "C", "T")],
        ["chromosome", "position", "referenceAllele", "alternateAllele"],
    )
    rows = {r["idx"]: r for r in align_ld_index_alleles(ukbb, va).collect()}
    assert set(rows) == {0, 1, 3}
    assert rows[0]["alleleOrder"] == 1 and rows[0]["variantId"] == "1_100_A_G"
    assert rows[1]["alleleOrder"] == -1 and rows[1]["variantId"] == "1_200_G_A"
    assert rows[3]["alleleOrder"] == 1 and rows[3]["variantId"] == "1_400_A_G"


def test_symmetrise_ld_entries_signs_and_diagonal(spark):
    half = spark.createDataFrame(
        [(0, 1, 0.8), (0, 2, 0.5), (1, 2, -0.2), (0, 0, 0.9)], ["i", "j", "r"]
    )
    orders = spark.createDataFrame(
        [(0, 1), (1, -1), (2, 1)], ["idx", "alleleOrder"]
    )
    entries = {(r["i"], r["j"]): r["r"] for r in symmetrise_ld_entries(half, orders).collect()}
    assert entries[(0, 0)] == 1.0 and entries[(1, 1)] == 1.0 and entries[(2, 2)] == 1.0
    assert entries[(0, 1)] == entries[(1, 0)] == pytest.approx(-0.8)
    assert entries[(0, 2)] == entries[(2, 0)] == pytest.approx(0.5)
    assert entries[(1, 2)] == entries[(2, 1)] == pytest.approx(0.2)
    assert len(entries) == 9


# ---------------------------------------------------- L2G trainer

from genetics_spark_coloc_spark.operators.l2g_trainer import (  # noqa: E402
    assign_group_fold,
    assign_group_split,
    cross_validate_l2g,
    evaluate_binary_predictions,
)


def test_group_split_keeps_groups_together(spark):
    df = spark.createDataFrame(
        [(f"T{i % 10}", f"G{i % 7}", i) for i in range(200)],
        ["trait", "gene", "rowId"],
    )
    split = assign_group_split(df, ["trait", "gene"], test_fraction=0.3)
    # every group is entirely train or entirely test
    per_group = split.groupBy("trait", "gene").agg(
        F.count_distinct("isTest").alias("n")
    )
    assert per_group.filter(F.col("n") > 1).count() == 0
    folded = assign_group_fold(df, ["trait", "gene"], n_splits=3)
    per_group_f = folded.groupBy("trait", "gene").agg(
        F.count_distinct("fold").alias("n")
    )
    assert per_group_f.filter(F.col("n") > 1).count() == 0
    assert folded.select("fold").distinct().count() <= 3


def test_evaluate_binary_predictions_auc_matches_sklearn_formula(spark):
    # perfect separation -> AUC 1; with one inversion AUC known
    scored = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.2, 0), (0.1, 0)],
        ["score", "label"],
    )
    m = evaluate_binary_predictions(scored).collect()[0]
    # positives ranks (asc): 6,5,3 -> sum 14; AUC = (14 - 3*4/2)/(3*3) = 8/9
    assert abs(m["areaUnderROC"] - 8 / 9) < 1e-9
    assert m["accuracy"] == 5 / 6  # score 0.6 pos predicted 1 ok; 0.7 neg predicted 1 wrong
    assert abs(m["precision"] - 3 / 4) < 1e-9
    assert m["recall"] == 1.0


def test_evaluate_auc_with_ties_uses_average_ranks(spark):
    scored = spark.createDataFrame(
        [(0.5, 1), (0.5, 0), (0.9, 1), (0.1, 0)], ["score", "label"]
    )
    m = evaluate_binary_predictions(scored).collect()[0]
    # asc ranks: 0.1->1, 0.5 tie -> avg 2.5 each, 0.9->4
    # positives sum = 2.5 + 4 = 6.5; AUC = (6.5 - 3)/(2*2) = 0.875
    assert abs(m["areaUnderROC"] - 0.875) < 1e-9


def test_cross_validate_l2g_runs_per_fold(spark):
    import random

    random.seed(7)
    rows = []
    for i in range(60):
        fa = random.random()
        rows.append(
            (f"L{i}", f"G{i % 12}", f"T{i % 9}", fa, fa * 0.5 + random.random() * 0.1,
             1 if fa > 0.5 else 0)
        )
    fm = spark.createDataFrame(
        rows, ["studyLocusId", "geneId", "trait", "fA", "fB", "goldStandardSet"]
    )
    out = cross_validate_l2g(
        fm, ["fA", "fB"], ["trait", "geneId"], n_splits=2, max_iter=3
    ).collect()
    assert 1 <= len(out) <= 2
    for r in out:
        assert 0.0 <= r["areaUnderROC"] <= 1.0


def test_parse_ot_curation_table(spark):
    from genetics_spark_coloc_spark.sources.gwas_catalog_study_index import (
        parse_ot_curation_table,
    )

    raw = spark.createDataFrame(
        [("GCST1", "gwas", "flagA|flagB", "true"), ("GCST2", None, None, "false")],
        ["studyId", "studyType", "analysisFlag", "isCurated"],
    )
    rows = {r["studyId"]: r for r in parse_ot_curation_table(raw).collect()}
    assert rows["GCST1"]["analysisFlags"] == ["flagA", "flagB"]
    assert rows["GCST1"]["qualityControls"] == []
    assert rows["GCST1"]["isCurated"] is True
    assert rows["GCST2"]["analysisFlags"] == []
    assert rows["GCST2"]["isCurated"] is False


def test_credible_set_qc_filters_and_dedupes(spark):
    from genetics_spark_coloc_spark.operators.credible_sets import credible_set_qc

    cred = spark.createDataFrame(
        [
            # passes both filters, loses dedupe to row 2
            ("CS1", "1_100_A_G", 5.0, -8, 0.5, 3.0),
            ("CS1", "1_200_A_G", 5.0, -8, 0.5, 9.0),
            # p-value too weak (1e-3)
            ("CS2", "1_300_A_G", 1.0, -3, 0.5, 3.0),
            # purity too low
            ("CS3", "1_400_A_G", 5.0, -8, 0.001, 3.0),
            # p-value below double underflow still passes (pair compare)
            ("CS4", "1_500_A_G", 5.0, -320, 0.5, 3.0),
        ],
        ["studyLocusId", "variantId", "pValueMantissa", "pValueExponent",
         "purityMinR2", "credibleSetlog10BF"],
    )
    rows = {r["studyLocusId"]: r for r in credible_set_qc(cred, 1e-5, 0.01).collect()}
    assert set(rows) == {"CS1", "CS4"}
    assert rows["CS1"]["variantId"] == "1_200_A_G"


def test_eqtl_susie_parsing_on_reference_sample(spark):
    """Realism check: parse the reference's actual QTD000584 SuSiE
    sample files (credible sets TSV + wide LBF TSV + study metadata)
    through the ingestion pipeline and assert the reference's own
    structural invariants (datasource/eqtl_catalogue tests: credset
    rows parse, loci are unique, identifiers are sanitised)."""
    import os

    import pytest
    from pyspark.sql import functions as F

    d = "/root/reference/tests/gentropy/data_samples"
    if not os.path.isdir(d):
        pytest.skip("reference samples not mounted")
    from genetics_spark_coloc_spark.sources.eqtl_finemapping import (
        eqtl_susie_to_study_locus,
        extract_credible_set_index,
        parse_eqtl_susie_results,
    )

    cs = (
        spark.read.option("delimiter", "\t")
        .csv(f"{d}/QTD000584.credible_sets.tsv", header=True, inferSchema=True)
        .withColumn("credibleSetIndex", extract_credible_set_index(F.col("cs_id")))
        .withColumn("dataset_id", F.lit("QTD000584"))
    )
    lbf = (
        spark.read.option("delimiter", "\t")
        .csv(f"{d}/QTD000584.lbf_variable.txt", header=True, inferSchema=True)
        .withColumn("dataset_id", F.lit("QTD000584"))
    )
    meta = (
        spark.read.option("delimiter", "\t")
        .csv(f"{d}/sample_eqtl_catalogue_studies.tsv", header=True)
        .withColumn("study_type", F.lit(None).cast("string"))
    )
    processed = parse_eqtl_susie_results(cs, lbf, meta)
    rows = processed.collect()
    assert len(rows) > 0
    # variant ids are chr-stripped; credible-set indexes in 1..10
    assert all(not r["variantId"].startswith("chr") for r in rows)
    assert all(1 <= r["credibleSetIndex"] <= 10 for r in rows)
    # studyId is sanitised (no characters outside [A-Za-z0-9_])
    import re

    assert all(re.fullmatch(r"[A-Za-z0-9_]+", r["studyId"]) for r in rows)
    # study locus conversion: one row per locus, unique ids
    sl = eqtl_susie_to_study_locus(processed)
    n = sl.count()
    assert n > 0
    assert sl.select("studyLocusId").distinct().count() == n
