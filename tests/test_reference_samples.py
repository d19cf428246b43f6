"""Realism tests: drive the ingestion/parsing layer with the
reference's OWN raw sample files (real VEP JSONL, FinnGen sumstats
and SuSiE outputs, GWAS-Catalog harmonised TSVs of both eras, the
GRCh37→38 chain file, interval source samples). These complement the
synthetic-oracle gates with actual upstream file shapes.

All tests skip when the read-only reference checkout is absent.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

DATA = "/root/reference/tests/gentropy/data_samples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference samples not mounted"
)


class TestVepSample:
    def test_real_vep_jsonl(self, spark):
        from genetics_spark_coloc_spark.sources.vep import read_vep_jsonl

        rows = read_vep_jsonl(spark, f"{DATA}/vep_sample.jsonl").collect()
        assert len(rows) > 0
        # every variant has an id of chrom_pos_ref_alt shape
        assert all(len(r["variantId"].split("_")) >= 4 for r in rows)
        with_csq = [r for r in rows if r["transcriptConsequences"]]
        assert with_csq, "sample should contain transcript consequences"
        # severity scores land in [0, 1]
        for r in with_csq:
            for c in r["transcriptConsequences"]:
                assert 0.0 <= c["consequenceScore"] <= 1.0
        # effect entries only carry known methods
        methods = {
            e["method"] for r in rows if r["variantEffect"] for e in r["variantEffect"]
        }
        assert methods <= {"CADD", "PolyPhen", "SIFT", "LOFTEE", "GERP", "VEP"}


class TestFinngenSamples:
    def test_finngen_sumstats_gz(self, spark):
        from genetics_spark_coloc_spark.sources.readers import read_finngen_sumstats

        df = read_finngen_sumstats(
            spark, f"{DATA}/finngen_R9_AB1_ACTINOMYCOSIS.gz"
        )
        rows = df.collect()
        assert len(rows) > 0
        assert all(r["studyId"] == "FINNGEN_R9_AB1_ACTINOMYCOSIS" for r in rows[:20])
        assert all(r["pValueMantissa"] >= 1.0 and r["pValueMantissa"] < 10 for r in rows)
        assert all(r["beta"] is not None for r in rows)

    def test_finngen_susie_snp(self, spark):
        from genetics_spark_coloc_spark.sources.finngen_finemapping import (
            process_finngen_susie_snps,
        )

        raw = spark.read.option("delimiter", "\t").csv(
            f"{DATA}/finngen_R9_AB1_EBV.SUSIE.snp", header=True, inferSchema=True
        )
        out = process_finngen_susie_snps(raw)
        rows = out.filter(F.col("posteriorProbability").isNotNull()).collect()
        assert len(rows) > 0
        # pips are probabilities; logBF picked from the cs-indexed column
        assert all(0 <= r["posteriorProbability"] <= 1 + 1e-9 for r in rows)


class TestGwasCatalogSumstats:
    def test_old_format_hm_columns(self, spark):
        from genetics_spark_coloc_spark.sources.readers import (
            read_gwas_catalog_sumstats,
        )

        df = read_gwas_catalog_sumstats(
            spark, f"{DATA}/old_format_GCST006090.h.tsv.gz", study_id="GCST006090"
        )
        rows = df.limit(50).collect()
        assert rows
        assert all(r["studyId"] == "GCST006090" for r in rows)
        assert all(r["variantId"] is not None for r in rows)

    def test_new_format_plain_columns(self, spark):
        from genetics_spark_coloc_spark.sources.readers import (
            read_gwas_catalog_sumstats,
        )

        df = read_gwas_catalog_sumstats(
            spark, f"{DATA}/new_format_GCST90293086.h.tsv.gz", study_id="GCST90293086"
        )
        rows = df.limit(50).collect()
        assert rows
        assert all(r["pValueExponent"] <= 0 for r in rows)


class TestRealChainFile:
    def test_grch37_to_grch38_chain(self, spark):
        from genetics_spark_coloc_spark.operators.liftover import (
            chain_to_df,
            liftover_intervals,
        )

        chain = chain_to_df(spark, f"{DATA}/grch37_to_grch38.over.chain")
        n_blocks = chain.count()
        assert n_blocks > 1000  # a real genome-wide chain
        # a known GRCh37→GRCh38 mapping: rs58276399 region
        # chr1:1000000 (37) ≈ chr1:1064620 (38) — assert the mapped
        # interval exists, stays on chr1, and preserves length
        df = spark.createDataFrame(
            [{"chrom": "1", "start": 1_000_000, "end": 1_000_100}],
            "chrom: string, start: long, end: long",
        )
        out = liftover_intervals(df, chain).collect()
        assert len(out) == 1
        r = out[0]
        assert r["chrom"] == "1"
        assert r["mapped_end"] - r["mapped_start"] == 100
        assert r["mapped_start"] != 1_000_000  # actually moved builds
        assert abs(r["mapped_start"] - 1_064_620) < 1000


class TestIntervalSamples:
    def test_jung_sample(self, spark):
        from genetics_spark_coloc_spark.sources.intervals import parse_jung

        # the jung sample ships comma-delimited despite the .bed suffix
        raw = spark.read.csv(f"{DATA}/jung_sample.bed", header=True)
        symbols = raw.select(
            F.explode(F.split(F.col("Promoter"), ";")).alias("geneSymbol")
        ).distinct().select(
            "geneSymbol",
            F.concat(F.lit("ENSG_"), F.col("geneSymbol")).alias("geneId"),
            F.lit(0).cast("long").alias("tss"),
            F.lit("1").alias("chromosome"),
        )
        out = parse_jung(raw, symbols).collect()
        assert len(out) > 0
        assert all(r["datasourceId"] == "jung2019" for r in out)
        assert all(r["resourceScore"] == 1.0 for r in out)

    def test_thurman_sample(self, spark):
        from genetics_spark_coloc_spark.sources.intervals import parse_thurman

        raw = spark.read.option("delimiter", "\t").csv(
            f"{DATA}/thurman_sample.bed8",
            schema="chrom string, start int, end int, col4 string, "
            "col5 string, col6 string, gene_name string, score double",
        )
        symbols = raw.select(
            F.col("gene_name").alias("geneSymbol"),
            F.concat(F.lit("ENSG_"), F.col("gene_name")).alias("geneId"),
            F.lit(0).cast("long").alias("tss"),
            F.regexp_replace(F.col("chrom"), "chr", "").alias("chromosome"),
        ).distinct()
        out = parse_thurman(raw, symbols).collect()
        assert len(out) > 0
        assert all(r["datasourceId"] == "thurman2012" for r in out)

    def test_javierre_sample(self, spark):
        from genetics_spark_coloc_spark.sources.intervals import parse_javierre

        raw = spark.read.parquet(f"{DATA}/javierre_sample.parquet")
        # gene locations spanning the sample's other-fragment ranges so
        # the body-overlap join links rows
        frag = raw.limit(100).select("chrom", "start", "end").collect()
        genes = spark.createDataFrame(
            [
                {
                    "chromosome": str(r["chrom"]).removeprefix("chr"),
                    "start": int(r["start"]) - 10,
                    "end": int(r["end"]) + 10,
                    "geneId": f"ENSG{i}",
                    "tss": int(r["start"]),
                }
                for i, r in enumerate(frag[:20])
            ],
            "chromosome: string, start: long, end: long, geneId: string, tss: long",
        )
        out = parse_javierre(raw, genes)
        assert out.count() > 0
        assert out.filter(F.col("geneId").isNotNull()).count() > 0


class TestFinngenMetaSamples:
    def test_finngen_studies_manifest(self, spark):
        """Real pheweb phenotype manifest → study index rows
        (reference finngen/study_index.py)."""
        import json

        from genetics_spark_coloc_spark.sources.study_indexes import (
            finngen_study_index,
        )

        with open(f"{DATA}/finngen_studies_sample.json") as fh:
            rdd = spark.sparkContext.parallelize([fh.read()])
        phenotypes = spark.read.json(rdd)
        rows = finngen_study_index(phenotypes, release_prefix="FINNGEN_R9").collect()
        assert len(rows) == 10
        assert all(r["studyId"].startswith("FINNGEN_R9_") for r in rows)
        assert all(r["nSamples"] == r["nCases"] + r["nControls"] for r in rows)
        assert all(r["discoverySamples"][0]["ancestry"] == "Finnish" for r in rows)

    def test_finngen_credset_summaries(self, spark):
        """Real credible-set summary TSV → LBF-filtered CS rows."""
        from genetics_spark_coloc_spark.sources.finngen_finemapping import (
            process_finngen_cs_summaries,
        )

        raw = spark.read.option("delimiter", "\t").csv(
            f"{DATA}/finngen_credset_summary_sample.tsv", header=True
        )
        out = process_finngen_cs_summaries(raw, release_prefix="FINNGEN_R9")
        rows = out.collect()
        assert len(rows) > 0
        # the publication's filter: every surviving set clears the LBF
        # threshold or is the first of its region
        assert all(
            r["credibleSetlog10BF"] > 0.8685889638065035 or r["credibleSetIndex"] == 1
            for r in rows
        )
        assert all(0 <= r["purityMinR2"] <= 1 for r in rows)


class TestColocSample:
    def test_coloc_on_reference_credible_sets(self, spark):
        """End-to-end overlap → COLOC on the reference's own
        coloc_test.parquet credible sets: posteriors are proper
        probabilities summing to 1."""
        from genetics_spark_coloc_spark.operators.coloc import coloc
        from genetics_spark_coloc_spark.operators.overlaps import find_overlaps

        # the sample ships two complete credible sets with real locus
        # arrays (logBF, PIP, beta per tag) — the reference's own
        # coloc input
        sl = spark.read.parquet(f"{DATA}/coloc_test.parquet").select(
            "studyLocusId", "studyId", "studyType", "chromosome", "region", "locus"
        ).filter(F.col("locus").isNotNull())
        overlaps = find_overlaps(sl)
        n_overlaps = overlaps.count()
        assert n_overlaps > 0
        out = coloc(overlaps).collect()
        assert len(out) > 0
        for r in out:
            total = r["h0"] + r["h1"] + r["h2"] + r["h3"] + r["h4"]
            assert abs(total - 1.0) < 1e-6


class TestOntologySamples:
    @pytest.mark.parametrize(
        "fname", ["cell_ontology_sample.json", "uberon_sample.json"]
    )
    def test_obographs_to_biosample_index(self, spark, fname):
        """Real obographs ontology samples → nodes/edges → path-
        doubling closure (the scalable replacement for the
        reference's driver-side graph walk)."""
        from genetics_spark_coloc_spark.operators.ontology import (
            build_biosample_index,
        )
        from genetics_spark_coloc_spark.sources.obographs import read_obographs

        nodes, edges = read_obographs(spark, f"{DATA}/{fname}")
        n_nodes = nodes.count()
        assert n_nodes > 0
        assert nodes.filter(F.col("biosampleId").contains("http")).count() == 0
        idx = build_biosample_index(nodes, edges)
        rows = idx.collect()
        assert len(rows) == n_nodes
        # ancestors never include IRIs and are consistent with edges
        if edges.count() > 0:
            with_anc = [r for r in rows if r["ancestors"]]
            assert with_anc, "expected some node to have ancestors"


class TestGwasCatalogStudySamples:
    def test_sample_size_extraction_from_real_studies(self, spark):
        """Free-text initial-sample-size parsing on the real
        GWAS-Catalog studies TSV (reference study_index.py:589-632)."""
        from genetics_spark_coloc_spark.sources.gwas_catalog_study_index import (
            annotate_discovery_sample_sizes,
        )

        raw = spark.read.option("delimiter", "\t").csv(
            f"{DATA}/gwas_catalog_studies.tsv", header=True
        )
        studies = raw.select(
            F.col("STUDY ACCESSION").alias("studyId"),
            F.col("INITIAL SAMPLE SIZE").alias("initialSampleSize"),
        )
        out = annotate_discovery_sample_sizes(studies)
        rows = out.collect()
        assert len(rows) > 0
        parsed = {r["studyId"]: r for r in rows if r["nSamples"]}
        assert parsed
        # hand-checked rows from the sample:
        # "32,384 European ancestry cases,  27,128 European ancestry controls"
        r = parsed["GCST004702"]
        assert (r["nCases"], r["nControls"], r["nSamples"]) == (32384, 27128, 59512)
        # "112,411 European ancestry male individuals" — no case/control split
        r2 = parsed["GCST004694"]
        assert (r2["nCases"], r2["nControls"], r2["nSamples"]) == (0, 0, 112411)


class TestUkbManifestSample:
    def test_neale_saige_manifest(self, spark):
        from genetics_spark_coloc_spark.sources.study_indexes import (
            ukbiobank_study_index,
        )

        raw = spark.read.option("delimiter", "\t").csv(
            f"{DATA}/neale2_saige_study_manifest.samples.tsv", header=True
        )
        rows = ukbiobank_study_index(raw).collect()
        assert len(rows) > 0
        assert all(r["studyId"] for r in rows)


class TestGoldStandardSamples:
    def test_positive_curation_and_interactions(self, spark):
        """Real L2G gold-standard curation JSON + real OTP interaction
        rows through the gold-standard pipeline (reference
        open_targets/l2g_gold_standard.py)."""
        from genetics_spark_coloc_spark.operators.gold_standard import (
            parse_positive_curation,
            process_gene_interactions,
        )

        curation = spark.read.json(f"{DATA}/l2g_gold_standard_curation_sample.json.gz")
        pos = parse_positive_curation(curation).collect()
        assert len(pos) > 0
        # variant ids assembled as chrom_pos_ref_alt; sources non-empty
        assert all(len(r["variantId"].split("_")) == 4 for r in pos)
        assert all(r["sources"] for r in pos)
        assert all(r["geneId"].startswith("ENSG") for r in pos)

        interactions = spark.read.parquet(f"{DATA}/otp_interactions_sample.parquet")
        pairs = process_gene_interactions(interactions).collect()
        assert len(pairs) > 0


class TestGwasCatalogAssociationSample:
    def test_risk_allele_and_pvalue_parsing(self, spark):
        """Risk-allele extraction + p-value string parsing on the real
        curated-association TSV (reference associations.py)."""
        from genetics_spark_coloc_spark.sources.gwas_catalog_assoc import (
            extract_risk_allele,
            parse_gwas_pvalue,
        )

        raw = spark.read.option("delimiter", "\t").csv(
            f"{DATA}/gwas_catalog_associations.tsv", header=True
        )
        parsed = raw.select(
            extract_risk_allele(F.col("STRONGEST SNP-RISK ALLELE")).alias("risk"),
            *parse_gwas_pvalue(F.col("P-VALUE")),
        ).collect()
        assert len(parsed) > 0
        alleles = {r["risk"] for r in parsed if r["risk"] is not None}
        # real catalog risk alleles are bases or '?' placeholders
        assert alleles <= set("ACGT?") | {a for a in alleles if len(a) > 1}
        ok = [r for r in parsed if r["pValueMantissa"] is not None]
        assert ok
        assert all(1.0 <= r["pValueMantissa"] < 10 for r in ok)
        assert all(r["pValueExponent"] <= 0 for r in ok)


class TestVariantSources:
    @pytest.mark.parametrize(
        "fname", ["eva-test.jsonl", "pharmacogenomics-test.jsonl", "uniprot-test.jsonl"]
    )
    def test_variant_source_to_vcf(self, spark, fname):
        """Real Open-Targets variant-source JSONL (EVA / PGx / UniProt)
        through the VCF export (reference open_targets/variants.py
        as_vcf_df): well-formed VCF columns, valid alleles, sorted."""
        from genetics_spark_coloc_spark.sources.open_targets import variants_to_vcf

        raw = spark.read.json(f"{DATA}/variant_sources/{fname}")
        out = variants_to_vcf(raw)
        rows = out.collect()
        assert len(rows) > 0
        assert out.columns[:5] == ["#CHROM", "POS", "ID", "REF", "ALT"]
        import re

        assert all(re.fullmatch(r"[GCTA.]*", r["REF"]) for r in rows)
        assert all(re.fullmatch(r"[GCTA.]*", r["ALT"]) for r in rows)
        # sorted by chromosome then position
        by_chrom: dict = {}
        for r in rows:
            by_chrom.setdefault(r["#CHROM"], []).append(r["POS"])
        for poss in by_chrom.values():
            assert poss == sorted(poss)
