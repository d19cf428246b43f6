"""Declarative schema registry for the engine's core entities.

The reference loads JSON-serialised StructTypes from asset files
(reference: src/gentropy/dataset/dataset.py:111-122,
src/gentropy/common/schemas.py:42-54; 19 assets under
src/gentropy/assets/schemas/). This engine declares the same shapes
natively in Python — one canonical StructType per entity — which is
equally closed-world but keeps schemas greppable, diffable, and free
of a JSON parsing layer.

Nullability encodes "mandatory": nullable=False columns must exist
and must never be null (reference: common/schemas.py:160).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


_LOCUS_TAG = StructType(
    [
        _f("variantId", StringType(), False),
        _f("posteriorProbability", DoubleType()),
        _f("pValueMantissa", FloatType()),
        _f("pValueExponent", IntegerType()),
        _f("logBF", DoubleType()),
        _f("beta", DoubleType()),
        _f("standardError", DoubleType()),
        _f("r2Overall", DoubleType()),
        _f("is95CredibleSet", BooleanType()),
        _f("is99CredibleSet", BooleanType()),
    ]
)

_LD_SET_TAG = StructType(
    [
        _f("tagVariantId", StringType(), False),
        _f("r2Overall", DoubleType()),
    ]
)

_LD_INDEX_TAG = StructType(
    [
        _f("tagVariantId", StringType(), False),
        _f(
            "rValues",
            ArrayType(
                StructType(
                    [
                        _f("population", StringType(), False),
                        _f("r", DoubleType(), False),
                    ]
                )
            ),
        ),
    ]
)

_OVERLAP_STATISTICS = StructType(
    [
        _f("left_pValueMantissa", FloatType()),
        _f("left_pValueExponent", IntegerType()),
        _f("left_beta", DoubleType()),
        _f("left_logBF", DoubleType()),
        _f("left_posteriorProbability", DoubleType()),
        _f("right_pValueMantissa", FloatType()),
        _f("right_pValueExponent", IntegerType()),
        _f("right_beta", DoubleType()),
        _f("right_logBF", DoubleType()),
        _f("right_posteriorProbability", DoubleType()),
    ]
)

SCHEMAS: dict[str, StructType] = {
    # per-variant GWAS single-point stats; key (studyId, variantId)
    "summary_statistics": StructType(
        [
            _f("studyId", StringType(), False),
            _f("variantId", StringType(), False),
            _f("chromosome", StringType(), False),
            _f("position", IntegerType(), False),
            _f("beta", DoubleType(), False),
            _f("sampleSize", IntegerType()),
            _f("pValueMantissa", FloatType(), False),
            _f("pValueExponent", IntegerType(), False),
            _f("effectAlleleFrequencyFromSource", FloatType()),
            _f("standardError", DoubleType()),
        ]
    ),
    # clumped / fine-mapped loci; `locus` array is the credible set
    "study_locus": StructType(
        [
            _f("studyLocusId", StringType(), False),
            _f("studyId", StringType(), False),
            _f("studyType", StringType()),
            _f("variantId", StringType(), False),
            _f("chromosome", StringType()),
            _f("position", IntegerType()),
            _f("region", StringType()),
            _f("beta", DoubleType()),
            _f("zScore", DoubleType()),
            _f("standardError", DoubleType()),
            _f("pValueMantissa", FloatType()),
            _f("pValueExponent", IntegerType()),
            _f("qualityControls", ArrayType(StringType())),
            _f("finemappingMethod", StringType()),
            _f("credibleSetIndex", IntegerType()),
            _f("credibleSetlog10BF", DoubleType()),
            _f("purityMeanR2", DoubleType()),
            _f("purityMinR2", DoubleType()),
            _f("locusStart", IntegerType()),
            _f("locusEnd", IntegerType()),
            _f("ldSet", ArrayType(_LD_SET_TAG)),
            _f("locus", ArrayType(_LOCUS_TAG)),
        ]
    ),
    "study_index": StructType(
        [
            _f("studyId", StringType(), False),
            _f("projectId", StringType(), False),
            _f("studyType", StringType(), False),
            _f("geneId", StringType()),
            _f("traitFromSource", StringType()),
            _f("nSamples", IntegerType()),
            _f("nCases", IntegerType()),
            _f("nControls", IntegerType()),
            _f(
                "ldPopulationStructure",
                ArrayType(
                    StructType(
                        [
                            _f("ldPopulation", StringType()),
                            _f("relativeSampleSize", DoubleType()),
                        ]
                    )
                ),
            ),
            _f("qualityControls", ArrayType(StringType())),
            _f("hasSumstats", BooleanType()),
            _f("sumstatQCValues", MapType(StringType(), FloatType())),
        ]
    ),
    "ld_index": StructType(
        [
            _f("variantId", StringType(), False),
            _f("chromosome", StringType(), False),
            _f("ldSet", ArrayType(_LD_INDEX_TAG), False),
        ]
    ),
    # aligned tag variants of an overlapping locus pair
    "study_locus_overlap": StructType(
        [
            _f("leftStudyLocusId", StringType(), False),
            _f("rightStudyLocusId", StringType(), False),
            _f("rightStudyType", StringType()),
            _f("chromosome", StringType()),
            _f("tagVariantId", StringType(), False),
            _f("statistics", _OVERLAP_STATISTICS),
        ]
    ),
    # COLOC / eCAVIAR results per locus pair
    "colocalisation": StructType(
        [
            _f("leftStudyLocusId", StringType(), False),
            _f("rightStudyLocusId", StringType(), False),
            _f("rightStudyType", StringType()),
            _f("chromosome", StringType()),
            _f("colocalisationMethod", StringType(), False),
            _f("numberColocalisingVariants", LongType()),
            _f("h0", DoubleType()),
            _f("h1", DoubleType()),
            _f("h2", DoubleType()),
            _f("h3", DoubleType()),
            _f("h4", DoubleType()),
            _f("clpp", DoubleType()),
            _f("betaRatioSignAverage", DoubleType()),
        ]
    ),
    "variant_index": StructType(
        [
            _f("variantId", StringType(), False),
            _f("chromosome", StringType(), False),
            _f("position", IntegerType(), False),
            _f("referenceAllele", StringType(), False),
            _f("alternateAllele", StringType(), False),
            _f(
                "transcriptConsequences",
                ArrayType(
                    StructType(
                        [
                            _f("targetId", StringType()),
                            _f("distanceFromTss", LongType()),
                            _f("distanceFromFootprint", LongType()),
                            _f("isEnsemblCanonical", BooleanType()),
                            _f("biotype", StringType()),
                            _f("consequenceScore", FloatType()),
                        ]
                    )
                ),
            ),
            _f(
                "alleleFrequencies",
                ArrayType(
                    StructType(
                        [
                            _f("populationName", StringType()),
                            _f("alleleFrequency", DoubleType()),
                        ]
                    )
                ),
            ),
        ]
    ),
    "target_index": StructType(
        [
            _f("id", StringType(), False),
            _f("biotype", StringType()),
            _f("tss", LongType()),
            _f(
                "genomicLocation",
                StructType(
                    [
                        _f("chromosome", StringType()),
                        _f("start", LongType()),
                        _f("end", LongType()),
                    ]
                ),
            ),
        ]
    ),
    "intervals": StructType(
        [
            _f("chromosome", StringType(), False),
            _f("start", IntegerType(), False),
            _f("end", IntegerType(), False),
            _f("geneId", StringType(), False),
            _f("score", DoubleType()),
            _f("datasourceId", StringType()),
            _f("biosampleId", StringType()),
        ]
    ),
    "pairwise_ld": StructType(
        [
            _f("variantIdI", StringType(), False),
            _f("variantIdJ", StringType(), False),
            _f("chromosome", StringType(), False),
            _f("population", StringType()),
            _f("r", DoubleType(), False),
        ]
    ),
    # cell-type / tissue ontology entries (reference:
    # assets/schemas/biosample_index.json)
    "biosample_index": StructType(
        [
            _f("biosampleId", StringType(), False),
            _f("biosampleName", StringType(), False),
            _f("description", StringType()),
            _f("xrefs", ArrayType(StringType())),
            _f("synonyms", ArrayType(StringType())),
            _f("parents", ArrayType(StringType())),
            _f("ancestors", ArrayType(StringType())),
            _f("descendants", ArrayType(StringType())),
            _f("children", ArrayType(StringType())),
        ]
    ),
    # protein-level variant effect annotations (reference:
    # assets/schemas/amino_acid_variants.json)
    "amino_acid_variants": StructType(
        [
            _f("uniprotAccession", StringType()),
            _f("aminoAcidChange", StringType()),
            _f(
                "variantEffect",
                ArrayType(
                    StructType(
                        [
                            _f("method", StringType()),
                            _f("assessment", StringType()),
                            _f("score", FloatType()),
                            _f("assessmentFlag", StringType()),
                            _f("targetId", StringType()),
                            _f("normalisedScore", DoubleType()),
                        ]
                    )
                ),
            ),
        ]
    ),
    # long-form L2G feature rows (reference: assets/schemas/l2g_feature.json)
    "l2g_feature": StructType(
        [
            _f("studyLocusId", StringType(), False),
            _f("geneId", StringType(), False),
            _f("featureName", StringType(), False),
            _f("featureValue", FloatType(), False),
        ]
    ),
    # curated locus→gene training labels (reference:
    # assets/schemas/l2g_gold_standard.json)
    "l2g_gold_standard": StructType(
        [
            _f("studyLocusId", StringType(), False),
            _f("variantId", StringType(), False),
            _f("studyId", StringType(), False),
            _f("geneId", StringType(), False),
            _f("traitFromSourceMappedId", StringType()),
            _f("goldStandardSet", StringType(), False),
            _f("sources", ArrayType(StringType())),
        ]
    ),
    # scored L2G predictions with per-feature attributions (reference:
    # assets/schemas/l2g_predictions.json)
    "l2g_predictions": StructType(
        [
            _f("studyLocusId", StringType(), False),
            _f("geneId", StringType(), False),
            _f("score", DoubleType(), False),
            _f(
                "features",
                ArrayType(
                    StructType(
                        [
                            _f("name", StringType(), False),
                            _f("value", FloatType(), False),
                            _f("shapValue", FloatType()),
                        ]
                    ),
                    containsNull=False,
                ),
            ),
            _f("shapBaseValue", FloatType()),
        ]
    ),
    # raw 12-column BED of Andersson 2014 enhancer-TSS associations
    # (reference: assets/schemas/andersson2014.json)
    "andersson2014": StructType(
        [
            _f("chrom", StringType()),
            _f("chromStart", LongType()),
            _f("chromEnd", LongType()),
            _f("name", StringType()),
            _f("score", LongType()),
            _f("strand", StringType()),
            _f("thickStart", LongType()),
            _f("thickEnd", LongType()),
            _f("itemRgb", StringType()),
            _f("blockCount", LongType()),
            _f("blockSizes", StringType()),
            _f("chromStarts", StringType()),
        ]
    ),
    # the raw Ensembl VEP JSON document shape (reference:
    # assets/schemas/vep_json_output.json)
    "vep_json_output": StructType(
        [
            _f("allele_string", StringType()),
            _f("assembly_name", StringType()),
            _f(
                "intergenic_consequences",
                ArrayType(
                    StructType(
                        [
                            _f("conservation", DoubleType()),
                            _f("hgvsg", StringType()),
                            _f("cadd_phred", DoubleType()),
                            _f("cadd_raw", DoubleType()),
                            _f("consequence_terms", ArrayType(StringType())),
                            _f("impact", StringType()),
                            _f("variant_allele", StringType()),
                            _f("gene_id", StringType()),
                        ]
                    )
                ),
            ),
            _f(
                "colocated_variants",
                ArrayType(
                    StructType(
                        [
                            _f("allele_string", StringType()),
                            _f("clin_sig", ArrayType(StringType())),
                            _f("clin_sig_allele", StringType()),
                            _f("end", LongType()),
                            _f("id", StringType()),
                            _f("phenotype_or_disease", LongType()),
                            _f("pubmed", ArrayType(LongType())),
                            _f("seq_region_name", StringType()),
                            _f("start", LongType()),
                            _f("strand", LongType()),
                            _f(
                                "var_synonyms",
                                StructType(
                                    [
                                        _f("ClinVar", ArrayType(StringType())),
                                        _f("LMDD", ArrayType(StringType())),
                                        _f("OIVD", ArrayType(StringType())),
                                        _f("OMIM", ArrayType(DoubleType())),
                                        _f("PharmGKB", ArrayType(StringType())),
                                        _f("PhenCode", ArrayType(StringType())),
                                        _f("UniProt", ArrayType(StringType())),
                                        _f("dbPEX", ArrayType(StringType())),
                                    ]
                                ),
                            ),
                        ]
                    )
                ),
            ),
            _f("end", LongType()),
            _f("id", StringType()),
            _f("input", StringType()),
            _f("most_severe_consequence", StringType()),
            _f("seq_region_name", StringType()),
            _f("start", LongType()),
            _f("strand", LongType()),
            _f(
                "transcript_consequences",
                ArrayType(
                    StructType(
                        [
                            _f("conservation", DoubleType()),
                            _f(
                                "alphamissense",
                                StructType(
                                    [
                                        _f("am_class", StringType()),
                                        _f("am_pathogenicity", DoubleType()),
                                    ]
                                ),
                            ),
                            _f("amino_acids", StringType()),
                            _f("hgvsg", StringType()),
                            _f("hgvsc", StringType()),
                            _f("hgvsp", StringType()),
                            _f("gene_symbol", StringType()),
                            _f("biotype", StringType()),
                            _f("appris", StringType()),
                            _f("mane_select", StringType()),
                            _f("tssdistance", LongType()),
                            _f("cadd_phred", DoubleType()),
                            _f("cadd_raw", DoubleType()),
                            _f("canonical", LongType()),
                            _f("cdna_end", LongType()),
                            _f("cdna_start", LongType()),
                            _f("cds_end", LongType()),
                            _f("cds_start", LongType()),
                            _f("codons", StringType()),
                            _f("consequence_terms", ArrayType(StringType())),
                            _f("distance", LongType()),
                            _f("flags", ArrayType(StringType())),
                            _f("gene_id", StringType()),
                            _f("impact", StringType()),
                            _f("lof", StringType()),
                            _f("lof_filter", StringType()),
                            _f("lof_flags", StringType()),
                            _f("lof_info", StringType()),
                            _f("polyphen_prediction", StringType()),
                            _f("polyphen_score", DoubleType()),
                            _f("protein_end", LongType()),
                            _f("protein_start", LongType()),
                            _f("sift_prediction", StringType()),
                            _f("sift_score", DoubleType()),
                            _f("strand", LongType()),
                            _f("swissprot", ArrayType(StringType())),
                            _f("transcript_id", StringType()),
                            _f("trembl", ArrayType(StringType())),
                            _f("uniparc", ArrayType(StringType())),
                            _f("uniprot_isoform", ArrayType(StringType())),
                            _f("variant_allele", StringType()),
                        ]
                    )
                ),
            ),
        ]
    ),
}


def get_schema(name: str) -> StructType:
    """Return the canonical StructType for a registered entity."""
    try:
        return SCHEMAS[name]
    except KeyError:
        raise KeyError(f"unknown schema {name!r}; known: {sorted(SCHEMAS)}") from None
