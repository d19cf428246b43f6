"""Round-4 entity schemas: the 7 remaining reference asset schemas
(biosample_index, amino_acid_variants, l2g_feature, l2g_gold_standard,
l2g_predictions, andersson2014, vep_json_output — reference:
src/gentropy/assets/schemas/*.json) registered and validated against
real operator outputs."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.core.dataset import validate_schema
from genetics_spark_coloc_spark.core.schema_registry import SCHEMAS, get_schema

NEW_SCHEMAS = [
    "biosample_index",
    "amino_acid_variants",
    "l2g_feature",
    "l2g_gold_standard",
    "l2g_predictions",
    "andersson2014",
    "vep_json_output",
]


def test_all_reference_entities_registered():
    # 10 prior + 7 new = full coverage of the 17 entity JSON schemas
    # the reference bundles under assets/schemas/
    assert set(NEW_SCHEMAS) <= set(SCHEMAS)
    assert len(SCHEMAS) >= 17


@pytest.mark.parametrize("name", NEW_SCHEMAS)
def test_schema_roundtrips_and_self_validates(spark, name):
    schema = get_schema(name)
    df = spark.createDataFrame([], schema)
    validate_schema(df.schema, schema)  # exact self-match


def test_mandatory_fields_pinned():
    # nullability must match the reference assets exactly
    mandatory = {
        f.name for f in get_schema("l2g_gold_standard").fields if not f.nullable
    }
    assert mandatory == {
        "studyLocusId", "variantId", "studyId", "geneId", "goldStandardSet",
    }
    assert {
        f.name for f in get_schema("l2g_feature").fields if not f.nullable
    } == {"studyLocusId", "geneId", "featureName", "featureValue"}
    assert {
        f.name for f in get_schema("biosample_index").fields if not f.nullable
    } == {"biosampleId", "biosampleName"}
    # vep_json_output is fully nullable (raw VEP documents)
    assert all(f.nullable for f in get_schema("vep_json_output").fields)


def test_l2g_feature_long_validates(spark):
    from genetics_spark_coloc_spark.operators.l2g import to_l2g_feature_long

    fm = spark.createDataFrame(
        [("L1", "G1", 0.5, None), ("L1", "G2", None, 2.0)],
        "studyLocusId string, geneId string, distanceTssMean double, vepMaximum double",
    )
    out = to_l2g_feature_long(fm, ["distanceTssMean", "vepMaximum"])
    validate_schema(out.schema, get_schema("l2g_feature"))
    rows = {(r.studyLocusId, r.geneId, r.featureName) for r in out.collect()}
    # null feature values become absent rows
    assert rows == {("L1", "G1", "distanceTssMean"), ("L1", "G2", "vepMaximum")}


def test_l2g_predictions_entity_validates(spark):
    from genetics_spark_coloc_spark.operators.l2g import to_l2g_predictions_entity

    preds = spark.createDataFrame(
        [("L1", "G1", 0.9), ("L1", "G2", None)],
        "studyLocusId string, geneId string, l2gScore double",
    )
    fm = spark.createDataFrame(
        [("L1", "G1", 0.5), ("L1", "G2", 0.25)],
        "studyLocusId string, geneId string, distanceTssMean double",
    )
    out = to_l2g_predictions_entity(preds, fm, ["distanceTssMean"])
    validate_schema(out.schema, get_schema("l2g_predictions"))
    rows = out.collect()
    assert len(rows) == 1  # null scores dropped (schema: score non-null)
    assert rows[0].features[0].name == "distanceTssMean"
    assert rows[0].features[0].shapValue is None


def test_vep_json_output_reads_real_document(spark, tmp_path):
    doc = {
        "id": "rs123",
        "seq_region_name": "1",
        "start": 1000,
        "end": 1000,
        "strand": 1,
        "allele_string": "A/C",
        "assembly_name": "GRCh38",
        "most_severe_consequence": "missense_variant",
        "input": "1 1000 . A C",
        "transcript_consequences": [
            {
                "gene_id": "ENSG1",
                "transcript_id": "ENST1",
                "biotype": "protein_coding",
                "canonical": 1,
                "consequence_terms": ["missense_variant"],
                "cadd_phred": 12.3,
                "alphamissense": {"am_class": "benign", "am_pathogenicity": 0.1},
                "variant_allele": "C",
            }
        ],
        "colocated_variants": [
            {"id": "rs123", "allele_string": "A/C", "start": 1000, "end": 1000}
        ],
    }
    p = tmp_path / "vep.jsonl"
    p.write_text(json.dumps(doc) + "\n")
    df = spark.read.schema(get_schema("vep_json_output")).json(str(p))
    validate_schema(df.schema, get_schema("vep_json_output"))
    row = df.collect()[0]
    assert row.id == "rs123"
    assert row.transcript_consequences[0].alphamissense.am_pathogenicity == 0.1


def test_biosample_index_validates(spark):
    df = spark.createDataFrame(
        [("CL:01", "hepatocyte", None, None, None, ["CL:00"], None, None, None)],
        get_schema("biosample_index"),
    )
    validate_schema(df.schema, get_schema("biosample_index"))
    # extra column is a closed-world error
    from genetics_spark_coloc_spark.core.dataset import SchemaValidationError

    with pytest.raises(SchemaValidationError, match="unexpected"):
        validate_schema(
            df.withColumn("extra", F.lit(1)).schema, get_schema("biosample_index")
        )


def test_andersson_raw_shape_matches_parser_input(spark):
    # the andersson2014 schema is the raw BED the parser consumes
    schema = get_schema("andersson2014")
    assert [f.name for f in schema.fields][:4] == [
        "chrom", "chromStart", "chromEnd", "name",
    ]
    df = spark.createDataFrame(
        [("chr1", 100, 200, "chr1:100-200;X;GENE1", 500, ".", 0, 0, "0", 0, "", "")],
        schema,
    )
    validate_schema(df.schema, schema)
