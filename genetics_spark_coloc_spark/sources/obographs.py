"""Obographs ontology JSON reader (Uberon / Cell Ontology / EFO).

Reference parity: datasource/biosample_ontologies/utils.py:12-110 —
the node/edge projection is the same; the ancestor/descendant
traversal is NOT (the reference collects the whole graph to the
driver and walks it in a python UDF with a broadcast map; here the
closure is the log-depth path-doubling join in
operators/ontology.py, which scales past driver memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_URL_PREFIXES = r"http://purl\.obolibrary\.org/obo/|http://www\.ebi\.ac\.uk/efo/"


def _strip_iri(col):
    return F.regexp_replace(col, _URL_PREFIXES, "")


def read_obographs(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Parse an obographs JSON file into (nodes, is_a_edges).

    nodes: (biosampleId, biosampleName, description, xrefs, synonyms);
    is_a_edges: (subject, object) direct is_a pairs — feed them to
    ``operators.ontology.build_biosample_index`` for the closure.

    ``multiLine`` is required: obographs files are one big JSON
    document, not JSONL.
    """
    raw = spark.read.option("multiLine", "true").json(path)
    graphs = raw.select(F.explode_outer("graphs").alias("graph"))
    nodes = (
        graphs.select(F.explode_outer("graph.nodes").alias("node"))
        .select(
            _strip_iri(F.col("node.id")).alias("biosampleId"),
            F.coalesce(F.col("node.lbl"), F.col("node.id")).alias("biosampleName"),
            F.col("node.meta.definition.val").alias("description"),
            F.col("node.meta.xrefs.val").alias("xrefs"),
            F.col("node.meta.synonyms.val").alias("synonyms"),
        )
        .filter(F.col("biosampleId").isNotNull())
        .distinct()
    )
    edges = (
        graphs.select(F.explode_outer("graph.edges").alias("edge"))
        .filter(F.col("edge.pred") == "is_a")
        .select(
            _strip_iri(F.col("edge.sub")).alias("subject"),
            _strip_iri(F.col("edge.obj")).alias("object"),
        )
        .distinct()
    )
    return nodes, edges
