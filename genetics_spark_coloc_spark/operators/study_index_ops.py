"""StudyIndex operators: ancestry→LD-population mapping and
relative-sample-size aggregation, study-type LUTs.

Reference anchors: aggregate_and_map_ancestries + helpers
(dataset/study_index.py:85-207), study_type_lut (:209-215),
is_qtl (:217-223). The ancestry fold is a showcase of higher-order
array functions — per-row, zero shuffle, stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# GWAS-Catalog ancestry label → gnomAD LD panel population
# (reference asset: assets/data/gwas_population_2_LD_panel_map.json)
GWAS_POPULATION_TO_LD_PANEL = {
    "European": "nfe",
    "African American or Afro-Caribbean": "afr",
    "Native American": "amr",
    "Asian unspecified": "eas",
    "Hispanic or Latin American": "amr",
    "East Asian": "eas",
    "Central Asian": "eas",
    "South Asian": "eas",
    "South East Asian": "eas",
    "Sub-Saharan African": "afr",
    "African unspecified": "afr",
    "Oceanian": "eas",
    "Other": "nfe",
    "Finnish": "fin",
}


def _ld_population_map() -> Column:
    pairs: list[Column] = []
    for k, v in GWAS_POPULATION_TO_LD_PANEL.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.create_map(*pairs)


def aggregate_and_map_ancestries(discovery_samples: Column) -> Column:
    """array<struct<ancestry,sampleSize>> → array<struct<ldPopulation,
    relativeSampleSize>> (reference: study_index.py:164-207).

    Three higher-order passes, all row-local:
    1. transform: map each ancestry label onto its LD panel population;
    2. aggregate: fold the mapped structs into a distinct-population
       accumulator, summing sample sizes of same-population entries;
    3. transform: divide by the total for relative sample sizes.
    """
    map_expr = _ld_population_map()
    mapped = F.transform(
        discovery_samples,
        lambda s: F.struct(
            map_expr[s["ancestry"]].alias("ancestry"),
            s["sampleSize"].cast("double").alias("sampleSize"),
        ),
    )
    zero = F.array_distinct(
        F.transform(
            mapped,
            lambda s: F.struct(
                s["ancestry"].alias("ancestry"), F.lit(0.0).alias("sampleSize")
            ),
        )
    )
    aggregated = F.aggregate(
        mapped,
        zero,
        lambda acc, entry: F.transform(
            acc,
            lambda a: F.when(
                a["ancestry"] == entry["ancestry"],
                F.struct(
                    a["ancestry"].alias("ancestry"),
                    (a["sampleSize"] + entry["sampleSize"]).alias("sampleSize"),
                ),
            ).otherwise(a),
        ),
    )
    total = F.aggregate(
        aggregated, F.lit(0.0), lambda acc, pop: acc + pop["sampleSize"]
    )
    return F.transform(
        aggregated,
        lambda pop: F.struct(
            pop["ancestry"].alias("ldPopulation"),
            (pop["sampleSize"] / total).alias("relativeSampleSize"),
        ),
    )


def study_type_lut(study_index: DataFrame) -> DataFrame:
    """(studyId, studyType) lookup table (reference: study_index.py:209-215)."""
    return study_index.select("studyId", "studyType")


def is_qtl(study_type: Column) -> Column:
    """True for any *qtl study type (reference: study_index.py:217-223)."""
    return study_type.endswith("qtl")
