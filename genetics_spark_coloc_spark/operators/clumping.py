"""Distance-based clumping of GWAS summary statistics into loci.

Two methods, both shuffle-minimal window pipelines over
(studyId, chromosome):

- **window-based clumping** (reference:
  src/gentropy/method/window_based_clumping.py:28-233): cluster
  significant variants separated by > window, rank by significance in
  cluster, then greedily select leads at least ``distance`` apart.
  The reference's greedy ``_prune_peak`` numpy UDF is re-expressed
  here as a higher-order ``aggregate`` fold over the rank-ordered
  position array — same semantics, fully JVM-side/codegen, no Python
  worker round-trip at 100 TB.

- **locus-breaker clumping** (reference:
  src/gentropy/method/locus_breaker_clumping.py:21-170): segment
  baseline-significant variants by gaps > distance, derive
  [locusStart, locusEnd] with flanks, keep top variant per segment.

Scale notes: all windows partition by (studyId, chromosome[, cluster])
— high-cardinality keys, so a 1000-executor shuffle balances well and
AQE splits residual skew (e.g. chr6/MHC). No collect(), no driver
loop, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from genetics_spark_coloc_spark.functions.pvalue import neglog_pvalue, pvalue_pair_lte

WINDOW_CLUMPED_FLAG = "Explained by a more significant variant in the same window"


def cluster_peaks(df: DataFrame, window_length: int) -> DataFrame:
    """Assign cluster ids: variants closer than ``window_length`` chain
    into one cluster (reference: window_based_clumping.py:28-112).

    Adds a ``cluster_id`` column ``{studyId}_{chromosome}_{startPos}``.
    """
    w = Window.partitionBy("studyId", "chromosome").orderBy("position")
    prev_pos = F.lag("position").over(w)
    boundary = F.when(
        prev_pos.isNull() | (F.col("position") - prev_pos > window_length),
        F.concat_ws("_", F.col("studyId"), F.col("chromosome"), F.col("position")),
    )
    filled = F.last(boundary, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("cluster_id", filled)


def _greedy_lead_positions(positions_by_rank):
    """Fold over positions (ordered by significance): accept a position
    as lead iff no already-accepted lead is within < distance.

    Returns array<int> of accepted lead positions. Equivalent to the
    reference's sequential ``_prune_peak`` (window_based_clumping.py:
    114-153) but runs inside whole-stage codegen.
    """

    def step(acc, p, distance):
        conflict = F.exists(acc, lambda a: F.abs(a - p) < distance)
        return F.when(conflict, acc).otherwise(F.concat(acc, F.array(p)))

    return step


def window_based_clumping(
    sumstats: DataFrame,
    distance: int = 500_000,
    gwas_significance: float = 1e-8,
    drop_clumped: bool = True,
) -> DataFrame:
    """Clump summary statistics into lead variants.

    Parameters mirror the reference defaults (config.py:565-578:
    distance 500 kb, significance 1e-8).

    Returns the input rows restricted to significant variants, with
    lead selection applied: if ``drop_clumped`` only lead variants
    survive, otherwise non-leads carry the WINDOW_CLUMPED flag in
    ``qualityControls``.
    """
    significant = sumstats.filter(
        pvalue_pair_lte(F.col("pValueMantissa"), F.col("pValueExponent"), gwas_significance)
    )
    # two consumers below (the cluster-lead aggregate and the ranked
    # join-back) — without a barrier the whole upstream pipeline
    # (source parse + significance filter + the two cluster_peaks
    # windows) executes twice per query (r14: measured in the
    # gwas_catalog_top_hits plan as a full duplicated subtree on both
    # SortMergeJoin sides)
    clustered = cluster_peaks(significant, distance).localCheckpoint(
        eager=False
    )

    step = _greedy_lead_positions(None)
    # One positions-array per CLUSTER via groupBy (map-side combine,
    # O(n) total), not a running collect_list window frame (O(n²) per
    # cluster — unusable when a dense region chains into one giant
    # cluster, e.g. 100 TB of MHC). sort_array on (exp, mant, pos)
    # structs reproduces the significance ordering exactly.
    cluster_leads = (
        clustered.groupBy("studyId", "chromosome", "cluster_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("pValueExponent").alias("e"),
                        F.col("pValueMantissa").alias("m"),
                        F.col("position").alias("p"),
                    )
                )
            ).alias("ordered")
        )
        .select(
            "studyId",
            "chromosome",
            "cluster_id",
            F.aggregate(
                F.transform(F.col("ordered"), lambda s: s["p"]),
                F.array().cast("array<int>"),
                lambda acc, p: step(acc, p, F.lit(distance)),
            ).alias("leadPositions"),
        )
    )
    ranked = (
        clustered.join(cluster_leads, on=["studyId", "chromosome", "cluster_id"])
        # a row is lead iff its position was accepted AND it is the most
        # significant row at that position (ties at equal position)
        .withColumn(
            "posRank",
            # variantId tiebreak makes the order TOTAL: without it, two
            # rows tied on significance at the same position would get
            # partitioning-dependent ranks and the lead flag would flip
            # between runs (the DuckDB-side twin of this hazard actually
            # fired in the gwas_catalog_top_hits oracle — see
            # queries_study.py's clustered CTE comment)
            F.row_number().over(
                Window.partitionBy("studyId", "chromosome", "cluster_id", "position").orderBy(
                    F.col("pValueExponent").asc(),
                    F.col("pValueMantissa").asc(),
                    F.col("variantId").asc(),
                )
            ),
        )
        .withColumn(
            "isLead",
            F.array_contains(F.col("leadPositions"), F.col("position")) & (F.col("posRank") == 1),
        )
        .drop("leadPositions", "posRank", "cluster_id")
    )
    if drop_clumped:
        return ranked.filter(F.col("isLead")).drop("isLead")
    # append to an existing qualityControls array rather than
    # overwrite it (reference method/window_based_clumping.py:169-187
    # keeps prior flags, e.g. TOP_HIT, when the column is present)
    base_qc = (
        F.col("qualityControls")
        if "qualityControls" in sumstats.columns
        else F.array().cast("array<string>")
    )
    return ranked.withColumn(
        "qualityControls",
        F.array_distinct(
            F.when(
                ~F.col("isLead"),
                F.array_union(
                    F.coalesce(base_qc, F.array().cast("array<string>")),
                    F.array(F.lit(WINDOW_CLUMPED_FLAG)),
                ),
            ).otherwise(F.coalesce(base_qc, F.array().cast("array<string>")))
        ),
    ).drop("isLead")


def locus_breaker(
    sumstats: DataFrame,
    baseline_pvalue_cutoff: float = 1e-5,
    distance_cutoff: int = 250_000,
    pvalue_cutoff: float = 1e-8,
    flanking_distance: int = 100_000,
) -> DataFrame:
    """Variable-width loci separated by baseline-significance gaps
    (reference: locus_breaker_clumping.py:21-120; defaults
    config.py:547-556).

    Returns one row per locus: the top (rank-1 by -log10 p) variant,
    with ``locusStart``/``locusEnd`` extended by the flank.
    """
    import math

    neglog_cutoff = -math.log10(pvalue_cutoff)

    w1 = Window.partitionBy("studyId", "chromosome").orderBy("position")
    fill_frame = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    base = (
        sumstats.filter(
            pvalue_pair_lte(
                F.col("pValueMantissa"), F.col("pValueExponent"), baseline_pvalue_cutoff
            )
        )
        .withColumn(
            "negLogPValue",
            neglog_pvalue(F.col("pValueMantissa"), F.col("pValueExponent")),
        )
        .withColumn("prevPosition", F.lag("position").over(w1))
        .withColumn("gap", F.col("position") - F.col("prevPosition"))
        .withColumn(
            "segStart",
            F.when(
                (F.col("gap") > distance_cutoff) | F.col("gap").isNull(), F.col("position")
            ),
        )
        .withColumn(
            "locusStart",
            F.greatest(
                F.last(F.col("segStart") - flanking_distance, ignorenulls=True).over(fill_frame),
                F.lit(0),
            ),
        )
    )
    w2 = (
        Window.partitionBy("studyId", "chromosome", "locusStart")
        .orderBy("position")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    with_bounds = base.withColumn(
        "locusEnd", F.max(F.col("position") + flanking_distance).over(w2)
    )
    w3 = Window.partitionBy("studyId", "chromosome", "locusStart", "locusEnd").orderBy(
        F.col("negLogPValue").desc(), F.col("position").asc()
    )
    return (
        with_bounds.withColumn("rank", F.row_number().over(w3))
        .filter((F.col("rank") == 1) & (F.col("negLogPValue") > neglog_cutoff))
        .drop("rank", "prevPosition", "gap", "segStart", "negLogPValue")
        .withColumn("locusStart", F.col("locusStart").cast("integer"))
        .withColumn("locusEnd", F.col("locusEnd").cast("integer"))
    )
