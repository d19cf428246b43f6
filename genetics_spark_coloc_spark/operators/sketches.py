"""Deterministic streaming-sketch operators: Count-Min and HyperLogLog.

Additive layer beyond the reference's genetics surface (the reference
has no sketches; SURVEY §2 lists exact aggregations only): at 100 TB a
pipeline needs sub-linear summaries — per-token frequencies for
heavy-hitter stop-lists (Count-Min, Cormode & Muthukrishnan 2005) and
distinct counts for vocabulary/cardinality monitoring (HyperLogLog,
Flajolet et al. 2007).

Both sketches here are DETERMINISTIC and ENGINE-PORTABLE by
construction: hashing is md5 over salted strings and the register/
bucket math is pure integer arithmetic, so an ANSI-SQL engine replays
the sketch bit for bit (the driver's DuckDB oracle does exactly that).
Spark's built-ins (``approx_count_distinct``, the
``count_min_sketch`` SQL function) use engine-private hashing —
correct, but unverifiable across engines and unstable across versions;
these operators trade a little speed for reproducibility, which is
what makes a sketch auditable in a data-curation pipeline.

Scale shape: both sketches are groupBy aggregations over exploded
tokens — map-side combined, output bounded by the sketch size
(depth × width rows for CMS, 2^b rows per group for HLL registers),
never by the corpus. The merge property holds relationally: sketches
of two corpora union + re-aggregate to the sketch of the union, so
per-partition/per-day sketches roll up without touching raw data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: fits a signed long with headroom, identical
# ('0x'||substr)::UBIGINT arithmetic on the DuckDB side
_HEX_CHARS = 15
_HASH_BITS = 4 * _HEX_CHARS


def _md5_long(s: Column) -> Column:
    """First 60 bits of md5(s) as a non-negative long — the portable
    hash both engines compute identically."""
    return F.conv(F.substring(F.md5(s), 1, _HEX_CHARS), 16, 10).cast("long")


def cms_sketch(
    df: DataFrame,
    tokens: Column,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch of token frequencies: ``depth`` independent
    hash rows × ``width`` counters. Point estimates read back via
    :func:`cms_estimate` are the min over rows — never an
    underestimate, overestimate bounded by 2N/width with probability
    1 − 2^−depth.

    One explode + one (row, bucket) groupBy; the shuffle carries at
    most depth × width distinct keys regardless of corpus size, and
    partial aggregation collapses each partition to ≤ depth × width
    rows before the exchange.
    """
    tok = df.select(F.explode(tokens).alias("token"))
    rows = tok.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("row"),
                    (
                        _md5_long(F.concat_ws("|", F.lit(str(d)), F.col("token")))
                        % width
                    ).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("rb")
    )
    return rows.groupBy(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_sketch_grouped(
    df: DataFrame,
    tokens: Column,
    group_cols: "list[str]",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Per-group Count-Min sketches in ONE corpus scan — the shard/
    per-day ingest shape: group by (group…, row, bucket) so every
    shard's sketch comes out of the same pass (vs one filtered pass
    per shard). Output ≤ |groups| × depth × width rows; sketches
    merge to the whole-corpus sketch with a plain groupBy SUM over
    (row, bucket) — counters are additive (certified by the
    cms_shard_rollup query). ``group_cols=[]`` degenerates to
    :func:`cms_sketch`'s shape.
    """
    tok = df.select(*group_cols, F.explode(tokens).alias("token"))
    rows = tok.select(
        *group_cols,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("row"),
                    (
                        _md5_long(F.concat_ws("|", F.lit(str(d)), F.col("token")))
                        % width
                    ).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("rb"),
    )
    return rows.groupBy(
        *group_cols,
        F.col("rb.row").alias("row"),
        F.col("rb.bucket").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Frequency estimates for ``candidates`` from a CMS built with
    the same (depth, width): per candidate, hash into each row's
    bucket and take the min counter. The sketch is depth × width rows
    — broadcast onto the candidate table, no shuffle of candidates.
    Emits (token, estCount).
    """
    keyed = candidates.select(
        F.col(token_col).alias("token"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("row"),
                    (
                        _md5_long(
                            F.concat_ws("|", F.lit(str(d)), F.col(token_col))
                        )
                        % width
                    ).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("rb"),
    ).select("token", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        keyed.join(F.broadcast(sketch), on=["row", "bucket"], how="left")
        .groupBy("token")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("estCount"))
    )


def hll_registers(
    df: DataFrame,
    tokens: Column,
    group_cols: "list[str]",
    b: int = 10,
) -> DataFrame:
    """HyperLogLog registers per group: 2^b registers, each holding
    the max leading-zero rank (rho) of the 60-bit portable hash's
    suffix. rho is computed with integer bit-length arithmetic
    (``conv(w, 10, 2)`` digit count), NOT floating log2 — exact at
    power-of-two boundaries on every engine.

    groupBy(group, register) max — output ≤ |groups| × 2^b rows.
    Registers union + max-merge across corpora (the HLL merge law),
    so per-shard register tables roll up relationally.
    """
    m = 1 << b
    suffix_bits = _HASH_BITS - b
    h = _md5_long(F.col("token"))
    w = F.shiftright(h, b)  # top 60-b bits
    # rho = (suffix bit positions above w's highest set bit) + 1;
    # w == 0 -> all suffix bits zero -> rho = suffix_bits + 1
    bitlen = F.length(F.conv(w, 10, 2))
    rho = F.when(w == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(suffix_bits) - bitlen + 1
    )
    tok = df.select(*group_cols, F.explode(tokens).alias("token"))
    return tok.select(
        *group_cols,
        (h % m).alias("register"),
        rho.cast("int").alias("rho"),
    ).groupBy(*group_cols, "register").agg(F.max("rho").alias("maxRho"))


def hll_estimate(
    registers: DataFrame,
    group_cols: "list[str]",
    b: int = 10,
) -> DataFrame:
    """Distinct-count estimate from an HLL register table: the
    classic alpha_m · m² / Σ2^−M_j raw estimate with the
    linear-counting small-range correction (V = empty registers).
    Pure aggregation over ≤ 2^b rows per group. Emits
    (group…, estDistinct) rounded to 4dp so float parity holds
    across engines.
    """
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("maxRho"))).alias("_sumInv"),
        F.count(F.lit(1)).alias("_nonZero"),
    )
    zeros = F.lit(m) - F.col("_nonZero")
    raw = F.lit(alpha * m * m) / (F.col("_sumInv") + zeros.cast("double"))
    small = raw <= 2.5 * m
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when(small & (zeros > 0), linear).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est, 4).alias("estDistinct")
    )


def bloom_build(
    df: DataFrame,
    key: Column,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Relational Bloom filter: the set of SET BIT POSITIONS from
    ``k`` portable hashes of every key — kept as a distinct-position
    table (≤ m_bits rows) instead of a packed bitset, so it builds
    with one map-side-combined distinct, merges across corpora by
    UNION, and ships to other engines as plain rows. The point at
    100 TB: probe a huge fact table against a filter built from a
    selective dimension WITHOUT shuffling the fact table on the join
    key (the filter broadcasts; false positives are re-checked only
    by whatever exact step follows).

    Catalyst injects its own runtime bloom under AQE for some joins;
    this operator is the EXPLICIT, engine-portable variant a pipeline
    can persist and reuse across runs/systems.
    """
    pos = df.select(
        F.explode(
            F.array(*[
                (
                    _md5_long(F.concat_ws("|", F.lit(str(i)), key.cast("string")))
                    % m_bits
                ).alias("p")
                for i in range(k)
            ])
        ).alias("pos")
    )
    return pos.distinct()


def bloom_probe(
    bloom: DataFrame,
    df: DataFrame,
    key: Column,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Membership probe: a key passes iff ALL ``k`` of its bit
    positions are present in the filter (no false negatives; false
    positives at the classic (1 − e^{−kn/m})^k rate). The filter
    broadcasts; the probe side is never shuffled. Emits the input
    keys (distinct) with ``bloomPass``.
    """
    keys = df.select(key.cast("string").alias("key")).distinct()
    probed = keys.select(
        "key",
        F.explode(
            F.array(*[
                (
                    _md5_long(F.concat_ws("|", F.lit(str(i)), F.col("key")))
                    % m_bits
                ).alias("p")
                for i in range(k)
            ])
        ).alias("pos"),
    )
    hits = probed.join(
        F.broadcast(bloom.withColumn("_hit", F.lit(1))), on="pos", how="left"
    )
    return hits.groupBy("key").agg(
        (F.count(F.lit(1)) == F.sum(F.coalesce("_hit", F.lit(0)))).alias(
            "bloomPass"
        )
    )


def grid_quantile_sketch(
    df: DataFrame,
    value: Column,
    group_cols: "list[str]",
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Fixed-grid histogram sketch for quantile estimation: values
    clamp into ``n_bins`` equal bins over [lo, hi); per-(group, bin)
    counts. One map-side-combined aggregation bounded by
    |groups| × n_bins rows; sketches MERGE by unioning and summing
    counts — the one-pass, sort-free way to get percentiles over
    100 TB (exact percentile needs a global sort per group).
    Deterministic: bin edges are fixed, so two engines produce the
    identical sketch (unlike sampled t-digest/KLL).
    """
    span = float(hi) - float(lo)
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((value.cast("double") - lo) / span * n_bins).cast("int"),
        ),
    )
    return (
        df.select(*group_cols, bin_.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def grid_quantile_estimate(
    sketch: DataFrame,
    group_cols: "list[str]",
    quantiles: "list[float]",
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Quantile estimates from a grid sketch: for each requested q,
    the first bin whose cumulative count reaches q·total, linearly
    interpolated inside the bin. Error is bounded by one bin width —
    a fixed, knowable bound (vs the probabilistic bounds of sampled
    sketches). Runs entirely on the ≤ |groups| × n_bins sketch rows:
    one window per group, then a tiny quantile cross join. Emits
    (group…, q, estValue) rounded to 6dp for engine parity.
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    span = (float(hi) - float(lo)) / n_bins
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = sketch.withColumn("cumCnt", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy(*group_cols))
    )
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("cumCnt") >= F.col("q") * F.col("total"))
        .groupBy(*group_cols, "q")
        .agg(
            F.min(F.struct("bin", "cumCnt", "cnt", "total")).alias("_b")
        )
    )
    frac = (
        F.col("_b.cumCnt").cast("double")
        - F.col("q") * F.col("_b.total")
    ) / F.col("_b.cnt").cast("double")
    est = F.lit(lo) + (F.col("_b.bin") + 1.0 - frac) * span
    return hit.select(
        *group_cols, "q", F.round(est, 6).alias("estValue")
    )


def distribution_drift_psi(
    reference: DataFrame,
    current: DataFrame,
    value: Column,
    lo: float,
    hi: float,
    n_bins: int = 32,
    alert_threshold: float = 0.2,
) -> DataFrame:
    """Population Stability Index between two corpus snapshots'
    distributions of ``value`` — the standard drift monitor a
    production ingest pipeline runs per batch (PSI < 0.1 stable,
    0.1–0.2 moderate, > 0.2 action): both sides bin on the SHARED
    fixed grid of :func:`grid_quantile_sketch` (so per-snapshot
    sketches can be persisted and compared later without raw data),
    then PSI = Σ (p_i − q_i)·ln(p_i / q_i) over the bins.

    Empty bins get the standard 1/(2·total) pseudo-mass on BOTH
    sides (PSI is undefined at zero mass; the correction is
    deterministic, so the DuckDB oracle replays it exactly). One
    map-side-combined aggregation per snapshot bounded by ``n_bins``
    rows — never corpus-sized — then a tiny bin join. Emits ONE row:
    (psi, nBins, refTotal, curTotal, driftAlert).
    """
    return psi_from_sketches(
        grid_quantile_sketch(
            reference.select(value.alias("_v")), F.col("_v"), [], lo, hi, n_bins
        ),
        grid_quantile_sketch(
            current.select(value.alias("_v")), F.col("_v"), [], lo, hi, n_bins
        ),
        alert_threshold=alert_threshold,
    )


def psi_from_sketches(
    ref_sketch: DataFrame,
    cur_sketch: DataFrame,
    alert_threshold: float = 0.2,
) -> DataFrame:
    """PSI straight from two PERSISTED grid sketches (bin, cnt) —
    the sketch-level half of :func:`distribution_drift_psi`, split
    out so a persisted reference sketch (or a streaming sketch
    snapshot — ``streaming.pipelines.streaming_drift_gate``) can be
    compared without re-reading raw data. Both sketches must come
    from the SAME (lo, hi, n_bins) grid — bin indices are the join
    key, so mismatched grids compare apples to oranges silently;
    persist the grid parameters next to the sketch.
    """
    ref_sk = ref_sketch.withColumnRenamed("cnt", "refCnt")
    cur_sk = cur_sketch.withColumnRenamed("cnt", "curCnt")
    joined = ref_sk.join(cur_sk, on="bin", how="full").select(
        "bin",
        F.coalesce("refCnt", F.lit(0)).alias("refCnt"),
        F.coalesce("curCnt", F.lit(0)).alias("curCnt"),
    )
    tot = joined.groupBy().agg(
        F.sum("refCnt").alias("_rt"), F.sum("curCnt").alias("_ct")
    )
    p = (
        F.when(F.col("refCnt") > 0, F.col("refCnt").cast("double"))
        .otherwise(F.lit(0.5))
        / F.col("_rt").cast("double")
    )
    q = (
        F.when(F.col("curCnt") > 0, F.col("curCnt").cast("double"))
        .otherwise(F.lit(0.5))
        / F.col("_ct").cast("double")
    )
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(((p - q) * F.log(p / q)).alias("_term"))
        .groupBy()
        .agg(
            F.round(F.sum("_term"), 6).alias("psi"),
            F.count(F.lit(1)).cast("long").alias("nBins"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "psi",
            "nBins",
            F.col("_rt").cast("long").alias("refTotal"),
            F.col("_ct").cast("long").alias("curTotal"),
            (F.col("psi") > alert_threshold).alias("driftAlert"),
        )
    )


def bloom_prune(
    bloom: DataFrame,
    fact: DataFrame,
    key: Column,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Row-preserving Bloom pruning of a fact table — the composed
    payoff of :func:`bloom_build`: keep every fact row whose ``key``
    passes the filter, WITHOUT shuffling the fact side.

    The device: each of the ``k`` hash positions becomes one
    BROADCAST LEFT SEMI join of the fact table against the (≤ m_bits
    row, broadcastable) position table. A broadcast semi join never
    exchanges its probe side, so the fact table streams through all
    ``k`` joins inside whole-stage codegen — at 100 TB this prunes a
    petabyte-class scan down to the selective dimension's keyspace
    for the cost of shipping the filter once per executor, where a
    plain semi join on the key would shuffle the entire fact table.

    No false negatives (every true match survives); false positives
    at the classic (1 − e^{−kn/m})^k rate pass through and are
    eliminated by whatever exact join/filter follows — the standard
    bloom-prune contract. ``tests/test_plan_quality.py`` pins the
    no-Exchange-on-the-fact-side property.
    """
    # alias the broadcast side: steps.py feeds arbitrary parquet fact
    # tables, and a fact table that itself has a `pos` column would
    # make the unqualified join condition ambiguous
    b = (
        bloom.select(F.col("pos").alias("__bloom_pos"))
        .localCheckpoint(eager=False)
    )
    out = fact
    for i in range(k):
        pos_i = (
            _md5_long(F.concat_ws("|", F.lit(str(i)), key.cast("string"))) % m_bits
        )
        out = out.join(
            F.broadcast(b), on=pos_i == F.col("__bloom_pos"), how="left_semi"
        )
    return out


def kmv_sketch(
    df: DataFrame,
    keys: Column,
    group_cols: "list[str]",
    k: int = 256,
) -> DataFrame:
    """K-minimum-values sketch per group (Beyer et al. 2007, "On
    synopses for distinct value estimation under multiset
    operations"): the ``k`` SMALLEST distinct portable hashes of the
    exploded ``keys``. The piece HLL cannot give you: KMV sketches
    support set OPERATIONS — union, and crucially INTERSECTION — so
    two corpora's sketches estimate their token/n-gram overlap without
    touching raw data (train/test contamination measurement at 100 TB
    is exactly this shape).

    Deterministic and engine-portable like the CMS/HLL siblings
    (60-bit md5 hashes, integer arithmetic). Scale shape: one
    map-side-combined distinct on (group, hash), then a per-group
    rank-and-truncate that Catalyst rewrites to a PARTIAL +
    FINAL ``WindowGroupLimit`` (SPARK-37099): every map partition
    keeps only its k smallest rows BEFORE the group exchange, so the
    rank shuffle carries ≤ k rows per partition per group — not the
    distinct set (plan-pinned in tests). Output is ≤ |groups| × k
    rows, and sketches MERGE by union + re-rank (take the k smallest
    of the pooled values), so per-shard sketches roll up
    relationally.

    Emits (group…, rank, hashValue), rank 1..k ascending by hash.
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    hashed = (
        df.select(*group_cols, F.explode(keys).alias("_key"))
        .select(*group_cols, _md5_long(F.col("_key")).alias("hashValue"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("hashValue")
    return (
        hashed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*group_cols, "rank", "hashValue")
    )


def kmv_merge(
    sketches: DataFrame,
    group_cols: "list[str]",
    k: int = 256,
) -> DataFrame:
    """Merge per-shard KMV sketches RELATIONALLY (Beyer et al. 2007
    multiset union): pool the shards' values per group, distinct,
    re-rank, keep the k smallest. EXACT — any value in the global k
    smallest necessarily ranked within its own shard's k smallest, so
    merging per-shard sketches equals sketching the union (the merge
    law kmv_shard_rollup certifies). ``sketches`` must carry the
    shard key OUTSIDE ``group_cols`` (it is simply not selected);
    input is ≤ |groups × shards| × k rows, output ≤ |groups| × k —
    the rollup never touches raw data.

    Same rank-and-truncate plan shape as :func:`kmv_sketch` (Partial +
    Final WindowGroupLimit), so map partitions ship ≤ k rows per
    group into the rank exchange.
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    pooled = sketches.select(*group_cols, "hashValue").distinct()
    w = Window.partitionBy(*group_cols).orderBy("hashValue")
    return (
        pooled.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*group_cols, "rank", "hashValue")
    )


def kmv_distinct_estimate(
    sketch: DataFrame,
    group_cols: "list[str]",
    k: int = 256,
) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: (k−1) · 2^60 /
    h_(k) when the group filled all k slots, EXACT row count when it
    did not (fewer than k distinct values means the sketch IS the
    distinct set). Pure aggregation over ≤ k rows per group; 4dp
    rounding for engine parity. Emits (group…, estDistinct).
    """
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.max(F.when(F.col("rank") == k, F.col("hashValue"))).alias("_kth"),
    )
    est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.lit(float((k - 1) * (1 << _HASH_BITS))) / F.col("_kth").cast("double")
    )
    return agg.select(*group_cols, F.round(est, 4).alias("estDistinct"))


def kmv_overlap_estimate(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    k: int = 256,
) -> DataFrame:
    """Union / intersection / Jaccard estimates from TWO KMV sketches
    (each a (rank, hashValue) table from :func:`kmv_sketch`): pool
    both value sets, keep the K = min(k, |pool|) smallest, and count
    how many of those appear in BOTH sketches (Beyer et al. 2007 §4):

        estUnion        = (K−1) · 2^60 / pool_(K)   (exact when |pool| < k)
        estJaccard      = |K-smallest ∩ both| / K
        estIntersection = estJaccard · estUnion

    The pool is ≤ 2k rows — the ranking window is a declared single
    partition (operators/similarity.py precedent for bounded inputs),
    and the whole estimate runs without touching either corpus.
    Emits one row (nPool, estUnion, estIntersection, estJaccard).
    """
    from genetics_spark_coloc_spark.functions.reshape import (
        bounded_single_partition_rank,
    )

    a = sketch_a.select("hashValue", F.lit(1).alias("_inA"), F.lit(0).alias("_inB"))
    b = sketch_b.select("hashValue", F.lit(0).alias("_inA"), F.lit(1).alias("_inB"))
    pool = (
        a.unionByName(b)
        .groupBy("hashValue")
        .agg(F.max("_inA").alias("_inA"), F.max("_inB").alias("_inB"))
    )
    # rank carries the loud ≤2k size guard: the pool is two k-sketches
    # deduped, so >2k rows means a caller handed in non-sketch tables
    ranked = pool.withColumn(
        "_r",
        bounded_single_partition_rank(
            F.col("hashValue"),
            [F.col("hashValue")],
            2 * k,
            "kmv_overlap_estimate",
        ),
    ).filter(F.col("_r") <= k)
    agg = ranked.groupBy().agg(
        F.count(F.lit(1)).alias("nPool"),
        F.max("hashValue").alias("_kth"),
        F.sum(F.col("_inA") * F.col("_inB")).alias("_both"),
    )
    exact = F.col("nPool") < k
    est_union = F.when(exact, F.col("nPool").cast("double")).otherwise(
        F.lit(float((k - 1) * (1 << _HASH_BITS))) / F.col("_kth").cast("double")
    )
    jac = F.col("_both").cast("double") / F.col("nPool").cast("double")
    return agg.select(
        F.col("nPool").cast("long").alias("nPool"),
        F.round(est_union, 4).alias("estUnion"),
        F.round(jac * est_union, 4).alias("estIntersection"),
        F.round(jac, 6).alias("estJaccard"),
    )
