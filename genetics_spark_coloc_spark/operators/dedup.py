"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash.

Designed for trillion-document corpora:

- **exact**: one hash-groupBy; survivor = smallest id (deterministic).
- **MinHash+LSH**: shingle → P permuted min-hashes → B bands →
  bucket self-join. The bucket join replaces the O(n²) all-pairs
  comparison; band hashes are fine-grained keys so the shuffle
  spreads. All hashing is md5 (string min = permutation min), so a
  SQL oracle can reproduce it bit-for-bit.
- **n-gram Jaccard**: exact similarity on candidate pairs only.
- **SimHash**: 32-bit signature from per-token md5 bits, hamming
  distance via bit ops.

No row-at-a-time UDFs anywhere — explode/groupBy/codegen expressions,
plus one grouped Arrow kernel (SimHash bucket scoring, r14) where the
per-bucket work is a vectorized m×m Hamming matrix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.functions.guards import (
    guard_hot_buckets,
    hot_count_filter,
    validate_on_hot,
)
from genetics_spark_coloc_spark.functions.skew import spread_for_compute
from genetics_spark_coloc_spark.operators.text import tokens


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical texts by md5; keep the smallest id.

    Returns (contentHash, keeperId, nCopies).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("contentHash"), F.col(id_col))
        .groupBy("contentHash")
        .agg(
            F.min(id_col).alias("keeperId"),
            F.count(F.lit(1)).alias("nCopies"),
        )
    )


def char_shingles(text: Column, k: int = 8, stride: int = 4, max_shingles: int = 64) -> Column:
    """Deterministic character k-shingles at fixed stride, capped.

    Substring-based (not regex) so a SQL oracle derives the identical
    set. Lowercased. Returns array<string> (distinct).
    """
    lowered = F.lower(text)
    n = F.least(
        F.greatest((F.length(lowered) - k) / stride + 1, F.lit(1)).cast("int"),
        F.lit(max_shingles),
    )
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.substring(lowered, i * stride + 1, k),
        )
    )


def perm_window_hash(shingle_col, num_perm: int):
    """Hex digest wide enough for ``num_perm`` 8-hex-char windows at
    stride 3 (the one-hash/k-windows MinHash family). One md5 (32 hex
    chars) covers num_perm<=9; beyond that, extra SALTED digests are
    chained (md5(shingle || '#w<d>')) so every window keeps its full
    32-bit width. Without the chaining, num_perm>9 silently produced
    truncated-to-empty windows — every document shared the same
    degenerate high-band minhash and the LSH buckets went quadratic.
    The num_perm<=9 output is bit-identical to the original
    single-digest form (the oracle-certified default path)."""
    if num_perm < 1:
        raise ValueError(f"num_perm must be >= 1, got {num_perm}")
    n_digests = ((num_perm - 1) * 3 + 8 + 31) // 32
    parts = [F.md5(shingle_col)] + [
        F.md5(F.concat(shingle_col, F.lit(f"#w{d}")))
        for d in range(1, n_digests)
    ]
    return parts[0] if n_digests == 1 else F.concat(*parts)


def _minhash_mins(
    df: DataFrame, text_col: str, id_col: str, num_perm: int
) -> DataFrame:
    """WIDE per-document MinHash row: (docId, h0..h{P-1}).

    Shared subplan of :func:`minhash_signatures` (which explodes it to
    the long contract format) and :func:`_minhash_band_table` (which
    hashes bands directly off the wide row, skipping the long format
    and its extra shuffle entirely).

    r14 shape (guide §4.2): the per-document shingle → md5 → window
    min chain runs as ONE Arrow batch kernel — each input row IS a
    whole document, so the kernel emits one wide row per doc with no
    intermediate shingle rows at all. The old codegen form exploded
    |docs|×shingles rows and folded them back through a groupBy with
    ``num_perm`` STRING min buffers; that aggregate alone measured
    ~0.7 s of the 1.4 s pipeline at sf0.1 (UTF8String churn), and the
    kernel form halves the wall (1.41 → 0.85 s) while keeping the
    same single narrow per-doc exchange. Spark-side prep does the
    engine-semantics part (``lower`` + shingle-count from the FULL
    text length, truncation to the longest prefix any shingle can
    touch so the kernel never ships full documents); the kernel does
    only slicing + md5 + window mins, so Python/JVM Unicode-lowercase
    divergence cannot arise. A final ``min`` merge per docId keeps
    the exact old duplicate-id semantics (min of per-row mins == min
    over the union shingle multiset) and is the same |docs|-row
    exchange the old groupBy paid.

    Parity contract (A/B'd equal on sf0.1): null text → no row
    (kernel skips nulls; the merge agg never sees the doc); empty /
    whitespace text → the constant '' shingle exactly as before;
    md5 hex lowercase == hashlib hexdigest; window strings compare
    bytewise identically in Python and UTF8String.
    """
    import pandas as pd  # noqa: PLC0415

    k, stride, max_shingles = 8, 4, 64  # char_shingles defaults
    prefix = k + (max_shingles - 1) * stride
    n_digests = ((num_perm - 1) * 3 + 8 + 31) // 32  # perm_window_hash
    lowered = F.lower(F.col(text_col))
    n_sh = F.least(
        F.greatest((F.length(lowered) - k) / stride + 1, F.lit(1)).cast("int"),
        F.lit(max_shingles),
    )
    staged = df.select(
        F.col(id_col).alias("docId"),
        F.substring(lowered, 1, prefix).alias("_low"),
        n_sh.alias("_n"),
    )
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"docId {id_type}, " + ", ".join(
        f"h{p} string" for p in range(num_perm)
    )

    def _mins(batches):
        import hashlib  # noqa: PLC0415

        for pdf in batches:
            out = {"docId": [], **{f"h{p}": [] for p in range(num_perm)}}
            for did, low, nn in zip(pdf["docId"], pdf["_low"], pdf["_n"]):
                if not isinstance(low, str):
                    continue  # null text: no signature row
                shingles = {
                    low[i * stride : i * stride + k] for i in range(nn)
                }
                if n_digests == 1:
                    hs = [
                        hashlib.md5(s.encode("utf-8")).hexdigest()
                        for s in shingles
                    ]
                else:
                    hs = [
                        "".join(
                            hashlib.md5(
                                (s if d == 0 else f"{s}#w{d}").encode("utf-8")
                            ).hexdigest()
                            for d in range(n_digests)
                        )
                        for s in shingles
                    ]
                out["docId"].append(did)
                for p in range(num_perm):
                    q = p * 3
                    out[f"h{p}"].append(min(h[q : q + 8] for h in hs))
            yield pd.DataFrame(out)

    kern = staged.mapInPandas(_mins, schema)
    # exact old duplicate-id semantics: the old groupBy(docId) merged
    # rows sharing an id; min-of-mins reproduces it on the same
    # narrow |docs|-row exchange
    return kern.groupBy("docId").agg(
        *[F.min(f"h{p}").alias(f"h{p}") for p in range(num_perm)]
    )


def _minhash_band_table(
    df: DataFrame, text_col: str, id_col: str, num_perm: int, band_size: int
) -> DataFrame:
    """(docId, bandIdx, bandHash) computed DIRECTLY from the wide
    per-doc minhash row — one shuffle (the per-doc min groupBy) total.

    Bit-identical to banding the long :func:`minhash_signatures`
    output (``md5(concat_ws('|', sort_array(collect_list(minHash))))``
    grouped by ``int(perm / band_size)``): each band's member hashes
    are known per row, so ``sort_array(array(...))`` replaces the
    explode → re-shuffle → ``collect_list`` round trip. The window
    values are never NULL (min over ≥1 non-null md5 window), so
    ``collect_list``'s null-dropping and ``sort_array``'s null
    ordering cannot diverge.
    """
    mins = _minhash_mins(df, text_col, id_col, num_perm)
    n_bands = (num_perm + band_size - 1) // band_size
    band_structs = [
        F.struct(
            F.lit(b).alias("bandIdx"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.sort_array(
                        F.array(
                            *[
                                F.col(f"h{p}")
                                for p in range(num_perm)
                                if p // band_size == b
                            ]
                        )
                    ),
                )
            ).alias("bandHash"),
        )
        for b in range(n_bands)
    ]
    return mins.select(
        "docId", F.explode(F.array(*band_structs)).alias("kv")
    ).select(
        "docId",
        F.col("kv.bandIdx").alias("bandIdx"),
        F.col("kv.bandHash").alias("bandHash"),
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_perm: int = 8
) -> DataFrame:
    """Per-document MinHash signature.

    Each shingle is hashed ONCE (md5); permutation *p*'s value is the
    8-hex-char window of the digest starting at offset 3p — the
    standard one-hash/k-windows MinHash family (independent-enough
    32-bit views of a 128-bit hash at 8× less hashing). The signature
    element is the lexicographic min over shingles. Output:
    (id, perm, minHash) long format — band grouping composes on top.

    Known hot-bucket hazard (identical on both engines, so oracle
    parity holds): CONTENTLESS documents — empty or whitespace-only
    text — all share the constant shingle '' and therefore identical
    signatures, co-bucketing quadratically in the LSH join. They ARE
    exact duplicates of each other, but pre-filter them (or route
    them through ``exact_dedup``, which groups them in one hash agg)
    rather than paying O(m²) candidate pairs for them here; null text
    is dropped outright.
    """
    mins = _minhash_mins(df, text_col, id_col, num_perm)
    pairs = F.explode(
        F.array(
            *[
                F.struct(F.lit(p).alias("perm"), F.col(f"h{p}").alias("minHash"))
                for p in range(num_perm)
            ]
        )
    ).alias("kv")
    return mins.select("docId", pairs).select(
        "docId", F.col("kv.perm").alias("perm"), F.col("kv.minHash").alias("minHash")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_perm: int = 8,
    band_size: int = 2,
    hot_bucket_ceiling: "int | None" = 10_000,
    on_hot_bucket: str = "raise",
    star: bool = False,
) -> DataFrame:
    """Band the signature and self-join buckets -> candidate pairs.

    Bands: contiguous groups of ``band_size`` permutations; band hash
    = md5 of concatenated min-hashes. Pairs are (left < right),
    distinct. At 100 TB the band join is the only shuffle and its key
    (bandIdx, bandHash) is high-cardinality — UNLESS the corpus has a
    giant near-identical family (shared boilerplate), which funnels
    that family into one bucket and the self-join goes quadratic.
    The shared hot-bucket guard (functions/guards.py) makes that loud:
    any bucket over ``hot_bucket_ceiling`` docs aborts the job at
    execution time (``on_hot_bucket="raise"``, default) or is excluded
    from pairing (``"cap"`` — under-reports pairs inside the
    boilerplate family only). ``hot_bucket_ceiling=None`` disables.
    In raise mode the pair output is bit-identical to the unguarded
    plan, so oracles are untouched.
    """
    bands = (
        signatures.withColumn("bandIdx", (F.col("perm") / band_size).cast("int"))
        .groupBy("docId", "bandIdx")
        .agg(F.md5(F.concat_ws("|", F.sort_array(F.collect_list("minHash")))).alias("bandHash"))
        # NOTE r14: no checkpoint needed anymore — band_self_pairs now
        # consumes the band table exactly ONCE (grouped-bucket form),
        # so the plan has a single corpus scan by construction. The
        # r12 lazy localCheckpoint here fixed a 7-scan plan but left a
        # 3x materialization RACE: the guard's two broadcast-exchange
        # jobs and the main job all started concurrently and each
        # computed uncached partitions of this subtree.
    )
    return band_self_pairs(
        bands,
        hot_bucket_ceiling=hot_bucket_ceiling,
        on_hot_bucket=on_hot_bucket,
        context="lsh_candidate_pairs",
        star=star,
    )


def band_self_pairs(
    bands: DataFrame,
    hot_bucket_ceiling: "int | None" = 10_000,
    on_hot_bucket: str = "raise",
    context: str = "band_self_pairs",
    star: bool = False,
) -> DataFrame:
    """Guarded bucket pairing of a band table (docId, bandIdx,
    bandHash) → distinct (leftId < rightId) candidate pairs — the
    back half of :func:`lsh_candidate_pairs`, exposed so a band table
    derived ONCE (:func:`lsh_band_index`, or read back from the
    persisted index) can feed self-pairs and the incremental delta
    join without re-banding the corpus per consumer.

    Pairing is a GROUPED explode, not a self-join (r14): one
    ``groupBy(bandIdx, bandHash)`` collects each bucket's (sorted,
    null-free — ``collect_list`` drops null ids, which the old join's
    ``l.docId < r.docId`` predicate also rejected) member list, the
    hot-bucket guard rides the very same aggregate as a filter on the
    row count, and pairs explode as (ids[i], ids[j]), i < j — sorted
    ascending, so leftId < rightId exactly as the join produced. The
    self-join form referenced the band subtree twice and its guard
    twice more (4 consumers → repeated corpus scans or a checkpoint
    race); this form consumes the band table once, shuffles it once
    (the same band-key exchange the join needed anyway), and drops
    the guard's two broadcast exchanges. Per-bucket memory is bounded
    by the guard ceiling (the exploded slice rows are streamed, only
    the id list itself — 8 bytes × ≤ceiling — is held per row).

    ``star=True`` emits, per bucket, only the SPANNING STAR (bucket
    min id → every other member) instead of the full C(m, 2) clique —
    m−1 edges instead of m(m−1)/2. The union-over-buckets graph then
    has exactly the same CONNECTED COMPONENTS as the clique form
    (each bucket stays one connected set), so consumers that feed the
    pairs ONLY to :func:`operators.graph.connected_components` (the
    dedup-cluster family) get identical clusters from a graph whose
    edge count is linear, not quadratic, in bucket occupancy — at any
    scale the CC loop's per-round join shrinks by ~mean(m)/2 and min
    labels propagate through the bucket hub in one hop. NOT for
    consumers that verify pairs (Jaccard/edit-distance): the star is
    a connectivity certificate, not the candidate-pair set.
    """
    validate_on_hot(on_hot_bucket, context)
    grouped = bands.groupBy("bandIdx", "bandHash").agg(
        F.sort_array(F.collect_list("docId")).alias("_ids"),
        # exact guard parity with guard_hot_buckets: count ALL
        # occurrence rows (including null ids that collect_list drops)
        F.count(F.lit(1)).alias("_bucket_cnt"),
    )
    ok = hot_count_filter(
        grouped, "_bucket_cnt", hot_bucket_ceiling, on_hot_bucket, context
    )
    if star:
        pairs = ok.select(
            F.element_at("_ids", 1).alias("leftId"),
            F.explode(
                F.slice(
                    F.col("_ids"),
                    2,
                    F.greatest(F.size("_ids") - 1, F.lit(0)),
                )
            ).alias("rightId"),
        )
    else:
        lefts = ok.select(
            "_ids", F.posexplode("_ids").alias("_i", "leftId")
        )
        pairs = lefts.select(
            "leftId",
            F.explode(
                F.slice(F.col("_ids"), F.col("_i") + 2, F.size("_ids"))
            ).alias("rightId"),
        )
    return (
        pairs
        # exact join parity when a bucket holds DUPLICATE doc ids (a
        # re-appended doc in a persisted band index): the old strict
        # `<` predicate never paired a doc with itself; the sorted
        # slice would emit (x, x) for adjacent equal ids
        .filter(F.col("leftId") != F.col("rightId"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 8,
    band_size: int = 2,
    hot_bucket_ceiling: "int | None" = 10_000,
    on_hot_bucket: str = "raise",
    star: bool = False,
) -> DataFrame:
    """Full MinHash-LSH near-duplicate candidate pipeline.

    ``star`` forwards to :func:`band_self_pairs` — per-bucket spanning
    star instead of the full clique; same connected components, for
    CC-only consumers.
    """
    return lsh_candidate_pairs(
        minhash_signatures(df, text_col, id_col, num_perm),
        num_perm,
        band_size,
        hot_bucket_ceiling=hot_bucket_ceiling,
        on_hot_bucket=on_hot_bucket,
        star=star,
    )


def ngram_jaccard(
    df: DataFrame, pairs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact shingle-set Jaccard for given (leftId, rightId) pairs.

    Joins the shingle sets in, then |∩| / |∪| via array ops.
    """
    sets_df = df.select(
        F.col(id_col).alias("docId"), char_shingles(F.col(text_col)).alias("shingles")
    )
    return (
        pairs.join(
            sets_df.select(F.col("docId").alias("leftId"), F.col("shingles").alias("ls")),
            on="leftId",
        )
        .join(
            sets_df.select(F.col("docId").alias("rightId"), F.col("shingles").alias("rs")),
            on="rightId",
        )
        .select(
            "leftId",
            "rightId",
            F.round(
                F.size(F.array_intersect("ls", "rs")).cast("double")
                / F.size(F.array_union("ls", "rs")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def edit_distance_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    ratio_threshold: float = 0.8,
    max_len: int = 2_000,
    threshold: int | None = None,
) -> DataFrame:
    """Edit-distance verification of near-dup CANDIDATE pairs — the
    character-level second stage after LSH banding (complement of
    the shingle-set :func:`ngram_jaccard` verifier; edit ratio is the
    dedup literature's other standard accept criterion, sensitive to
    in-place edits that leave shingle sets mostly intact).

    Per (leftId, rightId) pair: Levenshtein distance between the two
    texts TRUNCATED to ``max_len`` chars (the documented cost bound —
    the kernel is O(len²) per pair, so unbounded 100 MB outliers
    would own the stage; truncation is the same contract MinHashLSH
    verifiers ship with), ``editRatio`` = 1 − dist / max(len_l,
    len_r) over the truncated lengths (1 = identical, 0 = disjoint;
    two empty texts are identical → ratio 1), ``isDup`` = ratio ≥
    ``ratio_threshold``.

    ``threshold`` (k) switches to the BANDED fast path — Spark 3.5's
    ``levenshtein(l, r, k)``, the Ukkonen diagonal-band kernel at
    O(k·len) per pair instead of O(len²). Pairs whose true distance
    exceeds k report ``editDistance``/``editRatio`` NULL and
    ``isDup`` false by contract (the exact distance beyond the band
    is unknown AND unused by the accept/reject decision). The banded
    path agrees bit-for-bit with exact mode on every pair whenever
    ``k ≥ (1 − ratio_threshold) · max_len + 1``: any pair that could
    round up to the accept threshold has distance ≤
    (1 − θ + 5e-7) · max_side ≤ that bound, so every potential dup is
    measured exactly and everything banded away is a certain reject.
    :func:`edit_distance_band` computes that safe k. Default ``None``
    keeps the exact kernel (the oracle mode).

    Scale shape: the pair table comes from a GUARDED candidate
    generator (bounded by construction), the two text joins are plain
    hash joins on the id, and ``levenshtein`` (both kernels) runs
    JVM-side inside codegen — no Python in the loop.
    """
    trunc = F.substring(F.coalesce(F.col(text_col), F.lit("")), 1, max_len)
    texts = df.select(F.col(id_col).alias("docId"), trunc.alias("t"))
    # spread the pair rows AFTER the text joins, immediately before
    # the kernel projection: the O(len·k) kernel's parallelism must
    # not depend on which join strategy the planner picks. The old
    # pre-join spread assumed the texts side would be the broadcast
    # build; when stats drift makes the (tiny, guarded) PAIR side the
    # broadcast build instead — the scale-correct plan — the kernel
    # inherits the probe scan's partitioning (ONE split for a local
    # parquet file) and the spread sits uselessly inside the
    # BroadcastExchange (measured: 2.1 → 10.5 s when an Arrow node
    # upstream shrank the pair-side estimate). Spreading the joined
    # rows costs one exchange of the kernel's own input — bounded by
    # the guarded pair count and amortized by the super-linear kernel
    # it parallelizes — and is invariant to the join shape.
    joined = pairs.join(
        texts.select(F.col("docId").alias("leftId"), F.col("t").alias("lt")),
        on="leftId",
    ).join(
        texts.select(F.col("docId").alias("rightId"), F.col("t").alias("rt")),
        on="rightId",
    )
    joined = spread_for_compute(joined, "leftId", "rightId")
    max_side = F.greatest(F.length("lt"), F.length("rt"))
    if threshold is None:
        dist = F.levenshtein("lt", "rt")
        ratio = F.when(max_side == 0, F.lit(1.0)).otherwise(
            F.lit(1.0) - dist.cast("double") / max_side.cast("double")
        )
        return joined.select(
            "leftId",
            "rightId",
            dist.cast("long").alias("editDistance"),
            F.round(ratio, 6).alias("editRatio"),
            (F.round(ratio, 6) >= F.lit(ratio_threshold)).alias("isDup"),
        )
    # materialize the kernel result ONCE in its own projection: in
    # the banded column tree levenshtein only ever appears inside
    # conditional branches (CaseWhen/Coalesce), which codegen
    # subexpression elimination refuses to hoist — inlined, the
    # kernel ran 4-5x per row and the "fast path" measured 2.2x
    # SLOWER than exact. The multi-use non-cheap alias also blocks
    # CollapseProject from re-inlining it.
    base = joined.select(
        "leftId",
        "rightId",
        max_side.alias("_ms"),
        F.levenshtein("lt", "rt", int(threshold)).alias("_bd"),  # -1 past k
    )
    dist = F.when(F.col("_bd") >= 0, F.col("_bd"))  # NULL past the band
    ratio = F.when(F.col("_ms") == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - dist.cast("double") / F.col("_ms").cast("double")
    )
    return base.select(
        "leftId",
        "rightId",
        dist.cast("long").alias("editDistance"),
        F.round(ratio, 6).alias("editRatio"),
        F.coalesce(
            F.round(ratio, 6) >= F.lit(ratio_threshold), F.lit(False)
        ).alias("isDup"),
    )


def edit_distance_band(ratio_threshold: float, max_len: int) -> int:
    """The smallest band k for which :func:`edit_distance_verify`'s
    banded mode is decision-exact: every pair whose 6dp-rounded ratio
    could reach ``ratio_threshold`` has distance ≤
    (1 − θ + 5e-7) · max_len < ceil((1 − θ) · max_len) + 1."""
    import math  # noqa: PLC0415

    return int(math.ceil((1.0 - ratio_threshold) * max_len)) + 1


def simhash(text: Column, bits: int = 32) -> Column:
    """SimHash signature (long) from token md5s.

    Per token, take the first ``bits`` bits of md5; sum +1/-1 per bit
    over tokens; signature bit = sign. Pure array math.
    """
    if bits > 32:
        raise ValueError(
            f"simhash: bits={bits} exceeds the 32 bits of hash material "
            "derived per token (first 8 md5 hex digits); zip_with would "
            "null-pad the vote vector silently"
        )
    toks = F.array_distinct(tokens(F.lower(text)))

    # Per token, derive the 32-bit vector from the first 8 hex chars
    # of md5 via a literal hex-digit map — one lookup + 4 cheap mods
    # per digit instead of 32 pow/floor extractions per token.
    # Bit b of the packed value corresponds to hex digit (7 - b//4),
    # bit (b%4): flattening the REVERSED digit list in LSB-first
    # order reproduces exactly (value >> b) & 1.
    hex_pairs = []
    for i, c in enumerate("0123456789abcdef"):
        hex_pairs.extend([F.lit(c), F.lit(i)])
    hex_map = F.create_map(*hex_pairs)

    # hash once per token (expressions inside lambdas are not CSE'd,
    # so md5 must not appear under the per-digit transform)
    tok_hashes = F.transform(toks, lambda t: F.substring(F.md5(t), 1, 8))

    def hash_bits(h):
        digits_rev = F.transform(
            F.sequence(F.lit(8), F.lit(1), F.lit(-1)),
            lambda i: hex_map[F.substring(h, i, 1)],
        )
        return F.flatten(
            F.transform(
                digits_rev,
                lambda d: F.array(d % 2, (d / 2).cast("int") % 2, (d / 4).cast("int") % 2, (d / 8).cast("int") % 2),
            )
        )

    zeros = F.transform(F.sequence(F.lit(0), F.lit(bits - 1)), lambda b: F.lit(0))
    bit_votes = F.aggregate(
        tok_hashes,
        zeros,
        lambda acc, h: F.zip_with(acc, hash_bits(h), lambda a, b: a + 2 * b - 1),
    )
    return F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda v, b: F.when(v > 0, F.pow(F.lit(2.0), b).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """(docId, sig) SimHash signature table — the DataFrame twin of
    :func:`simhash`, bit-identical per document but built the shape
    codegen likes (r14, guide §4.2/§2.3): explode distinct tokens,
    derive the 32-bit md5 value once per token row, and fold the
    per-bit ±1 votes as ``bits`` plain ``SUM`` aggregates with
    map-side partial aggregation. The column form's nested
    ``aggregate``/``zip_with`` lambdas are interpreted per token ×
    per bit; here every step is a WholeStageCodegen expression and
    the only wide operation is one groupBy(docId) exchange.

    Vote parity: bit b of ``conv(substr(md5(tok),1,8),16,10)`` is
    exactly the hex-digit-map bit the column fold extracts, summed
    over the same ``array_distinct`` token set; sign and packing
    match term for term (A/B'd bit-exact on the sf0.1 corpus).

    Null/empty contract (matches :func:`simhash`): null text → null
    sig; tokenless text → all votes tie at 0 → sig 0. The
    ``explode_outer`` keeps tokenless docs as a single null-token
    row, so every input row survives into the aggregate.

    Ids are assumed unique (the documented pipeline runs exact dedup
    first): rows sharing an id merge into ONE signature here (votes
    sum across rows), where the column form scored each row
    independently — the DuckDB-oracle semantics, which also key by
    id.
    """
    if bits > 32:
        raise ValueError(
            f"simhash_table: bits={bits} exceeds the 32 bits of hash "
            "material derived per token (first 8 md5 hex digits)"
        )
    toks = F.array_distinct(tokens(F.lower(F.col(text_col))))
    staged = df.select(
        F.col(id_col).alias("docId"),
        F.col(text_col).isNull().alias("_tnull"),
        F.explode_outer(toks).alias("_tok"),
    ).select(
        "docId",
        "_tnull",
        F.conv(F.substring(F.md5(F.col("_tok")), 1, 8), 16, 10)
        .cast("long")
        .alias("_v"),
    )
    votes = [
        F.sum(
            F.when(
                F.col("_v").isNotNull(),
                F.shiftright(F.col("_v"), b).bitwiseAND(F.lit(1)) * 2 - 1,
            )
        ).alias(f"_b{b}")
        for b in range(bits)
    ]
    agg = staged.groupBy("docId").agg(F.max("_tnull").alias("_tnull"), *votes)
    sig = None
    for b in range(bits):
        term = (
            F.when(
                F.col(f"_b{b}") > 0,
                F.shiftleft(F.lit(1).cast("long"), b),
            )
            .otherwise(F.lit(0).cast("long"))
        )
        sig = term if sig is None else sig + term
    return agg.select(
        "docId",
        F.when(F.col("_tnull"), F.lit(None).cast("long"))
        .otherwise(sig)
        .alias("sig"),
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    hot_bucket_ceiling: "int | None" = 10_000,
    on_hot_bucket: str = "raise",
) -> DataFrame:
    """SimHash near-dup candidate generation + verification — the
    Manku, Jain, Das Sarma (2007) web-crawl dedup design: split each
    ``bits``-bit signature into ``bands`` contiguous blocks; any two
    documents sharing at least one exact block become candidates; a
    candidate pair survives iff the FULL-signature Hamming distance
    is <= ``max_hamming``. Pigeonhole guarantee: a pair with Hamming
    distance <= bands-1 differs in at most bands-1 blocks, so at
    least one block matches — with the defaults (4 bands, radius 3)
    recall is EXACT, not probabilistic; raising max_hamming beyond
    bands-1 trades recall for a wider radius.

    Scale shape (r14 grouped Arrow kernel — the semantic_dedup
    device, guide §4.2): the signature fold is ONE codegen'd
    explode+sum pass (:func:`simhash_table`), then one exchange on
    (bandIdx, blockVal) feeds a grouped kernel that scores each
    bucket's m×m Hamming matrix blockwise in numpy (16-bit popcount
    lookups on the XOR) and emits ONLY surviving pairs. The former
    slice-explode form materialized Σm² candidate ROWS per band —
    measured 9.5M rows filtering to 1.57M at sf0.1, and at scale
    every bucket is |corpus|/2^w — where the kernel's candidate
    checks are ~1ns array cells that never exist as Spark rows.

    Cross-band dedup is free (min-band emission): the kernel sees
    both full signatures, so a pair is emitted only from the FIRST
    band whose blocks match — globally unique with no distinct()
    exchange over the pair stream. Buckets are hash-spread with an
    explicit REPARTITION_BY_NUM to the session's configured shuffle
    partitions (skew.py rationale: AQE sizes this tiny-bytes,
    compute-heavy stage to one task otherwise).

    The per-block buckets carry the same degenerate-family hazard as
    LSH bands; the ``hot_bucket_ceiling``/``on_hot_bucket`` contract
    moves INTO the kernel (it sees each bucket's row count directly):
    raise mode aborts with the bucket's size before the quadratic
    scoring, cap mode drops the bucket. Per-bucket memory is bounded
    by the ceiling and the blockwise matmul tile.

    Output: (leftId, rightId, hammingDist), deduplicated across
    blocks. Rows sharing an id never pair (as before); duplicate-id
    inputs are deduplicated within a bucket, and ids are assumed
    unique across rows (exact dedup precedes in the documented
    pipeline) — an id carrying two DIFFERENT signatures may emit a
    duplicate triple from two buckets, where the old global distinct
    collapsed it.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    if bits % bands != 0:
        raise ValueError(f"simhash_pairs: bits {bits} not divisible by bands {bands}")
    validate_on_hot(on_hot_bucket, "simhash_near_dup_pairs")
    w = bits // bands
    mask = (1 << w) - 1
    base = simhash_table(df, text_col, id_col, bits)
    blocks = base.select(
        "docId",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), i * w).bitwiseAND(F.lit(mask))
                    for i in range(bands)
                ]
            )
        ).alias("bandIdx", "blockVal"),
    )

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"leftId {id_type}, rightId {id_type}, hammingDist int"
    # 16-bit popcount lookup, built once on the driver and shipped in
    # the closure (64 KB); two lookups cover the <=32-bit signatures.
    popcnt = np.array([bin(i).count("1") for i in range(65536)], dtype=np.uint8)
    ceiling = hot_bucket_ceiling
    capped = on_hot_bucket == "cap"

    def _bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"leftId": [], "rightId": [], "hammingDist": []}
        )
        m = len(pdf)
        if ceiling is not None and m > ceiling:
            if capped:
                return empty
            raise ValueError(
                f"simhash_near_dup_pairs hot-bucket guard: a bucket holds "
                f"{m} occurrences (> ceiling {ceiling}); the pair scoring "
                "is quadratic per bucket. Pass on_hot_bucket='cap' to "
                "exclude degenerate buckets, or raise hot_bucket_ceiling."
            )
        sig_na = pdf["sig"].isna().to_numpy()
        if sig_na.any():
            pdf = pdf[~sig_na]
            m = len(pdf)
        if m < 2:
            return empty
        band = int(pdf["bandIdx"].iloc[0])
        idvals = pdf["docId"].to_numpy()
        key = idvals
        if key.dtype == object:
            # bytes compare == Spark UTF8String binary order
            key = np.array([k.encode("utf-8") for k in idvals], dtype=object)
        order = np.argsort(key, kind="stable")
        ids = idvals[order]
        sigs = pdf["sig"].to_numpy()[order].astype(np.int64).view(np.uint64)
        has_dup_ids = bool(pd.Series(ids).duplicated().any())
        col = np.arange(m)
        bs = max(1, min(4096, 8_000_000 // m))
        out_l, out_r, out_d = [], [], []
        for i0 in range(0, m, bs):
            i1 = min(i0 + bs, m)
            x = sigs[i0:i1, None] ^ sigs[None, :]
            d = popcnt[x & 0xFFFF] + popcnt[x >> 16]
            keep = (
                (d <= max_hamming)
                & (col[None, :] > col[i0:i1, None])
                & (ids[None, :] != ids[i0:i1, None])
            )
            ri, ci = np.nonzero(keep)
            if band and len(ri):
                # min-band emission: skip pairs already matched by an
                # earlier band (their block XOR is zero there)
                xv = x[ri, ci]
                surv = np.ones(len(ri), dtype=bool)
                for b in range(band):
                    surv &= ((xv >> (w * b)) & mask).astype(bool)
                ri, ci = ri[surv], ci[surv]
            if not len(ri):
                continue
            out_l.append(ids[i0:i1][ri])
            out_r.append(ids[ci])
            out_d.append(d[ri, ci])
        if not out_l:
            return empty
        out = pd.DataFrame(
            {
                "leftId": np.concatenate(out_l),
                "rightId": np.concatenate(out_r),
                "hammingDist": np.concatenate(out_d).astype(np.int32),
            }
        )
        if has_dup_ids:
            out = out.drop_duplicates()
        return out

    _bucket.__annotations__ = {"pdf": pd.DataFrame, "return": pd.DataFrame}
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        blocks.repartition(n, "bandIdx", "blockVal")
        .groupBy("bandIdx", "blockVal")
        .applyInPandas(_bucket, out_schema)
    )


def _band_hashes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int,
    band_size: int,
) -> DataFrame:
    """(docId, bandIdx, bandHash) for a corpus — the shared banding
    step of the batch self-join and the incremental index join."""
    sigs = minhash_signatures(df, text_col, id_col, num_perm)
    return (
        sigs.withColumn("bandIdx", (F.col("perm") / band_size).cast("int"))
        .groupBy("docId", "bandIdx")
        .agg(
            F.md5(
                F.concat_ws("|", F.sort_array(F.collect_list("minHash")))
            ).alias("bandHash")
        )
    )


def lsh_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """The corpus LSH band table (docId, bandIdx, bandHash) as a
    PERSISTABLE index — the production at-rest shape of incremental
    dedup: band the full corpus ONCE, write the result bucketed by
    (bandIdx, bandHash) (``session.write_bucketed``, or the
    ``lsh_band_index`` pipeline step), and every subsequent delta
    batch joins into it with NO shuffle on the index side — the
    bucketed scan already provides HashPartitioning on the join keys,
    so per-batch cost scales with |delta| while the 100 TB corpus is
    never re-banded or re-shuffled.

    Band parameters (``num_perm``, ``band_size``) are part of the
    index's identity: a delta banded with different parameters never
    matches, so store them with the table (the pipeline step embeds
    them as table properties) and pass the same values to
    ``incremental_lsh_candidates``.
    """
    return _band_hashes(df, text_col, id_col, num_perm, band_size)


def load_lsh_band_index(
    spark,
    table_name: str,
    num_perm: int = 8,
    band_size: int = 2,
    hot_bucket_ceiling: "int | None" = None,
) -> DataFrame:
    """Load a persisted band-index table (written by the
    ``lsh_band_index`` step) with its band parameters VALIDATED
    against the table properties the step pinned. Band parameters are
    the index's identity — a delta banded with different ``num_perm``
    or ``band_size`` produces hashes that never match the index, so a
    mismatch silently yields zero candidates — this loader turns that
    silent wrong answer into a loud error at plan time.

    With ``hot_bucket_ceiling`` set, the step-certified
    ``max_bucket_count`` property is checked against it too — passing
    means the whole table is certified under the ceiling, so
    ``incremental_lsh_candidates(..., index_guard=False)`` can skip
    its per-batch index-side guard scan (the production pairing; the
    certification was paid once at build time). A table over the
    ceiling, or one missing the property while a ceiling was
    requested, raises.

    Tables written by other means (no properties) load with a pass
    when no ceiling is requested — the caller asserted the parameters
    by choosing them.
    """
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table_name}").collect()
    }
    for prop, expected in [
        ("genetics_spark_coloc.num_perm", num_perm),
        ("genetics_spark_coloc.band_size", band_size),
    ]:
        if prop in props and props[prop] != str(int(expected)):
            raise ValueError(
                f"load_lsh_band_index: {table_name} was built with "
                f"{prop.rsplit('.', 1)[1]}={props[prop]} but the caller "
                f"expects {expected}; a banding mismatch never matches any "
                "delta hash and silently yields zero candidates. Re-band "
                "the index or pass the table's own parameters."
            )
    if hot_bucket_ceiling is not None:
        recorded = props.get("genetics_spark_coloc.max_bucket_count")
        if recorded is None:
            raise ValueError(
                f"load_lsh_band_index: {table_name} carries no certified "
                "max_bucket_count property (not written by the "
                "lsh_band_index step?); cannot certify "
                f"hot_bucket_ceiling={hot_bucket_ceiling} — load without a "
                "ceiling and keep index_guard=True instead"
            )
        if int(recorded) > hot_bucket_ceiling:
            raise ValueError(
                f"load_lsh_band_index: {table_name} certifies "
                f"max_bucket_count={recorded} > requested ceiling "
                f"{hot_bucket_ceiling}; the pair join is quadratic per "
                "bucket. Strip boilerplate and rebuild the index, or raise "
                "the ceiling."
            )
    return spark.table(table_name)


def incremental_exact_dedup(
    delta: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup of a NEW batch against an EXISTING corpus — the
    shape every production crawl pipeline actually runs (today's
    shard vs the historical index), instead of re-deduplicating the
    whole corpus per batch. ``index`` only needs (id, text) — in
    production you persist just the content-hash column and pass
    that via an identically-named ``text_col``.

    Two marks per delta document: ``dupOfIndex`` (content hash seen
    in the index — a LEFT SEMI join against the distinct index
    hashes, so the index side shuffles only 16-byte keys) and
    ``dupWithinDelta`` (an earlier delta doc, smaller id, has the
    same hash — one window over the delta only). ``keep`` = neither.

    Emits (docId, contentHash, dupOfIndex, dupWithinDelta, keep).
    """
    d = delta.select(
        F.col(id_col).alias("docId"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("contentHash"),
    )
    idx_hashes = index.select(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("contentHash")
    ).distinct()
    w = Window.partitionBy("contentHash").orderBy("docId")
    marked = (
        d.join(
            idx_hashes.withColumn("_inIndex", F.lit(True)),
            on="contentHash",
            how="left",
        )
        .withColumn("dupOfIndex", F.coalesce(F.col("_inIndex"), F.lit(False)))
        .withColumn("dupWithinDelta", F.row_number().over(w) > 1)
    )
    return marked.select(
        "docId",
        "contentHash",
        "dupOfIndex",
        "dupWithinDelta",
        (~F.col("dupOfIndex") & ~F.col("dupWithinDelta")).alias("keep"),
    )


def incremental_lsh_candidates(
    delta: DataFrame,
    index: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    band_size: int = 2,
    hot_bucket_ceiling: "int | None" = 10_000,
    on_hot_bucket: str = "raise",
    index_bands: DataFrame | None = None,
    index_guard: bool = True,
    delta_bands: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidates of a NEW batch against an EXISTING corpus:
    band the delta, join it against the INDEX's band table — never
    delta×delta, never index×index, so per-batch cost scales with
    |delta|, not |corpus|.

    Two ways to supply the index side, exactly one required:

    - ``index_bands``: the PERSISTED band table — (docId, bandIdx,
      bandHash) rows built by ``lsh_band_index`` (with the SAME
      ``num_perm``/``band_size``) and written bucketed by (bandIdx,
      bandHash). This is the production path: the corpus is banded
      once at index-build time, and reading the bucketed table gives
      the join (and the guard's count aggregate) HashPartitioning on
      the join keys for free, so NOTHING on the index side shuffles
      per delta batch (plan-pinned in tests/test_plan_quality.py).
    - ``index``: the raw corpus — banded inline per call. Convenient
      for self-contained runs and oracles; at 100 TB the re-banding
      IS the per-batch cost, so production uses ``index_bands``.

    The per-bucket fan-out is |delta bucket| × |index bucket|: a
    boilerplate family hot on BOTH sides is the same quadratic hazard
    as the self-join generators, so the shared hot-bucket guard
    (functions/guards.py) applies to EACH side independently —
    ``raise`` (default) aborts loudly on any bucket over
    ``hot_bucket_ceiling`` occurrences (bit-identical output when
    nothing is hot), ``cap`` excludes hot buckets, ``None`` disables.

    ``index_guard=False`` skips the INDEX side's per-batch guard scan
    — pass it ONLY when the index is already certified under the
    ceiling, i.e. loaded via ``load_lsh_band_index(...,
    hot_bucket_ceiling=...)`` from a table the ``lsh_band_index`` step
    built (the step certifies max bucket occupancy once at build
    time and pins it as a table property). The certification replaces
    a full index scan per delta batch with a table-property check at
    load time; the delta side stays guarded regardless.

    Emits distinct (deltaId, indexId) candidate pairs; feed them to
    ngram_jaccard for exact verification, exactly like the batch
    pipeline.
    """
    if (index is None) == (index_bands is None):
        raise ValueError(
            "incremental_lsh_candidates: pass exactly one of index (raw "
            "corpus, banded inline) or index_bands (persisted band table "
            "from lsh_band_index)"
        )
    if not index_guard and index_bands is None:
        raise ValueError(
            "incremental_lsh_candidates: index_guard=False requires "
            "index_bands — only a persisted index certified by "
            "load_lsh_band_index(hot_bucket_ceiling=...) may skip the "
            "per-batch guard; an inline-banded corpus is never certified"
        )
    # checkpoint the delta band table: the guard (counts + semi
    # probe) and the join each re-derive it otherwise — three corpus
    # scans + shingle hashes (see lsh_candidate_pairs). A caller that
    # ALSO needs the delta's bands (e.g. for intra-delta self pairs)
    # passes its own (docId, bandIdx, bandHash) table via
    # ``delta_bands`` so the shingle→minhash chain runs once, not
    # twice (r14); it must be built with the same num_perm/band_size.
    dbands = guard_hot_buckets(
        (
            delta_bands
            if delta_bands is not None
            else _band_hashes(
                delta, text_col, id_col, num_perm, band_size
            ).localCheckpoint(eager=False)
        ),
        ["bandIdx", "bandHash"],
        hot_bucket_ceiling,
        on_hot_bucket,
        "incremental_lsh_candidates(delta)",
    )
    if index_bands is not None:
        # persisted path: NO checkpoint — a localCheckpoint would
        # materialize to the driver-local store and DESTROY the
        # bucketed scan's HashPartitioning, reintroducing the very
        # exchange the persisted layout exists to avoid
        ibands = (
            index_bands
            if not index_guard
            else guard_hot_buckets(
                index_bands,
                ["bandIdx", "bandHash"],
                hot_bucket_ceiling,
                on_hot_bucket,
                "incremental_lsh_candidates(index)",
            )
        )
    else:
        ibands = guard_hot_buckets(
            _band_hashes(index, text_col, id_col, num_perm, band_size).localCheckpoint(
                eager=False
            ),
            ["bandIdx", "bandHash"],
            hot_bucket_ceiling,
            on_hot_bucket,
            "incremental_lsh_candidates(index)",
        )
    return (
        dbands.alias("d")
        .join(
            ibands.alias("i"),
            on=[
                F.col("d.bandIdx") == F.col("i.bandIdx"),
                F.col("d.bandHash") == F.col("i.bandHash"),
            ],
        )
        .select(
            F.col("d.docId").alias("deltaId"),
            F.col("i.docId").alias("indexId"),
        )
        .distinct()
    )


def exact_dedup_keep_best(
    df: DataFrame,
    text_col: str,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Exact dedup with a QUALITY-AWARE keeper: within each identical-
    content group keep the row with the highest score (ties → smallest
    id) — the production policy when duplicates differ in sidecar
    quality (crawl snapshot date, decode fidelity, metadata richness)
    and "smallest id" would discard the best copy.

    Same single hash-groupBy as :func:`exact_dedup`; the argmax rides
    a max(struct(hasScore, score, negated id)) aggregate, so no window
    and no second shuffle. Null AND NaN scores rank below any real
    score (Spark's native ordering puts NaN ABOVE every double, which
    would let a NaN-scored copy steal the keeper slot); a group with
    no real scores keeps its smallest id with null keeperScore. An
    explicit hasScore flag — not a -inf sentinel — drives the
    null-ness of keeperScore, so a legitimate score of exactly -inf is
    reported as -inf, not null.

    Returns (contentHash, keeperId, keeperScore, nCopies).
    """
    # max(struct) compares fields left to right: hasScore first (any
    # scored row beats any null/NaN-scored one), score desc next; for
    # the id tiebreak SMALLEST must win under max() so the struct
    # carries -id
    score = F.col(score_col).cast("double")
    has_score = score.isNotNull() & ~F.isnan(score)
    arg = F.struct(
        has_score.cast("int").alias("hasScore"),
        F.when(has_score, score).otherwise(F.lit(0.0)).alias("s"),
        (-F.col(id_col)).alias("negId"),
    )
    return (
        df.select(
            F.md5(F.col(text_col)).alias("contentHash"),
            F.col(id_col),
            F.col(score_col),
        )
        .groupBy("contentHash")
        .agg(
            F.max(arg).alias("_best"),
            F.count(F.lit(1)).alias("nCopies"),
        )
        .select(
            "contentHash",
            (-F.col("_best.negId")).cast("long").alias("keeperId"),
            F.when(
                F.col("_best.hasScore") == 1, F.col("_best.s")
            ).alias("keeperScore"),
            "nCopies",
        )
    )
