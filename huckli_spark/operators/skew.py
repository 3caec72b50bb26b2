"""Skew-handling operators: salting patterns for hot keys.

What Spark already covers (do NOT hand-roll these):
- algebraic aggregates (sum/count/min/max/avg): map-side partial
  aggregation collapses hot keys before the shuffle;
- skewed sort-merge joins: AQE splits oversized partitions
  (``spark.sql.adaptive.skewJoin.enabled``, on in session.get_spark).

What still needs explicit salting at 100 TB and is provided here:
- holistic aggregates over hot keys (exact count-distinct,
  collect_list-style) — ``two_phase_distinct_count``: shuffle on
  (key, value) first so a hot key spreads across the cluster, then
  count per key;
- joins where BOTH sides are too big to broadcast and one has hot
  keys — ``salted_join``: the big side gets a deterministic per-row
  salt, the small(er) side is replicated across all salts, the join
  key becomes (key, salt) so one hot key fans out over ``n_salts``
  partitions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_row_salt(df: DataFrame, n_salts: int, out_col: str = "__salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of the whole
    row, so re-runs and stage retries salt identically (a rand() salt
    breaks exactly-once semantics under retry)."""
    return df.withColumn(
        out_col, F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(n_salts)).cast("int")
    )


def two_phase_distinct_count(
    df: DataFrame, keys: Sequence[str], value_col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact count-distinct that survives hot keys: phase 1 shuffles on
    (keys..., value) — a hot key's rows spread over the whole cluster
    because the value participates in partitioning — phase 2 counts the
    deduped rows per key (tiny)."""
    deduped = df.select(*keys, value_col).dropDuplicates([*keys, value_col])
    return deduped.groupBy(*keys).agg(F.count("*").alias(out_col))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key salt pattern: big side salted per
    row, small side replicated n_salts times, join on (key, salt).
    Shuffle volume: big unchanged, small x n_salts — use only when the
    small side is too large to broadcast but n_salts copies still fit.
    """
    salted_big = with_row_salt(big, n_salts)
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("__salt")
    replicated = small.select("*", salts)
    out = salted_big.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")


def _sql_lit(v) -> str:
    """Render a collected group value as a safe SQL literal for a
    VALUES relation (backslash-then-quote escaping — the
    unigram_lm._sql_str discipline; ADVICE r08 #4)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return f"{v}L"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    raise TypeError(f"unsupported group literal type: {type(v)!r}")


def _exclusive_prefix(
    hist: DataFrame,
    order,
    val_col: str,
    out_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Two-phase distributed exclusive prefix sum over ``hist`` in
    ``order`` (per ``group_col`` when given): range-partition on
    (group, order), scan each partition locally, collect only the
    per-(partition, group) totals (bounded by shuffle-partitions x
    groups), broadcast the exclusive offsets back. The range
    boundaries come from Spark's sampling and are NOT deterministic —
    but the prefix VALUE at each row is boundary-independent, so the
    result is. The grouped form keeps high-cardinality score domains
    fully distributed: no per-group one-task window, no broadcast of
    the (possibly corpus-sized) histogram itself (ADVICE r08 #2)."""
    from pyspark.sql import Window

    gcols = [group_col] if group_col else []
    h = hist.repartitionByRange(
        *[F.col(g) for g in gcols], order
    ).withColumn("__pid", F.spark_partition_id())
    wloc = (
        Window.partitionBy("__pid", *gcols)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # pid assignment must not be recomputed across actions (a rerun
    # could re-sample different range boundaries): materialize once
    h = h.withColumn(
        "__loc", F.coalesce(F.sum(val_col).over(wloc), F.lit(0))
    ).localCheckpoint(eager=True)
    # None-safe ordering: a NULL group value must sort as its own
    # group (plain tuple compare raises TypeError on None vs str;
    # ADVICE r09 #1) — NULLs first, then values, then pid
    totals = sorted(
        (
            (tuple(r[g] for g in gcols), r["__pid"], r["__t"])
            for r in h.groupBy("__pid", *gcols)
            .agg(F.sum(val_col).alias("__t"))
            .collect()
        ),
        key=lambda rec: (
            tuple((v is not None, v) for v in rec[0]),
            rec[1],
        ),
    )
    off, acc, cur = {}, 0, None
    for gkey, pid, t in totals:
        if gkey != cur:
            cur, acc = gkey, 0
        off[(gkey, pid)] = acc
        acc += t
    if not off:
        return h.withColumn(out_col, F.lit(0).cast("long")).drop(
            "__pid", "__loc", val_col
        )
    # JVM LocalRelation (not a Python RDD): keeps the plan free of
    # applySchemaToPythonRDD scans (the classifier _scores pattern)
    names = ["__opid", *[f"__og{i}" for i in range(len(gcols))], "__off"]
    vals = ", ".join(
        "(" + ", ".join(
            [str(int(pid))] + [_sql_lit(x) for x in gkey] + [f"{int(v)}L"]
        ) + ")"
        for (gkey, pid), v in off.items()
    )
    cols = ", ".join(f"col{i + 1} AS {n}" for i, n in enumerate(names))
    offdf = h.sparkSession.sql(f"SELECT {cols} FROM VALUES {vals}")
    # null-SAFE equality on the group columns: a plain equi-join
    # would silently drop NULL-group rows (NULL != NULL); <=> keys
    # stay BroadcastHashJoin-compatible
    cond = F.col("__pid") == F.col("__opid")
    for i, g in enumerate(gcols):
        cond = cond & F.col(g).eqNullSafe(F.col(f"__og{i}"))
    return (
        h.join(F.broadcast(offdf), cond)
        .withColumn(out_col, (F.col("__loc") + F.col("__off")).cast("long"))
        .drop("__pid", "__opid", "__loc", "__off", val_col,
              *[f"__og{i}" for i in range(len(gcols))])
    )


def exact_ntile(
    df: DataFrame,
    n_tiles: int,
    score_col: str,
    id_col: str,
    out_col: str = "tile",
    ascending: bool = False,
) -> DataFrame:
    """Exact NTILE over (score DESC, id ASC) WITHOUT a single-partition
    global sort (``ascending=True`` flips to score ASC — same
    decomposition, 'higher' becomes 'lower') — the
    distributed-ranking decomposition:

        rank(row) = (# rows with a strictly higher score)      [histogram]
                  + row_number within the row's score group     [window]

    The histogram is one groupBy to at most |score domain| rows (the
    micro-int quality scores are bounded by construction: <= 1e6 + 1
    distinct values regardless of corpus size) with an exclusive
    running sum over those rows; it then broadcasts back onto the
    corpus, and the only corpus-sized window PARTITIONS BY SCORE —
    per-partition work is bounded by the largest tie group instead of
    the whole table. The tile number derives from the rank in-row
    with the standard NTILE split (first n MOD t tiles get the extra
    row), so the result is bit-identical to
    ``ntile(t) OVER (ORDER BY score DESC, id)``: Spark's global-window
    NTILE executes in ONE task over ALL rows, which is exactly the
    plan that cannot survive a 100 TB corpus.

    The histogram's exclusive running sum is itself DISTRIBUTED
    (round-8 continuation): range-partition the histogram by score
    order, scan locally per partition, collect only the per-partition
    TOTALS (bounded by the shuffle-partition count), and broadcast
    the exclusive offsets back — the classic two-phase parallel
    prefix sum. That removes the earlier one-task bound for
    high-cardinality scores (e.g. near-unique monetary values in
    q_rfm_segments); range boundaries come from sampling but cannot
    affect the RESULT, only the split points. The prefix value at a
    score is boundary-independent.

    Caveat (documented, inherent): a pathologically common single
    score still concentrates its tie group in one partition — ties
    are the irreducible sequential part of exact ranking. For
    tie-free or bounded-tie scores this is fully parallel.
    """
    from pyspark.sql import Window

    n = df.count()
    order = F.asc(score_col) if ascending else F.desc(score_col)
    hist = df.groupBy(score_col).agg(F.count("*").alias("__c"))
    hist = _exclusive_prefix(hist, order, "__c", "__higher")
    wg = Window.partitionBy(score_col).orderBy(F.asc(id_col))
    # NO broadcast hint on the histogram: for near-unique scores
    # (q_rfm_segments' monetary_cents) it is ~corpus-sized, and a
    # forced broadcast re-creates the scale bottleneck one level down
    # (ADVICE r08 #2). The equi-join on score shuffles both sides;
    # AQE still size-bound-broadcasts genuinely small domains.
    ranked = df.join(hist, score_col).withColumn(
        "__rank", (F.col("__higher") + F.row_number().over(wg)).cast("long")
    )
    q, r = divmod(n, n_tiles)
    if q == 0:
        tile = F.col("__rank")  # fewer rows than tiles: tile i = rank i
    else:
        big = F.lit(r * (q + 1))
        tile = (
            F.when(
                F.col("__rank") <= big,
                F.floor((F.col("__rank") - 1) / F.lit(q + 1)) + 1,
            ).otherwise(
                F.lit(r)
                + F.floor((F.col("__rank") - big - 1) / F.lit(q))
                + 1
            )
        )
    return ranked.withColumn(out_col, tile.cast("int")).drop(
        "__higher", "__rank"
    )


def exact_ntile_grouped(
    df: DataFrame,
    n_tiles: int,
    score_col: str,
    id_col: str,
    group_col: str,
    out_col: str = "tile",
    ascending: bool = False,
) -> DataFrame:
    """Per-group exact NTILE over (score DESC, id ASC) WITHOUT a
    one-task-per-group window — the grouped form of
    :func:`exact_ntile`.

    ``ntile(t) OVER (PARTITION BY g ORDER BY ...)`` looks distributed
    but executes each group in ONE task: with a handful of languages
    over a 100 TB corpus that is 20 TB per task. Same decomposition
    as the ungrouped version, everything keyed by group:

        rank = (# rows in MY group with a strictly higher score)
             + row_number within (group, score)

    The histogram aggregates to |groups x score domain| rows — for
    per-document micro scores (q_ccnet_buckets' avg_lp_micro) that is
    ~corpus-sized, so BOTH downstream steps stay distributed (ADVICE
    r08 #2): the per-group exclusive running sum goes through the
    two-phase ``_exclusive_prefix`` keyed by (group, score) — no
    one-task-per-group histogram window — and the histogram joins
    back by a plain shuffle equi-join on (group, score), never a
    forced broadcast. The only corpus-sized window partitions by
    (group, score) — bounded by the largest tie group. Per-group row
    counts (|groups| rows, genuinely tiny) broadcast in so the NTILE
    split (first n MOD t tiles get the extra row) evaluates in-row;
    the result is bit-identical to the partitioned-window NTILE
    (pinned in tests/test_skew.py)."""
    from pyspark.sql import Window

    gn = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    order = F.asc(score_col) if ascending else F.desc(score_col)
    hist = df.groupBy(group_col, score_col).agg(F.count("*").alias("__c"))
    hist = _exclusive_prefix(
        hist, order, "__c", "__higher", group_col=group_col
    )
    wg = Window.partitionBy(group_col, score_col).orderBy(F.asc(id_col))
    # null-safe joins: PARTITION BY groups NULLs together, so a NULL
    # group is a real group here too — plain equi-joins would drop
    # its rows silently (ADVICE r09 #1)
    hist = hist.withColumnRenamed(group_col, "__hg").withColumnRenamed(
        score_col, "__hs"
    )
    gn = gn.withColumnRenamed(group_col, "__gg")
    ranked = (
        df.join(
            hist,
            F.col(group_col).eqNullSafe(F.col("__hg"))
            & F.col(score_col).eqNullSafe(F.col("__hs")),
        )
        .join(F.broadcast(gn), F.col(group_col).eqNullSafe(F.col("__gg")))
        .withColumn(
            "__rank",
            (F.col("__higher") + F.row_number().over(wg)).cast("long"),
        )
        .drop("__hg", "__hs", "__gg")
    )
    q = (F.col("__n") / n_tiles).cast("long")  # floor: __n, t >= 0
    r = F.col("__n") % n_tiles
    big = r * (q + 1)
    tile = (
        F.when(q == 0, F.col("__rank"))
        .when(
            F.col("__rank") <= big,
            F.floor((F.col("__rank") - 1) / (q + 1)) + 1,
        )
        .otherwise(r + F.floor((F.col("__rank") - big - 1) / q) + 1)
    )
    return ranked.withColumn(out_col, tile.cast("int")).drop(
        "__higher", "__rank", "__n"
    )
