"""Portable Bloom filter: compact broadcastable membership pre-filter.

The decontamination / keep-list operators ship exact key sets to every
task (broadcast semi/anti-join). At 100 TB the holdout key set itself
can be tens of GB — too big to broadcast exactly. The standard fix is
a Bloom filter: build an m-bit array over the small side, broadcast
the *bits* (m/8 bytes regardless of key count), drop the vast
majority of non-members map-side, and exact-verify only the survivors
with the join. False positives cost a wasted exact check; false
negatives cannot happen.

This implementation is deliberately *portable*: positions come from
the md5-based ``h60`` hash and the array is (word_idx, 62-bit word)
rows, so a DuckDB oracle rebuilds the identical filter and the gate
hashes the whole pipeline — bits, hit counts, false-positive counts.
(Spark's built-in ``bloom_filter_agg`` is JVM-internal and cannot be
cross-checked; on a parity-free deployment it is a drop-in.)

Layout: ``m_words`` 64-bit BIGINT words using only bits 0..61 —
bit 62/63 stay clear of BIGINT sign/overflow semantics differences.
``k`` independent positions per key via seeded h60.

Scale shape: build is explode(k) → bit_or groupBy word_idx — output
is AT MOST ``m_words`` rows no matter how many keys went in (words no
key touched are absent; the probe coalesces them to zero). Probe
side joins on word_idx against a broadcast of those m_words rows:
map-side, no shuffle of the probed corpus.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from huckli_spark.functions.portable import h60, sql_h60

BITS_PER_WORD = 62


def _position(key: Column, seed: int, m_bits: int) -> Column:
    """i-th bloom position of a key: pmod keeps it non-negative."""
    return F.pmod(h60(F.concat(F.lit(f"bloom{seed}:"), key)), F.lit(m_bits))


def bloom_build(
    df: DataFrame, key_col: str, m_words: int = 64, k: int = 4
) -> DataFrame:
    """Build the filter: (word_idx, bits) rows, ≤ m_words of them.

    Words never touched by any key are absent (probe coalesces to 0),
    so the build output is minimal and the groupBy is map-combined.
    """
    m_bits = m_words * BITS_PER_WORD
    pos = F.array(*[_position(F.col(key_col), i, m_bits) for i in range(k)])
    p = df.select(F.explode(pos).alias("p")).select(
        F.expr(f"cast(p div {BITS_PER_WORD} as bigint)").alias("word_idx"),
        # SQL-form shiftleft: the python helper takes only a literal count
        F.expr(f"shiftleft(cast(1 as bigint), cast(p % {BITS_PER_WORD} as int))").alias(
            "bit"
        ),
    )
    return p.groupBy("word_idx").agg(F.bit_or("bit").alias("bits"))


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_words: int = 64,
    k: int = 4,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Append ``out_col``: true iff all k bits of the key are set.

    ``m_words``/``k`` MUST match the build call — mismatched geometry
    probes the wrong positions and can produce FALSE NEGATIVES,
    breaking the one guarantee a Bloom filter makes. Prefer
    ``bloom_filter_keys``, which threads one parameter set through
    build and probe.

    The filter is broadcast (≤ m_words rows); the probe explodes each
    DISTINCT key to its k (word_idx, mask) probes, left-joins the words
    and requires every probe to land on a set bit. Probing distinct
    keys is load-bearing, not an optimization: with duplicate keys the
    per-key hit sum would be n_dups*k != k and a true member would be
    reported false — a false negative, the one failure a Bloom filter
    must never have. The per-key verdict then joins back onto the
    original rows, so duplicates all carry the same (correct) verdict.
    The probed relation shuffles only on its own key for the regroup —
    at scale, fuse this with a downstream per-key aggregate or use the
    expression form via a collected words array when m_words is tiny.
    """
    m_bits = m_words * BITS_PER_WORD
    keys = df.select(key_col).distinct()
    probes = F.array(*[_position(F.col(key_col), i, m_bits) for i in range(k)])
    e = keys.select(F.col(key_col), F.posexplode(probes).alias("i", "p")).select(
        key_col,
        "i",
        F.expr(f"cast(p div {BITS_PER_WORD} as bigint)").alias("word_idx"),
        F.expr(f"shiftleft(cast(1 as bigint), cast(p % {BITS_PER_WORD} as int))").alias(
            "mask"
        ),
    )
    j = e.join(F.broadcast(bloom), "word_idx", "left").withColumn(
        "hit", (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))) != 0
    )
    agg = j.groupBy(key_col).agg(
        (F.sum(F.when(F.col("hit"), 1).otherwise(0)) == F.lit(k)).alias(out_col)
    )
    return df.join(agg, key_col, "left")


def bloom_filter_keys(
    candidates: DataFrame,
    key_col: str,
    members: DataFrame,
    member_key: str,
    m_words: int = 64,
    k: int = 4,
) -> DataFrame:
    """Pre-filter + exact verify: the full decontamination-at-scale
    composition. Returns candidates with ``bloom_hit`` (pre-filter
    verdict) and ``is_member`` (exact, join only over bloom survivors).
    """
    bits = bloom_build(members.select(F.col(member_key).alias(key_col)), key_col,
                       m_words, k)
    probed = bloom_probe(candidates, key_col, bits, m_words, k)
    # Distinct surviving keys: duplicate candidates must not multiply
    # rows through the verdict join (each key carries ONE verdict row).
    survivors = probed.where(F.col("bloom_hit")).select(key_col).distinct()
    exact = survivors.join(
        members.select(F.col(member_key).alias(key_col)).distinct(),
        key_col,
        "left_semi",
    ).select(F.col(key_col), F.lit(True).alias("is_member"))
    return probed.join(exact, key_col, "left").fillna({"is_member": False})


# ------------------------------------------------------------------ SQL twins
def sql_bloom_position(expr: str, seed: int, m_bits: int) -> str:
    seeded = f"'bloom{seed}:' || ({expr})"
    return f"{sql_h60(seeded)} % {m_bits}"


def sql_bloom_build_cte(key_query: str, m_words: int = 64, k: int = 4) -> str:
    """CTE text producing (word_idx, bits) identical to bloom_build.
    ``key_query`` must yield one column named ``key``."""
    m_bits = m_words * BITS_PER_WORD
    pos = ", ".join(sql_bloom_position("key", i, m_bits) for i in range(k))
    return f"""
      SELECT CAST(p // {BITS_PER_WORD} AS BIGINT) AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(p % {BITS_PER_WORD} AS INTEGER)) AS bits
      FROM (SELECT unnest([{pos}]) AS p FROM ({key_query}))
      GROUP BY 1
    """
