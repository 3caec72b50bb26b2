"""Training-sequence packing: concat-and-chunk documents into
fixed-token-budget training rows.

GPT-style pretraining packs documents back-to-back (with an EOS
between) and slices the concatenated stream at a fixed context-window
budget. On a cluster the stream must be built per shard — a global
concatenation order would serialize the corpus — so the operator:

1. assigns every document to a shard by portable hash (deterministic,
   partitioning-invariant),
2. fixes a deterministic document order *within* the shard (hash
   rank; production pipelines often shuffle-by-hash exactly like this
   for mixing),
3. computes each document's exclusive running token offset with one
   window pass, and
4. derives the training-sequence (bin) index and intra-bin offset by
   integer division — a document straddling a boundary belongs to the
   bin where it starts, exactly like the chunked token stream.

All arithmetic is integer, so a DuckDB oracle reproduces every
(shard, bin, offset) bit-identically. One shuffle (by shard for the
window); at 100 TB shards are the parallelism unit and each holds a
bounded token count, so no window partition is unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from huckli_spark.functions.portable import h60


def _resolve_shards(
    df: DataFrame,
    n_shards: int,
    max_shard_rows: "int | None",
    what: str,
) -> int:
    """Shared shard-count guard (VERDICT r12 #3): every packer routes
    a whole shard through ONE task (a window sort or an Arrow group),
    so ``n_shards`` is the memory/parallelism lever. With
    ``max_shard_rows`` set, a driver-side count auto-raises
    ``n_shards`` to ceil(rows / max_shard_rows) — LOUDLY, because the
    shard hash assignment (and therefore the packing) changes with the
    shard count. Pass ``None`` to skip the count and pin ``n_shards``
    exactly (the differential oracles do: a DuckDB replay bakes a
    FIXED shard count, so a guarded auto-raise would silently diverge
    from it — ADVICE r12 #5)."""
    if max_shard_rows is None:
        return n_shards
    if max_shard_rows <= 0:
        raise ValueError(
            f"max_shard_rows must be positive, got {max_shard_rows}"
        )
    import warnings

    total = df.count()
    need = -(-total // max_shard_rows)
    if need > n_shards:
        warnings.warn(
            f"{what}: {total} rows over {n_shards} shards exceeds "
            f"max_shard_rows={max_shard_rows} per shard task; raising "
            f"n_shards to {need} (shard assignment changes — pass "
            "max_shard_rows=None to pin the shard count)",
            UserWarning,
            stacklevel=3,
        )
        return int(need)
    return n_shards


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 8,
    eos_tokens: int = 1,
    order_cols: list | None = None,
    keep_cols: "list[str] | None" = None,
    max_shard_rows: "int | None" = 4_000_000,
    n_tokens_col: "str | None" = None,
) -> DataFrame:
    """Assign every document a (shard, seq_idx, offset_in_seq).

    ``n_tokens`` counts whitespace tokens + ``eos_tokens`` separator —
    unless ``n_tokens_col`` names a PRECOMPUTED count column (model
    tokens from a real tokenizer: a training budget is denominated in
    BPE/unigram tokens, not whitespace words — q_bpe_pack composes
    exactly this). With ``n_tokens_col`` set, ``text_col`` is never
    touched and the caller owns the EOS accounting (``eos_tokens``
    still adds on top; pass 0 when the counts already include it).
    Returns (id, n_tokens, shard, pack_rank, seq_idx, offset_in_seq).

    ``order_cols``: ordering Columns applied WITHIN each shard before
    the id tiebreak (curriculum packing — e.g. quality DESC so every
    shard streams best-first); default is the deterministic hash
    order (uniform shuffle). Columns named there must be present on
    ``df`` and are carried through the token-count projection — which
    only happens when ``order_cols`` is given (ADVICE r08 #5: the CLI
    feeds full documents with arbitrary schemas through this path, so
    a stray input column must never collide with a generated name).

    ``keep_cols``: input column NAMES to carry into the output
    unchanged (requires ``order_cols``; epoch_pack keeps its ``pos``
    this way) — threaded through the shard window, never re-joined.

    ``max_shard_rows`` (default 4M): the per-shard offset window sorts
    each shard inside ONE task, so an unbounded shard is a single-task
    sort at 100 TB — the guard counts rows and auto-raises
    ``n_shards`` loudly when the bound would be exceeded (see
    :func:`_resolve_shards`; ``None`` pins the shard count for the
    fixed-count oracles).
    """
    if budget <= 0 or n_shards <= 0:
        raise ValueError(
            f"budget and n_shards must be positive (got {budget}, {n_shards})"
        )
    n_shards = _resolve_shards(df, n_shards, max_shard_rows,
                               "pack_sequences")
    reserved = {"n_tokens", "shard", "pack_rank", "seq_idx",
                "offset_in_seq", "__ok", "__off"}
    extra = (
        [c for c in df.columns
         if c not in (id_col, text_col, n_tokens_col)]
        if order_cols else []
    )
    clash = sorted(set(extra) & reserved)
    if clash:
        raise ValueError(
            f"input columns {clash} collide with pack_sequences' "
            "generated names; rename or drop them before packing"
        )
    if n_tokens_col is not None and n_tokens_col not in df.columns:
        raise ValueError(
            f"n_tokens_col {n_tokens_col!r} is not an input column"
        )
    keep = list(keep_cols) if keep_cols else []
    missing = sorted(set(keep) - set(extra))
    if missing:
        raise ValueError(
            f"keep_cols {missing} require order_cols and must be "
            "input columns other than the id/text"
        )
    key = F.concat(F.lit("shard:"), F.col(id_col).cast("string"))
    okey = F.concat(F.lit("pack:"), F.col(id_col).cast("string"))
    tok = (
        F.col(n_tokens_col).cast("long") + F.lit(eos_tokens)
        if n_tokens_col
        else F.size(F.split(F.col(text_col), " ")) + F.lit(eos_tokens)
    )
    d = df.select(
        F.col(id_col),
        tok.alias("n_tokens"),
        F.pmod(h60(key), F.lit(n_shards)).alias("shard"),
        h60(okey).alias("__ok"),
        *extra,
    )
    order = list(order_cols) if order_cols else [F.col("__ok")]
    w = Window.partitionBy("shard").orderBy(*order, id_col)
    cum_before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        d.withColumn("pack_rank", F.row_number().over(w))
        .withColumn("__off", cum_before)
        .select(
            id_col,
            *keep,
            "n_tokens",
            "shard",
            "pack_rank",
            # exact integer division (ADVICE r12 #2): the float form
            # (__off / budget).cast('long') loses exactness once the
            # running offset passes 2^53 tokens; `div` (and bigint %,
            # which is already an integer remainder) match the
            # DuckDB oracle's // at every offset.
            F.expr(f"__off div {budget}").alias("seq_idx"),
            (F.col("__off") % budget).alias("offset_in_seq"),
        )
    )


def pack_stats(packed: DataFrame, budget: int = 512) -> DataFrame:
    """Per-(shard, seq) fill accounting from pack_sequences output.

    ``n_starting`` documents start in the sequence; ``tokens_started``
    is their total token mass (spills into later sequences when a doc
    straddles). The packer's efficiency metric is the fraction of
    sequences whose started mass covers the budget.
    """
    return packed.groupBy("shard", "seq_idx").agg(
        F.count("*").alias("n_starting"),
        F.sum("n_tokens").alias("tokens_started"),
        F.min("offset_in_seq").alias("first_offset"),
    )


def length_batches(
    df: DataFrame,
    batch_size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    eos_tokens: int = 1,
    n_subbuckets: int = 16,
) -> DataFrame:
    """LENGTH-BUCKETED batch formation — the padding minimizer on the
    BATCH axis (packing minimizes padding on the sequence axis; a
    dynamic-batching dataloader pads every sequence in a batch to the
    batch max, so batching similar lengths together is the classic
    fairseq/sortish trick). Documents get a deterministic GLOBAL rank
    ordered by (n_tokens, hash, id) and batch = (rank - 1) div
    batch_size — so every batch holds ``batch_size`` near-equal-length
    docs (the last batch may be short), and the hash tiebreak keeps
    same-length docs mixed rather than id-ordered.

    No global sort: the rank is two-phase, the epoch_shuffle
    discipline, with RANGE-aligned composite buckets (n_tokens,
    hash div 2^60/n_subbuckets) — bucket order equals the order key
    because the sub-bucket ranges are contiguous in the hash
    tiebreak, so per-bucket ranks offset into exact global ranks via
    a tiny counts relation (distinct lengths x n_subbuckets; raise
    ``n_subbuckets`` — power of two — when one (length, sub) cell
    would outgrow a task). All-integer, so a DuckDB row_number oracle
    replays every rank and batch bit-identically
    (q_length_batching). Returns (id, n_tokens, rnk, batch_id).
    """
    if batch_size <= 0 or n_subbuckets <= 0:
        raise ValueError(
            f"batch_size and n_subbuckets must be positive (got "
            f"{batch_size}, {n_subbuckets})"
        )
    if n_subbuckets & (n_subbuckets - 1):
        raise ValueError(
            f"n_subbuckets must be a power of two, got {n_subbuckets}"
        )
    key = F.concat(F.lit("batch:"), F.col(id_col).cast("string"))
    sub_width = (1 << 60) // n_subbuckets
    d = df.select(
        F.col(id_col),
        (F.size(F.split(F.col(text_col), " ")) + F.lit(eos_tokens))
        .alias("n_tokens"),
        h60(key).alias("__bk"),
    ).withColumn("__sub", F.expr(f"__bk div {sub_width}"))
    counts = d.groupBy("n_tokens", "__sub").agg(
        F.count("*").alias("__n")
    )
    # tiny relation (distinct lengths x n_subbuckets): the exclusive
    # prefix over the global (length, sub) order
    w_off = (
        Window.orderBy("n_tokens", "__sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "n_tokens",
        "__sub",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_rank = Window.partitionBy("n_tokens", "__sub").orderBy(
        "__bk", id_col
    )
    return (
        d.join(F.broadcast(offsets), ["n_tokens", "__sub"])
        .select(
            id_col,
            "n_tokens",
            (F.col("__off") + F.row_number().over(w_rank)).alias("rnk"),
        )
        .withColumn(
            "batch_id", F.expr(f"(rnk - 1) div {batch_size}")
        )
    )


def batch_pad_report(batched: DataFrame) -> DataFrame:
    """Per-batch PADDING report from :func:`length_batches` output —
    the metric length-bucketing exists to optimize: a dynamic-batching
    loader pads every sequence to the batch max, so pad = max_len x
    n_seqs - tokens, and the pad rate in exact integer ppm (the same
    2^53 discipline as the packing reports). One map-side combined
    groupBy. Returns (batch_id, n_seqs, tokens, max_len, pad_tokens,
    pad_ppm)."""
    return (
        batched.groupBy("batch_id")
        .agg(
            F.count("*").alias("n_seqs"),
            F.sum("n_tokens").alias("tokens"),
            F.max("n_tokens").alias("max_len"),
            (F.max("n_tokens") * F.count("*") - F.sum("n_tokens"))
            .alias("pad_tokens"),
            F.expr(
                "((max(n_tokens) * count(*) - sum(n_tokens)) * 1000000)"
                " div (max(n_tokens) * count(*))"
            ).alias("pad_ppm"),
        )
        .select("batch_id", "n_seqs", "tokens", "max_len",
                "pad_tokens", "pad_ppm")
    )


def pack_frag_report(packed: DataFrame, budget: int = 512) -> DataFrame:
    """Per-shard FRAGMENTATION report for split (concat-and-chunk)
    packing — the metric the pretraining packer trades against the
    SFT packer's padding (no-split pads, split fragments): a doc
    whose offset + n_tokens crosses the budget boundary straddles a
    sequence break, cutting its attention span. From
    :func:`pack_sequences` output: docs, sequences, token mass,
    straddling docs (a doc longer than the budget straddles several
    breaks but counts once), the shard's emitted-sequence count
    (ceil(tokens / budget) — NOT max starting seq, which undercounts
    when the last doc spills past its own boundary), the tail fill
    (every sequence except the last is exactly full, so tail =
    tokens - budget x (n_seqs - 1)), and the straddle rate in exact
    integer ppm (same 2^53 discipline as the no-split fill report).
    One map-side combined aggregation over the assignment relation;
    all-integer, so a DuckDB oracle replays it bit-identically
    (q_pack_frag_report)."""
    straddle = (
        (F.col("offset_in_seq") + F.col("n_tokens")) > F.lit(budget)
    ).cast("long")
    n_seqs = F.expr(f"(sum(n_tokens) + {budget - 1}) div {budget}")
    return (
        packed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            n_seqs.alias("n_seqs"),
            F.sum("n_tokens").alias("tokens"),
            F.sum(straddle).alias("straddlers"),
            (F.sum("n_tokens")
             - F.lit(budget) * (n_seqs - F.lit(1)))
            .alias("tail_tokens"),
            F.expr(
                f"(sum(cast(offset_in_seq + n_tokens > {budget} as "
                "long)) * 1000000) div count(*)"
            ).alias("frag_ppm"),
        )
        .select("shard", "n_docs", "n_seqs", "tokens", "straddlers",
                "tail_tokens", "frag_ppm")
    )


def pack_doc_spans(
    packed: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-sequence DOCUMENT SPANS from a :func:`pack_sequences`
    assignment — the relation a dataloader needs to build the
    block-diagonal attention mask over concat-and-chunk packed data
    (attention must not cross document boundaries inside a packed
    sequence; every modern pretraining loader ships these spans or
    the equivalent position/segment-id resets).

    A doc at global in-shard token offset ``off = seq_idx * budget +
    offset_in_seq`` covering ``[off, off + n_tokens)`` touches
    sequences ``seq_idx .. (off + n_tokens - 1) div budget``; its
    slice of sequence ``s`` is ``[max(off, s*budget),
    min(off + n_tokens, (s+1)*budget))``. The explode emits exactly
    the touched sequences — ``ceil(n_tokens/budget) + 1`` rows per
    doc at most, so fan-out is proportional to the doc's own token
    mass, never the corpus — and every expression is integer (the
    ``div``/``%``/``greatest``/``least`` forms are exact past 2^53,
    the same discipline as the packer itself), so a DuckDB
    generate_series oracle replays every span bit-identically
    (q_pack_spans). No shuffle at all: the spans are a map-side
    projection of the assignment relation.

    Returns (shard, seq_idx, <id>, part, n_parts, start_in_seq,
    len_in_seq): ``part`` is the doc's 0-based chunk ordinal,
    ``start_in_seq``/``len_in_seq`` the slice within the sequence.
    Within one (shard, seq_idx) the spans are disjoint and cover the
    sequence exactly (the shard's last sequence ends at its tail).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    off = (F.col("seq_idx") * F.lit(budget) + F.col("offset_in_seq"))
    d = packed.select(
        F.col(id_col),
        "shard",
        "n_tokens",
        off.alias("__off"),
        F.col("seq_idx").alias("__s0"),
        F.expr(
            f"(seq_idx * {budget} + offset_in_seq + n_tokens - 1) "
            f"div {budget}"
        ).alias("__s1"),
    )
    # zero-token docs (possible on the n_tokens_col path with
    # eos_tokens=0) occupy an empty interval and emit NO spans; the
    # filter also keeps the sequence ascending — at off exactly on a
    # budget boundary an empty doc has s1 = s0 - 1, and Spark's
    # sequence() would count DOWN [s0, s1] where DuckDB's
    # generate_series is empty
    e = d.where(F.col("n_tokens") >= 1).select(
        id_col, "shard", "n_tokens", "__off", "__s0", "__s1",
        F.explode(F.sequence("__s0", "__s1")).alias("seq_idx"),
    )
    seq_start = F.col("seq_idx") * F.lit(budget)
    start_g = F.greatest(F.col("__off"), seq_start)
    end_g = F.least(
        F.col("__off") + F.col("n_tokens"), seq_start + F.lit(budget)
    )
    return e.select(
        "shard",
        "seq_idx",
        id_col,
        (F.col("seq_idx") - F.col("__s0")).alias("part"),
        (F.col("__s1") - F.col("__s0") + F.lit(1)).alias("n_parts"),
        (start_g - seq_start).alias("start_in_seq"),
        (end_g - start_g).alias("len_in_seq"),
    )


def pack_segment_ids(
    spans: DataFrame,
    sep: str = " ",
) -> DataFrame:
    """Per-sequence SEGMENT-ID emission from :func:`pack_doc_spans`
    output — the token-aligned form of the attention mask: position
    ``p`` of a packed sequence gets the 0-based ordinal (by start
    offset) of the document covering ``p``, the `segment_ids` array
    HF/T5-style loaders feed next to `input_ids` so attention resets
    at document boundaries.

    Built WITHOUT a token-level explode: sort the (start, len) spans
    in-row, then ``array_repeat`` each segment id ``len`` times and
    flatten — per (shard, seq) the collect and the repeat are both
    budget-bounded (a sequence holds at most ``budget`` docs and
    exactly its token count of ids), so cost is O(budget) per output
    row at any corpus size, the emit_sequences bound. The ids join to
    one string (the gate-friendly q_array_fns convention). Returns
    (shard, seq_idx, n_docs, n_tokens, segment_ids).
    """
    arr = F.sort_array(
        F.collect_list(F.struct("start_in_seq", "len_in_seq"))
    )
    return (
        spans.groupBy("shard", "seq_idx")
        .agg(arr.alias("__spans"))
        .select(
            "shard",
            "seq_idx",
            F.size("__spans").alias("n_docs"),
            F.expr(
                "aggregate(__spans, 0L, (a, x) -> a + x.len_in_seq)"
            ).alias("n_tokens"),
            F.array_join(
                F.flatten(
                    F.expr(
                        "transform(__spans, (x, i) -> "
                        "array_repeat(cast(i as string), "
                        "cast(x.len_in_seq as int)))"
                    )
                ),
                sep,
            ).alias("segment_ids"),
        )
    )


def epoch_shuffle(
    df: DataFrame,
    epochs: int = 2,
    id_col: str = "doc_id",
    n_buckets: int = 256,
    first_epoch: int = 0,
    carry_cols: "list[str] | None" = None,
    max_bucket_rows: "int | None" = 8_000_000,
) -> DataFrame:
    """Deterministic per-epoch GLOBAL training-order permutation —
    every document gets a unique 1-based position per epoch, the
    reproducible "shuffle each epoch" a pretraining dataloader needs,
    with no global sort and no single-partition window.

    Order key = h60('epoch:<e>:<id>') (portable md5 hash — uniform
    over the 60-bit space, different every epoch, reproducible
    forever). The global rank over (key, id) is computed two-phase,
    the distributed-prefix discipline (q_classifier_auc's histogram
    prefix, q_hash_quantiles):

    1. bucket = key div 2^52 — RANGE-aligned buckets of the key
       space, so bucket order == key order and per-bucket ranks can
       be offset into global ranks;
    2. per-(epoch, bucket) counts -> exclusive prefix offsets via a
       window over the TINY epochs x n_buckets relation (never
       corpus-sized);
    3. pos = offset + row_number within (epoch, bucket) ordered by
       (key, id).

    Worst single-task window input is ~n/n_buckets rows — raise
    ``n_buckets`` with the corpus (4096 buckets put a trillion-doc
    epoch at ~250M rows per bucket; buckets stay balanced because the
    key is a hash). Returns (epoch, <id_col>, pos).

    ``first_epoch`` starts the enumeration there (``epochs`` stays the
    COUNT): a per-epoch job — :func:`epoch_pack` — asks for exactly
    its own epoch's permutation without materializing the preceding
    ones; epoch e's keys (and therefore its order) are identical
    whether reached via first_epoch or a longer enumeration.

    ``carry_cols``: input columns to thread through to the output
    unchanged. At 100 TB this is how a consumer gets payload columns
    in epoch order WITHOUT re-joining the corpus against the
    positions (a doc-key sort-merge join costs two more corpus
    shuffles + sorts than riding the rank's one bucket exchange) —
    epoch_pack carries the text this way. Wide columns widen that
    exchange; carry only what the next stage reads.

    ``max_bucket_rows`` (default 8M): positions are INDEPENDENT of
    the bucket count — bucketing is purely internal to the two-phase
    rank — so when a driver-side count shows a bucket would exceed
    the bound, ``n_buckets`` auto-raises to the next power of two
    that honors it, output-unchanged (the permutation tests pin this
    invariance). The explicit ``n_buckets`` still sets the floor;
    pass ``None`` to skip the count and pin the bucket count exactly.
    """
    if epochs <= 0 or n_buckets <= 0:
        raise ValueError(
            f"epochs and n_buckets must be positive (got {epochs}, "
            f"{n_buckets})"
        )
    if first_epoch < 0:
        raise ValueError(f"first_epoch must be >= 0, got {first_epoch}")
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    if max_bucket_rows is not None:
        if max_bucket_rows <= 0:
            raise ValueError(
                f"max_bucket_rows must be positive, got {max_bucket_rows}"
            )
        total = df.count()
        while n_buckets * max_bucket_rows < total:
            n_buckets *= 2
    carry = list(carry_cols) if carry_cols else []
    bad = sorted(
        set(carry) & {"epoch", "pos", "__key", "__bucket", "__n", "__off"}
    ) + sorted(set(carry) - set(df.columns)) + (
        [id_col] if id_col in carry else []
    )
    if bad:
        raise ValueError(
            f"carry_cols {bad} must be input columns distinct from "
            "the id and the generated names (epoch, pos)"
        )
    ep = F.explode(
        F.array(*[F.lit(e) for e in range(first_epoch,
                                          first_epoch + epochs)])
    ).alias("epoch")
    keyed = df.select(F.col(id_col), *carry, ep).select(
        "epoch",
        id_col,
        *carry,
        h60(
            F.concat(
                F.lit("epoch:"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col(id_col).cast("string"),
            )
        ).alias("__key"),
    )
    # exact integer division (ADVICE r11 #1): the float form
    # (__key / width).cast('long') loses precision above 2^53 — keys
    # are 60-bit, so the top key values would round into bucket ==
    # n_buckets. `div` keeps the documented bucket = key div 2^52
    # arithmetic exact at every key value.
    bucket_width = (1 << 60) // n_buckets
    keyed = keyed.withColumn(
        "__bucket", F.expr(f"__key div {bucket_width}")
    )
    counts = keyed.groupBy("epoch", "__bucket").agg(
        F.count("*").alias("__n")
    )
    w_off = (
        Window.partitionBy("epoch")
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "epoch",
        "__bucket",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_rank = Window.partitionBy("epoch", "__bucket").orderBy(
        "__key", id_col
    )
    return (
        keyed.join(F.broadcast(offsets), ["epoch", "__bucket"])
        .select(
            "epoch",
            id_col,
            *carry,
            (F.col("__off") + F.row_number().over(w_rank)).alias("pos"),
        )
    )


def pack_sequences_nosplit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 8,
    eos_tokens: int = 1,
    order: str = "hash",
    max_shard_rows: int | None = 4_000_000,
) -> DataFrame:
    """NO-SPLIT packing (the SFT/instruction-tuning variant): documents
    are placed WHOLE into fixed-budget training sequences — a doc
    never straddles a bin, so no attention mask ever spans a document
    boundary. Greedy NEXT-FIT in the same deterministic per-shard
    hash order as :func:`pack_sequences`: walk the shard's docs; if
    the current bin can't fit the next doc, close it and open a new
    one. A doc longer than the budget gets a bin of its own (flagged
    ``oversize``) — the caller decides whether to truncate upstream.

    The bin walk is inherently sequential per shard — exactly the
    applyInPandas case: state (current bin index + fill) lives inside
    one Arrow-batched pass over each shard's docs, shards run in
    parallel, and a shard's row count is bounded by the sharding
    design, so no group outgrows a task. All arithmetic is integer;
    a DuckDB RECURSIVE CTE replays the walk bit-identically
    (q_pack_nosplit).

    ``order``: 'hash' walks docs in the deterministic per-shard hash
    order (uniform mixing, the pack_sequences convention); 'length'
    walks longest-first (next-fit-DECREASING — the classic bin-packing
    improvement SFT pipelines use to cut padding; same walk, different
    deterministic sort: n_tokens DESC, hash, id).

    A shard materializes as ONE Arrow group inside its task, so
    ``n_shards`` is the memory lever (VERDICT r11 #2). With
    ``max_shard_rows`` set (the default), a driver-side count
    auto-raises ``n_shards`` to ceil(rows / max_shard_rows) when the
    requested shard count would overflow the bound — loudly, via
    UserWarning, since the shard assignment (and therefore the
    packing) changes with the shard count. Pass ``None`` to pin
    ``n_shards`` exactly (the differential oracles do: the RECURSIVE
    CTE replays a FIXED shard count).

    Returns (id, n_tokens, shard, pack_rank, seq_idx, offset_in_seq,
    oversize). ``id`` keeps the input column's type (string keys pack
    the same way long keys do).
    """
    import pandas as pd

    if budget <= 0 or n_shards <= 0:
        raise ValueError(
            f"budget and n_shards must be positive (got {budget}, "
            f"{n_shards})"
        )
    if order not in ("hash", "length"):
        raise ValueError(f"order must be hash|length, got {order!r}")
    n_shards = _resolve_shards(df, n_shards, max_shard_rows,
                               "pack_sequences_nosplit")
    id_type = df.schema[id_col].dataType.simpleString()
    key = F.concat(F.lit("shard:"), F.col(id_col).cast("string"))
    okey = F.concat(F.lit("pack:"), F.col(id_col).cast("string"))
    d = df.select(
        F.col(id_col),
        (F.size(F.split(F.col(text_col), " ")) + F.lit(eos_tokens))
        .alias("n_tokens"),
        F.pmod(h60(key), F.lit(n_shards)).alias("shard"),
        h60(okey).alias("__ok"),
    )
    schema = (
        f"{id_col} {id_type}, n_tokens long, shard int, pack_rank long, "
        "seq_idx long, offset_in_seq long, oversize boolean"
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        if order == "length":
            pdf = pdf.sort_values(
                ["n_tokens", "__ok", id_col],
                ascending=[False, True, True],
            ).reset_index(drop=True)
        else:
            pdf = pdf.sort_values(["__ok", id_col]).reset_index(drop=True)
        seq, fill = 0, 0
        seqs, offs = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > budget:
                seq, fill = seq + 1, 0
            seqs.append(seq)
            offs.append(fill)
            fill += n
        out = pd.DataFrame(
            {
                id_col: pdf[id_col],
                "n_tokens": pdf["n_tokens"],
                "shard": pdf["shard"].astype("int32"),
                "pack_rank": range(1, len(pdf) + 1),
                "seq_idx": seqs,
                "offset_in_seq": offs,
                "oversize": pdf["n_tokens"] > budget,
            }
        )
        return out

    return d.groupBy("shard").applyInPandas(walk, schema)


def emit_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 8,
    eos_token: str = "</s>",
    order_cols: list | None = None,
    max_shard_rows: "int | None" = 4_000_000,
) -> DataFrame:
    """MATERIALIZE the packed training sequences — the final step of
    the pretraining data pipeline: where :func:`pack_sequences` only
    assigns each document a (shard, seq, offset), this emits the
    actual fixed-length token rows the dataloader reads, concat-and-
    chunk semantics (a document's tokens spill into the next sequence
    at the budget boundary; every sequence except a shard's last holds
    exactly ``budget`` tokens).

    Fully relational — no Python in the plan:

    1. tokens = whitespace split + one ``eos_token`` (so token counts
       equal pack_sequences' ``n_tokens`` at eos_tokens=1);
    2. the same per-shard exclusive token offset window as
       pack_sequences (same hash shard, same hash-or-``order_cols``
       walk);
    3. posexplode to per-token rows, global-in-shard position =
       offset + ordinal, sequence = position div budget;
    4. group by (shard, seq) collecting the struct(pos, token) list,
       sorted in-row — each group is budget-bounded, so the collect
       is O(budget) per row at any corpus size.

    The explode-to-token shuffle is the honest cost of re-chunking a
    corpus into fixed windows; rows are narrow (shard, seq, token) and
    every reduce group is <= budget tokens. Returns (shard, seq_idx,
    n_tokens, n_docs, tokens array<string>).

    ``max_shard_rows`` (default 4M): same single-task shard-window
    guard as :func:`pack_sequences` (``None`` pins the shard count —
    the fixed-count oracles require it).
    """
    if budget <= 0 or n_shards <= 0:
        raise ValueError(
            f"budget and n_shards must be positive (got {budget}, "
            f"{n_shards})"
        )
    n_shards = _resolve_shards(df, n_shards, max_shard_rows,
                               "emit_sequences")
    key = F.concat(F.lit("shard:"), F.col(id_col).cast("string"))
    okey = F.concat(F.lit("pack:"), F.col(id_col).cast("string"))
    extra = (
        [c for c in df.columns if c not in (id_col, text_col)]
        if order_cols else []
    )
    reserved = {"shard", "seq_idx", "n_tokens", "n_docs", "tokens",
                "__toks", "__ok", "__off", "__p", "__tok", "__gpos"}
    clash = sorted(set(extra) & reserved)
    if clash:
        raise ValueError(
            f"input columns {clash} collide with emit_sequences' "
            "generated names; rename or drop them before emitting"
        )
    d = df.select(
        F.col(id_col),
        F.concat(
            F.split(F.col(text_col), " "), F.array(F.lit(eos_token))
        ).alias("__toks"),
        F.pmod(h60(key), F.lit(n_shards)).alias("shard"),
        h60(okey).alias("__ok"),
        *extra,
    )
    order = list(order_cols) if order_cols else [F.col("__ok")]
    w = Window.partitionBy("shard").orderBy(*order, id_col)
    cum_before = F.coalesce(
        F.sum(F.size("__toks")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    toks = (
        d.withColumn("__off", cum_before)
        .select(
            id_col,
            "shard",
            "__off",
            F.posexplode("__toks").alias("__p", "__tok"),
        )
        .select(
            id_col,
            "shard",
            (F.col("__off") + F.col("__p")).alias("__gpos"),
            "__tok",
        )
    )
    return (
        toks.groupBy(
            "shard", F.expr(f"__gpos div {budget}").alias("seq_idx")
        )
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_distinct(id_col).alias("n_docs"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("__gpos", "__tok"))),
                lambda s: s["__tok"],
            ).alias("tokens"),
        )
        .select("shard", "seq_idx", "n_tokens", "n_docs", "tokens")
    )


def pack_stats_nosplit(packed: DataFrame, budget: int = 512) -> DataFrame:
    """Per-shard fill accounting for NO-SPLIT packing — the padding
    report the SFT packer exists to optimize (next-fit-decreasing is
    chosen over hash order exactly when this says so). From
    :func:`pack_sequences_nosplit` output: bins, docs, token mass,
    padding (budget - fill over non-oversize bins; an oversize solo
    bin pads nothing), and the fill rate in exact parts-per-million
    (integer division — bit-portable, no float aggregation).
    Returns (shard, n_bins, n_docs, tokens, oversize_bins,
    padding_tokens, fill_ppm)."""
    bins = packed.groupBy("shard", "seq_idx").agg(
        F.count("*").alias("__docs"),
        F.sum("n_tokens").alias("__fill"),
        F.max("oversize").alias("__over"),
    ).select(
        "shard",
        "__docs",
        "__fill",
        "__over",
        F.when(F.col("__over"), F.lit(0))
        .otherwise(F.lit(budget) - F.col("__fill"))
        .alias("__pad"),
        F.when(F.col("__over"), F.col("__fill"))
        .otherwise(F.lit(budget))
        .alias("__cap"),
    )
    return (
        bins.groupBy("shard")
        .agg(
            F.count("*").alias("n_bins"),
            F.sum("__docs").alias("n_docs"),
            F.sum("__fill").alias("tokens"),
            F.sum(F.col("__over").cast("long")).alias("oversize_bins"),
            F.sum("__pad").alias("padding_tokens"),
            # exact integer ppm: the double form loses exactness once
            # tokens * 1e6 passes 2^53 (a few TB of tokens per shard)
            F.expr("(sum(__fill) * 1000000) div sum(__cap)")
            .alias("fill_ppm"),
        )
        .select("shard", "n_bins", "n_docs", "tokens", "oversize_bins",
                "padding_tokens", "fill_ppm")
    )


def _mix_copies(
    weights: "dict[str, float]",
    epoch: int,
    id_col: str,
    source_col: str,
    default_weight: float,
):
    """Per-document copy count for source-weighted mixing, as a pure
    Column: floor(w) plus one more when the per-(epoch, id) hash draw
    falls under frac(w). All-integer micro-weight arithmetic (the
    draw is ``h60('mix:<e>:<id>') % 1e6``); weights must be finite
    and >= 0. Shared by :func:`epoch_mix_shuffle` (replication) and
    :func:`epoch_mix_emit` (whose shard guard SUMS this map-side to
    count mixed rows without executing the rank)."""
    import math

    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("weights must be >= 0")
    if any(not math.isfinite(w) for w in weights.values()) or not (
        math.isfinite(default_weight)
    ):
        raise ValueError("weights must be finite")
    wm = {s: int(w * 1_000_000 + 0.5) for s, w in weights.items()}
    dm = int(default_weight * 1_000_000 + 0.5)
    w_expr = None
    for s, m in sorted(wm.items()):
        cond = F.col(source_col) == s
        w_expr = (F.when(cond, F.lit(m)) if w_expr is None
                  else w_expr.when(cond, F.lit(m)))
    w_expr = F.lit(dm) if w_expr is None else w_expr.otherwise(F.lit(dm))
    draw = F.pmod(
        h60(
            F.concat(
                F.lit(f"mix:{int(epoch)}:"), F.col(id_col).cast("string")
            )
        ),
        F.lit(1_000_000),
    )
    # integer floor of the micro weight; values are < 2^31 so the
    # double division is exact (unlike the 60-bit bucket keys)
    return (w_expr / F.lit(1_000_000)).cast("long") + F.when(
        draw < w_expr % F.lit(1_000_000), F.lit(1)
    ).otherwise(F.lit(0))


def _mix_key(id_col: str, copy_col: str = "copy"):
    """Injective (id, copy) -> string rank key (ADVICE r12 #3): the
    plain id || '#' || copy form is ambiguous when a STRING id itself
    contains '#' (id 'a#1' copy 2 collides with id 'a' copy 1's
    sibling space), which would let two copies tie on an identical
    key and make their order nondeterministic. Length-prefixing the
    id makes the encoding injective — the decimal prefix fixes where
    the id ends, then one '#', then the copy digits."""
    ids = F.col(id_col).cast("string")
    return F.concat(
        F.length(ids).cast("string"),
        F.lit(":"),
        ids,
        F.lit("#"),
        F.col(copy_col).cast("string"),
    )


def epoch_mix_shuffle(
    df: DataFrame,
    weights: "dict[str, float]",
    epoch: int = 0,
    id_col: str = "doc_id",
    source_col: str = "source",
    default_weight: float = 1.0,
    n_buckets: int = 256,
    max_bucket_rows: "int | None" = 8_000_000,
    carry_cols: "list[str] | None" = None,
) -> DataFrame:
    """SOURCE-WEIGHTED per-epoch training order — the data-mixing knob
    of published pretraining recipes ("epochs per source": Wikipedia
    x2.5, code x0.5, ...) composed with the deterministic epoch
    shuffle. Each document yields ``floor(w)`` copies plus one more
    when its per-(epoch, id) hash draw falls under frac(w) — so a
    weight of 2.5 repeats HALF the source's docs 3x and half 2x,
    deterministic forever, a different half each epoch; a weight
    under 1 downsamples the same way; weight 0 drops the source.
    Every copy then gets a unique global position from
    :func:`epoch_shuffle` keyed on (id, copy).

    All arithmetic is integer (weights lift to micro-ints; the draw
    is ``h60('mix:<e>:<id>') % 1e6``), so a DuckDB oracle replays
    every copy count and every position bit-identically
    (q_epoch_mix_shuffle). The weight table bakes into the plan as a
    CASE literal (it is vocabulary-sized); replication is a map-side
    explode; the rank is the same two-phase bucket form as
    epoch_shuffle, keyed on the injective length-prefixed
    :func:`_mix_key` encoding of (id, copy) — safe for string ids
    containing the delimiter (ADVICE r12 #3). Returns (epoch,
    <id_col>, <source_col>, copy, pos, *carry_cols).

    ``carry_cols``: payload columns (e.g. the text) threaded through
    the explode and the rank's bucket exchange unchanged — how
    :func:`epoch_mix_emit` gets tokens in mixed order WITHOUT
    re-joining the corpus against the positions.
    """
    copies = _mix_copies(weights, epoch, id_col, source_col,
                         default_weight)
    carry = list(carry_cols) if carry_cols else []
    bad = sorted(
        set(carry)
        & {id_col, source_col, "copy", "pos", "epoch", "__mix_id",
           "__copies"}
    ) + sorted(set(carry) - set(df.columns))
    if bad:
        raise ValueError(
            f"carry_cols {bad} must be input columns distinct from "
            "the id/source and the generated names (copy, pos, epoch)"
        )
    rep = (
        df.select(
            F.col(id_col),
            F.col(source_col),
            *carry,
            copies.alias("__copies"),
        )
        .where(F.col("__copies") >= 1)
        .select(
            id_col,
            source_col,
            *carry,
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("__copies"))
            ).alias("copy"),
        )
        .select(
            _mix_key(id_col).alias("__mix_id"),
            id_col,
            source_col,
            "copy",
            *carry,
        )
    )
    return epoch_shuffle(
        rep,
        epochs=1,
        id_col="__mix_id",
        n_buckets=n_buckets,
        first_epoch=epoch,
        carry_cols=[id_col, source_col, "copy", *carry],
        max_bucket_rows=max_bucket_rows,
    ).select("epoch", id_col, source_col, "copy", "pos", *carry)


def emit_sequences_nosplit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 8,
    eos_token: str = "</s>",
    order: str = "hash",
    max_shard_rows: "int | None" = 4_000_000,
) -> DataFrame:
    """Materialize the NO-SPLIT (SFT) training sequences: every bin
    from :func:`pack_sequences_nosplit` becomes one row carrying the
    concatenated whole documents — no token ever crosses a document
    boundary mid-bin, so the emitted row is directly usable with
    per-doc attention masks (doc spans are recoverable from the
    assignment relation's offsets).

    Plan: the per-shard Arrow walk produces the assignment, one
    corpus equi-join brings the text back, posexplode places each
    token at offset_in_seq + ordinal (doc spans within a bin are
    disjoint and contiguous, so the in-bin position is unique), and a
    budget-bounded group-collect emits the bin. An oversize doc's
    solo bin exceeds the budget by construction and is flagged.
    Returns (shard, seq_idx, n_tokens, n_docs, oversize,
    tokens array<string>).
    """
    asn = pack_sequences_nosplit(
        df, id_col=id_col, text_col=text_col, budget=budget,
        n_shards=n_shards, order=order, max_shard_rows=max_shard_rows,
    )
    toks = df.select(
        F.col(id_col),
        F.concat(
            F.split(F.col(text_col), " "), F.array(F.lit(eos_token))
        ).alias("__toks"),
    )
    placed = (
        asn.join(toks, id_col)
        .select(
            id_col,
            "shard",
            "seq_idx",
            "oversize",
            "offset_in_seq",
            F.posexplode("__toks").alias("__p", "__tok"),
        )
        .select(
            id_col,
            "shard",
            "seq_idx",
            "oversize",
            (F.col("offset_in_seq") + F.col("__p")).alias("__pos"),
            "__tok",
        )
    )
    return (
        placed.groupBy("shard", "seq_idx")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_distinct(id_col).alias("n_docs"),
            F.max("oversize").alias("oversize"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__tok"))),
                lambda s: s["__tok"],
            ).alias("tokens"),
        )
        .select("shard", "seq_idx", "n_tokens", "n_docs", "oversize",
                "tokens")
    )


def loader_steps(
    packed: DataFrame,
    budget: int = 512,
    start_step: "int | None" = None,
) -> DataFrame:
    """GLOBAL STEP MANIFEST for the packed corpus — the deterministic
    ``step -> (shard, seq)`` mapping a multi-worker dataloader
    consumes: sequence (seq, shard) is read at global step
    ``rank of (seq, shard) in lexicographic order`` (round-robin
    across shards, the standard co-sharded consumption order), which
    is what exact mid-run RESUME needs ("skip to step K" = filter
    ``step >= K``, no state beyond K itself).

    The rank is CLOSED-FORM, not a sort: with ``n_t`` = shard t's
    sequence count (``ceil(tokens/budget)``, the frag-report
    formula — a |shards|-sized relation collected driver-side),

        step(seq, shard) = sum_t min(n_t, seq)
                           + |{t < shard : n_t > seq}|

    bakes as an ``aggregate`` over the literal counts array — so the
    manifest is a map-side projection over the per-shard sequence
    ranges with ZERO shuffle beyond the pack window's, at any corpus
    size (12B sequences at 100 TB / budget 2048: still no exchange).
    The oracle replays a naive ``row_number() OVER (ORDER BY seq_idx,
    shard)`` — the gate proves closed-form == global sort
    bit-identically (q_loader_steps). All arithmetic integer.

    ``start_step``: when set, keep only ``step >= start_step`` (the
    resume cut) — pruned before the explode, so a deep resume skips
    whole shard prefixes without enumerating them. Returns
    (shard, seq_idx, step).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    counts = {
        r["shard"]: r["n"]
        for r in packed.groupBy("shard")
        .agg(F.expr(f"(sum(n_tokens) + {budget - 1}) div {budget}")
             .alias("n"))
        .collect()
    }
    if not counts:
        return packed.sparkSession.createDataFrame(
            [], "shard long, seq_idx long, step long"
        )
    n_shards = max(counts) + 1
    ns = [int(counts.get(s, 0)) for s in range(n_shards)]
    arr = ", ".join(f"{n}L" for n in ns)

    def _step(seq: int, shard: int) -> int:
        return (sum(min(n, seq) for n in ns)
                + sum(1 for n in ns[:shard] if n > seq))

    lo_by_shard = {s: 0 for s in range(n_shards) if ns[s] > 0}
    if start_step is not None:
        k = int(start_step)
        for s in list(lo_by_shard):
            # smallest seq with step >= k (step is monotone in seq);
            # the whole-shard-prefix skip happens HERE, driver-side,
            # so the explode below never enumerates skipped steps
            lo, hi = 0, ns[s]
            while lo < hi:
                mid = (lo + hi) // 2
                if _step(mid, s) >= k:
                    hi = mid
                else:
                    lo = mid + 1
            if lo >= ns[s]:
                del lo_by_shard[s]
            else:
                lo_by_shard[s] = lo
    if not lo_by_shard:
        return packed.sparkSession.createDataFrame(
            [], "shard long, seq_idx long, step long"
        )
    shards = packed.sparkSession.createDataFrame(
        [(s, lo, ns[s]) for s, lo in sorted(lo_by_shard.items())],
        "shard long, lo long, n long",
    )
    seqs = shards.select(
        "shard",
        F.explode(F.expr("sequence(lo, n - 1)")).alias("seq_idx"),
    )
    step = (
        F.expr(f"aggregate(array({arr}), 0L,"
               " (a, x) -> a + least(x, seq_idx))")
        + F.expr(f"aggregate(slice(array({arr}), 1, cast(shard as int)),"
                 " 0L, (a, x) -> a + cast(x > seq_idx as long))")
    )
    # no post-explode filter: step is strictly increasing in seq
    # within a shard (the shard's own n_t > seq term contributes 1
    # every increment), so the binary-search lower bound is exact —
    # every emitted row already satisfies step >= start_step
    return seqs.select("shard", "seq_idx", step.alias("step"))


def sft_loss_masks(
    df: DataFrame,
    prompt_col: str = "prompt_tokens",
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 8,
    order: str = "hash",
    max_shard_rows: "int | None" = 4_000_000,
) -> DataFrame:
    """COMPLETION-ONLY loss masks for no-split (SFT) bins — the other
    half of the attention story: instruction tuning masks the loss on
    prompt tokens and trains only on completions, so the loader needs
    a token-aligned 0/1 mask next to each packed bin. ``prompt_col``
    is the per-doc PROMPT token count (loss-masked prefix; clamped to
    the doc's token count — the EOS rides the completion side).

    Plan: :func:`pack_sequences_nosplit` assigns (shard, seq,
    offset); one doc-keyed equi-join brings the prompt length back;
    per (shard, seq) the budget-bounded span list sorts in-row and
    each doc contributes '0' x masked then '1' x (n - masked) via
    array_repeat — NO token-level explode, the pack_segment_ids
    bound: O(budget) per output row at any corpus size. The oracle
    replays the recursive walk and builds the same mask from
    token-level generate_series rows (q_sft_loss_mask). Returns
    (shard, seq_idx, n_docs, n_tokens, masked_tokens, loss_mask).
    """
    if prompt_col not in df.columns:
        raise ValueError(f"prompt_col {prompt_col!r} is not an input column")
    asn = pack_sequences_nosplit(
        df, id_col=id_col, text_col=text_col, budget=budget,
        n_shards=n_shards, order=order, max_shard_rows=max_shard_rows,
    )
    withp = asn.join(
        df.select(F.col(id_col), F.col(prompt_col).cast("long")
                  .alias("__prompt")),
        id_col,
    ).select(
        "shard", "seq_idx", "offset_in_seq", "n_tokens",
        F.least(F.greatest(F.col("__prompt"), F.lit(0)),
                F.col("n_tokens")).alias("__masked"),
    )
    arr = F.array_sort(
        F.collect_list(F.struct("offset_in_seq", "__masked", "n_tokens"))
    )
    return (
        withp.groupBy("shard", "seq_idx")
        .agg(arr.alias("__docs"))
        .select(
            "shard",
            "seq_idx",
            F.size("__docs").alias("n_docs"),
            F.expr(
                "aggregate(__docs, 0L, (a, x) -> a + x.n_tokens)"
            ).alias("n_tokens"),
            F.expr(
                "aggregate(__docs, 0L, (a, x) -> a + x.__masked)"
            ).alias("masked_tokens"),
            F.array_join(
                F.flatten(
                    F.expr(
                        "transform(__docs, x -> concat("
                        "array_repeat('0', cast(x.__masked as int)), "
                        "array_repeat('1', "
                        "cast(x.n_tokens - x.__masked as int))))"
                    )
                ),
                " ",
            ).alias("loss_mask"),
        )
    )


def epoch_emit(
    df: DataFrame,
    epoch: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 8,
    eos_token: str = "</s>",
    n_buckets: int = 256,
    max_shard_rows: "int | None" = 4_000_000,
) -> DataFrame:
    """The full dataloader composition: per-epoch deterministic global
    shuffle (:func:`epoch_shuffle`), then MATERIALIZED fixed-length
    token sequences (:func:`emit_sequences`) with each shard's
    concatenation following the epoch order. What the trainer reads
    for epoch N, produced end to end: same hash shards every epoch,
    re-mixed stream order, exactly-``budget`` token rows (the shard's
    last row may be short).

    Plan shape = epoch_pack's rank (text rides the bucket exchange,
    no corpus re-join) + emit's explode/regroup; all-integer
    positions, so the q_epoch_emit oracle replays every token
    placement bit-identically.

    ``max_shard_rows``: the shard guard resolves against the INPUT
    corpus (one cheap scan) rather than the shuffled relation, so the
    rank pipeline is never executed twice just to count it — the
    shuffle is a 1:1 map of the corpus rows.
    """
    n_shards = _resolve_shards(df, n_shards, max_shard_rows,
                               "epoch_emit")
    d = epoch_shuffle(
        df.select(F.col(id_col), F.col(text_col)), epochs=1,
        id_col=id_col, n_buckets=n_buckets, first_epoch=epoch,
        carry_cols=[text_col],
    ).select(id_col, text_col, "pos")
    return emit_sequences(
        d,
        id_col=id_col,
        text_col=text_col,
        budget=budget,
        n_shards=n_shards,
        eos_token=eos_token,
        order_cols=[F.col("pos")],
        max_shard_rows=None,
    )


def epoch_pack(
    df: DataFrame,
    epoch: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 8,
    eos_tokens: int = 1,
    n_buckets: int = 256,
    max_shard_rows: "int | None" = 4_000_000,
) -> DataFrame:
    """Shuffle-then-pack for ONE training epoch — the pretraining
    dataloader composition (VERDICT r11 #5): every epoch gets its own
    deterministic global permutation (:func:`epoch_shuffle`), and each
    shard concatenates its documents in that epoch order before the
    fixed-budget chunking (:func:`pack_sequences` with the epoch
    position as the within-shard order). Shards stay hash-assigned
    (epoch-independent — a doc's shard never moves, only its place in
    the shard's stream), so across epochs every shard re-mixes its own
    documents, which is exactly what "reshuffle each epoch" means once
    the corpus is sharded.

    All-integer arithmetic end to end: epoch positions are exact
    global ranks, the pack offsets are exact integer sums, so a DuckDB
    oracle replays every (shard, seq, offset) bit-identically
    (q_epoch_pack). One extra exchange vs plain pack (the rank's
    bucket exchange, which CARRIES the text — epoch_shuffle's
    carry_cols — so the corpus is never re-joined against the
    positions; a doc-key sort-merge join would cost two more corpus
    shuffles + sorts, and the plan pin asserts it is absent).

    Returns (id, pos, n_tokens, shard, pack_rank, seq_idx,
    offset_in_seq). ``max_shard_rows`` resolves against the INPUT
    corpus (one cheap scan, same row count as the shuffled relation)
    so the rank pipeline never runs twice just to count it.
    """
    n_shards = _resolve_shards(df, n_shards, max_shard_rows,
                               "epoch_pack")
    d = epoch_shuffle(
        df.select(F.col(id_col), F.col(text_col)), epochs=1,
        id_col=id_col, n_buckets=n_buckets, first_epoch=epoch,
        carry_cols=[text_col],
    ).select(id_col, text_col, "pos")
    return pack_sequences(
        d,
        id_col=id_col,
        text_col=text_col,
        budget=budget,
        n_shards=n_shards,
        eos_tokens=eos_tokens,
        order_cols=[F.col("pos")],
        keep_cols=["pos"],
        max_shard_rows=None,
    )


def epoch_mix_emit(
    df: DataFrame,
    weights: "dict[str, float]",
    epoch: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    budget: int = 512,
    n_shards: int = 8,
    eos_token: str = "</s>",
    default_weight: float = 1.0,
    n_buckets: int = 256,
    max_bucket_rows: "int | None" = 8_000_000,
    max_shard_rows: "int | None" = 4_000_000,
) -> DataFrame:
    """The LAST seam of the pretraining dataloader (VERDICT r12 #6):
    source-weighted mixing (:func:`epoch_mix_shuffle`) composed into
    MATERIALIZED fixed-length token sequences
    (:func:`emit_sequences`) — what the trainer reads for epoch N of
    a weighted recipe. A weight-2.5 source's selected docs appear 3x
    in the epoch's token stream, each copy at its own deterministic
    position.

    Composition discipline:

    - the TEXT rides the mix explode and the rank's bucket exchange
      (``carry_cols``) — the corpus is never re-joined against the
      positions;
    - the emit identity is the injective :func:`_mix_key` of
      (id, copy), so each copy hash-scatters to its OWN shard and
      holds its own slot in the shard's stream (``n_docs`` on the
      output therefore counts mix INSTANCES, not distinct docs);
    - all-integer copy counts and positions, so the q_epoch_mix_emit
      oracle replays every token placement bit-identically;
    - the shard guard sums the copy expression MAP-SIDE over the
      corpus (one scan) instead of counting the mixed relation, so
      the rank pipeline never executes just to size the shards.
    """
    copies = _mix_copies(weights, epoch, id_col, source_col,
                         default_weight)
    if max_shard_rows is not None:
        if max_shard_rows <= 0:
            raise ValueError(
                f"max_shard_rows must be positive, got {max_shard_rows}"
            )
        import warnings

        total = int(
            df.agg(F.coalesce(F.sum(copies), F.lit(0)).alias("n"))
            .collect()[0]["n"]
        )
        need = -(-total // max_shard_rows)
        if need > n_shards:
            warnings.warn(
                f"epoch_mix_emit: {total} mixed rows over {n_shards} "
                f"shards exceeds max_shard_rows={max_shard_rows} per "
                f"shard task; raising n_shards to {need} (shard "
                "assignment changes — pass max_shard_rows=None to pin "
                "the shard count)",
                UserWarning,
                stacklevel=2,
            )
            n_shards = int(need)
    mixed = epoch_mix_shuffle(
        df.select(F.col(id_col), F.col(source_col), F.col(text_col)),
        weights,
        epoch=epoch,
        id_col=id_col,
        source_col=source_col,
        default_weight=default_weight,
        n_buckets=n_buckets,
        max_bucket_rows=max_bucket_rows,
        carry_cols=[text_col],
    )
    d = mixed.select(
        _mix_key(id_col).alias("__mix_id"), F.col(text_col), F.col("pos")
    )
    return emit_sequences(
        d,
        id_col="__mix_id",
        text_col=text_col,
        budget=budget,
        n_shards=n_shards,
        eos_token=eos_token,
        order_cols=[F.col("pos")],
        max_shard_rows=None,
    )
