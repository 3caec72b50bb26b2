"""Training-objective document transforms.

Fill-in-the-middle (FIM, arXiv:2207.14255) is the canonical example:
code/infilling models train on documents rearranged as
``<PRE> prefix <SUF> suffix <MID> middle`` (PSM order) for a fixed
fraction of the corpus, leaving the rest autoregressive. The
transform must be deterministic and reproducible (the same doc gets
the same cut points forever, independent of partitioning), which the
repo's portable-hash discipline gives for free — and it must happen
AT SCALE as a map-side projection, never a shuffle.

All selection/cut arithmetic is integer over ``h60`` draws, so a
DuckDB oracle replays every transformed document bit-identically
(q_fim_transform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from huckli_spark.functions.portable import h60

PRE, SUF, MID = "<PRE>", "<SUF>", "<MID>"


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate: float = 0.5,
) -> DataFrame:
    """Deterministic fill-in-the-middle rearrangement of a ``rate``
    fraction of documents (PSM order: ``<PRE> prefix <SUF> suffix
    <MID> middle`` — the model learns to emit the middle after seeing
    both context sides).

    Per doc: the apply draw is ``h60('fim:<id>') % 1e6 < rate * 1e6``;
    the two cut points are independent draws mod (n_words + 1), low
    cut first — so prefix/middle/suffix are token-aligned spans of
    the whitespace tokenization (empty spans allowed, exactly as the
    published recipe at character level). Untransformed docs pass
    through with ``fim = false``. Map-side only: no shuffle, no UDF,
    array slice/concat in whole-stage codegen. Returns
    (<id>, fim, n_tokens, text_out).
    """
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    rate_micro = int(rate * 1_000_000 + 0.5)
    ids = F.col(id_col).cast("string")
    pick = F.pmod(h60(F.concat(F.lit("fim:"), ids)), F.lit(1_000_000))
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    c1 = F.pmod(h60(F.concat(F.lit("fim1:"), ids)), (n + 1).cast("long"))
    c2 = F.pmod(h60(F.concat(F.lit("fim2:"), ids)), (n + 1).cast("long"))
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    d = df.select(
        F.col(id_col),
        (pick < F.lit(rate_micro)).alias("fim"),
        n.alias("n_tokens"),
        w.alias("__w"),
        lo.cast("int").alias("__lo"),
        hi.cast("int").alias("__hi"),
        F.col(text_col).alias("__text"),
    )
    psm = F.array_join(
        F.concat(
            F.array(F.lit(PRE)),
            F.slice(F.col("__w"), 1, F.col("__lo")),
            F.array(F.lit(SUF)),
            F.expr("slice(__w, __hi + 1, size(__w) - __hi)"),
            F.array(F.lit(MID)),
            F.expr("slice(__w, __lo + 1, __hi - __lo)"),
        ),
        " ",
    )
    return d.select(
        id_col,
        "fim",
        "n_tokens",
        F.when(F.col("fim"), psm).otherwise(F.col("__text"))
        .alias("text_out"),
    )
