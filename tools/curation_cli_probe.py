#!/usr/bin/env python
"""Curation CLI end-to-end scaling probe (VERDICT r07 #5).

The curate->pack->export journey is correctness-tested at fixture
scale (tests/test_corpus_cli.py); this probe runs the COMPOSED
pipeline through the actual CLI entrypoints at 1x and 10x the sf0.1
corpus and records wall + shuffle per stage, so the pipeline — not
just its component operators — has a measured scale row:

  1. dedup --method semdedup   (embeddings; k scales with the corpus
     so per-cluster membership stays constant — the operating
     discipline the operator docstring prescribes)
  2. curate                    (Gopher rule gate -> DSIR top-K)
  3. pack                      (training-sequence packing)
  4. export                    (sharded JSONL + checksummed manifest)
  5. pack --curriculum / tokenize --method unigram  (continuation)
  6. release                   (export + data card + source-overlap
     matrix + tokenizer store over the post-semdedup corpus — the
     composed bundle a dataset release actually ships)

Fixtures are decorrelated copies (scale_probe's salting) with the
probe's stopword list kept verbatim in every copy — fully-salted text
would fail the stopword rule for every copy > 0 and the rule gate
would collapse the pool back to 1x, measuring nothing. The published
Gopher stopwords never occur in the synthetic fixture vocabulary at
all (31 words; rule_pass would be 0 at EVERY scale), so the probe
passes fixture-vocabulary stopwords through the CLI's --stopwords
override — the same knob a deployment tunes for non-English corpora.

Writes SCALE_PROBE_curation_cli.json.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from huckli_spark.corpus_cli import main as cli_main
from huckli_spark.session import get_spark
from tools.scale_probe import (
    WORK,
    _max_stage_id,
    _scaled_embeddings,
    _stage_totals,
)


# fixture-vocabulary stopwords: frequent enough that long docs hit
# >= 2 distinct ones, so the word-count rule (not the stopword rule)
# is the binding constraint and the pool scales with the corpus
PROBE_STOPWORDS = ("spark", "value", "fast", "table", "query", "sort")


def _scaled_documents_keepstops(spark, base, scale: int) -> str:
    """Decorrelated copies whose content words are per-copy salted but
    whose PROBE_STOPWORDS survive verbatim, so the rule gate passes
    at every copy and the DSIR pool truly scales."""
    path = f"{WORK}/x{scale}/documents_keepstops.parquet"
    if os.path.exists(path):
        return path
    keep = ", ".join(f"'{t}'" for t in PROBE_STOPWORDS)
    parts = []
    for i in range(scale):
        text = (
            F.col("text")
            if i == 0
            else F.expr(
                "array_join(transform(split(text, ' '), w -> "
                f"CASE WHEN w IN ({keep}) THEN w"
                f" ELSE concat(w, 'c{i}') END), ' ')"
            )
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def _stage(spark, argv: list[str]) -> dict:
    mark = _max_stage_id(spark)
    buf = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(argv)
    wall = round(time.perf_counter() - t0, 3)
    assert rc == 0, argv
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    return {"wall_s": wall, **_stage_totals(spark, mark), "summary": summary}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="curation_cli_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    out: dict = {"sf_dir": sf_dir, "scales": {}}
    for scale in (1, 10):
        docs_path = _scaled_documents_keepstops(spark, docs0, scale)
        emb_path = _scaled_embeddings(spark, emb0, scale)
        root = f"{WORK}/cli_x{scale}"
        runs: dict = {}
        runs["semdedup"] = _stage(spark, [
            "dedup", "--in", docs_path, "--out", f"{root}/kept",
            "--method", "semdedup", "--embeddings", emb_path,
            # k scales with the corpus: constant per-cluster size
            "--clusters", str(8 * scale), "--tau", "0.7",
        ])
        runs["curate"] = _stage(spark, [
            "curate", "--in", f"{root}/kept", "--out", f"{root}/curated",
            "--target-lang", "en", "--keep", "1000",
            "--stopwords", ",".join(PROBE_STOPWORDS),
        ])
        runs["pack"] = _stage(spark, [
            "pack", "--in", f"{root}/curated", "--out", f"{root}/packed",
            "--budget", "2048", "--shards", "32",
        ])
        # round-8 continuation stages: curriculum ordering and the
        # unigram tokenizer (store published next to the tokens)
        runs["pack_curriculum"] = _stage(spark, [
            "pack", "--in", f"{root}/curated",
            "--out", f"{root}/packed_cur",
            "--budget", "2048", "--shards", "32", "--curriculum",
        ])
        runs["tokenize_unigram"] = _stage(spark, [
            "tokenize", "--in", f"{root}/curated",
            "--out", f"{root}/tokenized",
            "--method", "unigram", "--vocab-size", "120", "--iters", "2",
        ])
        runs["export"] = _stage(spark, [
            "export", "--in", f"{root}/curated", "--out", f"{root}/exported",
            "--shards", "32",
        ])
        # release runs over the POST-SEMDEDUP corpus (not the top-K
        # curated cut, whose size is constant across scales) so the
        # bundle's card/overlap/tokenizer stages see the full 10x —
        # this is the heaviest composed stage and the one a real
        # dataset release would run
        runs["release"] = _stage(spark, [
            "release", "--in", f"{root}/kept",
            "--out", f"{root}/released", "--shards", "32",
            "--tokenizer", "unigram",
            "--stopwords", ",".join(PROBE_STOPWORDS),
        ])
        out["scales"][str(scale)] = {
            "n_docs": docs0.count() * scale,
            "n_emb": emb0.count() * scale,
            "runs": runs,
        }
        for name, rec in runs.items():
            print(scale, name, rec["wall_s"], rec["summary"], flush=True)

    s1, s10 = out["scales"]["1"]["runs"], out["scales"]["10"]["runs"]
    out["summary_vs_1x"] = {
        name: {
            "wall_ratio": round(s10[name]["wall_s"] / s1[name]["wall_s"], 2),
            "shuffle_ratio": round(
                (s10[name]["shuffle_write_bytes"] + 1)
                / (s1[name]["shuffle_write_bytes"] + 1),
                2,
            ),
        }
        for name in s1
    }
    out["loadavg"] = list(os.getloadavg())
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE_curation_cli.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["summary_vs_1x"]))


if __name__ == "__main__":
    main()
