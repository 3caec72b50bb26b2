"""Corpus-pipeline CLI — the training-data operators behind one
command surface, so the whole prep flow runs without writing Spark
code:

    python -m huckli_spark.corpus_cli scrub    --in raw/ --format jsonl --out clean/
    python -m huckli_spark.corpus_cli quality  --in clean/ --out scored/
    python -m huckli_spark.corpus_cli dedup    --in clean/ --method minhash \\
        --threshold 0.9 --out kept/
    python -m huckli_spark.corpus_cli pack     --in kept/ --budget 2048 \\
        --shards 64 --out packed/
    python -m huckli_spark.corpus_cli tokenize --in kept/ --merges 32 --out tok/

Inputs: a parquet dir with the canonical documents schema, or JSONL /
CSV (``--format``) landed through sources/text.py (malformed lines
quarantined to ``<out>/_quarantine``, never dropped silently). Every
command writes parquet and prints ONE JSON summary line on stdout.

Each subcommand is a thin driver over the tested operators —
pii_scrub, quality_score + repetition_stats, dedup keep-lists
(exact / minhash / simhash), pack_sequences, bpe_train/apply — so the
CLI inherits their scale shapes unchanged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load(spark, path: str, fmt: str, out_dir: str):
    from pyspark.sql import functions as F

    from huckli_spark.sources.text import read_csv_documents, read_jsonl_documents

    if fmt == "parquet":
        return spark.read.parquet(path), None
    r = read_jsonl_documents(spark, path) if fmt == "jsonl" else read_csv_documents(
        spark, path
    )
    return r.docs.drop("file_source"), r.quarantine


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="huckli_spark.corpus_cli")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--in", dest="inp", required=True)
        sp.add_argument("--out", required=True)
        sp.add_argument(
            "--format", choices=["parquet", "jsonl", "csv"], default="parquet"
        )

    s = sub.add_parser("scrub", help="PII audit + redaction")
    common(s)

    s = sub.add_parser("quality", help="quality + repetition signals")
    common(s)

    s = sub.add_parser("dedup", help="near-dup removal, keep lowest doc_id")
    common(s)
    s.add_argument(
        "--method",
        choices=["exact", "minhash", "simhash", "semdedup", "substring"],
        default="minhash",
    )
    s.add_argument("--threshold", type=float, default=0.9)
    s.add_argument(
        "--window-len", type=int, default=5,
        help="substring method: L-word window; every span of >= L "
        "words occurring verbatim more than once is cut from ALL "
        "occurrences (docs cut to empty are removed)",
    )
    s.add_argument(
        "--embeddings",
        default=None,
        help="parquet of (vec_id, embedding) with vec_id == doc_id; "
        "required for --method semdedup",
    )
    s.add_argument(
        "--clusters", type=int, default=8,
        help="semdedup k-means cluster count (raise with corpus size "
        "to keep per-cluster membership constant)",
    )
    s.add_argument("--tau", type=float, default=0.45)

    s = sub.add_parser("pack", help="training-sequence packing")
    common(s)
    s.add_argument("--budget", type=int, default=2048)
    s.add_argument("--shards", type=int, default=64)
    s.add_argument(
        "--curriculum",
        action="store_true",
        help="order each shard best-first by the exact unigram-LM "
        "quality score (default: deterministic hash order)",
    )
    s.add_argument(
        "--no-split",
        action="store_true",
        help="SFT packing: place documents WHOLE via greedy next-fit "
        "(no doc straddles a sequence); incompatible with "
        "--curriculum",
    )
    s.add_argument(
        "--pack-order",
        choices=["hash", "length"],
        default="hash",
        help="--no-split walk order: 'hash' mixes uniformly, 'length' "
        "packs longest-first (next-fit-decreasing, less padding)",
    )
    s.add_argument(
        "--epoch", type=int, default=None,
        help="shuffle-then-pack for this training epoch: each shard "
        "concatenates its docs in the epoch's deterministic global "
        "permutation order before chunking (incompatible with "
        "--curriculum / --no-split)",
    )
    s.add_argument(
        "--buckets", type=int, default=256,
        help="power-of-two hash buckets for the --epoch permutation "
        "rank; raise with the corpus",
    )
    s.add_argument(
        "--emit", action="store_true",
        help="materialize the packed sequences themselves (one row "
        "per (shard, seq) with the token array) instead of the "
        "per-doc assignment relation; composes with --epoch (emit in "
        "that epoch's shuffle order), --no-split (emit whole-doc "
        "SFT bins, walk order from --pack-order), or --weights "
        "(source-weighted mix in the epoch's order); incompatible "
        "with --curriculum",
    )
    s.add_argument(
        "--spans", action="store_true",
        help="write the per-sequence DOCUMENT SPANS (shard, seq, doc, "
        "part, start, len) instead of the assignment — the "
        "block-diagonal attention-mask relation; split packing only "
        "(composes with --epoch / --curriculum)",
    )
    s.add_argument(
        "--segments", action="store_true",
        help="write token-aligned SEGMENT IDS per packed sequence "
        "(position p gets the ordinal of the doc covering p) — the "
        "segment_ids array a masking loader feeds next to input_ids; "
        "split packing only",
    )
    s.add_argument(
        "--manifest", action="store_true",
        help="write the GLOBAL STEP MANIFEST (shard, seq, step): the "
        "deterministic round-robin consumption order a multi-worker "
        "loader reads; closed-form rank, zero shuffle",
    )
    s.add_argument(
        "--resume-step", type=int, default=None,
        help="with --manifest: keep only steps >= K (exact mid-run "
        "resume; whole shard prefixes are pruned driver-side)",
    )
    s.add_argument(
        "--weights", default=None,
        help="source-weighted mixing for --emit, 'src=2.5,other=0.5' "
        "(the 'epochs per source' recipe knob): floor(w) copies per "
        "doc plus one more for the frac(w) hash-selected share; "
        "unlisted sources weigh --default-weight; weight 0 drops the "
        "source; combine with --epoch to pick the epoch (default 0)",
    )
    s.add_argument("--default-weight", type=float, default=1.0)

    s = sub.add_parser(
        "release-verify",
        help="consumer-side integrity check of an exported release: "
        "re-hash every shard against MANIFEST.json, re-count rows, "
        "re-verify RELEASE.json's manifest checksum and the "
        "tokenizer store when present",
    )
    s.add_argument("--in", dest="inp", required=True,
                   help="release root (RELEASE.json) or bare export "
                   "root (MANIFEST.json)")

    s = sub.add_parser(
        "release-diff",
        help="diff two exported releases by doc content: "
        "added/removed/changed/unchanged, written as a status relation",
    )
    s.add_argument("--a", dest="rel_a", required=True,
                   help="baseline release/export root (contains data/ "
                   "+ MANIFEST.json)")
    s.add_argument("--b", dest="rel_b", required=True,
                   help="candidate release/export root")
    s.add_argument("--out", required=True)

    s = sub.add_parser(
        "shuffle",
        help="deterministic per-epoch global training-order "
        "permutation (reproducible dataloader shuffle)",
    )
    common(s)
    s.add_argument("--epochs", type=int, default=2)
    s.add_argument(
        "--buckets", type=int, default=256,
        help="power-of-two hash buckets; worst window input is "
        "~n/buckets rows — raise with the corpus",
    )
    s.add_argument(
        "--weights", default=None,
        help="source-weighted mixing, 'src=2.5,other=0.5' (the "
        "'epochs per source' recipe knob): floor(w) copies per doc "
        "plus one more for the frac(w) hash-selected share, a "
        "different share each epoch; unlisted sources weigh "
        "--default-weight; weight 0 drops the source",
    )
    s.add_argument("--default-weight", type=float, default=1.0)
    s.add_argument(
        "--temperature", type=float, default=None,
        help="mT5-style temperature sampling: derive the per-source "
        "weights from token shares as (n_max/n_s)^(1-alpha) — "
        "alpha=1 keeps the natural mix, alpha->0 flattens toward "
        "uniform (boosting low-resource sources); exclusive with "
        "--weights",
    )

    s = sub.add_parser(
        "tokenize", help="train a tokenizer + tokenize the corpus"
    )
    common(s)
    s.add_argument(
        "--method", choices=["bpe", "unigram"], default="bpe"
    )
    s.add_argument("--merges", type=int, default=32, help="bpe only")
    s.add_argument("--vocab-size", type=int, default=120,
                   help="unigram only")
    s.add_argument("--iters", type=int, default=2, help="unigram only")

    s = sub.add_parser(
        "curate",
        help="Gopher rule gate -> DSIR importance top-K selection",
    )
    common(s)
    s.add_argument(
        "--target-lang",
        default="en",
        help="DSIR target subset = docs with this lang value",
    )
    s.add_argument("--keep", type=int, default=1000)
    s.add_argument(
        "--stopwords",
        default=None,
        help="comma-separated required-stopword list (default: the "
        "published Gopher list)",
    )

    s = sub.add_parser(
        "release",
        help="one-command dataset release: sharded export + per-source "
        "data card + source overlap matrix + optional tokenizer store "
        "+ RELEASE.json tying the artifacts together",
    )
    common(s)
    s.add_argument("--shards", type=int, default=8)
    s.add_argument(
        "--tokenizer", choices=["none", "bpe", "unigram"], default="none"
    )
    s.add_argument(
        "--stopwords",
        default=None,
        help="comma-separated required-stopword list for the data "
        "card's quality column (default: the published Gopher list)",
    )
    s.add_argument(
        "--media",
        default=None,
        help="optional (media_id, kind, data) parquet: the release "
        "bundle gains the per-modality media card",
    )
    s.add_argument(
        "--media-cap",
        type=int,
        default=0,
        metavar="K",
        help="with --media: also ship keep-<=K decisions per "
        "transitive duplicate cluster (media_keep_decisions.parquet, "
        "the q_media_dedup_cap relation)",
    )

    s = sub.add_parser(
        "export", help="sharded corpus export + checksummed MANIFEST.json"
    )
    common(s)
    s.add_argument("--shards", type=int, default=8)
    s.add_argument(
        "--out-format", choices=["jsonl", "parquet"], default="jsonl"
    )

    s = sub.add_parser(
        "media-card",
        help="per-modality governance card over a media parquet "
        "(media_id, kind, data): blob counts, fingerprint coverage, "
        "duplicate excess; --pairs adds the near-dup pair relations",
    )
    # media tables are parquet-only (binary column); no text formats
    s.add_argument("--in", dest="inp", required=True)
    s.add_argument("--out", required=True)
    s.add_argument(
        "--pairs",
        action="store_true",
        help="also write image/audio (banded Hamming) and video "
        "(shared-frame) near-dup pair parquets",
    )
    s.add_argument("--max-hamming", type=int, default=3)
    s.add_argument(
        "--cap",
        type=int,
        default=0,
        metavar="K",
        help="also write keep-<=K decisions per transitive duplicate "
        "cluster for each modality (the q_media_dedup_cap policy "
        "relation — O(duplicates), the thing a pipeline writes back "
        "instead of the O(cluster^2) pair relation)",
    )
    return p


def _parse_weights(spec: str, default_weight: float) -> dict:
    """Parse a '--weights src=2.5,other=0.5' spec. Every weight (and
    the default) must be a FINITE non-negative float: NaN slips past
    a `w < 0` check (comparisons with NaN are False) and then dies as
    an uncaught int-conversion error deep in the micro-weight
    arithmetic; inf overflows the same way (ADVICE r12 #4) — both get
    a clean CLI error here instead."""
    import math

    try:
        wmap = {
            k.strip(): float(v)
            for k, v in (pair.split("=", 1) for pair in spec.split(","))
        }
    except ValueError as exc:
        raise SystemExit(
            f"--weights must be 'src=w,src2=w2', got {spec!r}: {exc}"
        )
    bad = sorted(
        k for k, w in wmap.items()
        if not math.isfinite(w) or w < 0
    )
    if bad:
        raise SystemExit(
            f"--weights values must be finite and >= 0; offending "
            f"sources: {bad} in {spec!r}"
        )
    if not math.isfinite(default_weight) or default_weight < 0:
        raise SystemExit(
            f"--default-weight must be finite and >= 0, got "
            f"{default_weight}"
        )
    return wmap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import functions as F

    from huckli_spark.session import get_spark

    spark = get_spark(app_name=f"corpus_{args.cmd}")
    if getattr(args, "out", None):  # release-verify is read-only
        os.makedirs(args.out, exist_ok=True)
    if args.cmd == "media-card":
        # media tables are binary-column parquet, not text corpora —
        # they bypass the documents loader entirely
        summary = {"cmd": args.cmd} | _media_card(spark, args)
        print(json.dumps(summary))
        return 0
    if args.cmd == "release-diff":
        summary = {"cmd": args.cmd} | _release_diff(spark, args)
        print(json.dumps(summary))
        return 0
    if args.cmd == "release-verify":
        summary = {"cmd": args.cmd} | _release_verify(spark, args)
        print(json.dumps(summary))
        return 0 if summary["ok"] else 1
    docs, quarantine = _load(spark, args.inp, args.format, args.out)
    summary: dict = {"cmd": args.cmd, "quarantined": 0}

    if args.cmd == "scrub":
        from huckli_spark.operators.privacy import pii_scrub

        out = pii_scrub(docs).drop("text").withColumnRenamed("redacted", "text")
        out.write.mode("overwrite").parquet(args.out)
        agg = spark.read.parquet(args.out).agg(
            F.count("*").alias("docs"),
            F.coalesce(F.sum("n_pii"), F.lit(0)).alias("pii_redacted"),
        ).collect()[0]
        summary |= {"docs": agg["docs"], "pii_redacted": int(agg["pii_redacted"])}

    elif args.cmd == "quality":
        from huckli_spark.operators.textstats import quality_score, repetition_stats

        q = quality_score(docs)
        r = repetition_stats(docs).select(
            "doc_id", "distinct_ratio", "top_word_frac", "top_bigram_frac"
        )
        q.join(r, "doc_id").write.mode("overwrite").parquet(args.out)
        summary |= {"docs": spark.read.parquet(args.out).count()}

    elif args.cmd == "dedup":
        from huckli_spark.operators import dedup as dd
        from huckli_spark.operators import sketch

        words_cut = None
        if args.method == "exact":
            kept = dd.dedup_exact(docs, ["text"], order_col="doc_id")
        elif args.method == "substring":
            # span-level cut, not row-level drop: duplicated runs of
            # >= window_len words are removed from every occurrence
            # (q_substring_cut), then fully-emptied docs drop
            cut = dd.cut_duplicate_spans(docs, window_len=args.window_len)
            words_cut = (
                cut.agg(F.sum("n_cut_words")).collect()[0][0] or 0
            )
            kept = (
                cut.where(F.col("text_cut") != "")
                .withColumn("text", F.col("text_cut"))
                .drop("text_cut", "n_cut_words")
            )
        elif args.method == "semdedup":
            from huckli_spark.operators.curation import semdedup

            if not args.embeddings:
                raise SystemExit("--method semdedup requires --embeddings")
            emb = spark.read.parquet(args.embeddings)
            drop = (
                semdedup(
                    emb, k=args.clusters, iterations=2, tau=args.tau
                )
                .where("is_dup")
                .select(F.col("vec_id").alias("doc_id"))
            )
            kept = docs.join(drop, "doc_id", "left_anti")
        else:
            pairs = (
                sketch.minhash_dedup_pairs(docs, threshold=args.threshold)
                if args.method == "minhash"
                else sketch.simhash_pairs(docs, max_hamming=3)
            ).select("d1", "d2")
            # keep-list: drop the higher id of every dup pair
            drop = pairs.select(
                F.greatest("d1", "d2").alias("doc_id")
            ).distinct()
            kept = docs.join(drop, "doc_id", "left_anti")
        kept.write.mode("overwrite").parquet(args.out)
        n_in, n_out = docs.count(), spark.read.parquet(args.out).count()
        summary |= {"docs_in": n_in, "docs_kept": n_out,
                    "removed": n_in - n_out, "method": args.method}
        if words_cut is not None:
            summary["words_cut"] = int(words_cut)

    elif args.cmd == "curate":
        from huckli_spark.operators.curation import dsir_select
        from huckli_spark.operators.textstats import (
            GOPHER_STOPWORDS,
            gopher_rules,
        )

        stops = (
            tuple(s for s in args.stopwords.split(",") if s)
            if args.stopwords
            else GOPHER_STOPWORDS
        )
        n_in = docs.count()
        passing = (
            gopher_rules(docs, stopwords=stops)
            .where("passes")
            .select("doc_id")
        )
        pool = docs.join(passing, "doc_id")
        ranked = dsir_select(
            pool, F.col("lang") == args.target_lang, keep=args.keep
        )
        kept = pool.join(
            ranked.where("selected").select("doc_id"), "doc_id"
        )
        kept.write.mode("overwrite").parquet(args.out)
        n_pool = pool.count()
        n_out = spark.read.parquet(args.out).count()
        summary |= {
            "docs_in": n_in,
            "rule_pass": n_pool,
            "selected": n_out,
            "target_lang": args.target_lang,
            "keep": args.keep,
        }

    elif args.cmd == "export":
        summary |= _export(spark, docs, args.out, args.shards, args.out_format)

    elif args.cmd == "release":
        summary |= _release(spark, docs, args)

    elif args.cmd == "shuffle":
        from huckli_spark.operators.packing import (
            epoch_mix_shuffle,
            epoch_shuffle,
        )

        if args.weights is not None and args.temperature is not None:
            raise SystemExit(
                "shuffle --temperature derives the weights itself; "
                "it is exclusive with --weights"
            )
        if args.temperature is not None:
            if "source" not in docs.columns:
                raise SystemExit(
                    "shuffle --temperature needs a 'source' column "
                    "on the corpus"
                )
            from huckli_spark.operators.mixture import (
                temperature_weight_map,
            )

            try:
                wmap = temperature_weight_map(
                    docs, alpha=args.temperature
                )
            except ValueError as exc:
                raise SystemExit(str(exc)) from exc
            summary["temperature"] = args.temperature
        elif args.weights is not None:
            wmap = _parse_weights(args.weights, args.default_weight)
        else:
            wmap = None
        if wmap is not None:
            per_epoch = [
                epoch_mix_shuffle(
                    docs, wmap, epoch=e, n_buckets=args.buckets,
                    default_weight=args.default_weight,
                )
                for e in range(args.epochs)
            ]
            out = per_epoch[0]
            for p in per_epoch[1:]:
                out = out.unionByName(p)
            summary["weights"] = wmap
        else:
            out = epoch_shuffle(
                docs, epochs=args.epochs, n_buckets=args.buckets
            )
        out.write.mode("overwrite").parquet(args.out)
        written = spark.read.parquet(args.out)
        summary |= {
            "docs": written.select("doc_id").distinct().count(),
            "epochs": args.epochs,
            "rows": written.count(),
        }

    elif args.cmd == "pack":
        from huckli_spark.operators.packing import pack_sequences

        order_cols = None
        pack_in = docs
        if args.curriculum:
            words = docs.select(
                "doc_id", F.explode(F.split("text", " ")).alias("w")
            )
            freq = words.groupBy("w").agg(F.count("*").alias("c"))
            n = words.select(F.count("*").alias("n"))
            score = (
                words.join(freq, "w")
                .crossJoin(F.broadcast(n))
                .select(
                    "doc_id",
                    F.floor(
                        F.log(F.col("c") / F.col("n")) * 1000000
                        + F.lit(0.5)
                    ).cast("long").alias("lp"),
                )
                .groupBy("doc_id")
                .agg(
                    F.floor(
                        F.sum("lp") * 1.0 / F.count("*") + F.lit(0.5)
                    ).cast("long").alias("score_micro")
                )
            )
            pack_in = docs.select("doc_id", "text").join(score, "doc_id")
            order_cols = [F.desc("score_micro")]
        if args.epoch is not None and (args.curriculum or args.no_split):
            raise SystemExit(
                "--epoch is exclusive with --curriculum / --no-split"
            )
        if args.emit and args.curriculum:
            raise SystemExit("--emit is exclusive with --curriculum")
        if args.spans and args.segments:
            raise SystemExit(
                "--spans and --segments are exclusive (one output "
                "relation per run)"
            )
        if (args.spans or args.segments) and args.emit:
            raise SystemExit(
                "--spans/--segments are exclusive with --emit (emit "
                "materializes tokens; spans/segments annotate the "
                "assignment)"
            )
        # validate the manifest flags BEFORE any packer runs: the
        # shard guard's corpus count must never execute for an
        # invocation that is going to be rejected
        if args.resume_step is not None and not args.manifest:
            raise SystemExit("--resume-step requires --manifest")
        if args.manifest and (args.emit or args.spans or args.segments
                              or args.no_split):
            raise SystemExit(
                "--manifest is exclusive with --emit/--spans/"
                "--segments/--no-split (it annotates the split "
                "assignment)"
            )
        if args.emit and args.no_split and args.epoch is not None:
            raise SystemExit(
                "--emit --no-split does not compose with --epoch "
                "(the no-split walk order is --pack-order)"
            )
        if args.weights is not None and not args.emit:
            raise SystemExit(
                "pack --weights requires --emit (the mixed stream "
                "only exists as materialized sequences; use "
                "'shuffle --weights' for the assignment relation)"
            )
        if args.weights is not None and args.no_split:
            raise SystemExit("--weights does not compose with --no-split")
        if args.emit:
            from huckli_spark.operators.packing import (
                emit_sequences,
                emit_sequences_nosplit,
                epoch_emit,
                epoch_mix_emit,
            )

            if args.weights is not None:
                if "source" not in docs.columns:
                    raise SystemExit(
                        "pack --emit --weights needs a 'source' "
                        "column on the corpus"
                    )
                wmap = _parse_weights(args.weights, args.default_weight)
                emitted = epoch_mix_emit(
                    docs.select("doc_id", "source", "text"),
                    wmap,
                    epoch=args.epoch if args.epoch is not None else 0,
                    budget=args.budget, n_shards=args.shards,
                    default_weight=args.default_weight,
                    n_buckets=args.buckets,
                )
                summary["weights"] = wmap
                summary["epoch"] = (
                    args.epoch if args.epoch is not None else 0
                )
            elif args.no_split:
                emitted = emit_sequences_nosplit(
                    docs.select("doc_id", "text"), budget=args.budget,
                    n_shards=args.shards, order=args.pack_order,
                )
                summary["no_split"] = True
            elif args.epoch is not None:
                emitted = epoch_emit(
                    docs.select("doc_id", "text"), epoch=args.epoch,
                    budget=args.budget, n_shards=args.shards,
                    n_buckets=args.buckets,
                )
                summary["epoch"] = args.epoch
            else:
                emitted = emit_sequences(
                    docs.select("doc_id", "text"), budget=args.budget,
                    n_shards=args.shards,
                )
            emitted.write.mode("overwrite").parquet(args.out)
            agg = spark.read.parquet(args.out).agg(
                F.count("*").alias("seqs"),
                F.sum("n_tokens").alias("tokens"),
                F.sum("n_docs").alias("doc_slots"),
            ).collect()[0]
            summary |= {
                "seqs": agg["seqs"],
                "tokens": int(agg["tokens"]),
                "budget": args.budget,
                "shards": args.shards,
                "emitted": True,
            }
        elif args.no_split:
            if order_cols is not None:
                raise SystemExit("--no-split and --curriculum are exclusive")
            from huckli_spark.operators.packing import pack_sequences_nosplit

            packed = pack_sequences_nosplit(
                pack_in, budget=args.budget, n_shards=args.shards,
                order=args.pack_order,
            )
        elif args.epoch is not None:
            from huckli_spark.operators.packing import epoch_pack

            packed = epoch_pack(
                docs.select("doc_id", "text"), epoch=args.epoch,
                budget=args.budget, n_shards=args.shards,
                n_buckets=args.buckets,
            )
            summary["epoch"] = args.epoch
        else:
            packed = pack_sequences(
                pack_in, budget=args.budget, n_shards=args.shards,
                order_cols=order_cols,
            )
        if args.manifest:
            from huckli_spark.operators.packing import loader_steps

            rel = loader_steps(
                packed, budget=args.budget,
                start_step=args.resume_step,
            )
            rel.write.mode("overwrite").parquet(args.out)
            w = spark.read.parquet(args.out)
            agg = w.agg(
                F.count("*").alias("steps"),
                F.min("step").alias("first_step"),
            ).collect()[0]
            summary |= {
                "manifest": True,
                "steps": agg["steps"],
                "first_step": agg["first_step"],
                "budget": args.budget,
                "shards": args.shards,
            }
        elif not args.emit:
            if args.spans or args.segments:
                if args.no_split:
                    raise SystemExit(
                        "--spans/--segments apply to split packing "
                        "only (no-split bins keep docs whole; the "
                        "assignment relation IS the span table)"
                    )
                from huckli_spark.operators.packing import (
                    pack_doc_spans,
                    pack_segment_ids,
                )

                spans = pack_doc_spans(packed, budget=args.budget)
                rel = (pack_segment_ids(spans) if args.segments
                       else spans)
                rel.write.mode("overwrite").parquet(args.out)
                w = spark.read.parquet(args.out)
                if args.segments:
                    agg = w.agg(
                        F.count("*").alias("seqs"),
                        F.sum("n_tokens").alias("tokens"),
                    ).collect()[0]
                    summary |= {"segments": True,
                                "seqs": agg["seqs"]}
                else:
                    agg = w.agg(
                        F.count("*").alias("spans"),
                        F.sum("len_in_seq").alias("tokens"),
                    ).collect()[0]
                    summary |= {"spans": agg["spans"]}
                summary |= {
                    "tokens": int(agg["tokens"]),
                    "budget": args.budget,
                    "shards": args.shards,
                }
            else:
                packed.write.mode("overwrite").parquet(args.out)
                agg = spark.read.parquet(args.out).agg(
                    F.count("*").alias("docs"),
                    F.sum("n_tokens").alias("tokens"),
                    (F.max("seq_idx") + 1).alias("max_seqs_per_shard"),
                ).collect()[0]
                summary |= {
                    "docs": agg["docs"],
                    "tokens": int(agg["tokens"]),
                    "budget": args.budget,
                    "shards": args.shards,
                }

    elif args.cmd == "tokenize":
        from huckli_spark.operators.tokenizer_store import (
            bpe_table,
            save_tokenizer,
        )

        if args.method == "bpe":
            from huckli_spark.operators.bpe import bpe_apply, bpe_train

            merges, _words = bpe_train(docs, n_merges=args.merges)
            with open(os.path.join(args.out, "merges.json"), "w") as fh:
                json.dump([list(m) for m in merges], fh)
            man = save_tokenizer(
                os.path.join(args.out, "tokenizer"),
                "bpe",
                bpe_table(spark, merges),
                params={"n_merges": args.merges},
            )
            tok = bpe_apply(docs, merges).select(
                "doc_id", F.col("__w").alias("word"), "syms"
            )
            tok.write.mode("overwrite").parquet(
                os.path.join(args.out, "tokens")
            )
            agg = spark.read.parquet(
                os.path.join(args.out, "tokens")
            ).agg(
                F.count("*").alias("words"),
                F.sum(F.size("syms")).alias("tokens"),
            ).collect()[0]
            summary |= {
                "method": "bpe",
                "merges": len(merges),
                "words": agg["words"],
                "tokens": int(agg["tokens"]),
                "tokenizer_checksum": man["checksum"],
            }
        else:
            from huckli_spark.operators.unigram_lm import (
                unigram_encode,
                unigram_fit,
            )

            vocab = unigram_fit(
                docs, vocab_size=args.vocab_size, n_iters=args.iters
            )
            man = save_tokenizer(
                os.path.join(args.out, "tokenizer"),
                "unigram",
                vocab,
                params={
                    "vocab_size": args.vocab_size,
                    "n_iters": args.iters,
                },
            )
            enc = unigram_encode(docs, vocab)
            enc.write.mode("overwrite").parquet(
                os.path.join(args.out, "tokens")
            )
            agg = spark.read.parquet(
                os.path.join(args.out, "tokens")
            ).agg(
                F.count("*").alias("docs"),
                F.sum("n_tokens").alias("tokens"),
            ).collect()[0]
            summary |= {
                "method": "unigram",
                "vocab": man["n_rows"],
                "docs": agg["docs"],
                "tokens": int(agg["tokens"]),
                "tokenizer_checksum": man["checksum"],
            }

    # quarantine is written LAST: the command outputs above use
    # overwrite mode on args.out and would wipe an earlier write
    if quarantine is not None:
        n_bad = quarantine.count()
        summary["quarantined"] = n_bad
        if n_bad:
            quarantine.write.mode("overwrite").parquet(
                os.path.join(args.out, "_quarantine")
            )
    print(json.dumps(summary))
    return 0




def _export(spark, docs, out: str, n_shards: int, out_format: str) -> dict:
    """Deterministic sharded export with a checksummed manifest — the
    corpus-shipping step after prep: consumers verify shard integrity
    from MANIFEST.json without trusting the transport.

    Sharding is the portable hash (same as q_shard_assign), rows sort
    by doc_id within each shard, and repartition(n, shard) pins every
    shard to exactly one task — so each shard directory holds ONE
    file whose bytes are identical across reruns on the same data
    (manifest checksums are reproducible, not just descriptive).
    Checksums are computed driver-side over the written files (IO
    bound; at 100 TB move the hashing into a binaryFile scan +
    mapInPandas so each executor checksums its own shards)."""
    import hashlib

    from pyspark.sql import functions as F

    from huckli_spark.functions.portable import h60

    data_dir = os.path.join(out, "data")
    sharded = (
        docs.withColumn(
            "shard",
            F.pmod(
                h60(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
                F.lit(n_shards),
            ).cast("int"),
        )
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "doc_id")
    )
    writer = sharded.write.mode("overwrite").partitionBy("shard")
    if out_format == "jsonl":
        writer.json(data_dir)
    else:
        writer.parquet(data_dir)

    rows_per_shard = {
        int(r["shard"]): int(r["n"])
        for r in sharded.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    shards = []
    total_bytes = 0
    for name in sorted(os.listdir(data_dir)):
        if not name.startswith("shard="):
            continue
        sid = int(name.split("=", 1)[1])
        d = os.path.join(data_dir, name)
        files = sorted(
            f for f in os.listdir(d)
            if not f.startswith((".", "_"))
        )
        for f in files:
            fp = os.path.join(d, f)
            h = hashlib.sha256()
            with open(fp, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
            size = os.path.getsize(fp)
            total_bytes += size
            shards.append(
                {
                    "shard": sid,
                    "file": os.path.join(name, f),
                    "bytes": size,
                    "rows": rows_per_shard.get(sid, 0),
                    "sha256": h.hexdigest(),
                }
            )
    manifest = {
        "format": out_format,
        "n_shards": n_shards,
        "total_rows": sum(rows_per_shard.values()),
        "total_bytes": total_bytes,
        "shards": shards,
    }
    with open(os.path.join(out, "MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return {
        "docs": manifest["total_rows"],
        "shards_written": len(shards),
        "bytes": total_bytes,
        "manifest": os.path.join(out, "MANIFEST.json"),
    }


def _release_verify(spark, args) -> dict:
    """Consumer-side verification of an exported release — the check
    a downstream team runs BEFORE training on shipped data. Re-hashes
    every shard file against MANIFEST.json (sha256 + byte size),
    re-counts rows per shard with Spark in the manifest's declared
    format, verifies RELEASE.json's md5 over the MANIFEST bytes when
    the root is a full release bundle, and re-loads the tokenizer
    store (its loader re-verifies the content checksum) when one is
    present. Read-only; exit code 1 on any mismatch. Driver-side
    hashing is IO-bound like the producer's — at 100 TB move both
    ends into a binaryFile + mapInPandas scan."""
    import hashlib
    import json as _json

    from pyspark.sql import functions as F

    root = args.inp
    problems: list[str] = []
    release_json = os.path.join(root, "RELEASE.json")
    export_root = root
    rel = None
    if os.path.exists(release_json):
        with open(release_json) as fh:
            rel = _json.load(fh)
        export_root = os.path.join(root, "data")
        with open(os.path.join(export_root, "MANIFEST.json"), "rb") as fh:
            got = hashlib.md5(fh.read()).hexdigest()
        if got != rel.get("manifest_md5"):
            problems.append(
                f"RELEASE.json manifest_md5 {rel.get('manifest_md5')} "
                f"!= actual {got}"
            )
    with open(os.path.join(export_root, "MANIFEST.json")) as fh:
        man = _json.load(fh)
    data_dir = os.path.join(export_root, "data")
    n_files = 0
    for sh in man["shards"]:
        fp = os.path.join(data_dir, sh["file"])
        if not os.path.exists(fp):
            problems.append(f"missing shard file {sh['file']}")
            continue
        n_files += 1
        if os.path.getsize(fp) != sh["bytes"]:
            problems.append(
                f"{sh['file']}: {os.path.getsize(fp)} bytes, manifest "
                f"says {sh['bytes']}"
            )
        h = hashlib.sha256()
        with open(fp, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
        if h.hexdigest() != sh["sha256"]:
            problems.append(f"{sh['file']}: sha256 mismatch")
    total = 0
    try:
        reader = spark.read
        df = (reader.json(data_dir) if man["format"] == "jsonl"
              else reader.parquet(data_dir))
        per_shard = {
            int(r["shard"]): int(r["n"])
            for r in df.groupBy("shard").agg(
                F.count("*").alias("n")
            ).collect()
        }
        want_per_shard = {sh["shard"]: sh["rows"] for sh in man["shards"]}
        if per_shard != want_per_shard:
            problems.append(
                f"row counts per shard {per_shard} != manifest "
                f"{want_per_shard}"
            )
        total = sum(per_shard.values())
        if total != man["total_rows"]:
            problems.append(
                f"total rows {total} != manifest {man['total_rows']}"
            )
    except Exception as exc:  # noqa: BLE001 — unreadable data IS a finding
        problems.append(
            f"data unreadable as {man['format']}: "
            f"{type(exc).__name__}: {exc}"[:300]
        )
    tok_checked = False
    if rel and rel.get("tokenizer") and rel.get("tokenizer") != "none":
        from huckli_spark.operators.tokenizer_store import load_tokenizer

        try:
            load_tokenizer(
                spark, os.path.join(root, "tokenizer"),
                expect_kind=rel["tokenizer"],
            )
            tok_checked = True
        except Exception as exc:  # noqa: BLE001 — loud in the summary
            problems.append(f"tokenizer store: {type(exc).__name__}: {exc}")
    return {
        "ok": not problems,
        "files_checked": n_files,
        "rows_checked": total,
        "tokenizer_checked": tok_checked,
        "problems": problems,
    }


def _release_diff(spark, args) -> dict:
    """Content diff between two exported releases — the governance
    step before publishing v(N+1): which documents were added,
    removed, or changed (same doc_id, different text) since the
    baseline. Reads each release's data/ in the format its MANIFEST
    declares, keys both sides on (doc_id, md5(text)), and FULL-OUTER
    joins on doc_id — one shuffle per side, O(diff) output columns,
    scale-correct at any corpus size. Writes (doc_id, status) to
    --out/diff.parquet; the summary carries the four counts."""
    import json as _json

    from pyspark.sql import functions as F

    from huckli_spark.operators.dedup import content_diff

    def load_release(root: str):
        man_path = os.path.join(root, "MANIFEST.json")
        with open(man_path) as fh:
            fmt = _json.load(fh).get("format", "jsonl")
        data = os.path.join(root, "data")
        reader = spark.read
        return (reader.json(data) if fmt == "jsonl"
                else reader.parquet(data))

    diff = content_diff(load_release(args.rel_a), load_release(args.rel_b))
    out_path = os.path.join(args.out, "diff.parquet")
    diff.write.mode("overwrite").parquet(out_path)
    counts = {
        r["status"]: int(r["n"])
        for r in spark.read.parquet(out_path)
        .groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    return {
        "added": counts.get("added", 0),
        "removed": counts.get("removed", 0),
        "changed": counts.get("changed", 0),
        "unchanged": counts.get("unchanged", 0),
        "diff": out_path,
    }


def _media_card(spark, args) -> dict:
    """Per-modality governance card (the q_media_card relation) over a
    real (media_id, kind, data) parquet, plus optional near-dup pair
    relations. Thin orchestration: scale shapes live in
    operators.multimodal (map-only Arrow fingerprint passes; banded /
    shared-frame equi-joins, never all-pairs)."""
    from pyspark.sql import functions as F

    from huckli_spark.operators.multimodal import (
        audio_dedup_pairs,
        audio_fingerprint,
        image_dedup_pairs,
        image_dhash,
        video_dedup_pairs,
        video_frame_hashes,
    )

    media = spark.read.parquet(args.inp)
    kinds = {
        "image": (media.where(F.col("kind") == "image"),
                  image_dhash, "dhash", image_dedup_pairs),
        "audio": (media.where(F.col("kind") == "audio"),
                  audio_fingerprint, "ahash", audio_dedup_pairs),
        "video": (media.where(F.col("kind") == "video"),
                  video_frame_hashes, "fhash", video_dedup_pairs),
    }
    cards = []
    summary: dict = {}
    for kind, (df, fp, hcol, _pairs) in kinds.items():
        stats = fp(df).agg(
            F.count(hcol).cast("long").alias("fp_rows"),
            F.count_distinct(hcol).cast("long").alias("distinct_fp"),
        )
        cards.append(
            df.agg(F.count("*").cast("long").alias("n_blobs"))
            .crossJoin(stats)
            .select(
                F.lit(kind).alias("kind"),
                "n_blobs",
                "fp_rows",
                "distinct_fp",
                (F.col("fp_rows") - F.col("distinct_fp"))
                .alias("dup_excess"),
            )
        )
    card = cards[0].unionByName(cards[1]).unionByName(cards[2])
    card.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(args.out, "media_card.parquet")
    )
    for r in spark.read.parquet(
        os.path.join(args.out, "media_card.parquet")
    ).collect():
        summary[r["kind"]] = {
            "n_blobs": r["n_blobs"],
            "fp_rows": r["fp_rows"],
            "distinct_fp": r["distinct_fp"],
            "dup_excess": r["dup_excess"],
        }
    if args.pairs:
        for kind, (df, _fp, _hcol, pairs_fn) in kinds.items():
            out = os.path.join(args.out, f"{kind}_pairs.parquet")
            if kind == "video":
                pairs_fn(df).write.mode("overwrite").parquet(out)
            else:
                pairs_fn(df, max_hamming=args.max_hamming).write.mode(
                    "overwrite"
                ).parquet(out)
            summary[kind]["n_pairs"] = spark.read.parquet(out).count()
    if getattr(args, "cap", 0):
        # keep-<=K decisions per transitive duplicate cluster, all
        # three modalities in one decision table (q_media_dedup_cap)
        from huckli_spark.operators.dedup import capped_keep_decisions

        decisions = capped_keep_decisions(
            [
                (
                    kind,
                    pairs_fn(df)
                    if kind == "video"
                    else pairs_fn(df, max_hamming=args.max_hamming),
                )
                for kind, (df, _fp, _hcol, pairs_fn) in kinds.items()
            ],
            k=args.cap,
        )
        dout = os.path.join(args.out, "media_keep_decisions.parquet")
        decisions.write.mode("overwrite").parquet(dout)
        kept_df = spark.read.parquet(dout)
        summary["cap"] = {
            "k": args.cap,
            "decisions": kept_df.count(),
            "dropped": kept_df.where(~F.col("kept")).count(),
        }
    # reconciliation (ADVICE r09 #4): rows whose kind is none of the
    # three modalities must not vanish silently from the card — one
    # extra aggregate over the same scan, surfaced as "unknown"
    total = media.count()
    classified = sum(summary[k]["n_blobs"] for k in kinds)
    if classified != total:
        unknown_kinds = [
            r["kind"]
            for r in media.where(
                ~F.col("kind").isin("image", "audio", "video")
                | F.col("kind").isNull()
            )
            .select("kind")
            .distinct()
            .collect()
        ]
        summary["unknown"] = {
            "n_blobs": total - classified,
            "kinds": sorted(k if k is not None else "<null>"
                            for k in unknown_kinds),
        }
    summary["total_blobs"] = total
    return summary


def _release(spark, docs, args) -> dict:
    """The dataset-release bundle: everything a consumer needs to
    verify and reproduce, in one directory — sharded data with a
    checksummed MANIFEST, the per-source data card, the all-pairs
    source overlap matrix, an optional checksummed tokenizer store,
    and RELEASE.json tying them together. Thin orchestration over
    the tested operators; scale shapes are theirs."""
    import hashlib

    from pyspark.sql import functions as F

    from huckli_spark.functions.portable import h60
    from huckli_spark.operators.dedup import shingles
    from huckli_spark.operators.textstats import (
        GOPHER_STOPWORDS,
        gopher_rules,
    )

    out = args.out
    rel: dict = {}

    # 1. sharded export + MANIFEST
    rel |= _export(spark, docs, os.path.join(out, "data"), args.shards,
                   "jsonl")

    # 2. per-source data card (q_data_card's relation, over the
    # release corpus rather than the fixture layout)
    stops = (
        tuple(t for t in args.stopwords.split(",") if t)
        if args.stopwords
        else GOPHER_STOPWORDS
    )
    verdicts = gopher_rules(docs, stopwords=stops).select(
        "doc_id", "passes"
    )
    per_doc = docs.join(verdicts, "doc_id").select(
        "source",
        "lang",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.md5("text").alias("th"),
        "passes",
    )
    card = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        (F.count("*") - F.count_distinct("th")).cast("long")
        .alias("n_exact_dups"),
        F.floor(
            F.sum(F.when(F.col("passes"), 1).otherwise(0))
            * F.lit(1000000.0) / F.count("*") + F.lit(0.5)
        ).cast("long").alias("pass_rate_micro"),
    )
    card.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "data_card.parquet")
    )
    rel["card_sources"] = card.count()

    # 3. all-pairs source overlap matrix (only meaningful with >= 2
    # sources)
    n_sources = docs.select("source").distinct().count()
    if n_sources >= 2:
        sh = (
            shingles(docs, id_col="source", text_col="text", n=3)
            .select("source", h60(F.col("shingle")).alias("sh"))
            .distinct()
        )
        x = sh.select(F.col("source").alias("src_a"), "sh")
        y = sh.select(F.col("source").alias("src_b"), "sh")
        overlap = (
            x.join(y, "sh")
            .where(F.col("src_a") < F.col("src_b"))
            .groupBy("src_a", "src_b")
            .agg(F.count("*").cast("long").alias("shared"))
        )
        overlap.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, "source_overlap.parquet")
        )
        rel["overlap_pairs"] = overlap.count()
    else:
        rel["overlap_pairs"] = 0

    # 4. optional tokenizer store
    if args.tokenizer != "none":
        from huckli_spark.operators.tokenizer_store import (
            bpe_table,
            save_tokenizer,
        )

        if args.tokenizer == "bpe":
            from huckli_spark.operators.bpe import bpe_train

            merges, _ = bpe_train(docs, n_merges=32)
            man = save_tokenizer(
                os.path.join(out, "tokenizer"), "bpe",
                bpe_table(spark, merges), params={"n_merges": 32},
            )
        else:
            from huckli_spark.operators.unigram_lm import unigram_fit

            vocab = unigram_fit(docs, vocab_size=120, n_iters=2)
            man = save_tokenizer(
                os.path.join(out, "tokenizer"), "unigram", vocab,
                params={"vocab_size": 120, "n_iters": 2},
            )
        rel["tokenizer"] = args.tokenizer
        rel["tokenizer_checksum"] = man["checksum"]

    # 4b. optional media card (round 9): the per-modality governance
    # relation over a (media_id, kind, data) parquet shipped with the
    # release — same relation as the media-card subcommand
    if getattr(args, "media", None):
        from types import SimpleNamespace

        rel["media_card"] = _media_card(
            spark,
            SimpleNamespace(inp=args.media, out=out, pairs=False,
                            max_hamming=3, cap=args.media_cap),
        )

    # 5. RELEASE.json: pointers + a checksum over the data MANIFEST
    # so the release is self-verifying end to end
    with open(os.path.join(out, "data", "MANIFEST.json"), "rb") as fh:
        rel["manifest_md5"] = hashlib.md5(fh.read()).hexdigest()
    with open(os.path.join(out, "RELEASE.json"), "w") as fh:
        json.dump(rel, fh, indent=2, sort_keys=True)
    return rel


if __name__ == "__main__":
    sys.exit(main())
