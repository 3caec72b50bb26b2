"""corpus_cli end-to-end: each subcommand over a JSONL corpus —
quarantine surfaced, summaries truthful, outputs feed the next stage."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from huckli_spark.corpus_cli import main


@pytest.fixture()
def jsonl_corpus(tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    docs = [
        {"doc_id": i, "text": t, "lang": "en", "source": "s", "n_chars": len(t)}
        for i, t in enumerate(
            [
                "the quick brown fox email me a@b.co now",
                "the quick brown fox email me a@b.co now",  # exact dup
                "totally different words entirely here",
                "pack these tokens into sequences for training runs",
            ]
        )
    ]
    with open(p / "docs.jsonl", "w") as fh:
        for d in docs:
            fh.write(json.dumps(d) + "\n")
        fh.write("{broken json line\n")
    return str(p)


def _run(capsys, argv):
    rc = main(argv)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


class TestCorpusCli:
    def test_scrub(self, spark, tmp_path, jsonl_corpus, capsys):
        out = str(tmp_path / "clean")
        s = _run(capsys, ["scrub", "--in", jsonl_corpus, "--format", "jsonl",
                          "--out", out])
        assert s["docs"] == 4 and s["quarantined"] == 1
        assert s["pii_redacted"] == 2  # one email in each dup doc
        texts = [r["text"] for r in spark.read.parquet(out).collect()]
        assert all("a@b.co" not in t for t in texts)
        assert os.path.isdir(os.path.join(out, "_quarantine"))

    def test_dedup_exact_then_pack_chain(self, spark, tmp_path, jsonl_corpus,
                                         capsys):
        clean = str(tmp_path / "clean")
        _run(capsys, ["scrub", "--in", jsonl_corpus, "--format", "jsonl",
                      "--out", clean])
        kept = str(tmp_path / "kept")
        s = _run(capsys, ["dedup", "--in", clean, "--out", kept,
                          "--method", "exact"])
        assert s["docs_in"] == 4 and s["docs_kept"] == 3 and s["removed"] == 1
        packed = str(tmp_path / "packed")
        s = _run(capsys, ["pack", "--in", kept, "--out", packed,
                          "--budget", "16", "--shards", "2"])
        assert s["docs"] == 3 and s["tokens"] > 0

    def test_dedup_minhash(self, spark, tmp_path, jsonl_corpus, capsys):
        clean = str(tmp_path / "clean")
        _run(capsys, ["scrub", "--in", jsonl_corpus, "--format", "jsonl",
                      "--out", clean])
        kept = str(tmp_path / "kept_mh")
        s = _run(capsys, ["dedup", "--in", clean, "--out", kept,
                          "--method", "minhash", "--threshold", "0.9"])
        assert s["docs_kept"] == 3  # the exact dup is also a minhash dup

    def test_dedup_semdedup(self, spark, tmp_path, jsonl_corpus, capsys):
        clean = str(tmp_path / "clean")
        _run(capsys, ["scrub", "--in", jsonl_corpus, "--format", "jsonl",
                      "--out", clean])
        # embeddings keyed by doc_id: docs 0/1 collinear (semantic
        # dup), 2/3 orthogonal singletons
        emb = str(tmp_path / "emb")
        spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (1, [0.99, 0.01, 0.0]),
             (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])],
            "vec_id long, embedding array<float>",
        ).write.parquet(emb)
        kept = str(tmp_path / "kept_sd")
        s = _run(capsys, ["dedup", "--in", clean, "--out", kept,
                          "--method", "semdedup", "--embeddings", emb,
                          "--clusters", "2", "--tau", "0.95"])
        assert s["method"] == "semdedup"
        assert s["docs_in"] == 4 and s["docs_kept"] == 3
        ids = {r["doc_id"] for r in spark.read.parquet(kept).collect()}
        assert ids == {0, 2, 3}  # doc 1 is the semantic dup (higher id)

    def test_dedup_substring_cuts_spans(self, spark, tmp_path, capsys):
        inp = str(tmp_path / "docs")
        spark.createDataFrame(
            [
                (0, "intro words then a shared boilerplate block here "
                    "plus unique tail zero"),
                (1, "different opening a shared boilerplate block here "
                    "and unique tail one"),
                (2, "a shared boilerplate block here"),  # cut to empty
                (3, "totally original content with no repeats at all"),
            ],
            "doc_id long, text string",
        ).write.parquet(inp)
        kept = str(tmp_path / "kept_ss")
        s = _run(capsys, ["dedup", "--in", inp, "--out", kept,
                          "--method", "substring", "--window-len", "5"])
        assert s["method"] == "substring"
        assert s["docs_in"] == 4
        # doc 2 was cut to empty and removed; the others survive with
        # the shared 5-word run removed from every occurrence
        assert s["docs_kept"] == 3 and s["removed"] == 1
        # "a shared boilerplate block here" = 5 words x 3 occurrences
        assert s["words_cut"] == 15
        rows = {r["doc_id"]: r["text"]
                for r in spark.read.parquet(kept).collect()}
        assert rows[0] == "intro words then plus unique tail zero"
        assert rows[1] == "different opening and unique tail one"
        assert rows[3] == "totally original content with no repeats at all"

    def test_dedup_semdedup_requires_embeddings(self, tmp_path, jsonl_corpus,
                                                capsys):
        with pytest.raises(SystemExit):
            main(["dedup", "--in", jsonl_corpus, "--format", "jsonl",
                  "--out", str(tmp_path / "x"), "--method", "semdedup"])

    def test_quality(self, spark, tmp_path, jsonl_corpus, capsys):
        clean = str(tmp_path / "clean")
        _run(capsys, ["scrub", "--in", jsonl_corpus, "--format", "jsonl",
                      "--out", clean])
        scored = str(tmp_path / "scored")
        s = _run(capsys, ["quality", "--in", clean, "--out", scored])
        assert s["docs"] == 4
        cols = set(spark.read.parquet(scored).columns)
        assert {"doc_id", "distinct_ratio", "top_word_frac"} <= cols

    def test_tokenize(self, spark, tmp_path, jsonl_corpus, capsys):
        tok = str(tmp_path / "tok")
        s = _run(capsys, ["tokenize", "--in", jsonl_corpus, "--format", "jsonl",
                          "--out", tok, "--merges", "6"])
        assert s["merges"] == 6 and s["words"] > 0 and s["tokens"] > 0
        merges = json.load(open(os.path.join(tok, "merges.json")))
        assert len(merges) == 6 and all(len(m) == 2 for m in merges)
        # the checksummed tokenizer store publishes alongside
        assert s["tokenizer_checksum"]
        assert os.path.exists(
            os.path.join(tok, "tokenizer", "manifest.json")
        )

    def test_tokenize_unigram(self, spark, tmp_path, jsonl_corpus, capsys):
        from huckli_spark.operators.tokenizer_store import load_tokenizer

        tok = str(tmp_path / "tok_uni")
        s = _run(capsys, ["tokenize", "--in", jsonl_corpus,
                          "--format", "jsonl", "--out", tok,
                          "--method", "unigram", "--vocab-size", "30",
                          "--iters", "1"])
        assert s["method"] == "unigram"
        assert s["docs"] > 0 and s["tokens"] > 0
        table, man = load_tokenizer(
            spark, os.path.join(tok, "tokenizer"), expect_kind="unigram"
        )
        assert man["checksum"] == s["tokenizer_checksum"]
        assert table.count() == s["vocab"]

    def test_pack_curriculum_orders_by_quality(
        self, spark, tmp_path, jsonl_corpus, capsys
    ):
        out = str(tmp_path / "packed_cur")
        s = _run(capsys, ["pack", "--in", jsonl_corpus, "--format",
                          "jsonl", "--out", out, "--budget", "64",
                          "--shards", "1", "--curriculum"])
        assert s["docs"] > 0
        rows = sorted(
            spark.read.parquet(out).collect(),
            key=lambda r: r["pack_rank"],
        )
        # within the single shard, offsets must be the running sum in
        # pack_rank order (curriculum order is internally consistent)
        off = 0
        for r in rows:
            assert r["seq_idx"] * 64 + r["offset_in_seq"] == off
            off += r["n_tokens"]


class TestExport:
    def test_manifest_checksums_and_determinism(
        self, spark, tmp_path, jsonl_corpus, capsys
    ):
        import hashlib

        out = str(tmp_path / "exported")
        rc = main(
            [
                "export", "--in", jsonl_corpus, "--format", "jsonl",
                "--out", out, "--shards", "4",
            ]
        )
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        man = json.load(open(os.path.join(out, "MANIFEST.json")))
        assert summary["docs"] == man["total_rows"] == 4
        assert sum(s["rows"] for s in man["shards"]) >= man["total_rows"]
        # every checksum verifies against the actual bytes
        for sh in man["shards"]:
            fp = os.path.join(out, "data", sh["file"])
            h = hashlib.sha256(open(fp, "rb").read()).hexdigest()
            assert h == sh["sha256"], sh
            assert os.path.getsize(fp) == sh["bytes"]
        # re-export on the same data reproduces the manifest EXACTLY
        out2 = str(tmp_path / "exported2")
        assert main(
            [
                "export", "--in", jsonl_corpus, "--format", "jsonl",
                "--out", out2, "--shards", "4",
            ]
        ) == 0
        man2 = json.load(open(os.path.join(out2, "MANIFEST.json")))
        assert [s["sha256"] for s in man["shards"]] == [
            s["sha256"] for s in man2["shards"]
        ]

    def test_jsonl_shards_readable_and_complete(
        self, spark, tmp_path, jsonl_corpus, capsys
    ):
        out = str(tmp_path / "exp")
        assert main(
            [
                "export", "--in", jsonl_corpus, "--format", "jsonl",
                "--out", out, "--shards", "2",
            ]
        ) == 0
        man = json.load(open(os.path.join(out, "MANIFEST.json")))
        seen = set()
        for sh in man["shards"]:
            for line in open(os.path.join(out, "data", sh["file"])):
                seen.add(json.loads(line)["doc_id"])
        assert seen == {0, 1, 2, 3}


class TestCurate:
    def test_curate_gates_and_selects(self, spark, tmp_path, capsys):
        import json as _json

        p = tmp_path / "raw2"
        p.mkdir()
        long_en = "the of " + " ".join(["alpha beta gamma"] * 20)
        long_xx = "the of " + " ".join(["omega psi chi"] * 20)
        docs = [
            {"doc_id": 0, "text": long_en, "lang": "en", "source": "s",
             "n_chars": len(long_en)},
            {"doc_id": 1, "text": long_en + " delta", "lang": "en",
             "source": "s", "n_chars": len(long_en) + 6},
            {"doc_id": 2, "text": long_xx, "lang": "xx", "source": "s",
             "n_chars": len(long_xx)},
            # too short -> fails the word-count rule, never reaches DSIR
            {"doc_id": 3, "text": "the of tiny", "lang": "en", "source": "s",
             "n_chars": 11},
        ]
        with open(p / "docs.jsonl", "w") as fh:
            for d in docs:
                fh.write(_json.dumps(d) + "\n")
        out = str(tmp_path / "curated")
        s = _run(capsys, [
            "curate", "--in", str(p), "--out", out, "--format", "jsonl",
            "--target-lang", "en", "--keep", "2",
            "--stopwords", "the,of",
        ])
        assert s["docs_in"] == 4
        assert s["rule_pass"] == 3      # doc 3 fails word count
        assert s["selected"] == 2       # DSIR top-2 of the pool
        kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert 3 not in kept
        # the en-vocab docs outrank the background-only doc
        assert kept == {0, 1}

    def test_curate_pack_export_chain(self, spark, tmp_path, capsys):
        import json as _json

        p = tmp_path / "raw3"
        p.mkdir()
        base = "the of " + " ".join(["alpha beta gamma"] * 20)
        docs = [
            {"doc_id": i, "text": base + f" extra{i}", "lang": "en",
             "source": "s", "n_chars": len(base) + 7}
            for i in range(6)
        ] + [
            {"doc_id": 6, "text": "the of tiny", "lang": "en", "source": "s",
             "n_chars": 11},  # fails word count
        ]
        with open(p / "docs.jsonl", "w") as fh:
            for d in docs:
                fh.write(_json.dumps(d) + "\n")
        curated = str(tmp_path / "c1")
        s1 = _run(capsys, [
            "curate", "--in", str(p), "--out", curated, "--format", "jsonl",
            "--target-lang", "en", "--keep", "4", "--stopwords", "the,of",
        ])
        assert s1["rule_pass"] == 6 and s1["selected"] == 4
        packed = str(tmp_path / "c2")
        s2 = _run(capsys, [
            "pack", "--in", curated, "--out", packed,
            "--budget", "64", "--shards", "2",
        ])
        assert s2["docs"] == 4 and s2["tokens"] > 0
        exported = str(tmp_path / "c3")
        s3 = _run(capsys, [
            "export", "--in", curated, "--out", exported, "--shards", "2",
        ])
        assert s3["docs"] == 4 and s3["shards_written"] == 2
        man = _json.load(open(f"{exported}/MANIFEST.json"))
        assert len(man["shards"]) == 2

    def test_release_bundle(self, spark, tmp_path, capsys):
        """`release` ties export + data card + overlap + tokenizer into
        one self-verifying directory; every artifact must agree with
        the summary JSON and the tokenizer must reload cleanly."""
        import hashlib
        import json as _json

        p = tmp_path / "raw4"
        p.mkdir()
        shared = "the quick brown fox jumps over that lazy dog with all of it"
        docs = [
            {"doc_id": 0, "text": shared, "lang": "en", "source": "web",
             "n_chars": len(shared)},
            {"doc_id": 1, "text": shared, "lang": "en", "source": "books",
             "n_chars": len(shared)},
            {"doc_id": 2, "text": "entirely different words appear here "
             "with the full set of tokens", "lang": "de", "source": "web",
             "n_chars": 66},
        ]
        with open(p / "docs.jsonl", "w") as fh:
            for d in docs:
                fh.write(_json.dumps(d) + "\n")
        out = str(tmp_path / "rel")
        s = _run(capsys, [
            "release", "--in", str(p), "--format", "jsonl", "--out", out,
            "--shards", "2", "--tokenizer", "unigram",
        ])
        assert s["docs"] == 3 and s["shards_written"] == 2
        assert s["card_sources"] == 2
        # web/books share every 3-shingle of `shared`; the pair exists
        assert s["overlap_pairs"] == 1
        # RELEASE.json matches the printed summary exactly (main adds
        # cmd + the jsonl quarantine count on top of the release dict)
        rel = _json.load(open(f"{out}/RELEASE.json"))
        assert rel == {
            k: v for k, v in s.items() if k not in ("cmd", "quarantined")
        }
        # manifest_md5 actually verifies the data MANIFEST on disk
        raw = open(f"{out}/data/MANIFEST.json", "rb").read()
        assert hashlib.md5(raw).hexdigest() == rel["manifest_md5"]
        # data card: web has 2 docs (one en one de), books 1
        card = {
            r["source"]: r.asDict()
            for r in spark.read.parquet(f"{out}/data_card.parquet").collect()
        }
        assert card["web"]["n_docs"] == 2 and card["web"]["n_langs"] == 2
        assert card["books"]["n_docs"] == 1
        assert card["web"]["n_exact_dups"] == 0  # dup is ACROSS sources
        # tokenizer store reloads + checksum-verifies
        from huckli_spark.operators.tokenizer_store import load_tokenizer

        table, man = load_tokenizer(spark, f"{out}/tokenizer",
                                    expect_kind="unigram")
        assert man["checksum"] == s["tokenizer_checksum"]
        assert table.count() == man["n_rows"] > 0


class TestMediaCard:
    def test_media_card_and_pairs(self, spark, tmp_path, capsys):
        import numpy as np

        from huckli_spark.operators import multimodal as mm

        rng = np.random.RandomState(17)
        img = rng.randint(0, 200, size=(24, 33, 1), dtype=np.uint8)
        wav = rng.randint(-2000, 2000, size=1220).astype(np.int16)
        frame = rng.randint(0, 200, size=(24, 33, 1), dtype=np.uint8)
        rows = [
            # two brightness copies (Hamming 0) + one distinct image
            (0, "image", mm.encode_png(img)),
            (1, "image",
             mm.encode_png((img.astype(np.int64) + 30).astype(np.uint8))),
            (2, "image",
             mm.encode_png(rng.randint(0, 200, size=(24, 33, 1),
                                       dtype=np.uint8))),
            # a gain copy pair
            (3, "audio", mm.encode_wav(wav, 8000)),
            (4, "audio",
             mm.encode_wav((wav.astype(np.int64) * 4).astype(np.int16),
                           8000)),
            # two videos sharing one frame
            (5, "video", mm.encode_video([frame, img])),
            (6, "video", mm.encode_video([frame])),
            # an unclassified modality + a NULL kind: must surface in
            # the reconciliation row, not vanish (ADVICE r09 #4)
            (7, "mesh3d", b"\x00\x01"),
            (8, None, b"\x02"),
        ]
        inp = str(tmp_path / "media")
        spark.createDataFrame(
            rows, "media_id long, kind string, data binary"
        ).write.parquet(inp)
        out = str(tmp_path / "card")
        s = _run(capsys, ["media-card", "--in", inp, "--out", out,
                          "--pairs", "--cap", "1"])
        assert s["image"] == {"n_blobs": 3, "fp_rows": 3, "distinct_fp": 2,
                              "dup_excess": 1, "n_pairs": 1}
        assert s["audio"]["n_blobs"] == 2 and s["audio"]["dup_excess"] == 1
        assert s["audio"]["n_pairs"] == 1
        assert s["video"]["n_blobs"] == 2
        assert s["video"]["n_pairs"] == 1
        assert s["unknown"] == {"n_blobs": 2, "kinds": ["<null>", "mesh3d"]}
        assert s["total_blobs"] == 9
        # keep-<=1 decisions: image pair (0,1) -> keep 0 drop 1;
        # audio pair (3,4) -> keep 3 drop 4; video pair (5,6) ->
        # keep 5 drop 6 = 6 decision rows, 3 dropped
        assert s["cap"] == {"k": 1, "decisions": 6, "dropped": 3}
        dec = {
            (r["kind"], r["media_id"]): (r["rank_in_cluster"], r["kept"])
            for r in spark.read.parquet(
                os.path.join(out, "media_keep_decisions.parquet")
            ).collect()
        }
        assert dec[("image", 0)] == (1, True)
        assert dec[("image", 1)] == (2, False)
        assert dec[("video", 6)] == (2, False)
        card = {
            r["kind"]: r
            for r in spark.read.parquet(
                os.path.join(out, "media_card.parquet")
            ).collect()
        }
        assert card["image"]["dup_excess"] == 1
        pairs = spark.read.parquet(
            os.path.join(out, "image_pairs.parquet")
        ).collect()
        assert [(p.d1, p.d2, p.hamming) for p in pairs] == [(0, 1, 0)]


class TestReleaseWithMedia:
    def test_release_bundle_gains_media_card(self, spark, tmp_path, capsys):
        import json as _json

        import numpy as np

        from huckli_spark.operators import multimodal as mm

        # tiny docs corpus
        docs = spark.createDataFrame(
            [(i, f"doc {i} text body {i % 3}", "en", f"src{i % 2}")
             for i in range(12)],
            "doc_id long, text string, lang string, source string",
        )
        inp = str(tmp_path / "docs")
        docs.write.parquet(inp)
        # tiny media table with one brightness-dup image pair
        rng = np.random.RandomState(23)
        img = rng.randint(0, 200, size=(24, 33, 1), dtype=np.uint8)
        media = spark.createDataFrame(
            [
                (0, "image", mm.encode_png(img)),
                (1, "image",
                 mm.encode_png((img.astype(np.int64) + 20)
                               .astype(np.uint8))),
            ],
            "media_id long, kind string, data binary",
        )
        minp = str(tmp_path / "media")
        media.write.parquet(minp)
        out = str(tmp_path / "rel")
        s = _run(capsys, ["release", "--in", inp, "--out", out,
                          "--shards", "2", "--media", minp,
                          "--media-cap", "1"])
        assert s["media_card"]["image"] == {
            "n_blobs": 2, "fp_rows": 2, "distinct_fp": 1, "dup_excess": 1,
        }
        assert s["media_card"]["audio"]["n_blobs"] == 0
        # keep-<=1 over the single dup pair: 2 decisions, 1 dropped
        assert s["media_card"]["cap"] == {
            "k": 1, "decisions": 2, "dropped": 1,
        }
        rel = _json.load(open(os.path.join(out, "RELEASE.json")))
        assert rel["media_card"]["image"]["dup_excess"] == 1
        assert os.path.isdir(os.path.join(out, "media_card.parquet"))
        assert os.path.isdir(
            os.path.join(out, "media_keep_decisions.parquet")
        )


class TestSubstringReleaseJourney:
    def test_substring_dedup_feeds_release_bundle(
        self, spark, tmp_path, capsys
    ):
        """The end-to-end journey the other dedup methods have, for
        --method substring: span-cut dedup -> release bundle. The cut
        output (parquet with the spans removed) must flow into release
        unchanged, and the bundle's data card must describe the CUT
        corpus — zero exact dups left, token counts net of the cut."""
        import json as _json

        boiler = "subscribe to our newsletter for weekly updates today"
        inp = str(tmp_path / "raw_ss")
        spark.createDataFrame(
            [
                (0, f"alpha article body {boiler}", "en", "web"),
                (1, f"{boiler} beta article body", "en", "web"),
                (2, boiler, "en", "feeds"),  # pure boilerplate: dropped
                (3, "gamma article body with original words only",
                 "en", "feeds"),
            ],
            "doc_id long, text string, lang string, source string",
        ).withColumn("n_chars", F.length("text")).write.parquet(inp)

        kept = str(tmp_path / "kept_ss2")
        s1 = _run(capsys, ["dedup", "--in", inp, "--out", kept,
                           "--method", "substring", "--window-len", "8"])
        assert s1["method"] == "substring"
        assert s1["docs_in"] == 4 and s1["docs_kept"] == 3
        assert s1["words_cut"] == 24  # 8-word boilerplate x 3 occurrences

        out = str(tmp_path / "rel_ss")
        s2 = _run(capsys, ["release", "--in", kept, "--out", out,
                           "--shards", "1", "--tokenizer", "none"])
        assert s2["docs"] == 3
        rel = _json.load(open(f"{out}/RELEASE.json"))
        assert rel["docs"] == 3
        # both sources survive the cut; the boilerplate-only doc fell
        card = {
            r["source"]: r
            for r in spark.read.parquet(f"{out}/data_card.parquet").collect()
        }
        assert set(card) == {"web", "feeds"}
        assert card["web"]["n_exact_dups"] == 0
        # card token counts are net of the cut: doc 0/1 lost the whole
        # 8-word boilerplate run
        assert card["web"]["total_tokens"] == 6  # 3 words each x 2 docs
        assert card["feeds"]["total_tokens"] == 7
        # released text is the cut text, not the raw input
        texts = [
            _json.loads(ln)["text"]
            for shard in os.listdir(f"{out}/data")
            if shard.endswith(".jsonl")
            for ln in open(f"{out}/data/{shard}")
        ]
        assert all("newsletter" not in t for t in texts)


class TestShuffle:
    def test_shuffle_writes_per_epoch_permutations(
        self, spark, tmp_path, jsonl_corpus, capsys
    ):
        clean = str(tmp_path / "clean_sh")
        _run(capsys, ["scrub", "--in", jsonl_corpus, "--format", "jsonl",
                      "--out", clean])
        out = str(tmp_path / "order")
        s = _run(capsys, ["shuffle", "--in", clean, "--out", out,
                          "--epochs", "3", "--buckets", "8"])
        assert s["docs"] == 4 and s["epochs"] == 3 and s["rows"] == 12
        rows = spark.read.parquet(out).collect()
        for e in range(3):
            assert sorted(r.pos for r in rows if r.epoch == e) == [1, 2, 3, 4]


class TestReleaseDiff:
    def test_diff_two_exports(self, spark, tmp_path, capsys):
        def write_corpus(path, rows):
            spark.createDataFrame(
                rows, "doc_id long, text string, lang string, source string"
            ).withColumn("n_chars", F.length("text")).write.parquet(path)

        base = [
            (0, "alpha body original", "en", "s"),
            (1, "beta body original", "en", "s"),
            (2, "gamma body original", "en", "s"),
        ]
        nxt = [
            (0, "alpha body original", "en", "s"),  # unchanged
            (1, "beta body REVISED", "en", "s"),  # changed
            (3, "delta body brand new", "en", "s"),  # added; 2 removed
        ]
        in_a, in_b = str(tmp_path / "ca"), str(tmp_path / "cb")
        write_corpus(in_a, base)
        write_corpus(in_b, nxt)
        rel_a, rel_b = str(tmp_path / "ra"), str(tmp_path / "rb")
        _run(capsys, ["export", "--in", in_a, "--out", rel_a,
                      "--shards", "2"])
        _run(capsys, ["export", "--in", in_b, "--out", rel_b,
                      "--shards", "2"])
        out = str(tmp_path / "diff")
        s = _run(capsys, ["release-diff", "--a", rel_a, "--b", rel_b,
                          "--out", out])
        assert s["added"] == 1 and s["removed"] == 1
        assert s["changed"] == 1 and s["unchanged"] == 1
        status = {
            r.doc_id: r.status
            for r in spark.read.parquet(f"{out}/diff.parquet").collect()
        }
        assert status == {0: "unchanged", 1: "changed",
                          2: "removed", 3: "added"}


class TestReleaseVerify:
    def _corpus(self, spark, tmp_path):
        inp = str(tmp_path / "cv")
        spark.createDataFrame(
            [(i, f"doc body number {i} with several words", "en", "s")
             for i in range(6)],
            "doc_id long, text string, lang string, source string",
        ).withColumn("n_chars", F.length("text")).write.parquet(inp)
        return inp

    def test_intact_release_verifies(self, spark, tmp_path, capsys):
        inp = self._corpus(spark, tmp_path)
        rel = str(tmp_path / "relv")
        _run(capsys, ["release", "--in", inp, "--out", rel,
                      "--shards", "2", "--tokenizer", "unigram"])
        s = _run(capsys, ["release-verify", "--in", rel])
        assert s["ok"] is True and s["problems"] == []
        assert s["files_checked"] == 2 and s["rows_checked"] == 6
        assert s["tokenizer_checked"] is True

    def test_bare_export_verifies(self, spark, tmp_path, capsys):
        inp = self._corpus(spark, tmp_path)
        exp = str(tmp_path / "expv")
        _run(capsys, ["export", "--in", inp, "--out", exp, "--shards", "3"])
        s = _run(capsys, ["release-verify", "--in", exp])
        assert s["ok"] is True and s["rows_checked"] == 6

    def test_tampered_shard_fails_with_exit_1(self, spark, tmp_path, capsys):
        import json as _json

        inp = self._corpus(spark, tmp_path)
        rel = str(tmp_path / "relt")
        _run(capsys, ["release", "--in", inp, "--out", rel,
                      "--shards", "2", "--tokenizer", "none"])
        # flip one byte in one shard file
        man = _json.load(open(f"{rel}/data/MANIFEST.json"))
        fp = os.path.join(rel, "data", "data", man["shards"][0]["file"])
        raw = bytearray(open(fp, "rb").read())
        raw[len(raw) // 2] ^= 0xFF
        open(fp, "wb").write(bytes(raw))
        rc = main(["release-verify", "--in", rel])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        s = _json.loads(out)
        assert rc == 1 and s["ok"] is False
        assert any("sha256" in p for p in s["problems"])


class TestPackNoSplit:
    def test_pack_no_split_journey(self, spark, tmp_path, jsonl_corpus,
                                   capsys):
        clean = str(tmp_path / "clean_ns")
        _run(capsys, ["scrub", "--in", jsonl_corpus, "--format", "jsonl",
                      "--out", clean])
        out = str(tmp_path / "packed_ns")
        s = _run(capsys, ["pack", "--in", clean, "--out", out,
                          "--budget", "12", "--shards", "2", "--no-split"])
        assert s["docs"] == 4
        rows = spark.read.parquet(out).collect()
        by_bin = {}
        for r in rows:
            by_bin.setdefault((r.shard, r.seq_idx), 0)
            by_bin[(r.shard, r.seq_idx)] += r.n_tokens
        for (_, _), tot in by_bin.items():
            oversize = [r for r in rows if r.oversize]
            assert tot <= 12 or any(
                r.n_tokens == tot for r in oversize
            )

    def test_no_split_excludes_curriculum(self, tmp_path, jsonl_corpus,
                                          capsys):
        import pytest as _pytest

        with _pytest.raises(SystemExit):
            main(["pack", "--in", jsonl_corpus, "--format", "jsonl",
                  "--out", str(tmp_path / "x"), "--no-split",
                  "--curriculum"])


class TestEpochPack:
    def test_pack_epoch_journey(self, spark, tmp_path, jsonl_corpus,
                                capsys):
        clean = str(tmp_path / "clean_ep")
        _run(capsys, ["scrub", "--in", jsonl_corpus, "--format", "jsonl",
                      "--out", clean])
        out0 = str(tmp_path / "packed_e0")
        out1 = str(tmp_path / "packed_e1")
        s0 = _run(capsys, ["pack", "--in", clean, "--out", out0,
                           "--budget", "12", "--shards", "2",
                           "--epoch", "0", "--buckets", "8"])
        s1 = _run(capsys, ["pack", "--in", clean, "--out", out1,
                           "--budget", "12", "--shards", "2",
                           "--epoch", "1", "--buckets", "8"])
        assert s0["docs"] == 4 and s0["epoch"] == 0 and s1["epoch"] == 1
        r0 = {r.doc_id: r for r in spark.read.parquet(out0).collect()}
        r1 = {r.doc_id: r for r in spark.read.parquet(out1).collect()}
        # shard assignment is epoch-independent; the within-shard
        # stream order (pos) re-mixes between epochs
        assert {d: r.shard for d, r in r0.items()} == {
            d: r.shard for d, r in r1.items()
        }
        assert [r0[d].pos for d in sorted(r0)] != [
            r1[d].pos for d in sorted(r1)
        ]
        # determinism: re-running epoch 0 reproduces it bit-identically
        out0b = str(tmp_path / "packed_e0b")
        _run(capsys, ["pack", "--in", clean, "--out", out0b,
                      "--budget", "12", "--shards", "2",
                      "--epoch", "0", "--buckets", "8"])
        r0b = {r.doc_id: tuple(r) for r in
               spark.read.parquet(out0b).collect()}
        assert {d: tuple(r) for d, r in r0.items()} == r0b

    def test_epoch_excludes_other_orders(self, tmp_path, jsonl_corpus):
        import pytest as _pytest

        for extra in (["--no-split"], ["--curriculum"]):
            with _pytest.raises(SystemExit):
                main(["pack", "--in", jsonl_corpus, "--format", "jsonl",
                      "--out", str(tmp_path / "x"), "--epoch", "1"]
                     + extra)


class TestPackEmit:
    def test_pack_emit_journey(self, spark, tmp_path, jsonl_corpus,
                               capsys):
        clean = str(tmp_path / "clean_em")
        _run(capsys, ["scrub", "--in", jsonl_corpus, "--format", "jsonl",
                      "--out", clean])
        out = str(tmp_path / "emitted")
        s = _run(capsys, ["pack", "--in", clean, "--out", out,
                          "--budget", "12", "--shards", "2", "--emit"])
        assert s["emitted"] is True and s["tokens"] > 0
        rows = spark.read.parquet(out).collect()
        assert s["seqs"] == len(rows)
        for r in rows:
            assert r.n_tokens == len(r.tokens) <= 12
        # conservation against the assignment relation on the same
        # input
        assign_out = str(tmp_path / "assigned")
        a = _run(capsys, ["pack", "--in", clean, "--out", assign_out,
                          "--budget", "12", "--shards", "2"])
        assert a["tokens"] == s["tokens"]

    def test_emit_exclusions(self, tmp_path, jsonl_corpus):
        import pytest as _pytest

        for extra in (["--curriculum"], ["--no-split", "--epoch", "1"]):
            with _pytest.raises(SystemExit):
                main(["pack", "--in", jsonl_corpus, "--format", "jsonl",
                      "--out", str(tmp_path / "x"), "--emit"] + extra)

    def test_emit_composes_with_no_split(self, spark, tmp_path,
                                         jsonl_corpus, capsys):
        clean = str(tmp_path / "clean_ens")
        _run(capsys, ["scrub", "--in", jsonl_corpus, "--format", "jsonl",
                      "--out", clean])
        out = str(tmp_path / "emitted_ns")
        s = _run(capsys, ["pack", "--in", clean, "--out", out,
                          "--budget", "12", "--shards", "2",
                          "--emit", "--no-split"])
        assert s["emitted"] is True and s["no_split"] is True
        rows = spark.read.parquet(out).collect()
        # every non-oversize bin respects the budget; every doc's
        # tokens are contiguous (whole docs end with the EOS marker)
        for r in rows:
            assert r.n_tokens == len(r.tokens)
            assert r.oversize or r.n_tokens <= 12
            assert r.tokens[-1] == "</s>"

    def test_emit_composes_with_epoch(self, spark, tmp_path,
                                      jsonl_corpus, capsys):
        clean = str(tmp_path / "clean_ee")
        _run(capsys, ["scrub", "--in", jsonl_corpus, "--format", "jsonl",
                      "--out", clean])
        outs = {}
        for e in (0, 1):
            out = str(tmp_path / f"emitted_e{e}")
            s = _run(capsys, ["pack", "--in", clean, "--out", out,
                              "--budget", "12", "--shards", "2",
                              "--emit", "--epoch", str(e)])
            assert s["emitted"] is True and s["epoch"] == e
            outs[e] = sorted(
                (r.shard, r.seq_idx, tuple(r.tokens))
                for r in spark.read.parquet(out).collect()
            )
        # same total token mass, different epoch stream order
        tok0 = sorted(t for _, _, toks in outs[0] for t in toks)
        tok1 = sorted(t for _, _, toks in outs[1] for t in toks)
        assert tok0 == tok1
        assert outs[0] != outs[1]


class TestMixShuffle:
    def test_weighted_shuffle_journey(self, spark, tmp_path, capsys):
        inp = str(tmp_path / "mix_in")
        spark.createDataFrame(
            [(i, f"doc number {i} words", "webA" if i % 2 else "books")
             for i in range(12)],
            "doc_id long, text string, source string",
        ).write.parquet(inp)
        out = str(tmp_path / "mixed")
        s = _run(capsys, ["shuffle", "--in", inp, "--out", out,
                          "--epochs", "2", "--buckets", "8",
                          "--weights", "webA=2.0", "--default-weight",
                          "1.0"])
        assert s["weights"] == {"webA": 2.0} and s["epochs"] == 2
        rows = spark.read.parquet(out).collect()
        for e in (0, 1):
            ep = [r for r in rows if r.epoch == e]
            # integer weights: every webA doc exactly twice, others once
            per_doc = {}
            for r in ep:
                per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
            for d, n in per_doc.items():
                assert n == (2 if d % 2 else 1), (d, n)
            assert sorted(r.pos for r in ep) == list(range(1, len(ep) + 1))

    def test_bad_weights_spec_is_loud(self, tmp_path, jsonl_corpus):
        import pytest as _pytest

        with _pytest.raises(SystemExit, match="--weights"):
            main(["shuffle", "--in", jsonl_corpus, "--format", "jsonl",
                  "--out", str(tmp_path / "x"), "--weights", "nonsense"])


class TestPackEmitWeights:
    def test_pack_emit_weights_journey(self, spark, tmp_path, capsys):
        inp = str(tmp_path / "mix_emit_in")
        spark.createDataFrame(
            [(i, f"doc number {i} words", "webA" if i % 2 else "books")
             for i in range(12)],
            "doc_id long, text string, source string",
        ).write.parquet(inp)
        out = str(tmp_path / "mix_emitted")
        s = _run(capsys, ["pack", "--in", inp, "--out", out,
                          "--budget", "12", "--shards", "2",
                          "--emit", "--weights", "webA=2.0",
                          "--epoch", "1"])
        assert s["emitted"] is True
        assert s["weights"] == {"webA": 2.0} and s["epoch"] == 1
        rows = spark.read.parquet(out).collect()
        # integer weights: every webA doc's tokens appear twice,
        # books once (5 tokens per doc incl. EOS)
        got = {}
        for r in rows:
            assert r.n_tokens == len(r.tokens)
            for t in r.tokens:
                got[t] = got.get(t, 0) + 1
        for i in range(12):
            assert got[str(i)] == (2 if i % 2 else 1), (i, got.get(str(i)))

    def test_weights_require_emit_and_exclude_no_split(
        self, tmp_path, jsonl_corpus
    ):
        import pytest as _pytest

        with _pytest.raises(SystemExit, match="requires --emit"):
            main(["pack", "--in", jsonl_corpus, "--format", "jsonl",
                  "--out", str(tmp_path / "x"), "--weights", "a=1"])
        with _pytest.raises(SystemExit, match="no-split"):
            main(["pack", "--in", jsonl_corpus, "--format", "jsonl",
                  "--out", str(tmp_path / "x"), "--emit", "--no-split",
                  "--weights", "a=1"])

    def test_nonfinite_weights_are_loud(self, tmp_path, jsonl_corpus):
        import pytest as _pytest

        for spec in ("src=nan", "src=inf", "src=-1"):
            with _pytest.raises(SystemExit, match="finite"):
                main(["shuffle", "--in", jsonl_corpus, "--format",
                      "jsonl", "--out", str(tmp_path / "x"),
                      "--weights", spec])
        with _pytest.raises(SystemExit, match="default-weight"):
            main(["shuffle", "--in", jsonl_corpus, "--format", "jsonl",
                  "--out", str(tmp_path / "x"), "--weights", "src=1",
                  "--default-weight", "inf"])


class TestPackSpansCli:
    def test_pack_spans_journey(self, spark, tmp_path, jsonl_corpus, capsys):
        out = str(tmp_path / "spans")
        s = _run(capsys, ["pack", "--in", jsonl_corpus, "--format", "jsonl",
                          "--out", out, "--budget", "8", "--shards", "2",
                          "--spans"])
        assert s["spans"] >= 4 and s["budget"] == 8
        rows = spark.read.parquet(out).collect()
        # spans tile each sequence: disjoint, start-contiguous
        per_seq = {}
        for r in rows:
            per_seq.setdefault((r.shard, r.seq_idx), []).append(
                (r.start_in_seq, r.len_in_seq))
        for sl in per_seq.values():
            sl.sort()
            pos = 0
            for st, ln in sl:
                assert st == pos and ln > 0
                pos += ln
            assert pos <= 8

    def test_pack_segments_journey(self, spark, tmp_path, jsonl_corpus,
                                   capsys):
        out = str(tmp_path / "segs")
        s = _run(capsys, ["pack", "--in", jsonl_corpus, "--format", "jsonl",
                          "--out", out, "--budget", "8", "--shards", "2",
                          "--segments"])
        assert s["segments"] is True
        for r in spark.read.parquet(out).collect():
            ids = [int(x) for x in r.segment_ids.split(" ")]
            assert len(ids) == r.n_tokens and ids == sorted(ids)
            assert len(set(ids)) == r.n_docs

    def test_spans_exclusive_flags(self, tmp_path, jsonl_corpus):
        import pytest as _pytest

        with _pytest.raises(SystemExit, match="exclusive"):
            main(["pack", "--in", jsonl_corpus, "--format", "jsonl",
                  "--out", str(tmp_path / "x"), "--spans", "--segments"])
        with _pytest.raises(SystemExit, match="exclusive"):
            main(["pack", "--in", jsonl_corpus, "--format", "jsonl",
                  "--out", str(tmp_path / "x"), "--spans", "--emit"])
        with _pytest.raises(SystemExit, match="split packing"):
            main(["pack", "--in", jsonl_corpus, "--format", "jsonl",
                  "--out", str(tmp_path / "x"), "--spans", "--no-split"])


class TestTemperatureShuffleCli:
    def test_temperature_shuffle_journey(self, spark, tmp_path, capsys):
        inp = str(tmp_path / "temp_in")
        # big source 8 docs, small source 2 docs, same doc length
        spark.createDataFrame(
            [(i, "five words in this doc", "big" if i < 8 else "small")
             for i in range(10)],
            "doc_id long, text string, source string",
        ).write.parquet(inp)
        out = str(tmp_path / "tshuf")
        s = _run(capsys, ["shuffle", "--in", inp, "--out", out,
                          "--epochs", "1", "--buckets", "8",
                          "--temperature", "0.0"])
        assert s["temperature"] == 0.0
        # alpha=0: small upsamples by exactly n_big/n_small = 4
        assert s["weights"]["big"] == 1.0 and s["weights"]["small"] == 4.0
        rows = spark.read.parquet(out).collect()
        per_src = {}
        for r in rows:
            per_src[r.source] = per_src.get(r.source, 0) + 1
        assert per_src == {"big": 8, "small": 8}

    def test_temperature_exclusive_with_weights(self, tmp_path, jsonl_corpus):
        import pytest as _pytest

        with _pytest.raises(SystemExit, match="exclusive"):
            main(["shuffle", "--in", jsonl_corpus, "--format", "jsonl",
                  "--out", str(tmp_path / "x"), "--temperature", "0.5",
                  "--weights", "s=2.0"])

    def test_temperature_out_of_range_is_loud(self, spark, tmp_path, capsys):
        import pytest as _pytest

        inp = str(tmp_path / "temp_in2")
        spark.createDataFrame(
            [(1, "w", "s")], "doc_id long, text string, source string"
        ).write.parquet(inp)
        with _pytest.raises(SystemExit, match="alpha"):
            main(["shuffle", "--in", inp,
                  "--out", str(tmp_path / "x"), "--temperature", "2.0"])


class TestLoaderManifestCli:
    def test_manifest_and_resume_journey(self, spark, tmp_path,
                                         jsonl_corpus, capsys):
        out = str(tmp_path / "manifest")
        s = _run(capsys, ["pack", "--in", jsonl_corpus, "--format", "jsonl",
                          "--out", out, "--budget", "8", "--shards", "2",
                          "--manifest"])
        assert s["manifest"] is True and s["first_step"] == 0
        total = s["steps"]
        rows = spark.read.parquet(out).collect()
        assert sorted(r.step for r in rows) == list(range(total))
        # round-robin order: step order == (seq_idx, shard) lexicographic
        by_step = sorted(rows, key=lambda r: r.step)
        assert [(r.seq_idx, r.shard) for r in by_step] == sorted(
            (r.seq_idx, r.shard) for r in rows
        )

        out2 = str(tmp_path / "resume")
        s2 = _run(capsys, ["pack", "--in", jsonl_corpus, "--format",
                           "jsonl", "--out", out2, "--budget", "8",
                           "--shards", "2", "--manifest",
                           "--resume-step", str(total // 2)])
        assert s2["steps"] == total - total // 2
        assert s2["first_step"] == total // 2

    def test_manifest_exclusive_flags(self, tmp_path, jsonl_corpus):
        import pytest as _pytest

        with _pytest.raises(SystemExit, match="exclusive"):
            main(["pack", "--in", jsonl_corpus, "--format", "jsonl",
                  "--out", str(tmp_path / "x"), "--manifest", "--emit"])
        with _pytest.raises(SystemExit, match="requires --manifest"):
            main(["pack", "--in", jsonl_corpus, "--format", "jsonl",
                  "--out", str(tmp_path / "x"), "--resume-step", "5"])
