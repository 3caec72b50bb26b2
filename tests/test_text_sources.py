"""JSONL/CSV corpus source tests: canonical schema landing, corrupt-
record quarantine (counted, never silent, never fatal), provenance,
and n_chars normalization."""

from __future__ import annotations

import json
import os

from huckli_spark.sources.text import (
    DOCUMENTS_SCHEMA,
    read_csv_documents,
    read_jsonl_documents,
)


def _write(tmpdir, name, lines):
    p = os.path.join(tmpdir, name)
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


class TestJsonlSource:
    def test_clean_corpus(self, spark, tmp_path):
        lines = [
            json.dumps(
                {"doc_id": i, "text": f"doc {i} body", "lang": "en",
                 "source": "web", "n_chars": 10}
            )
            for i in range(5)
        ]
        _write(str(tmp_path), "part0.jsonl", lines)
        r = read_jsonl_documents(spark, str(tmp_path))
        assert r.docs.count() == 5
        assert r.quarantine.count() == 0
        assert [f.name for f in DOCUMENTS_SCHEMA.fields] + ["file_source"] == (
            r.docs.columns
        )

    def test_malformed_lines_quarantined_not_dropped(self, spark, tmp_path):
        good = json.dumps({"doc_id": 1, "text": "ok", "lang": "en",
                           "source": "web", "n_chars": 2})
        _write(
            str(tmp_path),
            "mixed.jsonl",
            [good, "{not json at all", '{"doc_id": "NaNaNa", "text": 3}'],
        )
        r = read_jsonl_documents(spark, str(tmp_path))
        assert r.docs.count() == 1
        q = r.quarantine.collect()
        assert len(q) == 2
        assert all(row["file_source"].endswith("/mixed.jsonl") for row in q)
        assert any("not json" in row["raw"] for row in q)

    def test_n_chars_backfilled(self, spark, tmp_path):
        line = json.dumps(
            {"doc_id": 7, "text": "hello world", "lang": "en", "source": "s"}
        )
        _write(str(tmp_path), "nochars.jsonl", [line])
        row = read_jsonl_documents(spark, str(tmp_path)).docs.collect()[0]
        assert row["n_chars"] == len("hello world")

    def test_provenance_per_file(self, spark, tmp_path):
        for fn in ("a.jsonl", "b.jsonl"):
            _write(
                str(tmp_path), fn,
                [json.dumps({"doc_id": 1, "text": "x", "lang": "en",
                             "source": "s", "n_chars": 1})],
            )
        srcs = {
            r["file_source"]
            for r in read_jsonl_documents(spark, str(tmp_path)).docs.collect()
        }
        base = tmp_path.name
        assert srcs == {f"{base}/a.jsonl", f"{base}/b.jsonl"}

    def test_same_basename_across_dirs_stays_distinct(self, spark, tmp_path):
        # Regression (ADVICE r5): basename-only provenance collapsed
        # date=A/part0.jsonl and date=B/part0.jsonl into one value.
        for d in ("date=2026-01-01", "date=2026-01-02"):
            (tmp_path / d).mkdir()
            _write(
                str(tmp_path / d), "part0.jsonl",
                [json.dumps({"doc_id": 1, "text": "x", "lang": "en",
                             "source": "s", "n_chars": 1})],
            )
        srcs = {
            r["file_source"]
            for r in read_jsonl_documents(spark, str(tmp_path)).docs.collect()
        }
        assert srcs == {
            "date=2026-01-01/part0.jsonl",
            "date=2026-01-02/part0.jsonl",
        }


class TestCsvSource:
    def test_clean_and_quoted_multiline(self, spark, tmp_path):
        _write(
            str(tmp_path),
            "docs.csv",
            [
                "doc_id,text,lang,source,n_chars",
                '1,"line one',
                'still doc one",en,web,20',
                "2,plain,en,web,5",
            ],
        )
        r = read_csv_documents(spark, str(tmp_path))
        rows = {x["doc_id"]: x for x in r.docs.collect()}
        assert set(rows) == {1, 2}
        assert "still doc one" in rows[1]["text"]
        assert r.quarantine.count() == 0

    def test_type_garbage_quarantined(self, spark, tmp_path):
        _write(
            str(tmp_path),
            "bad.csv",
            [
                "doc_id,text,lang,source,n_chars",
                "notanumber,oops,en,web,xyz",
                "3,fine,en,web,4",
            ],
        )
        r = read_csv_documents(spark, str(tmp_path))
        assert r.docs.count() == 1
        assert r.quarantine.count() == 1

    def test_dedup_pipeline_accepts_landed_docs(self, spark, tmp_path):
        # the landed relation feeds the corpus operators unchanged
        from huckli_spark.operators.dedup import exact_dup_stats

        _write(
            str(tmp_path),
            "d.csv",
            [
                "doc_id,text,lang,source,n_chars",
                "1,same text,en,a,9",
                "2,same text,en,b,9",
                "3,unique text,en,a,11",
            ],
        )
        docs = read_csv_documents(spark, str(tmp_path)).docs
        stats = exact_dup_stats(docs).collect()[0]
        assert stats["n_docs"] == 3 and stats["n_dup_rows"] == 1
