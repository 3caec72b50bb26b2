"""ANN index persistence tests: trained-index save/load round-trip
serves bit-identical results, and corruption/geometry drift is caught
at load time instead of silently serving wrong neighbors."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from huckli_spark.operators import simsearch
from huckli_spark.operators.ann_index import (
    IndexIntegrityError,
    load_ann_index,
    save_ann_index,
)
from huckli_spark.operators.clustering import kmeans_fit


def _emb(spark, n=40, dim=16):
    # deterministic synthetic corpus, clustered-ish by construction
    return spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 3) % 13) / 13.0 + (i % 4) for j in range(dim)])
            for i in range(n)
        ],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def saved_index(spark, tmp_path_factory):
    emb = _emb(spark)
    cents_micro = kmeans_fit(emb, k=4, iterations=2)
    centroids = [
        (cid, [v / 1e6 for v in c]) for cid, c in enumerate(cents_micro)
    ]
    codebooks = simsearch.pq_codebooks(emb, m=4, n_codes=8)
    codes = simsearch.pq_encode(emb, codebooks)
    posting = simsearch.ivf_assign(emb, centroids).select("vec_id", "cid")
    path = str(tmp_path_factory.mktemp("idx") / "ann_index")
    man = save_ann_index(path, centroids, codebooks, codes, posting)
    return emb, centroids, codebooks, path, man


class TestRoundTrip:
    def test_manifest_geometry(self, saved_index):
        _, centroids, codebooks, _, man = saved_index
        assert man["k"] == 4 and man["dim"] == 16
        assert man["m"] == 4 and man["n_codes"] == 8 and man["sub"] == 4
        assert man["has_codes"] and man["has_posting"]

    def test_quantizers_bit_equal_after_reload(self, spark, saved_index):
        _, centroids, codebooks, path, _ = saved_index
        lc, lcb, codes, posting = load_ann_index(path, spark)
        assert lc == centroids
        assert lcb == codebooks
        assert codes is not None and posting is not None

    def test_served_results_identical(self, spark, saved_index):
        emb, centroids, codebooks, path, _ = saved_index
        lc, lcb, lcodes, _ = load_ann_index(path, spark)
        queries = emb.where(F.col("vec_id") < 3)
        fresh = simsearch.pq_adc_topk(
            simsearch.pq_encode(emb, codebooks), queries, codebooks, k=3
        )
        served = simsearch.pq_adc_topk(lcodes, queries, lcb, k=3)
        assert sorted(map(tuple, fresh.collect())) == sorted(
            map(tuple, served.collect())
        )
        ivf_fresh = simsearch.ivf_topk(
            emb, queries, nprobe=2, k=3, centroids=centroids
        )
        ivf_served = simsearch.ivf_topk(
            emb, queries, nprobe=2, k=3, centroids=lc
        )
        assert sorted(map(tuple, ivf_fresh.collect())) == sorted(
            map(tuple, ivf_served.collect())
        )


class TestIntegrity:
    def _copy(self, path, tmp_path):
        import shutil

        dst = str(tmp_path / "tampered")
        shutil.copytree(path, dst)
        return dst

    def test_tampered_codebook_rejected(self, spark, saved_index, tmp_path):
        import pandas as pd

        _, _, _, path, _ = saved_index
        dst = self._copy(path, tmp_path)
        p = os.path.join(dst, "codebooks.parquet")
        pdf = pd.read_parquet(p)
        pdf.loc[0, "val"] = pdf.loc[0, "val"] + 0.25
        pdf.to_parquet(p, index=False)
        with pytest.raises(IndexIntegrityError, match="codebook checksum"):
            load_ann_index(dst, spark)

    def test_manifest_geometry_drift_rejected(
        self, spark, saved_index, tmp_path
    ):
        _, _, _, path, _ = saved_index
        dst = self._copy(path, tmp_path)
        mp = os.path.join(dst, "manifest.json")
        man = json.load(open(mp))
        man["dim"] = 99
        json.dump(man, open(mp, "w"))
        with pytest.raises(IndexIntegrityError, match="geometry"):
            load_ann_index(dst, spark)

    def test_future_format_version_rejected(
        self, spark, saved_index, tmp_path
    ):
        _, _, _, path, _ = saved_index
        dst = self._copy(path, tmp_path)
        mp = os.path.join(dst, "manifest.json")
        man = json.load(open(mp))
        man["format_version"] = 999
        json.dump(man, open(mp, "w"))
        with pytest.raises(IndexIntegrityError, match="format"):
            load_ann_index(dst, spark)


class TestHybridServeFromIndex:
    """VERDICT r07 #4 pin: the full hybrid pipeline served from a
    PERSISTED index must be bit-identical to the retrain-in-session
    pipeline (q_hybrid_retrieval). The gate enforces this via the
    shared oracle; this test pins it Spark-vs-Spark at fixture scale
    so a divergence is caught without DuckDB in the loop."""

    def test_serve_equals_retrain(self, spark, tmp_path):
        from huckli_spark.queries.retrieval import (
            _docs,
            _emb,
            build_hybrid_index,
            hybrid_downstream,
            hybrid_lex_arm,
            hybrid_vec_arm,
            hybrid_vec_arm_from_index,
        )

        sf = "/root/testdata/sf0.001"
        docs, em = _docs(spark, sf), _emb(spark, sf)
        path = str(tmp_path / "index")
        man = build_hybrid_index(em, path)
        assert man["has_codes"] and man["has_posting"]

        lex = hybrid_lex_arm(docs, em).localCheckpoint()
        served = hybrid_downstream(
            em, lex, hybrid_vec_arm_from_index(spark, em, path)
        ).collect()
        retrained = hybrid_downstream(
            em, lex, hybrid_vec_arm(em)
        ).collect()
        assert sorted(map(tuple, served)) == sorted(map(tuple, retrained))


class TestIvfAppend:
    """Incremental maintenance (round 10): append under the frozen
    quantizer must equal a rebuild over the union corpus with the
    same centroids — and the coarse-only (codebooks=None) store
    round-trips."""

    def _cents(self, spark, emb):
        cm = kmeans_fit(emb, k=4, iterations=2)
        return [(cid, [v / 1e6 for v in c]) for cid, c in enumerate(cm)]

    def test_append_equals_union_rebuild(self, spark, tmp_path):
        from huckli_spark.operators.ann_index import ivf_append

        emb = _emb(spark, n=40)
        corpus = emb.where(F.col("vec_id") >= 10)
        late = emb.where(F.col("vec_id") < 10)
        cents = self._cents(spark, corpus)
        path = str(tmp_path / "idx")
        save_ann_index(
            path, cents, codebooks=None,
            posting=simsearch.ivf_assign(corpus, cents, nprobe=1)
            .select("vec_id", "cid"),
        )
        out = ivf_append(spark, path, late)
        assert out == {"appended_posting": 10, "appended_codes": 0}
        _, cbs, codes, posting = load_ann_index(path, spark)
        assert cbs == [] and codes is None
        got = {(r.vec_id, r.cid) for r in posting.collect()}
        want = {
            (r.vec_id, r.cid)
            for r in simsearch.ivf_assign(emb, cents, nprobe=1)
            .select("vec_id", "cid")
            .collect()
        }
        assert got == want and len(got) == 40

    def test_append_with_pq_arm_appends_codes(self, spark, tmp_path):
        from huckli_spark.operators.ann_index import ivf_append

        emb = _emb(spark, n=40)
        corpus = emb.where(F.col("vec_id") >= 10)
        late = emb.where(F.col("vec_id") < 10)
        cents = self._cents(spark, corpus)
        # sampled codebooks draw from the lowest ids; any frozen
        # deterministic codebook works for the append contract
        cbs = simsearch.pq_codebooks(emb, m=4, n_codes=8)
        path = str(tmp_path / "idx_pq")
        save_ann_index(
            path, cents, cbs,
            codes=simsearch.pq_encode(corpus, cbs).select(
                "vec_id", "code_word"
            ),
            posting=simsearch.ivf_assign(corpus, cents, nprobe=1)
            .select("vec_id", "cid"),
        )
        out = ivf_append(spark, path, late)
        assert out == {"appended_posting": 10, "appended_codes": 10}
        _, _, codes, posting = load_ann_index(path, spark)
        assert codes.count() == 40 and posting.count() == 40
        # appended codes match encoding the late batch directly
        direct = {
            (r.vec_id, r.code_word)
            for r in simsearch.pq_encode(late, cbs)
            .select("vec_id", "code_word").collect()
        }
        stored = {
            (r.vec_id, r.code_word)
            for r in codes.where(F.col("vec_id") < 10).collect()
        }
        assert stored == direct

    def test_append_requires_posting(self, spark, tmp_path):
        from huckli_spark.operators.ann_index import ivf_append

        emb = _emb(spark, n=20)
        cents = self._cents(spark, emb)
        path = str(tmp_path / "idx_np")
        save_ann_index(path, cents, codebooks=None)
        with pytest.raises(IndexIntegrityError, match="no posting"):
            ivf_append(spark, path, emb)

    def test_coarse_only_store_roundtrip(self, spark, tmp_path):
        emb = _emb(spark, n=20)
        cents = self._cents(spark, emb)
        path = str(tmp_path / "idx_coarse")
        man = save_ann_index(path, cents, codebooks=None)
        assert man["m"] == 0 and man["codebooks_md5"] is None
        cents2, cbs, codes, posting = load_ann_index(path, spark)
        assert cents2 == cents and cbs == [] and codes is None

    def test_double_append_repaired_by_compact(self, spark, tmp_path):
        # the documented at-least-once gap: re-running an append
        # duplicates rows; compaction restores exactly-once state
        from huckli_spark.operators.ann_index import ivf_append, ivf_compact

        emb = _emb(spark, n=30)
        corpus = emb.where(F.col("vec_id") >= 10)
        late = emb.where(F.col("vec_id") < 10)
        cents = self._cents(spark, corpus)
        path = str(tmp_path / "idx_crash")
        save_ann_index(
            path, cents, codebooks=None,
            posting=simsearch.ivf_assign(corpus, cents, nprobe=1)
            .select("vec_id", "cid"),
        )
        ivf_append(spark, path, late)
        ivf_append(spark, path, late)  # the crash-retry double delivery
        _, _, _, posting = load_ann_index(path, spark)
        assert posting.count() == 40  # 20 + 10 + 10 duplicated
        out = ivf_compact(spark, path)
        assert out == {"posting_rows": 30, "posting_dropped": 10,
                       "codes_rows": 0, "codes_dropped": 0}
        _, _, _, posting = load_ann_index(path, spark)
        got = {(r.vec_id, r.cid) for r in posting.collect()}
        want = {
            (r.vec_id, r.cid)
            for r in simsearch.ivf_assign(emb, cents, nprobe=1)
            .select("vec_id", "cid").collect()
        }
        assert got == want


class TestPublishCrashMatrix:
    """The publish swap must never leave a reader without a complete
    index (VERDICT r10 "What's wrong #2"): simulate a kill at each
    step of ``_publish_swap`` and assert ``load_ann_index`` always
    finds EITHER the old or the new artifact, bit-complete."""

    def _save(self, path, seed):
        # two distinguishable single-centroid coarse indexes
        cents = [(0, [float(seed)] * 4)]
        save_ann_index(path, cents, codebooks=None)
        return cents

    def _crash_states(self, tmp_path):
        """Build OLD live at ``dst`` and NEW fully-written at the
        ``._tmp`` sibling, then enact each crash point by replaying
        ``_publish_swap``'s steps by hand."""
        import shutil

        dst = str(tmp_path / "idx")
        old = self._save(dst, seed=1)
        new_src = str(tmp_path / "new_built")
        new = self._save(new_src, seed=2)
        tmp = dst + "._tmp"
        shutil.copytree(new_src, tmp)
        return dst, tmp, old, new

    def test_crash_before_any_rename(self, spark, tmp_path):
        dst, tmp, old, _ = self._crash_states(tmp_path)
        # killed after tmp fully built, before step 1: old is live
        cents, _, _, _ = load_ann_index(dst, spark)
        assert cents == old

    def test_crash_between_the_two_renames(self, spark, tmp_path):
        import os

        dst, tmp, old, _ = self._crash_states(tmp_path)
        os.replace(dst, dst + ".__old")  # step 1 ran, then kill
        assert not os.path.exists(dst)
        cents, _, _, _ = load_ann_index(dst, spark)  # heals from aside
        assert cents == old
        assert os.path.exists(dst)  # restored, durable for next reader

    def test_crash_after_publish_before_aside_cleanup(self, spark, tmp_path):
        import os

        dst, tmp, old, new = self._crash_states(tmp_path)
        os.replace(dst, dst + ".__old")
        os.replace(tmp, dst)  # steps 1+2 ran, kill before cleanup
        cents, _, _, _ = load_ann_index(dst, spark)
        assert cents == new  # published new wins; aside is stale
        assert not os.path.exists(dst + ".__old")  # loader cleaned it

    def test_compact_crash_between_renames_heals(self, spark, tmp_path):
        # same matrix for the per-artifact swap inside ivf_compact
        import os

        emb = _emb(spark, n=20)
        cents = [(0, [1.0] * 16), (1, [-1.0] * 16)]
        path = str(tmp_path / "idx_c")
        posting = simsearch.ivf_assign(emb, cents, nprobe=1).select(
            "vec_id", "cid"
        )
        save_ann_index(path, cents, codebooks=None, posting=posting)
        want = {(r.vec_id, r.cid) for r in posting.collect()}
        src = os.path.join(path, "posting.parquet")
        os.replace(src, src + ".__old")  # compact killed mid-swap
        _, _, _, healed = load_ann_index(path, spark)
        assert {(r.vec_id, r.cid) for r in healed.collect()} == want
