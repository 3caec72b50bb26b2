"""Property tests for the SimHash banding exactness contract.

The pigeonhole claim (4 chunks of 15 bits catch every pair at
Hamming <= 3) and the first-matching-chunk emission filter (each pair
exactly once, no distinct) are subtle enough to deserve adversarial
inputs: random signatures, near-collisions built by flipping exactly
k bits, and duplicate signatures.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from huckli_spark.operators.sketch import (
    SIMHASH_BITS,
    simhash_pairs_from_signatures,
)


def _brute_force(sigs: list[int], max_hamming: int) -> set[tuple[int, int, int]]:
    out = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            h = bin(sigs[i] ^ sigs[j]).count("1")
            if h <= max_hamming:
                out.add((i, j, h))
    return out


def _check(spark, sigs: list[int], max_hamming: int = 3) -> None:
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc_id long, simhash long"
    )
    got = [
        (r.d1, r.d2, r.hamming)
        for r in simhash_pairs_from_signatures(df, max_hamming=max_hamming).collect()
    ]
    # exactly once each: no duplicates even when a pair shares several chunks
    assert len(got) == len(set(got))
    assert set(got) == _brute_force(sigs, max_hamming)


def test_random_signatures(spark):
    rng = random.Random(42)
    sigs = [rng.getrandbits(SIMHASH_BITS) for _ in range(80)]
    _check(spark, sigs)


def test_engineered_near_collisions(spark):
    # base signatures plus variants at Hamming 1..4 (4 must be excluded),
    # including flips concentrated inside a single chunk and spread
    # across chunks (exercises every first-match branch)
    rng = random.Random(7)
    sigs: list[int] = []
    for _ in range(12):
        base = rng.getrandbits(SIMHASH_BITS)
        sigs.append(base)
        for k in (1, 2, 3, 4):
            flipped = base
            for bit in rng.sample(range(SIMHASH_BITS), k):
                flipped ^= 1 << bit
            sigs.append(flipped)
    _check(spark, sigs)


def test_exact_duplicates(spark):
    # identical signatures match in ALL four chunks — the strongest
    # test of single-emission (hamming 0, first chunk must win)
    rng = random.Random(3)
    base = [rng.getrandbits(SIMHASH_BITS) for _ in range(5)]
    sigs = base * 4  # every signature appears 4 times
    _check(spark, sigs)


def test_zero_and_boundary_signatures(spark):
    # all-zeros, all-ones, single-chunk-only values: masks/shifts at
    # the 15-bit boundaries
    full = (1 << SIMHASH_BITS) - 1
    sigs = [0, 1, full, full ^ 1, 0x7FFF, 0x7FFF << 15, 0x7FFF << 30, 0x7FFF << 45]
    _check(spark, sigs)


def test_simhash_banding_rejects_beyond_pigeonhole_bound(spark):
    # 4 chunks guarantee completeness only to hamming 3; asking for
    # more must be a loud error, not silently incomplete output
    import pytest

    from huckli_spark.operators import sketch

    sig = spark.createDataFrame([(1, 7), (2, 0)], "doc_id long, simhash long")
    with pytest.raises(ValueError, match="exact only for max_hamming <= 3"):
        sketch.simhash_pairs_from_signatures(sig, max_hamming=4)
    # the boundary value itself still works
    assert (
        sketch.simhash_pairs_from_signatures(sig, max_hamming=3).count() >= 0
    )


def test_fast_hash_minhash_recall_vs_portable(spark):
    """The xxhash64 production path (fast_hash=True) must find nearly
    the same verified near-dup pairs as the md5 portable path — both
    candidate generators are statistical, the exact-Jaccard verify is
    identical, so only band-bucket recall can differ."""
    import os

    from huckli_spark.operators import sketch

    docs = spark.read.parquet(
        os.path.join("/root/testdata/sf0.01", "documents.parquet")
    )
    portable = {
        (r["d1"], r["d2"])
        for r in sketch.minhash_dedup_pairs(docs, threshold=0.9).collect()
    }
    fast = {
        (r["d1"], r["d2"])
        for r in sketch.minhash_dedup_pairs(
            docs, threshold=0.9, fast_hash=True
        ).collect()
    }
    assert portable, "fixture must produce near-dup pairs"
    recall = len(portable & fast) / len(portable)
    assert recall >= 0.9, f"fast-hash recall {recall} vs portable"
    # structural: every emitted pair passed the exact verify
    for r in sketch.minhash_dedup_pairs(
        docs, threshold=0.9, fast_hash=True
    ).collect():
        assert r["jaccard"] >= 0.9 - 1e-9


class TestContainmentBruteForce:
    """Differential: containment_pairs vs a pure-Python shingle-set
    computation on randomized corpora (seeded)."""

    def _shingles(self, text: str, n: int = 3) -> set:
        w = text.split(" ")
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    def _brute(self, docs: list[tuple[int, str]], threshold: float):
        out = {}
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                d1, t1 = docs[i]
                d2, t2 = docs[j]
                s1, s2 = self._shingles(t1), self._shingles(t2)
                if not s1 or not s2:
                    continue
                inter = len(s1 & s2)
                if inter == 0:
                    continue
                c12, c21 = inter / len(s1), inter / len(s2)
                if max(c12, c21) >= threshold:
                    import math

                    r = lambda x: math.floor(x * 1e4 + 0.5) / 1e4
                    out[(d1, d2)] = (r(c12), r(c21))
        return out

    def test_random_corpora_match_brute_force(self, spark):
        import random

        from huckli_spark.operators.dedup import containment_pairs

        rng = random.Random(20260814)
        vocab = [f"w{i}" for i in range(30)]
        for trial in range(3):
            docs = []
            for d in range(25):
                n = rng.randint(4, 18)
                words = [rng.choice(vocab) for _ in range(n)]
                docs.append((d, " ".join(words)))
            # inject a true superset pair
            base = docs[3][1]
            docs.append((100 + trial, base + " extra tokens here now"))
            df = spark.createDataFrame(docs, "doc_id long, text string")
            got = {
                (r["d1"], r["d2"]): (r["cont_1_in_2"], r["cont_2_in_1"])
                for r in containment_pairs(df, threshold=0.5).collect()
            }
            assert got == self._brute(docs, 0.5), trial


class TestKCoreBruteForce:
    """Differential: kcore vs a pure-Python peel on random graphs."""

    def _brute(self, edges: list[tuple[int, int]], k: int):
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for v in list(adj):
                if len(adj[v]) < k:
                    for u in adj[v]:
                        adj[u].discard(v)
                    del adj[v]
                    changed = True
        return {v: len(nb) for v, nb in adj.items() if nb}

    def test_random_graphs_match_brute_force(self, spark):
        import random

        from huckli_spark.operators.graph import kcore

        rng = random.Random(7)
        for trial in range(3):
            n = 30
            edges = set()
            for _ in range(rng.randint(40, 90)):
                a, b = rng.randrange(n), rng.randrange(n)
                if a != b:
                    edges.add((min(a, b), max(a, b)))
            edges = sorted(edges)
            df = spark.createDataFrame(edges, "s1 long, s2 long")
            # iterations: n rounds is always enough for full peel
            got = {
                r["v"]: r["core_deg"]
                for r in kcore(df, k=3, iterations=8).collect()
            }
            assert got == self._brute(edges, 3), trial


class TestSimhashPairsCross:
    def test_matches_bruteforce_cross(self, spark):
        # the cross screen must equal brute force over new x corpus,
        # each pair exactly once, on signatures crafted to collide in
        # multiple chunks (the first-match dedup's hard case)
        from huckli_spark.operators.sketch import simhash_pairs_cross

        base = 0b101101 << 30 | 0xABC
        new = [(0, base), (1, base ^ (1 << 5)), (2, (1 << 59) | 7)]
        corpus = [
            (100, base),                        # ham 0 vs new 0
            (101, base ^ (1 << 5) ^ (1 << 20)), # spread bits
            (102, base ^ 0b111),                # ham 3 vs new 0
            (103, (1 << 58) | 9),               # far from everything? check
        ]
        ns = spark.createDataFrame(new, "doc_id long, simhash long")
        cs = spark.createDataFrame(corpus, "doc_id long, simhash long")
        want = {}
        for nid, nh in new:
            for cid, ch in corpus:
                d = bin(nh ^ ch).count("1")
                if d <= 3:
                    want[(nid, cid)] = d
        rows = simhash_pairs_cross(ns, cs, max_hamming=3).collect()
        got = {(r.new_id, r.dup_of): r.hamming for r in rows}
        assert len(rows) == len(got)  # exactly-once emission
        assert got == want and want  # non-vacuous

    def test_rejects_loose_bound(self, spark):
        import pytest as _pytest

        from huckli_spark.operators.sketch import simhash_pairs_cross

        df = spark.createDataFrame([(0, 1)], "doc_id long, simhash long")
        with _pytest.raises(ValueError, match="exact only"):
            simhash_pairs_cross(df, df, max_hamming=4)


class TestCrossBandingProperty:
    def test_random_near_collisions_exact(self, spark):
        # adversarial: corpus signatures built by flipping exactly k
        # bits (k = 0..5) off random new-side signatures, so pairs
        # straddle the <=3 boundary and collide in multiple chunks
        from huckli_spark.operators.sketch import simhash_pairs_cross

        rng = random.Random(42)
        new = [rng.getrandbits(SIMHASH_BITS) for _ in range(12)]
        corpus = []
        for i, h in enumerate(new):
            for k in range(6):
                v = h
                for b in rng.sample(range(SIMHASH_BITS), k):
                    v ^= 1 << b
                corpus.append(v)
        corpus += [rng.getrandbits(SIMHASH_BITS) for _ in range(10)]
        ns = spark.createDataFrame(
            list(enumerate(new)), "doc_id long, simhash long"
        )
        cs = spark.createDataFrame(
            [(1000 + i, v) for i, v in enumerate(corpus)],
            "doc_id long, simhash long",
        )
        want = {}
        for i, nh in enumerate(new):
            for j, ch in enumerate(corpus):
                d = bin(nh ^ ch).count("1")
                if d <= 3:
                    want[(i, 1000 + j)] = d
        rows = simhash_pairs_cross(ns, cs, max_hamming=3).collect()
        got = {(r.new_id, r.dup_of): r.hamming for r in rows}
        assert len(rows) == len(got), "pair emitted more than once"
        assert got == want


class TestChunkCountConfigurability:
    """ADVICE r09 #3: the band/first-match builders are generated from
    SIMHASH_CHUNKS — raising the constant must widen the exactness
    bound in BOTH the self-join and cross variants, not silently
    mis-dedup."""

    def test_five_chunks_exact_at_hamming_4(self, spark, monkeypatch):
        from huckli_spark.operators import sketch

        monkeypatch.setattr(sketch, "SIMHASH_CHUNKS", 5)
        rng = random.Random(99)
        sigs: list[int] = []
        for _ in range(10):
            base = rng.getrandbits(SIMHASH_BITS)
            sigs.append(base)
            for k in (1, 3, 4, 5):  # 5 must be excluded at bound 4
                v = base
                for pos in rng.sample(range(SIMHASH_BITS), k):
                    v ^= 1 << pos
                sigs.append(v)
        _check(spark, sigs, max_hamming=4)

    def test_five_chunks_cross_matches_bruteforce(self, spark, monkeypatch):
        from huckli_spark.operators import sketch

        monkeypatch.setattr(sketch, "SIMHASH_CHUNKS", 5)
        rng = random.Random(123)
        corpus = [rng.getrandbits(SIMHASH_BITS) for _ in range(25)]
        new = []
        for s in corpus[:8]:
            v = s
            for pos in rng.sample(range(SIMHASH_BITS), rng.choice([0, 2, 4])):
                v ^= 1 << pos
            new.append(v)
        cdf = spark.createDataFrame(
            [(i, s) for i, s in enumerate(corpus)], "doc_id long, simhash long"
        )
        ndf = spark.createDataFrame(
            [(1000 + i, s) for i, s in enumerate(new)],
            "doc_id long, simhash long",
        )
        got = {
            (r.new_id, r.dup_of, r.hamming)
            for r in sketch.simhash_pairs_cross(
                ndf, cdf, max_hamming=4
            ).collect()
        }
        want = set()
        for i, nv in enumerate(new):
            for j, cv in enumerate(corpus):
                h = bin(nv ^ cv).count("1")
                if h <= 4:
                    want.add((1000 + i, j, h))
        assert got == want
