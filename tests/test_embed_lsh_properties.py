"""Property tests for the banded cosine-LSH composition.

cosine_pairs_lsh is approximate BY DESIGN (banding recall), but two
contracts are exact and deserve adversarial inputs:

1. soundness: every emitted pair really has cosine >= threshold AND
   shares at least one band signature (no pair is invented);
   emissions are exactly-once (the first-matching-band filter
   replaces distinct() correctly, same trick as simhash/minhash).
2. candidate completeness: a pair sharing >= 1 band signature is
   verified — so the output equals brute-force cosine filtering
   restricted to band-sharing pairs, computed independently in
   Python from the same deterministic planes.
"""

from __future__ import annotations

import math
import random

from huckli_spark.operators.simsearch import (
    LSH_PAIR_BANDS,
    LSH_PAIR_PLANES_PER_BAND,
    _md5_unit,
    cosine_pairs_lsh,
)

DIM = 16


def _planes() -> list[list[float]]:
    n = LSH_PAIR_BANDS * LSH_PAIR_PLANES_PER_BAND
    return [[_md5_unit("huckli", p, i) for i in range(DIM)] for p in range(n)]


def _band_sigs(v: list[float], planes: list[list[float]]) -> list[int]:
    ppb = LSH_PAIR_PLANES_PER_BAND
    sigs = []
    for band in range(LSH_PAIR_BANDS):
        s = 0
        for j in range(ppb):
            d = sum(x * y for x, y in zip(v, planes[band * ppb + j]))
            if d > 0:
                s |= 1 << j
        sigs.append(s)
    return sigs


def _cos(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def _expected(vecs: dict[int, list[float]], threshold: float) -> set[tuple[int, int]]:
    planes = _planes()
    sigs = {i: _band_sigs(v, planes) for i, v in vecs.items()}
    out = set()
    ids = sorted(vecs)
    for i_pos, i in enumerate(ids):
        for j in ids[i_pos + 1 :]:
            shares = any(a == b for a, b in zip(sigs[i], sigs[j]))
            if shares and _cos(vecs[i], vecs[j]) >= threshold - 1e-9:
                out.add((i, j))
    return out


def _run(spark, vecs: dict[int, list[float]], threshold: float):
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    rows = cosine_pairs_lsh(
        df, threshold=threshold, dim=DIM
    ).collect()
    got = [(r.d1, r.d2) for r in rows]
    assert len(got) == len(set(got)), "pair emitted more than once"
    assert set(got) == _expected(vecs, threshold)
    for r in rows:
        assert r.cos_sim >= threshold - 1e-9


def test_random_vectors(spark):
    rng = random.Random(7)
    vecs = {
        i: [rng.gauss(0, 1) for _ in range(DIM)] for i in range(60)
    }
    _run(spark, vecs, threshold=0.3)


def test_planted_near_duplicates(spark):
    # pairs built by small perturbation MUST appear when they share a
    # band; identical vectors share all four bands (exactly-once check
    # under maximal multi-band matching)
    rng = random.Random(11)
    vecs: dict[int, list[float]] = {}
    for i in range(0, 40, 2):
        base = [rng.gauss(0, 1) for _ in range(DIM)]
        vecs[i] = base
        if i % 4 == 0:
            vecs[i + 1] = list(base)  # exact duplicate
        else:
            vecs[i + 1] = [x + rng.gauss(0, 0.05) for x in base]
    _run(spark, vecs, threshold=0.9)


def test_orthogonal_vectors_yield_nothing(spark):
    # one-hot vectors: cosine 0 for distinct dims — nothing at 0.5
    vecs = {i: [1.0 if d == i else 0.0 for d in range(DIM)] for i in range(DIM)}
    _run(spark, vecs, threshold=0.5)
