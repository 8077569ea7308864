"""Registry-order invariants: the first 50 exported queries are the
per-round driver-check slate (plans/__init__ docstring) — pin its
composition so an innocent registration change can't silently evict a
flagship from verification."""

from __future__ import annotations

from flink_template_spark import plans


def test_priority_slate_shape():
    names = list(plans.QUERIES)
    assert len(names) == len(set(names))
    first50 = set(names[:50])
    # round-1-blocked queries that must prove the events-loader fix
    for q in (
        "q_events_tumbling_daily",
        "q_trip_summary",
        "q_json_get",
        "q_range_frame_rolling_7d",
        "q_lateral_topk_nations",
    ):
        assert q in first50, q
    # LLM-pipeline flagships
    for q in (
        "q_minhash_lsh_pairs",
        "q_bm25_search",
        "q_training_data_pipeline",
        "q_repetition_metrics",
        "q_semdedup_keep",
        "q_cosine_topk",
        "q_scd2_merge",
    ):
        assert q in first50, q


def test_every_priority_name_exists():
    # _ordered_names raises on unknown names at import; re-assert the
    # exported dicts agree with the registry
    from flink_template_spark.plans import registry

    assert set(plans.QUERIES) == set(registry.QUERIES)
    assert set(plans.ORACLES) == set(registry.ORACLES)


def test_oracle_queries_all_registered():
    for name in plans.ORACLES:
        assert name in plans.QUERIES
