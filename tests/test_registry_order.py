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
    # round-2 red rows re-fixed at round-3 start: must prove driver-side
    for q in (
        "q_trip_stopped_time",
        "q_trip_summary",
        "q_multimodal_payload_stats",
        "q_vocab_apply",
        "q_multimodal_features",
    ):
        assert q in first50, q
    # the reference's own flagship computation
    for q in ("q_trip_pipeline_json", "q_trip_pipeline_datasource"):
        assert q in first50, q
    # never-checked families promoted this round
    for q in (
        "q2_min_price_parts",
        "q22_idle_rich_customers",
        "q_grouping_sets",
        "q_hll_mergeable_rollup",
        "q_variant_props_stats",
        "q_phash_dup_groups",
        "q_simhash_signatures",
        "q_ann_ivf_probe",
    ):
        assert q in first50, q


def test_middle_is_round4_promotion_set():
    # positions 50..50+len(_MIDDLE) hold the still-never-checked queries
    # so a driver that checks more than 50 reaches them next
    names = list(plans.QUERIES)
    middle = set(names[50 : 50 + len(plans._MIDDLE)])
    for q in (
        "q_kmeans_clusters",
        "q_pq_adc_topk",
        "q_bpe_merges",
        "q_dedup_increment",
        "q_training_shards",
    ):
        assert q in middle, q


def test_every_priority_name_exists():
    # _ordered_names warns-and-drops unknown names; the exported dicts
    # must still agree with the registry
    from flink_template_spark.plans import registry

    assert set(plans.QUERIES) == set(registry.QUERIES)
    assert set(plans.ORACLES) == set(registry.ORACLES)


def test_oracle_queries_all_registered():
    for name in plans.ORACLES:
        assert name in plans.QUERIES


def test_stale_priority_name_warns_not_raises(monkeypatch):
    """A renamed/removed query in the slate must degrade to a warning
    and be dropped from the order — never fail package import."""
    import warnings

    monkeypatch.setattr(
        plans, "_PRIORITY", plans._PRIORITY[:3] + ["q_DOES_NOT_EXIST"]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        order = plans._ordered_names()
    assert "q_DOES_NOT_EXIST" not in order
    assert any("q_DOES_NOT_EXIST" in str(x.message) for x in w)
    # everything real is still present exactly once
    assert len(order) == len(set(order)) == len(plans.QUERIES)
