"""SQL passthrough interface and skew-aware join utilities."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_template_spark.operators.skew import key_histogram, salted_join
from flink_template_spark.sql import run_sql


def test_run_sql_matches_dataframe_path(spark, sf_dir):
    from flink_template_spark.tables import load_table

    sql_rows = run_sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
    ).collect()
    df_rows = {
        (r.l_returnflag, r["count"])
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .count()
        .collect()
    }
    assert {(r.l_returnflag, r.n) for r in sql_rows} == df_rows


def test_run_sql_joins_views(spark, sf_dir):
    out = run_sql(
        spark,
        sf_dir,
        """
        SELECT r_name, COUNT(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """,
    ).collect()
    assert len(out) == 5 and all(r.n_nations == 5 for r in out)


def test_salted_join_equals_plain_join(spark, sf_dir):
    from flink_template_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    cust_k = cust.withColumnRenamed("c_custkey", "o_custkey")
    salted = (
        salted_join(orders, cust_k, on="o_custkey", n_salts=4)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert {(r.c_mktsegment, r["count"]) for r in plain} == {
        (r.c_mktsegment, r["count"]) for r in salted
    }


def test_key_histogram(spark, sf_dir):
    from flink_template_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    hist = key_histogram(li, "l_returnflag", top=3).collect()
    assert len(hist) == 3
    assert abs(sum(r.share for r in hist) - 1.0) < 1e-9  # 3 flags cover all
    assert hist[0].n_rows >= hist[-1].n_rows


def test_write_partitioned_parquet(spark, sf_dir, tmp_path):
    import os

    from flink_template_spark.sinks import write_partitioned_parquet
    from flink_template_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_out")
    write_partitioned_parquet(ev, out, partition_by=["event_type"])
    dirs = sorted(d for d in os.listdir(out) if d.startswith("event_type="))
    assert len(dirs) == 5  # click/error/purchase/signup/view
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # partition pruning works on the round-trip
    assert back.filter("event_type = 'click'").count() == ev.filter(
        "event_type = 'click'"
    ).count()
    # ...and is visible in the plan (directory-level, not row-level)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter("event_type = 'click'").explain("formatted")
    assert "PartitionFilters: [isnotnull(event_type" in buf.getvalue()


def test_resample_ffill(spark):
    import datetime as dt

    from flink_template_spark.operators.resample import resample_ffill

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 15), 10.0),
        (1, dt.datetime(2024, 1, 1, 2, 45), 30.0),  # hour 1 is a gap
        (2, dt.datetime(2024, 1, 1, 5, 0), 99.0),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, value DOUBLE")
    out = {
        (r.user_id, r.ts.hour): (r.value, r.filled)
        for r in resample_ffill(df, freq="1h").collect()
    }
    assert out[(1, 0)] == (10.0, False)
    assert out[(1, 1)] == (10.0, True)  # forward-filled gap
    assert out[(1, 2)] == (30.0, False)
    assert out[(2, 5)] == (99.0, False)
    assert len(out) == 4


def test_pandas_cosine_matches_expression(spark, sf_dir):
    """The pandas_udf tier must agree with the Catalyst-expression tier
    (numpy BLAS fold vs left-to-right fold: equal to ~1e-12)."""
    from pyspark.sql import functions as F

    from flink_template_spark.functions.vector import cosine, pandas_cosine_to
    from flink_template_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    qcol = F.array(*[F.lit(x) for x in qvec])
    both = emb.filter("vec_id > 0").select(
        "vec_id",
        pandas_cosine_to(qvec)(F.col("embedding")).alias("pandas_cos"),
        cosine(F.col("embedding"), qcol).alias("expr_cos"),
    )
    bad = both.filter(F.abs(F.col("pandas_cos") - F.col("expr_cos")) > 1e-9)
    assert bad.count() == 0


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Co-located bucketed join: no shuffle Exchange on either side."""
    import contextlib
    import io

    from flink_template_spark.sinks import write_bucketed_table
    from flink_template_spark.tables import load_table

    write_bucketed_table(
        load_table(spark, sf_dir, "orders"),
        "orders_bt", str(tmp_path / "orders_bt"), "o_orderkey", 8,
    )
    write_bucketed_table(
        load_table(spark, sf_dir, "lineitem"),
        "lineitem_bt", str(tmp_path / "lineitem_bt"), "l_orderkey", 8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, od = spark.table("lineitem_bt"), spark.table("orders_bt")
        j = li.join(od, li.l_orderkey == od.o_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # buckets align
        assert "Bucketed: true" in plan
        assert j.count() == load_table(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bt")


def test_file_sources_roundtrip(spark, tmp_path):
    from flink_template_spark.sources.files import read_csv, read_json, read_parquet

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id LONG, name STRING, v DOUBLE"
    )
    df.write.mode("overwrite").option("header", "true").csv(str(tmp_path / "c"))
    df.write.mode("overwrite").json(str(tmp_path / "j"))
    df.write.mode("overwrite").parquet(str(tmp_path / "p"))

    schema = "id LONG, name STRING, v DOUBLE"
    got_c = {tuple(r) for r in read_csv(spark, str(tmp_path / "c"), schema).collect()}
    got_j = {tuple(r) for r in read_json(spark, str(tmp_path / "j"), schema).collect()}
    got_p = {tuple(r) for r in read_parquet(spark, str(tmp_path / "p")).collect()}
    want = {(1, "a", 1.5), (2, "b", 2.5)}
    assert got_c == got_j == got_p == want

    # malformed JSON line is dropped, not failed (engine convention S6)
    (tmp_path / "j" / "bad.json").write_text('{"id": broken\n')
    assert read_json(spark, str(tmp_path / "j"), schema).count() == 2


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from flink_template_spark.sources.files import read_orc, write_orc

    df = spark.createDataFrame(
        [(i, f"n{i}", i * 1.5) for i in range(100)],
        "id LONG, name STRING, v DOUBLE",
    )
    write_orc(df, str(tmp_path / "o"))
    back = read_orc(spark, str(tmp_path / "o"))
    assert back.count() == 100
    filtered = back.filter("id = 7").select("name")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # filter and projection both reach the ORC scan
    assert "PushedFilters" in plan and "id" in plan
    assert filtered.collect() == [("n7",)]


def test_read_json_audit_captures_corrupt(spark, tmp_path):
    from flink_template_spark.sources.files import read_json_audit

    p = tmp_path / "audit"
    p.mkdir()
    (p / "data.json").write_text(
        '{"id": 1, "v": 1.5}\n{"id": broken!!\n{"id": 2, "v": 2.5}\n'
    )
    df = read_json_audit(spark, str(p), "id LONG, v DOUBLE")
    # cache: PERMISSIVE corrupt-record capture requires materialization
    # before filtering on _corrupt_record (Spark raises otherwise)
    df = df.cache()
    good = df.filter("_corrupt_record IS NULL")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert good.count() == 2
    assert bad.count() == 1
    assert "broken" in bad.first()._corrupt_record
    df.unpersist()


def test_clustered_parquet_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    """write_clustered_parquet produces files whose parquet-footer
    min/max ranges on the cluster key do not overlap — the property
    that makes stats-based data skipping effective."""
    import glob

    import pyarrow.parquet as pq

    from flink_template_spark.sinks import write_clustered_parquet
    from flink_template_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "clustered")
    write_clustered_parquet(orders, out, cluster_by=["o_custkey"], n_files=8)

    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["o_custkey"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 2  # actually split into multiple files
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges ({lo1},{hi1}) vs ({lo2},{hi2})"
    # round-trip completeness
    assert spark.read.parquet(out).count() == orders.count()


def test_zorder_parquet_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """write_zorder_parquet: footer min/max stay narrow on EVERY
    clustered dimension, so a thin filter on either one prunes most
    files (range clustering can only do this for the leading key)."""
    import glob

    import pyarrow.parquet as pq

    from flink_template_spark.sinks import write_zorder_parquet
    from flink_template_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "zorder")
    write_zorder_parquet(
        orders, out, cluster_by=["o_custkey", "o_totalprice"], n_files=16
    )

    spans = {"o_custkey": [], "o_totalprice": []}
    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 8
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for col in spans:
            st = [
                md.row_group(rg).column(idx[col]).statistics
                for rg in range(md.num_row_groups)
            ]
            spans[col].append((min(s.min for s in st), max(s.max for s in st)))

    # For a slice covering 1/8 of each dimension's domain, most files'
    # [min,max] must not overlap it. Z-ordering gives ~sqrt locality per
    # dim; require at least half the files pruned on each dimension.
    for col, file_spans in spans.items():
        lo = min(s[0] for s in file_spans)
        hi = max(s[1] for s in file_spans)
        w = (hi - lo) / 8
        q_lo, q_hi = lo + 3 * w, lo + 4 * w
        overlapping = sum(1 for a, b in file_spans if not (b < q_lo or a > q_hi))
        assert overlapping <= len(file_spans) // 2, (
            f"{col}: {overlapping}/{len(file_spans)} files overlap a 1/8 slice"
        )
    assert spark.read.parquet(out).count() == orders.count()


def test_compact_parquet_bin_packs_small_files(spark, sf_dir, tmp_path):
    """compact_parquet merges a many-small-files directory down to the
    byte-target file count without losing rows; with cluster_by it also
    restores disjoint footer ranges."""
    import glob

    from flink_template_spark.sinks import compact_parquet
    from flink_template_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    frag = str(tmp_path / "fragmented")
    orders.repartition(64).write.parquet(frag)  # simulate tiny-file ingest
    assert len(glob.glob(frag + "/*.parquet")) == 64

    out = str(tmp_path / "compacted")
    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(frag + "/*.parquet")
    )
    n = compact_parquet(spark, frag, out, target_file_bytes=total // 3)
    files = glob.glob(out + "/*.parquet")
    assert len(files) == n <= 5
    assert spark.read.parquet(out).count() == orders.count()

    out2 = str(tmp_path / "compacted_clustered")
    compact_parquet(
        spark, frag, out2, target_file_bytes=total // 3, cluster_by=["o_orderkey"]
    )
    import pyarrow.parquet as pq

    ranges = []
    for f in glob.glob(out2 + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["o_orderkey"]
        st = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
        ranges.append((min(s.min for s in st), max(s.max for s in st)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_apply_deletes_touches_only_victim_files(spark, sf_dir, tmp_path):
    """GDPR delete propagation: files without victims stay
    byte-identical, victim files are replaced, the surviving table is
    exactly the anti-join, deleted ids never resurface, and a re-run
    with the same keys is a no-op."""
    import glob
    import os

    from flink_template_spark.sinks import apply_deletes, write_clustered_parquet
    from flink_template_spark.tables import load_table

    out = str(tmp_path / "orders_clustered")
    orders = load_table(spark, sf_dir, "orders")
    write_clustered_parquet(orders, out, cluster_by=["o_orderkey"], n_files=8)
    before = {
        f: open(f, "rb").read()
        for f in glob.glob(os.path.join(out, "*.parquet"))
    }
    assert len(before) == 8

    # victims drawn from a narrow key range -> clustered layout keeps
    # them in few files
    lo = orders.agg(F.min("o_orderkey")).first()[0]
    keys = orders.filter(
        (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < lo + 40)
    ).select("o_orderkey")
    n_victim_rows = keys.count()
    assert n_victim_rows > 0

    stats = apply_deletes(spark, out, keys, id_col="o_orderkey")
    assert stats["n_files"] == 8
    assert 1 <= stats["n_rewritten"] <= 2  # range-clustered -> few files
    assert stats["n_rows_deleted"] == n_victim_rows

    after_files = glob.glob(os.path.join(out, "*.parquet"))
    untouched = [f for f in after_files if f in before]
    assert len(untouched) == 8 - stats["n_rewritten"]
    for f in untouched:
        assert open(f, "rb").read() == before[f]  # byte-identical

    survivors = spark.read.parquet(out)
    assert survivors.count() == orders.count() - n_victim_rows
    assert survivors.join(keys, "o_orderkey", "left_semi").count() == 0

    # idempotent re-run: nothing left to rewrite
    stats2 = apply_deletes(spark, out, keys, id_col="o_orderkey")
    assert stats2["n_rewritten"] == 0 and stats2["n_rows_deleted"] == 0


def test_apply_deletes_recovers_from_mid_swap_crash(spark, sf_dir, tmp_path):
    """Crash DURING victim-file removal (cleaned parts moved in, some
    victims still on disk, manifest pending): the next apply_deletes
    call must finish the interrupted swap — no duplicated kept rows,
    no resurrected victims. (Pre-manifest, a crash here would shrink
    the next run's victim set, change the batch hash, and permanently
    duplicate kept rows — the r6 self-review finding.)"""
    import glob
    import json
    import os

    from flink_template_spark.sinks import (
        _DELETE_MANIFEST,
        apply_deletes,
        write_clustered_parquet,
    )
    from flink_template_spark.tables import load_table

    out = str(tmp_path / "orders_crash")
    orders = load_table(spark, sf_dir, "orders")
    write_clustered_parquet(orders, out, cluster_by=["o_orderkey"], n_files=8)

    lo = orders.agg(F.min("o_orderkey")).first()[0]
    hi = orders.agg(F.max("o_orderkey")).first()[0]
    # victims at BOTH ends of the key range -> two separate victim files
    keys = orders.filter(
        (F.col("o_orderkey") < lo + 20) | (F.col("o_orderkey") > hi - 20)
    ).select("o_orderkey")
    n_victim_rows = keys.count()

    stats = apply_deletes(spark, out, keys, id_col="o_orderkey")
    assert stats["n_rewritten"] >= 2

    # Second delete batch, intercepting the swap mid-victim-removal.
    keys2 = orders.filter(
        (F.col("o_orderkey") >= lo + 100) & (F.col("o_orderkey") < lo + 140)
    ).select("o_orderkey")
    n2 = keys2.count()
    assert n2 > 0

    import flink_template_spark.sinks as sinks_mod

    real_finish = sinks_mod._finish_pending_deletes
    calls = {"n": 0}

    def crashing_finish(path):
        # first call = the entry-recovery no-op; second = the real swap,
        # which we interrupt after moving parts but before removing the
        # LAST victim (partial removal = the dangerous window)
        calls["n"] += 1
        if calls["n"] < 2:
            return real_finish(path)
        mpath = os.path.join(path, _DELETE_MANIFEST)
        with open(mpath) as fh:
            pending = json.load(fh)
        batch = pending["batch"]
        scratch = os.path.join(path, f".delete_tmp_{batch}")
        for part in sorted(glob.glob(os.path.join(scratch, "*.parquet"))):
            dst = os.path.join(
                path, f"cleaned-{batch}-{os.path.basename(part)}"
            )
            if not os.path.exists(dst):
                os.rename(part, dst)
        for f in pending["victim_files"][:-1]:
            if os.path.exists(f):
                os.remove(f)
        raise RuntimeError("simulated crash mid victim removal")

    sinks_mod._finish_pending_deletes = crashing_finish
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="simulated crash"):
            apply_deletes(spark, out, keys2, id_col="o_orderkey")
    finally:
        sinks_mod._finish_pending_deletes = real_finish

    # crash state: manifest pending, last victim still on disk, cleaned
    # parts already moved in -> table would double the kept rows of the
    # surviving victim file if read naively... recovery must fix it
    assert os.path.exists(os.path.join(out, _DELETE_MANIFEST))

    stats3 = apply_deletes(spark, out, keys2, id_col="o_orderkey")
    assert stats3["n_rows_deleted"] == 0  # recovery finished the swap
    assert not os.path.exists(os.path.join(out, _DELETE_MANIFEST))
    assert not glob.glob(os.path.join(out, ".delete_tmp_*"))

    survivors = spark.read.parquet(out)
    expect = orders.count() - n_victim_rows - n2
    assert survivors.count() == expect  # no duplicated kept rows
    assert survivors.join(keys2, "o_orderkey", "left_semi").count() == 0
    # exact multiset equality with the anti-join of the original table
    both = orders.join(keys, "o_orderkey", "left_anti").join(
        keys2, "o_orderkey", "left_anti"
    )
    assert survivors.exceptAll(both).count() == 0
    assert both.exceptAll(survivors).count() == 0


def test_zone_map_candidates_prune_and_stay_conservative(spark, sf_dir, tmp_path):
    """Footer zone-map pruning: on a key-clustered table only the files
    whose [min,max] covers a delete key are candidates; the pruned-out
    files truly contain no victims; empty key sets prune everything;
    and an out-of-range key set prunes every file."""
    import glob
    import os

    from flink_template_spark.sinks import _zone_map_candidates, write_clustered_parquet
    from flink_template_spark.tables import load_table

    out = str(tmp_path / "orders_zm")
    orders = load_table(spark, sf_dir, "orders")
    write_clustered_parquet(orders, out, cluster_by=["o_orderkey"], n_files=8)
    files = sorted(glob.glob(os.path.join(out, "*.parquet")))

    lo = orders.agg(F.min("o_orderkey")).first()[0]
    keys = orders.filter(
        (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < lo + 40)
    ).select("o_orderkey")
    cand = _zone_map_candidates(files, "o_orderkey", keys)
    assert 1 <= len(cand) <= 2 and set(cand) <= set(files)
    # conservative: every pruned file is genuinely victim-free
    pruned = [f for f in files if f not in cand]
    assert pruned
    no_victims = spark.read.parquet(*pruned).join(
        keys, "o_orderkey", "left_semi"
    )
    assert no_victims.count() == 0

    # empty and out-of-range key sets
    empty = keys.filter(F.lit(False))
    assert _zone_map_candidates(files, "o_orderkey", empty) == []
    hi = orders.agg(F.max("o_orderkey")).first()[0]
    beyond = spark.range(hi + 1000, hi + 1010).withColumnRenamed(
        "id", "o_orderkey"
    )
    assert _zone_map_candidates(files, "o_orderkey", beyond) == []


def test_merge_on_read_deletes_and_compaction(spark, sf_dir, tmp_path):
    """Equality-delete files subtract at read time without touching
    data files; compaction folds them into the copy-on-write rewrite
    and retires them; re-reading after compaction needs no delete
    logic. Raw reads (no reader) still see the full table."""
    import glob
    import os

    from pyspark.sql import functions as F

    from flink_template_spark.sinks import (
        append_delete_file,
        compact_deletes,
        read_with_deletes,
        write_clustered_parquet,
    )
    from flink_template_spark.tables import load_table

    out = str(tmp_path / "orders_mor")
    orders = load_table(spark, sf_dir, "orders")
    write_clustered_parquet(orders, out, cluster_by=["o_orderkey"], n_files=6)
    files_before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(out, "*.parquet"))
    }
    n_all = orders.count()

    lo = orders.agg(F.min("o_orderkey")).first()[0]
    k1 = orders.filter(F.col("o_orderkey") < lo + 30).select("o_orderkey")
    k2 = orders.filter(
        (F.col("o_orderkey") >= lo + 50) & (F.col("o_orderkey") < lo + 80)
    ).select("o_orderkey")
    n1, n2 = k1.count(), k2.count()

    append_delete_file(spark, out, k1, id_col="o_orderkey")
    append_delete_file(spark, out, k2, id_col="o_orderkey")

    # read-time subtraction; data files untouched byte-for-byte
    got = read_with_deletes(spark, out, id_col="o_orderkey")
    assert got.count() == n_all - n1 - n2
    assert got.join(k1, "o_orderkey", "left_semi").count() == 0
    for f, mtime in files_before.items():
        assert os.path.getmtime(f) == mtime, f
    # raw scan still sees everything (deletes are opt-in)
    assert spark.read.parquet(out).count() == n_all

    stats = compact_deletes(spark, out, id_col="o_orderkey")
    assert stats["n_rows_deleted"] == n1 + n2
    assert not os.path.isdir(os.path.join(out, "_deletes"))
    # post-compaction: physical state equals the merge-on-read view
    after = spark.read.parquet(out)
    assert after.count() == n_all - n1 - n2
    assert read_with_deletes(spark, out, id_col="o_orderkey").count() == (
        n_all - n1 - n2
    )
    # idempotent: compacting again is a no-op
    assert compact_deletes(spark, out, id_col="o_orderkey") == {
        "n_files": 0, "n_rewritten": 0, "n_rows_deleted": 0,
    }
