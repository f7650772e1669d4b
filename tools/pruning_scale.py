"""Measured partition-pruning speedup + lake-maintenance cost at scale.

Three sections (r11 grew the first; r12 adds the other two):

1. ``events``: the r11 date-partitioned CDC lake — the same 3-day rollup
   computed (a) from the raw single-directory parquet (full scan, the
   filter is to_date(ts), a function of the column, so row-group stats
   can't help) vs (b) from the date-partitioned copy (27 of 30
   directories never opened). Records the one-time partitioned-write
   cost, wall-clock both ways, and the bytes ratio — the 100 TB metric.
2. ``lineitem_shipmonth``: the SAME mechanism on the TPC-H fact side —
   lineitem as l_shipmonth=YYYY-MM directories (83 months), the q6
   3-month rollup pruned to 3 directories. At 100 TB the lineitem scan
   IS the job; this measures what q6_pruned_shipdate_range's plan guard
   proves structurally. (Unlike events, the raw filter is on a plain
   column, so the raw scan CAN skip row groups via min/max stats — the
   measured raw cost already includes that, making the pruning delta the
   honest increment over stats-only skipping.)
3. ``compaction_events``: the maintenance leg — accumulate a fragmented
   lake (N micro-batch appends -> N file sets per date leaf, the layout
   a 1 s-trigger streaming sink actually produces), then compact_parquet
   per leaf: files before/after, compaction wall-time, pruned-read
   cold wall before/after, and row parity across the swap.

Usage:
    python tools/pruning_scale.py [sf_dir]       # default .scale/sf10
    SPARK_GRAFT_LAKE_OUT=LAKE_r12.json python tools/pruning_scale.py
    SPARK_GRAFT_LAKE_SECTIONS=events,lineitem,compaction  (default all)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _loadavg() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return None


def _du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, fn))
    return total


def _count_files(path: str) -> int:
    return sum(
        f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
    )


def _timed(rec: dict, tag_: str, build) -> None:
    samples = []
    for i in range(3):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if i == 0:
            rec[f"{tag_}_cold_sec"] = round(dt, 3)
        else:
            samples.append(dt)
    rec[f"{tag_}_warm_sec"] = round(min(samples), 3)


def _parity(a, b) -> bool:
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def measure_events(spark, sf_dir: str, lake_root: str) -> dict:
    from psql_streamer_spark.functions.numeric import dsum
    from psql_streamer_spark.operators.event_time import (
        EVT_PRUNE_END,
        EVT_PRUNE_START,
    )
    from psql_streamer_spark.sources.tables import load_table

    lake = os.path.join(lake_root, "events_by_date")
    rec: dict = {
        "range": [EVT_PRUNE_START, EVT_PRUNE_END],
        "loadavg_1m": _loadavg(),
    }

    e = load_table(spark, "events", sf_dir)
    rec["n_events"] = e.count()

    if os.path.exists(lake):
        shutil.rmtree(lake)
    t0 = time.time()
    e.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date"
    ).parquet(lake)
    rec["partitioned_write_sec"] = round(time.time() - t0, 3)

    def rollup(df, date_col):
        return (
            df.filter(
                (date_col >= F.lit(EVT_PRUNE_START).cast("date"))
                & (date_col <= F.lit(EVT_PRUNE_END).cast("date"))
            )
            .groupBy(date_col.alias("event_day"), "event_type")
            .agg(F.count("*").alias("n"), dsum("value").alias("v"))
        )

    _timed(rec, "full_scan", lambda: rollup(
        load_table(spark, "events", sf_dir), F.to_date("ts")))
    part = spark.read.parquet(lake)
    _timed(rec, "pruned", lambda: rollup(part, F.col("event_date")))

    a = rollup(load_table(spark, "events", sf_dir), F.to_date("ts"))
    b = rollup(part, F.col("event_date"))
    rec["rows"] = a.count()
    rec["parity"] = rec["rows"] == b.count() and _parity(a, b)
    rec["pruned_vs_full_cold"] = round(
        rec["pruned_cold_sec"] / rec["full_scan_cold_sec"], 3
    )
    rec["full_scan_bytes"] = _du(os.path.join(sf_dir, "events.parquet"))
    rec["pruned_bytes"] = sum(
        _du(os.path.join(lake, d))
        for d in os.listdir(lake)
        if d.startswith("event_date=")
        and EVT_PRUNE_START <= d.split("=")[1] <= EVT_PRUNE_END
    )
    rec["pruned_vs_full_bytes"] = round(
        rec["pruned_bytes"] / rec["full_scan_bytes"], 4
    )
    shutil.rmtree(lake)
    return rec


def measure_lineitem(spark, sf_dir: str, lake_root: str) -> dict:
    from psql_streamer_spark.functions.numeric import dsum
    from psql_streamer_spark.operators.tpch_suite import (
        Q6_PRUNE_END_MONTH,
        Q6_PRUNE_START_MONTH,
    )
    from psql_streamer_spark.sources.tables import load_table

    lake = os.path.join(lake_root, "lineitem_by_shipmonth")
    rec: dict = {
        "range": [Q6_PRUNE_START_MONTH, Q6_PRUNE_END_MONTH],
        "loadavg_1m": _loadavg(),
    }

    l = load_table(spark, "lineitem", sf_dir)
    rec["n_rows"] = l.count()

    # one-time ingest: (month, salt) repartition, same write discipline
    # as lineitem_shipmonth_partitioned_table — files per leaf bounded at
    # LAKE_LEAF_SALT, pruned reads keep enough splits to parallelize
    from psql_streamer_spark.operators.tpch_suite import LAKE_LEAF_SALT

    if os.path.exists(lake):
        shutil.rmtree(lake)
    t0 = time.time()
    (
        l.withColumn("l_shipmonth", F.date_format("l_shipdate", "yyyy-MM"))
        .repartition(
            max(LAKE_LEAF_SALT, spark.sparkContext.defaultParallelism),
            F.col("l_shipmonth"),
            F.pmod(F.col("l_orderkey"), F.lit(LAKE_LEAF_SALT)),
        )
        .write.partitionBy("l_shipmonth")
        .parquet(lake)
    )
    rec["partitioned_write_sec"] = round(time.time() - t0, 3)
    rec["n_partitions"] = sum(
        1 for d in os.listdir(lake) if d.startswith("l_shipmonth=")
    )

    # q6-class rollup: raw form filters the timestamp column (row-group
    # stats CAN skip here — included in the measured raw cost), pruned
    # form filters only the partition column (no data filter at all)
    def rollup_raw():
        return (
            load_table(spark, "lineitem", sf_dir)
            .filter(
                (F.col("l_shipdate")
                 >= F.lit(f"{Q6_PRUNE_START_MONTH}-01 00:00:00").cast("timestamp"))
                & (F.col("l_shipdate")
                   < F.lit("1996-04-01 00:00:00").cast("timestamp"))
            )
            .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("m"))
            .agg(
                F.count("*").alias("n"),
                dsum("l_quantity").alias("q"),
                dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("r"),
            )
        )

    part = spark.read.parquet(lake)

    def rollup_pruned():
        return (
            part.filter(
                (F.col("l_shipmonth") >= Q6_PRUNE_START_MONTH)
                & (F.col("l_shipmonth") <= Q6_PRUNE_END_MONTH)
            )
            .groupBy(F.col("l_shipmonth").alias("m"))
            .agg(
                F.count("*").alias("n"),
                dsum("l_quantity").alias("q"),
                dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("r"),
            )
        )

    _timed(rec, "full_scan", rollup_raw)
    _timed(rec, "pruned", rollup_pruned)

    a, b = rollup_raw(), rollup_pruned()
    rec["rows"] = a.count()
    rec["parity"] = rec["rows"] == b.count() and _parity(a, b)
    rec["pruned_vs_full_cold"] = round(
        rec["pruned_cold_sec"] / rec["full_scan_cold_sec"], 3
    )
    rec["full_scan_bytes"] = _du(os.path.join(sf_dir, "lineitem.parquet"))
    rec["pruned_bytes"] = sum(
        _du(os.path.join(lake, d))
        for d in os.listdir(lake)
        if d.startswith("l_shipmonth=")
        and Q6_PRUNE_START_MONTH <= d.split("=")[1] <= Q6_PRUNE_END_MONTH
    )
    rec["pruned_vs_full_bytes"] = round(
        rec["pruned_bytes"] / rec["full_scan_bytes"], 4
    )
    shutil.rmtree(lake)
    return rec


def measure_join(spark, sf_dir: str, lake_root: str) -> dict:
    """The composed job shape (q3_pruned_fact_join): an order/lineitem
    revenue join with BOTH fact scans partition-pruned (orders 3/80
    months, lineitem 6/83) vs the identical join over the raw parquet
    with the equivalent timestamp ranges. Bytes are the sum over both
    sides — the two-decade-shuffle vs two-slice-shuffle comparison."""
    from psql_streamer_spark.functions.numeric import dsum
    from psql_streamer_spark.operators.tpch_suite import LAKE_LEAF_SALT
    from psql_streamer_spark.sources.tables import load_table

    l_lake = os.path.join(lake_root, "join_lineitem_by_shipmonth")
    o_lake = os.path.join(lake_root, "join_orders_by_ordermonth")
    rec: dict = {
        "o_range": ["1996-01", "1996-03"],
        "l_range": ["1996-01", "1996-06"],
        "loadavg_1m": _loadavg(),
    }

    n_write = max(LAKE_LEAF_SALT, spark.sparkContext.defaultParallelism)
    t0 = time.time()
    for lake, tbl, ts_col, key, part in (
        (l_lake, "lineitem", "l_shipdate", "l_orderkey", "l_shipmonth"),
        (o_lake, "orders", "o_orderdate", "o_orderkey", "o_ordermonth"),
    ):
        if os.path.exists(lake):
            shutil.rmtree(lake)
        (
            load_table(spark, tbl, sf_dir)
            .withColumn(part, F.date_format(ts_col, "yyyy-MM"))
            .repartition(
                n_write, F.col(part), F.pmod(F.col(key), F.lit(LAKE_LEAF_SALT))
            )
            .write.partitionBy(part)
            .parquet(lake)
        )
    rec["partitioned_write_sec"] = round(time.time() - t0, 3)

    def agg(joined):
        return joined.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"),
        )

    def join_raw():
        o = load_table(spark, "orders", sf_dir).filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        l = load_table(spark, "lineitem", sf_dir).filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        return agg(l.join(o, l.l_orderkey == o.o_orderkey))

    lp = spark.read.parquet(l_lake)
    op = spark.read.parquet(o_lake)

    def join_pruned():
        o = op.filter(
            (F.col("o_ordermonth") >= "1996-01")
            & (F.col("o_ordermonth") <= "1996-03")
        )
        l = lp.filter(
            (F.col("l_shipmonth") >= "1996-01")
            & (F.col("l_shipmonth") <= "1996-06")
        )
        return agg(l.join(o, l.l_orderkey == o.o_orderkey))

    _timed(rec, "raw_join", join_raw)
    _timed(rec, "pruned_join", join_pruned)

    a, b = join_raw(), join_pruned()
    rec["rows"] = a.count()
    rec["parity"] = rec["rows"] == b.count() and _parity(a, b)
    rec["pruned_vs_raw_cold"] = round(
        rec["pruned_join_cold_sec"] / rec["raw_join_cold_sec"], 3
    )
    rec["raw_bytes"] = _du(os.path.join(sf_dir, "lineitem.parquet")) + _du(
        os.path.join(sf_dir, "orders.parquet")
    )
    rec["pruned_bytes"] = sum(
        _du(os.path.join(l_lake, d))
        for d in os.listdir(l_lake)
        if d.startswith("l_shipmonth=")
        and "1996-01" <= d.split("=")[1] <= "1996-06"
    ) + sum(
        _du(os.path.join(o_lake, d))
        for d in os.listdir(o_lake)
        if d.startswith("o_ordermonth=")
        and "1996-01" <= d.split("=")[1] <= "1996-03"
    )
    rec["pruned_vs_raw_bytes"] = round(rec["pruned_bytes"] / rec["raw_bytes"], 4)
    shutil.rmtree(l_lake)
    shutil.rmtree(o_lake)
    return rec


def measure_clustered(spark, sf_dir: str, lake_root: str) -> dict:
    """The clustering axis (lake_clustered_partkey_lookup): a point
    lookup on l_partkey over two month-partitioned copies of lineitem —
    the CLUSTERED layout (repartitionByRange(month, partkey) + sort:
    each file covers a narrow contiguous key slice) vs the standard
    salted pruned-table layout (every file spans the full key domain).
    The stat-skip fraction is computed from the parquet footers
    directly, at both granularities: the share of FILES and of ROW
    GROUPS whose [min,max] straddles the key — what the pushed-down
    predicate must actually read. (First-attempt record: sorting INSIDE
    salted files does nothing locally — a ~2 MB file is one row group
    spanning the whole domain, fraction 0.86 vs 0.82; range-splitting
    narrows the FILE, which survives any row-group geometry.)"""
    from psql_streamer_spark.functions.numeric import dsum
    from psql_streamer_spark.operators.tpch_suite import (
        CLUSTER_LOOKUP_PARTKEY,
        CLUSTER_SPLITS_PER_MONTH,
        LAKE_LEAF_SALT,
    )
    from psql_streamer_spark.sources.tables import load_table

    import pyarrow.parquet as pq

    key = CLUSTER_LOOKUP_PARTKEY
    rec: dict = {"partkey": key, "loadavg_1m": _loadavg()}
    clustered = os.path.join(lake_root, "lineitem_clustered")
    unsorted_ = os.path.join(lake_root, "lineitem_unsorted")

    l = load_table(spark, "lineitem", sf_dir).withColumn(
        "l_shipmonth", F.date_format("l_shipdate", "yyyy-MM")
    )
    n_months = l.select("l_shipmonth").distinct().count()
    n_range = max(
        CLUSTER_SPLITS_PER_MONTH * n_months,
        spark.sparkContext.defaultParallelism,
    )
    n_salt = max(LAKE_LEAF_SALT, spark.sparkContext.defaultParallelism)
    t0 = time.time()
    for lake, frame in (
        (
            clustered,
            l.repartitionByRange(
                n_range, F.col("l_shipmonth"), F.col("l_partkey")
            ).sortWithinPartitions("l_shipmonth", "l_partkey"),
        ),
        (
            unsorted_,
            l.repartition(
                n_salt,
                F.col("l_shipmonth"),
                F.pmod(F.col("l_orderkey"), F.lit(LAKE_LEAF_SALT)),
            ),
        ),
    ):
        if os.path.exists(lake):
            shutil.rmtree(lake)
        frame.write.partitionBy("l_shipmonth").parquet(lake)
    rec["write_both_sec"] = round(time.time() - t0, 3)

    def straddle_fraction(lake: str) -> dict:
        rgs = rg_hits = files = file_hits = 0
        for dp, _, fs in os.walk(lake):
            for fn in fs:
                if not fn.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(dp, fn)).metadata
                if md.num_row_groups == 0:
                    continue
                names = {
                    md.row_group(0).column(i).path_in_schema: i
                    for i in range(md.row_group(0).num_columns)
                }
                ci = names["l_partkey"]
                files += 1
                f_hit = False
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(ci).statistics
                    rgs += 1
                    if st is None or (st.min <= key <= st.max):
                        rg_hits += 1
                        f_hit = True
                file_hits += f_hit
        return {
            "files": files,
            "files_straddling_key": file_hits,
            "file_read_fraction": round(file_hits / files, 4) if files else None,
            "row_groups": rgs,
            "row_groups_straddling_key": rg_hits,
            "rg_read_fraction": round(rg_hits / rgs, 4) if rgs else None,
        }

    for tag_, lake in (("clustered", clustered), ("unsorted", unsorted_)):
        for k2, v2 in straddle_fraction(lake).items():
            rec[f"{tag_}_{k2}"] = v2

    def lookup(lake):
        def build():
            return (
                spark.read.parquet(lake)
                .filter(F.col("l_partkey") == key)
                .groupBy("l_partkey")
                .agg(
                    F.count("*").alias("n"),
                    dsum("l_quantity").alias("q"),
                )
            )

        return build

    _timed(rec, "clustered_lookup", lookup(clustered))
    _timed(rec, "unsorted_lookup", lookup(unsorted_))
    a, b = lookup(clustered)(), lookup(unsorted_)()
    rec["rows"] = a.count()
    rec["parity"] = rec["rows"] == b.count() and _parity(a, b)
    rec["clustered_vs_unsorted_cold"] = round(
        rec["clustered_lookup_cold_sec"] / rec["unsorted_lookup_cold_sec"], 3
    )
    shutil.rmtree(clustered)
    shutil.rmtree(unsorted_)
    return rec


def measure_zorder(spark, sf_dir: str, lake_root: str) -> dict:
    """Z-order vs linear clustering, from the parquet footers: per-file
    raw-column min/max straddle fractions for a point key on EACH of the
    two interleaved dimensions, on (a) the morton-range z-order layout
    and (b) the linear partkey-clustered layout. Expectation: linear
    reads ~nothing on its sort key and ~everything on the other; z-order
    reads ~1/sqrt(files) on BOTH."""
    import pyarrow.parquet as pq

    from psql_streamer_spark.functions.numeric import dsum
    from psql_streamer_spark.operators.tpch_suite import (
        CLUSTER_LOOKUP_PARTKEY,
        Z_BITS,
        ZORDER_LOOKUP_SUPPKEY,
        _morton2,
    )
    from psql_streamer_spark.sources.tables import load_table

    rec: dict = {
        "partkey": CLUSTER_LOOKUP_PARTKEY,
        "suppkey": ZORDER_LOOKUP_SUPPKEY,
        "loadavg_1m": _loadavg(),
    }
    zlake = os.path.join(lake_root, "lineitem_zorder")
    linlake = os.path.join(lake_root, "lineitem_linear")

    from psql_streamer_spark.operators.tpch_suite import quantile_bucket

    l = load_table(spark, "lineitem", sf_dir)
    n_buckets = 1 << Z_BITS
    bp = quantile_bucket(l, "l_partkey", n_buckets)
    bs = quantile_bucket(l, "l_suppkey", n_buckets)
    n_files = max(256, spark.sparkContext.defaultParallelism)
    rec["n_files_target"] = n_files
    t0 = time.time()
    for lake, frame in (
        (
            zlake,
            l.withColumn("__z", _morton2(bp, bs))
            .repartitionByRange(n_files, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z"),
        ),
        (
            linlake,
            l.repartitionByRange(n_files, F.col("l_partkey"))
            .sortWithinPartitions("l_partkey"),
        ),
    ):
        if os.path.exists(lake):
            shutil.rmtree(lake)
        frame.write.parquet(lake)
    rec["write_both_sec"] = round(time.time() - t0, 3)

    def straddle(lake, col, key):
        hit = total = 0
        for dp, _, fs in os.walk(lake):
            for fn in fs:
                if not fn.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(dp, fn)).metadata
                if md.num_row_groups == 0:
                    continue
                names = {
                    md.row_group(0).column(i).path_in_schema: i
                    for i in range(md.row_group(0).num_columns)
                }
                ci = names[col]
                total += 1
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(ci).statistics
                    if st is None or st.min <= key <= st.max:
                        hit += 1
                        break
        return round(hit / total, 4) if total else None

    rec["zorder_partkey_file_fraction"] = straddle(
        zlake, "l_partkey", CLUSTER_LOOKUP_PARTKEY
    )
    rec["zorder_suppkey_file_fraction"] = straddle(
        zlake, "l_suppkey", ZORDER_LOOKUP_SUPPKEY
    )
    rec["linear_partkey_file_fraction"] = straddle(
        linlake, "l_partkey", CLUSTER_LOOKUP_PARTKEY
    )
    rec["linear_suppkey_file_fraction"] = straddle(
        linlake, "l_suppkey", ZORDER_LOOKUP_SUPPKEY
    )

    def lookup(lake, col, key):
        def build():
            return (
                spark.read.parquet(lake)
                .filter(F.col(col) == key)
                .groupBy(col)
                .agg(F.count("*").alias("n"), dsum("l_quantity").alias("q"))
            )

        return build

    _timed(rec, "zorder_partkey_lookup",
           lookup(zlake, "l_partkey", CLUSTER_LOOKUP_PARTKEY))
    _timed(rec, "zorder_suppkey_lookup",
           lookup(zlake, "l_suppkey", ZORDER_LOOKUP_SUPPKEY))
    a = lookup(zlake, "l_suppkey", ZORDER_LOOKUP_SUPPKEY)()
    b = lookup(linlake, "l_suppkey", ZORDER_LOOKUP_SUPPKEY)()
    rec["rows"] = a.count()
    rec["parity"] = rec["rows"] == b.count() and _parity(a, b)
    shutil.rmtree(zlake)
    shutil.rmtree(linlake)
    return rec


def measure_compaction(spark, sf_dir: str, lake_root: str, epochs: int = 10) -> dict:
    """The maintenance leg: fragment the events lake the way a streaming
    sink does (``epochs`` appends, each WITHOUT repartition, so every
    append lands one file set per task per touched leaf), then pay it
    down with compact_parquet's per-leaf compaction. Reads before/after
    share the same page-cache state (both follow writes of the same
    data), so the delta isolates file-count overhead, not IO."""
    from psql_streamer_spark.functions.numeric import dsum
    from psql_streamer_spark.operators.event_time import (
        EVT_PRUNE_END,
        EVT_PRUNE_START,
    )
    from psql_streamer_spark.sources.io import compact_parquet
    from psql_streamer_spark.sources.tables import load_table

    lake = os.path.join(lake_root, "events_fragmented")
    rec: dict = {"epochs": epochs, "loadavg_1m": _loadavg()}

    if os.path.exists(lake):
        shutil.rmtree(lake)
    e = load_table(spark, "events", sf_dir).withColumn(
        "event_date", F.to_date("ts")
    )
    e.persist()
    rec["n_events"] = e.count()
    t0 = time.time()
    for i in range(epochs):
        (
            e.filter(F.pmod(F.col("event_id"), F.lit(epochs)) == i)
            .write.partitionBy("event_date")
            .mode("append")
            .parquet(lake)
        )
    rec["fragmented_write_sec"] = round(time.time() - t0, 3)
    e.unpersist()
    rec["files_before"] = _count_files(lake)

    def rollup(df):
        return (
            df.filter(
                (F.col("event_date") >= F.lit(EVT_PRUNE_START).cast("date"))
                & (F.col("event_date") <= F.lit(EVT_PRUNE_END).cast("date"))
            )
            .groupBy("event_date", "event_type")
            .agg(F.count("*").alias("n"), dsum("value").alias("v"))
        )

    _timed(rec, "pruned_fragmented", lambda: rollup(spark.read.parquet(lake)))
    rows_before = rollup(spark.read.parquet(lake)).count()
    # ground truth for post-compaction parity comes from the RAW events
    # table, not the fragmented lake: the pre-compaction lake plan cannot
    # be re-executed after the swap (its files are gone)
    truth = rollup(
        load_table(spark, "events", sf_dir).withColumn(
            "event_date", F.to_date("ts")
        )
    )

    t0 = time.time()
    rec["compacted_file_target"] = compact_parquet(spark, lake, target_file_mb=128)
    rec["compaction_sec"] = round(time.time() - t0, 3)
    rec["files_after"] = _count_files(lake)

    _timed(rec, "pruned_compacted", lambda: rollup(spark.read.parquet(lake)))
    after = rollup(spark.read.parquet(lake))
    rec["rows"] = rows_before
    rec["parity"] = (
        rows_before == after.count() == truth.count() and _parity(truth, after)
    )
    rec["pruned_compacted_vs_fragmented_cold"] = round(
        rec["pruned_compacted_cold_sec"] / rec["pruned_fragmented_cold_sec"], 3
    )
    shutil.rmtree(lake)
    return rec


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
    sections = os.environ.get(
        "SPARK_GRAFT_LAKE_SECTIONS",
        "events,lineitem,join,clustered,zorder,compaction",
    ).split(",")

    from psql_streamer_spark.session import get_spark
    from psql_streamer_spark.warmup import warm_expression_paths

    spark = get_spark("pruning_scale")
    warm_expression_paths(spark)

    tag = re.sub(r"\W+", "_", sf_dir.strip("/"))
    lake_root = f"/root/repo/.scale/lake_{tag}"
    os.makedirs(lake_root, exist_ok=True)
    rec: dict = {"sf_dir": sf_dir, "loadavg_1m_start": _loadavg()}
    try:
        # print each section as it lands so a late crash loses nothing
        if "events" in sections:
            rec["events"] = measure_events(spark, sf_dir, lake_root)
            print(json.dumps({"events": rec["events"]}), flush=True)
        if "lineitem" in sections:
            rec["lineitem_shipmonth"] = measure_lineitem(spark, sf_dir, lake_root)
            print(
                json.dumps({"lineitem_shipmonth": rec["lineitem_shipmonth"]}),
                flush=True,
            )
        if "join" in sections:
            rec["pruned_fact_join"] = measure_join(spark, sf_dir, lake_root)
            print(
                json.dumps({"pruned_fact_join": rec["pruned_fact_join"]}),
                flush=True,
            )
        if "clustered" in sections:
            rec["clustered_lookup"] = measure_clustered(spark, sf_dir, lake_root)
            print(
                json.dumps({"clustered_lookup": rec["clustered_lookup"]}),
                flush=True,
            )
        if "zorder" in sections:
            rec["zorder"] = measure_zorder(spark, sf_dir, lake_root)
            print(json.dumps({"zorder": rec["zorder"]}), flush=True)
        if "compaction" in sections:
            rec["compaction_events"] = measure_compaction(spark, sf_dir, lake_root)
            print(
                json.dumps({"compaction_events": rec["compaction_events"]}),
                flush=True,
            )
    finally:
        shutil.rmtree(lake_root, ignore_errors=True)

    out = os.environ.get("SPARK_GRAFT_LAKE_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
