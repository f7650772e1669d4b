"""SparkSession construction tuned for this engine.

Local mode is the test bed; the config keys chosen here are the ones that
matter on a real cluster too (AQE, shuffle partitioning, Arrow, UTC).
Scale notes per knob are inline — the same builder is intended to be used
with ``master=yarn``/``k8s`` unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the local[32] / 128 GiB test container. On a real
# cluster, shuffle partitions should be ~2-3x total executor cores (or left
# to AQE's coalescing with a high initial value); locally we pin to cores.
_LOCAL_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "psql_streamer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Every config here is load-bearing at scale:

    - AQE on: runtime coalescing of small shuffle partitions, skew-join
      splitting, and dynamic join-strategy switching. At 100 TB this is
      what converts a bad static plan into a survivable one.
    - ``spark.sql.shuffle.partitions``: initial value only (AQE coalesces
      down); locally = cores so a 600k-row bench doesn't schedule 200 tasks.
    - Arrow on: every pandas_udf / applyInPandas / toPandas transfer is
      columnar batches instead of pickled rows.
    - UTC session timezone: parquet timestamps compare bit-identically with
      the DuckDB oracle (duckdb is UTC-naive).
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{_LOCAL_CPUS}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(_LOCAL_CPUS)),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Broadcast threshold 64 MiB (default 10 MiB): a multi-dim star
        # join like TPC-H q9 shuffles the FACT table once per
        # non-broadcast dim — at the sf100 decade (600M-row lineitem)
        # the default threshold left the %red%-filtered part (2.6M rows,
        # ~40 MB) and supplier⋈nation (1M rows, ~35 MB) as sort-merge
        # sides, so lineitem crossed the wire three times and the shuffle
        # working set fell out of page cache (measured: q9 213 s cold /
        # 91.8 s warm; with 64 MiB it is 22.6 s — one fact shuffle).
        # Memory math: the threshold compares COMPRESSED on-disk bytes
        # (parquet file-size stats), and a planned broadcast is NOT
        # demoted by AQE at runtime — AQE only promotes shuffle joins
        # whose measured size turns out small. A 64 MiB parquet dim can
        # expand ~3-5x as an in-memory hashed relation (~200-320 MB),
        # which must fit the driver and every executor; that is within
        # the multi-GB heaps this engine assumes (128 GiB local; any
        # sane cluster executor), but a dim that outgrows the threshold
        # on DISK (true TPC-H part at 100 TB) is planned as a shuffle
        # join from the start — the fallback is the planner's static
        # size estimate, not a runtime demotion.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Testdata timestamps are written without isAdjustedToUTC; read
        # them as plain TIMESTAMP (UTC session) rather than TIMESTAMP_NTZ
        # so the whole builtin surface (unix_millis, to_utc_timestamp, ...)
        # and the UTC-naive DuckDB oracle see one uniform type.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Split small inputs across all cores: with the default 128 MiB
        # maxPartitionBytes a 10 MiB bench file scans in ONE task and the
        # whole partial-aggregate runs single-threaded. minPartitionNum is
        # a minimum hint — at cluster scale (thousands of files) it is
        # already satisfied and changes nothing.
        .config("spark.sql.files.minPartitionNum", str(int(_LOCAL_CPUS)))
        # OptimizeJsonExprs rewrites every from_json(...).field access
        # into its OWN single-field parse — a win when a query touches 1
        # field of a wide document, an anti-optimization for a CDC engine
        # whose decode uses EVERY envelope field: the wal2json decoder's
        # ~12 field references became 5-6 DISTINCT narrow parses per row
        # (distinct schemas defeat codegen subexpression elimination),
        # measured 140.1 s vs 38.9 s for 24M events at the 300x sweep
        # (sf10: 15-16 s either way — the blow-up only shows once the
        # re-tokenization allocations dominate). With the rule off, the
        # repeated references stay IDENTICAL wide parses and codegen CSE
        # evaluates the parse once per row. Results are bit-identical;
        # the engine's single-field JSON probes use get_json_object,
        # which this rule does not touch.
        .config("spark.sql.optimizer.enableJsonExpressionOptimization", "false")
        .config("spark.ui.enabled", "false")
        # local[N] runs every task thread inside the driver JVM, so this
        # heap is the whole cluster's memory: 8g across 32 task slots was
        # 250 MiB per slot — a fraction of any real executor's per-core
        # share, and the 30x sweep OOM'd on it. 32g ~ 1 GiB/slot, in line
        # with a production 4-8 cores/4-8 GiB executor shape, while still
        # leaving ~90 GiB of the test container for Python workers + OS.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    # Scale-dependent overrides stay parameterised (optimization-guide
    # discipline: local defaults keep the bench comparable, production
    # values ride in per-deployment): SPARK_GRAFT_EXTRA_CONF takes
    # `key=value;key=value` pairs applied after the defaults above, so a
    # cluster profile (or an A/B experiment) can adjust shuffle/compression
    # /join knobs without editing code. Explicit extra_conf still wins.
    # Builder-time only: when getOrCreate returns an ALREADY-RUNNING
    # session these pairs do not apply — restart the session to change
    # static confs. Tokens without '=' are skipped with a warning rather
    # than silently becoming config(key, "") (r16 advice).
    env_extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in filter(None, (p.strip() for p in env_extra.split(";"))):
        k, sep, v = pair.partition("=")
        if not sep:
            import logging

            logging.getLogger(__name__).warning(
                "SPARK_GRAFT_EXTRA_CONF token %r has no '=', skipped", pair
            )
            continue
        builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
