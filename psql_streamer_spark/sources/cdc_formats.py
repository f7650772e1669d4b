"""CDC envelope-variant decoders: wal2json v2 and Debezium.

The reference decodes pgoutput wire tuples against a cached relation
(source/postgres/postgres.go:298-355,379-428). Our engine ingests CDC as
JSON (SURVEY §2.1 S1 mapping); this module is the analogue of that decode
step for the two JSON envelope dialects a PostgreSQL CDC feed actually
ships: wal2json (format-version 2, one JSON object per change) and
Debezium's connector envelope. Each decoder normalizes its dialect into
the engine's canonical Event envelope (schema.EVENT_SCHEMA) entirely with
JVM-side expressions — `from_json` + column maps, no Python in the path —
so the decode runs at scan speed inside WholeStageCodegen.

Heterogeneous JSON payload values (numbers/bools/strings) are transported
as their literal text in `map<string,string>` — the same lossless
schema-on-read contract as the reference's `Columns map[string]interface{}`
(event/event.go:33), with RelationRegistry projection (transforms.
project_table) recovering types downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# wal2json format-version 2: one object per DML, actions I/U/D plus
# B(egin)/C(ommit)/T(runcate)/M(essage). `columns` carries new values,
# `identity` the replica-identity (old) values on U/D.
WAL2JSON_SCHEMA = (
    "action string, schema string, `table` string, "
    "columns array<struct<name:string,type:string,value:string>>, "
    "identity array<struct<name:string,type:string,value:string>>, "
    "timestamp string, lsn string"
)

# Debezium envelope (payload part; works with or without the schema
# wrapper since from_json ignores absent fields): op c/u/d/r, before/after
# row images, source block with lsn + db/table coordinates.
DEBEZIUM_SCHEMA = (
    "payload struct<"
    "before:map<string,string>, after:map<string,string>, "
    "source:struct<name:string,db:string,schema:string,`table`:string,"
    "lsn:bigint,ts_ms:bigint>, "
    "op:string, ts_ms:bigint>"
)

_WAL2JSON_ACTIONS = {
    "I": "insert",
    "U": "update",
    "D": "delete",
    "B": "begin",
    "C": "commit",
    "T": "truncate",
    "M": "message",
}

_DEBEZIUM_OPS = {
    "c": "insert",
    "r": "insert",  # snapshot read = initial load insert
    "u": "update",
    "d": "delete",
}


def _entries_to_map(entries: Column) -> Column:
    """array<struct<name,type,value>> -> map<string,string> (values keep
    their literal JSON text; NULL JSON values stay NULL)."""
    return F.map_from_entries(
        F.transform(
            entries,
            lambda c: F.struct(c["name"].alias("key"), c["value"].alias("value")),
        )
    )


def lsn_to_wal_position(lsn: Column) -> Column:
    """PostgreSQL LSN text ('hi/lo' in hex, e.g. '0/16B3748') -> the
    numeric WAL position the reference tracks (uint64: hi<<32 | lo).
    Bitwise composition, not multiplication: Spark's long is signed, and
    ANSI mode would raise on hi >= 2^31 where the same 64-bit pattern is a
    valid uint64 to the reference (the sign flip only occurs past 8 EB of
    WAL; ordering is preserved for every physically reachable LSN)."""
    hi = F.conv(F.split_part(lsn, F.lit("/"), F.lit(1)), 16, 10).cast("bigint")
    lo = F.conv(F.split_part(lsn, F.lit("/"), F.lit(2)), 16, 10).cast("bigint")
    return F.shiftleft(hi, 32).bitwiseOR(lo).alias("wal_position")


# --------------------------------------------------------------------------
# Shared envelope struct-builders (r16): each dialect's decode logic lives
# ONCE as an expression returning the canonical envelope as a struct —
# (host, database, table, action, wal_position, ts, uuid_ok, columns) —
# consumed both by its standalone decode_<dialect> and by the single-pass
# decode_cdc_auto dispatch. `uuid_ok` is the dialect's "envelope parsed"
# guard; the uuid itself is stamped by the caller's top-level projection
# (the uuid expression may reference passthrough frame columns, and the
# uuid() default is nondeterministic — both only valid at Project level).
# --------------------------------------------------------------------------
_ENVELOPE_FIELDS = (
    "host", "database", "table", "action", "wal_position", "ts", "columns",
)


def _project_envelope(df: DataFrame, stamp: Column, extra=()) -> DataFrame:
    """Expand a `__e` envelope struct into the canonical output columns,
    stamping `uuid` from ``stamp`` only where the struct's uuid_ok guard
    holds. Catalyst collapses the struct build + field extraction back to
    the underlying expressions (SimplifyExtractValueOps), so the plan is
    the same flat projection the pre-r16 decoders produced."""
    cols = [
        F.col("__e.host").alias("host"),
        F.col("__e.database").alias("database"),
        F.col("__e.table").alias("table"),
        F.col("__e.action").alias("action"),
        F.col("__e.wal_position").alias("wal_position"),
        F.col("__e.ts").alias("ts"),
        F.when(F.col("__e.uuid_ok"), stamp).alias("uuid"),
        F.col("__e.columns").alias("columns"),
    ]
    return df.select(*cols, *extra)


def _parsed_events(value: Column, schema: str, fn) -> Column:
    """Let-binding for a single envelope parse: a 1-element array holding
    from_json's result, mapped through ``fn`` — inside the lambda every
    field access is a cheap lambda-variable read, so the (CodegenFallback,
    non-CSE-able) JSON parse runs EXACTLY ONCE per row even when the
    result feeds 8 struct fields inside a CaseWhen branch or a nested
    transform (where Spark's subexpression elimination never applies —
    measured 8 parses/row without this, OPTIMIZATION_r16.md)."""
    return F.transform(F.array(F.from_json(value, schema)), fn)


def _wal2json_event(value: Column, host: str, database: str) -> Column:
    """array<envelope struct> (1 element), parse bound via _parsed_events."""
    return _parsed_events(
        value, WAL2JSON_SCHEMA, lambda p: _wal2json_struct(p, host, database)
    )


def _wal2json_struct(p: Column, host: str, database: str) -> Column:
    mapped = None
    for letter, name in _WAL2JSON_ACTIONS.items():
        mapped = (
            F.when(p["action"] == letter, name)
            if mapped is None
            else mapped.when(p["action"] == letter, name)
        )
    action = mapped.otherwise(F.lower(p["action"]))
    payload = F.when(p["action"] == "D", p["identity"]).otherwise(p["columns"])
    # wal2json stamps the commit time in the server's log_timezone, e.g.
    # '... 10:15:30.123456+02'. The timestamp CAST parses the offset and
    # converts to the (UTC) session zone — stripping it instead would shift
    # event time by the server offset for any non-UTC feed.
    ts = p["timestamp"].cast("timestamp")
    return F.struct(
        F.lit(host).alias("host"),
        F.lit(database).alias("database"),
        p["table"].alias("table"),
        action.alias("action"),
        lsn_to_wal_position(p["lsn"]).alias("wal_position"),
        ts.alias("ts"),
        # uuid ONLY for parsed records (every wal2json record carries an
        # action): a malformed line must stay uuid-less so validate_split
        # routes it to the DLQ, like the reference's decode-failure skip
        p["action"].isNotNull().alias("uuid_ok"),
        _entries_to_map(payload).alias("columns"),
    )


def decode_wal2json(
    df: DataFrame,
    value_col: str = "value",
    host: str = "unknown",
    database: str = "unknown",
    uuid: Column | None = None,
) -> DataFrame:
    """wal2json v2 lines -> canonical Event envelope.

    Action letters map to the closed enum; non-DML records (B/C/T/M) keep
    their marker action so filter_dml (T1) drops them exactly like the
    reference drops Begin/Commit (postgres.go:327-330). DELETE rows carry
    their replica identity as the payload (`identity`), matching pgoutput's
    old-tuple decode. Malformed JSON yields NULL fields -> DLQ split (T5).

    `uuid` defaults to a fresh v4 per event (postgres.go:349); pass a
    deterministic expression for oracle-compared outputs.
    """
    stamp = uuid if uuid is not None else F.expr("uuid()")
    tagged = df.withColumn(
        "__e",
        F.explode_outer(
            _wal2json_event(F.col(value_col).cast("string"), host, database)
        ),
    )
    return _project_envelope(tagged, stamp)


def decode_debezium(
    df: DataFrame,
    value_col: str = "value",
    host: str | None = None,
    uuid: Column | None = None,
) -> DataFrame:
    """Debezium envelopes -> canonical Event envelope.

    op c/r -> insert (snapshot reads are initial-load inserts), u -> update,
    d -> delete with the `before` image as payload (the replica identity the
    reference decodes from pgoutput's old tuple). host defaults to the
    connector's logical `source.name`; event time is source.ts_ms (the
    commit timestamp), millisecond precision by Debezium's contract.
    """
    stamp = uuid if uuid is not None else F.expr("uuid()")
    tagged = df.withColumn(
        "__e",
        F.explode_outer(
            _debezium_event(F.col(value_col).cast("string"), host)
        ),
    )
    return _project_envelope(tagged, stamp)


def _debezium_event(value: Column, host: str | None) -> Column:
    """array<envelope struct> (1 element), parse bound via _parsed_events."""
    return _parsed_events(
        value, DEBEZIUM_SCHEMA, lambda w: _debezium_struct(w, host)
    )


def _debezium_struct(wrapper: Column, host: str | None) -> Column:
    p = wrapper["payload"]
    mapped = None
    for op, name in _DEBEZIUM_OPS.items():
        mapped = (
            F.when(p["op"] == op, name)
            if mapped is None
            else mapped.when(p["op"] == op, name)
        )
    action = mapped.otherwise(F.lower(p["op"]))
    payload = F.when(p["op"] == "d", p["before"]).otherwise(p["after"])
    host_col = F.lit(host) if host is not None else F.coalesce(
        p["source"]["name"], F.lit("unknown")
    )
    return F.struct(
        host_col.alias("host"),
        F.coalesce(p["source"]["db"], F.lit("unknown")).alias("database"),
        p["source"]["table"].alias("table"),
        action.alias("action"),
        p["source"]["lsn"].alias("wal_position"),
        F.timestamp_millis(p["source"]["ts_ms"]).alias("ts"),
        # uuid only when the envelope parsed (op is mandatory in Debezium)
        p["op"].isNotNull().alias("uuid_ok"),
        payload.alias("columns"),
    )


# Maxwell's daemon envelope: one JSON object per row change. type
# insert/update/delete plus bootstrap-* (initial load) and DDL markers
# (table-create/...); ts is UNIX seconds; position is the binlog
# coordinate 'file.NNNNNN:offset'. data carries the row image for ALL
# DML (Maxwell deletes ship the deleted row in `data`, unlike Debezium's
# `before`); old carries only the CHANGED prior values on update.
MAXWELL_SCHEMA = (
    "database string, `table` string, type string, "
    "ts bigint, xid bigint, position string, "
    "data map<string,string>, old map<string,string>"
)

_MAXWELL_TYPES = {
    "insert": "insert",
    "bootstrap-insert": "insert",  # initial load = insert, like Debezium r
    "update": "update",
    "delete": "delete",
}


def binlog_to_wal_position(position: Column) -> Column:
    """Maxwell binlog coordinate ('file.NNNNNN:offset') -> one orderable
    numeric position, composed exactly like lsn_to_wal_position: file
    sequence in the high 32 bits, offset in the low 32. Binlog files
    rotate at ~1 GiB (< 2^32), so the composition is collision-free and
    order-preserving across rotations.

    try_cast, not cast: a position that is not 'file:offset' (a
    heartbeat line, junk the auto classifier routed here because it
    carried top-level type+position) must yield NULL — under Spark 4's
    default ANSI mode a plain CAST('') would throw and one poison line
    would fail the whole foreachBatch epoch. Same defensive posture as
    lsn_to_wal_position's F.conv."""
    file_seq = F.regexp_extract(
        F.split_part(position, F.lit(":"), F.lit(1)), r"(\d+)$", 1
    ).try_cast("bigint")
    offset = F.split_part(position, F.lit(":"), F.lit(2)).try_cast("bigint")
    # MySQL binlog offsets are 64-bit: one transaction larger than
    # max_binlog_size can push a file past 4 GiB, and such an offset
    # would OR into the file-sequence bits and corrupt ordering
    # SILENTLY. Yield NULL for out-of-range offsets instead (the same
    # posture as try_cast on malformed positions) so the row routes to
    # the DLQ split rather than mis-sorting the stream (r15 advice #2).
    # The file sequence gets the symmetric guard (r16 advice): a
    # sequence >= 2^31 would shiftleft into the sign bit and produce
    # negative/colliding positions just as silently.
    offset = F.when(offset < F.lit(1 << 32), offset)
    file_seq = F.when(file_seq < F.lit(1 << 31), file_seq)
    return F.shiftleft(file_seq, 32).bitwiseOR(offset).alias("wal_position")


def decode_maxwell(
    df: DataFrame,
    value_col: str = "value",
    host: str = "unknown",
    uuid: Column | None = None,
) -> DataFrame:
    """Maxwell envelopes -> canonical Event envelope.

    type insert/bootstrap-insert -> insert, update -> update, delete ->
    delete; DDL / bootstrap markers keep their lowered type so filter_dml
    (T1) drops them like every other dialect's non-DML records. The
    payload is always `data` (Maxwell's delete image lives there); the
    partial `old` image has no slot in the canonical envelope — the
    reference's Event carries one Columns map (event/event.go:33) — so
    update consumers needing prior values read the dialect directly.
    Event time is the envelope's UNIX-seconds ts; the binlog coordinate
    becomes the numeric WAL position (see binlog_to_wal_position).
    Malformed JSON yields NULL fields -> DLQ split (T5); `uuid` defaults
    to a fresh v4 per event, pass a deterministic expression for
    oracle-compared outputs."""
    stamp = uuid if uuid is not None else F.expr("uuid()")
    tagged = df.withColumn(
        "__e",
        F.explode_outer(
            _maxwell_event(F.col(value_col).cast("string"), host)
        ),
    )
    return _project_envelope(tagged, stamp)


def _maxwell_event(value: Column, host: str) -> Column:
    """array<envelope struct> (1 element), parse bound via _parsed_events."""
    return _parsed_events(
        value, MAXWELL_SCHEMA, lambda p: _maxwell_struct(p, host)
    )


def _maxwell_struct(p: Column, host: str) -> Column:
    mapped = None
    for t, name in _MAXWELL_TYPES.items():
        mapped = (
            F.when(p["type"] == t, name)
            if mapped is None
            else mapped.when(p["type"] == t, name)
        )
    action = mapped.otherwise(F.lower(p["type"]))
    return F.struct(
        F.lit(host).alias("host"),
        F.coalesce(p["database"], F.lit("unknown")).alias("database"),
        p["table"].alias("table"),
        action.alias("action"),
        binlog_to_wal_position(p["position"]).alias("wal_position"),
        F.timestamp_seconds(p["ts"]).alias("ts"),
        p["type"].isNotNull().alias("uuid_ok"),
        p["data"].alias("columns"),
    )


def classify_cdc_dialect(value: Column) -> Column:
    """Per-line dialect classification on discriminating envelope keys —
    `action` is wal2json v2's mandatory field, `payload.op` Debezium's,
    `isDdl` Canal's (probed BEFORE Maxwell — both carry `type`, only
    Canal carries `isDdl`), `type`+`position` Maxwell's; anything else (including malformed
    JSON — get_json_object yields NULL) is 'unknown'. Pure JSON-path
    probes, scan-speed, no full parse."""
    return (
        F.when(F.get_json_object(value, "$.action").isNotNull(), "wal2json")
        .when(F.get_json_object(value, "$.payload.op").isNotNull(), "debezium")
        .when(F.get_json_object(value, "$.isDdl").isNotNull(), "canal")
        .when(
            F.get_json_object(value, "$.type").isNotNull()
            & F.get_json_object(value, "$.position").isNotNull(),
            "maxwell",
        )
        .otherwise("unknown")
    )


def decode_cdc_auto(
    df: DataFrame,
    value_col: str = "value",
    host: str = "unknown",
    database: str = "unknown",
    uuid: Column | None = None,
) -> DataFrame:
    """MIXED-feed decode: classify each line, route it through its
    dialect's decoder, return one canonical envelope frame with a
    `dialect` provenance column. A real relay rarely gets to assume one
    clean dialect — a topic carries a Debezium backfill next to the
    wal2json live feed, or an operator points the wrong feed at the
    pipeline; this is the ingest form that absorbs that without config.

    Shape (r16): ONE pass over the feed — classify each line once, then a
    CaseWhen dispatch whose branches are the UNCHANGED per-dialect
    envelope builders (the same struct expressions the standalone
    decoders project from, so their golden fixtures carry over
    verbatim). CaseWhen evaluates only the matched branch per row, so
    each line pays exactly one full envelope parse; Canal's per-message
    fan-out rides the same explode as an array of envelope elements. The
    pre-r16 shape — five filtered branches unioned — re-scanned the
    whole feed once per dialect and re-evaluated the classifier in every
    branch: 5 passes over a 100 TB feed where one suffices (measured
    8.8 s -> see OPTIMIZATION_r16.md). 'unknown' lines become envelope
    rows with NULL action/uuid, so validate_split (T5) routes them to
    the DLQ instead of dropping them silently — the reference's
    decode-failure accounting."""
    val = F.col(value_col).cast("string")
    unknown_ev = F.struct(
        F.lit(host).alias("host"),
        F.lit(database).alias("database"),
        F.lit(None).cast("string").alias("table"),
        F.lit(None).cast("string").alias("action"),
        F.lit(None).cast("bigint").alias("wal_position"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(False).alias("uuid_ok"),  # uuid-less -> DLQ (T5)
        F.lit(None).cast("map<string,string>").alias("columns"),
    )
    d = F.col("__dialect")
    # every builder already yields array<envelope> (1-element for the
    # row-per-message dialects, per-data-element for canal)
    events = (
        F.when(d == "wal2json", _wal2json_event(val, host, database))
        .when(d == "debezium", _debezium_event(val, None))
        .when(d == "maxwell", _maxwell_event(val, host))
        .when(d == "canal", _canal_events(val, host))
        .otherwise(F.array(unknown_ev))
    )
    stamp = uuid if uuid is not None else F.expr("uuid()")
    # explode_outer for the same InferFiltersFromGenerate reason as
    # decode_canal: every branch yields >= 1 element, and plain explode
    # makes the optimizer clone the whole dispatch CaseWhen into a
    # size() > 0 Filter (measured 31 s vs 9 s on the sf0.1 mixed feed)
    tagged = df.withColumn(
        "__dialect", classify_cdc_dialect(val)
    ).withColumn("__e", F.explode_outer(events))
    return _project_envelope(
        tagged, stamp, extra=[F.col("__dialect").alias("dialect")]
    )


# Canal (Alibaba) flat-message envelope: one JSON object per BATCH of
# row changes — `data` is an ARRAY of row images (the one dialect here
# where a single message fans out to N events), `old` the index-aligned
# partial prior images on update, `es` the MySQL execute time (ms), `ts`
# canal's own processing time, `id` the canal batch id (the flat message
# carries no binlog coordinate — the batch id is the orderable position
# analogue), `isDdl` + an uppercase statement `type` for DDL.
CANAL_SCHEMA = (
    "data array<map<string,string>>, database string, es bigint, "
    "id bigint, isDdl boolean, old array<map<string,string>>, "
    "pkNames array<string>, `table` string, ts bigint, type string"
)

_CANAL_TYPES = {"INSERT": "insert", "UPDATE": "update", "DELETE": "delete"}


def decode_canal(
    df: DataFrame,
    value_col: str = "value",
    host: str = "unknown",
    uuid: Column | None = None,
) -> DataFrame:
    """Canal flat messages -> canonical Event envelope, ONE ROW PER
    ELEMENT of `data` (explode_outer, so a DDL message with data=null
    still yields its marker row for filter_dml to drop). INSERT/UPDATE/
    DELETE map to the closed enum — DELETE's image rides `data` like
    Maxwell's; isDdl messages keep their lowered statement type as the
    non-DML marker. Event time is `es` (the source execute time, ms);
    the batch id is the orderable position (the flat message has no
    binlog coordinate). `uuid` defaults to a fresh v4 PER EXPLODED
    EVENT; a deterministic expression shared by a multi-row batch would
    collide — fixtures keep one row per message when hashing."""
    stamp = uuid if uuid is not None else F.expr("uuid()")
    # explode_outer, NOT explode: the array is never empty (the marker
    # branch guarantees >= 1 element) so the two are semantically
    # identical here, but plain explode triggers InferFiltersFromGenerate,
    # which duplicates the ENTIRE envelope-parse expression into a
    # size(...) > 0 Filter below the Generate — measured 3x on the mixed
    # decode (31 s vs 9 s, OPTIMIZATION_r16.md).
    tagged = df.withColumn(
        "__e",
        F.explode_outer(_canal_events(F.col(value_col).cast("string"), host)),
    )
    return _project_envelope(tagged, stamp)


def _canal_events(value: Column, host: str) -> Column:
    """array<envelope struct> — the one dialect where a single message
    fans out: one element per `data` row image; a DDL/marker message
    (data null or empty) still yields its single marker element, exactly
    the old explode_outer semantics. Parse bound once via _parsed_events,
    the per-message fan-out nested inside and flattened."""
    return F.flatten(
        _parsed_events(value, CANAL_SCHEMA, lambda p: _canal_inner(p, host))
    )


def _canal_inner(p: Column, host: str) -> Column:
    mapped = None
    for t, name in _CANAL_TYPES.items():
        mapped = (
            F.when(p["type"] == t, name)
            if mapped is None
            else mapped.when(p["type"] == t, name)
        )
    action = F.when(p["isDdl"], F.lower(p["type"])).otherwise(
        mapped.otherwise(F.lower(p["type"]))
    )

    def ev(columns: Column) -> Column:
        return F.struct(
            F.lit(host).alias("host"),
            F.coalesce(p["database"], F.lit("unknown")).alias("database"),
            p["table"].alias("table"),
            action.alias("action"),
            p["id"].alias("wal_position"),
            F.timestamp_millis(p["es"]).alias("ts"),
            p["type"].isNotNull().alias("uuid_ok"),
            columns.alias("columns"),
        )

    return F.when(
        F.size(p["data"]) > 0, F.transform(p["data"], ev)
    ).otherwise(F.array(ev(F.lit(None).cast("map<string,string>"))))
