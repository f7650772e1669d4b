"""The Event data model, as a Spark schema.

Reference parity: ``event/event.go:24-34`` defines the single fundamental
record — Host/Database/Table/Action/WALPosition/Timestamp/UUID plus a
dynamic ``Columns map[string]interface{}``. We keep the envelope as a fixed
StructType and transport the dynamic payload as ``map<string,string>``
(lossless, schema-on-read), with `from_json` projection into per-table
StructTypes when a schema is registered (the Spark analogue of the
reference's RelationSet cache, ``source/postgres/postgres.go:33,303-305``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Closed action enum — event/event.go:8-21.
ACTION_INSERT = "insert"
ACTION_UPDATE = "update"
ACTION_DELETE = "delete"
ACTIONS = (ACTION_INSERT, ACTION_UPDATE, ACTION_DELETE)

# The wire-format envelope (README.md:12-25 of the reference; field names
# kept lowercase_snake for Spark ergonomics, JSON aliases in CDC_JSON_SCHEMA).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("database", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("action", T.StringType(), False),
        T.StructField("wal_position", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("uuid", T.StringType(), False),
        T.StructField("columns", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Exact JSON wire-format field names (sink/kafka/passthrough.go:25 emits the
# Go struct verbatim) for from_json() on raw Kafka/file payloads.
CDC_JSON_SCHEMA = T.StructType(
    [
        T.StructField("Host", T.StringType(), True),
        T.StructField("Database", T.StringType(), True),
        T.StructField("Table", T.StringType(), True),
        T.StructField("Action", T.StringType(), True),
        T.StructField("WALPosition", T.LongType(), True),
        T.StructField("Timestamp", T.TimestampType(), True),
        T.StructField("UUID", T.StringType(), True),
        T.StructField("Columns", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# PostgreSQL type -> Spark type, mirroring the whitelist coercion at
# source/postgres/postgres.go:405-425 (plus the coercions it applies:
# bytea -> string, inet/cidr -> string). Unlisted types are *dropped*
# from the projection, matching the reference's logged-drop behavior.
PG_TO_SPARK: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "int2": T.ShortType(),
    "smallint": T.ShortType(),
    "int4": T.IntegerType(),
    "integer": T.IntegerType(),
    "int8": T.LongType(),
    "bigint": T.LongType(),
    "float4": T.FloatType(),
    "real": T.FloatType(),
    "float8": T.DoubleType(),
    "double precision": T.DoubleType(),
    "text": T.StringType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "name": T.StringType(),
    "timestamp": T.TimestampType(),
    "timestamptz": T.TimestampType(),
    "date": T.DateType(),
    # coercions the reference applies explicitly
    "bytea": T.StringType(),  # postgres.go:414-416 ([]byte -> string)
    "inet": T.StringType(),  # postgres.go:418-419 (*net.IPNet -> string)
    "cidr": T.StringType(),
}


def pg_type_to_spark(pg_type: str) -> T.DataType | None:
    """Spark type for a PG type name, or None if unsupported (drop it)."""
    return PG_TO_SPARK.get(pg_type.lower())


def relation_to_struct(columns: list[tuple[str, str]]) -> T.StructType:
    """Build a per-table StructType from (name, pg_type) pairs, dropping
    unsupported types exactly like generateEvent does (postgres.go:421-423).
    """
    fields = []
    for name, pg_type in columns:
        spark_type = pg_type_to_spark(pg_type)
        if spark_type is not None:
            fields.append(T.StructField(name, spark_type, True))
    return T.StructType(fields)


class RelationRegistry:
    """Driver-side schema cache — the Spark analogue of the reference's
    RelationSet (source/postgres/postgres.go:33,303-309): per-table column
    metadata registered as it becomes known, looked up at decode time.
    Unknown relations error exactly like generateEvent's lookup
    (postgres.go:380-384)."""

    def __init__(self) -> None:
        self._relations: dict[str, T.StructType] = {}

    def register(self, table: str, columns: list[tuple[str, str]]) -> T.StructType:
        """Cache (or replace — relations are re-sent on schema change) the
        relation for `table`. Unsupported PG types are dropped here, once,
        not per-row."""
        struct = relation_to_struct(columns)
        self._relations[table] = struct
        return struct

    def struct(self, table: str) -> T.StructType:
        if table not in self._relations:
            raise KeyError(
                f"unknown relation {table!r} (no Relation message seen; "
                "postgres.go:380-384)"
            )
        return self._relations[table]

    def tables(self) -> list[str]:
        return sorted(self._relations)

    def __contains__(self, table: str) -> bool:
        return table in self._relations
