"""Engine type registry: Spark ``DataType`` ⇄ SQL type names — the
rebuild of the reference's Flink-TypeInformation ⇄ java.sql.Types
mapping (jdbc/JDBCTypeUtil.kt:26-87, SURVEY.md §2.6 F-TYPE).

The reference maps 13 scalar types + ARRAY in both directions and uses
the SQL side for sink-schema validation and DDL; same here — sinks use
``ddl_for_schema`` to create targets and ``sql_type_for`` to validate
declared target columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

# JDBCTypeUtil.kt:26-45 (typeInformationToSqlType) re-expressed over
# Spark's type system.
_SPARK_TO_SQL: dict[type[T.DataType], str] = {
    T.BooleanType: "BOOLEAN",
    T.ByteType: "TINYINT",
    T.ShortType: "SMALLINT",
    T.IntegerType: "INTEGER",
    T.LongType: "BIGINT",
    T.FloatType: "REAL",
    T.DoubleType: "DOUBLE PRECISION",
    T.StringType: "VARCHAR",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
    T.BinaryType: "VARBINARY",
}

# JDBCTypeUtil.kt:47-66 (sqlTypeToTypeInformation), inverse direction —
# SQL synonyms included the way JDBC drivers report them.
_SQL_TO_SPARK: dict[str, T.DataType] = {
    "BOOLEAN": T.BooleanType(),
    "BIT": T.BooleanType(),
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INTEGER": T.IntegerType(),
    "INT": T.IntegerType(),
    "BIGINT": T.LongType(),
    "REAL": T.FloatType(),
    "FLOAT": T.DoubleType(),
    "DOUBLE": T.DoubleType(),
    "DOUBLE PRECISION": T.DoubleType(),
    "CHAR": T.StringType(),
    "VARCHAR": T.StringType(),
    "TEXT": T.StringType(),
    "DATE": T.DateType(),
    "TIME": T.TimestampType(),
    "TIMESTAMP": T.TimestampType(),
    "BINARY": T.BinaryType(),
    "VARBINARY": T.BinaryType(),
    "BLOB": T.BinaryType(),
}


class UnsupportedType(Exception):
    pass


def sql_type_for(dt: T.DataType) -> str:
    """Spark type → SQL type name (JDBCTypeUtil.getTypeName analogue)."""
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"{sql_type_for(dt.elementType)} ARRAY"
    try:
        return _SPARK_TO_SQL[type(dt)]
    except KeyError:
        raise UnsupportedType(f"no SQL mapping for Spark type {dt}") from None


def spark_type_for(sql_name: str) -> T.DataType:
    """SQL type name → Spark type (sqlTypeToTypeInformation analogue)."""
    name = sql_name.strip().upper()
    if name.endswith(" ARRAY"):
        return T.ArrayType(spark_type_for(name[: -len(" ARRAY")]))
    if name.startswith("DECIMAL"):
        if "(" in name:
            p, s = name[name.index("(") + 1 : name.index(")")].split(",")
            return T.DecimalType(int(p), int(s))
        return T.DecimalType(10, 0)
    try:
        return _SQL_TO_SPARK[name]
    except KeyError:
        raise UnsupportedType(f"no Spark mapping for SQL type {sql_name}") from None


def ddl_for_schema(table: str, schema: T.StructType, primary_key: str | None = None) -> str:
    """CREATE TABLE DDL for a sink target from its declared StructType."""
    cols = []
    for f in schema:
        col = f"{f.name} {sql_type_for(f.dataType)}"
        if f.name == primary_key:
            col += " PRIMARY KEY"
        elif not f.nullable:
            col += " NOT NULL"
        cols.append(col)
    return f"CREATE TABLE IF NOT EXISTS {table} (\n  " + ",\n  ".join(cols) + "\n)"
