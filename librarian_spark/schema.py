"""Schema system: librarian's Parquet-type vocabulary ↔ Spark StructType,
plus the DDL → schema generator.

The reference declares every column's physical+logical Parquet type in YAML
(`/root/reference/internal/parquet/schema.go:12-22`) and ships a one-shot
``schema generate`` utility parsing a CREATE TABLE statement
(`internal/cmd/schema/generate.go:28-54`, `internal/parquet/sql.go:10-61`).

SQL → Parquet mapping preserved here (`internal/parquet/sql.go:15-52`):
INTEGER is deliberately widened to INT64 ("Encoding an INT32 as an INT64 ensures
the parquet schema works"), VARCHAR/TEXT → BYTE_ARRAY/UTF8, TIMESTAMP →
INT64/TIMESTAMP_MILLIS, DATE → INT32/DATE, DECIMAL(p,s) → INT64/DECIMAL.
NOT NULL → REQUIRED (`internal/parquet/sql.go:54-58`).

Unlike the reference (flat schemas only), Spark gives us nested/array/map types
natively — needed for embeddings (`array<float>`) and CDC envelopes.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

from librarian_spark.config import FieldConfig

__all__ = [
    "field_to_struct_field",
    "fields_to_struct_type",
    "struct_type_to_fields",
    "ddl_to_fields",
    "fields_to_yaml_dict",
]

_DEC_DEFAULT_PRECISION = 18


def field_to_struct_field(f: FieldConfig) -> T.StructField:
    """One librarian YAML field → Spark StructField."""
    ptype = (f.type or "").upper()
    ctype = (f.converted_type or "").upper()
    nullable = (f.repetition_type or "OPTIONAL").upper() != "REQUIRED"

    dt: T.DataType
    if ctype == "DECIMAL":
        # the reference conflates precision/length across its example configs
        # (property-sales uses `length`, the s3 variant `precision`) — accept both.
        precision = f.precision or f.length or _DEC_DEFAULT_PRECISION
        dt = T.DecimalType(precision, f.scale or 0)
    elif ctype == "UTF8":
        dt = T.StringType()
    elif ctype == "DATE":
        dt = T.DateType()
    elif ctype in ("TIMESTAMP_MILLIS", "TIMESTAMP_MICROS"):
        dt = T.TimestampType()
    elif ctype in ("TIME_MILLIS", "TIME_MICROS"):
        dt = T.LongType()  # Spark has no TimeType pre-4.1-ANSI; carry millis/micros
    elif ptype == "INT64":
        dt = T.LongType()
    elif ptype == "INT32":
        dt = T.IntegerType()
    elif ptype == "DOUBLE":
        dt = T.DoubleType()
    elif ptype == "FLOAT":
        dt = T.FloatType()
    elif ptype == "BOOLEAN":
        dt = T.BooleanType()
    elif ptype == "BYTE_ARRAY":
        dt = T.BinaryType()
    else:
        raise ValueError(f"unsupported parquet type: {f.type!r}/{f.converted_type!r}")
    return T.StructField(f.name, dt, nullable)


def fields_to_struct_type(fields: list[FieldConfig]) -> T.StructType:
    return T.StructType([field_to_struct_field(f) for f in fields])


def struct_type_to_fields(schema: T.StructType) -> list[FieldConfig]:
    """Spark StructType → librarian YAML field list (round-trip for config emit)."""
    out: list[FieldConfig] = []
    for sf in schema.fields:
        rep = "OPTIONAL" if sf.nullable else "REQUIRED"
        dt = sf.dataType
        if isinstance(dt, T.DecimalType):
            out.append(
                FieldConfig(
                    sf.name,
                    "INT64",
                    converted_type="DECIMAL",
                    repetition_type=rep,
                    scale=dt.scale,
                    precision=dt.precision,
                )
            )
        elif isinstance(dt, T.StringType):
            out.append(
                FieldConfig(sf.name, "BYTE_ARRAY", converted_type="UTF8", repetition_type=rep)
            )
        elif isinstance(dt, T.DateType):
            out.append(
                FieldConfig(sf.name, "INT32", converted_type="DATE", repetition_type=rep)
            )
        elif isinstance(dt, T.TimestampType):
            out.append(
                FieldConfig(
                    sf.name, "INT64", converted_type="TIMESTAMP_MILLIS", repetition_type=rep
                )
            )
        elif isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            # match the reference's deliberate int widening (`internal/parquet/sql.go:16-21`)
            out.append(FieldConfig(sf.name, "INT64", repetition_type=rep))
        elif isinstance(dt, T.DoubleType):
            out.append(FieldConfig(sf.name, "DOUBLE", repetition_type=rep))
        elif isinstance(dt, T.FloatType):
            out.append(FieldConfig(sf.name, "FLOAT", repetition_type=rep))
        elif isinstance(dt, T.BooleanType):
            out.append(FieldConfig(sf.name, "BOOLEAN", repetition_type=rep))
        elif isinstance(dt, T.BinaryType):
            out.append(FieldConfig(sf.name, "BYTE_ARRAY", repetition_type=rep))
        else:
            raise ValueError(f"no librarian mapping for Spark type {dt.simpleString()}")
    return out


# --- DDL → schema (the reference's `schema generate`) -------------------------

# The type may be multi-word (DOUBLE PRECISION, TIMESTAMP WITH TIME ZONE); the
# non-greedy extension stops growing once the remainder starts with a
# constraint keyword — without that anchor the non-greedy match eats only the
# type's first letter and every column degrades to the string fallback.
_COL_RE = re.compile(
    r"^\s*\"?(?P<name>[A-Za-z_][A-Za-z0-9_]*)\"?\s+"
    r"(?P<type>[A-Za-z][A-Za-z0-9_]*(?:\s+[A-Za-z]+)*?)"
    r"(?:\s*\(\s*(?P<p>\d+)\s*(?:,\s*(?P<s>\d+))?\s*\))?"
    r"(?P<rest>\s+(?:NOT|NULL|DEFAULT|PRIMARY|UNIQUE|CHECK|REFERENCES|"
    r"GENERATED|CONSTRAINT)\b.*)?\s*$",
    re.IGNORECASE,
)

_SQL_TO_SPARK = {
    "INTEGER": T.LongType(),  # widened, per reference semantics
    "INT": T.LongType(),
    "INT4": T.LongType(),
    "SMALLINT": T.LongType(),
    "SERIAL": T.LongType(),
    "BIGSERIAL": T.LongType(),
    "BIGINT": T.LongType(),
    "INT8": T.LongType(),
    "TEXT": T.StringType(),
    "VARCHAR": T.StringType(),
    "CHARACTER VARYING": T.StringType(),
    "CHAR": T.StringType(),
    "TIMESTAMP": T.TimestampType(),
    "TIMESTAMPTZ": T.TimestampType(),
    "TIMESTAMP WITH TIME ZONE": T.TimestampType(),
    "TIMESTAMP WITHOUT TIME ZONE": T.TimestampType(),
    "DATE": T.DateType(),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "DOUBLE PRECISION": T.DoubleType(),
    "FLOAT8": T.DoubleType(),
    "REAL": T.FloatType(),
    "BYTEA": T.BinaryType(),
}

_TABLE_KEYWORDS = {"PRIMARY", "FOREIGN", "UNIQUE", "CONSTRAINT", "CHECK", "KEY"}


def ddl_to_struct_type(ddl: str) -> T.StructType:
    """Parse a CREATE TABLE statement into a StructType.

    Reference behavior (`internal/cmd/schema/generate.go:28-54`): parse DDL, map each
    column via the SQL→Parquet table, NOT NULL → REQUIRED. We parse the common
    Postgres DDL shape with a small grammar (column lines between the outer parens).
    """
    m = re.search(r"\((?P<body>.*)\)\s*;?\s*$", ddl, re.S)
    if not m:
        raise ValueError("not a CREATE TABLE statement")
    body = m.group("body")
    # split on commas not inside parens
    cols, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        cols.append("".join(cur))

    out: list[T.StructField] = []
    for colsrc in cols:
        cm = _COL_RE.match(colsrc.strip())
        if not cm:
            continue
        name = cm.group("name")
        if name.upper() in _TABLE_KEYWORDS:
            continue
        typ = cm.group("type").strip().upper()
        rest = (cm.group("rest") or "").upper()
        nullable = "NOT NULL" not in rest and "PRIMARY KEY" not in rest
        if typ in ("DECIMAL", "NUMERIC"):
            p = int(cm.group("p") or _DEC_DEFAULT_PRECISION)
            s = int(cm.group("s") or 0)
            dt: T.DataType = T.DecimalType(p, s)
        else:
            dt = _SQL_TO_SPARK.get(typ)
            if dt is None:
                dt = _SQL_TO_SPARK.get(typ.split()[0], T.StringType())
        out.append(T.StructField(name, dt, nullable))
    if not out:
        raise ValueError("no columns parsed from DDL")
    return T.StructType(out)


def ddl_to_fields(ddl: str) -> list[FieldConfig]:
    return struct_type_to_fields(ddl_to_struct_type(ddl))


def fields_to_yaml_dict(fields: list[FieldConfig]) -> list[dict]:
    """Emit the YAML schema shape the reference's `schema generate` prints
    (`internal/config/config.go:110-127`)."""
    out = []
    for f in fields:
        d: dict = {"name": f.name, "type": f.type}
        if f.converted_type:
            d["converted_type"] = f.converted_type
        if f.repetition_type:
            d["repetition_type"] = f.repetition_type
        if f.scale is not None:
            d["scale"] = f.scale
        if f.precision is not None:
            d["precision"] = f.precision
        if f.length is not None:
            d["length"] = f.length
        out.append(d)
    return out
