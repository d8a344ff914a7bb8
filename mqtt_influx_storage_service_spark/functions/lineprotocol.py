"""InfluxDB line-protocol encode/decode as pure built-in expressions.

The reference's write path emits InfluxDB points (``influx_service.py:
183-200`` — the python client serializes them to line protocol on the
wire: ``measurement[,tag=v...] field=v[,f2=v2] [timestamp-ns]``).
This module gives the Spark engine the same wire format as first-class
column expressions: :func:`to_line_protocol` renders a typed DataFrame
row to one line, :func:`parse_line_protocol` parses lines back into
(measurement, tags map, fields map, time_ns).

Everything is built-in ``pyspark.sql.functions`` — concat/regexp/
split/transform/map_from_arrays — so encode and decode live inside
whole-stage codegen with zero Python in the hot path; at 100 TB a
line-protocol export/import is a single narrow map over the scan.

Known parser limitation (documented, test-pinned): escaped double
quotes (``\\"``) inside string field values are not supported — the
quote-aware comma split counts quote parity. Everything else in the
v1 spec round-trips: escaped commas/spaces/equals in measurements,
tag keys/values and field keys; int (``i`` suffix), float, boolean
and quoted string field values; optional nanosecond timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "to_line_protocol",
    "parse_line_protocol",
    "field_as_double",
    "field_as_long",
    "field_as_string",
    "field_as_boolean",
]


# -- escaping --------------------------------------------------------------

def _esc(col: Column, chars: str) -> Column:
    """Backslash-escape each char of ``chars`` (and backslash itself)."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    for ch in chars:
        out = F.replace(out, F.lit(ch), F.lit("\\" + ch))
    return out


def _unesc(col: Column) -> Column:
    """Drop one level of backslash escaping: ``\\x`` -> ``x``."""
    return F.regexp_replace(col, r"\\(.)", "$1")


def _fmt_field_value(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return F.concat(col.cast("string"), F.lit("i"))
    if isinstance(dtype, T.BooleanType):
        return col.cast("string")  # 'true' / 'false'
    if isinstance(dtype, T.StringType):
        esc = F.replace(
            F.replace(col, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
        )
        return F.concat(F.lit('"'), esc, F.lit('"'))
    return col.cast("string")  # float/double/decimal


def to_line_protocol(
    df: DataFrame,
    measurement: str,
    tags: list[str],
    fields: list[str],
    time_ns: str | None = None,
) -> Column:
    """Render each row to one line-protocol line.

    ``measurement``/``tags``/``fields``/``time_ns`` name columns of
    ``df`` (``measurement`` and tag values are cast to string; field
    formatting follows each column's Spark type). NULL tags and NULL
    fields are omitted from the line, per the v1 writer behavior. Tags
    are emitted in sorted-key order (the canonical form InfluxDB
    recommends so series keys compare bytewise).
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    m = _esc(F.col(measurement).cast("string"), ", ")
    parts = [m]
    for t in sorted(tags):
        kv = F.concat(
            F.lit(","),
            F.lit(t),  # static key: assumed already protocol-safe
            F.lit("="),
            _esc(F.col(t).cast("string"), ",= "),
        )
        parts.append(F.when(F.col(t).isNotNull(), kv).otherwise(F.lit("")))
    head = F.concat(*parts)
    fps = [
        F.when(
            F.col(fld).isNotNull(),
            F.concat(
                F.lit(fld), F.lit("="), _fmt_field_value(F.col(fld), schema[fld])
            ),
        )
        for fld in fields
    ]
    body = F.concat_ws(",", *fps)  # concat_ws skips NULL parts
    line = F.concat(head, F.lit(" "), body)
    if time_ns is not None:
        line = F.concat(line, F.lit(" "), F.col(time_ns).cast("string"))
    return line


# -- parsing ---------------------------------------------------------------

# head = measurement[,tags] up to the first unescaped space; fields =
# the rest minus an optional trailing integer timestamp.
_LINE_RE = r"^((?:[^ \\]|\\.)+) (.*?)(?: (\d+))?$"
# split commas with an even number of quotes ahead (i.e. not inside a
# quoted string value) — the documented no-escaped-quotes limitation
_FIELD_SPLIT = r',(?=(?:[^"]*"[^"]*")*[^"]*$)'
_TAG_SPLIT = r"(?<!\\),"
_KV_RE = r"^((?:[^=\\]|\\.)+)=(.*)$"


def parse_line_protocol(line: Column) -> Column:
    """Parse one line into a struct
    ``(measurement string, tags map<string,string>,
    fields map<string,string>, time_ns bigint)``.

    Field values stay raw protocol strings in the map (``42i``,
    ``6.55``, ``"text"``, ``true``); use the ``field_as_*`` accessors
    to pull them out typed. A malformed line yields a struct with NULL
    measurement — callers route those to quarantine exactly like the
    ingest path's bad-payload branch.
    """
    head = F.regexp_extract(line, _LINE_RE, 1)
    fields_seg = F.regexp_extract(line, _LINE_RE, 2)
    ts_seg = F.regexp_extract(line, _LINE_RE, 3)

    head_parts = F.split(head, _TAG_SPLIT)
    measurement = _unesc(head_parts.getItem(0))
    tag_parts = F.slice(head_parts, 2, F.greatest(F.size(head_parts) - 1, F.lit(0)))
    tag_keys = F.transform(
        tag_parts, lambda p: _unesc(F.regexp_extract(p, _KV_RE, 1))
    )
    tag_vals = F.transform(
        tag_parts, lambda p: _unesc(F.regexp_extract(p, _KV_RE, 2))
    )

    field_parts = F.split(fields_seg, _FIELD_SPLIT)
    f_keys = F.transform(
        field_parts, lambda p: _unesc(F.regexp_extract(p, _KV_RE, 1))
    )
    f_vals = F.transform(field_parts, lambda p: F.regexp_extract(p, _KV_RE, 2))

    ok = F.regexp_like(line, F.lit(_LINE_RE)) & (F.length(head) > 0)
    return F.struct(
        F.when(ok, measurement).alias("measurement"),
        F.when(ok, F.map_from_arrays(tag_keys, tag_vals)).alias("tags"),
        F.when(ok, F.map_from_arrays(f_keys, f_vals)).alias("fields"),
        F.when(ok & (F.length(ts_seg) > 0), ts_seg.cast("long")).alias(
            "time_ns"
        ),
    )


def _raw(fields: Column, name: str) -> Column:
    return F.element_at(fields, name)


def field_as_double(fields: Column, name: str) -> Column:
    return _raw(fields, name).cast("double")


def field_as_long(fields: Column, name: str) -> Column:
    return F.regexp_replace(_raw(fields, name), r"i$", "").cast("long")


def field_as_string(fields: Column, name: str) -> Column:
    v = _raw(fields, name)
    inner = F.regexp_extract(v, r'^"(.*)"$', 1)
    return F.replace(
        F.replace(inner, F.lit('\\"'), F.lit('"')),
        F.lit("\\\\"),
        F.lit("\\"),
    )


def field_as_boolean(fields: Column, name: str) -> Column:
    return _raw(fields, name).cast("boolean")
