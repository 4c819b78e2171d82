"""PostgreSQL-compatibility expression helpers.

The reference's core transform builds an md5 surrogate key over a 17-argument
``concat(col, '-', col, ...)`` (reference ``models/core_texi.sql:10-31``) and
computes trip durations via ``EXTRACT(EPOCH FROM ts2 - ts1)``
(``core_texi.sql:86-101``). Reproducing those *byte-exactly* on Spark needs
three PG behaviors that Spark's builtins don't give directly:

1. ``concat()`` NULL handling — PG treats NULL args as ``''`` (keeping the
   surrounding separators: ``a--c``); Spark ``concat`` returns NULL if any arg
   is NULL, and ``concat_ws`` *skips* NULLs (dropping the separator).
2. Per-type text rendering — PG renders float8 with shortest-round-trip
   notation (``1`` not ``1.0``); Spark's string cast yields ``1.0`` and
   scientific notation differences.
3. ``EXTRACT(EPOCH ...)`` keeps fractional seconds; Spark ``unix_timestamp()``
   truncates to whole seconds.

Everything here is a *composition of built-in Catalyst expressions* — no
Python UDFs — so the helpers stay inside whole-stage codegen and cost nothing
at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pg_text(col: Column | str, dtype: T.DataType | None = None) -> Column:
    """Render a column as PostgreSQL would render it in a text context.

    * integers / strings / date — same rendering both engines, plain cast.
    * double — PG prints integral float8 without a fractional part
      (``1`` not ``1.0``) and uses shortest round-trip decimals otherwise.
      We emit the integral case exactly; non-integral values use Spark's
      rendering, which agrees with PG for plain decimals (``1.5``,
      ``-73.99``); scientific-notation extremes (|x| >= 1e15) may diverge
      and are documented as out of the compat envelope.
    * timestamp — both engines render ``YYYY-MM-DD HH:MM:SS[.ffffff]`` with
      the fractional part omitted when zero; plain cast suffices under the
      session UTC timezone.
    * boolean — both render ``true`` / ``false``.

    ``dtype`` (from ``df.schema``) picks the rendering; when None the column
    must already be a string.
    """
    c = F.col(col) if isinstance(col, str) else col
    if dtype is None or isinstance(dtype, T.StringType):
        return c
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        as_long = c.cast("bigint")
        integral = c.isNotNull() & (c == as_long.cast("double")) & (F.abs(c) < F.lit(1e15))
        return F.when(integral, as_long.cast("string")).otherwise(c.cast("string"))
    if isinstance(dtype, T.BooleanType):
        return F.when(c, F.lit("true")).when(~c, F.lit("false"))
    return c.cast("string")


def pg_concat_sep(cols: list[Column], sep: str = "-") -> Column:
    """PG ``concat(a, '-', b, '-', ...)``: NULL args render as ``''`` but the
    literal separators are always kept (``a--c`` for a NULL middle arg).

    ``cols`` must already be text-rendered (see :func:`pg_text`).
    """
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(sep))
        parts.append(F.coalesce(c, F.lit("")))
    return F.concat(*parts)


def surrogate_key(df_schema: T.StructType, cols: list[str], sep: str = "-") -> Column:
    """md5 surrogate key over PG-rendered, ``sep``-joined business columns —
    the reference's ``unique_id`` (``core_texi.sql:10-31``). Byte-compatible
    with PG for the compat envelope described in :func:`pg_text`.
    """
    fields = {f.name.lower(): f.dataType for f in df_schema.fields}
    rendered = [pg_text(F.col(c), fields.get(c.lower())) for c in cols]
    return F.md5(pg_concat_sep(rendered, sep))


_US_PER_DAY = 86_400 * 1_000_000


def epoch_seconds(end: Column | str, start: Column | str) -> Column:
    """``EXTRACT(EPOCH FROM end - start)`` with fractional seconds preserved
    (``core_texi.sql:86``) and PostgreSQL's exact floating-point shape:
    PG subtracts timestamps into an interval of (days, microseconds) and
    epoch() evaluates ``days*86400 + micros/1e6`` — a different rounding
    ORDER from ``cast(end as double) - cast(start as double)``, which
    diverges by 1 ULP on many pairs (each epoch-scale operand is already
    inexact at microsecond resolution). Mirroring the decomposition keeps
    durations bit-for-bit with the reference warehouse; same tree as
    ``suite.registry.epoch_diff_seconds`` mirrors for DuckDB."""
    e = F.col(end) if isinstance(end, str) else end
    s = F.col(start) if isinstance(start, str) else start
    dus = F.unix_micros(e) - F.unix_micros(s)
    rem = dus % F.lit(_US_PER_DAY)  # sign follows the dividend, like PG
    days_us = dus - rem
    return (days_us / F.lit(_US_PER_DAY) * F.lit(86400)).cast(
        "double"
    ) + rem.cast("double") / F.lit(1e6)
