"""TIME-of-day convention: micros-since-midnight over BIGINT.

Paimon's TIME type has no durable Spark equivalent (SURVEY §7 hard part 1
— Spark 4.1's TIME is in-memory only, unsupported by the parquet writer),
so the engine adopts the reference's own internal convention: TIME values
travel as micros-since-midnight integers (the reference juggles the same
micros<->millis representations at ``PrestoPageSourceBase.java:228-229``,
``PrestoTypeUtils.java:127-128``). Columns declared BIGINT + these
conversions at the boundary give full TIME fidelity through the table
format, predicates, and stats-based file skipping (plain integer
comparisons).

All expressions are built-in-function compositions — whole-stage codegen,
no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

MICROS_PER_SECOND = 1_000_000
MICROS_PER_DAY = 86_400 * MICROS_PER_SECOND


def time_from_string(col: Column | str) -> Column:
    """'HH:MM:SS[.ffffff]' → micros-since-midnight BIGINT.

    Invalid strings yield NULL (TRY_CAST-style tolerance).
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ":")
    secs = F.try_element_at(parts, F.lit(3)).try_cast("double")
    hours = F.try_element_at(parts, F.lit(1)).try_cast("int")
    minutes = F.try_element_at(parts, F.lit(2)).try_cast("int")
    valid = (
        (F.size(parts) == 3)
        & hours.isNotNull()
        & minutes.isNotNull()
        & secs.isNotNull()
    )
    micros = (
        (hours.cast("long") * 3600 + minutes.cast("long") * 60) * MICROS_PER_SECOND
        + F.round(secs * MICROS_PER_SECOND).cast("long")
    )
    in_range = (
        (hours >= 0) & (hours < 24)
        & (minutes >= 0) & (minutes < 60)
        & (secs >= 0) & (secs < 60)
    )
    return F.when(valid & in_range, micros).otherwise(F.lit(None).cast("long"))


def time_to_string(col: Column | str) -> Column:
    """micros-since-midnight → 'HH:MM:SS.ffffff' string rendering."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.floor(c / (3600 * MICROS_PER_SECOND))
    m = F.floor(c / (60 * MICROS_PER_SECOND)) % 60
    s = F.floor(c / MICROS_PER_SECOND) % 60
    us = c % MICROS_PER_SECOND
    return F.concat_ws(
        ":",
        F.lpad(h.cast("string"), 2, "0"),
        F.lpad(m.cast("string"), 2, "0"),
        F.concat(
            F.lpad(s.cast("string"), 2, "0"),
            F.lit("."),
            F.lpad(us.cast("string"), 6, "0"),
        ),
    )


def time_extract(col: Column | str, field: str) -> Column:
    """EXTRACT(field FROM time) over the micros convention
    (field ∈ hour/minute/second/microsecond)."""
    c = F.col(col) if isinstance(col, str) else col
    if field == "hour":
        return F.floor(c / (3600 * MICROS_PER_SECOND)).cast("int")
    if field == "minute":
        return (F.floor(c / (60 * MICROS_PER_SECOND)) % 60).cast("int")
    if field == "second":
        return (F.floor(c / MICROS_PER_SECOND) % 60).cast("int")
    if field == "microsecond":
        return (c % MICROS_PER_SECOND).cast("int")
    raise ValueError(f"unknown TIME field {field!r}")
