"""Cross-engine numeric determinism helpers.

The registry's determinism rules (``queries/__init__.py``) require every
transcendental (ln, exp, ...) to pass through DECIMAL(28,10) before any
further arithmetic: Java's Math.log may sit one ulp off libm's, so the
raw double is not bit-portable between Spark and a SQL oracle engine.
The string bridge (decimal -> varchar -> double) forces the exact decimal
value to re-parse as a double identically in both engines.

Oracle-SQL spelling of the same squeeze:
``CAST(CAST(CAST(expr AS DECIMAL(28,10)) AS VARCHAR) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column

#: The registry-wide exact-decimal type for order-independent sums and
#: transcendental squeezing. Changing the precision here does NOT retune
#: the oracles — every oracle SQL spells the precision literally, so a
#: change must be made in lockstep (the cross-engine gate catches drift).
DEC = "decimal(28,10)"


def decimal_squeeze(col: Column) -> Column:
    """Round ``col`` to DECIMAL(28,10) and string-bridge it back to
    DOUBLE, making a transcendental's value bit-portable across engines."""
    return col.cast(DEC).cast("string").cast("double")
