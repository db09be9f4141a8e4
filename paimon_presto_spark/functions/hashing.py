"""Deterministic, engine-portable hashing primitives.

Spark's native ``hash``/``xxhash64`` are fast but engine-specific; for
operators whose results must be reproducible across engines (and across
cluster versions — important when a 100 TB dedup job is resumed months
later), we derive 60-bit integer hashes from MD5 hex digests. MD5 is
bit-identical everywhere; `conv(hex,16,10)` keeps it in JVM codegen.

The DuckDB-equivalent spelling (used by the oracle SQL) is
``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

#: Large prime for universal-hash family h_i(x) = (a_i * x + b_i) mod P.
HASH_PRIME = 1_000_000_007
#: Reduce the base hash below P before affine steps so products fit in int64.
BASE_MOD = 1_000_003


def md5_long(col: Column | str, start: int = 1, length: int = 15) -> Column:
    """Portable 60-bit hash: first `length` hex chars of md5 as a BIGINT.

    15 hex digits < 2**60, so the value is always a valid positive int64.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), start, length), 16, 10).cast("long")


def affine_hash(base: Column, a: int, b: int) -> Column:
    """One member of the universal hash family over a pre-hashed value."""
    return (F.lit(a) * (base % BASE_MOD) + F.lit(b)) % F.lit(HASH_PRIME)


def hash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) parameters for k universal hash functions.

    Fixed arithmetic progression (no RNG) so the Spark pipeline and any
    SQL oracle can regenerate the identical family.
    """
    return [(2 * i + 3, 7 * i + 1) for i in range(k)]


def minhash_exprs(base_hash: Column, k: int) -> list[Column]:
    """k affine re-hashes of a shingle hash; MIN-aggregate each for MinHash."""
    return [affine_hash(base_hash, a, b) for a, b in hash_params(k)]


def single_partition_key(col: Column | str) -> Column:
    """A constant-0 partition key that Catalyst cannot constant-fold.

    ``Window.partitionBy(F.lit(0))`` is folded to an EMPTY partition spec,
    which makes WindowExec log "No Partition Defined" and plan a global
    single-partition exchange — noisy even when the window input is
    already bounded to k rows. ``hash(col) % 1`` evaluates to 0 on every
    row but depends on a column, so the partition spec survives
    optimization. Only use over inputs already bounded (post-LIMIT edge
    windows, top-k rank stamping): the window still runs as one task.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.hash(c) % 1
