"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and order-insensitive values (columns sorted by name, rows sorted, values
normalized the way a hash would see them). Exact equality required — the
queries are designed to be bit-deterministic cross-engine.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm(v, is_date_col=False):
    """Normalize a cell to a hashable, engine-neutral representation.

    ``is_date_col`` folds naive-midnight datetimes back to the date: the
    pandas fetch path renders DATE columns as midnight Timestamps. The fold
    is gated on the column actually being date-typed (per the engines' own
    type metadata, not value shape) so a genuine TIMESTAMP-vs-DATE type
    mismatch stays visible even when every value is midnight.
    """
    if v is None:
        return None
    # numpy scalars from the pandas fetch path (np.int64 is NOT a Python
    # int subclass; np.float64 IS a float subclass but .item() is uniform)
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        v = v.item()
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, datetime.datetime):
        if is_date_col and v.tzinfo is None and v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            # EXACT string compare — folding through float would round
            # anything wider than 53 bits and silently pass a 1-ulp
            # drift on DECIMAL(38,x). NOT normalize(): that rounds to
            # the context precision (28 digits by default), re-opening
            # the same hole two digits later. format(v, 'f') is exact at
            # any width; stripping trailing fractional zeros by string
            # makes the compare scale-insensitive (1.50 == 1.5000)
            # without touching a significant digit. SCOPE: only the
            # SPARK side can reach here (the oracle fetch floatifies
            # DuckDB decimals via pandas, mirroring the driver), and the
            # dtype gate above rejects Spark DECIMAL result columns
            # outright — this branch is the backstop that a Decimal
            # slipping past both still compares exactly, never rounded.
            s = format(v, "f")
            if "." in s:
                s = s.rstrip("0").rstrip(".")
            return "0" if s in ("-0", "") else s
    except ImportError:
        pass
    return v


def _canon(cols, rows, date_cols=frozenset()):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    flags = [cols[i] in date_cols for i in order]
    data = sorted(
        tuple(_norm(row[i], flags[j]) for j, i in enumerate(order)) for row in rows
    )
    return cols_sorted, data


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as e
    from paimon_presto_spark.session import get_spark

    spark = get_spark("correctness-check")
    qs, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    passed, failed, weak = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            failed.append((name, "SPARK ERROR:\n" + traceback.format_exc(limit=8)))
            continue
        if name not in oracles:
            weak.append((name, len(srows)))
            print(f"  ~ {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            # Fetch through pandas, as the driver harness does: DuckDB
            # HUGEINT (integer SUM) and NULL-bearing int columns floatify
            # here, which fetchall() would mask (round-1 lesson). Capture
            # the relation's TRUE types first — .df() erases DATE vs
            # TIMESTAMP (both become datetime64 midnights).
            rel = con.sql(oracles[name])
            otypes = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
            odf = rel.df()
            ocols = list(odf.columns)
            orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        except Exception:
            failed.append((name, "ORACLE ERROR:\n" + traceback.format_exc(limit=4)))
            continue
        dtype_bad = []
        sdtypes = dict(sdf.dtypes)
        for c in scols:
            st = sdtypes.get(c, "")
            # Raw DECIMAL result columns are design-banned (registry
            # determinism rules: cast back to DOUBLE/VARCHAR). The
            # oracle fetch floatifies DuckDB decimals (pandas path, as
            # the driver does), so a Spark-side Decimal wider than float
            # precision can NEVER compare exactly — fail loudly at the
            # type level instead of leaving a value mismatch to decode.
            if st.startswith("decimal"):
                dtype_bad.append(
                    (c, st, "DECIMAL result (cast to DOUBLE/VARCHAR)")
                )
            ot = str(odf.dtypes[c]) if c in odf.columns else "MISSING"
            if st in ("bigint", "int", "smallint", "tinyint") and not (
                ot.startswith("int") or ot.startswith("uint") or ot == "object"
            ):
                dtype_bad.append((c, st, ot))
            # DATE on one side, TIMESTAMP on the other, is a real type
            # mismatch even when every value is midnight.
            odecl = otypes.get(c, "")
            if st == "date" and odecl.startswith("TIMESTAMP"):
                dtype_bad.append((c, st, odecl))
            elif st.startswith("timestamp") and odecl == "DATE":
                dtype_bad.append((c, st, odecl))
        if dtype_bad:
            failed.append(
                (name, f"DTYPE (decimal result / int floatified / DATE-TIMESTAMP skew): {dtype_bad}")
            )
            continue
        date_cols = frozenset(
            c
            for c in scols
            if sdtypes.get(c, "") == "date" or otypes.get(c, "") == "DATE"
        )
        sc, sd = _canon(scols, srows, date_cols)
        oc, od = _canon(ocols, orows, date_cols)
        if sc != oc:
            failed.append((name, f"SCHEMA: spark={sc} oracle={oc}"))
        elif len(sd) != len(od):
            failed.append((name, f"ROWCOUNT: spark={len(sd)} oracle={len(od)}"))
        elif sd != od:
            diffs = [
                (i, a, b) for i, (a, b) in enumerate(zip(sd, od)) if a != b
            ][:3]
            failed.append((name, f"VALUES ({len(diffs)}+ diffs): {diffs}"))
        else:
            passed.append(name)
            print(f"  ✓ {name}: {len(sd)} rows ({time.time()-t0:.1f}s)")

    print(f"\n== {len(passed)} passed, {len(failed)} failed, {len(weak)} rows-only ==")
    for name, msg in failed:
        print(f"\nFAIL {name}:\n{msg[:2000]}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
