"""Dump `.explain("formatted")` for one registry entry to a file.

Usage: python tools/dump_plan.py <entry> <out_file> [sf_dir]

Measurement-only helper for the optimization rounds (plans/r11/ evidence
files) — never imported by the engine or the bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    entry, out_file = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

    from paimon_presto_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("dump-plan-" + entry)
    df = entrymod.queries()[entry](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(out_file, "w") as fh:
        fh.write(plan)
    print(f"wrote {out_file} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
