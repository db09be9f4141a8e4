"""Time one registry entry: warmup + N timed reps, print each + best.

Usage: python tools/ab_entry.py <entry> [sf_dir] [reps]

Mirrors bench.py methodology (full fn + collect, clearCache between
reps). Measurement-only helper for the optimization rounds — never
imported by the engine or the bench.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    entry = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from paimon_presto_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("ab-" + entry)
    fn = entrymod.queries()[entry]

    spark.sparkContext.setJobDescription(f"{entry}: warmup")
    fn(spark, sf_dir).collect()
    spark.catalog.clearCache()

    times = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{entry}: rep{i}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(
        f"AB {entry}: " + " ".join(f"{t:.3f}" for t in times)
        + f" | best {min(times):.3f} median {sorted(times)[len(times) // 2]:.3f}"
    )


if __name__ == "__main__":
    main()
