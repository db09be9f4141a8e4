"""Profile one registry entry (or bench sf1 runner): run it twice (warm
second run timed), then dump per-job and per-stage durations from the
Spark status API so the expensive stage is identifiable without the UI.

Usage: python tools/profile_entry.py <entry> [sf_dir] [--sf1] [--explain]

Measurement-only helper for the optimization rounds — never imported by
the engine or the bench.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    entry = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

    from paimon_presto_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("profile-" + entry)
    sc = spark.sparkContext

    if "--sf1" in flags:
        import bench

        qs = entrymod.queries()
        runners = bench._scale_runners(qs)
        sf1_dir = os.path.join(
            os.path.dirname(os.path.abspath(bench.__file__)), ".bench_sf1"
        )
        fn = runners[entry]
        data_dir = sf1_dir
    else:
        fn = entrymod.queries()[entry]
        data_dir = sf_dir

    # warmup run (JIT/codegen/page cache)
    sc.setJobDescription(f"{entry}: warmup")
    fn(spark, data_dir).collect()
    spark.catalog.clearCache()

    import json
    import urllib.request

    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def _jobs():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs"
        ) as r:
            return json.load(r)

    first_job = max((j["jobId"] for j in _jobs()), default=-1) + 1

    sc.setJobDescription(f"{entry}: timed")
    t0 = time.perf_counter()
    df = fn(spark, data_dir)
    t_build = time.perf_counter() - t0
    df.collect()
    t_total = time.perf_counter() - t0
    print(f"\n== {entry}: total {t_total:.3f}s (plan build {t_build:.3f}s) ==")

    if "--explain" in flags:
        df.explain("formatted")

    jobs = [j for j in _jobs() if j["jobId"] >= first_job]
    jobs.sort(key=lambda j: j["jobId"])
    n_jobs = len(jobs)
    total_ms = 0
    rows = []
    for j in jobs:
        from datetime import datetime

        def ts(s):
            return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

        dur = (ts(j["completionTime"]) - ts(j["submissionTime"])).total_seconds()
        total_ms += dur
        rows.append((dur, j["jobId"], j.get("description") or j["name"],
                     j["numTasks"], j["stageIds"]))
    print(f"jobs: {n_jobs}, sum of job durations {total_ms:.3f}s")
    for dur, jid, name, ntasks, stages in sorted(rows, reverse=True)[:25]:
        print(f"  {dur:7.3f}s job {jid:4d} tasks={ntasks:4d} stages={stages} {name[:110]}")

    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    # keep stages belonging to the timed jobs
    timed_stage_ids = {s for j in jobs for s in j["stageIds"]}
    stages = [s for s in stages if s["stageId"] in timed_stage_ids]
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print("\ntop stages by executor run time:")
    for s in stages[:20]:
        print(
            f"  stage {s['stageId']:4d} run={s['executorRunTime']/1000:7.2f}s "
            f"tasks={s['numCompleteTasks']:4d} "
            f"in={s['inputBytes']>>10}KiB sh_r={s['shuffleReadBytes']>>10}KiB "
            f"sh_w={s['shuffleWriteBytes']>>10}KiB {s['name'][:80]}"
        )


if __name__ == "__main__":
    main()
