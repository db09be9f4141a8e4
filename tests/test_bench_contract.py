"""bench.py is production code: two consecutive rounds shipped a broken
bench artifact (round 3: oversized tail line; round 4: the sf1 runner map
raised KeyError before a single stress query ran because of an
eagerly-evaluated ``qs[name]`` default). These checks run without Spark
and pin the contracts the driver's per-round BENCH_r{N}.json depends on.
"""

from __future__ import annotations

import json
import subprocess
import sys

import bench
from paimon_presto_spark.queries import queries


def test_scale_runner_map_builds_for_every_scale_query():
    """Every SCALE_QUERIES name resolves to a runner — either a retuned
    sf1 variant or a registry entry. Round 4's artifact died here."""
    qs = queries()
    runners = bench._scale_runners(qs)
    assert set(runners) == set(bench.SCALE_QUERIES)
    for name, fn in runners.items():
        assert callable(fn), name


def test_scale_only_names_are_in_retuned_map():
    """Any SCALE_QUERIES name missing from the registry must have a
    retuned runner, otherwise _scale_runners would KeyError."""
    qs = queries()
    missing = [n for n in bench.SCALE_QUERIES if n not in qs]
    runners = bench._scale_runners(qs)
    for name in missing:
        assert name in runners


def test_headline_names_all_in_registry():
    qs = queries()
    unknown = [n for n in bench.HEADLINE if n not in qs]
    assert not unknown, f"HEADLINE references unknown registry entries: {unknown}"


def test_bench_json_line_shape():
    """The driver tail-captures ONE JSON line; it must stay under 2000
    chars even with every headline query timed. Simulate the truncation
    logic with a worst-case queries dict."""
    out = {
        "metric": "headline_total",
        "value": 9999.999,
        "unit": "sec",
        "sf": 0.1,
        "queries": {n: 9999.999 for n in bench.HEADLINE},
        "scale_sf1_total": 9999.9,
        "scale_plan_violations": 0,
    }
    line = json.dumps(out)
    if len(line) > 2000:  # tier 1 (mirrors bench.main)
        out["queries"] = {k: round(v, 1) for k, v in out["queries"].items()}
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > 2000:  # tier 2: most-expensive-rows-only fallback
        keep = dict(
            sorted(out["queries"].items(), key=lambda kv: -kv[1])[:40]
        )
        out["queries"] = {k: round(v, 1) for k, v in keep.items()}
        out["queries_dropped"] = len(bench.HEADLINE) - len(keep)
        line = json.dumps(out, separators=(",", ":"))
    assert len(line) <= 2000


def test_sidecar_write_preserves_full_detail(tmp_path):
    """The full-detail sidecar keeps every row at full precision, so the
    stdout line's tier-2 drops lose nothing: exercise the actual write
    helper and compare contents, not source text."""
    payload = {
        "metric": "headline_total",
        "value": 1234.567,
        "queries": {n: 3.141 for n in bench.HEADLINE},
    }
    path = bench._write_sidecar(
        "bench_headline.json", payload, directory=str(tmp_path)
    )
    with open(path) as fh:
        assert json.load(fh) == payload


def test_bench_module_importable_fresh():
    """bench.py must import with no side effects (no Spark start, no IO)
    so the driver's subprocess can always at least reach main()."""
    code = "import bench; assert callable(bench.main)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=bench.os.path.dirname(bench.os.path.abspath(bench.__file__)),
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
