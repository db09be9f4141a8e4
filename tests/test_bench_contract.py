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
        "n_timed": len(bench.HEADLINE),
        "queries_file": "bench_headline.json",
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


def test_video_sf1_synth_geometry():
    """The _video_fp_sf1 synth's payloads, pushed through the REAL
    pure-Python extraction path (PPM-stream demux → per-frame aHash →
    temporal majority), must reproduce the exact fingerprint geometry the
    cluster histogram depends on: variant edits (3-of-5 frames) survive
    the vote, the 1-frame noise bit does not, within-group Hamming <= 3,
    cross-group far above the banding threshold. Runs without Spark by
    capturing the synth factory instead of the shared engine."""
    import numpy as np
    import pandas as pd

    from paimon_presto_spark.operators.multimodal import (
        _average_hash,
        _luma_rows,
        _majority_hash,
        _ppm_stream_frames,
        decode_image_pixels,
    )

    captured = {}

    def fake_engine(spark, sf1_dir, row_name, synth_factory, extract, sig_col):
        captured["factory"] = synth_factory
        captured["sig_col"] = sig_col

    orig = bench._perceptual_cluster_histogram_sf1
    bench._perceptual_cluster_histogram_sf1 = fake_engine
    try:
        bench._video_fp_sf1(None, "/nonexistent")
    finally:
        bench._perceptual_cluster_histogram_sf1 = orig
    assert captured["sig_col"] == "vfp"

    n_groups = 12  # 48 docs → variants 0..3, same shape the engine derives
    synth = captured["factory"](n_groups)
    out = next(synth(iter([pd.DataFrame({"doc_id": np.arange(48)})])))
    assert list(out.columns) == ["media_id", "payload"]

    def expected_vfp(did: int) -> int:
        g, v = did % n_groups, did // n_groups
        sig = bench._splitmix64(g)
        bits = 0
        for p in range(64):
            b = (sig >> p) & 1
            if p < v:
                b ^= 1
            if b:
                bits |= 1 << (63 - p)  # aHash packs cell i at bit 63-i
        return bits - (1 << 64) if bits >= 1 << 63 else bits

    vfps = {}
    for did, payload in zip(out.media_id, out.payload):
        frames = _ppm_stream_frames(bytes(payload))
        assert len(frames) == 5
        hashes = [
            _average_hash(_luma_rows(decode_image_pixels(f)[2]))
            for f in frames
        ]
        # the suppressed noise bit must actually be PRESENT in one frame,
        # or the majority vote is decorative and this row stresses nothing
        assert len(set(hashes)) >= 2
        vfps[int(did)] = _majority_hash(hashes)
    assert vfps == {d: expected_vfp(d) for d in range(48)}

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    within = max(ham(vfps[d], vfps[d % n_groups]) for d in range(48))
    cross = min(
        ham(vfps[a], vfps[b])
        for a in range(n_groups)
        for b in range(n_groups)
        if a != b
    )
    assert within <= 3
    assert cross > 3
