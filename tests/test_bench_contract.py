"""bench.py must keep the driver's contract: ONE JSON line with the agreed
keys. Runs the real script in a subprocess at tiny scale."""

import json
import os
import subprocess
import sys


def test_bench_emits_driver_contract_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_KG_DOCS="300",
        SPARK_GRAFT_BENCH_RUNS="2",
        SPARK_GRAFT_STRESS_DOCS="5000",
        SPARK_GRAFT_STREAM_DOCS="2000",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in payload, key
    assert payload["unit"] == "sec"
    assert isinstance(payload["value"], (int, float)) and payload["value"] > 0
    assert payload["queries"]["kg_pipeline"] > 0
    assert payload["kg_triples"] > 0
    # medians-with-spread contract (round-over-round comparability). The
    # stdout line is kept SLIM so it survives the driver's bounded tail
    # capture (VERDICT r03); per-query spread lives in the full record the
    # line points at.
    assert payload["runs_per_query"] == 2
    assert "spread" not in payload
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, payload["spread_file"])) as fh:
        full = json.load(fh)
    assert full["queries"] == payload["queries"]
    for name, med in full["queries"].items():
        lo, hi = full["spread"][name]
        assert lo <= med <= hi, (name, lo, med, hi)
    # dedup scale-stress stage: candidate volume must stay near-linear
    assert payload["stress_docs"] == 5000
    assert payload["stress_cand_per_doc"] < 4.0
    # streaming-ingest stress: 4 micro-batches ran, mirrors were dropped
    assert len(payload["stream_batch_secs"]) == 4
    assert 0 < payload["stream_survivors"] < payload["stream_docs"]
