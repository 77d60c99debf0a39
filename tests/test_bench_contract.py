"""The driver consumes bench.py's stdout as ONE JSON line with a fixed
shape — breaking it silently voids the round's BENCH record, so pin it."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_single_json_line_with_contract_keys(spark):
    # (spark fixture: registry() builds module-level Column rules and
    # needs an active session in this process too)
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="4")
    out = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [ln for ln in out.stdout.splitlines()
                  if ln.startswith('{"metric"')]
    assert len(json_lines) == 1, out.stdout[-2000:]
    rec = json.loads(json_lines[0])
    assert rec["metric"] == "total_query_sec" and rec["unit"] == "sec"
    assert rec["sf"] == 0.001
    assert rec["value"] > 0
    from elt_gluepipeline_spark.plans import registry
    assert set(rec["queries"]) == set(registry())
    assert abs(sum(rec["queries"].values()) - rec["value"]) < 0.1
