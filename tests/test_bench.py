"""bench.py contract: exactly one headline JSON line on stdout."""

import json
import os
import subprocess
import sys


def test_bench_headline_contract(tmp_path):
    detail = tmp_path / "detail.json"
    env = dict(os.environ, SPSPARSE_BENCH_DETAIL=str(detail))
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['bench.py','--n','4096'];"
         "exec(open('bench.py').read())"],
        capture_output=True, text=True, timeout=300, cwd=".", env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    payload = json.loads(lines[0])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["metric"] == "spmv_banded_nnz_per_s"
    assert payload["value"] > 0
    # detail file: full config list with roofline context (VERDICT r3 #4)
    doc = json.loads(detail.read_text())
    assert doc["platform"] == "cpu"
    assert doc["configs"][0]["metric"] == "spmv_banded_nnz_per_s"
    assert "pct_of_roofline" in doc["configs"][0]["detail"]
