"""bench.py contract: exactly one headline JSON line on stdout."""

import json
import subprocess
import sys


def test_bench_headline_contract():
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['bench.py','--n','4096'];"
         "exec(open('bench.py').read())"],
        capture_output=True, text=True, timeout=300, cwd=".")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    payload = json.loads(lines[0])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["metric"] == "spmv_banded_nnz_per_s"
    assert payload["value"] > 0
