"""Round 5: repeated wide-arm samples of the config-4 window kernel.

VERDICT r4 item 1 asks for >=3 wide-arm samples (on different days —
impossible within one round; time-separated within the round instead),
all >=72% for bf16 AND f32. Each run appends one record to
probes/cfg4_samples_r5.json.

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 2400 python probes/probe_cfg4_samples_r5.py
"""

import datetime
import json
import os

import jax

from spsparse_tpu.utils.compilecache import enable_persistent_cache

enable_persistent_cache()


def main():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..",
                                  "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    cfg = bench.config4_spgemm(False)
    rec = {
        "utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "bf16_pct": cfg["pct_of_roofline"],
        "f32_pct": cfg["f32_pct_of_roofline"],
        "time_s": cfg["time_s"],
        "f32_time_s": cfg["f32_time_s"],
        "window_speedup_vs_pair": cfg["window_speedup_vs_pair"],
        "esc_planned_speedup": cfg.get("esc_planned_speedup"),
    }
    path = os.path.join(os.path.dirname(__file__), "cfg4_samples_r5.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except Exception:
        doc = {"samples": []}
    doc["samples"].append(rec)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(rec, indent=1))
    ok = all(s["bf16_pct"] >= 72 and s["f32_pct"] >= 72
             for s in doc["samples"])
    print(f"{len(doc['samples'])} samples; all >=72%: {ok}")


if __name__ == "__main__":
    main()
