"""Re-run config5 twice in one process (cold + warm) and patch results.json.

The remote-compile relay adds 15-350 s of per-program noise on first
dispatch; the warm pass measures the sweep with every padded-k program
already compiled (the metric program bucketing targets).
"""
import json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks import run_all

cold = run_all.config5_sweep()
warm = run_all.config5_sweep()
entry = dict(cold)
entry["seconds_cold"] = cold["seconds"]
entry["seconds"] = warm["seconds"]
entry["per_k_seconds"] = warm["per_k_seconds"]
entry["note"] = ("seconds = warm pass (all padded-k programs compiled); "
                 "seconds_cold includes first-dispatch remote-compile "
                 "relay noise")
path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
with open(path) as f:
    report = json.load(f)
report["config5"] = entry
with open(path, "w") as f:
    json.dump(report, f, indent=2)
print(json.dumps({"config5": entry}))
