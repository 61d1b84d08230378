"""Pool per-trial throughputs from protocol-identical scaling runs.

Usage: python tools/pool_scaling.py run1.json [run2.json ...]

Reads the CURRENT BENCH/scaling.json plus any saved run snapshots, merges
the per-trial `all` arrays for each (pair, distribution, cores), recomputes
medians and efficiencies, rewrites BENCH/scaling.json with `pooled_runs`
counts, and re-renders the Results table in BENCH/BASELINE.md via
bench/scaling.py's renderer. Only pools pairs present in ALL inputs with
identical events/batches; others keep the current file's values.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    cur_path = os.path.join(REPO, "BENCH", "scaling.json")
    with open(cur_path) as f:
        cur = json.load(f)
    extras = []
    for p in sys.argv[1:]:
        with open(p) as f:
            extras.append(json.load(f))

    for pair_key, pair in cur["pairs"].items():
        for dist, d in pair["distributions"].items():
            pooled_from = 1
            for ex in extras:
                exd = (
                    ex.get("pairs", {})
                    .get(pair_key, {})
                    .get("distributions", {})
                    .get(dist)
                )
                if not exd:
                    continue
                if (exd.get("events"), exd.get("batches")) != (
                    d.get("events"),
                    d.get("batches"),
                ):
                    print(
                        f"skip {pair_key}/{dist} from one input: "
                        "events/batches mismatch",
                        file=sys.stderr,
                    )
                    continue
                for cores, run in exd["runs"].items():
                    tgt = d["runs"].setdefault(
                        cores, {"events_per_sec_median": 0.0, "all": []}
                    )
                    new = [v for v in run["all"] if v not in tgt["all"]]
                    tgt["all"].extend(new)
                pooled_from += 1
            for cores, run in d["runs"].items():
                run["events_per_sec_median"] = round(
                    statistics.median(run["all"]), 1
                )
            lo, hi = pair_key.split(":")
            t_lo = d["runs"][lo]["events_per_sec_median"]
            t_hi = d["runs"][hi]["events_per_sec_median"]
            d["scaling_efficiency"] = round(t_hi / (4 * t_lo), 3)
            d["pooled_runs"] = max(pooled_from, d.get("pooled_runs", 1))
        ceiling = pair["host_membw_scaling_ceiling"]
        pair["relative_to_host_ceiling"] = {
            dist: round(d["scaling_efficiency"] / ceiling, 3)
            for dist, d in pair["distributions"].items()
        }

    best = max(
        cur["pairs"].values(),
        key=lambda p: p["distributions"]["skewed"]["scaling_efficiency"],
    )
    cur["scaling_efficiency"] = best["distributions"]["skewed"][
        "scaling_efficiency"
    ]
    with open(cur_path, "w") as f:
        json.dump(cur, f, indent=2)

    sys.path.insert(0, os.path.join(REPO, "bench"))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scaling", os.path.join(REPO, "bench", "scaling.py")
    )
    m = importlib.util.module_from_spec(spec)
    sys.argv = ["scaling"]
    spec.loader.exec_module(m)
    m._render_results_md(cur)
    print(json.dumps({"pairs": {
        k: {d: v["scaling_efficiency"] for d, v in p["distributions"].items()}
        for k, p in cur["pairs"].items()
    }}))


if __name__ == "__main__":
    main()
