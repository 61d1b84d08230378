"""Two-cluster-size scaling protocol (BASELINE.md): run the identical replay
via `spark-submit --py-files` at local[8] and local[32], compute
efficiency = T32 / (4 * T8), write BENCH/scaling.json + refresh the results
table in BENCH/BASELINE.md.

Usage: python bench/scaling.py [--events 2000000] [--convs 20000]
       [--trials 1] [--batches 4]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "pentaho_kettle_spark")
        for dirpath, _d, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))


def gen_log(events: int, convs: int, zipf_a: float | None = 1.2) -> str:
    tag = "uniform" if zipf_a is None else f"z{zipf_a}"
    cache = f"/tmp/pks_bench_cache/changelog_e{events}_c{convs}_s42_{tag}"
    if os.path.exists(os.path.join(cache, "_SUCCESS")):
        return cache
    from pentaho_kettle_spark.cdc.changelog import CHANGELOG_SCHEMA
    from pentaho_kettle_spark.fixtures.changelog_gen import gen_changelog
    from pentaho_kettle_spark.session import get_spark

    spark = get_spark(app_name="gen", master="local[8]", shuffle_partitions=8)
    pdf = gen_changelog(events, convs, seed=42, zipf_a=zipf_a)
    spark.createDataFrame(pdf, schema=CHANGELOG_SCHEMA).repartition(32).write.mode(
        "overwrite"
    ).parquet(cache)
    spark.stop()
    return cache


def run_once(cores: int, log_dir: str, batches: int, zip_path: str, tag: str) -> dict:
    out_json = f"/tmp/pks_scale_{tag}_{cores}.json"
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", "24g",
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "bench", "replay_job.py"),
        log_dir, str(batches), "1", out_json, "mor",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    with open(out_json) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--convs", type=int, default=20_000)
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--batches", type=int, default=8)
    args = ap.parse_args()

    zip_path = "/tmp/pks.zip"
    build_zip(zip_path)

    results = {"events": args.events, "convs": args.convs, "batches": args.batches,
               "trials": args.trials, "distributions": {}}
    for dist, zipf_a in (("skewed", 1.2), ("uniform", None)):
        log_dir = gen_log(args.events, args.convs, zipf_a)
        runs = {}
        for cores in (8, 32):
            # warm-up run discarded (JIT, page cache), then timed trials
            run_once(cores, log_dir, args.batches, zip_path, "warmup")
            tput = []
            for t in range(args.trials):
                r = run_once(cores, log_dir, args.batches, zip_path, f"{dist}_t{t}")
                tput.append(r["events_per_sec"])
            runs[str(cores)] = {
                "events_per_sec_median": statistics.median(tput),
                "all": tput,
            }
            print(f"{dist} local[{cores}]: {tput} events/s", file=sys.stderr)
        t8 = runs["8"]["events_per_sec_median"]
        t32 = runs["32"]["events_per_sec_median"]
        results["distributions"][dist] = {
            "runs": runs,
            "scaling_efficiency": round(t32 / (4 * t8), 3),
        }
    results["scaling_efficiency"] = results["distributions"]["skewed"]["scaling_efficiency"]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
