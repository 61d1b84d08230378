"""A/B: minor-compaction engine spark vs arrow at one width.

Usage: python bench/arrow_minor_ab.py [cores] [trials] [log_dir] [out_json]

Interleaved trials (spark, arrow, spark, arrow, ...) of the standard replay
job (mor, share=0.25, stagger=3, salted=auto, 8 batches) so host drift hits
both arms equally. Writes BENCH/arrow_minor_ab_<cores>c.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "bench"))

from scaling import build_zip, gen_log  # noqa: E402


def run_trial(cores: int, log_dir: str, zip_path: str, engine: str) -> dict:
    out_json = tempfile.mktemp(prefix="pks_ab_", suffix=".json")
    heap = 8
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", f"{heap}g",
        "--conf", f"spark.driver.extraJavaOptions=-Xms{heap}g -XX:+AlwaysPreTouch",
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.scheduler.mode=FAIR",
        "--conf", f"spark.scheduler.allocation.file={os.path.join(REPO, 'bench', 'fairscheduler.xml')}",
        "--conf", "spark.local.dir=/dev/shm/pks_spark_local",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "bench", "replay_job.py"),
        log_dir, "8", "auto", out_json, "mor", "0.25", "3", engine,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    with open(out_json) as f:
        r = json.load(f)
    os.remove(out_json)
    return r


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    log_dir = sys.argv[3] if len(sys.argv) > 3 else gen_log(16_000_000, 160_000)
    out = (
        sys.argv[4]
        if len(sys.argv) > 4
        else os.path.join(REPO, "BENCH", f"arrow_minor_ab_{cores}c.json")
    )
    zip_path = "/tmp/pks_ab.zip"
    build_zip(zip_path)
    res: dict = {"cores": cores, "log_dir": log_dir, "trials": {"spark": [], "arrow": []}}
    for t in range(trials):
        for engine in ("spark", "arrow"):
            r = run_trial(cores, log_dir, zip_path, engine)
            res["trials"][engine].append(r)
            tail = [b for b in r["batch_secs"] if b]
            print(
                f"trial {t} {engine:5s}: {r['events_per_sec']:>9.0f} ev/s  "
                f"wall {r['wall_sec']:>6.1f}s  batch max/med "
                f"{max(tail)/statistics.median(tail):.2f}",
                flush=True,
            )
            with open(out, "w") as f:
                json.dump(res, f, indent=1)
    for engine in ("spark", "arrow"):
        meds = statistics.median([r["events_per_sec"] for r in res["trials"][engine]])
        print(f"{engine}: median {meds:.0f} ev/s over {trials} trials")


if __name__ == "__main__":
    main()
