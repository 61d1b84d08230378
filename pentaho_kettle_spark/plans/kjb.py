"""Kettle .kjb JOB loader: the orchestration layer above .ktr transformations.

Reference: engine/src/main/java/org/pentaho/di/job/Job.java +
entries/trans/JobEntryTrans.java, entries/special/JobEntrySpecial.java,
entries/success/JobEntrySuccess.java, entries/abort/JobEntryAbort.java
(SURVEY §2.9 — the job-entry families the survey keeps in scope: START,
TRANS, SUCCESS, ABORT, DUMMY, and conditional success/failure hops; shell /
mail / ftp entries remain declared non-goals).

Execution model mirrors the reference: entries run sequentially from START,
each outgoing hop is taken when its condition matches the previous entry's
result — `unconditional`, `evaluation=Y` (on success) or `evaluation=N`
(on failure). A TRANS entry runs a .ktr through plans/ktr.run_ktr on the
SAME SparkSession (the reference spawns a Trans engine per entry; here every
transformation is lazy DataFrame construction, so a job is just a driver-side
control-flow script — the cluster only works when a transformation sinks).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JobEntry:
    name: str
    type: str
    elem: ET.Element
    is_start: bool = False


@dataclass
class JobHop:
    frm: str
    to: str
    unconditional: bool
    on_success: bool  # evaluation flag when conditional


@dataclass
class Job:
    name: str
    entries: dict[str, JobEntry]
    hops: list[JobHop]
    start: str | None = None


@dataclass
class JobResult:
    success: bool
    executed: list[str] = field(default_factory=list)
    results: dict[str, object] = field(default_factory=dict)  # entry -> outputs
    failed_entry: str | None = None
    error: str | None = None


def parse_kjb(path: str) -> Job:
    root = ET.parse(path).getroot()
    entries: dict[str, JobEntry] = {}
    start = None
    for e in root.findall("entries/entry"):
        name = e.findtext("name")
        typ = (e.findtext("type") or "").upper()
        is_start = typ == "SPECIAL" and (e.findtext("start") or "N") == "Y"
        entries[name] = JobEntry(name, typ, e, is_start)
        if is_start:
            start = name
    hops = [
        JobHop(
            frm=h.findtext("from"),
            to=h.findtext("to"),
            unconditional=(h.findtext("unconditional") or "N") == "Y",
            on_success=(h.findtext("evaluation") or "Y") == "Y",
        )
        for h in root.findall("hops/hop")
        if (h.findtext("enabled") or "Y") == "Y"
    ]
    return Job(root.findtext("name") or os.path.basename(path), entries, hops, start)


def run_kjb(
    spark: SparkSession,
    path: str,
    inputs: dict[str, DataFrame] | None = None,
    max_entries: int = 1000,
) -> JobResult:
    """Execute a job. `inputs` pre-binds step names inside executed
    transformations (e.g. TableInput stand-ins), like run_ktr's `inputs`.

    Returns JobResult: overall success (reached SUCCESS, or ran off the end
    without a failure), the executed entry order, and per-TRANS terminal
    DataFrames under results[entry_name].
    """
    from pentaho_kettle_spark.plans.ktr import run_ktr

    job = parse_kjb(path)
    if job.start is None:
        raise ValueError(f"job '{job.name}' has no START entry")
    res = JobResult(success=True)
    state = {"steps": 0, "aborted": False}

    def _exec(current: str) -> None:
        """Run one entry, then EVERY matching outgoing hop, depth-first —
        the reference Job engine executes all matching next entries serially
        (Job.java execute(), nextJobEntries loop), so two success hops from
        one entry both fire."""
        state["steps"] += 1
        if state["steps"] > max_entries:
            raise RuntimeError(
                f"job '{job.name}' exceeded {max_entries} entries (cycle?)"
            )
        entry = job.entries.get(current)
        if entry is None:
            raise ValueError(f"hop points at unknown entry '{current}'")
        res.executed.append(current)
        ok = True
        if entry.type == "SPECIAL" or entry.type == "DUMMY":
            ok = True
        elif entry.type == "TRANS":
            fname = entry.elem.findtext("filename")
            if fname and not os.path.isabs(fname):
                fname = os.path.join(os.path.dirname(os.path.abspath(path)), fname)
            try:
                res.results[current] = run_ktr(spark, fname, inputs=inputs)
            except Exception as exc:  # noqa: BLE001 - failure routes the hop
                ok = False
                res.error = f"{current}: {exc}"
        elif entry.type == "SUCCESS":
            res.success = True
            return
        elif entry.type == "ABORT":
            res.success = False
            res.failed_entry = current
            res.error = entry.elem.findtext("message") or "aborted"
            state["aborted"] = True
            return
        else:
            raise NotImplementedError(
                f"job entry '{current}' has unsupported type '{entry.type}' "
                "(shell/mail/ftp entries are declared non-goals)"
            )
        # conditional hops match the entry outcome; unconditional hops always
        # fire (reference: JobHopMeta evaluation)
        matched = [
            h.to
            for h in job.hops
            if h.frm == current and (h.unconditional or h.on_success == ok)
        ]
        if not matched and not ok:
            res.success = False
            res.failed_entry = current
            return
        for target in matched:
            if state["aborted"]:
                return  # ABORT halts the whole job, not just its branch
            _exec(target)

    _exec(job.start)
    return res
