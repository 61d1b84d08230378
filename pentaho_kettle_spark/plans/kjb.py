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
    # every entry that failed, in execution order — the reference's nrErrors
    # accumulation: a TRANS failure routed through a failure hop still counts
    # against the final job result unless a SUCCESS entry clears it
    failed_entries: list[str] = field(default_factory=list)


def parse_kjb(path: str, variables: dict | None = None) -> Job:
    """Parse a .kjb; ``variables`` only collects the job's own <parameters>
    defaults into the space here. The XML tree is kept PRISTINE — ${VAR}
    placeholders are substituted per-entry at EXECUTION time against the
    live variable space (reference: each JobEntry calls
    environmentSubstitute at its own init, Job.java execute loop), so a
    SET_VARIABLES entry overrides values for every later entry even when
    the variable already had a parse-time value (parameter default, env,
    or caller value)."""
    from pentaho_kettle_spark.plans.variables import (
        Variables,
        file_parameter_defaults,
    )

    root = ET.parse(path).getroot()
    vspace = (
        variables if isinstance(variables, Variables) else Variables(variables)
    )
    vspace.defaults = {**file_parameter_defaults(root), **vspace.defaults}
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


def _simple_eval(elem: ET.Element, vspace) -> bool:
    """entries/simpleeval/JobEntrySimpleEval.java subset: compare a variable
    (re-substituted at EVAL time, so values set by an earlier SET_VARIABLES
    entry are visible) against a compare value under a success condition.
    Ordered conditions compare numerically when both sides parse as numbers,
    else lexicographically — matching the reference's number/string modes."""
    left = vspace.substitute(elem.findtext("variablename") or "")
    right = vspace.substitute(elem.findtext("comparevalue") or "")
    cond = (elem.findtext("successcondition") or "equal").lower()
    if cond == "equal":
        return left == right
    if cond == "different":
        return left != right
    if cond == "contains":
        return right in left
    if cond == "notcontains":
        return right not in left
    if cond == "startswith":
        return left.startswith(right)
    if cond == "endswith":
        return left.endswith(right)
    ordered = {
        "greaterthan": lambda a, b: a > b,
        "lesserthan": lambda a, b: a < b,
        "greaterorequalthan": lambda a, b: a >= b,
        "lesserorequalthan": lambda a, b: a <= b,
    }
    if cond in ordered:
        try:
            return ordered[cond](float(left), float(right))
        except ValueError:
            return ordered[cond](left, right)
    raise NotImplementedError(f"SIMPLE_EVAL successcondition {cond!r}")


def run_kjb(
    spark: SparkSession,
    path: str,
    inputs: dict[str, DataFrame] | None = None,
    max_entries: int = 1000,
    variables: dict | None = None,
    repository: str | None = None,
) -> JobResult:
    """Execute a job. `inputs` pre-binds step names inside executed
    transformations (e.g. TableInput stand-ins), like run_ktr's `inputs`.
    `repository` names a Kettle file-repository root: TRANS entries that
    reference a transformation by repository name (<transname> +
    <directory>, JobEntryTrans) resolve under it, as do rep_name Mapping /
    MetaInject references inside the executed transformations.

    Returns JobResult: overall success (reached SUCCESS, or ran off the end
    without a failure), the executed entry order, and per-TRANS terminal
    DataFrames under results[entry_name].
    """
    import threading

    from pentaho_kettle_spark.plans.ktr import run_ktr

    from pentaho_kettle_spark.plans.variables import Variables

    vspace = variables if isinstance(variables, Variables) else Variables(variables)
    job = parse_kjb(path, variables=vspace)
    if job.start is None:
        raise ValueError(f"job '{job.name}' has no START entry")
    res = JobResult(success=True)
    state = {"steps": 0, "aborted": False, "success_entry": False}
    lock = threading.Lock()
    worker_errors: list[BaseException] = []

    def _run_chain(root_entry: str) -> None:
        """Execute a chain with an explicit work-stack (DFS preorder — same
        order the recursive version produced, without one Python frame per
        entry: a 1000-entry linear chain must hit the friendly max_entries
        guard, not RecursionError). The reference Job engine executes all
        matching next entries serially (Job.java execute(), nextJobEntries
        loop) unless the entry sets launchingInParallel — then each next
        entry runs in its own thread and the parent waits (Job.java
        JobEntryJobRunner threads + waitUntilFinished)."""
        stack = [root_entry]
        while stack:
            current = stack.pop()
            with lock:
                if state["aborted"]:
                    return  # ABORT halts the whole job, not just its branch
                state["steps"] += 1
                if state["steps"] > max_entries:
                    raise RuntimeError(
                        f"job '{job.name}' exceeded {max_entries} entries (cycle?)"
                    )
                res.executed.append(current)
            entry = job.entries.get(current)
            if entry is None:
                raise ValueError(f"hop points at unknown entry '{current}'")
            ok = True
            if entry.type == "SPECIAL" or entry.type == "DUMMY":
                ok = True
            elif entry.type == "TRANS":
                # substituted NOW, against the live space — an earlier
                # SET_VARIABLES can redirect which .ktr this entry runs
                fname = vspace.substitute(entry.elem.findtext("filename"))
                if fname and not os.path.isabs(fname):
                    fname = os.path.join(
                        os.path.dirname(os.path.abspath(path)), fname
                    )
                if not fname:
                    # repository-by-name TRANS entry (JobEntryTrans:
                    # <transname> + <directory> against a file repository)
                    tname = vspace.substitute(
                        entry.elem.findtext("transname") or ""
                    )
                    if tname and repository:
                        d = vspace.substitute(
                            entry.elem.findtext("directory") or "/"
                        ).strip("/")
                        fname = os.path.join(repository, d, tname + ".ktr")
                    elif tname:
                        raise NotImplementedError(
                            f"'{current}': repository transformation "
                            f"'{tname}' — pass run_kjb(repository=...)"
                        )
                try:
                    from pentaho_kettle_spark.plans.ktr import parse_ktr

                    # Kettle's result-row buffer: the previous TRANS entry's
                    # 'Copy rows to result' output pre-binds onto every
                    # 'Get rows from result' step of THIS transformation —
                    # lazily, so the two transformations compose into one
                    # Catalyst plan across the job hop
                    bind = dict(inputs or {})
                    parsed = parse_ktr(fname, variables=vspace,
                                       repository=repository)
                    from_result = [
                        s.name for s in parsed.steps.values()
                        if s.type == "RowsFromResult"
                    ]
                    with lock:
                        prev_rows = state.get("result_rows")
                    if from_result and prev_rows is None:
                        raise ValueError(
                            f"'{current}': transformation reads rows from "
                            "result but no previous entry copied rows to "
                            "result"
                        )
                    for name in from_result:
                        bind[name] = prev_rows
                    to_result = [
                        s.name for s in parsed.steps.values()
                        if s.type == "RowsToResult"
                    ]
                    out = run_ktr(
                        spark, fname, inputs=bind, variables=vspace,
                        extra_outputs=to_result, repository=repository,
                    )
                    with lock:
                        res.results[current] = out
                        # the reference replaces the job Result per entry:
                        # every RowsToResult step publishes (terminal or
                        # not — multiple steps all append to one Result);
                        # a TRANS with none leaves an EMPTY buffer, not the
                        # previous entry's rows
                        if to_result:
                            buf = out[to_result[0]]
                            for name in to_result[1:]:
                                buf = buf.unionByName(out[name])
                            state["result_rows"] = buf
                        else:
                            state["result_rows"] = None
                except Exception as exc:  # noqa: BLE001 - failure routes the hop
                    ok = False
                    with lock:
                        res.error = f"{current}: {exc}"
                        res.failed_entries.append(current)
            elif entry.type == "SET_VARIABLES":
                # entries/setvariables/JobEntrySetVariables.java: mutate the
                # job's variable space for everything executed AFTER this
                # entry (already-run entries saw the old values). Values may
                # themselves reference variables — resolved against the
                # live space at this entry's execution.
                with lock:
                    for f in entry.elem.findall("fields/field"):
                        n = vspace.substitute(f.findtext("variable_name"))
                        if n:
                            vspace.values[n] = vspace.substitute(
                                f.findtext("variable_value") or ""
                            )
            elif entry.type == "SIMPLE_EVAL":
                # a false evaluation is a ROUTING outcome (failure hops
                # fire), not an error — it does not join failed_entries
                ok = _simple_eval(entry.elem, vspace)
            elif entry.type == "SUCCESS":
                with lock:
                    state["success_entry"] = True
                continue
            elif entry.type == "ABORT":
                with lock:
                    res.failed_entry = current
                    res.failed_entries.append(current)
                    res.error = (
                        vspace.substitute(entry.elem.findtext("message"))
                        or "aborted"
                    )
                    state["aborted"] = True
                return
            else:
                raise NotImplementedError(
                    f"job entry '{current}' has unsupported type '{entry.type}' "
                    "(shell/mail/ftp entries are declared non-goals)"
                )
            # conditional hops match the entry outcome; unconditional hops
            # always fire (reference: JobHopMeta evaluation)
            matched = [
                h.to
                for h in job.hops
                if h.frm == current and (h.unconditional or h.on_success == ok)
            ]
            if not matched and not ok:
                with lock:
                    res.failed_entry = current
                return
            if (entry.elem.findtext("parallel") or "N") == "Y" and len(matched) > 1:
                threads = [
                    threading.Thread(target=_guarded_chain, args=(t,), daemon=True)
                    for t in matched
                ]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
            else:
                stack.extend(reversed(matched))

    def _guarded_chain(entry_name: str) -> None:
        try:
            _run_chain(entry_name)
        except BaseException as exc:  # noqa: BLE001 - re-raised on the caller
            with lock:
                worker_errors.append(exc)

    _run_chain(job.start)
    if worker_errors:
        raise worker_errors[0]
    # final result: ABORT always fails; otherwise an explicit SUCCESS entry
    # clears accumulated errors (JobEntrySuccess analog), else any failed
    # entry fails the job even when a failure hop handled it (nrErrors)
    if state["aborted"]:
        res.success = False
    elif state["success_entry"]:
        res.success = True
    else:
        res.success = not res.failed_entries
        if res.failed_entries and res.failed_entry is None:
            res.failed_entry = res.failed_entries[0]
    return res
