"""ETL metadata injection — metainject/MetaInject.java (SURVEY §2.7).

Kettle's MetaInject step rewrites a TEMPLATE transformation at runtime:
rows from config streams become step settings (a filename, a separator, a
whole field list), then the mutated template runs. The reference resolves
injection targets through a per-step injection-key registry
(StepMetaInjectionInterface); that registry is step-internal Java metadata,
so this engine re-expresses targets as XML paths relative to the target
step element — the .ktr surface itself, which is public and stable.

Two injection shapes:
  * InjectValue — scalar: set `<key path>` text under the target step
    (creating missing elements), e.g. key "separator" or "compare/condition/
    value/text".
  * InjectRows — repeating group: key is "<container>/<element>", each row
    dict becomes one `<element>` with one child tag per dict key, replacing
    the container's existing children — the classic "inject the field list
    into a CSV input" use.

Scale note: config streams are bounded driver metadata (step settings, not
data). `collect_rows` enforces that with a hard cap so a mis-wired data
stream fails loudly instead of pulling a table through the driver.
"""

from __future__ import annotations

import os
import tempfile
import xml.etree.ElementTree as ET
from dataclasses import dataclass

MAX_CONFIG_ROWS = 10_000  # config, not data: fail loudly past this


@dataclass
class InjectValue:
    target_step: str
    key: str  # XML path under the <step> element
    value: object


@dataclass
class InjectRows:
    target_step: str
    key: str  # "<container>/<element>", e.g. "fields/field"
    rows: list[dict]  # one element per row; dict keys become child tags


def _find_step(root: ET.Element, name: str) -> ET.Element:
    for s in root.findall("step"):
        if s.findtext("name") == name:
            return s
    raise ValueError(f"metainject: template has no step named {name!r}")


def _ensure_path(elem: ET.Element, path: str) -> ET.Element:
    for part in path.split("/"):
        nxt = elem.find(part)
        if nxt is None:
            nxt = ET.SubElement(elem, part)
        elem = nxt
    return elem


def inject(
    template_path: str,
    injections: list[InjectValue | InjectRows],
    out_path: str | None = None,
) -> str:
    """Apply injections to a template .ktr; returns the mutated file's path
    (a NamedTemporaryFile unless `out_path` is given)."""
    tree = ET.parse(template_path)
    root = tree.getroot()
    for inj in injections:
        step = _find_step(root, inj.target_step)
        if isinstance(inj, InjectValue):
            leaf = _ensure_path(step, inj.key)
            leaf.text = "" if inj.value is None else str(inj.value)
        else:
            container_path, _, element_tag = inj.key.rpartition("/")
            if not container_path:
                raise ValueError(
                    f"InjectRows key {inj.key!r} must be '<container>/<element>'"
                )
            container = _ensure_path(step, container_path)
            for old in container.findall(element_tag):
                container.remove(old)
            for row in inj.rows:
                el = ET.SubElement(container, element_tag)
                for k, v in row.items():
                    ET.SubElement(el, k).text = "" if v is None else str(v)
    if out_path is None:
        # write next to the template so relative references inside it
        # (e.g. a Mapping step's child <filename>) still resolve
        fd, out_path = tempfile.mkstemp(
            suffix=".ktr",
            prefix="pks_metainject_",
            dir=os.path.dirname(os.path.abspath(template_path)),
        )
        os.close(fd)
    tree.write(out_path, encoding="unicode", xml_declaration=True)
    return out_path


def collect_rows(df) -> list[dict]:
    """Collect a CONFIG stream to the driver (bounded; this is step
    metadata, not data — a mis-wired table scan fails loudly)."""
    rows = df.limit(MAX_CONFIG_ROWS + 1).collect()
    if len(rows) > MAX_CONFIG_ROWS:
        raise ValueError(
            f"metainject config stream exceeds {MAX_CONFIG_ROWS} rows — "
            "that is a data stream, not step settings"
        )
    return [r.asDict() for r in rows]


def run_metainject(
    spark,
    template_path: str,
    injections: list[InjectValue | InjectRows],
    inputs: dict | None = None,
    variables: dict | None = None,
):
    """Inject + run: returns run_ktr's {terminal step: DataFrame}."""
    from pentaho_kettle_spark.plans.ktr import run_ktr

    mutated = inject(template_path, injections)
    try:
        return run_ktr(spark, mutated, inputs=inputs, variables=variables)
    finally:
        os.unlink(mutated)
