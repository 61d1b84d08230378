"""Kettle variable space — ``${VAR}`` / ``%%VAR%%`` substitution.

Reference parity: core/src/main/java/org/pentaho/di/core/variables/
Variables.java + core/.../util/StringUtil.java environmentSubstitute
(SURVEY §3.1 step 1 — "Variables resolved via Variables.java"). Real-world
.ktr/.kjb files parameterize file paths, SQL text, and filter literals with
``${}`` almost universally; the loaders substitute every XML text node at
parse time against this space, which is equivalent to the reference's
resolve-at-step-init for the declarative builder subset.

Resolution order (first hit wins), mirroring Kettle's layered spaces:
  1. caller-supplied values (``run_ktr(variables={...})`` — the parent
     transformation / job space),
  2. process environment (Kettle's system properties),
  3. ``<parameters>`` default_values declared by the file itself.
Unknown variables stay verbatim (``${UNDEFINED}`` passes through), exactly
like StringUtil.environmentSubstitute — a downstream step that needs the
value fails loudly with the unresolved name in its message.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

_PAT = re.compile(r"\$\{([A-Za-z0-9_. ]+)\}|%%([A-Za-z0-9_. ]+)%%")
_MAX_DEPTH = 32  # a → ${b} → ${c} chains; also the cycle guard


class Variables:
    """A resolved variable space: caller values over env over file defaults."""

    def __init__(
        self,
        values: dict[str, str] | None = None,
        defaults: dict[str, str] | None = None,
        use_env: bool = True,
    ):
        self.values = {k: str(v) for k, v in (values or {}).items()}
        self.defaults = {k: str(v) for k, v in (defaults or {}).items()}
        self.use_env = use_env

    def get(self, name: str) -> str | None:
        if name in self.values:
            return self.values[name]
        if self.use_env and name in os.environ:
            return os.environ[name]
        return self.defaults.get(name)

    def substitute(self, text: str | None) -> str | None:
        if text is None or ("$" not in text and "%%" not in text):
            return text
        for _ in range(_MAX_DEPTH):
            def _repl(m: re.Match) -> str:
                name = m.group(1) or m.group(2)
                v = self.get(name)
                return v if v is not None else m.group(0)

            out = _PAT.sub(_repl, text)
            if out == text:
                return out
            text = out
        return text  # depth cap hit (self-referential chain) — stop expanding

    def child(self, extra: dict[str, str] | None = None) -> "Variables":
        """A sub-space for a child transformation: parent values visible,
        child-supplied values (e.g. Mapping parameters) override."""
        merged = dict(self.values)
        merged.update({k: str(v) for k, v in (extra or {}).items()})
        return Variables(merged, dict(self.defaults), self.use_env)


def resolve_tree(root: ET.Element, variables: Variables) -> None:
    """Substitute ${VAR} in every text node (and attribute) of a parsed
    .ktr/.kjb tree, in place. Element *tags* are never touched."""
    for el in root.iter():
        if el.text:
            el.text = variables.substitute(el.text)
        if el.tail:
            el.tail = variables.substitute(el.tail)
        for k, v in el.attrib.items():
            el.attrib[k] = variables.substitute(v)


def file_parameter_defaults(root: ET.Element) -> dict[str, str]:
    """The <parameters> block a .ktr/.kjb declares: name → default_value."""
    out: dict[str, str] = {}
    for p in root.findall("parameters/parameter"):
        name = p.findtext("name")
        if name:
            out[name] = p.findtext("default_value") or ""
    return out
