"""Restricted JavaScript-expression → Catalyst Column translation.

Backs the ScriptValuesMod (.ktr "Modified Java Script Value") step builder
(SURVEY §2.7, scriptvalues_mod/ScriptValuesMod.java). The reference runs
Rhino per row; arbitrary JS cannot (and should not) run inside a Catalyst
plan, but the overwhelmingly common real-world use of the step is one-line
derived fields — `var fee = amount * rate / 100;`, `var flag = qty > 10 ?
'big' : 'small';`, `var key = name.toUpperCase();`. This module compiles
exactly that subset to native Spark expressions (JVM codegen — the FAST
path, faster than the reference's per-row Rhino), and raises
NotImplementedError naming the offending construct for anything else, so a
user knows precisely which script needs porting to script_values()
(operators/scripting.py mapInPandas — the general fallback).

Supported grammar (C-style precedence):
  literals        123, 1.5, 'str', "str", true, false, null
  identifiers     input columns or previously-assigned script vars
  arithmetic      + - * / %  (unary -)
  comparison      == != === !== < <= > >=
  logic           && || !
  ternary         cond ? a : b
  grouping        ( ... )
  methods         .toUpperCase() .toLowerCase() .trim() .length
                  .substr(start[, len])  .substring(start, end)
                  .indexOf(s)  .replace(a, b)  .concat(s)
  functions       Math.abs/round/floor/ceil/min/max/pow/sqrt,
                  parseInt(x), parseFloat(x), str2num(x), num2str(x)
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+\.\d+|\d+)"
    r"|(?P<str>'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\")"
    r"|(?P<name>[A-Za-z_$][A-Za-z0-9_$]*)"
    r"|(?P<op>===|!==|==|!=|<=|>=|&&|\|\||[-+*/%<>!?:().,])"
    r")"
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None or m.end() == pos:
            rest = src[pos:].strip()
            if not rest:
                break
            raise NotImplementedError(f"js expression: cannot tokenize {rest[:30]!r}")
        pos = m.end()
        for kind in ("num", "str", "name", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


class _Parser:
    """Recursive descent over the C-expression subset above."""

    def __init__(self, tokens: list[tuple[str, str]], env: dict[str, Column]):
        self.toks = tokens
        self.i = 0
        self.env = env

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def take(self, op: str | None = None) -> tuple[str, str]:
        kind, val = self.toks[self.i]
        if op is not None and (kind != "op" or val != op):
            raise NotImplementedError(f"js expression: expected {op!r}, got {val!r}")
        self.i += 1
        return kind, val

    # precedence climbing: ternary > or > and > equality > relational > add > mul > unary
    def parse(self) -> Column:
        e = self.ternary()
        if self.peek()[0] != "eof":
            raise NotImplementedError(
                f"js expression: trailing tokens at {self.peek()[1]!r}"
            )
        return e

    def ternary(self) -> Column:
        cond = self.logic_or()
        if self.peek() == ("op", "?"):
            self.take("?")
            a = self.ternary()
            self.take(":")
            b = self.ternary()
            return F.when(cond, a).otherwise(b)
        return cond

    def logic_or(self) -> Column:
        e = self.logic_and()
        while self.peek() == ("op", "||"):
            self.take("||")
            e = e | self.logic_and()
        return e

    def logic_and(self) -> Column:
        e = self.equality()
        while self.peek() == ("op", "&&"):
            self.take("&&")
            e = e & self.equality()
        return e

    def equality(self) -> Column:
        e = self.relational()
        while self.peek()[0] == "op" and self.peek()[1] in ("==", "!=", "===", "!=="):
            _, op = self.take()
            r = self.relational()
            e = (e == r) if op in ("==", "===") else (e != r)
        return e

    def relational(self) -> Column:
        e = self.additive()
        while self.peek()[0] == "op" and self.peek()[1] in ("<", "<=", ">", ">="):
            _, op = self.take()
            r = self.additive()
            e = {"<": e < r, "<=": e <= r, ">": e > r, ">=": e >= r}[op]
        return e

    def additive(self) -> Column:
        e = self.multiplicative()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            _, op = self.take()
            r = self.multiplicative()
            e = e + r if op == "+" else e - r
        return e

    def multiplicative(self) -> Column:
        e = self.unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            _, op = self.take()
            r = self.unary()
            e = {"*": e * r, "/": e / r, "%": e % r}[op]
        return e

    def unary(self) -> Column:
        if self.peek() == ("op", "-"):
            self.take("-")
            return -self.unary()
        if self.peek() == ("op", "!"):
            self.take("!")
            return ~self.unary()
        return self.postfix()

    _METHODS = {
        "toUpperCase": (0, lambda e: F.upper(e)),
        "toLowerCase": (0, lambda e: F.lower(e)),
        "trim": (0, lambda e: F.trim(e)),
        "concat": (1, lambda e, a: F.concat(e, a)),
        "indexOf": (1, lambda e, a: F.instr(e, a) - 1),  # JS is 0-based, -1 on miss
        "replace": (2, lambda e, a, b: F.replace(e, a, b)),
    }

    def postfix(self) -> Column:
        e = self.primary()
        while self.peek() == ("op", "."):
            self.take(".")
            _, name = self.take()
            if name == "length":
                e = F.length(e)
                continue
            if name == "substr":
                args = self.arglist()
                # JS substr(start, len) is 0-based; Spark substring 1-based
                if len(args) == 1:
                    e = F.substring(e, args[0] + 1, F.lit(2**31 - 1))
                elif len(args) == 2:
                    e = F.substring(e, args[0] + 1, args[1])
                else:
                    raise NotImplementedError("js expression: substr arity")
                continue
            if name == "substring":
                args = self.arglist()
                if len(args) != 2:
                    raise NotImplementedError("js expression: substring arity")
                e = F.substring(e, args[0] + 1, args[1] - args[0])
                continue
            if name in self._METHODS:
                arity, fn = self._METHODS[name]
                args = self.arglist()
                if len(args) != arity:
                    raise NotImplementedError(f"js expression: {name} arity")
                e = fn(e, *args)
                continue
            raise NotImplementedError(f"js expression: unsupported method .{name}()")
        return e

    def arglist(self) -> list[Column]:
        self.take("(")
        args: list[Column] = []
        if self.peek() != ("op", ")"):
            args.append(self.ternary())
            while self.peek() == ("op", ","):
                self.take(",")
                args.append(self.ternary())
        self.take(")")
        return args

    _MATH = {
        "abs": F.abs, "round": F.round, "floor": F.floor, "ceil": F.ceil,
        "sqrt": F.sqrt,
        "min": lambda *a: F.least(*a), "max": lambda *a: F.greatest(*a),
        "pow": lambda a, b: F.pow(a, b),
    }

    def primary(self) -> Column:
        kind, val = self.take()
        if kind == "num":
            return F.lit(float(val) if "." in val else int(val))
        if kind == "str":
            body = val[1:-1]
            body = re.sub(r"\\(.)", r"\1", body)
            return F.lit(body)
        if kind == "op" and val == "(":
            e = self.ternary()
            self.take(")")
            return e
        if kind == "name":
            if val == "Math":
                self.take(".")
                _, fname = self.take()
                if fname not in self._MATH:
                    raise NotImplementedError(
                        f"js expression: unsupported Math.{fname}"
                    )
                return self._MATH[fname](*self.arglist())
            if val in ("parseInt", "str2num"):
                (a,) = self.arglist()
                return a.cast("double").cast("long") if val == "parseInt" else a.cast(
                    "double"
                )
            if val in ("parseFloat",):
                (a,) = self.arglist()
                return a.cast("double")
            if val == "num2str":
                (a,) = self.arglist()
                return a.cast("string")
            if val == "true":
                return F.lit(True)
            if val == "false":
                return F.lit(False)
            if val == "null":
                return F.lit(None)
            if val in self.env:
                return self.env[val]
            return F.col(val)
        raise NotImplementedError(f"js expression: unexpected token {val!r}")


def compile_expr(src: str, env: dict[str, Column] | None = None) -> Column:
    """One JS expression → a Column. `env` maps script-local var names
    (earlier `var x = ...` lines) to their compiled expressions."""
    return _Parser(_tokenize(src), env or {}).parse()


_VAR_RE = re.compile(r"^\s*var\s+([A-Za-z_$][A-Za-z0-9_$]*)\s*=\s*(.+?);?\s*$")


def compile_script(script: str) -> dict[str, Column]:
    """A transform script (sequence of `var NAME = EXPR;` lines, // comments
    and blank lines allowed) → {var name: Column}. Later vars may reference
    earlier ones; the expressions inline (no intermediate columns)."""
    env: dict[str, Column] = {}
    for raw in script.splitlines():
        line = raw.split("//", 1)[0].strip()
        if not line:
            continue
        m = _VAR_RE.match(line)
        if m is None:
            raise NotImplementedError(
                f"ScriptValuesMod: only `var NAME = EXPR;` statements are "
                f"compilable to a Catalyst plan (got {line[:60]!r}); port this "
                "script to operators/scripting.py script_values (mapInPandas)"
            )
        name, expr = m.groups()
        env[name] = compile_expr(expr, env)
    return env
