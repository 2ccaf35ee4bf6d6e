"""Literal-heavy plan fragments rendered as SQL strings — ONE
``F.expr`` py4j call instead of one call per literal node (round 12).

Why: building an expression with per-element ``F.lit``/``F.array``
Columns costs a py4j round trip per node on the DRIVER (~1 ms each), so
a k×dim centroid matrix or a 1000-entry probability map burns hundreds
of milliseconds before Spark sees the query — per call, and per round
in iterative loops. Rendering the same tree as one SQL string moves the
construction into the JVM parser. Equivalence is exact: ``repr`` of a
Python float is its shortest round-trip form and the SQL parser's
``...D`` double literal parses it back to the identical bits, so every
pinned digest downstream is unchanged.
"""

from __future__ import annotations


def sql_double(x: float) -> str:
    """A SQL double literal that parses back to exactly ``x``."""
    return f"{float(x)!r}D"


def sql_double_array(values) -> str:
    """``array(...)`` of exact double literals."""
    return "array(" + ",".join(sql_double(x) for x in values) + ")"


_ESCAPES = {
    "\\": "\\\\",
    "'": "\\'",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\0": "\\0",
}


def sql_str(s: str) -> str:
    """A single-quoted SQL string literal evaluating to exactly ``s``
    (backslash escapes are live under Spark's default parser mode)."""
    return "'" + "".join(_ESCAPES.get(c, c) for c in s) + "'"
