"""Row-level visibility filtering — the reference's visibility/auth model
(core/store/.../data/visibility/*, extensions/adapters/vector/.../plugin/
visibility/*): each row carries a visibility expression over labels
("a", "a&b", "a|b"); a scan with authorizations {labels} returns rows
whose expression is satisfied.

Spark-first shape: visibility EXPRESSIONS are inherently low-cardinality
(they're policy labels, not data), so evaluation is: distinct expressions
→ driver-side boolean evaluation against the auth set → broadcast
semi-join of the allowed set.  One tiny broadcast; no per-row parsing.

Expression grammar (the common Accumulo subset): label, '&' conjunction,
'|' disjunction, parentheses; empty/null visibility = public.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN = re.compile(r"[A-Za-z0-9_\-]+|[&|()]")


def evaluate_visibility(expr: str | None, auths: frozenset[str]) -> bool:
    """Evaluate one visibility expression against an authorization set."""
    if expr is None or expr == "":
        return True

    tokens = _TOKEN.findall(expr)
    pos = 0

    def parse_or() -> bool:
        nonlocal pos
        v = parse_and()
        while pos < len(tokens) and tokens[pos] == "|":
            pos += 1
            v = parse_and() or v
        return v

    def parse_and() -> bool:
        nonlocal pos
        v = parse_atom()
        while pos < len(tokens) and tokens[pos] == "&":
            pos += 1
            v = parse_atom() and v
        return v

    def parse_atom() -> bool:
        nonlocal pos
        t = tokens[pos]
        if t == "(":
            pos += 1
            v = parse_or()
            pos += 1  # ')'
            return v
        pos += 1
        return t in auths

    return parse_or()


def apply_visibility(
    df: DataFrame, auths: set[str], vis_col: str = "vis"
) -> DataFrame:
    """Rows whose visibility expression the authorizations satisfy.

    Distinct expressions are collected (small by construction), evaluated
    on the driver, and the allowed set broadcast-semi-joined back."""
    a = frozenset(auths)
    distinct = [r[0] for r in df.select(vis_col).distinct().collect()]
    allowed = [v for v in distinct if evaluate_visibility(v, a)]
    spark = df.sparkSession
    null_ok = any(v is None for v in allowed)
    allow_df = spark.createDataFrame(
        [(v,) for v in allowed if v is not None], f"{vis_col} string"
    )
    out = df.join(F.broadcast(allow_df), vis_col, "left_semi")
    if null_ok:
        out = out.unionByName(df.filter(F.col(vis_col).isNull()))
    return out
