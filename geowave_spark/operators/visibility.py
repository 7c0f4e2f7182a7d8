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

import json
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


def resolve_field_visibility(
    definition: str | None, fields: list[str], auths: frozenset[str]
) -> list[bool]:
    """Per-field visibility verdicts for ONE JSON definition.

    The definition maps field-name REGEX patterns to visibility
    expressions; the FIRST matching pattern governs a field, so more
    specific patterns must precede general ones — the reference's
    documented contract (extensions/adapters/vector/.../visibility/
    JsonDefinitionColumnVisibilityManagement.java:1-60: example
    ``{"geo.*": "S", ".*": "TS"}``).  A field matching no pattern (or a
    null/empty definition) is public — the default-handler fallback of
    VisibilityManagement.createVisibilityHandler."""
    if not definition:
        return [True] * len(fields)
    patterns = list(json.loads(definition).items())  # insertion-ordered
    out = []
    for f in fields:
        expr = next(
            (v for pat, v in patterns if re.fullmatch(pat, f)), None
        )
        out.append(evaluate_visibility(expr, auths))
    return out


def apply_field_visibility(
    df: DataFrame,
    auths: set[str],
    vis_json_col: str = "field_vis",
    fields: list[str] | None = None,
) -> DataFrame:
    """Per-FIELD visibility masking — the reference's column-visibility
    model (core/store/.../data/field/FieldVisibilityHandler.java,
    data/visibility/VisibilityManagement.java, extensions/adapters/
    vector/.../visibility/FieldLevelVisibilityHandler.java): each field
    of a row carries its own visibility; a reader lacking the
    authorization still receives the ROW, with the unauthorized fields
    absent (here: NULL — the columnar rendering of Accumulo returning a
    row minus its invisible cells).  Compose :func:`apply_visibility`
    first for row-level gating.

    Scale shape: visibility DEFINITIONS are policy, not data, so their
    distinct set is small by construction.  Collect it, resolve each
    definition to a per-field boolean mask on the driver
    (:func:`resolve_field_visibility`), broadcast-join the masks back on
    the definition string, and mask with one ``when(mask, col)``
    projection — no shuffle, no per-row JSON parsing or regex matching.
    """
    a = frozenset(auths)
    fields = fields or [c for c in df.columns if c != vis_json_col]
    distinct = [r[0] for r in df.select(vis_json_col).distinct().collect()]
    mask_cols = [f"_fv_{i}" for i in range(len(fields))]
    spark = df.sparkSession
    schema = f"{vis_json_col} string, " + ", ".join(
        f"{m} boolean" for m in mask_cols
    )
    mask_df = spark.createDataFrame(
        [
            (d, *resolve_field_visibility(d, fields, a))
            for d in distinct
            if d is not None
        ],
        schema,
    )
    joined = df.join(F.broadcast(mask_df), vis_json_col, "left")
    # rows with a NULL definition miss the join; their fields are public
    masked = []
    for c in df.columns:
        if c in fields:
            m = mask_cols[fields.index(c)]
            masked.append(
                F.when(F.coalesce(F.col(m), F.lit(True)), F.col(c))
                .otherwise(F.lit(None))
                .alias(c)
            )
        else:
            masked.append(F.col(c))
    return joined.select(*masked)


# ---------------------------------------------------------------------------
# pluggable user → authorization-set providers (the reference's
# AuthorizationSPI family, extensions/adapters/auth/): the JSON-file
# provider reads the same document shape as
# JsonFileAuthorizationProvider.java / AuthorizationSet.java —
# {"authorizationSet": {"<user>": ["auth", ...], ...}} — and an unknown
# user resolves to the EMPTY set (fail closed), exactly the reference's
# findAuthorizationsFor contract.
# ---------------------------------------------------------------------------


def load_auth_provider(path: str):
    """JSON file → ``auths_for(user) -> frozenset[str]``.

    Malformed documents raise immediately (the reference wraps parse
    errors in IllegalArgumentException at construction — never at query
    time)."""
    import json

    with open(path) as f:
        doc = json.load(f)
    aset = doc.get("authorizationSet")
    if not isinstance(aset, dict) or not all(
        isinstance(k, str)
        and isinstance(v, list)
        and all(isinstance(a, str) for a in v)
        for k, v in aset.items()
    ):
        raise ValueError(
            f"{path}: expected {{'authorizationSet': {{user: [auth, ...]}}}}"
        )
    table = {u: frozenset(v) for u, v in aset.items()}

    def auths_for(user: str) -> frozenset:
        return table.get(user, frozenset())

    return auths_for


def empty_auth_provider():
    """EmptyAuthorizationProvider.java: every user gets no authorizations."""
    return lambda user: frozenset()
