"""Deterministic scale-up generator: replicate a driver testdata dir K×
with key shifts and content mutations, so scale-gate runs (bench.py /
extra_gate.py at sf1) have an input whose DERIVED structure spreads
instead of duplicating.

No randomness and no external data: replica r of a row shifts its key by
r*stride and mutates content deterministically —
  events      event_id/user_id shift (the geo derivation hashes event_id,
              so replicas land at new positions), ts +r seconds
  documents   word-rotation by 7r + an 'r{r}d{id}' prefix (shingles mostly
              change → near-dup groups stay bounded instead of every doc
              gaining 9 exact copies, which would blow pair joins quadratically)
  embeddings  element rotation by r (norm-preserving)
  orders/lineitem/customer/supplier/part   key shifts
  region/nation   copied verbatim (TPC-H dims do not scale)

Usage: python tools/gen_sf.py --src /root/testdata/sf0.1 --out .data/sf1 --k 10
"""

from __future__ import annotations

import argparse
import os

import duckdb

TAB_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}
VERBATIM = ["region", "nation"]


def _strides(con, src: str, table: str, keys: list[str]) -> dict[str, int]:
    row = con.sql(
        "SELECT "
        + ", ".join(f"MAX({k}) + 1 AS {k}" for k in keys)
        + f" FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()
    return dict(zip(keys, row))


def generate(src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rep = f"(SELECT unnest(generate_series(0, {k - 1})) AS r) reps"

    for t in VERBATIM:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    for t, keys in TAB_KEYS.items():
        st = _strides(con, src, t, keys)
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()]
        sel = ", ".join(
            f"t.{c} + reps.r * {st[c]} AS {c}" if c in st else f"t.{c}"
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet') t, {rep} "
            f"ORDER BY {keys[0]}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    e = _strides(con, src, "events", ["event_id", "user_id"])
    con.sql(
        f"""COPY (
  SELECT t.event_id + reps.r * {e['event_id']} AS event_id,
         t.ts + to_seconds(reps.r) AS ts,
         t.user_id + reps.r * {e['user_id']} AS user_id,
         t.event_type, t.value, t.props
  FROM read_parquet('{src}/events.parquet') t, {rep}
  ORDER BY event_id
) TO '{out}/events.parquet' (FORMAT PARQUET)"""
    )

    d = _strides(con, src, "documents", ["doc_id"])["doc_id"]
    con.sql(
        f"""COPY (
  WITH rot AS (
    SELECT t.doc_id + reps.r * {d} AS doc_id,
           CASE WHEN reps.r = 0 THEN t.text ELSE
             'r' || reps.r || 'd' || t.doc_id || ' ' ||
             array_to_string(
               list_concat(
                 words[1 + ((7 * reps.r) % len(words)):],
                 words[:((7 * reps.r) % len(words))]), ' ')
           END AS text,
           t.lang, t.source
    FROM (SELECT *, string_split(text, ' ') AS words
          FROM read_parquet('{src}/documents.parquet')) t, {rep}
  )
  SELECT doc_id, text, lang, source, length(text) AS n_chars
  FROM rot ORDER BY doc_id
) TO '{out}/documents.parquet' (FORMAT PARQUET)"""
    )

    v = _strides(con, src, "embeddings", ["vec_id"])["vec_id"]
    con.sql(
        f"""COPY (
  SELECT t.vec_id + reps.r * {v} AS vec_id,
         CASE WHEN reps.r = 0 THEN t.embedding ELSE
           list_concat(
             t.embedding[1 + (reps.r % len(t.embedding)):],
             t.embedding[:(reps.r % len(t.embedding))])
         END::FLOAT[] AS embedding,
         t.label
  FROM read_parquet('{src}/embeddings.parquet') t, {rep}
  ORDER BY vec_id
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    con.close()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=10)
    a = ap.parse_args(argv)
    generate(a.src, a.out, a.k)
    con = duckdb.connect()
    for t in list(TAB_KEYS) + VERBATIM + ["events", "documents", "embeddings"]:
        n = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{a.out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}\t{n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
