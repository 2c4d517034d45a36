"""Seeded randomized DML-script differential: every generated script —
a CREATE TABLE followed by a random mix of INSERT (VALUES, column-list,
self-referencing SELECT), UPDATE (expression + predicate combinations,
incl. NULL-producing ones), DELETE, and (round 14) joined forms —
UPDATE … FROM against a unique-key source (deterministic matches) and
DELETE … USING — runs verbatim on a live DuckDB and through the
dialect shim, and the final table contents must match exactly.
Deterministic seeds: a failure reproduces by seed number.

ALTER TABLE is exercised separately in test_dml.py (mixing it here
would make later fixed-arity INSERTs error, turning the fuzz into an
error-ordering test rather than a value-semantics one).
"""

import random

import duckdb
import pytest

from arnab_spark.dialect import transpile_statement


def _gen_script(rng: random.Random) -> list[str]:
    stmts = [
        "CREATE TABLE fz (i INTEGER, s VARCHAR, d DOUBLE, m DECIMAL(9,2))",
        # joined-DML source (round 14): UNIQUE k values, so every
        # UPDATE ... FROM match is unique and deterministic on both
        # engines (fan-out winners are engine-arbitrary by probe)
        "CREATE TABLE fzs (k INTEGER, w DOUBLE)",
        "INSERT INTO fzs VALUES (0, 1.5), (2, -0.5), (4, 2.25), (7, 0.0)",
    ]
    for _ in range(rng.randint(4, 8)):
        r = rng.random()
        if r < 0.06:
            pred = rng.choice(["fzs.w > 0", "fz.d IS NULL", None])
            stmts.append(
                "UPDATE fz SET d = coalesce(fz.d, 0) + fzs.w, i = fzs.k + 1 "
                "FROM fzs WHERE fz.i = fzs.k"
                + (f" AND {pred}" if pred else "")
            )
        elif r < 0.12:
            pred = rng.choice(["fzs.w < 1", "fz.s IS NOT NULL"])
            stmts.append(
                f"DELETE FROM fz USING fzs WHERE fz.i = fzs.k AND {pred}"
            )
        elif r < 0.40:
            rows = ", ".join(
                "({}, {}, {}, {})".format(
                    rng.randint(-5, 9),
                    rng.choice(["'a'", "'b'", "'x'", "NULL"]),
                    rng.choice(["NULL", str(round(rng.uniform(-2, 8), 2))]),
                    rng.choice(
                        ["NULL", "12.345", "-3.995", str(round(rng.uniform(-9, 9), 3))]
                    ),  # 3-decimal literals: DuckDB TRUNCATES into DECIMAL(9,2)
                )
                for _ in range(rng.randint(1, 3))
            )
            stmts.append(f"INSERT INTO fz VALUES {rows}")
        elif r < 0.50:
            stmts.append(rng.choice([
                "INSERT INTO fz (d, i) VALUES (3.5, 7)",
                "INSERT INTO fz (m) VALUES (7.815)",
                "INSERT INTO fz (i) VALUES (2.5)",
            ]))
        elif r < 0.60:
            stmts.append("INSERT INTO fz SELECT i + 10, upper(s), d, m FROM fz")
        elif r < 0.80:
            col, expr = rng.choice(
                [
                    ("i", "i * 2"),
                    ("i", "i + 1"),
                    ("s", "s || 'y'"),
                    ("s", "lower(s)"),
                    ("d", "coalesce(d, 0) + 1"),
                    ("d", "i"),  # cross-type: cast to the DOUBLE column
                    ("i", "d * 1.5"),  # float into the INTEGER column: DuckDB ROUNDS
                    ("m", "i + 0.125"),   # decimal scale reduction: DuckDB TRUNCATES
                    ("m", "d"),           # double into DECIMAL: both engines round
                    ("i", "m"),           # decimal into INTEGER: DuckDB ROUNDS
                    ("d", "NULL"),
                ]
            )
            pred = rng.choice(
                ["i % 2 = 0", "d > 1", "s LIKE 'a%'", "d IS NULL", None]
            )
            stmts.append(
                f"UPDATE fz SET {col} = {expr}"
                + (f" WHERE {pred}" if pred else "")
            )
        else:
            pred = rng.choice(
                ["i > 5", "d IS NULL", "s = 'x'", "d < 0", "s IS NULL"]
            )
            stmts.append(f"DELETE FROM fz WHERE {pred}")
    return stmts


@pytest.mark.parametrize("seed", range(20))
def test_random_dml_script_matches_duckdb(spark, seed):
    rng = random.Random(seed)
    script = _gen_script(rng)
    con = duckdb.connect()
    try:
        for stmt in script:
            con.execute(stmt)
            out = transpile_statement(stmt, spark)
            if out.strip():
                spark.sql(out)
        def key(t):
            return tuple((v is None, 0 if v is None else v) for v in t)

        got = sorted((tuple(r) for r in spark.table("fz").collect()), key=key)
        exp = sorted(con.execute("SELECT * FROM fz").fetchall(), key=key)
        assert got == exp, f"seed={seed}\nscript={script}"
    finally:
        con.close()
        for tbl in ("fz", "fzs"):
            out = transpile_statement(f"DROP TABLE {tbl}", spark)
            if out.strip():
                spark.sql(out)
