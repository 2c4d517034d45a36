"""Property tests pinning Spark 4's ``WITH RECURSIVE`` semantics
against DuckDB (round-7 verdict ask #8).

The corpus relies on recursive CTEs through the verbatim dialect
passthrough (reference: node.rs:176 hands model SQL to the engine
unchanged), so the two engines' recursion contracts must agree on the
parts a model can observe:

- UNION ALL duplicate handling: on a multi-path DAG each distinct
  path contributes a row — reachability must be per-path, not
  per-node (the property below counts paths and compares exactly);
- termination: recursion stops when an iteration produces zero rows;
- the iteration cap: Spark bounds recursion (100 by default,
  ``spark.sql.cteRecursionLevelLimit``) and FAILS LOUD past it,
  DuckDB loops forever — so a corpus query must terminate under the
  cap, and depth-under-the-cap chains must agree between engines.

Every generated query is a DAG walk (edges only i -> j with i < j), so
termination is structural and both engines compute the same finite
relation.
"""

import os

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# a set of forward edges over nodes 0..7: acyclic by construction, so
# the recursion terminates on both engines within <= 7 iterations
_edge = (
    st.tuples(st.integers(0, 7), st.integers(0, 7))
    .filter(lambda t: t[0] != t[1])
    .map(lambda t: (min(t), max(t)))
)
_edges = st.sets(_edge, min_size=1, max_size=12).map(sorted)


def _reach_sql(edges) -> str:
    values = ", ".join(f"({s}, {d})" for s, d in edges)
    # identical ANSI text runs on both engines; path COUNT pins the
    # UNION ALL per-path multiplicity, not just the reachable set
    return f"""
        WITH RECURSIVE r(node, depth) AS (
          SELECT 0 AS node, 0 AS depth
          UNION ALL
          SELECT e.dst, r.depth + 1
          FROM r JOIN (VALUES {values}) AS e(src, dst) ON e.src = r.node
        )
        SELECT node, depth, COUNT(*) AS paths
        FROM r GROUP BY node, depth ORDER BY node, depth
    """


@given(_edges)
@settings(max_examples=20, deadline=None)
def test_recursive_dag_path_counts_match_duckdb(spark, edges):
    sql = _reach_sql(edges)
    got = [(r.node, r.depth, r.paths) for r in spark.sql(sql).collect()]
    want = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert got == want, f"edges={edges}"


@given(st.integers(2, 99))
@settings(max_examples=8, deadline=None)
def test_recursive_chain_depth_under_cap_matches_duckdb(spark, depth):
    """Linear recursion up to depth 99 — one below Spark's default
    100-level cap — agrees with DuckDB on every row."""
    sql = f"""
        WITH RECURSIVE t(n) AS (
          SELECT 1 AS n UNION ALL SELECT n + 1 FROM t WHERE n < {depth}
        )
        SELECT n FROM t ORDER BY n
    """
    got = [r.n for r in spark.sql(sql).collect()]
    want = [r[0] for r in duckdb.sql(sql).fetchall()]
    assert got == want == list(range(1, depth + 1))


def test_recursion_past_cap_fails_loud(spark):
    """A chain needing more iterations than the cap must ERROR, not
    silently truncate — the corpus's loud-failure contract. (DuckDB
    would run such a query to completion; a model hitting this raises
    the cap via spark.sql.cteRecursionLevelLimit knowingly.)"""
    with pytest.raises(Exception) as exc:
        spark.sql(
            """
            WITH RECURSIVE t(n) AS (
              SELECT 1 AS n UNION ALL SELECT n + 1 FROM t WHERE n < 500
            )
            SELECT COUNT(*) AS c FROM t
            """
        ).collect()
    assert "recurs" in str(exc.value).lower()


def test_recursion_cap_is_configurable(spark):
    """The documented escape hatch: raising the level limit lets the
    same 500-deep chain complete and agree with DuckDB's count."""
    limit_key = "spark.sql.cteRecursionLevelLimit"
    old = spark.conf.get(limit_key)
    try:
        spark.conf.set(limit_key, "600")
        sql = """
            WITH RECURSIVE t(n) AS (
              SELECT 1 AS n UNION ALL SELECT n + 1 FROM t WHERE n < 500
            )
            SELECT COUNT(*) AS c FROM t
        """
        assert spark.sql(sql).collect()[0].c == 500
        assert duckdb.sql(sql).fetchall()[0][0] == 500
    finally:
        spark.conf.set(limit_key, old)
