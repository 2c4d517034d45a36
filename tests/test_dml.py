"""Differential tests for the dialect DML lift (INSERT / DELETE /
UPDATE / TRUNCATE through the node.rs:176 passthrough).

Every behavioral case runs the SAME statement script against a live
DuckDB table and against this engine's temp-view table through
``transpile_statement``, then compares the final relation exactly
(order-insensitive). Persistence cases additionally verify that a
warehouse-backed table's parquet dir was swapped on disk.
"""

import os

import duckdb
import pytest

from arnab_spark import dialect
from arnab_spark.dialect import table_backing_for, transpile_statement
from arnab_spark.errors import ArnabError


@pytest.fixture()
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _run(spark, stmt: str) -> None:
    out = transpile_statement(stmt, spark)
    if out.strip():
        spark.sql(out)


def _table_rows(spark, con, name: str, order: str):
    got = [
        tuple(r)
        for r in spark.sql(f"SELECT * FROM {name} ORDER BY {order}").collect()
    ]
    exp = con.execute(f"SELECT * FROM {name} ORDER BY {order}").fetchall()
    return got, exp


BASE = (
    "SELECT * FROM (VALUES (1, 'a', 10.5), (2, 'b', NULL), (3, 'c', 7.25)) "
    "AS t(id, tag, score)"
)


@pytest.fixture()
def dml_table(spark, con):
    """Same three-row table on both engines, created through the SAME
    statement: a DuckDB TABLE and an engine session table (the
    CREATE TABLE lift registers it as mutable)."""
    stmt = f"CREATE TABLE dml_t AS {BASE}"
    con.execute(stmt)
    _run(spark, stmt)
    yield "dml_t"
    _run(spark, "DROP TABLE dml_t")


def test_insert_values_positional(spark, con, dml_table):
    stmt = "INSERT INTO dml_t VALUES (4, 'd', 1.0), (5, 'e', NULL)"
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp and len(got) == 5


def test_insert_column_list_fills_null(spark, con, dml_table):
    stmt = "INSERT INTO dml_t (tag, id) VALUES ('z', 9)"
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    assert got[-1] == (9, "z", None)


def test_insert_by_name_select(spark, con, dml_table):
    stmt = "INSERT INTO dml_t BY NAME SELECT 'q' AS tag, 11 AS id"
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    assert got[-1] == (11, "q", None)


def test_insert_select_self_reads_pre_insert_snapshot(spark, con, dml_table):
    stmt = "INSERT INTO dml_t SELECT id + 100, tag, score FROM dml_t"
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp and len(got) == 6


def test_insert_casts_to_column_types(spark, con, dml_table):
    # DuckDB casts the VARCHAR '12' and the INT 3 to the target types
    stmt = "INSERT INTO dml_t VALUES ('12', 42, 3)"
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    assert got[-1] == (12, "42", 3.0)


def test_insert_arity_mismatch_raises(spark, dml_table):
    with pytest.raises(ArnabError, match="3 columns but 2 values"):
        _run(spark, "INSERT INTO dml_t VALUES (1, 'x')")


def test_insert_unknown_column_raises(spark, dml_table):
    with pytest.raises(ArnabError, match="do not exist"):
        _run(spark, "INSERT INTO dml_t (nope) VALUES (1)")


def test_insert_or_replace_and_default_values_raise_targeted(spark, dml_table):
    with pytest.raises(ArnabError, match="PRIMARY"):
        _run(spark, "INSERT OR REPLACE INTO dml_t VALUES (1, 'a', 0.0)")
    with pytest.raises(ArnabError, match="DEFAULT VALUES"):
        _run(spark, "INSERT INTO dml_t DEFAULT VALUES")


def test_joined_dml_subqueries_stay_plain(spark, dml_table):
    """Parenthesized subqueries in predicates or assignments must NOT
    trip the top-level FROM/USING scan that routes to the joined-DML
    handlers — these are plain single-table statements."""
    _run(spark, "UPDATE dml_t SET tag = (SELECT 'z' FROM range(1)) WHERE id = 1")
    _run(spark, "DELETE FROM dml_t WHERE id IN (SELECT 99 FROM range(1))")
    got = spark.sql("SELECT tag FROM dml_t WHERE id = 1").collect()
    assert got[0][0] == "z"


# ---------------------------------------------------------------- joined DML
# UPDATE … FROM and DELETE … USING (round 14 — closes r13 "What's
# missing #1"). Probed DuckDB semantics this suite pins:
#   - DELETE … USING is a semi-join delete; RETURNING yields one row
#     PER MATCH (duplicates on fan-out);
#   - UPDATE … FROM updates matched rows; the fan-out winner is
#     physical-scan-arbitrary in DuckDB, so value-exact comparisons
#     use unique-match fixtures and fan-out is asserted as one-of;
#   - assignment coercion rounds float→integral (2.6→3);
#   - the FROM/USING text may be a table, a subquery, or a comma list.


@pytest.fixture()
def src_table(spark, con):
    stmt = (
        "CREATE TABLE dml_s AS SELECT * FROM (VALUES "
        "(1, 50.0, 'X'), (2, 20.0, 'Y'), (2, 99.0, 'Z'), "
        "(5, 5.0, 'W'), (NULL, 77.0, 'N')) AS s(id, nv, lbl)"
    )
    con.execute(stmt)
    _run(spark, stmt)
    yield "dml_s"
    _run(spark, "DROP TABLE dml_s")


def test_update_from_unique_match(spark, con, dml_table, src_table):
    # id=2 excluded -> every surviving match is unique -> value-exact
    stmt = (
        "UPDATE dml_t SET score = s.nv FROM dml_s s "
        "WHERE dml_t.id = s.id AND s.id <> 2"
    )
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    assert got[0] == (1, "a", 50.0)


def test_update_from_mixed_expression_and_extra_pred(spark, con, dml_table, src_table):
    stmt = (
        "UPDATE dml_t SET score = dml_t.score + s.nv, tag = upper(dml_t.tag) "
        "FROM dml_s s WHERE dml_t.id = s.id AND s.lbl = 'X'"
    )
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    assert got[0] == (1, "A", 60.5)


def test_update_from_subquery_source(spark, con, dml_table, src_table):
    # aggregated subquery -> one source row per id -> deterministic
    stmt = (
        "UPDATE dml_t SET score = q.mnv FROM "
        "(SELECT id, max(nv) AS mnv FROM dml_s GROUP BY id) q "
        "WHERE dml_t.id = q.id"
    )
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    assert got[1] == (2, "b", 99.0)


def test_update_from_comma_relation_list(spark, con, dml_table, src_table):
    stmt = (
        "UPDATE dml_t SET score = s.nv + o.one FROM dml_s s, "
        "(SELECT 1 AS one) o WHERE dml_t.id = s.id AND s.id = 1"
    )
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    assert got[0] == (1, "a", 51.0)


def test_update_from_fanout_winner_is_one_of(spark, con, dml_table, src_table):
    """DuckDB's fan-out winner is scan-order-arbitrary (probed both
    orders), so the engines may legitimately disagree on WHICH source
    row wins — the contract is: some matching row's value, exactly one
    update per target row, non-matching rows untouched."""
    _run(spark, "UPDATE dml_t SET score = s.nv FROM dml_s s WHERE dml_t.id = s.id")
    rows = {
        r[0]: tuple(r)
        for r in spark.sql("SELECT * FROM dml_t ORDER BY id").collect()
    }
    assert len(rows) == 3
    assert rows[1] == (1, "a", 50.0)
    assert rows[2][2] in (20.0, 99.0)
    assert rows[3] == (3, "c", 7.25)


def test_update_from_returning_is_per_match(spark, con, dml_table, src_table):
    """RETURNING on a fan-out yields one row PER MATCH with that
    match's NEW values (probed) — deterministic as a set even though
    the table's winner is not."""
    stmt = (
        "UPDATE dml_t SET score = s.nv FROM dml_s s "
        "WHERE dml_t.id = s.id RETURNING id, score"
    )
    exp_ret = con.execute(stmt).fetchall()
    got_ret = _run_returning(spark, stmt)
    assert sorted(got_ret) == sorted(exp_ret) == [(1, 50.0), (2, 20.0), (2, 99.0)]


def test_update_from_no_match_is_noop(spark, con, dml_table, src_table):
    stmt = (
        "UPDATE dml_t SET score = s.nv FROM dml_s s "
        "WHERE dml_t.id = s.id AND s.nv > 1e9 RETURNING *"
    )
    exp_ret = con.execute(stmt).fetchall()
    got_ret = _run_returning(spark, stmt)
    assert got_ret == exp_ret == []
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp and len(got) == 3


def test_update_from_coercion_rounds_like_duckdb(spark, con, src_table):
    stmt_mk = "CREATE TABLE dml_i AS SELECT * FROM (VALUES (1, 10), (2, 20)) AS t(id, v)"
    con.execute(stmt_mk)
    _run(spark, stmt_mk)
    try:
        stmt = (
            "UPDATE dml_i SET v = s.nv / 19.0 FROM dml_s s "
            "WHERE dml_i.id = s.id AND s.id = 1"
        )
        # 50.0 / 19.0 = 2.63… -> DuckDB assignment-coerces by ROUNDING
        con.execute(stmt)
        _run(spark, stmt)
        got, exp = _table_rows(spark, con, "dml_i", "id")
        assert got == exp
        assert got[0] == (1, 3)
    finally:
        _run(spark, "DROP TABLE dml_i")


def test_update_from_ambiguous_unqualified_errors_both(spark, con, dml_table, src_table):
    # "nv" is unambiguous (source-only) but "score" would not be; probe
    # the unambiguous case binds, the ambiguous one errors in BOTH
    stmt = "UPDATE dml_t SET score = nv FROM dml_s s WHERE dml_t.id = s.id AND s.id = 1"
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    with pytest.raises(Exception, match="(?i)ambiguous"):
        con.execute("UPDATE dml_t SET score = id FROM dml_s s WHERE dml_t.id = s.id")
    with pytest.raises(Exception, match="(?i)ambiguous"):
        _run(spark, "UPDATE dml_t SET score = id FROM dml_s s WHERE dml_t.id = s.id")


def test_delete_using_semi_join(spark, con, dml_table, src_table):
    stmt = "DELETE FROM dml_t USING dml_s s WHERE dml_t.id = s.id"
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp == [(3, "c", 7.25)]


def test_delete_using_subquery(spark, con, dml_table, src_table):
    stmt = (
        "DELETE FROM dml_t USING (SELECT id FROM dml_s WHERE nv > 90) q "
        "WHERE dml_t.id = q.id"
    )
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp and [r[0] for r in got] == [1, 3]


def test_delete_using_returning_duplicates_per_match(spark, con, dml_table, src_table):
    stmt = "DELETE FROM dml_t USING dml_s s WHERE dml_t.id = s.id RETURNING id, tag"
    exp_ret = con.execute(stmt).fetchall()
    got_ret = _run_returning(spark, stmt)
    assert sorted(got_ret) == sorted(exp_ret) == [(1, "a"), (2, "b"), (2, "b")]
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp


def test_joined_dml_returning_star_is_target_columns_only(spark, con, dml_table, src_table):
    """Probed DuckDB scope rule: RETURNING * on joined DML exposes ONLY
    the target's columns (the USING/FROM relation is not referencable
    from RETURNING — DuckDB binder-errors on s.<col>, and so does this
    engine since the frozen view carries exactly the target schema)."""
    stmt = (
        "DELETE FROM dml_t USING (SELECT id FROM dml_s WHERE nv > 90) q "
        "WHERE dml_t.id = q.id RETURNING *"
    )
    exp_ret = con.execute(stmt).fetchall()
    got_ret = _run_returning(spark, stmt)
    key = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
    assert sorted(got_ret, key=key) == sorted(exp_ret, key=key)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    with pytest.raises(Exception):
        con.execute("UPDATE dml_t SET score = s.nv FROM dml_s s WHERE dml_t.id = s.id RETURNING s.nv")
    with pytest.raises(Exception):
        _run_returning(spark, "UPDATE dml_t SET score = s.nv FROM dml_s s WHERE dml_t.id = s.id RETURNING s.nv")


def test_delete_using_without_where_deletes_all_when_nonempty(spark, con, dml_table, src_table):
    stmt = "DELETE FROM dml_t USING dml_s"
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp == []


def test_dml_target_alias_differential(spark, con, dml_table, src_table):
    """Target aliases (round 14, probed DuckDB grammar): UPDATE t [AS] x
    and DELETE FROM t [AS] x bind the relation under ONLY the alias —
    the base name is hidden (DuckDB binder-errors on t.col when
    aliased, and so does this engine since the relation is exposed
    solely under the alias)."""
    for stmt in (
        "UPDATE dml_t AS x SET score = x.score + 1 WHERE x.id = 1",
        "UPDATE dml_t x SET tag = upper(x.tag) WHERE x.id <= 2",
        "DELETE FROM dml_t AS x WHERE x.id = 3",
        "UPDATE dml_t AS x SET score = s.nv FROM dml_s s WHERE x.id = s.id AND s.id = 1",
        "DELETE FROM dml_t AS x USING dml_s s WHERE x.id = s.id AND s.lbl = 'Y'",
    ):
        con.execute(stmt)
        _run(spark, stmt)
        got, exp = _table_rows(spark, con, "dml_t", "id")
        assert got == exp, stmt
    # alias hides the base name — both engines reject t-qualified refs
    with pytest.raises(Exception):
        con.execute("UPDATE dml_t AS x SET score = dml_t.score WHERE x.id = 1")
    with pytest.raises(Exception):
        _run(spark, "UPDATE dml_t AS x SET score = dml_t.score WHERE x.id = 1")


def test_dml_target_alias_with_returning(spark, con, dml_table, src_table):
    stmt = (
        "UPDATE dml_t AS x SET score = s.nv FROM dml_s s "
        "WHERE x.id = s.id AND s.id = 1 RETURNING id, score"
    )
    exp_ret = con.execute(stmt).fetchall()
    got_ret = _run_returning(spark, stmt)
    assert sorted(got_ret) == sorted(exp_ret) == [(1, 50.0)]


def test_joined_dml_unresolvable_target_raises_targeted(spark, src_table):
    with pytest.raises(ArnabError, match="not an engine table"):
        _run(spark, "UPDATE no_such_t SET x = s.nv FROM dml_s s WHERE no_such_t.id = s.id")
    with pytest.raises(ArnabError, match="not an engine table"):
        _run(spark, "DELETE FROM no_such_t USING dml_s s WHERE no_such_t.id = s.id")


def test_returning_alias_in_insert_body_is_not_a_clause(spark, con, dml_table):
    """Misfire guard (round 14, advice): a column alias literally named
    ``returning`` inside an unparenthesized INSERT … SELECT body is
    LEGAL DuckDB (probed) and must not be stripped as a RETURNING
    clause — the remainder carries a top-level FROM."""
    stmt = "INSERT INTO dml_t SELECT id + 50, tag AS returning, score FROM dml_t"
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp and len(got) == 6


def test_returning_on_non_engine_table_raises_targeted(spark):
    """Round 14 (advice): RETURNING on a target this engine does not
    own must raise the targeted error style, not fall through to a raw
    Spark parse error on the un-stripped statement."""
    spark.sql("DROP TABLE IF EXISTS native_ret_t")
    spark.sql("CREATE TABLE native_ret_t (id INT) USING parquet")
    try:
        with pytest.raises(ArnabError, match="RETURNING"):
            _run(spark, "INSERT INTO native_ret_t VALUES (1) RETURNING *")
    finally:
        spark.sql("DROP TABLE IF EXISTS native_ret_t")


def test_returning_views_are_reaped(spark, con, dml_table):
    """Round 14 (advice): each RETURNING statement freezes its rows
    under a temp view; the NEXT returning statement must reap the
    previous one, bounding a long session to one outstanding view."""
    _run_returning(spark, "UPDATE dml_t SET score = 1 WHERE id = 1 RETURNING id")
    _run_returning(spark, "UPDATE dml_t SET score = 2 WHERE id = 1 RETURNING id")
    _run_returning(spark, "UPDATE dml_t SET score = 3 WHERE id = 1 RETURNING id")
    leftover = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("__arnab_returning_")
    ]
    assert len(leftover) <= 1


def test_prior_returning_df_collectable_after_next_statement(spark, con, dml_table):
    """Round 15 (advice): the reap between RETURNING statements drops
    only the temp VIEW — the checkpoint is NOT eagerly unpersisted, so
    a caller holding the PRIOR RETURNING DataFrame un-collected
    (spark.sql is lazy about execution) can still collect it after the
    next RETURNING statement ran."""
    out1 = transpile_statement(
        "UPDATE dml_t SET score = 41 WHERE id = 1 RETURNING id, score", spark
    )
    df1 = spark.sql(out1)  # analyzed, NOT collected
    _run_returning(spark, "UPDATE dml_t SET score = 42 WHERE id = 2 RETURNING id")
    assert [tuple(r) for r in df1.collect()] == [(1, 41.0)]


def test_run_file_exit_reaps_final_returning_view(spark, tmp_path):
    """Round 15 (r14 verdict ask #6): the LAST RETURNING statement of a
    run leaves one frozen view outstanding; the CLI run-file exit path
    must reap it so no __arnab_returning_* view survives a completed
    run. (Session.run's epilogue does the same for the model loop.)"""
    from arnab_spark.cli import main

    script = tmp_path / "ret.sql"
    script.write_text(
        "CREATE TABLE IF NOT EXISTS arnab_ret_smoke AS SELECT 1 AS x;\n"
        "INSERT INTO arnab_ret_smoke VALUES (2) RETURNING *;\n"
    )
    try:
        assert main(["run-file", str(script)]) == 0
        leftover = [
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith("__arnab_returning_")
        ]
        assert leftover == []
    finally:
        spark.sql("DROP TABLE IF EXISTS arnab_ret_smoke")


def test_joined_dml_pruned_rewrite_on_backed_table(spark, con, tmp_path):
    """Backed hive-partitioned table: joined UPDATE and DELETE keep the
    partition-pruned copy-on-write fast path — the untouched
    partition's part files are NOT rewritten, the layout survives, and
    the final contents match DuckDB."""
    import glob

    dest = str(tmp_path / "jt")
    spark.sql(
        "SELECT * FROM (VALUES (1, 'p1', 10.0), (2, 'p1', 20.0), "
        "(3, 'p2', 30.0), (4, 'p2', 40.0)) AS t(id, part, score)"
    ).write.partitionBy("part").parquet(dest)
    spark.read.parquet(dest).createOrReplaceTempView("jt")
    table_backing_for(spark)["jt"] = dest
    con.execute(
        "CREATE TABLE jt AS SELECT * FROM (VALUES (1, 'p1', 10.0), "
        "(2, 'p1', 20.0), (3, 'p2', 30.0), (4, 'p2', 40.0)) AS t(id, part, score)"
    )
    con.execute("CREATE TABLE js AS SELECT * FROM (VALUES (1, 5.0), (3, 7.0)) AS s(id, d)")
    _run(spark, "CREATE TABLE js AS SELECT * FROM (VALUES (1, 5.0), (3, 7.0)) AS s(id, d)")
    try:
        p2_before = set(glob.glob(f"{dest}/part=p2/*.parquet"))
        stmt = "UPDATE jt SET score = jt.score + js.d FROM js WHERE jt.id = js.id AND js.id = 1"
        con.execute(stmt)
        _run(spark, stmt)
        assert set(glob.glob(f"{dest}/part=p2/*.parquet")) == p2_before
        got = [
            tuple(r)
            for r in spark.sql("SELECT id, part, score FROM jt ORDER BY id").collect()
        ]
        exp = con.execute("SELECT id, part, score FROM jt ORDER BY id").fetchall()
        assert got == exp
        assert got[0] == (1, "p1", 15.0)

        p1_files = set(glob.glob(f"{dest}/part=p1/*.parquet"))
        stmt = "DELETE FROM jt USING js WHERE jt.id = js.id"
        con.execute(stmt)
        _run(spark, stmt)
        assert set(glob.glob(f"{dest}/part=p1/*.parquet")) != p1_files
        got = [
            tuple(r)
            for r in spark.sql("SELECT id, part, score FROM jt ORDER BY id").collect()
        ]
        exp = con.execute("SELECT id, part, score FROM jt ORDER BY id").fetchall()
        assert got == exp and [r[0] for r in got] == [2, 4]
        # layout survived both statements
        assert glob.glob(f"{dest}/part=p1/*.parquet")
    finally:
        table_backing_for(spark).pop("jt", None)
        spark.catalog.dropTempView("jt")
        _run(spark, "DROP TABLE js")


def _run_returning(spark, stmt: str):
    out = transpile_statement(stmt, spark)
    return [tuple(r) for r in spark.sql(out).collect()] if out.strip() else []


@pytest.mark.parametrize(
    "stmt",
    [
        "INSERT INTO dml_t VALUES (9, 'z', 1.5) RETURNING *",
        "INSERT INTO dml_t (tag) VALUES ('q') RETURNING id, upper(tag) AS ut",
        "UPDATE dml_t SET score = score + 1 WHERE id < 3 RETURNING id, score",
        "UPDATE dml_t SET score = 0 WHERE id > 99 RETURNING *",  # no-op
        "DELETE FROM dml_t WHERE score IS NULL RETURNING tag",
        "DELETE FROM dml_t RETURNING *",
    ],
)
def test_dml_returning_differential(spark, con, dml_table, stmt):
    """RETURNING (round 13, closes a documented residue): DuckDB yields
    the affected rows as a relation — INSERT: the rows as inserted,
    DELETE: the deleted rows, UPDATE: the updated rows with their NEW
    values. Each statement's returned set AND the post-statement table
    must match DuckDB exactly."""
    exp_ret = con.execute(stmt).fetchall()
    got_ret = _run_returning(spark, stmt)
    key = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
    assert sorted(got_ret, key=key) == sorted(exp_ret, key=key), stmt
    got, exp = _table_rows(spark, con, "dml_t", "tag")
    assert got == exp, stmt


def test_returning_freezes_the_inserted_batch(spark, con, dml_table):
    """The RETURNING rows must be the batch that actually mutated —
    one evaluation, frozen pre-append — so a second SELECT from the
    table agrees with the returned rows (and with DuckDB)."""
    stmt = (
        "INSERT INTO dml_t SELECT id + 100, tag || '!', score FROM dml_t "
        "RETURNING id, tag"
    )
    exp_ret = con.execute(stmt).fetchall()
    got_ret = _run_returning(spark, stmt)
    assert sorted(got_ret) == sorted(exp_ret)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp


def test_insert_body_gets_dialect_rewrites(spark, con, dml_table):
    """The INSERT source is DuckDB dialect too — list subscripting is
    1-based and list_transform must rewrite inside the body."""
    stmt = (
        "INSERT INTO dml_t SELECT list_transform([7], x -> x + 1)[1], "
        "'lst', NULL"
    )
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    assert got[-1][0] == 8


def test_delete_where_null_predicate_keeps_row(spark, con, dml_table):
    # score IS NULL row: predicate evaluates NULL -> DuckDB keeps it
    stmt = "DELETE FROM dml_t WHERE score < 8"
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    assert [r[0] for r in got] == [1, 2]


def test_delete_without_where_empties(spark, con, dml_table):
    con.execute("DELETE FROM dml_t")
    _run(spark, "DELETE FROM dml_t")
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp == []


def test_truncate(spark, con, dml_table):
    con.execute("TRUNCATE dml_t")
    _run(spark, "TRUNCATE dml_t")
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp == []
    # schema survives the truncate
    assert [f.lower() for f in spark.table("dml_t").columns] == [
        "id",
        "tag",
        "score",
    ]


def test_update_where_and_cast_to_column_type(spark, con, dml_table):
    # the assignment expression is an INT; DuckDB casts to the DOUBLE col
    stmt = "UPDATE dml_t SET score = id * 2 WHERE tag <> 'b'"
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    assert [r[2] for r in got] == [2.0, None, 6.0]


def test_update_swap_uses_old_row_values(spark, con):
    con.execute("CREATE TABLE dml_swap AS SELECT 1 AS a, 2 AS b")
    _run(spark, "CREATE TEMP TABLE dml_swap AS SELECT 1 AS a, 2 AS b")
    try:
        stmt = "UPDATE dml_swap SET a = b, b = a"
        con.execute(stmt)
        _run(spark, stmt)
        got, exp = _table_rows(spark, con, "dml_swap", "a")
        assert got == exp == [(2, 1)]
    finally:
        _run(spark, "DROP TABLE dml_swap")


def test_update_without_where_touches_all_rows(spark, con, dml_table):
    stmt = "UPDATE dml_t SET tag = upper(tag)"
    con.execute(stmt)
    _run(spark, stmt)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    assert [r[1] for r in got] == ["A", "B", "C"]


def test_update_unknown_or_duplicate_column_raises(spark, dml_table):
    with pytest.raises(ArnabError, match="does not exist"):
        _run(spark, "UPDATE dml_t SET nope = 1")
    with pytest.raises(ArnabError, match="multiple assignments"):
        _run(spark, "UPDATE dml_t SET id = 1, id = 2")


def test_dml_persists_through_backed_table_swap(spark, tmp_path):
    """A warehouse-backed table (the engine's `materialize: table`
    output) takes DML through a staged parquet swap: the on-disk dir —
    what a NEXT session reattaches — reflects the mutation."""
    dest = str(tmp_path / "backed_t")
    spark.sql(BASE.replace("SELECT * FROM", "SELECT * FROM")).write.parquet(dest)
    spark.read.parquet(dest).createOrReplaceTempView("backed_t")
    table_backing_for(spark)["backed_t"] = dest
    try:
        _run(spark, "INSERT INTO backed_t VALUES (4, 'd', 0.5)")
        _run(spark, "DELETE FROM backed_t WHERE id = 2")
        _run(spark, "UPDATE backed_t SET tag = tag || '!' WHERE id = 1")
        on_disk = [
            tuple(r)
            for r in spark.read.parquet(dest).orderBy("id").collect()
        ]
        assert on_disk == [(1, "a!", 10.5), (3, "c", 7.25), (4, "d", 0.5)]
        # and the staging/old dirs were cleaned up
        assert not os.path.exists(dest + "__dml_staging")
        assert not os.path.exists(dest + "__dml_old")
    finally:
        table_backing_for(spark).pop("backed_t", None)
        spark.catalog.dropTempView("backed_t")


def test_dml_against_attached_catalog_is_read_only(spark, tmp_path):
    from arnab_spark.dialect import _attached_for

    _attached_for(spark)["ext"] = {"items"}
    try:
        with pytest.raises(ArnabError, match="read-only"):
            _run(spark, "INSERT INTO ext.items VALUES (1)")
        with pytest.raises(ArnabError, match="read-only"):
            _run(spark, "DELETE FROM ext.items WHERE 1=1")
    finally:
        _attached_for(spark).pop("ext", None)


def test_native_catalog_table_insert_still_passes_through(spark):
    """INSERT INTO a real Spark catalog table must stay native (the
    pre-existing passthrough behavior the DDL smoke test pins) — the
    DML pass returns None so the body still gets dialect rewrites."""
    spark.sql("CREATE TABLE IF NOT EXISTS dml_native_t AS SELECT 1 AS x")
    try:
        out = transpile_statement(
            "INSERT INTO dml_native_t SELECT list_transform([1], x -> x + 1)[1]",
            spark,
        )
        assert out.strip().upper().startswith("INSERT INTO")
        assert "transform" in out  # body rewritten, statement left native
        spark.sql(out)
        assert spark.table("dml_native_t").count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS dml_native_t")


def test_memory_main_qualifiers_strip_like_duckdb(spark, con, dml_table):
    stmt_duck = "INSERT INTO memory.main.dml_t VALUES (7, 'm', 0.0)"
    con.execute(stmt_duck)
    _run(spark, stmt_duck)
    got, exp = _table_rows(spark, con, "dml_t", "id")
    assert got == exp
    assert got[-1][0] == 7


def test_create_temp_table_schema_only_then_insert(spark, con):
    """The classic DuckDB scratch pattern: CREATE TEMP TABLE (schema
    only) + INSERT — neither form parses on native Spark (probed)."""
    stmt = "CREATE TEMP TABLE dml_scratch (id INTEGER, name VARCHAR)"
    con.execute(stmt)
    _run(spark, stmt)
    try:
        ins = "INSERT INTO dml_scratch VALUES (1, 'x'), (2, 'y')"
        con.execute(ins)
        _run(spark, ins)
        got, exp = _table_rows(spark, con, "dml_scratch", "id")
        assert got == exp == [(1, "x"), (2, "y")]
    finally:
        _run(spark, "DROP TABLE dml_scratch")


def test_create_or_replace_table_replaces(spark, con):
    for stmt in (
        "CREATE TABLE dml_cor AS SELECT 1 AS x",
        "CREATE OR REPLACE TABLE dml_cor AS SELECT 5 AS x, 'v' AS y",
    ):
        con.execute(stmt)
        _run(spark, stmt)
    try:
        got, exp = _table_rows(spark, con, "dml_cor", "x")
        assert got == exp == [(5, "v")]
    finally:
        _run(spark, "DROP TABLE dml_cor")


def test_create_table_exists_semantics(spark, con):
    _run(spark, "CREATE TABLE dml_ex AS SELECT 1 AS x")
    try:
        with pytest.raises(ArnabError, match="already exists"):
            _run(spark, "CREATE TABLE dml_ex AS SELECT 2 AS x")
        # IF NOT EXISTS: silent no-op, contents untouched
        _run(spark, "CREATE TABLE IF NOT EXISTS dml_ex AS SELECT 2 AS x")
        assert [r.x for r in spark.table("dml_ex").collect()] == [1]
    finally:
        _run(spark, "DROP TABLE dml_ex")


def test_create_table_constraints_raise_targeted(spark):
    with pytest.raises(ArnabError, match="plain `name TYPE`"):
        _run(spark, "CREATE TEMP TABLE dml_pk (id INTEGER PRIMARY KEY)")


def test_spark_shaped_create_table_stays_native(spark):
    out = transpile_statement(
        "CREATE TABLE dml_native USING parquet AS SELECT 1 AS x", spark
    )
    assert out.strip().upper().startswith("CREATE TABLE")


def test_dml_against_view_raises_like_duckdb(spark):
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_v AS SELECT 1 AS x")
    try:
        with pytest.raises(ArnabError, match="is a view"):
            _run(spark, "INSERT INTO dml_v VALUES (2)")
        with pytest.raises(ArnabError, match="is a view"):
            _run(spark, "DELETE FROM dml_v WHERE x = 1")
        with pytest.raises(ArnabError, match="view, not a table"):
            _run(spark, "DROP TABLE dml_v")
        assert spark.catalog.tableExists("dml_v")  # NOT silently dropped
    finally:
        spark.catalog.dropTempView("dml_v")


def test_drop_view_against_table_raises_like_duckdb(spark):
    _run(spark, "CREATE TEMP TABLE dml_dv AS SELECT 1 AS x")
    try:
        with pytest.raises(ArnabError, match="is a table"):
            _run(spark, "DROP VIEW dml_dv")
    finally:
        _run(spark, "DROP TABLE dml_dv")


def test_create_table_persists_in_warehouse_and_drop_removes(spark, tmp_path):
    """With a warehouse open (DuckDB: a .duckdb file on disk), script
    CREATE TABLE persists as a catalogued parquet dir a next session
    reattaches; DROP TABLE removes dir + catalog entry."""
    from arnab_spark.catalog import attach_warehouse, load_catalog
    from arnab_spark.dialect import set_warehouse_for

    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    set_warehouse_for(spark, wh)
    try:
        _run(spark, "CREATE TABLE dml_wh AS SELECT 42 AS answer")
        dest = os.path.join(wh, "dml_wh")
        assert os.path.isdir(dest)
        assert load_catalog(wh)["dml_wh"]["materialize"] == "table"
        # a "next session" (fresh attach) sees it
        spark.catalog.dropTempView("dml_wh")
        table_backing_for(spark).pop("dml_wh", None)
        assert "dml_wh" in attach_warehouse(spark, wh)
        assert spark.table("dml_wh").collect()[0].answer == 42
        _run(spark, "DROP TABLE dml_wh")
        assert not os.path.exists(dest)
        assert "dml_wh" not in load_catalog(wh)
        assert not spark.catalog.tableExists("dml_wh")
    finally:
        from arnab_spark.dialect import _WAREHOUSE_BY_SESSION

        _WAREHOUSE_BY_SESSION.pop(spark, None)
        table_backing_for(spark).pop("dml_wh", None)


def test_engine_model_pipeline_with_dml(spark, tmp_path):
    """Engine-path proof (the node.rs:176 passthrough): a model whose
    script INSERTs into, DELETEs from, and UPDATEs an earlier table
    model, run through the real Session/Node machinery against a
    warehouse — the statements a DuckDB-backed reference project would
    execute verbatim."""
    import textwrap

    from arnab_spark.config import load_config
    from arnab_spark.session import Session

    root = str(tmp_path)
    models = tmp_path / "models"
    models.mkdir()
    (models / "seed.sql").write_text(
        "SELECT * FROM (VALUES (1, 'keep'), (2, 'drop')) AS t(id, verdict)"
    )
    (models / "mutated.sql").write_text(
        "INSERT INTO seed VALUES (3, 'keep');\n"
        "DELETE FROM seed WHERE verdict = 'drop';\n"
        "UPDATE seed SET verdict = verdict || 'er' WHERE id = 3;\n"
        "SELECT * FROM seed"
    )
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            """\
            models_dir: models
            db_path: warehouse
            models:
              seed:
                materialize: table
            """
        )
    )
    try:
        report = Session(load_config(root), spark).run(quiet=True)
        assert report.ok, report.errors
        rows = [tuple(r) for r in spark.table("mutated").orderBy("id").collect()]
        assert rows == [(1, "keep"), (3, "keeper")]
        # the seed TABLE's parquet dir was swapped in the warehouse
        disk = [
            tuple(r)
            for r in spark.read.parquet(os.path.join(root, "warehouse", "seed"))
            .orderBy("id")
            .collect()
        ]
        assert disk == [(1, "keep"), (3, "keeper")]
    finally:
        for v in ("seed", "mutated"):
            try:
                spark.catalog.dropTempView(v)
            except Exception:
                pass
        dialect.reset_macros(spark)


# ---------------------------------------------------------------- ALTER TABLE


def test_alter_add_rename_drop_type_matches_duckdb(spark, con):
    stmts = [
        "CREATE TABLE dml_alt AS SELECT 1 AS a, 'x' AS b",
        "ALTER TABLE dml_alt ADD COLUMN c DOUBLE",
        "ALTER TABLE dml_alt RENAME COLUMN a TO a2",
        "ALTER TABLE dml_alt DROP COLUMN b",
        "ALTER TABLE dml_alt ALTER COLUMN a2 TYPE VARCHAR",
        "INSERT INTO dml_alt VALUES ('7', 2.5)",
    ]
    try:
        for s in stmts:
            con.execute(s)
            _run(spark, s)
        got, exp = _table_rows(spark, con, "dml_alt", "a2")
        assert got == exp == [("1", None), ("7", 2.5)]
        assert [f.lower() for f in spark.table("dml_alt").columns] == ["a2", "c"]
    finally:
        _run(spark, "DROP TABLE dml_alt")


def test_alter_type_using_expression(spark, con):
    try:
        for s in (
            "CREATE TABLE dml_use AS SELECT 5 AS n",
            "ALTER TABLE dml_use ALTER COLUMN n SET DATA TYPE VARCHAR USING n || '!'",
        ):
            con.execute(s)
            _run(spark, s)
        got, exp = _table_rows(spark, con, "dml_use", "n")
        assert got == exp == [("5!",)]
    finally:
        _run(spark, "DROP TABLE dml_use")


def test_alter_rename_table(spark, con):
    try:
        for s in (
            "CREATE TABLE dml_rt AS SELECT 9 AS x",
            "ALTER TABLE dml_rt RENAME TO dml_rt2",
        ):
            con.execute(s)
            _run(spark, s)
        got, exp = _table_rows(spark, con, "dml_rt2", "x")
        assert got == exp == [(9,)]
        assert not spark.catalog.tableExists("dml_rt")
    finally:
        _run(spark, "DROP TABLE dml_rt2")


def test_alter_rename_backed_table_moves_dir(spark, tmp_path):
    from arnab_spark.dialect import _WAREHOUSE_BY_SESSION, set_warehouse_for
    from arnab_spark.catalog import load_catalog

    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    set_warehouse_for(spark, wh)
    try:
        _run(spark, "CREATE TABLE dml_mv AS SELECT 1 AS x")
        _run(spark, "ALTER TABLE dml_mv RENAME TO dml_mv2")
        assert not os.path.exists(os.path.join(wh, "dml_mv"))
        assert os.path.isdir(os.path.join(wh, "dml_mv2"))
        cat = load_catalog(wh)
        assert "dml_mv" not in cat and "dml_mv2" in cat
        assert spark.table("dml_mv2").collect()[0].x == 1
        _run(spark, "DROP TABLE dml_mv2")
    finally:
        _WAREHOUSE_BY_SESSION.pop(spark, None)
        for n in ("dml_mv", "dml_mv2"):
            table_backing_for(spark).pop(n, None)


def test_alter_errors_match_duckdb_posture(spark):
    _run(spark, "CREATE TEMP TABLE dml_ae AS SELECT 1 AS a")
    try:
        with pytest.raises(ArnabError, match="already exists"):
            _run(spark, "ALTER TABLE dml_ae ADD COLUMN a INT")
        _run(spark, "ALTER TABLE dml_ae ADD COLUMN IF NOT EXISTS a INT")  # no-op
        with pytest.raises(ArnabError, match="does not exist"):
            _run(spark, "ALTER TABLE dml_ae DROP COLUMN z")
        _run(spark, "ALTER TABLE dml_ae DROP COLUMN IF EXISTS z")  # no-op
        with pytest.raises(ArnabError, match="only column"):
            _run(spark, "ALTER TABLE dml_ae DROP COLUMN a")
        with pytest.raises(ArnabError, match="DEFAULT"):
            _run(spark, "ALTER TABLE dml_ae ADD COLUMN d INT DEFAULT 7")
        with pytest.raises(ArnabError, match="unsupported action"):
            _run(spark, "ALTER TABLE dml_ae SET LOGGED")
    finally:
        _run(spark, "DROP TABLE dml_ae")


def test_alter_view_raises(spark):
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_av AS SELECT 1 AS x")
    try:
        with pytest.raises(ArnabError, match="view, not a table"):
            _run(spark, "ALTER TABLE dml_av ADD COLUMN y INT")
    finally:
        spark.catalog.dropTempView("dml_av")


# --------------------------------------------------------- CREATE VIEW lift


def test_create_view_over_temp_table_works(spark):
    """Spark forbids permanent views over temp views; DuckDB does not —
    the lift makes the DuckDB-shaped script run."""
    _run(spark, "CREATE TEMP TABLE dml_cvt AS SELECT 1 AS x")
    try:
        _run(spark, "CREATE VIEW dml_cv AS SELECT x + 1 AS y FROM dml_cvt")
        assert spark.table("dml_cv").collect()[0].y == 2
        with pytest.raises(ArnabError, match="already exists"):
            _run(spark, "CREATE VIEW dml_cv AS SELECT 0 AS y")
        _run(spark, "CREATE VIEW IF NOT EXISTS dml_cv AS SELECT 0 AS y")  # no-op
        _run(spark, "CREATE OR REPLACE VIEW dml_cv AS SELECT 9 AS y")
        assert spark.table("dml_cv").collect()[0].y == 9
    finally:
        _run(spark, "DROP VIEW dml_cv")
        _run(spark, "DROP TABLE dml_cvt")


def test_create_view_persists_in_warehouse(spark, tmp_path):
    from arnab_spark.catalog import load_catalog
    from arnab_spark.dialect import _WAREHOUSE_BY_SESSION, set_warehouse_for

    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    set_warehouse_for(spark, wh)
    try:
        _run(spark, "CREATE VIEW dml_pv AS SELECT 3 AS z")
        entry = load_catalog(wh)["dml_pv"]
        assert entry["materialize"] == "view" and "SELECT" in entry["select"].upper()
        _run(spark, "DROP VIEW dml_pv")
        assert "dml_pv" not in load_catalog(wh)
    finally:
        _WAREHOUSE_BY_SESSION.pop(spark, None)
        try:
            spark.catalog.dropTempView("dml_pv")
        except Exception:
            pass


def test_insert_on_conflict_raises_targeted(spark, dml_table):
    with pytest.raises(ArnabError, match="ON CONFLICT"):
        _run(
            spark,
            "INSERT INTO dml_t VALUES (1, 'a', 0.0) ON CONFLICT DO NOTHING",
        )


# --------------------------------------------- COPY FROM / EXPORT / IMPORT


def test_copy_from_csv_and_parquet_matches_duckdb(spark, con, tmp_path):
    d = str(tmp_path)
    con.execute("CREATE TABLE src AS SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y'")
    con.execute(f"COPY src TO '{d}/src.csv' (FORMAT CSV, HEADER)")
    con.execute(f"COPY src TO '{d}/src.parquet' (FORMAT PARQUET)")
    stmts = [
        "CREATE TABLE dml_cf (a INTEGER, b VARCHAR)",
        f"COPY dml_cf FROM '{d}/src.csv' (FORMAT CSV, HEADER)",
        f"COPY dml_cf FROM '{d}/src.parquet' (FORMAT PARQUET)",
    ]
    try:
        for s in stmts:
            con.execute(s)
            _run(spark, s)
        got, exp = _table_rows(spark, con, "dml_cf", "a, b")
        assert got == exp == [(1, "x"), (1, "x"), (2, "y"), (2, "y")]
    finally:
        _run(spark, "DROP TABLE dml_cf")


def test_copy_from_casts_csv_strings_to_target_types(spark, tmp_path):
    p = tmp_path / "n.csv"
    p.write_text("5,2.5\n6,\n")
    _run(spark, "CREATE TEMP TABLE dml_cast (n INTEGER, f DOUBLE)")
    try:
        _run(spark, f"COPY dml_cast FROM '{p}'")
        rows = sorted(tuple(r) for r in spark.table("dml_cast").collect())
        assert rows == [(5, 2.5), (6, None)]
    finally:
        _run(spark, "DROP TABLE dml_cast")


@pytest.fixture()
def hermetic_tables(spark):
    """Snapshot-and-restore the session's table registries (backing,
    session tables, warehouse) — EXPORT DATABASE exports everything the
    session registers, so under the full suite an earlier pipeline's
    leaked entries would otherwise change what an export includes and
    what the re-import collides with (already-existing tables/views
    abort the import loudly, which is DuckDB's own IMPORT behavior)."""
    from arnab_spark.dialect import (
        _WAREHOUSE_BY_SESSION,
        session_tables_for,
        set_warehouse_for,
    )

    prev_wh = _WAREHOUSE_BY_SESSION.pop(spark, None)
    backing = table_backing_for(spark)
    stables = session_tables_for(spark)
    prev_backing, prev_stables = dict(backing), set(stables)
    backing.clear()
    stables.clear()
    yield
    _WAREHOUSE_BY_SESSION.pop(spark, None)
    if prev_wh is not None:
        set_warehouse_for(spark, prev_wh)
    backing.clear()
    backing.update(prev_backing)
    stables.clear()
    stables.update(prev_stables)


def test_export_import_roundtrip(spark, tmp_path, hermetic_tables):
    from arnab_spark.dialect import set_warehouse_for

    d = str(tmp_path / "exp")
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    set_warehouse_for(spark, wh)
    _run(spark, "CREATE TEMP TABLE dml_exp AS SELECT 1 AS n, 'a' AS s")
    try:
        _run(spark, f"EXPORT DATABASE '{d}' (FORMAT PARQUET)")
        assert os.path.isfile(os.path.join(d, "schema.sql"))
        assert os.path.isfile(os.path.join(d, "load.sql"))
        _run(spark, "DROP TABLE dml_exp")
        _run(spark, f"IMPORT DATABASE '{d}'")
        rows = [tuple(r) for r in spark.table("dml_exp").collect()]
        assert rows == [(1, "a")]
    finally:
        _run(spark, "DROP TABLE dml_exp")


def test_export_loads_into_real_duckdb(spark, con, tmp_path, hermetic_tables):
    """The exported dir must be loadable by an actual DuckDB — schema
    column lists plus parquet-glob COPY FROM statements."""
    d = str(tmp_path / "exp2")
    _run(spark, "CREATE TEMP TABLE dml_x AS SELECT 7 AS k, 1.5 AS v")
    try:
        _run(spark, f"EXPORT DATABASE '{d}' (FORMAT PARQUET)")
        for script in ("schema.sql", "load.sql"):
            with open(os.path.join(d, script)) as fh:
                for stmt in fh.read().split(";"):
                    if stmt.strip():
                        con.execute(stmt)
        assert con.execute("SELECT * FROM dml_x").fetchall() == [(7, 1.5)]
    finally:
        _run(spark, "DROP TABLE dml_x")


def test_import_real_duckdb_export(spark, con, tmp_path):
    """A dir exported by a REAL DuckDB imports through the shim: its
    CREATE TABLE column lists and COPY FROM statements are exactly the
    lifted shapes."""
    d = str(tmp_path / "dexp")
    con.execute("CREATE TABLE dml_di (n INTEGER, s VARCHAR)")
    con.execute("INSERT INTO dml_di VALUES (1,'a'),(2,'b')")
    con.execute(f"EXPORT DATABASE '{d}' (FORMAT PARQUET)")
    try:
        _run(spark, f"IMPORT DATABASE '{d}'")
        rows = sorted(tuple(r) for r in spark.table("dml_di").collect())
        assert rows == [(1, "a"), (2, "b")]
    finally:
        _run(spark, "DROP TABLE dml_di")


def test_export_import_roundtrip_csv(spark, tmp_path, hermetic_tables):
    """DuckDB's default export format round-trips too: header CSVs with
    cast-per-target-type on the way back in."""
    d = str(tmp_path / "expc")
    _run(spark, "CREATE TEMP TABLE dml_expc AS SELECT 2 AS n, 1.5 AS f, 'b' AS s")
    try:
        _run(spark, f"EXPORT DATABASE '{d}'")  # FORMAT defaults to CSV
        _run(spark, "DROP TABLE dml_expc")
        _run(spark, f"IMPORT DATABASE '{d}'")
        rows = [tuple(r) for r in spark.table("dml_expc").collect()]
        assert rows == [(2, 1.5, "b")]
    finally:
        _run(spark, "DROP TABLE dml_expc")


def test_insert_update_round_to_integral_like_duckdb(spark, con):
    """DuckDB's assignment coercion ROUNDS float→integral half-away-
    from-zero (probed: 3.7→4, 2.5→3, -3.5→-4) where Spark's CAST
    truncates — the alignment must follow DuckDB."""
    stmts = [
        "CREATE TABLE dml_rnd (i INTEGER, d DOUBLE)",
        "INSERT INTO dml_rnd VALUES (3.7, 1.0), (2.5, 2.0), (-3.5, 3.0)",
        "INSERT INTO dml_rnd (i) VALUES (1.5)",
        "UPDATE dml_rnd SET i = d * 1.5 WHERE d = 1.0",
    ]
    try:
        for s in stmts:
            con.execute(s)
            _run(spark, s)
        got, exp = _table_rows(spark, con, "dml_rnd", "d NULLS FIRST, i")
        assert got == exp
        assert [r[0] for r in got] == [2, 2, 3, -4]
    finally:
        _run(spark, "DROP TABLE dml_rnd")


# ------------------------------------- copy-on-write fast paths (backed)


def _files(d):
    out = {}
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
    return out


def test_partitioned_backed_dml_rewrites_only_touched_partitions(
    spark, con, tmp_path
):
    """The 100 TB DML contract: INSERT appends O(batch) files; DELETE/
    UPDATE rewrite only the hive partitions their predicate touches —
    proven by untouched partitions' part-files keeping their exact
    paths and mtimes; a fully-emptied partition's dir is dropped.
    Values stay differential against a DuckDB twin."""
    dest = str(tmp_path / "pt")
    spark.sql(
        "SELECT * FROM (VALUES (1, 10, 'a'), (1, 11, 'b'), (2, 20, 'c')) "
        "AS t(p, v, s)"
    ).write.partitionBy("p").parquet(dest)
    spark.read.parquet(dest).createOrReplaceTempView("pt")
    table_backing_for(spark)["pt"] = dest
    con.execute(
        "CREATE TABLE pt AS SELECT * FROM (VALUES (10, 'a', 1), (11, 'b', 1), "
        "(20, 'c', 2)) AS t(v, s, p)"
    )
    try:
        p2_before = {k: m for k, m in _files(dest).items() if "p=2" in k}

        stmts = [
            "INSERT INTO pt (v, s, p) VALUES (12, 'd', 1), (30, 'e', 3)",
            "DELETE FROM pt WHERE v = 11",      # touches p=1 only
            "UPDATE pt SET s = upper(s) WHERE p = 1",
            "DELETE FROM pt WHERE p = 3",       # empties the partition
            "DELETE FROM pt WHERE v = 999",     # matches nothing: no-op
        ]
        for stmt in stmts:
            con.execute(stmt)
            _run(spark, stmt)

        # untouched partition: exact same files, byte-for-byte mtimes
        p2_after = {k: m for k, m in _files(dest).items() if "p=2" in k}
        assert p2_after == p2_before
        # the emptied partition's dir is gone
        assert not os.path.exists(os.path.join(dest, "p=3"))
        got = sorted(
            (r.v, r.s, r.p) for r in spark.table("pt").collect()
        )
        exp = sorted(con.execute("SELECT v, s, p FROM pt").fetchall())
        assert got == exp == [(10, "A", 1), (12, "D", 1), (20, "c", 2)]
    finally:
        table_backing_for(spark).pop("pt", None)
        spark.catalog.dropTempView("pt")
        con.execute("DROP TABLE pt")


def test_flat_backed_insert_appends_without_rewrite(spark, tmp_path):
    dest = str(tmp_path / "flat")
    spark.sql("SELECT 1 AS x").write.parquet(dest)
    spark.read.parquet(dest).createOrReplaceTempView("flat_t")
    table_backing_for(spark)["flat_t"] = dest
    try:
        before = _files(dest)
        _run(spark, "INSERT INTO flat_t VALUES (2)")
        after = _files(dest)
        # the original file is untouched; the batch arrived as new files
        assert all(after[k] == m for k, m in before.items())
        assert len(after) > len(before)
        assert sorted(r.x for r in spark.table("flat_t").collect()) == [1, 2]
    finally:
        table_backing_for(spark).pop("flat_t", None)
        spark.catalog.dropTempView("flat_t")


def test_full_swap_preserves_hive_layout(spark, tmp_path):
    """An UPDATE assigning the partition column takes the full-swap
    fallback — which must re-write WITH the partitioning (the DML scale
    harness caught the plain rewrite silently flattening the dirs and
    disabling every later pruned fast path)."""
    dest = str(tmp_path / "pl")
    spark.sql(
        "SELECT * FROM (VALUES (1, 10), (2, 20)) AS t(p, v)"
    ).write.partitionBy("p").parquet(dest)
    spark.read.parquet(dest).createOrReplaceTempView("pl_t")
    table_backing_for(spark)["pl_t"] = dest
    try:
        _run(spark, "UPDATE pl_t SET p = 3 WHERE v = 10")  # moves partitions
        dirs = sorted(d for d in os.listdir(dest) if d.startswith("p="))
        assert dirs == ["p=2", "p=3"]
        got = sorted((r.v, r.p) for r in spark.table("pl_t").collect())
        assert got == [(10, 3), (20, 2)]
    finally:
        table_backing_for(spark).pop("pl_t", None)
        spark.catalog.dropTempView("pl_t")


def test_create_table_all_types_insert_select_matches_duckdb(spark, con):
    """Schema-only CREATE TABLE across the common DuckDB type surface,
    then INSERT literals needing casts — the values must round-trip
    identically on both engines (DATE/TIMESTAMP/DECIMAL/BOOLEAN
    included)."""
    ddl = (
        "CREATE TABLE dml_ty (a SMALLINT, b BIGINT, c DOUBLE, "
        "d VARCHAR, e BOOLEAN, f DATE, g TIMESTAMP, h DECIMAL(9,2))"
    )
    ins = (
        "INSERT INTO dml_ty VALUES "
        "(1, 2, 3.5, 'x', true, DATE '2024-02-29', "
        "TIMESTAMP '2024-02-29 12:34:56', 12.345), "
        "(NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)"
    )
    try:
        for s in (ddl, ins):
            con.execute(s)
            _run(spark, s)
        got, exp = _table_rows(spark, con, "dml_ty", "a NULLS LAST")
        assert got == exp
        # decimal->decimal scale reduction TRUNCATES in DuckDB (probed:
        # 12.345 -> 12.34, where Spark's plain CAST would round to 12.35)
        from decimal import Decimal

        assert got[0][7] == Decimal("12.34")
    finally:
        _run(spark, "DROP TABLE dml_ty")
        con.execute("DROP TABLE dml_ty")


def test_delete_escaped_partition_values_falls_back_correctly(spark, tmp_path):
    """Partition values Spark URL-escapes in dir names (spaces, colons)
    must NOT take the pruned path — its fully-dead-dir cleanup locates
    dirs by plain col=value formatting and would leave deleted rows
    readable. The fallback full swap must produce correct results."""
    dest = str(tmp_path / "esc")
    spark.sql(
        "SELECT * FROM (VALUES ('a b', 1), ('c:d', 2), ('plain', 3)) AS t(p, v)"
    ).write.partitionBy("p").parquet(dest)
    spark.read.parquet(dest).createOrReplaceTempView("esc_t")
    table_backing_for(spark)["esc_t"] = dest
    try:
        _run(spark, "DELETE FROM esc_t WHERE p = 'a b'")
        got = sorted((r.p, r.v) for r in spark.table("esc_t").collect())
        assert got == [("c:d", 2), ("plain", 3)]
        _run(spark, "DELETE FROM esc_t WHERE p = 'plain'")  # pruned path ok
        got = sorted((r.p, r.v) for r in spark.table("esc_t").collect())
        assert got == [("c:d", 2)]
    finally:
        table_backing_for(spark).pop("esc_t", None)
        spark.catalog.dropTempView("esc_t")

def test_truncate_and_full_delete_keep_partitioned_table_readable(
    spark, con, tmp_path
):
    """Round-12 ADVICE (high): TRUNCATE / DELETE-without-WHERE / a DELETE
    killing every partition used to destroy a hive-partitioned backed
    table — an empty frame written with partitionBy produces no parquet
    files, so the swap left a fileless dir and the next read raised
    UNABLE_TO_INFER_SCHEMA. DuckDB leaves an empty table with intact
    schema; so must we, and a later INSERT must revive it."""
    for i, stmt in enumerate(
        ["TRUNCATE ept", "DELETE FROM ept", "DELETE FROM ept WHERE v > 0"]
    ):
        name, dest = f"ept{i}", str(tmp_path / f"ept{i}")
        stmt = stmt.replace("ept", name)
        spark.sql(
            "SELECT * FROM (VALUES (1, 10, 'a'), (2, 20, 'b')) AS t(p, v, s)"
        ).write.partitionBy("p").parquet(dest)
        spark.read.parquet(dest).createOrReplaceTempView(name)
        table_backing_for(spark)[name] = dest
        con.execute(
            f"CREATE TABLE {name} AS SELECT * FROM "
            "(VALUES (1, 10, 'a'), (2, 20, 'b')) AS t(p, v, s)"
        )
        try:
            con.execute(stmt)
            _run(spark, stmt)
            # the table survives empty, with its schema intact
            t = spark.table(name)
            assert t.count() == 0
            assert sorted(c.lower() for c in t.columns) == ["p", "s", "v"]
            # and a later INSERT revives it on both engines
            ins = f"INSERT INTO {name} (p, v, s) VALUES (3, 30, 'c')"
            con.execute(ins)
            _run(spark, ins)
            got = sorted(
                (r["p"], r["v"], r["s"]) for r in spark.table(name).collect()
            )
            exp = sorted(con.execute(f"SELECT p, v, s FROM {name}").fetchall())
            assert got == exp == [(3, 30, "c")]
        finally:
            table_backing_for(spark).pop(name, None)
            spark.catalog.dropTempView(name)
            con.execute(f"DROP TABLE {name}")


def test_copy_from_backed_appends_without_rewrite(spark, con, tmp_path):
    """Round-12 ADVICE (low): COPY <table> FROM on a backed table must
    take the same O(batch) part-file append as INSERT — the existing
    files keep their exact paths and mtimes."""
    dest = str(tmp_path / "cfb")
    spark.sql(
        "SELECT * FROM (VALUES (1, 10), (2, 20)) AS t(p, v)"
    ).write.partitionBy("p").parquet(dest)
    spark.read.parquet(dest).createOrReplaceTempView("cfb_t")
    table_backing_for(spark)["cfb_t"] = dest
    # the hive-partitioned dir reads back partition-cols-LAST (v, p), so
    # the DuckDB twin and the CSV batch use that column order (same
    # convention as test_partitioned_backed_dml_rewrites_only_touched_
    # partitions)
    load = str(tmp_path / "batch.csv")
    with open(load, "w") as f:
        f.write("v,p\n11,1\n30,3\n")
    con.execute("CREATE TABLE cfb_t AS SELECT * FROM (VALUES (10, 1), (20, 2)) AS t(v, p)")
    try:
        before = _files(dest)
        stmt = f"COPY cfb_t FROM '{load}' (FORMAT CSV, HEADER)"
        con.execute(stmt)
        _run(spark, stmt)
        after = _files(dest)
        assert all(after[k] == m for k, m in before.items())  # no rewrite
        assert len(after) > len(before)
        got = sorted((r.p, r.v) for r in spark.table("cfb_t").collect())
        exp = sorted(con.execute("SELECT p, v FROM cfb_t").fetchall())
        assert got == exp == [(1, 10), (1, 11), (2, 20), (3, 30)]
    finally:
        table_backing_for(spark).pop("cfb_t", None)
        spark.catalog.dropTempView("cfb_t")
        con.execute("DROP TABLE cfb_t")


def test_alter_partition_column_degrades_layout_instead_of_failing(
    spark, con, tmp_path
):
    """Round-12 ADVICE (low): DROP/RENAME/TYPE on a hive PARTITION column
    of a backed table used to error inside _dml_persist (partitionBy on
    a now-missing name). DuckDB succeeds; we succeed by degrading to a
    flat (or renamed-column) layout."""
    cases = [
        ("ALTER TABLE apc DROP COLUMN p", "v", [(10,), (20,)]),
        ("ALTER TABLE apc RENAME COLUMN p TO q", "v, q", [(10, 1), (20, 2)]),
        ("ALTER TABLE apc ALTER COLUMN p TYPE VARCHAR", "v, p", [(10, "1"), (20, "2")]),
    ]
    for i, (stmt, sel, expected) in enumerate(cases):
        name, dest = f"apc{i}", str(tmp_path / f"apc{i}")
        stmt = stmt.replace("apc", name)
        spark.sql(
            "SELECT * FROM (VALUES (1, 10), (2, 20)) AS t(p, v)"
        ).write.partitionBy("p").parquet(dest)
        spark.read.parquet(dest).createOrReplaceTempView(name)
        table_backing_for(spark)[name] = dest
        con.execute(
            f"CREATE TABLE {name} AS SELECT * FROM (VALUES (1, 10), (2, 20)) AS t(p, v)"
        )
        try:
            con.execute(stmt)
            _run(spark, stmt)
            q = f"SELECT {sel} FROM {name} ORDER BY v"
            got = [tuple(r) for r in spark.sql(q).collect()]
            exp = con.execute(q).fetchall()
            assert got == exp == expected, stmt
        finally:
            table_backing_for(spark).pop(name, None)
            spark.catalog.dropTempView(name)
            con.execute(f"DROP TABLE {name}")
