"""Composition fuzz for the round-4 dialect statement features
(round-4 verdict item 5): macros (with defaults), ATTACH'd tables,
SUMMARIZE, FROM-first arms, strftime literals and date_diff are each
differentially tested in isolation — regex-based passes break where
features COMPOSE, so these tests generate statements that nest them:
a macro call inside a FROM-first arm, an ATTACH'd table under
statement-form PIVOT, date_diff inside a macro default, strftime
inside a macro body under SUMMARIZE, and macro arguments carrying
string literals full of function-looking text (the round-5
quote-awareness fix). Every statement runs VERBATIM on DuckDB and
through ``transpile_statement`` on Spark over identical fixtures;
results must match exactly.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arnab_spark import dialect
from arnab_spark.dialect import transpile_statement
from arnab_spark.spark_utils import register_views

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    register_views(spark, SF, ("orders",))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    # a real .duckdb file for ATTACH composition on BOTH engines
    dbfile = str(tmp_path_factory.mktemp("attach") / "ext.duckdb")
    fcon = duckdb.connect(dbfile)
    fcon.execute(
        f"""CREATE TABLE ord AS
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate
            FROM read_parquet('{SF}/orders.parquet') WHERE o_orderkey < 600"""
    )
    fcon.close()
    return spark, con, dbfile


def _run_pair(spark, con, stmts):
    """Execute the statement list on both engines; return the final
    statement's sorted row tuples from each."""
    dialect.reset_macros(spark)
    dialect.reset_attached(spark)
    fresh = duckdb.connect()
    fresh.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    try:
        got = exp = None
        for s in stmts:
            t = transpile_statement(s, spark)
            if t:
                got = spark.sql(t).collect()
            r = fresh.execute(s)
            if s is stmts[-1]:
                exp = r.fetchall()
        got = sorted(tuple(x) for x in got)
        exp = sorted(tuple(x) for x in exp)
        assert got == exp, f"{stmts}\nspark={got[:5]}\nduck={exp[:5]}"
    finally:
        fresh.close()
        dialect.reset_macros(spark)
        dialect.reset_attached(spark)


@given(
    mul=st.integers(min_value=2, max_value=9),
    default=st.integers(min_value=1, max_value=50),
    use_default=st.booleans(),
    arm=st.sampled_from(["WHERE o_orderkey < 200", "ORDER BY o_orderkey LIMIT 37"]),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_macro_with_default_inside_from_first_arm(engines, mul, default, use_default, arm):
    """A scalar macro (second parameter defaulted) called inside a
    FROM-first SELECT arm — composes the macro expander, the default
    binder, and the FROM-first rewrite in one statement."""
    spark, con, _ = engines
    # DuckDB's binder requires defaulted params to be passed NAMED
    # (positional is a Binder Error — verified, and the shim mirrors it
    # by leaving such calls loud)
    call = "boost(o_totalprice)" if use_default else f"boost(o_totalprice, k := {mul})"
    _run_pair(
        spark,
        con,
        [
            f"CREATE MACRO boost(x, k := {default}) AS x * k",
            f"FROM orders SELECT o_orderkey, {call} AS b {arm}",
        ],
    )


@given(
    unit=st.sampled_from(["day", "month", "year"]),
    anchor=st.sampled_from(["1995-06-17", "1992-01-01"]),
    lim=st.integers(min_value=20, max_value=120),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_date_diff_unit_from_macro_default(engines, unit, anchor, lim):
    """date_diff inside a macro BODY whose unit argument is a defaulted
    literal parameter: the default text is spliced at expansion, after
    which the arg-transform pass must still find a literal unit and
    translate the 3-arg date_diff. (DuckDB's parser rejects function
    CALLS as default values — probed on the pinned build — so the
    composition point is the body, not the default.)"""
    spark, con, _ = engines
    _run_pair(
        spark,
        con,
        [
            f"CREATE MACRO age(d, u := '{unit}') AS "
            f"date_diff(u, DATE '{anchor}', d)",
            f"SELECT o_orderkey, age(o_orderdate) AS a FROM orders "
            f"WHERE o_orderkey < {lim}",
        ],
    )


@given(
    fmt=st.sampled_from(
        [
            "%Y-%m",
            "%Y/%j",
            "%d %B %Y",
            "%A",
            # round-9 expression-compiled directives (no Java twin) —
            # the compiler must survive macro-expansion splicing, which
            # parenthesizes the argument and repeats it across the
            # concat chunks
            "%G-W%V",
            "wk %U/%W",
            "u%u w%w y%-y",
        ]
    ),
    lim=st.integers(min_value=30, max_value=200),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_strftime_macro_under_group_by(engines, fmt, lim):
    """A macro whose body is a strftime C-format call, used as a GROUP
    BY key — composes macro expansion with the strftime translation
    (incl. the round-9 expression compiler for non-Java directives)."""
    spark, con, _ = engines
    _run_pair(
        spark,
        con,
        [
            f"CREATE MACRO bucket(d) AS strftime(d, '{fmt}')",
            f"SELECT bucket(o_orderdate) AS b, count(*) AS n FROM orders "
            f"WHERE o_orderkey < {lim} GROUP BY bucket(o_orderdate)",
        ],
    )


@given(
    status=st.sampled_from(["'O'", "'F'", "'P'"]),
    lim=st.integers(min_value=100, max_value=400),
)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_attached_table_under_pivot(engines, status, lim):
    """Statement-form PIVOT over an ATTACH'd .duckdb table — composes
    the attach rewrite (alias.name → alias__name) with the PIVOT
    transpile, which must see the rewritten relation."""
    spark, con, dbfile = engines
    _run_pair(
        spark,
        con,
        [
            f"ATTACH '{dbfile}' AS ext",
            f"PIVOT (SELECT o_orderstatus, o_custkey % 3 AS g, o_totalprice "
            f"FROM ext.ord WHERE o_orderkey < {lim} AND o_orderstatus = {status}) "
            "ON o_orderstatus USING sum(o_totalprice) GROUP BY g",
        ],
    )


@given(
    noise=st.sampled_from(
        ["len(x) and substr(y, 0, 3)", "log(2) week(d)", "left(right) strpos(a,b)"]
    ),
    mul=st.integers(min_value=2, max_value=5),
)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_macro_arg_string_literal_not_rewritten(engines, noise, mul):
    """A macro argument that is a string literal full of function-like
    text: the expansion splices it into the body, where the scalar
    rename and arg-transform passes must leave it untouched (round-5
    quote-awareness fix composed with macro expansion)."""
    spark, con, _ = engines
    _run_pair(
        spark,
        con,
        [
            f"CREATE MACRO tag(s, k) AS concat(s, '-', CAST(k * {mul} AS VARCHAR))",
            f"SELECT o_orderkey, tag('{noise}', o_orderkey) AS t "
            "FROM orders WHERE o_orderkey < 60",
        ],
    )


def test_macro_calling_macro_in_from_first_setop(engines):
    """Deepest composition in the suite: a macro whose body calls
    another macro, used inside both arms of a FROM-first UNION ALL BY
    NAME — expander recursion + FROM-first + set-op rewrites."""
    spark, con, _ = engines
    _run_pair(
        spark,
        con,
        [
            "CREATE MACRO half(x) AS x / 2",
            "CREATE MACRO quarter(x) AS half(half(x))",
            "FROM orders SELECT o_orderkey, quarter(o_totalprice) AS q "
            "WHERE o_orderkey < 50 UNION ALL BY NAME "
            "FROM orders SELECT quarter(o_totalprice) AS q, o_orderkey "
            "WHERE o_orderkey >= 50 AND o_orderkey < 90",
        ],
    )


def _run_pair_unordered(spark, con, stmt):
    """One statement, both engines, multiset compare (str-keyed sort —
    zip padding produces NULLs, which plain tuple sort can't order)."""
    t = transpile_statement(stmt, spark)
    assert "unnest" not in t.lower(), f"not rewritten: {t}"
    got = sorted((tuple(r) for r in spark.sql(t).collect()), key=str)
    exp = sorted((tuple(r) for r in con.execute(stmt).fetchall()), key=str)
    assert got == exp, f"{stmt}\nspark={got[:6]}\nduck={exp[:6]}"


def test_unnest_zip_literal_padding(engines):
    """Multi-unnest of literal lists: positional zip, NULL padding to
    the longest, FROM-less ORDER BY/LIMIT suffixes, and three-way zip
    (round-6: the last implementable dialect residue from the round-5
    verdict)."""
    spark, con, _ = engines
    for stmt in [
        "SELECT unnest([1,2,3]) AS x, unnest(['a','b']) AS y",
        "SELECT 5 AS c, unnest([1,2]) AS x, unnest([10,20,30]) AS y ORDER BY y DESC",
        "SELECT unnest([1,2]) AS x, unnest([3,4]) AS y, unnest([5]) AS z",
        "SELECT unnest([1,2]) AS x, unnest([3,4]) AS y LIMIT 3",
    ]:
        _run_pair_unordered(spark, con, stmt)


def test_unnest_zip_star_items(engines):
    """``SELECT *`` / ``* EXCLUDE (…)`` alongside multiple unnests
    (the round-6 verdict's #1 defect: the rewrite leaked its
    __u0/__u1/__unn helper columns into the star). DuckDB's expected
    output for ``SELECT *, unnest(a) AS x, unnest(b) AS y FROM t`` is
    ``[t-columns…, x, y]`` — the helpers must never appear. Columns
    AND order are asserted, not just values."""
    spark, con, _ = engines
    for stmt in [
        "SELECT *, unnest(string_split(o_orderpriority, '-')) AS x, "
        "unnest([o_orderkey, o_custkey]) AS y FROM orders WHERE o_orderkey < 40",
        "SELECT * EXCLUDE (o_orderstatus, o_orderpriority), "
        "unnest(string_split(o_orderpriority, '-')) AS x, "
        "unnest(string_split(CAST(o_orderdate AS VARCHAR), '-')) AS y "
        "FROM orders WHERE o_orderkey < 40",
        "SELECT o_orderkey, *, unnest([o_orderkey]) AS x, "
        "unnest([o_custkey, o_orderkey]) AS y FROM orders WHERE o_orderkey < 30",
    ]:
        t = transpile_statement(stmt, spark)
        assert "unnest" not in t.lower(), f"not rewritten: {t}"
        sdf = spark.sql(t)
        rel = con.sql(stmt)
        assert [f.name for f in sdf.schema.fields] == list(rel.columns), stmt
        got = sorted((tuple(r) for r in sdf.collect()), key=str)
        exp = sorted((tuple(r) for r in rel.fetchall()), key=str)
        assert got == exp, f"{stmt}\nspark={got[:6]}\nduck={exp[:6]}"


def test_unnest_zip_qualified_star(engines):
    """Round-8: ``t.*`` / ``t.* EXCLUDE (…)`` beside multiple unnests
    over a SINGLE plain relation — the wrapped subquery is re-aliased
    with the FROM alias (or the table's terminal name) and the item
    becomes a qualified ``.* EXCEPT (<helpers>)``, so the helper
    columns never leak and outer ``t.<col>`` references (including a
    split-off ORDER BY) keep resolving. Columns AND order asserted."""
    spark, con, _ = engines
    for stmt in [
        "SELECT t.*, unnest(string_split(t.o_orderpriority, '-')) AS x, "
        "unnest([t.o_orderkey, t.o_custkey]) AS y FROM orders t "
        "WHERE t.o_orderkey < 40",
        # bare table name as the qualifier
        "SELECT orders.*, unnest(string_split(o_orderpriority, '-')) AS x, "
        "unnest([o_orderkey]) AS y FROM orders WHERE o_orderkey < 30",
        # EXCLUDE merges user columns with the helper exclusions
        "SELECT t.* EXCLUDE (o_orderstatus, o_totalprice), "
        "unnest(string_split(o_orderpriority, '-')) AS x, "
        "unnest(string_split(CAST(o_orderdate AS VARCHAR), '-')) AS y "
        "FROM orders AS t WHERE o_orderkey < 40",
        # qualified refs in the outer ORDER BY survive the re-alias
        "SELECT t.*, unnest([o_orderkey, o_custkey]) AS x, "
        "unnest(string_split(o_orderpriority, '-')) AS y FROM orders t "
        "WHERE t.o_orderkey < 40 ORDER BY t.o_orderkey LIMIT 30",
    ]:
        t = transpile_statement(stmt, spark)
        assert "unnest" not in t.lower(), f"not rewritten: {t}"
        sdf = spark.sql(t)
        rel = con.sql(stmt)
        assert [f.name for f in sdf.schema.fields] == list(rel.columns), stmt
        got = sorted((tuple(r) for r in sdf.collect()), key=str)
        exp = sorted((tuple(r) for r in rel.fetchall()), key=str)
        assert got == exp, f"{stmt}\nspark={got[:6]}\nduck={exp[:6]}"


def test_unnest_distinct_setops_and_window_hoist(engines):
    """Round-8 lifts of the three remaining provable unnest contexts
    (every shape probed against DuckDB first): DISTINCT dedupes the
    projected rows POST-unnest; set-operation arms unnest
    INDEPENDENTLY with a trailing ORDER BY/LIMIT bound to the whole
    chain (the asymmetric ORDER BY x LIMIT 3 arm is the order-matters
    regression case); aliased window items evaluate PRE-unnest and are
    hoisted into the inner subquery (rank repeats across zip rows
    including pad rows)."""
    spark, con, _ = engines
    for stmt in [
        "SELECT DISTINCT unnest([1,1,2]) AS x, unnest([5,5,9]) AS y",
        "SELECT DISTINCT unnest([1,2,1]) AS x, unnest(['a','b']) AS y",
        "SELECT DISTINCT unnest([1,1,2]) + 1 AS v",
        "SELECT DISTINCT o_orderstatus, unnest(string_split(o_orderpriority, '-')) AS p "
        "FROM orders WHERE o_orderkey < 200",
        "SELECT unnest([1,2]) AS x UNION ALL SELECT unnest([3]) AS x",
        "SELECT unnest([1,2]) AS x, unnest([5,6]) AS y "
        "UNION ALL SELECT 0 AS x, 0 AS y",
        "SELECT unnest([1,2]) AS x UNION SELECT unnest([2,2]) AS x",
        "SELECT unnest([1,2]) AS x INTERSECT SELECT unnest([2,3]) AS x",
        "SELECT unnest([5,6]) AS x EXCEPT SELECT unnest([5]) AS x",
        "WITH c AS (SELECT [1,2] AS a) SELECT unnest(a) AS x FROM c "
        "UNION ALL SELECT unnest([9]) AS x",
        "SELECT rank() OVER (ORDER BY o_orderkey) AS r, "
        "unnest(string_split(o_orderpriority, '-')) AS p, "
        "unnest([o_custkey]) AS c FROM orders WHERE o_orderkey < 40",
        "SELECT row_number() OVER (ORDER BY o_orderkey) AS rn, "
        "unnest(string_split(o_orderpriority, '-')) AS p "
        "FROM orders WHERE o_orderkey < 40",
    ]:
        _run_pair_unordered(spark, con, stmt)
    # trailing ORDER BY/LIMIT binds to the whole set-op chain, not the
    # last arm — ORDERED compare (an arm-local ORDER BY would return
    # (1,2,9) here instead of DuckDB's global (1,2,7))
    stmt = (
        "SELECT unnest([1,2]) AS x UNION ALL "
        "SELECT unnest([9,8,7]) AS x ORDER BY x LIMIT 3"
    )
    t = transpile_statement(stmt, spark)
    assert "unnest" not in t.lower(), t
    got = [tuple(r) for r in spark.sql(t).collect()]
    exp = [tuple(r) for r in con.execute(stmt).fetchall()]
    assert got == exp, f"{got} != {exp}"


def test_unnest_embedded_expressions(engines):
    """Round-8: unnest embedded in select-item expressions — DuckDB
    zips every unnest in the list positionally and evaluates the
    surrounding expression per element (all shapes probed against
    DuckDB 1.x directly). Arithmetic, two unnests inside ONE
    expression, function wrap, CASE, NULL-list padding THROUGH the
    expression, lateral repeat beside a plain column, and the mix of
    whole-item + embedded items."""
    spark, con, _ = engines
    for stmt in [
        "SELECT unnest([1,2,3]) + 10 AS v",
        "SELECT unnest([1,2]) AS x, unnest([10,20,30]) + 1 AS y",
        "SELECT unnest([1,2]) + unnest([10,20]) AS v",
        "SELECT CASE WHEN unnest([1,5]) > 2 THEN 'hi' ELSE 'lo' END AS v",
        "SELECT o_orderkey, unnest([o_orderkey, o_custkey]) * 2 AS v "
        "FROM orders WHERE o_orderkey < 40",
        "SELECT length(unnest(string_split(o_orderpriority, '-'))) AS v, "
        "unnest([o_orderkey]) AS k FROM orders WHERE o_orderkey < 40",
        # NULL zip-pad flows through the arithmetic (probed: DuckDB
        # pads the NULL list and the + yields NULL per row)
        "SELECT unnest([1,2]) + unnest(CAST(NULL AS INT[])) AS v",
        "SELECT unnest([1,2]) + 1 AS v, unnest(['a','b','c']) AS w "
        "ORDER BY w DESC",
    ]:
        _run_pair_unordered(spark, con, stmt)


@given(
    arrays=st.lists(
        st.sampled_from(
            [
                "string_split(o_orderpriority, '-')",
                "string_split(o_orderpriority, 'R')",
                "string_split(CAST(o_orderdate AS VARCHAR), '-')",
                "[o_orderkey, o_custkey]",
                "[o_custkey]",
            ]
        ),
        min_size=2,
        max_size=3,
        unique=True,
    ),
    embed=st.booleans(),
    scalar=st.booleans(),
    star=st.sampled_from(
        [
            None,
            "*",
            "* EXCLUDE (o_orderstatus)",
            "orders.*",
            "orders.* EXCLUDE (o_orderstatus)",
        ]
    ),
    star_after=st.booleans(),
    suffix=st.sampled_from(["", " ORDER BY o_orderkey LIMIT 40", " LIMIT 25"]),
    lim=st.integers(min_value=10, max_value=80),
)
@settings(max_examples=14, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_unnest_zip_fuzz_table(engines, arrays, embed, scalar, star, star_after, suffix, lim):
    """Fuzzed multi-unnest over the orders fixture: split arrays of
    genuinely different per-row lengths (padding on nearly every row),
    optional expression-embedded first unnest (round 8), optional
    interleaved scalar column, optional star / EXCLUDE-star item (the
    round-6 helper-leak regression arm) in EITHER position — a star
    AFTER the unnest items puts the EXCLUDE→EXCEPT rewrite where the
    round-9 set-op-splitter fix matters — optional ORDER BY/LIMIT
    split to the outer query."""
    spark, con, _ = engines
    items = [f"unnest({a}) AS u{i}" for i, a in enumerate(arrays)]
    if embed:
        # type-safe wrap for both VARCHAR and BIGINT element types;
        # coalesce exercises NULL-pad flowing through the expression
        items[0] = (
            f"coalesce(CAST(unnest({arrays[0]}) AS VARCHAR), 'pad') "
            f"|| '_e' AS u0"
        )
    if scalar:
        items.insert(1, "o_orderkey")
    if star:
        if star_after:
            items.append(star)
        else:
            items.insert(0, star)
    stmt = (
        f"SELECT {', '.join(items)} FROM orders "
        f"WHERE o_orderkey < {lim}{suffix}"
    )
    _run_pair_unordered(spark, con, stmt)


def test_unnest_star_exclude_after_unnest_not_a_set_op(engines):
    """Round-9 regression (ADVICE high): the EXCLUDE pass rewrites
    ``* EXCLUDE (c)`` to Spark's ``* EXCEPT (c)`` BEFORE the unnest
    set-op splitters run; a splitter that scans for bare
    union/intersect/except keywords would split the select list on the
    projection EXCEPT, silently changing window evaluation scope (the
    window fragment loses its unnest sibling and evaluates
    post-explode) or emitting malformed SQL for the zip shapes. Both
    originally-broken statements must now match DuckDB exactly."""
    spark, con, _ = engines
    for stmt in [
        # window beside unnest with the EXCLUDE placed BETWEEN them:
        # rn must be computed PRE-unnest (DuckDB semantics)
        "SELECT unnest(string_split(o_orderpriority, '-')) AS w, "
        "* EXCLUDE (o_orderstatus, o_totalprice), "
        "row_number() OVER (ORDER BY o_orderkey) AS rn "
        "FROM orders WHERE o_orderkey < 40",
        # the round-7 star-zip surface with unnest items BEFORE the
        # star (previously emitted dangling `EXCEPT (…) FROM …`)
        "SELECT unnest(string_split(o_orderpriority, '-')) AS x, "
        "unnest([o_orderkey, o_custkey]) AS y, "
        "* EXCLUDE (o_orderstatus) FROM orders WHERE o_orderkey < 40",
        # plain star after a single unnest
        "SELECT unnest([o_orderkey, o_custkey]) AS k, * "
        "FROM orders WHERE o_orderkey < 25",
        # a REAL set-op chain whose arms carry post-unnest EXCLUDE
        # stars — the splitter must still split on the genuine UNION
        "SELECT unnest([o_orderkey]) AS k, * EXCLUDE (o_orderstatus) "
        "FROM orders WHERE o_orderkey < 15 "
        "UNION ALL "
        "SELECT unnest([o_custkey]) AS k, * EXCLUDE (o_orderstatus) "
        "FROM orders WHERE o_orderkey < 15",
    ]:
        _run_pair_unordered(spark, con, stmt)


def test_unnest_zip_through_macro_and_cte(engines):
    """Composition: the unnest args come out of a macro expansion
    inside a CTE — the zip rewrite runs after the expander and must
    find the main SELECT past the WITH prefix."""
    spark, con, _ = engines
    dialect.reset_macros(spark)
    fresh = duckdb.connect()
    fresh.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    try:
        mac = "CREATE MACRO pieces(s, d) AS string_split(CAST(s AS VARCHAR), d)"
        assert transpile_statement(mac, spark) == ""
        fresh.execute(mac)
        stmt = (
            "WITH w AS (SELECT o_orderkey, pieces(o_orderpriority, '-') AS ws, "
            "pieces(o_orderdate, '-') AS cs FROM orders WHERE o_orderkey < 30) "
            "SELECT o_orderkey, unnest(ws) AS w, unnest(cs) AS c FROM w"
        )
        t = transpile_statement(stmt, spark)
        got = sorted((tuple(r) for r in spark.sql(t).collect()), key=str)
        exp = sorted((tuple(r) for r in fresh.execute(stmt).fetchall()), key=str)
        assert got == exp
    finally:
        fresh.close()
        dialect.reset_macros(spark)


def test_unnest_zip_guards_stay_loud(engines):
    """Shapes the whole-item rewrite can't prove safe must be left
    verbatim (Spark rejects unnest as an unresolved routine) — never a
    silent wrong zip."""
    for stmt in [
        # aggregate-wrapped unnest: a BinderError in DuckDB itself —
        # rejecting it IS parity (round 8: plain in-expression unnest
        # now rewrites; see test_unnest_embedded_expressions)
        "SELECT sum(unnest(a)) AS s, unnest(b) AS y FROM t",
        "SELECT count(unnest(a) + 1) AS s, unnest(b) AS y FROM t",
        # nested unnest: DuckDB demands recursive := true, Spark rejects
        "SELECT unnest(unnest(a)) AS v, unnest(b) AS y FROM t",
        # sub-select inside the item: substitution would hoist the
        # call out of its scope
        "SELECT (SELECT unnest(a) LIMIT 1) AS v, unnest(b) AS y FROM t",
        # DISTINCT / set-op arms rewrite since round 8 (probed: both
        # dedupe/assemble POST-unnest) — see the differential tests.
        # GROUP BY beside unnest is a BinderError in DuckDB itself.
        "SELECT unnest(a) AS x, unnest(b) AS y FROM t GROUP BY 1, 2",
        "SELECT unnest(a) AS x, unnest(b, recursive := true) AS y FROM t",
        # windows HOIST pre-explode since round 8 (probed semantics),
        # except the unprovable shapes, which must stay loud: a window
        # referencing an unnest alias (DuckDB BinderError — parity),
        # an unaliased window item (nothing to re-project by), and a
        # window OF an unnest-bearing expression
        "SELECT unnest(a) AS x, unnest(b) AS y, "
        "row_number() OVER (ORDER BY x) AS rn FROM t",
        "SELECT row_number() OVER (), unnest(a) AS x, unnest(b) AS y FROM t",
        "SELECT sum(unnest(a)) OVER () AS s, unnest(b) AS y FROM t",
        # modified stars / unprovable qualified stars: since round 8
        # t.* over a SINGLE plain relation rewrites (see
        # test_unnest_zip_qualified_star); everything whose coverage
        # can't be proven must still abort, not leak or guess
        "SELECT * REPLACE (c + 1 AS c), unnest(a) AS x, unnest(b) AS y FROM t",
        "SELECT t.* REPLACE (c + 1 AS c), unnest(a) AS x, unnest(b) AS y FROM t",
        # qualifier doesn't name the FROM relation
        "SELECT z.*, unnest(a) AS x, unnest(b) AS y FROM t",
        # join: which side t.* covers is not provable once wrapped
        "SELECT t.*, unnest(a) AS x, unnest(b) AS y FROM t JOIN u ON t.c = u.c",
        # subquery FROM / alias-less table function: no alias to re-bind
        "SELECT t.*, unnest(a) AS x, unnest(b) AS y FROM (SELECT * FROM z) t2",
        "SELECT t.*, unnest(a) AS x, unnest(b) AS y FROM read_parquet('f.parquet')",
        # schema-qualified star: out of the single-ident qualifier model
        "SELECT s.tbl.*, unnest(a) AS x, unnest(b) AS y FROM s.tbl",
    ]:
        assert "unnest" in transpile_statement(stmt).lower(), stmt


def test_summarize_of_macro_projection(engines):
    """SUMMARIZE over a subquery whose projection is a macro call —
    the summarize rewrite must run AFTER macro expansion."""
    spark, con, _ = engines
    dialect.reset_macros(spark)
    fresh = duckdb.connect()
    fresh.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    try:
        for s in ["CREATE MACRO cents(x) AS CAST(x * 100 AS BIGINT)"]:
            assert transpile_statement(s, spark) == ""
            fresh.execute(s)
        stmt = (
            "SUMMARIZE (SELECT cents(o_totalprice) AS c FROM orders "
            "WHERE o_orderkey < 300)"
        )
        got = (
            spark.sql(transpile_statement(stmt, spark))
            .toPandas()
            .set_index("column_name")
        )
        exp = fresh.execute(stmt).fetchdf().set_index("column_name")
        for field in ("min", "max", "count", "null_percentage"):
            assert str(got.loc["c", field]) == str(exp.loc["c", field]), field
    finally:
        fresh.close()
        dialect.reset_macros(spark)


# ---------------------------------------------------------------------
# Operator-rewrite differentials (round-7: the power/intdiv/xor/
# comprehension passes' probed facts were cited in docstrings but had
# no tests — round-6 advice items 2-4; items 1/3/4 are the `::` left
# operand, if()-as-source and comment-awareness fixes).


def _pair_stmt(spark, con, stmt, transpiled_has=None, transpiled_lacks=None):
    """One statement, both engines, multiset compare (str-keyed sort so
    list-valued cells order)."""
    t = transpile_statement(stmt, spark)
    if transpiled_has:
        assert transpiled_has in t, f"{transpiled_has!r} not in: {t}"
    if transpiled_lacks:
        assert transpiled_lacks not in t, f"{transpiled_lacks!r} in: {t}"
    got = sorted((tuple(r) for r in spark.sql(t).collect()), key=str)
    exp = sorted((tuple(r) for r in con.execute(stmt).fetchall()), key=str)
    assert got == exp, f"{stmt}\n-> {t}\nspark={got[:6]}\nduck={exp[:6]}"


def test_power_operator_probed_facts(engines):
    """The exact probe set the _rewrite_power_ops docstring cites:
    unary-minus binding (-2^2=4, 0-2^2=-4), left associativity
    (2^3^2=64), ^ over * and % (1+2^2*3=13, 10%4^2=10), ** synonym,
    and the DOUBLE result type — differentially against DuckDB."""
    spark, con, _ = engines
    _pair_stmt(
        spark, con,
        "SELECT -2^2 AS a, 0-2^2 AS b, 2^3^2 AS c, 1+2^2*3 AS d, "
        "10%4^2 AS e, 2**3 AS f, 1e-1^2 AS g",
        transpiled_lacks="^",
    )
    _pair_stmt(
        spark, con,
        "SELECT o_orderkey, o_totalprice ^ 2 AS sq, -o_orderkey ^ 2 AS nsq "
        "FROM orders WHERE o_orderkey < 40",
        transpiled_lacks="^",
    )


def test_power_cast_left_operand(engines):
    """Round-6 advice item 1 (medium): `::` binds tighter than `^`
    (probed: 2::INT ^ 2 = 4.0), so the left-operand walk must capture
    the whole cast chain — `x::int ^ 2` used to mangle into
    `x::power(int, 2)`."""
    spark, con, _ = engines
    _pair_stmt(
        spark, con,
        "SELECT 2::INT ^ 2 AS a, (1+1)::BIGINT ^ 3 AS b, "
        "2::INT::DOUBLE ^ 2 AS c",
        transpiled_lacks="^",
    )
    _pair_stmt(
        spark, con,
        "SELECT o_orderkey, (o_orderkey + 1)::BIGINT ^ 2 AS sq "
        "FROM orders WHERE o_orderkey < 40",
        transpiled_lacks="^",
    )


def test_power_comment_resume_never_swallows_keywords():
    """Round-7 advice item 3 (low): when ``^`` has no real left operand
    and only comment trivia precedes it (`SELECT /*c*/ ^ 3`), the
    comment-resume walk used to capture the preceding clause KEYWORD as
    the operand, emitting `power(SELECT /*c*/, 3)`. The resume now
    bails on bare SQL keywords — the malformed input keeps its `^` and
    fails loudly in Spark — while a real operand separated from `^` by
    a comment (`2 /*c*/ ^ 3`) still rewrites."""
    from arnab_spark.dialect import _rewrite_power_ops

    assert _rewrite_power_ops("SELECT 2 /*c*/ ^ 3") == "SELECT power(2 /*c*/, 3)"
    assert _rewrite_power_ops("SELECT /*c*/ ^ 3") == "SELECT /*c*/ ^ 3"
    assert (
        _rewrite_power_ops("SELECT a FROM t WHERE /*c*/ ^ 2 > 1")
        == "SELECT a FROM t WHERE /*c*/ ^ 2 > 1"
    )


def test_startswith_and_xor_function(engines):
    """`a ^@ b` (DuckDB starts-with) → startswith(a, b); DuckDB's
    xor() FUNCTION → Spark's ^ operator — both differentially."""
    spark, con, _ = engines
    _pair_stmt(
        spark, con,
        "SELECT o_orderkey, o_orderpriority ^@ '1' AS sw "
        "FROM orders WHERE o_orderkey < 60",
    )
    _pair_stmt(
        spark, con,
        "SELECT o_orderkey, xor(o_orderkey, 5) AS x "
        "FROM orders WHERE o_orderkey < 60",
    )


def test_intdiv_probed_facts(engines):
    """`//` → DIV: truncation toward zero on integral operands
    (-7//2 = -3 on both engines) and BIGINT-wide results."""
    spark, con, _ = engines
    _pair_stmt(
        spark, con,
        "SELECT -7 // 2 AS a, 7 // 2 AS b, "
        "o_orderkey // 3 AS c FROM orders WHERE o_orderkey < 60",
        transpiled_has="DIV",
    )


def test_comprehension_probed_facts(engines):
    """List comprehensions → transform/filter: element order, the
    NULL-slot-preserving map ([x+1 FOR x IN [1,NULL,3]]), an IF
    filter, and nesting."""
    spark, con, _ = engines
    _pair_stmt(spark, con, "SELECT [x + 1 FOR x IN [1, NULL, 3]] AS l")
    _pair_stmt(
        spark, con,
        "SELECT [x * 2 FOR x IN [1, 2, 3, 4] IF x > 1] AS l",
    )
    _pair_stmt(
        spark, con,
        "SELECT o_orderkey, "
        "[len(w) FOR w IN string_split(o_orderpriority, '-') IF len(w) > 1] AS l "
        "FROM orders WHERE o_orderkey < 60",
    )


def test_comprehension_if_function_source(engines):
    """Round-6 advice item 3: a top-level if() FUNCTION call as the
    comprehension source was misread as the IF filter clause, emitting
    malformed SQL — the leading-IF-with-empty-prefix case now resolves
    to the function (and a LATER top-level IF is still the filter)."""
    spark, con, _ = engines
    _pair_stmt(
        spark, con,
        "SELECT [x FOR x IN if(1 = 1, [1, 2, 3], [9])] AS l",
    )
    _pair_stmt(
        spark, con,
        "SELECT [x FOR x IN if(1 = 2, [1, 2, 3], [7, 8, 9]) IF x > 7] AS l",
    )
    _pair_stmt(
        spark, con,
        "SELECT o_orderkey, "
        "[w FOR w IN if(o_orderkey % 2 = 0, string_split(o_orderpriority, '-'), "
        "['odd']) IF len(w) > 2] AS l "
        "FROM orders WHERE o_orderkey < 60",
    )


def test_operator_passes_comment_aware(engines):
    """Round-6 advice item 4: `a /*c*// b` must keep its comment
    terminator (the straddling `//` is comment-close + division, not
    intdiv), `//`/`^` inside comments stay untouched, and a bracketed
    list whose comment contains FOR is not misread as a comprehension."""
    spark, con, _ = engines
    _pair_stmt(spark, con, "SELECT 7 /*half*// 2 AS d, 8 /*c*/ // 3 AS e")
    _pair_stmt(
        spark, con,
        "SELECT o_orderkey // 4 AS q FROM orders -- int // div ^ note\nWHERE o_orderkey < 60",
        transpiled_has="DIV",
    )
    _pair_stmt(spark, con, "SELECT [1, 2 /* FOR x IN y */] AS l")
    _pair_stmt(spark, con, "SELECT 2 /*c*/ ^ 3 AS p", transpiled_lacks="^")


def test_unnest_recursive_literals(engines):
    """Round-8 ``recursive := true``: every probed literal fact from the
    ``_rewrite_struct_recursive_unnest`` docstring, differentially —
    full nested-list flattening, NULL-sublist dropping at every level,
    triple nesting, the depth-1 no-op flag, ``recursive := false``,
    expression-embedded recursive unnest, DISTINCT-post-flatten, and
    a set-op chain of recursive arms."""
    spark, con, _ = engines
    for stmt in [
        "SELECT unnest([[1,2],[3]], recursive := true) AS x",
        "SELECT unnest([[1,2],NULL,[3]], recursive := true) AS x",
        "SELECT unnest([[[1,2]],[[3],[4,5]]], recursive := true) AS x",
        "SELECT unnest([1,2], recursive := true) AS x",
        "SELECT unnest([[1,2]], recursive := false) AS x",
        "SELECT unnest([[1,2],[3]], recursive := true) + 1 AS x",
        "SELECT DISTINCT unnest([[1,1],[1]], recursive := true) AS x",
        "SELECT unnest([[2,9],[1]], recursive := true) AS x ORDER BY x LIMIT 2",
        "SELECT unnest([[1,2],[3]], recursive := true) AS x "
        "UNION ALL SELECT unnest([[9]], recursive := true) AS x",
    ]:
        _run_pair_unordered(spark, con, stmt)


def test_len_on_lists_probe_typed(engines):
    """Round-9: DuckDB's overloaded ``len``/``length`` — character
    count on VARCHAR, element count on LIST (probed, NULL → NULL for
    both). List-typed arguments are probe-typed in the statement's own
    FROM context and rewrite to ``CAST(size(…) AS BIGINT)``; string
    arguments pass through to Spark's identical ``length``. Covers
    table columns, both spellings, CTE scope, expressions around the
    call, WHERE-clause placement, NULL lists, and the conservative
    skips (sub-select scope, sessionless)."""
    spark, con, _ = engines
    for stmt in [
        "SELECT o_orderkey, len(string_split(o_orderpriority, '-')) AS n "
        "FROM orders WHERE o_orderkey < 60",
        "SELECT length(string_split(o_orderpriority, '-')) AS n, "
        "length(o_orderpriority) AS chars FROM orders WHERE o_orderkey < 60",
        "SELECT len([1,2,3]) AS a, len('abcd') AS b, "
        "length(CAST(NULL AS INT[])) AS c",
        "WITH w AS (SELECT string_split(o_orderpriority, '-') AS parts "
        "FROM orders WHERE o_orderkey < 40) "
        "SELECT len(parts) + 10 AS n FROM w",
        "SELECT count(*) AS n FROM orders "
        "WHERE o_orderkey < 200 AND len(string_split(o_orderpriority, '-')) = 2",
    ]:
        duck_sql = stmt
        exp = sorted(tuple(r) for r in con.execute(duck_sql).fetchall())
        t = transpile_statement(duck_sql, spark)
        got = sorted(tuple(r) for r in spark.sql(t).collect())
        assert got == exp, f"{stmt}\nspark={got[:4]}\nduck={exp[:4]}"
    # sessionless transpile: no probe, list-len stays loud as length()
    t = transpile_statement("SELECT len(string_split(s, ' ')) FROM t")
    assert "length(" in t and "size(" not in t
    # a len in a sub-select keeps its own scope: left untouched there
    t = transpile_statement(
        "SELECT (SELECT len(string_split(o_orderpriority, '-')) "
        "FROM orders LIMIT 1) AS n",
        spark,
    )
    assert "size(" not in t


def test_len_setop_arms_scoped_to_first_arm(engines):
    """Round-10 advice: length() sites in LATER set-op arms must not be
    typed against the FIRST arm's FROM context. Arm 1's ``v`` is a
    LIST, arm 2's same-named ``v`` is a VARCHAR — before the fix the
    arm-2 site rewrote to size() and Spark failed analysis on a
    statement DuckDB runs. Arm-1 sites still rewrite; a projection
    ``* EXCEPT`` (not a set operator) does not cut the scan."""
    spark, con, _ = engines
    stmt = (
        "SELECT len(v) AS n FROM (SELECT string_split(o_orderpriority, '-') "
        "AS v FROM orders WHERE o_orderkey < 40) "
        "UNION ALL "
        "SELECT len(v) AS n FROM (SELECT o_orderpriority AS v "
        "FROM orders WHERE o_orderkey < 40)"
    )
    exp = sorted(tuple(r) for r in con.execute(stmt).fetchall())
    t = transpile_statement(stmt, spark)
    got = sorted(tuple(r) for r in spark.sql(t).collect())
    assert got == exp, f"{t}\nspark={got[:4]}\nduck={exp[:4]}"
    # the arm-2 site must have stayed length(); arm-1 scoping is probed
    # through the value match above (both arms' counts agree with DuckDB)
    assert t.count("length(") >= 1


def test_unnest_max_depth_literals(engines):
    """Round-9 ``max_depth := N``: unnests min(N, type depth) levels —
    the capped-flatten variant of the recursive machinery, every fact
    probed against DuckDB first. Covers: exact-depth full flatten,
    a cap BELOW the type depth (rows stay lists one level up — probed
    via an embedded array_length() since bare list columns aren't
    engine-comparable by tuple), N saturating past the depth, N=1 as plain
    unnest, NULL-sublist dropping, a deep capped site as the SOLE
    unnest beside scalar items, DISTINCT and set-op arms, and
    table-sourced arguments through the probe typer."""
    spark, con, _ = engines
    for stmt in [
        "SELECT unnest([[1,2],[3]], max_depth := 2) AS x",
        "SELECT array_length(unnest([[[1],[2,5]],[[3]]], max_depth := 2)) AS n",
        "SELECT unnest([[[1],[2,5]],[[3]]], max_depth := 3) AS x",
        "SELECT unnest([[1,2],[3]], max_depth := 999) AS x",
        "SELECT array_length(unnest([[1,2],[3]], max_depth := 1)) AS one_level",
        "SELECT unnest([1,2], max_depth := 1) AS x",
        "SELECT unnest([1,2], max_depth := 7) AS x",
        "SELECT unnest([[1,NULL],NULL,[3]], max_depth := 2) AS x",
        "SELECT 5 AS k, unnest([[1,2],[3]], max_depth := 2) AS x",
        "SELECT DISTINCT unnest([[1,1],[1]], max_depth := 2) AS x",
        "SELECT unnest([[2,9],[1]], max_depth := 2) AS x ORDER BY x LIMIT 2",
        "SELECT unnest([[1,2]], max_depth := 2) AS x "
        "UNION ALL SELECT unnest([[9]], max_depth := 2) AS x",
        "SELECT unnest([string_split(o_orderpriority, '-')], max_depth := 2)"
        " AS w FROM orders WHERE o_orderkey < 30",
    ]:
        _run_pair_unordered(spark, con, stmt)
    # shapes that must stay loud: a deep capped site BESIDE another
    # unnest (level-wise zip in DuckDB — a flatten-then-zip would
    # silently mis-pair), two flags at once and non-integer /
    # non-positive depths (DuckDB errors on 0 and both-flags; rejecting
    # the rest is the documented conservative posture)
    from arnab_spark.dialect import transpile_statement

    for stmt in [
        "SELECT unnest([[1,2],[3]], max_depth := 2) AS x, unnest([9,8]) AS y",
        "SELECT unnest([[1,2]], recursive := true, max_depth := 2) AS x",
        "SELECT unnest([[1,2]], max_depth := 0) AS x",
        "SELECT unnest([[1,2]], max_depth := 2.5) AS x",
        "SELECT unnest([[1,2]], max_depth := -1) AS x",
    ]:
        t = transpile_statement(stmt, spark)
        # loud either way: the unnest stays unresolved, or the := flag
        # survives into text Spark's parser rejects
        assert "unnest" in t.lower() or ":=" in t, (stmt, t)


def test_unnest_struct_expansion(engines):
    """Round-8 struct unnest: field expansion with no row
    multiplication — one level without the flag, recursive descent into
    nested structs with it, aliases ignored, duplicate leaf names kept,
    NULL struct keeping its row, and broadcast across a zipping list
    unnest's pad rows (all probed against DuckDB first)."""
    spark, con, _ = engines
    for stmt in [
        "SELECT unnest({'a': 1, 'b': 'x'})",
        "SELECT unnest({'a': 1, 'n': {'c': 2, 'd': 3}}, recursive := true)",
        "SELECT unnest({'a': 1, 'n': {'a': 2}}, recursive := true)",
        "SELECT unnest({'my col': 1, 'b': 2})",
        "SELECT unnest({'a':1,'b':2}) AS ignored_alias",
        "SELECT unnest(CASE WHEN 1=0 THEN {'a':1,'b':2} END)",
        "SELECT unnest({'a':7}), unnest([1,2]) AS x, unnest([10]) AS y",
        "SELECT unnest({'k': o_orderkey, 'd': {'s': o_orderstatus}}, "
        "recursive := true) FROM orders WHERE o_orderkey < 40",
    ]:
        _run_pair_unordered(spark, con, stmt)


def test_unnest_recursive_structs_explode(engines):
    """Round-8 list-of-structs ``recursive := true``: explode plus
    field unpacking — scalar items and stars beside it, nested struct
    leaves, NULL elements kept as all-NULL rows, WHERE pre-filtering,
    and table-sourced structs (all probed)."""
    spark, con, _ = engines
    for stmt in [
        "SELECT unnest([{'a':1,'b':2},{'a':3,'b':4}], recursive := true)",
        "SELECT unnest([{'a':1,'n':{'c':2,'d':3}}], recursive := true)",
        "SELECT 42 AS k, unnest([{'a':1},{'a':2}], recursive := true)",
        "SELECT unnest([{'a':1},NULL,{'a':3}], recursive := true)",
        "SELECT DISTINCT unnest([{'a':1},{'a':1},{'a':2}], recursive := true)",
        "SELECT o_orderkey, unnest([{'k': o_orderkey, 's': o_orderstatus},"
        "{'k': o_custkey, 's': 'x'}], recursive := true) "
        "FROM orders WHERE o_orderkey < 40",
        "SELECT *, unnest([{'k': o_orderkey},{'k': o_custkey}], "
        "recursive := true) FROM orders WHERE o_orderkey < 12",
    ]:
        _run_pair_unordered(spark, con, stmt)


def test_unnest_recursive_guards_stay_loud(engines):
    """Shapes the round-8 pass can NOT prove must stay whole so Spark
    rejects them loudly: the level-wise zip of a deep recursive unnest
    beside another unnest site (probed: DuckDB repeats the plain item
    per INNER row — a flatten-then-zip would silently mis-pair),
    embedded struct unnest (a DuckDB BinderError), and an unresolvable
    flag value. (``max_depth`` with an integer literal was LIFTED in
    round 9 — see test_unnest_max_depth_literals.)"""
    spark, _con, _ = engines
    import pytest as _pytest

    for stmt in [
        "SELECT unnest([10,20,30]) AS p, "
        "unnest([[1],[2,3]], recursive := true) AS x",
        "SELECT unnest({'a':1}) + 1",
        "SELECT unnest([[1,2]], recursive := o_orderkey) AS x FROM orders",
    ]:
        t = transpile_statement(stmt, spark)
        with _pytest.raises(Exception):
            spark.sql(t).collect()


def test_unnest_recursive_through_macro_and_cte(engines):
    """Composition: recursive unnest over arrays built by a macro
    inside a CTE — the WITH prefix must ride along as the type-probe's
    prefix so the CTE-sourced argument types."""
    spark, con, _ = engines
    dialect.reset_macros(spark)
    fresh = duckdb.connect()
    fresh.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    try:
        mac = ("CREATE MACRO two_splits(s, d1, d2) AS "
               "[string_split(CAST(s AS VARCHAR), d1), "
               "string_split(CAST(s AS VARCHAR), d2)]")
        assert transpile_statement(mac, spark) == ""
        fresh.execute(mac)
        stmt = (
            "WITH w AS (SELECT o_orderkey, "
            "two_splits(o_orderpriority, '-', 'E') AS nested "
            "FROM orders WHERE o_orderkey < 30) "
            "SELECT o_orderkey, unnest(nested, recursive := true) AS piece "
            "FROM w"
        )
        t = transpile_statement(stmt, spark)
        assert "unnest" not in t.lower(), f"not rewritten: {t}"
        got = sorted((tuple(r) for r in spark.sql(t).collect()), key=str)
        exp = sorted((tuple(r) for r in fresh.execute(stmt).fetchall()), key=str)
        assert got == exp
    finally:
        fresh.close()
        dialect.reset_macros(spark)


# ---------------------------------------------------------------------
# round-10 strptime parse-compiler fuzz: random formats x random
# timestamps, DuckDB renders the input via its own strftime, both
# engines parse it back — results must match exactly. Complements the
# static 95-case matrix in test_dialect_statements with shapes no hand
# list would cover (random directive order, separators, literals).

_STRP_DATE_MODES = [
    ("%Y", "%m", "%d"),          # ymd
    ("%G", "%V", "%u"),          # ISO week
    ("%Y", "%U", "%w"),          # Sunday week
    ("%Y", "%W", "%w"),          # Monday week
    ("%d", "%b", "%Y"),          # month name
    ("%Y",), ("%G",), ("%y", "%m"),
]
_STRP_TIME_PARTS = [
    (), ("%H", "%M"), ("%H", "%M", "%S"), ("%I", "%M", "%p"),
    ("%H", "%M", "%S", "%f"),
]
_STRP_SEPS = [" ", "-", "/", " | ", "T", ":"]
_STRP_TS_POOL = [
    "1992-03-02 08:05:09.123456", "2018-12-31 23:59:59",
    "2024-01-07 00:00:00.000001", "2000-01-02 12:00:00",
    "2021-01-01 01:02:03", "2009-07-15 23:00:00", "1999-12-31 11:59:00",
    "2020-02-29 06:30:00",
]


@given(
    mode=st.sampled_from(_STRP_DATE_MODES),
    timep=st.sampled_from(_STRP_TIME_PARTS),
    sep=st.sampled_from(_STRP_SEPS),
    ts=st.sampled_from(_STRP_TS_POOL),
    shuffle_date=st.booleans(),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_strptime_fuzz_roundtrip_matches_duckdb(engines, mode, timep, sep, ts, shuffle_date):
    """Random (date-mode, time-part, separator, order) formats: DuckDB
    strftime renders a timestamp through the format, then BOTH engines
    strptime it back — the parse compiler must agree exactly, incl.
    week-system arithmetic and fraction handling."""
    spark, con, _ = engines
    date_dirs = list(mode)
    if shuffle_date:
        date_dirs = date_dirs[::-1]
    fmt = sep.join(date_dirs + list(timep))
    # ':' as the GLOBAL separator collides with the time part's own
    # colons only cosmetically; %b beside ':' is still unambiguous
    duck_sql = (
        f"SELECT strptime(strftime(TIMESTAMP '{ts}', '{fmt}'), '{fmt}') AS v"
    )
    exp = con.execute(duck_sql).fetchone()[0]
    t = transpile_statement(duck_sql)
    assert "strptime(" not in t, fmt
    got = spark.sql(t).collect()[0][0]
    assert got == exp, f"{fmt!r} on {ts}: spark={got!r} duck={exp!r}"
