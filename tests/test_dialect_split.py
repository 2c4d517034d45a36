"""Guards for the round-12 dialect module split.

The split moves ~3.9 kLoC out of dialect.py behind unchanged public
names, with the submodules binding shared helpers when the core
module's bottom re-export imports them. Two failure modes are cheap to
pin statically:

1. a moved function referencing a name that neither its own module nor
   its import list defines (caught at CALL time only — the round-12
   extraction itself shipped one: `_rewrite_asof_join` missing from
   `_dialect_unnest`, a NameError only the deep-unnest probe path hit);
2. a late registration pattern whose dispatch structure was snapshot
   before the registration ran (`_ARG_CALL` was a module-load regex
   over `_ARG_CALL_REWRITES`' keys; `_dialect_datetime` registers
   strftime/substr/... AFTER that point).
"""

import ast
import builtins
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUBMODULES = (
    "_dialect_statements",
    "_dialect_dml",
    "_dialect_datetime",
    "_dialect_unnest",
)

#: names intentionally resolved inside try/except NameError (the
#: WeakKeyDictionary-with-plain-dict-fallback pattern)
ALLOWED_UNDEFINED = {"WeakKeyDictionary"}


@pytest.mark.parametrize("mod", SUBMODULES)
def test_submodule_has_no_unbound_names(mod):
    src = open(os.path.join(REPO, "arnab_spark", f"{mod}.py")).read()
    tree = ast.parse(src)
    defined = set(dir(builtins)) | {"__name__", "__file__", "__doc__"}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            defined |= {a.asname or a.name.split(".")[0] for a in node.names}
        elif isinstance(node, ast.ImportFrom):
            defined |= {a.asname or a.name for a in node.names}
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            defined.add(node.name)
        elif isinstance(node, ast.Name) and isinstance(node.ctx, ast.Store):
            defined.add(node.id)
        elif isinstance(node, ast.arg):
            defined.add(node.arg)
        elif isinstance(node, ast.ExceptHandler) and node.name:
            defined.add(node.name)
    used = {
        n.id
        for n in ast.walk(tree)
        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
    }
    unbound = sorted(used - defined - ALLOWED_UNDEFINED)
    assert not unbound, f"{mod}: names with no binding anywhere: {unbound}"


def test_public_names_still_importable_from_dialect():
    """Every name a sibling module or test imports from
    arnab_spark.dialect must survive the split."""
    from arnab_spark import dialect

    for name in (
        "transpile_statement",
        "table_backing_for",
        "set_warehouse_for",
        "warehouse_for",
        "session_tables_for",
        "dropped_macros_for",
        "reset_macros",
        "reset_attached",
        "_macros_for",
        "_attached_for",
        "_attach_cache_base",
        "_USE_BY_SESSION",
        "_WAREHOUSE_BY_SESSION",
        "_remote_cache_base",
        "_rewrite_power_ops",
    ):
        assert hasattr(dialect, name), name


def test_late_registrations_dispatch():
    """The arg-call dispatch regex must cover entries registered by
    _dialect_datetime AFTER the core module body ran (the snapshot-
    regex bug the split exposed: strftime silently passed through)."""
    from arnab_spark.dialect import _ARG_CALL_REWRITES, transpile_statement

    for late in ("strftime", "strptime", "substr", "left", "dayofweek"):
        assert late in _ARG_CALL_REWRITES, late
    out = transpile_statement(
        "SELECT strftime(CAST('2024-02-29' AS TIMESTAMP), '%Y-%m-%d') AS x"
    )
    assert "date_format" in out, out
