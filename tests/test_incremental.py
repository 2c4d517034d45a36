"""Incremental materialization (beyond-reference: the roadmap item the
reference explicitly deferred, reference README.md:54-58)."""

import os
import textwrap

import duckdb

from arnab_spark.config import load_config
from arnab_spark.session import Session


def _write(root, rel, content):
    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write(textwrap.dedent(content))


def _setup(tmp_path, unique_key=True):
    root = str(tmp_path)
    src = os.path.join(root, "src.parquet")
    duckdb.sql(
        f"COPY (SELECT * FROM (VALUES (1, 'a'), (2, 'b')) t(id, tag)) TO '{src}'"
    )
    _write(root, "models/inc.sql", f"SELECT * FROM read_parquet('{src}')")
    key_line = "    unique_key: id\n" if unique_key else ""
    _write(
        root,
        "config.yaml",
        f"models_dir: models\ndb_path: warehouse\nmodels:\n  inc:\n"
        f"    materialize: incremental\n{key_line}",
    )
    return root, src


def test_incremental_first_run_full_write(spark, tmp_path):
    root, _ = _setup(tmp_path)
    report = Session(load_config(root), spark).run(quiet=True)
    assert report.ok and report.results["inc"].n_rows == 2
    assert report.results["inc"].materialize == "incremental"


def test_incremental_upsert_by_key(spark, tmp_path):
    root, src = _setup(tmp_path)
    Session(load_config(root), spark).run(quiet=True)
    # second batch: id=2 updated, id=3 new; id=1 untouched (must survive)
    duckdb.sql(
        f"COPY (SELECT * FROM (VALUES (2, 'B2'), (3, 'c')) t(id, tag)) TO '{src}'"
    )
    report = Session(load_config(root), spark).run(quiet=True)
    assert report.ok and report.results["inc"].n_rows == 3
    rows = {r.id: r.tag for r in spark.table("inc").collect()}
    assert rows == {1: "a", 2: "B2", 3: "c"}


def test_incremental_append_without_key(spark, tmp_path):
    root, src = _setup(tmp_path, unique_key=False)
    Session(load_config(root), spark).run(quiet=True)
    duckdb.sql(f"COPY (SELECT * FROM (VALUES (3, 'c')) t(id, tag)) TO '{src}'")
    report = Session(load_config(root), spark).run(quiet=True)
    assert report.ok and report.results["inc"].n_rows == 3  # 2 + 1 appended


def test_incremental_bad_unique_key_errors(spark, tmp_path):
    root, _ = _setup(tmp_path)
    cfg = load_config(root)
    cfg.models["inc"]["unique_key"] = "nonexistent_col"
    Session(cfg, spark).run(quiet=True)  # first run: full write, no merge
    report = Session(cfg, spark).run(quiet=True)  # second run: merge must fail
    assert "inc" in report.errors
    assert "unique_key" in str(report.errors["inc"])
