"""Guards for the driver-facing registration contract (round-2 fixes).

Round 1 showed the driver (a) verifies only the FIRST 50 entries of
``queries()`` in dict order and (b) crashes canonicalizing top-level
array/map/struct output columns. These tests pin the fixes: the curated
window must span every operator family with oracled queries only, the
headline bench set must stay stable across reorderings, and no oracled
query may emit a non-atomic top-level column.
"""

import os

import pytest

from arnab_spark.queries import CURATED_FIRST, all_queries

TEST_SF_DIR = os.environ.get("ARNAB_TEST_SF_DIR", "/root/testdata/sf0.001")

_REGISTRY = all_queries()

ALL_MODULES = {
    "aggregates",
    "dedup",
    "functions_corpus",
    "joins",
    "llm_text",
    "multimodal",
    "relational",
    "similarity",
    "timeseries",
    "tpch_suite",
    "windows",
}

HEADLINE = {
    "agg_pricing_summary",
    "asof_join",
    "dedup_exact",
    "dedup_minhash_lsh",
    "join_star_revenue",
    "knn_cosine_brute",
    "sessionize_gaps",
    "text_token_count",
}


def _module(q):
    return q.fn.__module__.rsplit(".", 1)[-1]


def test_curated_window_is_50_unique_registered_names():
    assert len(CURATED_FIRST) == 50
    assert len(set(CURATED_FIRST)) == 50
    assert set(CURATED_FIRST) <= set(_REGISTRY)


def test_registry_iteration_order_starts_with_curated_window():
    assert list(_REGISTRY)[:50] == list(CURATED_FIRST)


def test_curated_window_spans_every_module():
    seen = {_module(_REGISTRY[name]) for name in CURATED_FIRST}
    assert seen == ALL_MODULES


def test_curated_window_is_fully_oracled():
    unoracled = [n for n in CURATED_FIRST if not _REGISTRY[n].oracle]
    assert not unoracled, f"rows-only queries waste verification slots: {unoracled}"


def test_headline_set_stable_under_reordering():
    assert {n for n, q in _REGISTRY.items() if q.headline} == HEADLINE


def test_only_sampling_is_rows_only():
    """Only sampling itself may skip the oracle: its rows differ across
    engines by nature. Everything else — including the HLL sketch (via
    its error-bound property) and the binary frame sampler (via hash
    projection) — carries a real oracle since round 2."""
    rows_only = sorted(n for n, q in _REGISTRY.items() if not q.oracle)
    assert rows_only == ["table_sample"]


@pytest.mark.parametrize(
    "name", sorted(n for n, q in _REGISTRY.items() if q.oracle)
)
def test_oracled_output_columns_are_atomic(spark, name):
    """The driver canonicalizes results via pandas sort_values, which
    throws on unhashable cells — every oracled query must emit only
    atomic top-level columns (round-1 finding: 4 queries crashed it)."""
    schema = _REGISTRY[name].fn(spark, TEST_SF_DIR).schema
    bad = [
        f.name
        for f in schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not bad, f"{name}: non-atomic driver-facing columns {bad}"
