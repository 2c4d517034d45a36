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


def test_every_query_is_oracled():
    """Since round 3 every registry entry carries an exact oracle —
    table_sample, the last rows-only entry, became a deterministic
    hash-Bernoulli sample with a DuckDB-matching filter."""
    rows_only = sorted(n for n, q in _REGISTRY.items() if not q.oracle)
    assert rows_only == []


#: The 35 queries with zero driver hash evidence after rounds 1+2
#: (computed as all_queries() minus the union of green rows in
#: CORRECTNESS_r01.json and CORRECTNESS_r02.json during r3 planning).
#: All must sit inside the 50-slot driver window this round.
R03_DRIVER_UNVERIFIED = {
    "agg_approx_count_distinct",
    "agg_priority_late_orders",
    "agg_promo_revenue_share",
    "agg_mode_bool_bits",
    "fn_posexplode_ordinality",
    "join_shipping_priority",
    "join_local_supplier_volume",
    "join_returned_item_revenue",
    "join_bracketed_discounts",
    "join_idle_rich_customers",
    "join_salted_skew",
    "text_train_split",
    "text_quality_gopher",
    "text_pack_sequences",
    "sample_stratified",
    "text_pii_scrub",
    "text_chunk_windows",
    "text_vocab_topk",
    "multimodal_resize",
    "multimodal_frame_sample",
    "table_sample",
    "ann_ivf_cells",
    "ann_ivf_refined",
    "asof_join_pandas",
    "time_weighted_avg",
    "agg_forecast_revenue",
    "join_national_market_share",
    "join_product_type_profit",
    "agg_important_part_value",
    "agg_late_shipment_priority",
    "join_customer_distribution",
    "join_top_supplier_revenue",
    "agg_supplier_part_counts",
    "agg_small_quantity_revenue",
    "join_majority_part_suppliers",
}


def test_r03_window_covers_all_driver_unverified_queries():
    """An import reorder or window edit must not silently drop one of the
    35 not-yet-driver-verified queries out of the checked window."""
    assert R03_DRIVER_UNVERIFIED <= set(CURATED_FIRST)
    assert set(CURATED_FIRST[:35]) == R03_DRIVER_UNVERIFIED


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
