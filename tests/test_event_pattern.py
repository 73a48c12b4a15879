"""q_event_pattern (contract_tier3): hand-sequence semantics for the
window-stacked MATCH_RECOGNIZE-lite — anchor selection (latest click,
latest view before THAT click) and the error-between exclusion."""

import os
import tempfile

import pytest

from bq_duckdb_spark import contract_tier3


def _run(spark, rows):
    """rows: (event_id, user_id, event_type); writes a minimal events
    parquet dir so the entry's loader path is exercised end to end."""
    df = spark.createDataFrame(
        [
            (eid, None, uid, et, 0.0, "{}")
            for eid, uid, et in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    out = contract_tier3.q_event_pattern(spark, d)
    return sorted(
        (r.user_id, r.view_id, r.click_id, r.purchase_id)
        for r in out.collect()
    )


def test_basic_match_and_anchor_choice(spark):
    got = _run(
        spark,
        [
            (1, 7, "view"),
            (2, 7, "view"),      # later view: becomes the anchor
            (3, 7, "click"),
            (4, 7, "click"),     # later click wins
            (5, 7, "purchase"),
        ],
    )
    # latest click before purchase is 4; latest view before click 4 is 2
    assert got == [(7, 2, 4, 5)]


def test_error_between_view_and_purchase_blocks(spark):
    got = _run(
        spark,
        [
            (1, 7, "view"),
            (2, 7, "click"),
            (3, 7, "error"),     # falls between view and purchase
            (4, 7, "purchase"),
        ],
    )
    assert got == []


def test_error_before_view_is_fine(spark):
    got = _run(
        spark,
        [
            (1, 7, "error"),     # before the view anchor: irrelevant
            (2, 7, "view"),
            (3, 7, "click"),
            (4, 7, "purchase"),
        ],
    )
    assert got == [(7, 2, 3, 4)]


def test_click_without_prior_view_no_match(spark):
    got = _run(
        spark,
        [
            (1, 7, "click"),
            (2, 7, "purchase"),
            (3, 8, "purchase"),  # bare purchase, no anchors at all
        ],
    )
    assert got == []


def test_users_are_independent(spark):
    got = _run(
        spark,
        [
            (1, 7, "view"),
            (2, 8, "click"),     # other user's click must not serve user 7
            (3, 7, "click"),
            (4, 7, "purchase"),
            (5, 8, "purchase"),  # user 8 has no view
        ],
    )
    assert got == [(7, 1, 3, 4)]


def test_every_purchase_evaluated(spark):
    got = _run(
        spark,
        [
            (1, 7, "view"),
            (2, 7, "click"),
            (3, 7, "purchase"),
            (4, 7, "purchase"),  # second purchase reuses the anchors
            (5, 7, "error"),
            (6, 7, "purchase"),  # blocked by the error
        ],
    )
    assert got == [(7, 1, 2, 3), (7, 1, 2, 4)]
