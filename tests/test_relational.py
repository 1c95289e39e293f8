"""asof_join operator (functions/relational.py) — semantics pinned against
hand-computed expectations; the driver contract also oracles it against
DuckDB's native ASOF JOIN."""

import pytest
from pyspark.sql import functions as F

from htmld_spark.functions.relational import asof_join
from htmld_spark.pipeline.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(master="local[2]", app_name="pytest_relational")
    yield s
    s.stop()


def ts(s):
    return f"2026-01-01 {s}"


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, ts("00:00:00"), 100),
            (1, ts("00:10:00"), 101),
            (2, ts("00:05:00"), 200),
            (3, ts("00:07:00"), 300),  # no right rows for user 3
        ],
        "user_id long, ts string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (1, ts("00:05:00"), 10.0),
            (1, ts("00:10:00"), 20.0),  # exact-match timestamp
            (2, ts("00:06:00"), 30.0),  # after left's only row
            (7, ts("00:01:00"), 70.0),  # right-only user
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return left, right


def test_asof_backward(frames):
    left, right = frames
    got = {
        r.event_id: r.value
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }
    assert got == {100: None, 101: 20.0, 200: None, 300: None}


def test_asof_forward(frames):
    left, right = frames
    got = {
        r.event_id: r.value
        for r in asof_join(
            left, right, on="ts", by="user_id", direction="forward"
        ).collect()
    }
    assert got == {100: 10.0, 101: 20.0, 200: 30.0, 300: None}


def test_asof_column_collision_suffix(frames):
    left, right = frames
    l2 = left.withColumn("value", F.lit(-1.0))
    out = asof_join(l2, right, on="ts", by="user_id")
    assert "value" in out.columns and "value_r" in out.columns
    row = {r.event_id: r for r in out.collect()}[101]
    assert row.value == -1.0 and row.value_r == 20.0


def test_asof_no_rows_lost(frames):
    left, right = frames
    assert asof_join(left, right, on="ts", by="user_id").count() == left.count()


def test_recrawl_diff_statuses(spark):
    """L64: every status from hand-built crawls; digests and byte delta
    match the hand expectation; duplicate-free inputs contract."""
    from htmld_spark.functions.relational import recrawl_diff

    old = spark.createDataFrame(
        [("a", "same text"), ("b", "before"), ("c", "going away"),
         ("e", None)],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("a", "same text"), ("b", "after edit"), ("d", "fresh page"),
         ("e", "")],
        "url string, text string",
    )
    rows = {r.url: r for r in recrawl_diff(old, new).collect()}
    assert rows["a"].status == "unchanged" and rows["a"].len_delta == 0
    assert rows["b"].status == "changed"
    assert rows["b"].len_delta == len("after edit") - len("before")
    assert rows["c"].status == "removed" and rows["c"].new_md5 is None
    assert rows["c"].len_delta == -len("going away")
    assert rows["d"].status == "added" and rows["d"].old_md5 is None
    # NULL text is content (empty string), not absence: e is unchanged
    assert rows["e"].status == "unchanged"
    # digest-only projection: the join plan carries no text column
    plan = (
        recrawl_diff(old, new)._jdf.queryExecution()
        .optimizedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
