"""Unit tests for the distributed interval join
(stages/joins.range_join): exact all-matches semantics vs brute force,
inclusive bounds, and inner-drop of windowless left rows."""

import datetime

import pandas as pd
import pyarrow as pa
import ray.data

from finance_sc_relations_ray.stages.joins import range_join

T0 = datetime.datetime(2024, 1, 1)


def _ts(minutes: float) -> datetime.datetime:
    return T0 + datetime.timedelta(minutes=minutes)


LEFT_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")),
    ]
)
PAYLOAD_TYPES = {"match_event_id": pa.int64(), "match_value": pa.float64()}
WINDOW = datetime.timedelta(minutes=10)


def _run(left_rows, right_rows, num_buckets=4) -> pd.DataFrame:
    left = ray.data.from_arrow(
        pa.Table.from_pylist(left_rows, schema=LEFT_SCHEMA)
    )
    right = ray.data.from_arrow(
        pa.Table.from_pylist(
            right_rows,
            schema=pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("user_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("value", pa.float64()),
                ]
            ),
        )
    )
    out = range_join(
        left,
        right,
        by="user_id",
        ts="ts",
        lower_offset=-WINDOW,
        upper_offset=datetime.timedelta(0),
        payload={"event_id": "match_event_id", "value": "match_value"},
        left_schema=LEFT_SCHEMA,
        payload_types=PAYLOAD_TYPES,
        num_buckets=num_buckets,
    ).to_pandas()
    if out.empty and len(out.columns) == 0:
        out = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "match_event_id": pd.Series([], dtype="int64"),
                "match_value": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values(
        ["event_id", "match_event_id"]
    ).reset_index(drop=True)


def _brute(left_rows, right_rows) -> pd.DataFrame:
    out = []
    for l in left_rows:
        for r in right_rows:
            if (
                r["user_id"] == l["user_id"]
                and l["ts"] - WINDOW <= r["ts"] <= l["ts"]
            ):
                out.append(
                    {
                        **l,
                        "match_event_id": r["event_id"],
                        "match_value": r["value"],
                    }
                )
    if not out:
        return pd.DataFrame(
            columns=["event_id", "user_id", "ts", "match_event_id", "match_value"]
        )
    return (
        pd.DataFrame(out)
        .sort_values(["event_id", "match_event_id"])
        .reset_index(drop=True)
    )


def test_range_join_matches_bruteforce_randomized():
    import random

    rng = random.Random(11)
    left = [
        {"event_id": i, "user_id": rng.randrange(5), "ts": _ts(rng.randrange(200))}
        for i in range(100)
    ]
    right = [
        {
            "event_id": 1000 + i,
            "user_id": rng.randrange(5),
            "ts": _ts(rng.randrange(200)),
            "value": float(i),
        }
        for i in range(100)
    ]
    got = _run(left, right)
    exp = _brute(left, right)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_range_join_inclusive_bounds_and_inner_drop():
    left = [
        {"event_id": 1, "user_id": 1, "ts": _ts(20)},
        {"event_id": 2, "user_id": 1, "ts": _ts(100)},  # empty window
    ]
    right = [
        {"event_id": 100, "user_id": 1, "ts": _ts(10), "value": 1.0},  # lower edge
        {"event_id": 101, "user_id": 1, "ts": _ts(20), "value": 2.0},  # upper edge
        {"event_id": 102, "user_id": 1, "ts": _ts(9.99), "value": 3.0},  # outside
        {"event_id": 103, "user_id": 2, "ts": _ts(15), "value": 4.0},  # other user
    ]
    got = _run(left, right)
    assert got["event_id"].tolist() == [1, 1]
    assert got["match_event_id"].tolist() == [100, 101]


def test_time_partitioned_range_join_equals_plain():
    """range_join_time_partitioned (window-start epoch grouping +
    2x right duplication) must emit EXACTLY the plain range_join
    pairs, including windows that straddle an epoch boundary — with
    the tight case epoch == window span."""
    import random

    from finance_sc_relations_ray.stages.joins import (
        range_join_time_partitioned,
    )

    rng = random.Random(31)
    left = [
        {"event_id": i, "user_id": rng.randrange(4),
         "ts": _ts(rng.randrange(2000) / 10.0)}  # 6-second grid
        for i in range(150)
    ]
    right = [
        {
            "event_id": 1000 + i,
            "user_id": rng.randrange(4),
            "ts": _ts(rng.randrange(2000) / 10.0),
            "value": float(i),
        }
        for i in range(120)
    ]
    exp = _brute(left, right)

    left_ds = ray.data.from_arrow(pa.Table.from_pylist(left, schema=LEFT_SCHEMA))
    right_ds = ray.data.from_arrow(
        pa.Table.from_pylist(
            right,
            schema=pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("user_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("value", pa.float64()),
                ]
            ),
        )
    )
    got = (
        range_join_time_partitioned(
            left_ds,
            right_ds,
            by="user_id",
            ts="ts",
            lower_offset=-WINDOW,
            upper_offset=datetime.timedelta(0),
            payload={"event_id": "match_event_id", "value": "match_value"},
            left_schema=LEFT_SCHEMA,
            payload_types=PAYLOAD_TYPES,
            epoch=WINDOW,  # tight: epoch == window span
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["event_id", "match_event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
