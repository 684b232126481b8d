"""Unit tests for the distributed backward as-of join
(stages/joins.asof_join): exact semantics vs a brute-force reference,
tie-breaking, unmatched-left drop, and empty-side groups."""

import datetime

import pandas as pd
import pyarrow as pa
import ray.data

from finance_sc_relations_ray.stages.joins import asof_join

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
    out = asof_join(
        left,
        right,
        by="user_id",
        ts="ts",
        payload={"event_id": "match_event_id", "value": "match_value"},
        left_schema=LEFT_SCHEMA,
        payload_types=PAYLOAD_TYPES,
        num_buckets=num_buckets,
    ).to_pandas()
    if out.empty and len(out.columns) == 0:
        # a Dataset whose blocks are all empty loses its schema in
        # to_pandas; rebuild the typed empty frame
        out = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "match_event_id": pd.Series([], dtype="int64"),
                "match_value": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values("event_id").reset_index(drop=True)


def _brute(left_rows, right_rows) -> pd.DataFrame:
    out = []
    for l in left_rows:
        cands = [
            r
            for r in right_rows
            if r["user_id"] == l["user_id"] and r["ts"] <= l["ts"]
        ]
        if not cands:
            continue
        best = max(cands, key=lambda r: (r["ts"], r["event_id"]))
        out.append(
            {
                **l,
                "match_event_id": best["event_id"],
                "match_value": best["value"],
            }
        )
    return (
        pd.DataFrame(out).sort_values("event_id").reset_index(drop=True)
    )


def test_asof_matches_bruteforce_randomized():
    import random

    rng = random.Random(7)
    left = [
        {"event_id": i, "user_id": rng.randrange(6), "ts": _ts(rng.randrange(500))}
        for i in range(120)
    ]
    right = [
        {
            "event_id": 1000 + i,
            "user_id": rng.randrange(6),
            "ts": _ts(rng.randrange(500)),
            "value": float(i),
        }
        for i in range(80)
    ]
    got = _run(left, right)
    exp = _brute(left, right)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_exact_match_and_tiebreak():
    left = [{"event_id": 1, "user_id": 5, "ts": _ts(10)}]
    # two right rows at the SAME (user, ts): the greater event_id wins
    right = [
        {"event_id": 100, "user_id": 5, "ts": _ts(10), "value": 1.0},
        {"event_id": 101, "user_id": 5, "ts": _ts(10), "value": 2.0},
        {"event_id": 99, "user_id": 5, "ts": _ts(9), "value": 3.0},
    ]
    got = _run(left, right)
    assert len(got) == 1
    assert got.loc[0, "match_event_id"] == 101  # exact-ts match, max id
    assert got.loc[0, "match_value"] == 2.0


def test_asof_unmatched_left_dropped_and_other_users_ignored():
    left = [
        {"event_id": 1, "user_id": 1, "ts": _ts(5)},   # no prior right
        {"event_id": 2, "user_id": 2, "ts": _ts(50)},  # other user's rows only
    ]
    right = [
        {"event_id": 100, "user_id": 1, "ts": _ts(10), "value": 1.0},
        {"event_id": 101, "user_id": 3, "ts": _ts(1), "value": 2.0},
    ]
    got = _run(left, right)
    assert len(got) == 0
    assert list(got.columns) == [
        "event_id", "user_id", "ts", "match_event_id", "match_value"
    ]
    # output dtypes stay int64 even when every row dropped
    assert str(got["match_event_id"].dtype) == "int64"


def test_time_partitioned_asof_equals_plain():
    """asof_join_time_partitioned (epoch sub-partitioning + carry rows)
    must produce EXACTLY the plain asof_join result, including matches
    that reach across epoch boundaries and keys silent for many
    epochs."""
    import random

    from finance_sc_relations_ray.stages.joins import (
        asof_join_time_partitioned,
    )

    rng = random.Random(23)
    # spread over ~33 epochs of 15 min; some keys sparse so carries
    # must jump multiple silent epochs
    left = [
        {"event_id": i, "user_id": rng.randrange(4), "ts": _ts(rng.randrange(500))}
        for i in range(150)
    ]
    right = [
        {
            "event_id": 1000 + i,
            "user_id": rng.randrange(4),
            "ts": _ts(rng.randrange(500)),
            "value": float(i),
        }
        for i in range(60)
    ]
    exp = _run(left, right)

    left_ds = ray.data.from_arrow(
        pa.Table.from_pylist(left, schema=LEFT_SCHEMA)
    )
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
        asof_join_time_partitioned(
            left_ds,
            right_ds,
            by="user_id",
            ts="ts",
            payload={"event_id": "match_event_id", "value": "match_value"},
            left_schema=LEFT_SCHEMA,
            payload_types=PAYLOAD_TYPES,
            epoch=datetime.timedelta(minutes=15),
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_ns_resolution_and_large_ids():
    """Regression for two review findings: (1) ns-resolution timestamp
    inputs must compute epochs identically to us inputs (the pandas
    int64 view of ns data is 1000x off-scale); (2) 64-bit ids above
    2^53 must survive exactly (the merge_asof float64 round-trip
    corrupts them unless the merge runs on a positional index)."""
    import random

    from finance_sc_relations_ray.stages.joins import (
        asof_join_time_partitioned,
    )

    big = 2**53 + 1  # not representable in float64
    rng = random.Random(5)
    left = [
        {"event_id": i, "user_id": rng.randrange(3), "ts": _ts(rng.randrange(300))}
        for i in range(60)
    ]
    right = [
        {
            "event_id": big + i,
            "user_id": rng.randrange(3),
            "ts": _ts(rng.randrange(300)),
            "value": float(i),
        }
        for i in range(40)
    ]
    exp = _brute(left, right)

    ns_schema_l = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("ns")),
        ]
    )
    ns_schema_r = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("ns")),
            ("value", pa.float64()),
        ]
    )
    left_ds = ray.data.from_arrow(pa.Table.from_pylist(left, schema=ns_schema_l))
    right_ds = ray.data.from_arrow(pa.Table.from_pylist(right, schema=ns_schema_r))
    got = (
        asof_join_time_partitioned(
            left_ds,
            right_ds,
            by="user_id",
            ts="ts",
            payload={"event_id": "match_event_id", "value": "match_value"},
            left_schema=LEFT_SCHEMA,  # declares us — prep casts ns inputs
            payload_types=PAYLOAD_TYPES,
            epoch=datetime.timedelta(minutes=15),
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    # ids preserved bit-exact (no float64 round-trip)
    assert got["match_event_id"].tolist() == exp["match_event_id"].tolist()
    assert (got["match_event_id"] > 2**53).all()
