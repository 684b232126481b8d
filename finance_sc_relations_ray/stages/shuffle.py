"""Skew-safe shuffle helpers: salted / two-phase aggregation.

A bare ``groupby(key).map_groups`` ships every row of a hot key to one
task (the Apple/Samsung-hub problem, SURVEY.md §7.4). These helpers
implement the combiner pattern the north rule asks for explicitly:

- ``partial_agg_batches``: inside ``map_batches``, collapse each batch
  to one row per key (a per-batch combiner — this is the "salt": the
  partial key-space is (key × batch), so no single reducer sees more
  than #batches rows per key);
- a final small ``groupby(keys).aggregate`` merges the partials.

Used by the triple dedup (stages/triples.py) and reusable for any
sum/max/count-shaped aggregate.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

import ray.data
from ray.data.aggregate import Max, Sum


def partial_dedup_batch(batch: pa.Table, keys: list[str]) -> pa.Table:
    """Per-batch combiner for exact dedup with (max score, summed
    n_mentions) merge semantics."""
    agg: dict[tuple, list] = {}
    score = batch["score"].to_pylist()
    n = (
        batch["n_mentions"].to_pylist()
        if "n_mentions" in batch.column_names
        else [1] * batch.num_rows
    )
    key_cols = [batch[k].to_pylist() for k in keys]
    for i in range(batch.num_rows):
        k = tuple(col[i] for col in key_cols)
        cur = agg.get(k)
        if cur is None:
            agg[k] = [score[i], n[i]]
        else:
            cur[0] = max(cur[0], score[i])
            cur[1] += n[i]
    cols: dict[str, list] = {k: [] for k in keys}
    cols["score"] = []
    cols["n_mentions"] = []
    for k, (s, c) in agg.items():
        for name, v in zip(keys, k):
            cols[name].append(v)
        cols["score"].append(s)
        cols["n_mentions"].append(c)
    key_types = {k: batch.schema.field(k).type for k in keys}
    return pa.table(
        {
            **{k: pa.array(cols[k], type=key_types[k]) for k in keys},
            "score": pa.array(cols["score"], type=pa.float32()),
            "n_mentions": pa.array(cols["n_mentions"], type=pa.int64()),
        }
    )


def salted_dedup(
    ds: "ray.data.Dataset", keys: list[str]
) -> "ray.data.Dataset":
    """Two-phase exact dedup: per-batch combiner → tiny final groupby.

    The final all-to-all only moves one row per (key, batch) — bounded
    regardless of key skew.
    """
    partial = ds.map_batches(
        lambda b: partial_dedup_batch(b, keys), batch_format="pyarrow"
    )
    out = partial.groupby(keys).aggregate(
        Max("score", alias_name="score"),
        Sum("n_mentions", alias_name="n_mentions"),
    )
    return out
