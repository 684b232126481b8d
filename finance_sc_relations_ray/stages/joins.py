"""Co-partitioned bucket lookup join — the broadcast-free small×large
join primitive.

``bucket_lookup_join(left, right, ...)`` attaches columns of ``right``
to the rows of ``left`` that match on a key, WITHOUT materializing
either side on the driver and WITHOUT broadcasting: both sides are
hash-bucketed on the key (``crc32(str(key)) % num_buckets``), unioned,
and a single ``groupby(bucket).map_groups`` builds a per-bucket dict
from the right rows and maps the left rows through it.

This is the Ray-Data composition for the joins the reference runs in
SQL (Athena JOIN, src/glue/glue_etl.py) re-expressed as
map_batches + groupby per the custom-operator guidance: no all-pairs
blowup, one all-to-all exchange, skew bounded by the hash bucketing
(a single hot KEY still lands in one bucket — salt upstream if a key's
right-side payload itself is huge).

Partitioning assumption (documented per the north rule): each bucket's
RIGHT-side rows must fit in one task's heap (~|right| / num_buckets
— size ``num_buckets`` to the right table, not the left). The left
side streams through the same exchange but is never dict-materialized.

Used by ``pipelines/text.py`` to replace two driver-side dicts flagged
in round 1: the per-doc shingle-count map of the exact-Jaccard path and
the candidate-text fetch of the MinHash verify stage.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
from pandas import isna as pd_isna

import ray.data

_BUCKET = "__jbucket"
_SIDE = "__jside"

# Fusion blocker for whole-group map_groups stages. Ray 2.49's operator
# fusion will fuse a map_groups-generated map op with a downstream map
# op when their remote args are compatible, and the fused stage
# re-bundles the SORTED input blocks before the group fn runs — the fn
# then sees PARTIAL groups. Any group fn that needs the whole group
# (this hash join; dedup merges; per-group argmax) silently corrupts:
# reproduced on ngram_jaccard_pairs at sf0.1, where ~1 run in 5 lost
# 98% of join rows (inner-join left rows split from their right rows).
# A non-default num_cpus makes `_are_remote_args_compatible` fail
# (canonicalized 0.99 != 1), so fusion is skipped and each call gets a
# whole sorted block, 8/8 stable. The 0.01-CPU difference is
# scheduling noise. (The KG actor stages were never affected — their
# num_cpus=0.5 blocked fusion already.)
NO_FUSE_NUM_CPUS = 0.99


def _bucket_of(val, num_buckets: int) -> int:
    return zlib.crc32(str(val).encode("utf-8")) % num_buckets


def bucket_lookup_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_key: str,
    payload: dict[str, str],
    left_schema: pa.Schema,
    payload_types: dict[str, pa.DataType],
    num_buckets: int = 64,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Attach ``payload`` columns of ``right`` (renamed per the mapping
    ``{right_col: out_col}``) to ``left`` rows where
    ``left[on] == right[right_key]``.

    ``left_schema`` / ``payload_types`` are passed explicitly so the
    union schema is known at graph-build time (inspecting a lazy
    Dataset's schema would force partial execution). ``how`` is
    ``"inner"`` (drop unmatched left rows) or ``"left"`` (keep, null
    payload).
    """
    out_names = list(payload.values())
    left_names = list(left_schema.names)

    def prep_left(batch: pa.Table) -> pa.Table:
        cols = {_BUCKET: pa.array(
            [_bucket_of(v, num_buckets) for v in batch[on].to_pylist()],
            pa.int32(),
        ), _SIDE: pa.array([0] * batch.num_rows, pa.int8())}
        for name in left_names:
            cols[name] = batch[name]
        for name in out_names:
            cols[name] = pa.nulls(batch.num_rows, payload_types[name])
        return pa.table(cols)

    def prep_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch[right_key].to_pylist()
        cols = {_BUCKET: pa.array(
            [_bucket_of(v, num_buckets) for v in keys], pa.int32()
        ), _SIDE: pa.array([1] * n, pa.int8())}
        for name in left_names:
            if name == on:
                # the right key rides in the left join column's slot so
                # the group fn needs no extra key column
                cols[name] = pa.array(keys, left_schema.field(on).type)
            else:
                cols[name] = pa.nulls(n, left_schema.field(name).type)
        for rcol, name in payload.items():
            cols[name] = batch[rcol].cast(payload_types[name])
        return pa.table(cols)

    nested = {
        name: pa.types.is_nested(payload_types[name]) for name in out_names
    }

    def join_group(g: pa.Table) -> pa.Table:
        # vectorized split + pandas hash merge — no Python row loop.
        # Deliberately NOT pyarrow Table.join: Acero's hash join run
        # inside many concurrent Ray tasks SILENTLY DROPPED rows in
        # this repo (deterministically at 32 CPUs on the chained-join
        # jaccard path: 17,356 of 1,130,536 rows survived; the same
        # pipeline with this pandas merge is exact on every trial).
        import pyarrow.compute as pc

        left_rows = g.filter(pc.equal(g[_SIDE], 0)).select(left_names)
        right_rows = g.filter(pc.equal(g[_SIDE], 1))
        right_tbl = right_rows.select([on] + out_names).rename_columns(
            ["__jkey"] + out_names
        )
        joined = left_rows.to_pandas().merge(
            right_tbl.to_pandas(),
            left_on=on,
            right_on="__jkey",
            how="inner" if how == "inner" else "left",
        )
        arrays = {}
        for name in left_names:
            t = left_schema.field(name).type
            col = joined[name]
            if pa.types.is_nested(t):
                arrays[name] = pa.array(
                    [None if v is None else list(v) for v in col], type=t
                )
            else:
                arrays[name] = pa.array(col.tolist(), type=t)
        for name in out_names:
            t = payload_types[name]
            if nested[name]:
                arrays[name] = pa.array(
                    [None if v is None or isinstance(v, float)
                     else (v if isinstance(v, (list, tuple)) else list(v))
                     for v in joined[name]],
                    type=t,
                )
            else:
                col = joined[name]
                if how == "left":
                    arrays[name] = pa.array(
                        [None if pd_isna(v) else v for v in col], type=t
                    )
                else:
                    arrays[name] = pa.array(col.tolist(), type=t)
        return pa.table(arrays)

    combined = left.map_batches(prep_left, batch_format="pyarrow").union(
        right.map_batches(prep_right, batch_format="pyarrow")
    )
    return combined.groupby(_BUCKET).map_groups(
        join_group, batch_format="pyarrow", num_cpus=NO_FUSE_NUM_CPUS
    )


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    ts: str,
    payload: dict[str, str],
    left_schema: pa.Schema,
    payload_types: dict[str, pa.DataType],
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distributed backward as-of join (an operator Ray Data lacks):
    each left row gets the payload of the LATEST right row with the
    same ``by`` key and ``right[ts] <= left[ts]``; left rows with no
    such right row are dropped (inner semantics — keeps output types
    null-free for exact oracle comparison).

    Composition (custom-operator path (a)): both sides are hash-
    bucketed on ``by`` and unioned; one ``groupby(bucket).map_groups``
    runs a vectorized ``pandas.merge_asof`` per bucket. ONE all-to-all
    exchange; per-task memory is ~(|L|+|R|)/num_buckets.

    Partitioning assumption: all rows of one ``by`` key land in one
    bucket (required for correctness) and a bucket fits a task heap —
    size ``num_buckets`` to the combined table. For time-series where
    single keys outgrow a task, sub-partition by coarse time range and
    duplicate each right partition's last row into the next range
    (not needed at this repo's key cardinalities).

    Determinism with duplicate right timestamps: among right rows that
    tie on ``(by, ts)`` the one with the greatest first-payload value
    wins (callers pass a unique id as the first payload column), on
    both this side and the DuckDB ``ASOF JOIN`` oracle (arg_max).
    """
    out_names = list(payload.values())
    left_names = list(left_schema.names)
    tiebreak = out_names[0]

    def prep_left(batch: pa.Table) -> pa.Table:
        cols = {
            _BUCKET: pa.array(
                [_bucket_of(v, num_buckets) for v in batch[by].to_pylist()],
                pa.int32(),
            ),
            _SIDE: pa.array([0] * batch.num_rows, pa.int8()),
        }
        for name in left_names:
            cols[name] = batch[name]
        for name in out_names:
            cols[name] = pa.nulls(batch.num_rows, payload_types[name])
        return pa.table(cols)

    def prep_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch[by].to_pylist()
        cols = {
            _BUCKET: pa.array(
                [_bucket_of(v, num_buckets) for v in keys], pa.int32()
            ),
            _SIDE: pa.array([1] * n, pa.int8()),
        }
        for name in left_names:
            if name == by:
                cols[name] = pa.array(keys, left_schema.field(by).type)
            elif name == ts:
                cols[name] = batch[ts].cast(left_schema.field(ts).type)
            else:
                cols[name] = pa.nulls(n, left_schema.field(name).type)
        for rcol, name in payload.items():
            cols[name] = batch[rcol].cast(payload_types[name])
        return pa.table(cols)

    def join_group(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lt = g.filter(pc.equal(g[_SIDE], 0)).select(left_names).to_pandas()
        rt = (
            g.filter(pc.equal(g[_SIDE], 1))
            .select([by, ts] + out_names)
            .to_pandas()
        )
        if len(lt) == 0 or len(rt) == 0:
            return pa.table(
                {
                    **{n: pa.array([], left_schema.field(n).type)
                       for n in left_names},
                    **{n: pa.array([], payload_types[n]) for n in out_names},
                }
            )
        # deterministic tie-break among equal (by, ts) right rows
        rt = (
            rt.sort_values([ts, tiebreak], kind="mergesort")
            .drop_duplicates([by, ts], keep="last")
            .sort_values(ts, kind="mergesort")
        )
        joined = __import__("pandas").merge_asof(
            lt.sort_values(ts, kind="mergesort"),
            rt,
            on=ts,
            by=by,
            direction="backward",
            allow_exact_matches=True,
        )
        joined = joined.dropna(subset=[tiebreak])
        arrays = {}
        for name in left_names:
            arrays[name] = pa.array(
                joined[name].tolist(), type=left_schema.field(name).type
            )
        for name in out_names:
            t = payload_types[name]
            col = joined[name]
            if pa.types.is_integer(t):
                # merge_asof upcasts int payload to float64 (NaN slots,
                # dropped above) — restore before typed construction
                col = col.astype("int64")
            arrays[name] = pa.array(col.tolist(), type=t)
        return pa.table(arrays)

    combined = left.map_batches(prep_left, batch_format="pyarrow").union(
        right.map_batches(prep_right, batch_format="pyarrow")
    )
    return combined.groupby(_BUCKET).map_groups(
        join_group, batch_format="pyarrow", num_cpus=NO_FUSE_NUM_CPUS
    )


def range_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    ts: str,
    lower_offset,
    upper_offset,
    payload: dict[str, str],
    left_schema: pa.Schema,
    payload_types: dict[str, pa.DataType],
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distributed interval (range) join: emit one output row for EVERY
    right row with the same ``by`` key whose timestamp falls in
    ``[left[ts] + lower_offset, left[ts] + upper_offset]`` (both
    pandas/``datetime.timedelta`` offsets, bounds inclusive — the
    all-matches companion to ``asof_join``'s latest-match). Inner
    semantics: left rows with no match emit nothing.

    Same physical plan as ``asof_join`` (hash-bucket both sides on
    ``by``, union, one ``groupby(bucket).map_groups``); inside a bucket
    each key's right timestamps are sorted once and every left row's
    window is located with two vectorized ``searchsorted`` calls — no
    per-pair Python work before the final gather.

    Partitioning assumption: as ``asof_join``. Additionally the OUTPUT
    is data-dependent (a hot key with a dense window emits
    |L_w|×|R_w| rows); if a key's window density is unbounded,
    sub-partition by coarse time range so each task's emit stays
    bounded, or cap the window span upstream.
    """
    import numpy as np

    out_names = list(payload.values())
    left_names = list(left_schema.names)
    # numpy rejects datetime64 + datetime.timedelta; normalize once
    lower_np = np.timedelta64(lower_offset)
    upper_np = np.timedelta64(upper_offset)

    def prep_left(batch: pa.Table) -> pa.Table:
        cols = {
            _BUCKET: pa.array(
                [_bucket_of(v, num_buckets) for v in batch[by].to_pylist()],
                pa.int32(),
            ),
            _SIDE: pa.array([0] * batch.num_rows, pa.int8()),
        }
        for name in left_names:
            cols[name] = batch[name]
        for name in out_names:
            cols[name] = pa.nulls(batch.num_rows, payload_types[name])
        return pa.table(cols)

    def prep_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch[by].to_pylist()
        cols = {
            _BUCKET: pa.array(
                [_bucket_of(v, num_buckets) for v in keys], pa.int32()
            ),
            _SIDE: pa.array([1] * n, pa.int8()),
        }
        for name in left_names:
            if name == by:
                cols[name] = pa.array(keys, left_schema.field(by).type)
            elif name == ts:
                cols[name] = batch[ts].cast(left_schema.field(ts).type)
            else:
                cols[name] = pa.nulls(n, left_schema.field(name).type)
        for rcol, name in payload.items():
            cols[name] = batch[rcol].cast(payload_types[name])
        return pa.table(cols)

    def _empty() -> pa.Table:
        return pa.table(
            {
                **{n: pa.array([], left_schema.field(n).type)
                   for n in left_names},
                **{n: pa.array([], payload_types[n]) for n in out_names},
            }
        )

    def join_group(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lt = g.filter(pc.equal(g[_SIDE], 0)).select(left_names).to_pandas()
        rt = (
            g.filter(pc.equal(g[_SIDE], 1))
            .select([by, ts] + out_names)
            .to_pandas()
        )
        if len(lt) == 0 or len(rt) == 0:
            return _empty()
        left_parts, right_parts = [], []
        for key, rgrp in rt.groupby(by, sort=False):
            lgrp = lt[lt[by] == key]
            if len(lgrp) == 0:
                continue
            rgrp = rgrp.sort_values(ts, kind="mergesort")
            rts = rgrp[ts].to_numpy()
            lts = lgrp[ts].to_numpy()
            lo = np.searchsorted(rts, lts + lower_np, side="left")
            hi = np.searchsorted(rts, lts + upper_np, side="right")
            counts = hi - lo
            keep = counts > 0
            if not keep.any():
                continue
            left_idx = np.repeat(np.flatnonzero(keep), counts[keep])
            right_idx = np.concatenate(
                [np.arange(a, b) for a, b in zip(lo[keep], hi[keep])]
            )
            left_parts.append(lgrp.iloc[left_idx])
            right_parts.append(rgrp.iloc[right_idx])
        if not left_parts:
            return _empty()
        import pandas as pd

        lout = pd.concat(left_parts, ignore_index=True)
        rout = pd.concat(right_parts, ignore_index=True)
        arrays = {}
        for name in left_names:
            arrays[name] = pa.array(
                lout[name].tolist(), type=left_schema.field(name).type
            )
        for name in out_names:
            arrays[name] = pa.array(
                rout[name].tolist(), type=payload_types[name]
            )
        return pa.table(arrays)

    combined = left.map_batches(prep_left, batch_format="pyarrow").union(
        right.map_batches(prep_right, batch_format="pyarrow")
    )
    return combined.groupby(_BUCKET).map_groups(
        join_group, batch_format="pyarrow", num_cpus=NO_FUSE_NUM_CPUS
    )


def asof_join_time_partitioned(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    ts: str,
    payload: dict[str, str],
    left_schema: pa.Schema,
    payload_types: dict[str, pa.DataType],
    epoch,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """``asof_join`` for time-series where a single key's history
    outgrows one task: rows are sub-partitioned into ``(key-bucket,
    epoch)`` groups of bounded time span (``epoch`` a timedelta), so
    per-task memory is bounded by epoch width × arrival rate instead of
    a key's full history.

    Correctness across epoch boundaries (a left row whose latest match
    lies in an EARLIER epoch) is restored by a carry stage: a small
    per-(key, epoch) aggregate keeps each epoch's LAST right row, a
    per-key prefix scan (grouped by key-bucket — one row per (key,
    epoch), tiny) turns it into "latest right row strictly before epoch
    e", and that one carry row is injected into epoch e's group.
    Three bounded exchanges total; no group ever holds more than one
    epoch of one bucket plus one carry row per key.

    Same tie-break and inner semantics as ``asof_join`` (equivalence-
    tested against it on random data, tests/test_asof_join.py).
    """
    import datetime

    import numpy as np
    import pandas as pd

    out_names = list(payload.values())
    left_names = list(left_schema.names)
    tiebreak = out_names[0]
    epoch_us = int(epoch / datetime.timedelta(microseconds=1))

    def _epoch_of(ts_arr: "pa.Array") -> list[int]:
        us = ts_arr.cast(pa.timestamp("us")).cast(pa.int64()).to_pylist()
        return [v // epoch_us for v in us]

    def prep_left(batch: pa.Table) -> pa.Table:
        keys = batch[by].to_pylist()
        ep = _epoch_of(batch[ts])
        cols = {
            _BUCKET: pa.array(
                [
                    _bucket_of(k, num_buckets) * 1_000_003 + e
                    for k, e in zip(keys, ep)
                ],
                pa.int64(),
            ),
            _SIDE: pa.array([0] * batch.num_rows, pa.int8()),
        }
        for name in left_names:
            cols[name] = batch[name]
        for name in out_names:
            cols[name] = pa.nulls(batch.num_rows, payload_types[name])
        return pa.table(cols)

    def prep_right(batch: pa.Table, shift: int = 0) -> pa.Table:
        n = batch.num_rows
        keys = batch[by].to_pylist()
        ep = [e + shift for e in _epoch_of(batch[ts])]
        cols = {
            _BUCKET: pa.array(
                [
                    _bucket_of(k, num_buckets) * 1_000_003 + e
                    for k, e in zip(keys, ep)
                ],
                pa.int64(),
            ),
            _SIDE: pa.array([1] * n, pa.int8()),
        }
        for name in left_names:
            if name == by:
                cols[name] = pa.array(keys, left_schema.field(by).type)
            elif name == ts:
                cols[name] = batch[ts].cast(left_schema.field(ts).type)
            else:
                cols[name] = pa.nulls(n, left_schema.field(name).type)
        for rcol, name in payload.items():
            cols[name] = batch[rcol].cast(payload_types[name])
        return pa.table(cols)

    # ---- carry stage: latest right row strictly BEFORE each epoch ----
    # 1) per (key, epoch): last right row (tie-break aware) — a small
    #    per-batch combiner + one bounded groupby
    raw_tiebreak = list(payload.keys())[0]

    def last_per_epoch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["__e"] = [v // epoch_us for v in
                     df[ts].astype("int64").to_numpy()]
        df = df.sort_values([ts, raw_tiebreak], kind="mergesort")
        lastr = df.groupby([by, "__e"], as_index=False).last()
        return pa.Table.from_pandas(lastr, preserve_index=False)

    def merge_last(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, raw_tiebreak], kind="mergesort")
        return g.groupby([by, "__e"], as_index=False).last()

    def add_kbucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__kb",
            pa.array(
                [_bucket_of(k, num_buckets) for k in batch[by].to_pylist()],
                pa.int32(),
            ),
        )

    right_cols = [by, ts] + list(payload.keys())
    lasts = (
        right.select_columns(right_cols)
        .map_batches(last_per_epoch, batch_format="pyarrow")
        .map_batches(add_kbucket, batch_format="pyarrow")
        .groupby("__kb")
        .map_groups(
            lambda g: merge_last(g.drop(columns="__kb")),
            batch_format="pandas",
            num_cpus=NO_FUSE_NUM_CPUS,
        )
    )

    # 2) distinct LEFT (key, epoch) pairs — the epochs that NEED a
    #    carry (a left row's match may live in ANY earlier epoch,
    #    including when its own epoch has no right rows at all)
    def left_epochs(batch: pa.Table) -> pa.Table:
        keys = batch[by].to_pylist()
        ep = _epoch_of(batch[ts])
        pairs = sorted(set(zip(keys, ep)))
        return pa.table(
            {
                by: pa.array([p[0] for p in pairs],
                             left_schema.field(by).type),
                "__e": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )

    left_marks = left.map_batches(left_epochs, batch_format="pyarrow")

    # 3) per key (grouped by key-bucket): for every left-active epoch e
    #    emit the latest right epoch-last with epoch < e — one binary
    #    search per (key, left-epoch), one carry row out
    def carries(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        marks = g[g["__mark"] == 1]
        lastr = g[g["__mark"] == 0]
        outs = []
        last_by_key = {k: kg.sort_values("__e", kind="mergesort")
                       for k, kg in lastr.groupby(by, sort=False)}
        for k, mk in marks.groupby(by, sort=False):
            kg = last_by_key.get(k)
            if kg is None:
                continue
            eps = kg["__e"].to_numpy()
            for e in sorted(set(mk["__e"])):
                i = int(np.searchsorted(eps, e, side="left")) - 1
                if i >= 0:
                    row = kg.iloc[i].copy()
                    row["__e"] = e
                    outs.append(row)
        if not outs:
            return lastr.iloc[0:0].drop(columns="__mark")
        return pd.DataFrame(outs).drop(columns="__mark")

    def mark(batch: pa.Table, m: int) -> pa.Table:
        return batch.append_column(
            "__mark", pa.array([m] * batch.num_rows, pa.int8())
        )

    carry_input = lasts.map_batches(
        lambda b: mark(b, 0), batch_format="pyarrow"
    ).union(
        left_marks.map_batches(lambda b: mark(b, 1), batch_format="pyarrow")
    )
    carry_ds = carry_input.map_batches(
        add_kbucket, batch_format="pyarrow"
    ).groupby("__kb").map_groups(
        lambda g: carries(g.drop(columns="__kb")),
        batch_format="pandas",
        num_cpus=NO_FUSE_NUM_CPUS,
    )

    def prep_carry(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch[by].to_pylist()
        ep = batch["__e"].to_pylist()
        cols = {
            _BUCKET: pa.array(
                [
                    _bucket_of(k, num_buckets) * 1_000_003 + e
                    for k, e in zip(keys, ep)
                ],
                pa.int64(),
            ),
            _SIDE: pa.array([1] * n, pa.int8()),
        }
        for name in left_names:
            if name == by:
                cols[name] = pa.array(keys, left_schema.field(by).type)
            elif name == ts:
                cols[name] = batch[ts].cast(left_schema.field(ts).type)
            else:
                cols[name] = pa.nulls(n, left_schema.field(name).type)
        for rcol, name in payload.items():
            cols[name] = batch[rcol].cast(payload_types[name])
        return pa.table(cols)

    def join_group(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lt = g.filter(pc.equal(g[_SIDE], 0)).select(left_names).to_pandas()
        rt = (
            g.filter(pc.equal(g[_SIDE], 1))
            .select([by, ts] + out_names)
            .to_pandas()
        )
        if len(lt) == 0 or len(rt) == 0:
            return pa.table(
                {
                    **{n: pa.array([], left_schema.field(n).type)
                       for n in left_names},
                    **{n: pa.array([], payload_types[n]) for n in out_names},
                }
            )
        rt = (
            rt.sort_values([ts, tiebreak], kind="mergesort")
            .drop_duplicates([by, ts], keep="last")
            .sort_values(ts, kind="mergesort")
        )
        joined = pd.merge_asof(
            lt.sort_values(ts, kind="mergesort"),
            rt,
            on=ts,
            by=by,
            direction="backward",
            allow_exact_matches=True,
        ).dropna(subset=[tiebreak])
        arrays = {}
        for name in left_names:
            arrays[name] = pa.array(
                joined[name].tolist(), type=left_schema.field(name).type
            )
        for name in out_names:
            t = payload_types[name]
            col = joined[name]
            if pa.types.is_integer(t):
                col = col.astype("int64")
            arrays[name] = pa.array(col.tolist(), type=t)
        return pa.table(arrays)

    combined = (
        left.map_batches(prep_left, batch_format="pyarrow")
        .union(right.map_batches(prep_right, batch_format="pyarrow"))
        .union(carry_ds.map_batches(prep_carry, batch_format="pyarrow"))
    )
    return combined.groupby(_BUCKET).map_groups(
        join_group, batch_format="pyarrow", num_cpus=NO_FUSE_NUM_CPUS
    )
