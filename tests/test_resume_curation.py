"""Resumable curation flagship (r3 verdict #7): the partitioned
curation runner must resume a killed run at part granularity with
read-layer pruning, and its final output must equal the one-shot
``curate_documents`` row-for-row."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from finance_sc_relations_ray.pipelines.run import curate_partitioned
from finance_sc_relations_ray.pipelines.text import curate_documents
from finance_sc_relations_ray.state.manifest import Manifest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs_sf_dir(tmp_path_factory):
    """An sf_dir whose documents.parquet is a DIRECTORY of 8 files —
    partitions are input-file groups, so the fixture must be
    multi-file. Rows are sf0.01's documents, so the one-shot oracle-
    gated pipeline is directly comparable."""
    d = tmp_path_factory.mktemp("sf_curate")
    docs = pq.read_table(os.path.join(SF, "documents.parquet"))
    docs_dir = d / "documents.parquet"
    docs_dir.mkdir()
    n = docs.num_rows
    step = (n + 7) // 8
    for i in range(8):
        pq.write_table(
            docs.slice(i * step, step), str(docs_dir / f"docs-{i}.parquet")
        )
    return str(d)


def _final_df(out: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(out, "final")).to_table()
    return (
        t.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "n_words"]]
    )


def test_interrupt_resume_and_equivalence(ray_session, docs_sf_dir, tmp_path):
    out = str(tmp_path / "curate_out")
    # interrupted run: only the first chunk of stage-1 parts completes;
    # stage 2 is deferred (near-dup clusters span parts, so the global
    # tail only runs once every part's winners are on disk)
    r1 = curate_partitioned(
        docs_sf_dir, out, num_parts=8, parts_per_chunk=4, max_chunks=1
    )
    assert r1["parts_done"] == 4 and "n_final" not in r1
    assert len([p for p in Manifest(out).completed_parts() if p >= 0]) == 4

    # resume: the 4 finished parts are pruned AT THE READ (1 file per
    # part here), the rest run, then stage 2 produces the final output
    r2 = curate_partitioned(docs_sf_dir, out, num_parts=8, parts_per_chunk=4)
    assert r2["parts_done"] == 8
    assert r2["parts_run"] == 4
    assert r2["files_read"] == 4
    assert r2["n_final"] > 0

    # equivalence: resumed partitioned output == one-shot flagship
    exp = curate_documents(docs_sf_dir)
    got = _final_df(out)
    pd.testing.assert_frame_equal(got, exp[["doc_id", "n_words"]])

    # idempotent re-run: nothing recomputed, same answer reported
    r3 = curate_partitioned(docs_sf_dir, out, num_parts=8, parts_per_chunk=4)
    assert r3["parts_run"] == 0 and r3["files_read"] == 0
    assert r3["n_final"] == r2["n_final"]
    assert _final_df(out).equals(got)

    # per-part lineage metrics present
    for rec in Manifest(out).metrics():
        assert "seconds" in rec
        if rec["part"] >= 0:
            assert {"n_files", "n_winner_rows"} <= set(rec)


def test_fresh_run_matches_oracle_scale(ray_session, docs_sf_dir, tmp_path):
    """A single uninterrupted partitioned run also equals the one-shot
    path (no resume involvement — pure decomposition equivalence)."""
    out = str(tmp_path / "curate_out2")
    r = curate_partitioned(docs_sf_dir, out, num_parts=4, parts_per_chunk=4)
    assert r["parts_done"] == 4 and r["n_final"] > 0
    exp = curate_documents(docs_sf_dir)
    pd.testing.assert_frame_equal(_final_df(out), exp[["doc_id", "n_words"]])


def test_pretrain_export_partitioned_matches_one_shot(
    docs_sf_dir, tmp_path, ray_session
):
    """The resumable export (stages 1+2 = partitioned curation with
    keep_text, stage 3 = decontaminate + pack written to export/) must
    equal the one-shot pretrain_export row-for-row, resume at part
    granularity, and never re-run a completed export stage."""
    import pyarrow.dataset as pads

    from finance_sc_relations_ray.pipelines.run import (
        pretrain_export_partitioned,
    )
    from finance_sc_relations_ray.pipelines.text import pretrain_export

    out = str(tmp_path / "export_out")

    # interrupted: only the first stage-1 chunk runs; export deferred
    partial = pretrain_export_partitioned(
        docs_sf_dir, out, num_parts=4, parts_per_chunk=1, max_chunks=1,
        on_degenerate="raise",
    )
    assert partial["parts_run"] == 1 and "n_exported" not in partial

    # resume: stages complete, export written
    done = pretrain_export_partitioned(
        docs_sf_dir, out, num_parts=4, parts_per_chunk=1,
        on_degenerate="raise",
    )
    assert done["parts_done"] == 4 and done["n_exported"] > 0

    got = (
        pads.dataset(os.path.join(out, "export"))
        .to_table()
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = pretrain_export(docs_sf_dir, on_degenerate="raise")
    pd.testing.assert_frame_equal(got, exp)

    # idempotent re-run: nothing re-executes, export untouched
    stats_before = sorted(
        (f, os.stat(os.path.join(out, "export", f)).st_mtime_ns)
        for f in os.listdir(os.path.join(out, "export"))
    )
    again = pretrain_export_partitioned(
        docs_sf_dir, out, num_parts=4, parts_per_chunk=1,
        on_degenerate="raise",
    )
    assert again["parts_run"] == 0 and again["n_exported"] == done["n_exported"]
    stats_after = sorted(
        (f, os.stat(os.path.join(out, "export", f)).st_mtime_ns)
        for f in os.listdir(os.path.join(out, "export"))
    )
    assert stats_after == stats_before


def test_pretrain_export_partitioned_single_file_corpus(
    tmp_path, ray_session
):
    """Regression: curate_partitioned clamps num_parts to the input
    FILE count, so a single-file corpus must still reach the export
    stage (the old parts_done < num_parts check deferred it forever)."""
    import pyarrow.dataset as pads

    from finance_sc_relations_ray.pipelines.run import (
        pretrain_export_partitioned,
    )
    from finance_sc_relations_ray.pipelines.text import pretrain_export

    d = tmp_path / "sf_single"
    d.mkdir()
    pq.write_table(
        pq.read_table(os.path.join(SF, "documents.parquet")),
        str(d / "documents.parquet"),
    )
    out = str(tmp_path / "out")
    s = pretrain_export_partitioned(
        str(d), out, num_parts=16, on_degenerate="raise"
    )
    assert s["parts_done"] == 1 and s["n_exported"] > 0, s
    got = (
        pads.dataset(os.path.join(out, "export"))
        .to_table()
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = pretrain_export(str(d), on_degenerate="raise")
    pd.testing.assert_frame_equal(got, exp)
