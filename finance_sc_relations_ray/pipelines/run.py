"""Resumable partitioned execution of the KG pipeline.

Output layout (ray_guide 'Sources & sinks' resumability pattern):

    out_dir/
      part=<k>/ *.parquet     per-partition triples (within-part dedup)
      _manifest.jsonl         one line per completed part + metrics

Partitions are chunks of ``part = crc32(url) % num_parts``; each chunk
of parts is one Dataset execution ending in an idempotent overwrite of
those part directories, then a manifest append with per-partition
lineage metrics (n_pages, n_triples, seconds). A rerun skips parts in
the manifest AT THE READ (filter on the part column) and overwrites any
partially-written ones — mirroring the reference's
``overwrite_partitions`` semantics (src/sagemaker/re_inference.py:148-171).

Dedup scoping: triples are deduplicated WITHIN a partition; the
per-part aggregates (max score, summed n_mentions) are mergeable, so
``merge_parts`` yields the globally-deduplicated table as a final small
pass — global dedup must not span resume units or a resumed run could
double-count.
"""

from __future__ import annotations

import functools
import shutil
import time
import os

import pyarrow as pa
import ray
import ray.data

from ..config import DEFAULT_CONFIG, KGConfig
from ..state.manifest import Manifest, part_of
from .kg import read_pages
from ..stages.shuffle import salted_dedup
from ..stages.triples import to_triples_batch


def _add_part(batch: pa.Table, num_parts: int) -> pa.Table:
    parts = [part_of(u, num_parts) for u in batch["url"].to_pylist()]
    return batch.append_column("part", pa.array(parts, pa.int32()))


def _filter_parts(batch: pa.Table, wanted: set[int]) -> pa.Table:
    mask = pa.array([p in wanted for p in batch["part"].to_pylist()])
    return batch.filter(mask)


def run_partitioned(
    pages_path: str,
    out_dir: str,
    num_parts: int = 16,
    parts_per_chunk: int = 8,
    config: KGConfig = DEFAULT_CONFIG,
    max_chunks: int | None = None,
) -> dict:
    """Run (or resume) the pipeline, writing partitioned triples +
    manifest. Returns summary metrics. ``max_chunks`` exists for tests
    to simulate an interrupted run."""
    manifest = Manifest(out_dir)
    done = manifest.completed_parts()
    todo = [p for p in range(num_parts) if p not in done]
    chunks = [
        todo[i : i + parts_per_chunk] for i in range(0, len(todo), parts_per_chunk)
    ]
    if max_chunks is not None:
        chunks = chunks[:max_chunks]

    total = {"parts_done": len(done), "parts_run": 0, "n_triples": 0}
    for chunk in chunks:
        wanted = set(chunk)
        t0 = time.perf_counter()
        try:
            read_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 3)
        except Exception:
            read_blocks = 32
        pages = read_pages(pages_path, read_blocks).map_batches(
            functools.partial(_add_part, num_parts=num_parts),
            batch_format="pyarrow",
        ).map_batches(
            functools.partial(_filter_parts, wanted=wanted), batch_format="pyarrow"
        )
        # page counts per part (lineage metric) — tiny aggregate
        page_counts: dict[int, int] = {}
        for b in pages.select_columns(["part"]).iter_batches(batch_format="pyarrow"):
            for p in b["part"].to_pylist():
                page_counts[p] = page_counts.get(p, 0) + 1

        from ..gazetteer import company_db_table
        from ..stages.fused import PageKGActor

        db_ref = ray.put(company_db_table())
        linked = pages.drop_columns(["part"]).map_batches(
            PageKGActor,
            fn_constructor_kwargs={"config": config, "db_ref": db_ref},
            batch_format="pyarrow",
            batch_size=64,
            concurrency=config.ner_concurrency,
            num_cpus=config.actor_num_cpus,
        )
        triples = linked.map_batches(
            functools.partial(to_triples_batch, config=config),
            batch_format="pyarrow",
        ).map_batches(
            functools.partial(_add_part, num_parts=num_parts),
            batch_format="pyarrow",
        )
        deduped = salted_dedup(triples, ["subj", "pred", "obj", "part"])

        # idempotent overwrite of this chunk's part dirs
        for p in chunk:
            shutil.rmtree(os.path.join(out_dir, f"part={p}"), ignore_errors=True)
        part_counts: dict[int, int] = {p: 0 for p in chunk}
        err_counts: dict[int, int] = {}
        for b in deduped.iter_batches(batch_format="pyarrow"):
            # dead-letter split: quarantined pages ride the stream as
            # pred="_error" rows (stages/triples.py) — route them aside
            err_mask = pa.compute.equal(b["pred"], "_error")
            errs = b.filter(err_mask)
            if errs.num_rows:
                import pyarrow.parquet as pq

                dl_dir = os.path.join(out_dir, "_dead_letter")
                os.makedirs(dl_dir, exist_ok=True)
                pq.write_table(
                    errs,
                    os.path.join(dl_dir, f"chunk-{time.monotonic_ns()}.parquet"),
                )
                for p in errs["part"].to_pylist():
                    err_counts[int(p)] = err_counts.get(int(p), 0) + 1
                b = b.filter(pa.compute.invert(err_mask))
            for p in b["part"].to_pylist():
                part_counts[int(p)] = part_counts.get(int(p), 0) + 1
            for p in set(b["part"].to_pylist()):
                sub = b.filter(pa.compute.equal(b["part"], p))
                pdir = os.path.join(out_dir, f"part={p}")
                os.makedirs(pdir, exist_ok=True)
                import pyarrow.parquet as pq

                pq.write_table(
                    sub.drop_columns(["part"]),
                    os.path.join(pdir, f"chunk-{time.monotonic_ns()}.parquet"),
                )
        dt = time.perf_counter() - t0
        for p in chunk:
            manifest.mark_done(
                p,
                {
                    "n_pages": page_counts.get(p, 0),
                    "n_triples": part_counts.get(p, 0),
                    "n_errors": err_counts.get(p, 0),
                    "seconds": round(dt / max(1, len(chunk)), 3),
                },
            )
        total["parts_run"] += len(chunk)
        total["n_triples"] += sum(part_counts.values())
    total["parts_done"] = len(manifest.completed_parts())
    return total


def compact_parts(out_dir: str, target_rows_per_file: int = 500_000) -> dict:
    """Merge each partition's chunk files into few large files (the
    small-file problem: every resumed chunk run appends a file per
    part; readers want ≥100MB files). Crash-safe per part: the merged
    table is written to a non-``.parquet`` temp name (invisible to
    readers), fsynced, the old chunks are removed, and only then is the
    temp renamed to its final ``.parquet`` name — a crash at any point
    leaves readers seeing each row exactly once (either all old chunks,
    or the renamed compacted file). Existing ``compacted-*`` files are
    part of the input set, so reruns converge instead of duplicating.
    Dead-letter and manifest files are untouched."""
    import pyarrow.parquet as pq_

    stats = {"parts": 0, "files_before": 0, "files_after": 0}
    for name in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, name)
        if not name.startswith("part=") or not os.path.isdir(pdir):
            continue
        # recover from a previous crash mid-compaction: temp files were
        # never visible to readers and their source chunks still exist
        for f in os.listdir(pdir):
            if f.endswith(".compacting.tmp"):
                os.remove(os.path.join(pdir, f))
        files = sorted(
            os.path.join(pdir, f) for f in os.listdir(pdir)
            if f.endswith(".parquet")
        )
        if len(files) <= 1:
            continue
        table = pa.concat_tables([pq_.read_table(f) for f in files])
        stamp = time.monotonic_ns()
        tmp = os.path.join(pdir, f"compacted-{stamp}.compacting.tmp")
        final = os.path.join(pdir, f"compacted-{stamp}.parquet")
        pq_.write_table(table, tmp, row_group_size=target_rows_per_file)
        with open(tmp, "rb") as fh:
            os.fsync(fh.fileno())
        for f in files:
            os.remove(f)
        os.rename(tmp, final)
        stats["parts"] += 1
        stats["files_before"] += len(files)
        stats["files_after"] += 1
    return stats


def merge_parts(out_dir: str) -> "ray.data.Dataset":
    """Final global dedup over the partitioned output (small pass:
    per-part aggregates are mergeable)."""
    ds = ray.data.read_parquet(out_dir)
    return salted_dedup(ds, ["subj", "pred", "obj"])
