"""Suffix-dispatch table reader (reference S1:
src/relation_extraction/infer.py:368-413 dispatches tsv/csv/json/xlsx
via a format registry). Parquet is the canonical format at scale; the
dispatch exists for interchange inputs. xlsx is environment-gated (no
openpyxl here) and raises with a clear message."""

from __future__ import annotations

import os

import ray.data

_READERS = {
    ".parquet": ray.data.read_parquet,
    ".csv": ray.data.read_csv,
    ".json": ray.data.read_json,
    ".jsonl": ray.data.read_json,
}


def read_table(path: str, **kwargs) -> "ray.data.Dataset":
    """Read a tabular file/dir into a Dataset by extension; directories
    dispatch on their first file's extension (parquet default)."""
    p = path
    if os.path.isdir(path):
        files = sorted(f for f in os.listdir(path) if not f.startswith("_"))
        p = files[0] if files else "x.parquet"
    ext = os.path.splitext(p)[1].lower()
    if ext == ".tsv":
        from ray.data.datasource import CSVDatasource  # noqa: F401 (doc)
        import pyarrow.csv as pacsv

        return ray.data.read_csv(
            path,
            parse_options=pacsv.ParseOptions(delimiter="\t"),
            **kwargs,
        )
    if ext == ".xlsx":
        raise NotImplementedError(
            "xlsx requires openpyxl, not present in this environment; "
            "convert to parquet/csv"
        )
    reader = _READERS.get(ext, ray.data.read_parquet)
    return reader(path, **kwargs)
