"""DSIR importance scoring: the exact-SQL parity is covered by the
oracle gate (tests/test_queries_vs_duckdb.py discovers
``dsir_importance``); these tests pin the SEMANTICS on planted data
where the expected ordering is unambiguous."""

import pyarrow as pa
import pyarrow.parquet as pq

from finance_sc_relations_ray.pipelines.text import dsir_importance_documents

TARGET_WORDS = "earnings revenue guidance quarterly supplier".split()
GENERIC_WORDS = "lorem ipsum dolor sit amet".split()


def _write_docs(tmp_path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")


def test_dsir_separates_planted_vocabularies(ray_session, tmp_path):
    """Target sources speak vocabulary A, the rest vocabulary B; every
    held-out A-speaking doc must outscore every B-speaking doc of the
    same length (scores are per-token sums, so equal lengths make the
    comparison exact)."""
    rows = []
    did = 0
    # the target corpus (defines the target distribution)
    for i in range(20):
        rows.append((did, " ".join(TARGET_WORDS * 4), f"src{1 + i % 3}"))
        did += 1
    # raw-corpus bulk in the generic vocabulary
    for i in range(40):
        rows.append((did, " ".join(GENERIC_WORDS * 4), f"src{4 + i % 5}"))
        did += 1
    # held-out candidates, NOT in target sources, same token count
    a_ids, b_ids = [], []
    for i in range(5):
        rows.append((did, " ".join(TARGET_WORDS * 4), "src9"))
        a_ids.append(did)
        did += 1
        rows.append((did, " ".join(GENERIC_WORDS * 4), "src9"))
        b_ids.append(did)
        did += 1
    _write_docs(tmp_path, rows)
    out = dsir_importance_documents(str(tmp_path)).set_index("doc_id")[
        "micro_logratio"
    ]
    assert min(out[a_ids]) > max(out[b_ids])


def test_dsir_omits_zero_token_docs(ray_session, tmp_path):
    _write_docs(
        tmp_path,
        [(0, "some words here", "src1"), (1, "   ", "src2"), (2, "", "src3")],
    )
    out = dsir_importance_documents(str(tmp_path))
    assert out["doc_id"].tolist() == [0]
