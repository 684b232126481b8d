"""Single-process oracle for the KG pipeline.

Computes the expected triples for a pages table with plain Python/pandas
— document by document, no Ray — by driving the same per-record
semantic functions the stages use, composed sequentially exactly as the
reference composes them (infer_from_trained.predict_relations →
process_relations; see SURVEY.md §3.1/§3.3). The e2e test compares the
distributed pipeline's output (actor pools, shuffles, salted dedup)
against this oracle — it verifies the DISTRIBUTED COMPOSITION;
per-function parity with the reference is covered by the unit tests in
tests/.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from finance_sc_relations_ray.config import DEFAULT_CONFIG, KGConfig
from finance_sc_relations_ray.stages import extract, ner, scoring
from finance_sc_relations_ray.stages.doc_agg import aggregate_doc
from finance_sc_relations_ray.stages.link import Linker
from finance_sc_relations_ray.stages.shuffle import SENTENCE_IDS_CAP
from finance_sc_relations_ray.gazetteer import company_db_table


def _min_nonnull(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return min(a, b)


def expected_triples(
    pages: pa.Table, config: KGConfig = DEFAULT_CONFIG
) -> pd.DataFrame:
    """pages table → deduplicated triples with the full KG payload
    (subj/obj entity ids, witness url, capped sentence-id union)."""
    ner_actor = ner.NerActor(config)
    sc_actor = scoring.ScGateActor(config)
    re_actor = scoring.ReScorerActor(config)
    linker = Linker(company_db_table(), config)

    triples: dict[tuple[str, str, str], dict] = {}
    for page in pages.to_pylist():
        if page["lang"] != "en":
            continue
        url = page["url"]
        text = extract.extract_text(page["html"])
        sent_t = extract.sentencize_batch(
            pa.table({"url": [url], "page_text": [text]})
        )
        if sent_t.num_rows == 0:
            continue
        scored_sent = sc_actor(ner_actor(sent_t))
        gated = scoring.gate_filter(scored_sent)
        pairs = scoring.enumerate_pairs_batch(gated, config.num_positions)
        if pairs.num_rows == 0:
            continue
        scored_pairs = re_actor(pairs)
        doc_rel = aggregate_doc(scored_pairs, config).to_pylist()
        for row in doc_rel:
            if row["relation"] not in config.main_relations:
                continue
            eid, _, _ = linker.link(row["company"])
            rid, _, _ = linker.link(row["reporter"])
            if row["relation"] == "supplier":
                subj, obj, sid, oid = row["company"], row["reporter"], eid, rid
            else:
                subj, obj, sid, oid = row["reporter"], row["company"], rid, eid
            key = (subj, config.canonical_pred, obj)
            cur = triples.get(key)
            if cur is None:
                triples[key] = {
                    "score": float(row["score"]),
                    "n": 1,
                    "subj_id": sid,
                    "obj_id": oid,
                    "url": url,
                    "sids": set(row["sentence_ids"]),
                }
            else:
                cur["score"] = max(cur["score"], float(row["score"]))
                cur["n"] += 1
                cur["subj_id"] = _min_nonnull(cur["subj_id"], sid)
                cur["obj_id"] = _min_nonnull(cur["obj_id"], oid)
                cur["url"] = min(cur["url"], url)
                cur["sids"].update(row["sentence_ids"])

    rows = [
        {"subj": k[0], "pred": k[1], "obj": k[2],
         "score": round(v["score"], 4), "n_mentions": v["n"],
         "subj_id": v["subj_id"], "obj_id": v["obj_id"], "url": v["url"],
         "sentence_ids": sorted(v["sids"])[:SENTENCE_IDS_CAP]}
        for k, v in triples.items()
    ]
    return (
        pd.DataFrame(rows, columns=["subj", "pred", "obj", "score",
                                    "n_mentions", "subj_id", "obj_id",
                                    "url", "sentence_ids"])
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
