"""SC gate + rule RE scorer semantics, incl. the reverse-direction
consistency property (reference src/stages/evaluate.py:131-160:
predicting on tag-swapped input must yield the inverse label)."""

import pyarrow as pa

from finance_sc_relations_ray.functions.tagging import inverse_relations
from finance_sc_relations_ray.stages.scoring import (
    LABELS,
    ReScorerActor,
    RuleReScorer,
    ScGateActor,
    enumerate_pairs_batch,
    gate_filter,
)
from finance_sc_relations_ray.stages.ner import NerActor


def _label(scores):
    return LABELS[max(range(3), key=lambda i: scores[i])]


def test_rule_scorer_supplier_direction():
    m = RuleReScorer()
    t = "[E1] Apple Inc [/E1] supplied parts to [E2] Dell Technologies [/E2]."
    assert _label(m.score(t)) == "customer"  # e2 (Dell) is the customer
    t2 = "[E2] Apple Inc [/E2] supplied parts to [E1] Dell Technologies [/E1]."
    assert _label(m.score(t2)) == "supplier"


def test_rule_scorer_customer_listing():
    m = RuleReScorer()
    t = (
        "In addition, five customers, including [E2] Walmart Inc [/E2] and "
        "Target Corporation, accounted for approximately 95% of the net revenue "
        "attributable to [E1] Apple Inc [/E1] Segment."
    )
    assert _label(m.score(t)) == "customer"
    # both entities on the customer side → other
    t2 = (
        "In addition, five customers, including [E2] Walmart Inc [/E2] and "
        "[E1] Target Corporation [/E1], accounted for approximately 95% of the "
        "net revenue attributable to Apple Inc Segment."
    )
    assert _label(m.score(t2)) == "other"


def test_reverse_direction_consistency():
    """label(inverse(sent)) == inverse(label(sent)) for the stub — the
    property the reference's direction-consistency report checks."""
    m = RuleReScorer()
    t = "[E1] Apple Inc [/E1] supplied parts to [E2] Dell Technologies [/E2]."
    fwd = _label(m.score(t))
    rev = _label(m.score(inverse_relations(t)))
    inv = {"supplier": "customer", "customer": "supplier", "other": "other"}
    assert rev == inv[fwd]


def test_reverse_ensemble_stable():
    """With a direction-consistent model the R3 ensemble must not change
    the argmax."""
    plain = ReScorerActor(reverse=False)
    ens = ReScorerActor(reverse=True)
    batch = pa.table(
        {
            "tagged": [
                "[E1] Apple Inc [/E1] supplied parts to [E2] Dell Technologies [/E2].",
                "[E2] Apple Inc [/E2] supplied parts to [E1] Dell Technologies [/E1].",
            ]
        }
    )
    s1 = plain(batch)["scores"].to_pylist()
    s2 = ens(batch)["scores"].to_pylist()
    for a, b in zip(s1, s2):
        assert _label(a) == _label(b)


def test_sc_gate_and_filter():
    actor = ScGateActor()
    batch = pa.table(
        {
            "sent": [
                "Apple Inc supplied parts to Dell Technologies.",
                "Apple Inc acquired Dell Technologies in March 2019.",
            ],
            "num_orgs": pa.array([2, 2], type=pa.int32()),
        }
    )
    out = actor(batch)
    labels = out["supply_label"].to_pylist()
    assert labels == [1, 0]
    kept = gate_filter(out)
    assert kept.num_rows == 1


def test_pair_enumeration_r_ids():
    ner_out = NerActor()(
        pa.table(
            {
                "url": ["u"],
                "sent_id": [3],
                "sent": [
                    "Apple Inc, Dell Technologies and Jabil Inc supplied "
                    "components to Walmart Inc."
                ],
            }
        )
    )
    pairs = enumerate_pairs_batch(ner_out)
    rows = pairs.to_pylist()
    # C(4,2) = 6 pairs, one position variant each
    assert len({r["r_id"] for r in rows}) == 6
    assert all(r["r_id"].startswith("3_") for r in rows)
    assert all("[E1]" in r["tagged"] and "[E2]" in r["tagged"] for r in rows)


def test_prefix_index_chunked_build_identical():
    """An oversized synthetic bucket split across chunks must link
    identically to the unchunked index (J1 chunked build,
    reference matcher/core.py:111-186)."""
    import pyarrow as pa

    from finance_sc_relations_ray.functions.names import (
        normalize_name,
        prefix_key,
    )
    from finance_sc_relations_ray.stages.link import PrefixIndex

    names = [f"acme widgets number {i} corp" for i in range(40)] + [
        "acme widgets number 7 corp holdings"
    ]
    norm = [normalize_name(n) for n in names]
    db = pa.table(
        {
            "normalizedname": pa.array(norm),
            "companyprefix": pa.array([prefix_key(n, 2) for n in norm]),
            "rgid": pa.array([f"RG{i:04d}" for i in range(len(names))]),
        }
    )
    whole = PrefixIndex(db, 2, chunk_rows=500_000)
    chunked = PrefixIndex(db, 2, chunk_rows=8)  # forces 6 chunks
    assert len(chunked.buckets[prefix_key(norm[0], 2)]) >= 5
    for q in ["acme widgets number 7 corp", "acme widgets number 33 corp",
              "unrelated name"]:
        a = whole.lookup(q, 0.95, 0.80, 5)
        b = chunked.lookup(q, 0.95, 0.80, 5)
        assert a == b, q


def test_heuristic_ner_backend():
    """M2': the second NER backend recognizes UNSEEN org names behind
    the same span interface, and the pipeline runs with it end-to-end
    deterministically (backends share the contract, not the output)."""
    import dataclasses

    from finance_sc_relations_ray.config import DEFAULT_CONFIG
    from finance_sc_relations_ray.stages.ner import (
        HeuristicOrgTagger,
        make_tagger,
    )

    tagger = HeuristicOrgTagger()
    spans = tagger.spans(
        "Acme Widget Corp supplied Zenith Materials Ltd with parts."
    )
    texts = [s["text"] for s in spans]
    assert "Acme Widget Corp" in texts
    assert "Zenith Materials Ltd" in texts
    for s in spans:  # span offsets index the sentence correctly
        assert (
            "Acme Widget Corp supplied Zenith Materials Ltd with parts."[
                s["start"] : s["end"]
            ]
            == s["text"]
        )
    assert tagger.spans("no orgs here at all") == []
    cfg = dataclasses.replace(DEFAULT_CONFIG, ner_backend="heuristic")
    assert isinstance(make_tagger(cfg), HeuristicOrgTagger)


def test_pipeline_runs_with_heuristic_backend(tmp_path):
    import dataclasses

    import pyarrow.parquet as pq

    from finance_sc_relations_ray.config import DEFAULT_CONFIG
    from finance_sc_relations_ray.pipelines.kg import build_kg_pipeline
    from finance_sc_relations_ray.sources.pages import generate_pages

    path = str(tmp_path / "pages.parquet")
    pq.write_table(generate_pages(list(range(40))), path)
    cfg = dataclasses.replace(DEFAULT_CONFIG, ner_backend="heuristic")
    a = build_kg_pipeline(path, config=cfg).to_pandas().sort_values(
        ["subj", "pred", "obj"]).reset_index(drop=True)
    assert len(a) > 0  # unseen-name recognition still yields triples
    b = build_kg_pipeline(path, config=cfg).to_pandas().sort_values(
        ["subj", "pred", "obj"]).reset_index(drop=True)
    assert a.equals(b)  # deterministic across runs
