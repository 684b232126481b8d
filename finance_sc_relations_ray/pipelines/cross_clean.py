"""Cross-validation vote cleaning (A5) — the reference's
data-cleansing loop (src/data_cleansing/cross_cleaner.py:400-494)
re-expressed Ray-Data-first.

Mechanism: k fold-models (each trained with its fold held out) predict
a (label, score) for every candidate row; then

- **agreement vote** (cross_cleaner.py:469-483): rows where ALL folds
  agree get that label, else -1 — the agreement RATE is the corpus
  quality metric;
- **score-weighted vote** (cross_cleaner.py:486-494): per label,
  sum the score of each fold that voted for it / k; ``higher_confident``
  is the argmax and ``max_conf`` its value;
- rows sorted by ``max_conf`` ASCENDING are the cleaning queue (least
  confident first — the rows a human or LLM re-annotates).

Ray shape: one ``map_batches`` pass per fold model (an actor pool —
each fold's model loads once per actor), columns accumulate on the
stream, and the vote aggregation is a final stateless ``map_batches``.
Nothing is collected to the driver; the cleaning queue is a Dataset
the caller sorts/limits.

In this environment the "fold models" are any callables
``tagged_sentence → (label, score)`` — the rule-scorer stub or
per-fold perturbations in tests; the real swap point is the actor's
``__init__`` loading ``fold<i>/re_model``.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

import ray.data

LABELS = ("supplier", "customer", "other")


class FoldPredictActor:
    """Adds ``<fold>`` (label) and ``<fold>_score`` columns for one
    fold model. ``scorer_factory`` builds the model once per actor."""

    def __init__(self, fold_name: str, scorer_factory: Callable):
        self.fold = fold_name
        self.scorer = scorer_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        labels, scores = [], []
        for tagged in batch["sents"].to_pylist():
            label, score = self.scorer(tagged)
            labels.append(label)
            scores.append(float(score))
        return batch.append_column(
            self.fold, pa.array(labels, pa.string())
        ).append_column(f"{self.fold}_score", pa.array(scores, pa.float32()))


def vote_batch(batch: pa.Table, fold_names: list[str]) -> pa.Table:
    """Agreement + score-weighted votes over the fold columns."""
    n_rows = batch.num_rows
    fold_labels = [batch[f].to_pylist() for f in fold_names]
    fold_scores = [batch[f"{f}_score"].to_pylist() for f in fold_names]
    agreed, higher, max_conf = [], [], []
    vote_cols: dict[str, list[float]] = {lab: [] for lab in LABELS}
    k = len(fold_names)
    for i in range(n_rows):
        votes = [fl[i] for fl in fold_labels]
        agreed.append(votes[0] if all(v == votes[0] for v in votes) else "-1")
        props = {lab: 0.0 for lab in LABELS}
        for f in range(k):
            props[fold_labels[f][i]] += fold_scores[f][i]
        props = {lab: v / k for lab, v in props.items()}
        for lab in LABELS:
            vote_cols[lab].append(round(props[lab], 6))
        best = max(LABELS, key=lambda lab: props[lab])
        higher.append(best)
        max_conf.append(round(props[best], 6))
    out = batch.append_column("agreed_label", pa.array(agreed, pa.string()))
    for lab in LABELS:
        out = out.append_column(
            f"vote_{lab}", pa.array(vote_cols[lab], pa.float64())
        )
    return out.append_column(
        "higher_confident", pa.array(higher, pa.string())
    ).append_column("max_conf", pa.array(max_conf, pa.float64()))


def cross_validation_votes(
    examples: "ray.data.Dataset",
    fold_scorers: dict[str, Callable],
) -> "ray.data.Dataset":
    """examples (with a ``sents`` tagged-text column) × k fold models →
    vote-annotated Dataset. Consumers take
    ``.sort("max_conf")`` for the cleaning queue and
    ``mean(agreed_label != '-1')`` for the agreement rate."""
    ds = examples
    for name, factory in fold_scorers.items():
        ds = ds.map_batches(
            FoldPredictActor,
            fn_constructor_kwargs={"fold_name": name, "scorer_factory": factory},
            batch_format="pyarrow",
            concurrency=(1, 2),
            num_cpus=0.5,
        )
    names = list(fold_scorers)
    return ds.map_batches(
        lambda b: vote_batch(b, names), batch_format="pyarrow"
    )


def agreement_rate(voted: "ray.data.Dataset") -> float:
    """Fraction of rows where every fold agrees (the reference's
    printed 'Percentage of agreement') — computed as a tiny
    aggregate."""
    import pyarrow.compute as pc

    counts = voted.map_batches(
        lambda b: pa.table(
            {
                "agree": [
                    int(pc.sum(
                        pc.cast(pc.not_equal(b["agreed_label"], "-1"), pa.int64())
                    ).as_py() or 0)
                ],
                "n": [b.num_rows],
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    total = counts["n"].sum()
    return float(counts["agree"].sum() / total) if total else 1.0
