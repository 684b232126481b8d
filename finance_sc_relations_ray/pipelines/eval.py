"""Evaluation harness: triple-level P/R, classification report,
confusion matrix, top-losses and threshold sweep (A8/S3).

The north-star quality gate is triple P/R ≥ 0.95 against the
reference-semantics oracle (BASELINE.json). A triple matches on exact
``(subj, pred, obj)``; score differences don't affect P/R.

Report artifacts mirror the reference's evaluation surface
(src/relation_extraction/misc.py:109-158, train_funcs.py:101-223):
per-class classification report (sklearn-shaped dict, no sklearn
dependency), row-normalized confusion matrix, misclassified rows
sorted by confidence (top losses), and per-threshold reports — written
as json/markdown/csv/parquet files (no plotting libs in this
environment; the confusion heatmap png becomes a csv matrix).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd


def direction_consistency(scorer, tagged_sentences: list[str]) -> dict:
    """Direction-consistency report (reference
    src/stages/evaluate.py:131-160): predict on tag-swapped inputs and
    compare — a consistent model yields the inverse label. ``scorer``
    maps a tagged sentence to a 3-score list (supplier, customer,
    other)."""
    from ..config import INVERSE_RELATION
    from ..functions.tagging import inverse_relations

    labels = ("supplier", "customer", "other")
    consistent = 0
    for sent in tagged_sentences:
        fwd = labels[max(range(3), key=lambda i: scorer(sent)[i])]
        rev = labels[
            max(range(3), key=lambda i: scorer(inverse_relations(sent))[i])
        ]
        if rev == INVERSE_RELATION[fwd]:
            consistent += 1
    n = len(tagged_sentences)
    return {
        "n": n,
        "consistent": consistent,
        "consistency_rate": round(consistent / n, 4) if n else 1.0,
    }


def threshold_sweep(
    got: pd.DataFrame,
    expected: pd.DataFrame,
    thresholds: tuple[float, ...] = (0.90, 0.95, 0.99),
) -> pd.DataFrame:
    """Per-threshold triple P/R (the reference's evaluation sweep at
    score > 0.90/0.95/0.99, src/relation_extraction/misc.py:116-134):
    keep predicted triples with score > t, compare to the full expected
    set."""
    rows = []
    for t in thresholds:
        kept = got[got["score"] > t]
        pr = triple_pr(kept, expected)
        rows.append({"threshold": t, **pr})
    return pd.DataFrame(rows)


def classification_report(
    y_true: list[str], y_pred: list[str], labels: tuple[str, ...]
) -> dict:
    """Per-class precision/recall/f1/support + accuracy + macro and
    weighted averages — the sklearn ``output_dict=True`` shape the
    reference consumes (misc.py:117-121), reimplemented directly."""
    n = len(y_true)
    out: dict[str, dict | float] = {}
    per_class = []
    for lab in labels:
        tp = sum(1 for t, p in zip(y_true, y_pred) if t == lab and p == lab)
        n_pred = sum(1 for p in y_pred if p == lab)
        n_true = sum(1 for t in y_true if t == lab)
        prec = tp / n_pred if n_pred else 0.0
        rec = tp / n_true if n_true else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        row = {
            "precision": round(prec, 4),
            "recall": round(rec, 4),
            "f1-score": round(f1, 4),
            "support": n_true,
        }
        out[lab] = row
        per_class.append(row)
    accuracy = (
        sum(1 for t, p in zip(y_true, y_pred) if t == p) / n if n else 0.0
    )
    out["accuracy"] = round(accuracy, 4)
    k = len(labels)
    out["macro avg"] = {
        "precision": round(sum(r["precision"] for r in per_class) / k, 4),
        "recall": round(sum(r["recall"] for r in per_class) / k, 4),
        "f1-score": round(sum(r["f1-score"] for r in per_class) / k, 4),
        "support": n,
    }
    out["weighted avg"] = {
        m: round(
            sum(r[m] * r["support"] for r in per_class) / n if n else 0.0, 4
        )
        for m in ("precision", "recall", "f1-score")
    } | {"support": n}
    return out


def confusion_matrix(
    y_true: list[str],
    y_pred: list[str],
    labels: tuple[str, ...],
    normalize: str | None = "true",
) -> np.ndarray:
    """labels×labels counts (rows = true); ``normalize='true'``
    row-normalizes like the reference heatmap (misc.py:138)."""
    idx = {lab: i for i, lab in enumerate(labels)}
    m = np.zeros((len(labels), len(labels)), dtype=np.float64)
    for t, p in zip(y_true, y_pred):
        m[idx[t], idx[p]] += 1
    if normalize == "true":
        sums = m.sum(axis=1, keepdims=True)
        m = np.divide(m, sums, out=np.zeros_like(m), where=sums > 0)
    return m


def top_losses(pred_df: pd.DataFrame, k: int | None = None) -> pd.DataFrame:
    """Misclassified rows, most-confident mistakes first (the
    reference's ``miss_classified`` listing, misc.py:109-114)."""
    errs = pred_df[pred_df["expected_relation"] != pred_df["prediction"]]
    errs = errs.sort_values("score", ascending=False)
    return (errs.head(k) if k else errs).reset_index(drop=True)


def confusion_from_dataset(ds, labels: tuple[str, ...]) -> np.ndarray:
    """Confusion counts computed DISTRIBUTED: one
    groupby(expected, predicted).count() — only labels²-many rows reach
    the driver, so the eval set can be arbitrarily large."""
    counts = ds.groupby(["expected_relation", "prediction"]).count().to_pandas()
    idx = {lab: i for i, lab in enumerate(labels)}
    m = np.zeros((len(labels), len(labels)), dtype=np.float64)
    for _, r in counts.iterrows():
        m[idx[r["expected_relation"]], idx[r["prediction"]]] += r["count()"]
    return m


def write_report_artifacts(
    pred_df: pd.DataFrame,
    report_dir: str,
    labels: tuple[str, ...] = ("supplier", "customer", "other"),
    thresholds: tuple[float, ...] = (0.90, 0.95, 0.99),
    tag_name: str = "eval",
) -> dict:
    """Write the reference's report artifact set (misc.py:144-158):
    ``<tag>_classification_report.md``, ``<tag>_metrics.json``
    (weighted-avg metrics + accuracy), ``<tag>_confusion.csv``
    (row-normalized), ``<tag>_errors.parquet`` (top losses; the
    reference writes xlsx — no openpyxl here), and
    ``<tag>_thresholds.json`` (per-threshold classification reports
    with drop fractions). Returns the metrics dict."""
    os.makedirs(report_dir, exist_ok=True)
    y_true = pred_df["expected_relation"].tolist()
    y_pred = pred_df["prediction"].tolist()
    cr = classification_report(y_true, y_pred, labels)

    cr_df = pd.DataFrame(
        {lab: cr[lab] for lab in labels} | {"weighted avg": cr["weighted avg"]}
    ).T
    cols = list(cr_df.columns)
    lines = ["| " + " | ".join([""] + cols) + " |",
             "|" + "---|" * (len(cols) + 1)]
    for name, row in cr_df.iterrows():
        lines.append(
            "| " + " | ".join([str(name)] + [str(row[c]) for c in cols]) + " |"
        )
    with open(
        os.path.join(report_dir, f"{tag_name}_classification_report.md"), "w"
    ) as f:
        f.write("\n".join(lines) + "\n")

    metrics = {
        f"{tag_name}_{k}": round(float(v), 3)
        for k, v in cr["weighted avg"].items()
    }
    metrics[f"{tag_name}_accuracy"] = round(float(cr["accuracy"]), 3)
    with open(os.path.join(report_dir, f"{tag_name}_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)

    cm = confusion_matrix(y_true, y_pred, labels, normalize="true")
    pd.DataFrame(cm, index=list(labels), columns=list(labels)).to_csv(
        os.path.join(report_dir, f"{tag_name}_confusion.csv")
    )

    top_losses(pred_df).to_parquet(
        os.path.join(report_dir, f"{tag_name}_errors.parquet")
    )

    sweep = {}
    for t in thresholds:
        kept = pred_df[pred_df["score"] > t]
        sweep[str(t)] = {
            "dropped": int(len(pred_df) - len(kept)),
            "dropped_frac": round(
                1 - len(kept) / len(pred_df) if len(pred_df) else 0.0, 4
            ),
            "report": classification_report(
                kept["expected_relation"].tolist(),
                kept["prediction"].tolist(),
                labels,
            ),
        }
    with open(os.path.join(report_dir, f"{tag_name}_thresholds.json"), "w") as f:
        json.dump(sweep, f, indent=1)
    return metrics


def triple_pr(got: pd.DataFrame, expected: pd.DataFrame) -> dict:
    g = set(zip(got["subj"], got["pred"], got["obj"]))
    e = set(zip(expected["subj"], expected["pred"], expected["obj"]))
    tp = len(g & e)
    precision = tp / len(g) if g else 1.0
    recall = tp / len(e) if e else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "n_got": len(g),
        "n_expected": len(e),
        "tp": tp,
        "precision": round(precision, 4),
        "recall": round(recall, 4),
        "f1": round(f1, 4),
    }
