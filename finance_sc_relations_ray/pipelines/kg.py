"""The flagship KG-construction pipeline (SURVEY.md §7.1 DAG).

One streaming ``ray.data.Dataset`` lineage:

    read_parquet(pages; url,html,lang pruned at the read)
      → filter(lang == "en")                       [vectorized Arrow]
      → map_batches(extract html→text)             [stateless]
      → map_batches(sentencize + clean fan-out)    [stateless]
      → map_batches(NerActor, actor pool)          [stateful]
      → map_batches(ScGateActor, actor pool)       [stateful]
      → map_batches(gate filter)                   [vectorized Arrow]
      → map_batches(pair enumeration + tagging)    [stateless, high fanout]
      → map_batches(ReScorerActor, actor pool)     [stateful]
      → repartition (explicit, pre-shuffle)
      → groupby(url).map_groups(aggregate_doc)     [SHUFFLE #1]
      → map_batches(LinkActor, broadcast DB)       [stateful, NO shuffle]
      → map_batches(to_triples)                    [stateless]
      → salted dedup on (subj,pred,obj)            [SHUFFLE #2, combiner-first]

Ray is never initialised here (driver / bench / tests own the session).
"""

from __future__ import annotations

import functools

import pyarrow as pa
import ray
import ray.data

from ..config import DEFAULT_CONFIG, KGConfig
from ..gazetteer import company_db_table
from ..stages import extract, ner, scoring
from ..stages.doc_agg import DOC_RELATIONS_SCHEMA, aggregate_doc
from ..stages.link import LinkActor
from ..stages.shuffle import salted_dedup
from ..stages.triples import to_triples_batch


def read_pages(path: str) -> "ray.data.Dataset":
    """Column-pruned read: the pipeline needs only url, html, lang
    (never the duplicate ``text`` column or warc_ts)."""
    return ray.data.read_parquet(path, columns=["url", "html", "lang"])


def sentences_dataset(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    return (
        pages.map_batches(extract.filter_english, batch_format="pyarrow")
        .map_batches(extract.extract_batch, batch_format="pyarrow")
        .map_batches(extract.sentencize_batch, batch_format="pyarrow")
    )


def scored_pairs_dataset(
    sentences: "ray.data.Dataset", config: KGConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    return (
        sentences.map_batches(
            ner.NerActor,
            fn_constructor_kwargs={"config": config},
            batch_format="pyarrow",
            batch_size=config.ner_batch_size,
            concurrency=config.ner_concurrency,
            num_cpus=config.actor_num_cpus,
        )
        .map_batches(
            scoring.ScGateActor,
            fn_constructor_kwargs={"config": config},
            batch_format="pyarrow",
            batch_size=config.ner_batch_size,
            concurrency=config.sc_concurrency,
            num_cpus=config.actor_num_cpus,
        )
        .map_batches(scoring.gate_filter, batch_format="pyarrow")
        .map_batches(
            functools.partial(
                scoring.enumerate_pairs_batch, num_positions=config.num_positions
            ),
            batch_format="pyarrow",
        )
        .map_batches(
            scoring.ReScorerActor,
            fn_constructor_kwargs={"config": config},
            batch_format="pyarrow",
            batch_size=config.re_batch_size,
            concurrency=config.re_concurrency,
            num_cpus=config.actor_num_cpus,
        )
    )


def doc_relations_dataset(
    scored_pairs: "ray.data.Dataset",
    config: KGConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """SHUFFLE #1 — explicit repartition, then groupby(url).map_groups.
    Pages are bounded (≤ a few hundred pairs), so per-group work is
    O(small); skew risk is low by key construction (SURVEY.md §7.4)."""
    ds = scored_pairs
    if num_partitions:
        ds = ds.repartition(num_partitions)
    return ds.groupby("url").map_groups(
        functools.partial(aggregate_doc, config=config),
        batch_format="pandas",
    )


def linked_dataset(
    doc_relations: "ray.data.Dataset",
    company_db: pa.Table | None = None,
    config: KGConfig = DEFAULT_CONFIG,
) -> "ray.data.Dataset":
    """Broadcast-join entity linking: DB shipped once via ray.put, read
    in each actor's __init__ — never re-shipped per batch."""
    db_ref = ray.put(company_db if company_db is not None else company_db_table())
    return doc_relations.map_batches(
        LinkActor,
        fn_constructor_kwargs={"db_ref": db_ref, "config": config},
        batch_format="pyarrow",
        batch_size=config.link_batch_size,
        concurrency=config.link_concurrency,
            num_cpus=config.actor_num_cpus,
    )


def triples_dataset(
    linked: "ray.data.Dataset", config: KGConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    triples = linked.map_batches(
        functools.partial(to_triples_batch, config=config), batch_format="pyarrow"
    )
    return salted_dedup(triples, ["subj", "pred", "obj"])


def build_kg_pipeline(
    pages_path: str,
    config: KGConfig = DEFAULT_CONFIG,
    company_db: pa.Table | None = None,
    dedup: bool = True,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """pages parquet → deduplicated canonical triples Dataset (lazy)."""
    pages = read_pages(pages_path)
    sentences = sentences_dataset(pages)
    scored = scored_pairs_dataset(sentences, config)
    docs = doc_relations_dataset(scored, config, num_partitions)
    linked = linked_dataset(docs, company_db, config)
    if not dedup:
        return linked.map_batches(
            functools.partial(to_triples_batch, config=config),
            batch_format="pyarrow",
        )
    return triples_dataset(linked, config)
