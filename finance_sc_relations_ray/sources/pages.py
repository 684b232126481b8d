"""Deterministic Common-Crawl-style ``pages`` synthesis (FIXTURES.md §1-2).

The driver's testdata has no ``pages`` table, so the engine synthesizes
one — deterministically (seed 42, keyed per doc_id) — in the exact
input_hint shape ``(url:string, warc_ts:timestamp[us], html:binary,
text:string, lang:string)``. Page text is built from sentence templates
modeled on the reference's own test fixtures
(test/test_language_model.py:18-26, test/test_re_dataset_creation.py:21-28)
so the stub NER / SC / RE models and the pure-pandas oracle agree
exactly on the expected triples.
"""

from __future__ import annotations

import datetime as dt
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..gazetteer import GAZETTEER, HUBS

_PAIRS_WITH_ABBR = [(f, a) for f, a in GAZETTEER if a]
_DEFAULT_FULL_NAMES = [f for f, _ in GAZETTEER]

BOILER_HEAD = (
    "<html><head><title>Filings and supply chain news</title></head><body>"
    "<nav>Home | News | About | Contact</nav>"
)
BOILER_TAIL = "<footer>(c) 2024 Example Media. All rights reserved.</footer></body></html>"


def _pick(rng: random.Random, pool: list[str], exclude: set[str], k: int) -> list[str]:
    cand = [n for n in pool if n not in exclude]
    return rng.sample(cand, k)


def _make_sentences(
    rng: random.Random, reporter: str, pool: list[str] | None = None
) -> list[str]:
    """2-6 template sentences for one page; the reporter appears in most
    of them so reporter derivation is unambiguous. ``pool`` extends the
    full-name universe (bench entity-space scaling)."""
    _FULL_NAMES = pool if pool is not None else globals()["_DEFAULT_FULL_NAMES"]
    n_sent = rng.randint(2, 6)
    sents: list[str] = []
    for _ in range(n_sent):
        kind = rng.choices(
            ["supplier_list", "customer_rev", "quote_alias", "or_alias",
             "other", "single", "special", "possessive"],
            weights=[20, 25, 10, 10, 15, 10, 8, 8],
        )[0]
        used = {reporter}
        if kind == "supplier_list":
            d_full, d_abbr = rng.choice(
                [(f, a) for f, a in _PAIRS_WITH_ABBR if f != reporter]
            )
            used.add(d_full)
            s1, s2 = _pick(rng, _FULL_NAMES, used | {d_full}, 2)
            sents.append(
                f'{s1}, {s2} and {d_full} ("{d_abbr}") supplied components to {reporter}.'
            )
        elif kind == "customer_rev":
            c1, c2 = _pick(rng, _FULL_NAMES, used, 2)
            sents.append(
                f"In addition, five customers, including {c1} and {c2}, accounted "
                f"for approximately 95% of the net revenue attributable to "
                f"{reporter} - Segment."
            )
        elif kind == "quote_alias":
            e_full, e_abbr = rng.choice(
                [(f, a) for f, a in _PAIRS_WITH_ABBR if f != reporter]
            )
            sents.append(f'{e_full} "{e_abbr}" is a supplier of {reporter}.')
        elif kind == "or_alias":
            f_full, f_abbr = rng.choice(
                [(f, a) for f, a in _PAIRS_WITH_ABBR if f != reporter]
            )
            sents.append(f'{f_full}, or "{f_abbr}", supplies raw materials to {reporter}.')
        elif kind == "other":
            a, b = _pick(rng, _FULL_NAMES, set(), 2)
            sents.append(f"{a} acquired {b} in March 2019.")
        elif kind == "single":
            sents.append(f"{reporter} announced quarterly results today.")
        elif kind == "special":  # locks the byte-identical clean invariant
            b, c = _pick(rng, _FULL_NAMES, used, 2)
            sents.append(
                f"{reporter} - and [its] partner  {b} supplied critical parts to {c}."
            )
        else:  # possessive — stresses the ’s tagging path (preprocess.py:163-169)
            b = _pick(rng, _FULL_NAMES, used, 1)[0]
            sents.append(f"{b}’s customers rely on parts supplied to {reporter}.")
    # hub skew: ~30% of pages mention a hub supplier (SURVEY.md §7.4)
    if rng.random() < 0.3:
        hub = rng.choice([h for h in HUBS if h != reporter])
        sents.append(f"{hub} supplied display modules to {reporter}.")
    return sents


def generate_pages(
    doc_ids: list[int], seed: int = 42, extra_entities: int = 0
) -> pa.Table:
    """Deterministic pages table for the given doc ids.
    ``extra_entities`` grows the org-name universe with synthetic
    gazetteer names (must match the pipeline's
    ``config.extra_entities`` for the stub NER to recognize them)."""
    from ..gazetteer import synthetic_entity_names

    pool = _DEFAULT_FULL_NAMES + synthetic_entity_names(extra_entities)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    base = dt.datetime(2024, 1, 1)
    for doc_id in doc_ids:
        rng = random.Random(f"pages-{seed}-{doc_id}")
        reporter = rng.choice(pool)
        sents = _make_sentences(rng, reporter, pool)
        text = " ".join(sents)
        html = (
            BOILER_HEAD
            + "".join(f"<p>{s}</p>" for s in sents)
            + BOILER_TAIL
        ).encode("utf-8")
        lang = "en" if rng.random() >= 0.05 else rng.choice(["de", "fr"])
        urls.append(f"https://example{doc_id % 127}.com/page/{doc_id}")
        tss.append(base + dt.timedelta(seconds=int(doc_id)))
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def doc_ids_from_documents(documents_parquet: str) -> list[int]:
    """doc ids for page synthesis, read from the driver's documents
    table so every scale factor maps to a deterministic pages set."""
    t = pq.read_table(documents_parquet, columns=["doc_id"])
    return sorted(t["doc_id"].to_pylist())


def pages_parquet_for(
    sf_dir: str,
    out_dir: str | None = None,
    seed: int = 42,
    n_pages: int | None = None,
    extra_entities: int = 0,
) -> str:
    """Materialize (once, cached) the pages parquet for a testdata sf
    dir; returns the parquet path. Cache lives under /tmp keyed by the
    sf dir name + row count, so repeated runs and the two bench
    parallelism levels read identical bytes."""
    import os

    if n_pages is not None:
        ids = list(range(n_pages))
    else:
        ids = doc_ids_from_documents(os.path.join(sf_dir, "documents.parquet"))
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    ent_tag = f"-e{extra_entities}" if extra_entities else ""
    out_dir = out_dir or f"/tmp/fscr_pages/{tag}-{len(ids)}-s{seed}{ent_tag}"
    path = os.path.join(out_dir, "pages")
    if os.path.isdir(path) and os.listdir(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    # a DIRECTORY of files with small row groups: pages are tiny in
    # bytes but CPU-heavy downstream, so both the file read and the
    # block layout must be splittable or the pipeline serializes on a
    # single read task
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    n_files = max(1, min(64, len(ids) // 2048))
    per = (len(ids) + n_files - 1) // n_files
    chunks = [
        (f, ids[f * per : (f + 1) * per])
        for f in range(n_files)
        if ids[f * per : (f + 1) * per]
    ]

    def _write_chunk(f: int, chunk: list[int]) -> None:
        pq.write_table(
            generate_pages(chunk, seed=seed, extra_entities=extra_entities),
            os.path.join(tmp, f"part-{f:04d}.parquet"),
            row_group_size=1024,
        )

    # synthesis is deterministic per doc_id, so it parallelizes freely:
    # use Ray tasks when a session is live (large bench inputs),
    # else generate serially
    try:
        import ray

        use_ray = ray.is_initialized() and len(ids) >= 50_000
    except Exception:
        use_ray = False
    if use_ray:
        import ray

        @ray.remote
        def _gen(f, chunk):
            _write_chunk(f, chunk)

        ray.get([_gen.remote(f, c) for f, c in chunks])
    else:
        for f, c in chunks:
            _write_chunk(f, c)
    os.replace(tmp, path)
    return path
