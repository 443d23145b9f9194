"""Stage M6: (subj, pred, obj) triple extraction — actor pool.

Analog of the triple-producing side of the reference: the XSLT rules
that turn a parsed page into RDF statements (``twine:plug-ins/xslt.c``
per-MIME stylesheets) plus Spindle's property extraction
(``spindle:generate/`` props handling).  One page row fans out into k
triple rows (flat_map shape inside ``map_batches``).

Emitted classes:
- page metadata: (url, dc:title, title), (url, dc:language, lang),
  (url, dcterms:modified, warc_ts ISO) — literal objects;
- mention links: (url, schema:mentions, entity_key) — URI objects;
- relational patterns over linked mentions: consecutive mention pairs
  whose inter-mention text is exactly " was seen with " ->
  rel:associatedWith, " is also known as " -> owl:sameAs (the
  coreference edges consumed by the union-find stage A1).

Scores come from the rulebase (ST1), loaded once per actor.
"""

from __future__ import annotations

import pyarrow as pa

from twine_ray.functions.textnorm import norm_alias
from twine_ray.stages.mentions import GazetteerMatcher
from twine_ray.state.rulebase import (
    DC_LANGUAGE,
    DC_MODIFIED,
    DC_TITLE,
    DEFAULT_RULEBASE,
    OWL_SAMEAS,
    REL_ASSOCIATED,
    SCHEMA_MENTIONS,
    XSD_DATETIME,
)

TRIPLES_SCHEMA = pa.schema(
    [
        ("graph", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_is_lit", pa.bool_()),
        ("obj_dt", pa.string()),
        ("obj_lang", pa.string()),
        ("score", pa.int32()),
    ]
)

# Inter-mention gap text (normalized) -> predicate
GAP_PATTERNS = {
    " was seen with ": REL_ASSOCIATED,
    " is also known as ": OWL_SAMEAS,
}


def _ts_iso(ts) -> str:
    # Arrow timestamp[us] -> datetime; deterministic ISO-8601 w/ 'T'
    return ts.isoformat()


class TripleExtractor:
    """Actor-pool batch transform: extracted pages -> triples_raw.

    The gazetteer is dereferenced from the broadcast ref once per actor
    (ST2); the rulebase is process-constant (ST1).
    """

    def __init__(self, alias_ref, rulebase=DEFAULT_RULEBASE,
                 force_ac: bool | None = None) -> None:
        from twine_ray.state.broadcast import resolve

        self.matcher = GazetteerMatcher(resolve(alias_ref), force_ac=force_ac)
        self.rulebase = rulebase

    def __call__(self, batch: pa.Table) -> pa.Table:
        rb = self.rulebase
        out = {k: [] for k in (
            "graph", "subj", "pred", "obj", "obj_is_lit", "obj_dt",
            "obj_lang", "score",
        )}

        def emit(graph, subj, pred, obj, is_lit, dt="", lang=""):
            out["graph"].append(graph)
            out["subj"].append(subj)
            out["pred"].append(pred)
            out["obj"].append(obj)
            out["obj_is_lit"].append(is_lit)
            out["obj_dt"].append(dt)
            out["obj_lang"].append(lang)
            out["score"].append(rb.score(pred))

        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        titles = batch["title"].to_pylist()
        langs = batch["lang"].to_pylist()
        tss = batch["warc_ts"].to_pylist()

        for url, text, title, lang, ts in zip(urls, texts, titles, langs, tss):
            # --- metadata triples (XSLT-rules analog) ---
            if title:
                emit(url, url, DC_TITLE, title, True, "", lang or "")
            if lang:
                emit(url, url, DC_LANGUAGE, lang, True)
            if ts is not None:
                emit(url, url, DC_MODIFIED, _ts_iso(ts), True, XSD_DATETIME)

            # --- mentions + relational patterns ---
            norm_text = norm_alias(text or "")
            spans = self.matcher.find(norm_text)
            linked: list[tuple[int, int, str]] = []
            for s, e in spans:
                cand = self.matcher.link.get(norm_text[s:e])
                if cand:
                    linked.append((s, e, cand[0]))
                    emit(url, url, SCHEMA_MENTIONS, cand[0], False)
            for (s1, e1, k1), (s2, e2, k2) in zip(linked, linked[1:]):
                pred = GAP_PATTERNS.get(norm_text[e1:s2])
                if pred and k1 != k2:
                    emit(url, k1, pred, k2, False)

        return pa.Table.from_pydict(out, schema=TRIPLES_SCHEMA)


def extract_triples(extracted_ds, alias_rows, concurrency=4,
                    batch_size: int = 128, force_ac: bool | None = None):
    """extracted Dataset -> triples_raw Dataset (actor pool, ST1/ST2)."""
    from twine_ray.state.broadcast import broadcast, pool

    alias_ref = broadcast(alias_rows)
    return extracted_ds.map_batches(
        TripleExtractor,
        fn_constructor_kwargs={"alias_ref": alias_ref, "force_ac": force_ac},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool(concurrency),
    )
