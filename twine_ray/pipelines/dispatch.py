"""Stage M4: MIME-type dispatch over a message table.

Twine's unit of ingest is a ``(content-type, payload)`` message routed
to the processor registered for that MIME type (registry in
``twine:libtwine/plugin.c``, dispatch in
``twine:libtwine/workflow.c``; exact match then ``type/*``).  Here the
message stream is a Dataset with columns
``(uri: string, content_type: string, payload: binary)`` and dispatch
is config-time: the builder partitions the stream per registered type
(vectorized masks — one pass) and appends each type's processor chain;
the outputs union into one triples Dataset.

Built-in processors:
- ``text/html`` (+ ``application/xhtml+xml``): pages chain — extract
  -> triple extraction (the twine:plug-ins/xslt.c path);
- ``application/n-quads`` / ``application/n-triples``: bulk RDF parse
  (the twine:plug-ins/rdf.c path; graph URI defaults to the message
  uri for the triples form);
- ``text/turtle`` / ``application/trig`` / ``text/n3``: Turtle-family
  parse (``twine_ray.sources.turtle``; graph from the TriG block, else
  the message uri).

Unroutable messages are counted and dropped (Twine logs-and-rejects
unknown types).
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

MESSAGES_SCHEMA = pa.schema(
    [
        ("uri", pa.string()),
        ("content_type", pa.string()),
        ("payload", pa.binary()),
    ]
)

# registry: exact MIME -> (messages Dataset, ctx) -> triples Dataset
PROCESSORS: dict[str, Callable] = {}


def register_processor(mime: str, fn: Callable) -> None:
    """``twine_plugin_add_processor`` analog (exact-type registry)."""
    PROCESSORS[mime] = fn


def _html_processor(messages_ds, ctx):
    """html payload -> pages shape -> extract -> triples_raw."""
    import datetime as dt

    from twine_ray.stages.extract import extract_text
    from twine_ray.stages.triples import extract_triples

    epoch = dt.datetime(2024, 1, 1)

    def _to_pages(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "url": batch["uri"],
                "warc_ts": pa.array([epoch] * n, type=pa.timestamp("us")),
                "html": batch["payload"],
                "text": pa.array([""] * n, type=pa.string()),
                "lang": pa.array([""] * n, type=pa.string()),
            }
        )

    pages = messages_ds.map_batches(_to_pages, batch_format="pyarrow")
    return extract_triples(
        extract_text(pages), ctx.get("alias_rows", []),
        concurrency=ctx.get("concurrency", 2),
    )


def _nquads_processor(messages_ds, ctx):
    """N-Quads/N-Triples payload -> parsed triples (graph from quad
    context, else the message uri)."""
    from twine_ray.sources.nquads import parse_nquads_text
    from twine_ray.stages.triples import TRIPLES_SCHEMA

    def _parse(batch: pa.Table) -> pa.Table:
        rows = []
        for uri, payload in zip(
            batch["uri"].to_pylist(), batch["payload"].to_pylist()
        ):
            text = (payload or b"").decode("utf-8", errors="replace")
            rows.extend(parse_nquads_text(text, default_graph=uri))
        return pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA)

    return messages_ds.map_batches(_parse, batch_format="pyarrow")


def _turtle_processor(messages_ds, ctx):
    """Turtle / TriG payload -> parsed triples (graph from TriG block,
    else the message uri).  Malformed documents are skipped per message
    (Twine logs-and-rejects a statement/model it cannot parse rather
    than failing the batch)."""
    from twine_ray.sources.turtle import TurtleParseError, parse_turtle
    from twine_ray.stages.triples import TRIPLES_SCHEMA

    def _parse(batch: pa.Table) -> pa.Table:
        rows = []
        for uri, payload in zip(
            batch["uri"].to_pylist(), batch["payload"].to_pylist()
        ):
            text = (payload or b"").decode("utf-8", errors="replace")
            try:
                rows.extend(parse_turtle(text, default_graph=uri))
            except TurtleParseError:
                continue
        return pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA)

    return messages_ds.map_batches(_parse, batch_format="pyarrow")


register_processor("text/html", _html_processor)
register_processor("application/xhtml+xml", _html_processor)
register_processor("application/n-quads", _nquads_processor)
register_processor("application/n-triples", _nquads_processor)
register_processor("text/turtle", _turtle_processor)
register_processor("application/trig", _turtle_processor)
# librdf also accepts text/n3 for (the common) Turtle-compatible N3
register_processor("text/n3", _turtle_processor)


def _rdfxml_processor(messages_ds, ctx):
    """RDF/XML payload -> parsed triples (graph = message uri);
    malformed documents skipped per message like the Turtle path."""
    from twine_ray.sources.rdfxml import RdfXmlParseError, parse_rdfxml
    from twine_ray.stages.triples import TRIPLES_SCHEMA

    def _parse(batch: pa.Table) -> pa.Table:
        rows = []
        for uri, payload in zip(
            batch["uri"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                rows.extend(parse_rdfxml(payload or b"", default_graph=uri))
            except RdfXmlParseError:
                continue
        return pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA)

    return messages_ds.map_batches(_parse, batch_format="pyarrow")


register_processor("application/rdf+xml", _rdfxml_processor)


def _jsonld_processor(messages_ds, ctx):
    """JSON-LD payload -> parsed triples (graph = message uri);
    malformed documents skipped per message like the Turtle path."""
    from twine_ray.sources.jsonld import JsonLdParseError, parse_jsonld
    from twine_ray.stages.triples import TRIPLES_SCHEMA

    def _parse(batch: pa.Table) -> pa.Table:
        rows = []
        for uri, payload in zip(
            batch["uri"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                rows.extend(parse_jsonld(payload or b"", default_graph=uri))
            except JsonLdParseError:
                continue
        return pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA)

    return messages_ds.map_batches(_parse, batch_format="pyarrow")


register_processor("application/ld+json", _jsonld_processor)


def _geonames_processor(messages_ds, ctx):
    """GeoNames-style bulk dump (``twine:plug-ins/geonames.c``): the
    payload alternates URL line / one-line RDF document; each record's
    graph URI is derived as ``<url>about.rdf`` (the reference's
    derivation).  Documents are RDF/XML (the GeoNames dump format),
    with an N-Triples fallback; malformed records log-and-skip."""
    from twine_ray.sources.nquads import parse_nquads_text
    from twine_ray.sources.rdfxml import RdfXmlParseError, parse_rdfxml
    from twine_ray.stages.triples import TRIPLES_SCHEMA

    def _parse(batch: pa.Table) -> pa.Table:
        rows = []
        for payload in batch["payload"].to_pylist():
            lines = (payload or b"").decode(
                "utf-8", errors="replace"
            ).split("\n")
            for i in range(0, len(lines) - 1, 2):
                url = lines[i].strip()
                doc = lines[i + 1]
                if not url:
                    continue
                graph = url + ("" if url.endswith("/") else "/") \
                    + "about.rdf"
                try:
                    rows.extend(parse_rdfxml(doc, default_graph=graph))
                except RdfXmlParseError:
                    rows.extend(parse_nquads_text(doc, graph))
        return pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA)

    return messages_ds.map_batches(_parse, batch_format="pyarrow")


register_processor("text/x-geonames-dump", _geonames_processor)


def dispatch_messages(messages_ds, ctx: dict | None = None):
    """Route a message Dataset through the per-MIME processors; returns
    (triples Dataset, route_counts dict)."""
    ctx = ctx or {}
    types = [
        r["content_type"]
        for r in messages_ds.groupby("content_type").count().take_all()
    ]
    routed = None
    counts: dict[str, int] = {}
    for mime in sorted(types):
        # exact match, then the reference's `type/*` wildcard fallback
        # (twine:libtwine/plugin.c::twine_plugin_locate order)
        fn = PROCESSORS.get(mime)
        if fn is None and "/" in mime:
            fn = PROCESSORS.get(mime.split("/", 1)[0] + "/*")
        if fn is None:
            counts[mime] = -1  # unroutable — dropped (logged by caller)
            continue

        def _only(t: pa.Table, mime=mime) -> pa.Table:
            return t.filter(pc.equal(t["content_type"], mime))

        sub = messages_ds.map_batches(_only, batch_format="pyarrow")
        out = fn(sub, ctx)
        routed = out if routed is None else routed.union(out)
        counts[mime] = 1
    if routed is None:
        import ray.data as rd

        from twine_ray.stages.triples import TRIPLES_SCHEMA

        routed = rd.from_arrow(
            pa.Table.from_pylist([], schema=TRIPLES_SCHEMA)
        )
    return routed, counts
