"""One-shot CLI — the ``twine -c twine.conf -t <mime> <file>`` analog
(SURVEY.md §3.2, ``twine:cli/``): run the full workflow on local input
without the "queue" (Parquet shard list).

Usage:
    python -m twine_ray.cli pages <pages.parquet|dir> --out /tmp/kg_out
    python -m twine_ray.cli message -t text/html <file.html> --uri http://x
    python -m twine_ray.cli message -t application/n-quads <dump.nq>
    python -m twine_ray.cli workflow <pages.parquet> --stages extract,dedup-pages

Owns its Ray session (the driver-contract functions in __ray_entry__
never init Ray; CLI entry points do, guarded).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_pages(args) -> int:
    import ray.data as rd

    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline

    _ray_session()
    pages = rd.read_parquet(args.input)
    res = run_kg_pipeline(
        pages, args.out, default_alias_rows(),
        num_buckets=args.buckets, resume=not args.no_resume,
        write_index=args.index,
    )
    print(json.dumps(res["metrics"]))
    return 0


def cmd_message(args) -> int:
    """Single (content-type, payload) message through MIME dispatch —
    the exact `twine -t` shape."""
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.pipelines.dispatch import (
        MESSAGES_SCHEMA,
        dispatch_messages,
    )
    from twine_ray.pipelines.kg import default_alias_rows

    _ray_session()
    # config-driven XML types (the `[xslt:<mime>]` config analog):
    # --xml-rules <mime>=<rules.toml>, repeatable
    for spec in args.xml_rules or []:
        mime, _, path = spec.partition("=")
        if not path:
            print(f"error: --xml-rules needs <mime>=<toml-file>: {spec!r}",
                  file=sys.stderr)
            return 2
        from twine_ray.pipelines.xmlrules import register_xml_type

        register_xml_type(mime, open(path).read())
    payload = open(args.input, "rb").read()
    uri = args.uri or f"file://{args.input}"
    msgs = rd.from_arrow(
        pa.Table.from_pylist(
            [{"uri": uri, "content_type": args.type, "payload": payload}],
            schema=MESSAGES_SCHEMA,
        )
    )
    triples, counts = dispatch_messages(
        msgs, {"alias_rows": default_alias_rows()}
    )
    df = triples.to_pandas()
    if args.out:
        df.to_parquet(args.out)
    else:
        from twine_ray.sources.nquads import triple_row_to_nquad

        for row in df.to_dict("records"):
            print(triple_row_to_nquad(row))
    unroutable = [m for m, c in counts.items() if c < 0]
    if unroutable:
        print(f"warning: no processor for {unroutable}", file=sys.stderr)
        return 2
    return 0


def cmd_update(args) -> int:
    """Targeted reprocessing — the ``twine -u <plugin> <id>`` analog:
    given changed url(s) (or explicit bucket ids), invalidate their
    graph buckets and rerun incrementally, replacing only store buckets
    whose content actually changed."""
    import ray.data as rd

    from twine_ray.pipelines.kg import default_alias_rows, run_kg_incremental

    _ray_session()
    pages = rd.read_parquet(args.input)
    changed = list(args.url or [])
    if args.bucket:
        # explicit bucket ids (bucket->url is not invertible): drop
        # their raw markers directly; the incremental run then
        # recomputes them alongside any url-derived invalidations
        import os

        from twine_ray.stages.materialize import BUCKET_COL
        from twine_ray.state import checkpoint as ckpt

        ckpt.invalidate_buckets(
            os.path.join(args.out, "raw"), args.bucket, BUCKET_COL
        )
    res = run_kg_incremental(
        pages, args.out, default_alias_rows(),
        changed_urls=changed, num_buckets=args.buckets,
    )
    print(json.dumps(
        {**res["metrics"], "changed_buckets": res["changed_buckets"]}
    ))
    return 0


def cmd_export(args) -> int:
    """Dump a triple store to an RDF serialization — the bulk-export
    side of the reference (``twine_rdf_model_nquads`` / librdf
    serializers).  N-Quads streams distributed (task-written shards +
    manifest); Turtle/TriG/RDF-XML write one document (driver-side —
    these formats need whole-document prefix/subject grouping, so they
    are for entity-scale exports; use nquads for corpus-scale)."""
    from twine_ray.stages.materialize import read_triple_store

    _ray_session()
    ds = read_triple_store(args.store).drop_columns(["graph_bucket"])
    fmt = args.format
    if fmt == "nquads":
        from twine_ray.sources.nquads import write_nquads

        res = write_nquads(ds, args.out)
        print(json.dumps(res))
        return 0
    rows = ds.to_pandas().to_dict("records")
    if fmt in ("turtle", "trig"):
        from twine_ray.sources.turtle import triples_to_turtle

        text = triples_to_turtle(rows, trig=(fmt == "trig"))
    elif fmt == "rdfxml":
        from twine_ray.sources.rdfxml import triples_to_rdfxml

        text = triples_to_rdfxml(rows)
    elif fmt == "jsonld":
        from twine_ray.sources.jsonld import triples_to_jsonld

        text = triples_to_jsonld(rows)
    else:
        print(f"error: unknown format {fmt!r}", file=sys.stderr)
        return 2
    with open(args.out, "w") as f:
        f.write(text)
    print(json.dumps({"rows": len(rows), "file": args.out}))
    return 0


def cmd_get(args) -> int:
    """Fetch one named graph (or a triple pattern) from the store —
    the ``twine_sparql_get`` analog; reads only the graph's bucket
    partition.  Prints N-Quads."""
    from twine_ray.sources.nquads import triple_row_to_nquad
    from twine_ray.stages.query import match_triples

    _ray_session()
    ds = match_triples(
        args.store, graph=args.graph, subj=args.subj,
        pred=args.pred, obj=args.obj,
    )
    for row in ds.to_pandas().to_dict("records"):
        print(triple_row_to_nquad(row))
    return 0


def cmd_bgp(args) -> int:
    """Basic-graph-pattern query over the store (the Spindle lookup
    shape): each --pattern is 'graph subj pred obj' with ?variables
    and _ for don't-care; prints TSV bindings with a header row."""
    from twine_ray.stages.query import bgp_match

    _ray_session()

    def _parse(raw):
        out = []
        for p in raw:
            terms = [None if t == "_" else t for t in p.split()]
            if len(terms) not in (3, 4):
                raise ValueError(p)
            out.append(tuple(terms))
        return out

    try:
        pats = _parse(args.pattern)
        opts = _parse(args.optional or [])
    except ValueError as e:
        print(f"bad pattern (need 3 or 4 terms): {e.args[0]!r}",
              file=sys.stderr)
        return 2
    flts = []
    for f in args.filter or []:
        terms = f.split(None, 2)
        if len(terms) not in (2, 3):
            print(f"bad filter (need 'var op [value]'): {f!r}",
                  file=sys.stderr)
            return 2
        flts.append(tuple(terms))
    order_by = []
    for o in getattr(args, "order_by", None) or []:
        terms = o.split()
        order_by.append(
            (terms[0], terms[1]) if len(terms) == 2 else terms[0]
        )
    df = bgp_match(
        args.store, pats, optional=opts, filters=flts,
        distinct=getattr(args, "distinct", False),
        order_by=order_by or None,
        limit=getattr(args, "limit", None),
        offset=getattr(args, "offset", 0) or 0,
    ).to_pandas()
    print("\t".join(df.columns))
    for row in df.itertuples(index=False):
        print("\t".join(str(v) for v in row))
    return 0


def cmd_ask(args) -> int:
    """SPARQL ASK analog: prints 'true'/'false', exit code 0/1 (the
    twine-CLI-style boolean probe)."""
    from twine_ray.stages.query import bgp_ask

    _ray_session()
    pats = []
    for p in args.pattern:
        terms = [None if t == "_" else t for t in p.split()]
        if len(terms) not in (3, 4):
            print(f"bad pattern (need 3 or 4 terms): {p!r}",
                  file=sys.stderr)
            return 2
        pats.append(tuple(terms))
    ok = bool(bgp_ask(args.store, pats).take_all()[0]["ask"])
    print("true" if ok else "false")
    return 0 if ok else 1


def cmd_stats(args) -> int:
    """Store inspection (ops surface): manifest, per-bucket lineage
    (rows / files / bytes / content signatures), totals.  Pure metadata
    — no data scan, no Ray session needed."""
    from twine_ray.stages.materialize import read_lineage
    from twine_ray.state import checkpoint as ckpt

    manifest = ckpt.read_manifest(args.store)
    if manifest is None:
        print(f"no store manifest in {args.store}", file=sys.stderr)
        return 2
    lineage = read_lineage(args.store)
    out = {
        "store": args.store,
        "manifest": manifest,
        "buckets": len(lineage),
        "rows": sum(r.get("rows", 0) for r in lineage),
        "files": sum(r.get("files", 0) for r in lineage),
        "bytes": sum(r.get("bytes", 0) for r in lineage),
    }
    if args.buckets:
        out["lineage"] = lineage
    print(json.dumps(out, indent=1, sort_keys=True))
    return 0


def cmd_watch(args) -> int:
    """Continuous-ingest loop (the twine-writerd daemon analog,
    pipelines/watch.py): poll a pages directory, feed each wave of new
    Parquet shards through the incremental KG path, ack in
    _WATCH_ACK.json.  Prints one JSON line per processed wave."""
    from twine_ray.pipelines.kg import default_alias_rows
    from twine_ray.pipelines.watch import watch_loop

    _ray_session()
    waves = watch_loop(
        args.watch_dir, args.out, default_alias_rows(),
        poll_sec=args.poll,
        max_waves=args.max_waves,
        idle_exit=args.idle_exit,
        num_buckets=args.num_buckets,
        concurrency=args.concurrency,
        on_wave=lambda w: print(json.dumps(w), flush=True),
    )
    return 0 if waves or args.idle_exit else 1


def cmd_sparql(args) -> int:
    """SPARQL *text* query over the store (stages/sparql.py subset —
    the consumer-facing surface of Twine's store, which speaks SPARQL
    strings: twine:libtwine/sparql.c / Spindle lookup endpoints).
    SELECT prints TSV bindings; ASK prints true/false (exit 0/1);
    CONSTRUCT / DESCRIBE print N-Quads."""
    from twine_ray.stages.sparql import (
        SparqlSyntaxError,
        parse_sparql,
        sparql_query,
    )

    if args.file:
        with open(args.file, encoding="utf-8") as f:
            text = f.read()
    else:
        text = args.query
    if not text:
        print("need a query string or --file", file=sys.stderr)
        return 2
    try:
        plan = parse_sparql(text)
        form = plan["form"]
    except SparqlSyntaxError as e:
        print(f"sparql syntax error: {e}", file=sys.stderr)
        return 2
    if args.explain:
        print(json.dumps(plan, indent=1, sort_keys=True, default=str))
        return 0
    _ray_session()
    res = sparql_query(args.store, text)
    if form == "ask":
        ok = bool(res.take_all()[0]["ask"])
        print("true" if ok else "false")
        return 0 if ok else 1
    if form in ("construct", "describe"):
        from twine_ray.sources.nquads import triple_row_to_nquad

        for row in res.to_pandas().to_dict("records"):
            print(triple_row_to_nquad(row))
        return 0
    df = res.to_pandas()
    print("\t".join(df.columns))
    for row in df.itertuples(index=False):
        print("\t".join(str(v) for v in row))
    return 0


def cmd_describe(args) -> int:
    """SPARQL DESCRIBE analog: prints the resource's concise bounded
    description as N-Quads."""
    from twine_ray.sources.nquads import triple_row_to_nquad
    from twine_ray.stages.query import describe_resource

    _ray_session()
    preds = set(args.pred) if args.pred else None
    ds = describe_resource(args.store, args.iri, preds=preds)
    for row in ds.to_pandas().to_dict("records"):
        print(triple_row_to_nquad(row))
    return 0


def cmd_compact(args) -> int:
    """Store maintenance: one sorted file per bucket (VACUUM analog)."""
    from twine_ray.stages.materialize import compact_store

    _ray_session()
    print(json.dumps(compact_store(args.store, buckets=args.bucket)))
    return 0


def cmd_drop(args) -> int:
    """DROP GRAPH analog: remove named graphs from the store (only
    their hash buckets are rewritten)."""
    from twine_ray.stages.materialize import drop_graphs

    _ray_session()
    print(json.dumps(drop_graphs(args.store, args.graph)))
    return 0


def cmd_workflow(args) -> int:
    import ray.data as rd

    from twine_ray.pipelines.kg import default_alias_rows
    from twine_ray.pipelines.workflow import (
        WorkflowContext,
        load_workflow_config,
        run_workflow,
    )

    _ray_session()
    if args.config:
        stages, opts = load_workflow_config(args.config)
    else:
        stages, opts = (
            args.stages.split(",") if args.stages else None
        ), {}
    ctx = WorkflowContext(
        alias_rows=default_alias_rows(),
        num_buckets=int(opts.get("num_buckets", 32)),
        out_dir=args.out,
    )
    out = run_workflow(rd.read_parquet(args.input), stages, ctx)
    n = out.count()
    print(json.dumps({"rows": n, "stages": stages or "default"}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="twine_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("pages", help="full KG pipeline over pages parquet")
    pp.add_argument("input")
    pp.add_argument("--out", required=True)
    pp.add_argument("--buckets", type=int, default=32)
    pp.add_argument("--no-resume", action="store_true")
    pp.add_argument("--index", action="store_true",
                    help="also write the per-proxy index (spindle "
                         "generate analog) to <out>/index")
    pp.set_defaults(fn=cmd_pages)

    pm = sub.add_parser("message", help="one message through MIME dispatch")
    pm.add_argument("input")
    pm.add_argument("-t", "--type", required=True)
    pm.add_argument("--uri")
    pm.add_argument("--out")
    pm.add_argument("--xml-rules", action="append",
                    help="register an XML type from TOML rules: "
                         "<mime>=<rules.toml> (repeatable)")
    pm.set_defaults(fn=cmd_message)

    pu = sub.add_parser(
        "update", help="incremental reprocess of changed urls/buckets"
    )
    pu.add_argument("input")
    pu.add_argument("--out", required=True)
    pu.add_argument("--buckets", type=int, default=32)
    pu.add_argument("-u", "--url", action="append",
                    help="changed page url (repeatable)")
    pu.add_argument("-b", "--bucket", action="append", type=int,
                    help="raw graph bucket id to recompute (repeatable)")
    pu.set_defaults(fn=cmd_update)

    pc_ = sub.add_parser("compact", help="one sorted file per bucket")
    pc_.add_argument("store")
    pc_.add_argument("-b", "--bucket", action="append", type=int)
    pc_.set_defaults(fn=cmd_compact)

    pd_ = sub.add_parser("drop",
                         help="remove named graphs from the store")
    pd_.add_argument("store")
    pd_.add_argument("-g", "--graph", action="append", required=True)
    pd_.set_defaults(fn=cmd_drop)

    pg = sub.add_parser("get", help="fetch a named graph / pattern")
    pg.add_argument("store")
    pg.add_argument("--graph")
    pg.add_argument("--subj")
    pg.add_argument("--pred")
    pg.add_argument("--obj")
    pg.set_defaults(fn=cmd_get)

    pb = sub.add_parser("bgp", help="basic-graph-pattern query")
    pb.add_argument("store")
    pb.add_argument(
        "--pattern", action="append", required=True,
        help="'graph subj pred obj' (or 3 terms); ?var binds, _ skips",
    )
    pb.add_argument(
        "--optional", action="append",
        help="OPTIONAL pattern (left-join; unmatched solutions keep "
             "nulls for its new variables)",
    )
    pb.add_argument(
        "--filter", action="append",
        help="FILTER spec '?var op value' (op: == != < <= > >= regex "
             "contains bound !bound)",
    )
    pb.add_argument("--distinct", action="store_true",
                    help="deduplicate solutions (SPARQL DISTINCT)")
    pb.add_argument(
        "--order-by", action="append", dest="order_by",
        help="'?var [desc]' — may repeat for multi-key sort",
    )
    pb.add_argument("--limit", type=int)
    pb.add_argument("--offset", type=int, default=0)
    pb.set_defaults(fn=cmd_bgp)

    pa_ = sub.add_parser("ask", help="SPARQL ASK analog (exit 0/1)")
    pa_.add_argument("store")
    pa_.add_argument("--pattern", action="append", required=True,
                     help="'graph subj pred obj' (or 3 terms)")
    pa_.set_defaults(fn=cmd_ask)

    pst = sub.add_parser(
        "stats", help="store metadata: manifest, lineage totals"
    )
    pst.add_argument("store")
    pst.add_argument("--buckets", action="store_true",
                     help="include the per-bucket lineage records")
    pst.set_defaults(fn=cmd_stats)

    pwch = sub.add_parser(
        "watch",
        help="continuous ingest: poll a pages dir, feed new shards "
             "through the incremental KG path (twine-writerd analog)",
    )
    pwch.add_argument("watch_dir")
    pwch.add_argument("--out", required=True)
    pwch.add_argument("--poll", type=float, default=5.0,
                      help="seconds between idle polls")
    pwch.add_argument("--max-waves", type=int, dest="max_waves",
                      help="exit after N processed waves")
    pwch.add_argument("--idle-exit", type=int, dest="idle_exit",
                      help="exit after N consecutive idle polls "
                           "(default: run forever)")
    pwch.add_argument("--num-buckets", type=int, dest="num_buckets",
                      help="store bucket count for the BOOTSTRAP wave "
                           "(default 32); an existing store's manifest "
                           "overrides this on every later poll")
    pwch.add_argument("--concurrency", type=int, default=4,
                      help="per-stage actor-pool size (default 4)")
    pwch.set_defaults(fn=cmd_watch)

    psq = sub.add_parser(
        "sparql",
        help="SPARQL text query (SELECT/ASK/CONSTRUCT/DESCRIBE subset)",
    )
    psq.add_argument("store")
    psq.add_argument("query", nargs="?",
                     help="query string (or use --file)")
    psq.add_argument("--file", help="read the query from a file")
    psq.add_argument("--explain", action="store_true",
                     help="print the parsed algebra plan, don't run")
    psq.set_defaults(fn=cmd_sparql)

    pdsc = sub.add_parser(
        "describe", help="concise bounded description of a resource"
    )
    pdsc.add_argument("store")
    pdsc.add_argument("iri")
    pdsc.add_argument("--pred", action="append",
                      help="restrict to these predicates (profile)")
    pdsc.set_defaults(fn=cmd_describe)

    pe = sub.add_parser("export", help="dump a triple store to RDF")
    pe.add_argument("store", help="store dir (e.g. <out>/store)")
    pe.add_argument("--format", default="nquads",
                    choices=["nquads", "turtle", "trig", "rdfxml",
                             "jsonld"])
    pe.add_argument("--out", required=True,
                    help="output dir (nquads) or file (other formats)")
    pe.set_defaults(fn=cmd_export)

    pw = sub.add_parser("workflow", help="config-ordered stage chain")
    pw.add_argument("input")
    pw.add_argument("--stages")
    pw.add_argument("--config")
    pw.add_argument("--out")
    pw.set_defaults(fn=cmd_workflow)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
