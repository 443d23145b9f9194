"""N-Triples / N-Quads parsing + serialization (SURVEY.md §2.1 S8, §2.2 M1).

The reference parses RDF serializations through librdf
(``twine:plug-ins/rdf.c`` dispatching into
``twine:libtwine/rdf.c::twine_rdf_model_parse``) and hands graphs
between stages as N-Quads
(``twine:libtwine/rdf.c::twine_rdf_model_nquads``).  This module
implements the regular-grammar members of that family — N-Triples and
N-Quads — as a pure-Python line parser; Turtle/TriG (context-free) live
in ``twine_ray.sources.turtle``.  RDF/XML remains out of scope (no XML
RDF fixtures in the test surface; SURVEY.md §2.2 M1).

Output rows use the engine triple schema (graph, subj, pred, obj,
obj_is_lit, obj_dt, obj_lang, score) with score 0 (scores are assigned
by the rulebase later).  Graph for N-Triples comes from the caller
(message/graph URI, as in Twine's per-message graph derivation).
"""

from __future__ import annotations

import re

import pyarrow as pa

from twine_ray.stages.triples import TRIPLES_SCHEMA

_IRI = r"<([^<>\"{}|^`\\\x00-\x20]*)>"
_BNODE = r"(_:[A-Za-z0-9][A-Za-z0-9._-]*)"
_LITERAL = r'"((?:[^"\\\n\r]|\\.)*)"'
_LANG = r"@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*)"

_SUBJ = rf"(?:{_IRI}|{_BNODE})"
_OBJ_LIT = rf"{_LITERAL}(?:\^\^{_IRI}|{_LANG})?"

_LINE_RE = re.compile(
    rf"^[ \t]*{_SUBJ}[ \t]+{_IRI}[ \t]+"
    rf"(?:{_SUBJ}|{_OBJ_LIT})"
    rf"(?:[ \t]+{_SUBJ})?[ \t]*\.[ \t]*$"
)

_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}

_UNESC_RE = re.compile(r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|[tbnrf\"'\\\\])")


def _unescape(s: str) -> str:
    def _one(m: re.Match) -> str:
        e = m.group(1)
        if e[0] == "u":
            return chr(int(e[1:], 16))
        if e[0] == "U":
            return chr(int(e[1:], 16))
        return _ESCAPES[e]

    return _UNESC_RE.sub(_one, s)


def _escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def parse_nquads_line(line: str, default_graph: str = "") -> dict | None:
    """Parse one N-Triples/N-Quads line into a triple-schema row.

    Returns None for blank lines / comments / malformed lines (Twine
    logs-and-skips malformed statements rather than failing the batch).
    """
    # strip ASCII whitespace only: str.strip() also eats U+0085/U+2028
    # etc., which are LEGAL raw inside N-Quads literals
    line = line.strip(" \t\r\n")
    if not line or line.startswith("#"):
        return None
    m = _LINE_RE.match(line)
    if not m:
        return None
    (s_iri, s_bn, pred, o_iri, o_bn, o_lit, o_dt, o_lang,
     g_iri, g_bn) = m.groups()
    subj = s_iri if s_iri is not None else s_bn
    if o_lit is not None:
        obj, is_lit = _unescape(o_lit), True
        dt, lang = o_dt or "", (o_lang or "").lower()
    else:
        obj, is_lit = (o_iri if o_iri is not None else o_bn), False
        dt, lang = "", ""
    graph = g_iri if g_iri is not None else (g_bn or default_graph)
    return {
        "graph": graph,
        "subj": subj,
        "pred": pred,
        "obj": obj,
        "obj_is_lit": is_lit,
        "obj_dt": dt,
        "obj_lang": lang,
        "score": 0,
    }


def parse_nquads_text(text: str, default_graph: str = "") -> list[dict]:
    rows = []
    # split on \n ONLY: str.splitlines() also splits on U+0085/U+2028/
    # U+000C, which are legal raw characters inside N-Quads literals
    # (hypothesis-caught via the cross-serializer round-trip)
    for line in text.split("\n"):
        row = parse_nquads_line(line, default_graph)
        if row is not None:
            rows.append(row)
    return rows


def triple_row_to_nquad(row: dict) -> str:
    """Serialize one triple row back to an N-Quads line
    (``twine_rdf_model_nquads`` analog)."""
    def term(v: str) -> str:
        return v if v.startswith("_:") else f"<{v}>"

    if row["obj_is_lit"]:
        obj = f'"{_escape(row["obj"])}"'
        if row.get("obj_dt"):
            obj += f"^^<{row['obj_dt']}>"
        elif row.get("obj_lang"):
            obj += f"@{row['obj_lang']}"
    else:
        obj = term(row["obj"])
    g = f" {term(row['graph'])}" if row.get("graph") else ""
    return f"{term(row['subj'])} <{row['pred']}> {obj}{g} ."


def write_nquads(triples_ds, out_dir: str) -> dict:
    """Distributed N-Quads sink (the export side of Twine's
    ``twine_rdf_model_nquads`` — dumps a triples Dataset as ``.nq``
    shard files, one per block, written BY THE TASKS (no driver
    materialization; the pattern for a text-format sink Ray Data lacks
    natively).  Shard names combine a content hash with a
    task-id + per-task ordinal disambiguator: two DISTINCT blocks with
    identical payload no longer collapse to one file (they land in
    different tasks / ordinals), while a task retried by Ray re-runs
    with a new task id, so any partial output of the failed attempt is
    an orphan NOT listed in the committed ``_MANIFEST.json`` — the
    manifest (written once by the driver after all tasks succeed) is
    the commit record, mirroring the job-commit protocol of
    distributed file sinks.  Returns {'rows': n, 'files': k,
    'manifest': path}."""
    import hashlib as _hl
    import itertools
    import json
    import os

    import pyarrow as pa
    import ray

    os.makedirs(out_dir, exist_ok=True)
    _ordinal = itertools.count()  # per-worker-process batch ordinal

    def _dump(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        if not rows:
            return pa.Table.from_pydict(
                {"rows": pa.array([], type=pa.int64()),
                 "file": pa.array([], type=pa.string())}
            )
        payload = "".join(
            triple_row_to_nquad(r) + "\n" for r in rows
        ).encode("utf-8")
        try:
            tid = ray.get_runtime_context().get_task_id() or ""
        except Exception:
            tid = ""
        salt = f"{tid}:{next(_ordinal)}".encode()
        name = (
            _hl.blake2b(payload, digest_size=10).hexdigest()
            + "-" + _hl.blake2b(salt, digest_size=4).hexdigest()
        )
        path = os.path.join(out_dir, f"part-{name}.nq")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.Table.from_pydict(
            {"rows": pa.array([len(rows)], type=pa.int64()),
             "file": pa.array([path], type=pa.string())}
        )

    manifest = triples_ds.map_batches(
        _dump, batch_format="pyarrow"
    ).take_all()
    files = sorted(r["file"] for r in manifest)
    man_path = os.path.join(out_dir, "_MANIFEST.json")
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"files": [os.path.basename(p) for p in files],
                   "rows": sum(r["rows"] for r in manifest)}, f)
    os.replace(tmp, man_path)
    return {
        "rows": sum(r["rows"] for r in manifest),
        "files": len(manifest),
        "manifest": man_path,
    }


def read_nquads(paths, default_graph: str = ""):
    """Bulk N-Quads load: text lines -> triples Dataset (S8).

    ``read_text`` streams the dump in blocks; the per-batch parse is the
    bulk-buffer protocol of ``twine:libtwine/plugin.c::
    twine_plugin_add_bulk`` — Ray Data block streaming gives it for
    free (SURVEY.md S7 note).
    """
    import ray.data as rd

    ds = rd.read_text(paths)

    def _parse(batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch["text"].to_pylist():
            row = parse_nquads_line(line, default_graph)
            if row is not None:
                rows.append(row)
        return pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA)

    return ds.map_batches(_parse, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# S7: GeoNames-style bulk dump — `URL\n<one-line doc>\n` records
# ---------------------------------------------------------------------------


def read_url_doc_dump(paths):
    """Reader for ``text/x-geonames-dump``-shaped dumps
    (``twine:plug-ins/geonames.c``): alternating URL line + one-line
    document payload; graph URI = ``<url>about.rdf`` derivation is left
    to the caller — here each record becomes (url, doc) rows.

    Pairing needs line adjacency, so lines are indexed per file block
    and paired within ``map_batches`` — the dump format guarantees an
    even number of lines per record boundary when blocks split on
    record boundaries; a trailing unpaired URL is dropped (matching the
    reference's consumed-up-to-pointer contract).
    """
    import ray.data as rd

    # whole-file reads: pairing never straddles a block boundary, and
    # parallelism comes from the file shard list (one dump = many files
    # at scale, exactly like the reference's per-dump bulk jobs)
    ds = rd.read_binary_files(paths, include_paths=True)

    def _pair(batch: pa.Table) -> pa.Table:
        urls, docs = [], []
        for payload in batch["bytes"].to_pylist():
            lines = payload.decode("utf-8", errors="replace").splitlines()
            for i in range(0, len(lines) - 1, 2):
                urls.append(lines[i].strip())
                docs.append(lines[i + 1])
        return pa.Table.from_pydict(
            {"url": pa.array(urls, type=pa.string()),
             "doc": pa.array(docs, type=pa.string())}
        )

    return ds.map_batches(_pair, batch_format="pyarrow")
