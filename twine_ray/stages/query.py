"""Triple-pattern read surface over the partitioned store.

The reference's read path is SPARQL against the store: Twine fetches a
graph's prior state before replacing it
(``twine:libtwine/sparql.c::twine_sparql_get``) and Spindle's lookup
endpoints resolve entities.  The Parquet-store analogs:

- ``read_graph(store_dir, graph_uri)``: ONE named graph.  The graph's
  bucket is computed from the store's pinned manifest
  (``bucket_of(graph, num_buckets)``), so only THAT partition
  directory's files are read — cost is one bucket, not the store —
  then an Arrow equality filter selects the graph's rows.
- ``match_triples(store_dir, graph/subj/pred/obj)``: general pattern
  scan.  A bound ``graph`` prunes to its bucket partition at the FILE
  LIST; every bound term is also pushed into ``read_parquet``'s Arrow
  dataset filter, so Parquet row-group statistics skip
  non-matching row groups before any byte decodes (the store is sorted
  by (subj, pred, obj) within each bucket, which makes subj ranges
  tight).

Both return lazy Datasets — consumers stream.
"""

from __future__ import annotations

import os

from twine_ray.functions.ids import bucket_of
from twine_ray.state import checkpoint as ckpt

BUCKET_COL = "graph_bucket"


def _store_num_buckets(store_dir: str) -> int:
    m = ckpt.read_manifest(store_dir)
    if not m or "num_buckets" not in m:
        raise ValueError(
            f"{store_dir} has no bucketing manifest — not a triple store "
            "written by materialize_triples"
        )
    return int(m["num_buckets"])


def _partition_files(store_dir: str, bucket: int | None) -> list[str]:
    dd = ckpt.data_dir(store_dir)
    files: list[str] = []
    if not os.path.isdir(dd):
        return files
    for name in sorted(os.listdir(dd)):
        if not name.startswith(f"{BUCKET_COL}="):
            continue
        b = int(name.split("=", 1)[1])
        if bucket is not None and b != bucket:
            continue
        part = os.path.join(dd, name)
        files.extend(
            os.path.join(part, f)
            for f in sorted(os.listdir(part))
            if f.endswith(".parquet")
        )
    return files


def match_triples(store_dir: str, *, graph: str | None = None,
                  subj: str | None = None, pred: str | None = None,
                  obj: str | None = None,
                  obj_lang: str | None = None,
                  obj_dt: str | None = None,
                  columns: list[str] | None = None):
    """Lazy Dataset of store triples matching the bound terms.

    Each of ``graph``/``subj``/``pred``/``obj`` may also be a
    tuple/list of strings — an IN-SET term (the path-alternation
    ``(p1|p2)`` scan shape): one scan, the set pushes into the Parquet
    dataset filter as ``isin``.  ``obj_lang``/``obj_dt`` bind the
    term-metadata columns (the SPARQL ``lang()``/``datatype()``
    accessor pushdown — row-group statistics prune on them like any
    bound term)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from twine_ray.stages.triples import TRIPLES_SCHEMA

    bucket = None
    if graph is not None and isinstance(graph, str):
        bucket = bucket_of(graph, _store_num_buckets(store_dir))
    files = _partition_files(store_dir, bucket)
    if not files:
        return rd.from_arrow(pa.Table.from_pylist([], schema=TRIPLES_SCHEMA))

    bound = [
        (c, v)
        for c, v in (("graph", graph), ("subj", subj), ("pred", pred),
                     ("obj", obj), ("obj_lang", obj_lang),
                     ("obj_dt", obj_dt))
        if v is not None
    ]
    expr = None
    for c, v in bound:
        if isinstance(v, (tuple, list, frozenset, set)):
            e = pc.field(c).isin(sorted(v))
        else:
            e = pc.field(c) == v
        expr = e if expr is None else expr & e

    def _strip(t: pa.Table) -> pa.Table:
        # hive partitioning is inferred from the file PATHS even for an
        # explicit file list — drop the bucket column it re-adds
        if BUCKET_COL in t.schema.names:
            t = t.drop_columns([BUCKET_COL])
        return t

    kwargs = {}
    if columns is not None:
        kwargs["columns"] = columns
    if expr is not None:
        kwargs["filter"] = expr
    try:
        return rd.read_parquet(files, **kwargs).map_batches(
            _strip, batch_format="pyarrow"
        )
    except TypeError:
        # older read_parquet without filter pushdown: residual filter
        ds = rd.read_parquet(files, columns=columns)

        def _flt(t: pa.Table) -> pa.Table:
            t = _strip(t)
            mask = None
            for c, v in bound:
                if isinstance(v, (tuple, list, frozenset, set)):
                    m = pc.is_in(
                        t[c], value_set=pa.array(sorted(v), pa.string())
                    )
                else:
                    m = pc.equal(t[c], v)
                mask = m if mask is None else pc.and_(mask, m)
            return t if mask is None else t.filter(mask)

        return ds.map_batches(_flt, batch_format="pyarrow")


def read_graph(store_dir: str, graph_uri: str):
    """SPARQL-GET analog: one named graph, file-pruned to its bucket."""
    return match_triples(store_dir, graph=graph_uri)


# ---------------------------------------------------------------------------
# Basic graph patterns (SPARQL BGP analog)
# ---------------------------------------------------------------------------

_PATTERN_COLS = ("graph", "subj", "pred", "obj")


def _parse_pattern(pat):
    """3-tuple (subj, pred, obj) or 4-tuple (graph, subj, pred, obj);
    each term is None (don't care), '?name' (variable), a literal
    string (bound), or a tuple/list of strings (bound IN-SET — the
    path-alternation ``(p1|p2)`` term: one scan matches any member).
    Returns ({col: literal-or-tuple}, {col: varname})."""
    if len(pat) == 3:
        pat = (None,) + tuple(pat)
    if len(pat) != 4:
        raise ValueError(f"pattern must have 3 or 4 terms: {pat!r}")
    bound, variables = {}, {}
    for col, term in zip(_PATTERN_COLS, pat):
        if term is None:
            continue
        if isinstance(term, str) and term.startswith("?"):
            variables[col] = term[1:]
        elif isinstance(term, (tuple, list, frozenset, set)):
            if not term or not all(isinstance(t, str) for t in term):
                raise ValueError(
                    f"an IN-SET pattern term needs a non-empty "
                    f"collection of strings: {term!r}"
                )
            bound[col] = tuple(sorted(term))
        else:
            bound[col] = term
    return bound, variables


def _pattern_bindings(ds, bound, variables, scan_masks=()):
    """Solutions of one pattern over a triples Dataset: filter the
    bound terms (and intra-pattern repeated-variable equalities),
    project to one column per distinct variable.  ``scan_masks`` are
    extra ``(column, op, value)`` raw-column predicates — the
    lang()/datatype() accessor masks over obj_lang/obj_dt, applied
    BEFORE projection (bindings carry term strings only)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    first = {}
    for col, var in variables.items():
        first.setdefault(var, col)

    def _fn(t: pa.Table) -> pa.Table:
        mask = None
        for col, v in bound.items():
            if isinstance(v, (tuple, list, frozenset, set)):
                m = pc.is_in(
                    t[col], value_set=pa.array(sorted(v), pa.string())
                )
            else:
                m = pc.equal(t[col], v)
            mask = m if mask is None else pc.and_(mask, m)
        for col, op, val in scan_masks:
            if op == "==":
                m = pc.equal(t[col], val)
            else:  # "!="
                m = pc.not_equal(t[col], val)
            m = pc.fill_null(m, False)
            mask = m if mask is None else pc.and_(mask, m)
        for col, var in variables.items():
            if first[var] != col:
                m = pc.equal(t[col], t[first[var]])
                mask = m if mask is None else pc.and_(mask, m)
        if mask is not None:
            t = t.filter(mask)
        if not first:
            # ASK guard (no variables): a zero-column table counts 0
            # rows even when the filter matched — emit a marker column
            # so ``count()`` reflects the number of matches
            return pa.table({"__ask": pa.array([True] * len(t))})
        return pa.table({var: t[col] for var, col in first.items()})

    return ds.map_batches(_fn, batch_format="pyarrow")


def _with_null_vars(t, names):
    """Ensure every name is a string column of ``t``; absent names are
    appended as all-null, null-typed ones (a left-outer join block with
    no matches) are cast to string so block schemas unify."""
    import pyarrow as pa

    for v in names:
        if v in t.schema.names:
            col = t[v]
            if pa.types.is_null(col.type):
                t = t.set_column(
                    t.schema.get_field_index(v), v, col.cast(pa.string())
                )
        else:
            t = t.append_column(v, pa.nulls(len(t), type=pa.string()))
    return t


_FILTER_OPS = ("==", "!=", "<", "<=", ">", ">=", "regex", "contains",
               "bound", "!bound")
# scan-level term-metadata accessors (SPARQL lang()/datatype() subset):
# applied to the obj_lang / obj_dt columns of the pattern SCANS that
# bind the variable in object position, never to the bindings table
# (bindings carry term strings only — the engine's documented term
# model; see bgp_match docstring)
_SCAN_FILTER_OPS = ("lang==", "lang!=", "dt==", "dt!=")


def _filter_spec_vars(spec):
    """Every variable a filter spec reads (recurses into 'or')."""
    if spec[0] == "or":
        out = []
        for conj in spec[1]:
            for atom in conj:
                out.extend(_filter_spec_vars(atom))
        return out
    var, _op, *rest = spec
    out = [var.lstrip("?")]
    if rest and isinstance(rest[0], str) and rest[0].startswith("?"):
        out.append(rest[0][1:])
    return out


def _filter_spec_ops(spec):
    """Every op a filter spec uses (recurses into 'or')."""
    if spec[0] == "or":
        out = []
        for conj in spec[1]:
            for atom in conj:
                out.extend(_filter_spec_ops(atom))
        return out
    return [spec[1]]


def _compile_filters(filters, known_vars):
    """Compile filter specs into one vectorized pyarrow predicate over
    a bindings table.  A spec is ``(var, op, value)`` — ``value`` may
    be a literal string or another '?var' — or the disjunction form
    ``("or", [conj, conj, ...])`` where each ``conj`` is a list of
    atom specs ANDed together (SPARQL ``a && b || c && d``; atoms may
    themselves be nested "or" specs from parenthesized groups).
    Comparisons are lexicographic over the term strings (the
    SPARQL-subset this engine documents); null bindings fail every
    test except '!bound' — SQL WHERE / SPARQL FILTER-error semantics
    agree here."""
    import pyarrow.compute as pc

    def _check(spec):
        if spec[0] == "or":
            return ("or", [[_check(a) for a in conj]
                           for conj in spec[1]])
        var, op, *rest = spec
        var = var.lstrip("?")
        if var not in known_vars:
            raise ValueError(f"filter on unbound variable: ?{var}")
        if op not in _FILTER_OPS:
            raise ValueError(f"unknown filter op {op!r} "
                             f"(one of {_FILTER_OPS})")
        val = rest[0] if rest else None
        if op in ("bound", "!bound"):
            if rest:
                raise ValueError(f"{op} takes no value")
        elif val is None:
            raise ValueError(f"{op} needs a value")
        elif isinstance(val, str) and val.startswith("?"):
            other = val[1:]
            if other not in known_vars:
                raise ValueError(f"filter references unbound "
                                 f"variable: ?{other}")
            val = ("var", other)
        return (var, op, val)

    checked = [_check(s) for s in filters]

    def _atom_mask(t, spec):
        if spec[0] == "or":
            total = None
            for conj in spec[1]:
                m = None
                for atom in conj:
                    am = _atom_mask(t, atom)
                    m = am if m is None else pc.and_(m, am)
                total = m if total is None else pc.or_(total, m)
            return total
        var, op, val = spec
        col = t[var]
        if op == "bound":
            return pc.is_valid(col)
        if op == "!bound":
            return pc.is_null(col)
        rhs = t[val[1]] if isinstance(val, tuple) else val
        if op == "==":
            m = pc.equal(col, rhs)
        elif op == "!=":
            m = pc.not_equal(col, rhs)
        elif op == "<":
            m = pc.less(col, rhs)
        elif op == "<=":
            m = pc.less_equal(col, rhs)
        elif op == ">":
            m = pc.greater(col, rhs)
        elif op == ">=":
            m = pc.greater_equal(col, rhs)
        elif op == "regex":
            m = pc.match_substring_regex(col, val)
        else:  # contains
            m = pc.match_substring(col, val)
        return pc.fill_null(m, False)

    def _mask(t):
        mask = None
        for spec in checked:
            m = _atom_mask(t, spec)
            mask = m if mask is None else pc.and_(mask, m)
        return mask

    return _mask


def _parse_values(values, known_vars):
    """Validate VALUES rows: list of {var: string|None}; None = UNDEF
    (matches anything).  Every var must be bound by the patterns."""
    rows = []
    for row in values:
        checked = {}
        for var, val in row.items():
            var = var.lstrip("?")
            if var not in known_vars:
                raise ValueError(f"values references unbound "
                                 f"variable: ?{var}")
            checked[var] = val
        if checked:
            rows.append(checked)
    if not rows:
        raise ValueError("values needs at least one non-empty row")
    return rows


def _apply_values(acc, rows):
    """SPARQL VALUES analog (inline data): keep solutions compatible
    with at least one values row — a vectorized OR-of-ANDs mask, no
    shuffle (the inline table is tiny by contract)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _mask(t: pa.Table):
        total = None
        for row in rows:
            m = None
            for var, val in row.items():
                if val is None:  # UNDEF
                    continue
                e = pc.fill_null(pc.equal(t[var], val), False)
                m = e if m is None else pc.and_(m, e)
            if m is None:  # all-UNDEF row matches everything
                m = pa.array([True] * len(t))
            total = m if total is None else pc.or_(total, m)
        return total

    return acc.map_batches(
        lambda t: t.filter(_mask(t)), batch_format="pyarrow"
    )


def _apply_modifiers(ds, out_vars, distinct=False, order_by=None,
                     limit=None, offset=0):
    """SPARQL solution modifiers in algebra order: DISTINCT -> ORDER
    BY -> OFFSET/LIMIT.  DISTINCT is a bucketed exchange (complete key
    groups per bucket -> global dedup, streaming).  ORDER BY + LIMIT
    materializes only the bounded head (offset+limit rows — LIMIT
    queries are small by contract; an unbounded ORDER BY sorts
    distributed and stays lazy)."""
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.stages.grouped import bucketed_group_reduce

    if distinct:
        ds = bucketed_group_reduce(
            ds, list(out_vars),
            lambda df: df.drop_duplicates(),
        )
    if order_by:
        keys, desc = [], []
        for spec in order_by:
            if isinstance(spec, str):
                var, d = spec, False
            else:
                var, dstr = spec
                d = str(dstr).lower() == "desc"
            var = var.lstrip("?")
            if var not in out_vars:
                raise ValueError(f"order_by names an unselected "
                                 f"variable: ?{var}")
            keys.append(var)
            desc.append(d)
        ds = ds.sort(keys, descending=desc)
    if limit is not None:
        head = ds.limit(offset + limit)
        if offset:
            rows = head.take_all()  # bounded: offset+limit rows
            # build against the head's OWN schema when it is Arrow
            # (aggregate outputs carry int64 columns; an all-string
            # schema would corrupt them); pandas-block schemas fall
            # back to inference with null-typed columns cast to string
            # (the all-null-OPTIONAL hazard the fixed schema guarded)
            sch = head.schema()
            pa_schema = (
                getattr(sch, "base_schema", None)
                if sch is not None else None
            )
            if isinstance(pa_schema, pa.Schema):
                tbl = pa.Table.from_pylist(rows[offset:],
                                           schema=pa_schema)
            elif rows[offset:]:
                tbl = pa.Table.from_pylist(rows[offset:])
                for i, f in enumerate(tbl.schema):
                    if pa.types.is_null(f.type):
                        tbl = tbl.set_column(
                            i, f.name, tbl.column(i).cast(pa.string())
                        )
            else:
                tbl = pa.table({
                    v: pa.array([], type=pa.string())
                    for v in out_vars
                })
            return rd.from_arrow(tbl)
        return head
    elif offset:
        raise ValueError("offset requires limit (bounded slice)")
    return ds


def _semi_anti_join(source, acc, acc_vars, acc_rows, inner_patterns,
                    keep: bool):
    """EXISTS / NOT EXISTS engine: evaluate ``inner_patterns`` as its
    own BGP over ``source``, project to the variables SHARED with the
    accumulated solutions, dedup them (one bucketed exchange), then
    semi- (``keep=True``) or anti- (``keep=False``) hash-join ``acc``
    against the deduplicated probe — the bgp_minus shape, no
    driver-side state.  No shared variables → the inner group is an
    ASK guard over the whole result.  Returns ``(dataset, rows)``;
    ``(None, 0)`` means provably empty."""
    import pyarrow as pa

    from twine_ray.stages.grouped import (
        bucketed_group_reduce,
        default_num_partitions,
    )

    if isinstance(inner_patterns, dict):
        # {"patterns": [...], "filters": [...]} — the filters read the
        # inner group's own variables (non-correlated; bgp_match
        # raises on anything else)
        inner = bgp_match(source, inner_patterns["patterns"],
                          filters=inner_patterns.get("filters", ()))
    else:
        inner = bgp_match(source, inner_patterns)
    inner_vars = inner.schema().names
    shared = [v for v in acc_vars if v in inner_vars]
    if not shared:
        any_inner = inner.limit(1).count() > 0
        return (acc, acc_rows) if any_inner == keep else (None, 0)
    ren = {v: f"__e_{v}" for v in shared}
    probe = bucketed_group_reduce(
        inner.map_batches(
            lambda t, sh=tuple(shared): pa.table(
                {ren[v]: t[v] for v in sh}
            ),
            batch_format="pyarrow",
        ),
        list(ren.values()),
        lambda df: df.drop_duplicates(),
    ).map_batches(
        lambda df: df.assign(__e=1), batch_format="pandas"
    ).materialize()
    n_p = probe.count()
    if n_p == 0:
        return (None, 0) if keep else (acc, acc_rows)
    left = acc.materialize()
    acc_rows = left.count()
    n_parts = max(2, default_num_partitions(
        hi=32, rows=max(acc_rows, n_p), rows_per_partition=100_000
    ))
    joined = left.repartition(n_parts).materialize().join(
        probe.repartition(n_parts).materialize(),
        join_type="left_outer", num_partitions=n_parts,
        on=tuple(shared), right_on=tuple(ren[v] for v in shared),
    )
    drop = list(ren.values()) + ["__e"]

    def _keep_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.is_valid(t["__e"]) if keep else pc.is_null(t["__e"])
        t = t.filter(m)
        return t.drop_columns([c for c in drop if c in t.schema.names])

    out = joined.map_batches(
        _keep_rows, batch_format="pyarrow"
    ).materialize()
    return out, out.count()


def bgp_match(source, patterns, select: list[str] | None = None,
              optional=(), filters=(), values=None, binds=(),
              exists=(), not_exists=(), distinct=False,
              order_by=None, limit=None, offset=0):
    """SPARQL basic-graph-pattern analog over the triple store — the
    Spindle lookup-endpoint shape (reference: Twine consumers query
    the SPARQL store Spindle populates; SURVEY §1.1).

    ``source`` is either a store directory (each pattern becomes its
    own file/row-group-PRUNED ``match_triples`` scan — bound graphs
    prune to one bucket, bound terms push into Parquet row-group
    statistics) or a triples Dataset.  ``patterns`` is a list of 3- or
    4-tuples with '?var' variables; patterns join on their shared
    variables (hash joins sized to the data), bag semantics like
    SPARQL.  Patterns with NO variables act as ASK guards: zero
    matches empties the result.  Join order is PLANNED, not written:
    patterns join greedily from the smallest binding set, always
    preferring one that shares a variable with the solutions so far —
    user pattern order never causes an avoidable cardinality blowup
    (inner bag joins commute, so results are order-independent).

    ``optional`` patterns are the SPARQL OPTIONAL analog: each
    left-outer-joins onto the required solutions after all required
    patterns joined.  A solution with no compatible optional match
    keeps ONE row with null for the optional pattern's new variables;
    m compatible matches multiply it m times (SPARQL bag semantics).
    Each optional pattern must share at least one variable with the
    required patterns (the subset this engine supports — a disjoint
    OPTIONAL is a cross product and is refused).

    ``filters`` is the SPARQL FILTER analog: ``(var, op, value)``
    specs applied to the FINAL solutions (after optional joins), ANDed
    together, streaming through one vectorized map_batches.  ``op`` is
    one of ``==  !=  <  <=  >  >=  regex  contains  bound  !bound``;
    ``value`` is a literal string or another '?var'; comparisons are
    lexicographic over the term strings.  A null binding (unmatched
    OPTIONAL) fails every test except ``!bound``.

    Filter specs may also be the disjunction form
    ``("or", [conj, ...])`` (SPARQL ``||`` — see ``_compile_filters``)
    and the scan-level term-metadata ops ``lang== lang!= dt== dt!=``
    (SPARQL ``lang(?v)`` / ``datatype(?v)`` accessors): those compare
    the store's ``obj_lang`` / ``obj_dt`` columns on every REQUIRED
    pattern that binds ``?v`` in object position — bindings carry term
    strings only, so the metadata test happens at the scans (an
    equality even pushes into the Parquet row-group statistics).
    Untyped / IRI rows carry ``""`` in both columns — the engine's
    documented term model.  Scan ops are constant-only and cannot
    appear inside an ``("or", ...)`` spec.

    ``values`` is the SPARQL VALUES analog (inline data): a list of
    ``{var: string-or-None}`` rows; a solution survives if it is
    compatible with at least one row (None = UNDEF, matches anything).
    Applied as one vectorized OR-of-ANDs mask — no shuffle.

    ``binds`` is the SPARQL BIND analog (subset: constant or variable
    copy): ``(new_var, source)`` pairs where ``source`` is ``"?var"``
    or a constant string; each appends a column to the solutions after
    the OPTIONAL joins, so filters and ``select`` can reference the
    new variable.  ``exists`` / ``not_exists`` are the SPARQL
    ``FILTER (NOT) EXISTS`` analogs: each entry is a pattern list
    evaluated as its own BGP; solutions survive iff a compatible inner
    solution exists (doesn't exist) on the SHARED variables — executed
    as a distributed semi/anti hash join against the deduplicated
    inner projection (the bgp_minus shape).  A null shared binding
    (unmatched OPTIONAL) never matches an inner row: it fails EXISTS
    and survives NOT EXISTS.  With NO shared variables the inner group
    acts as an ASK guard over the whole result.

    Solution modifiers (SPARQL algebra order — DISTINCT, then ORDER
    BY, then OFFSET/LIMIT): ``distinct=True`` dedups solutions via one
    bucketed exchange; ``order_by`` is a list of ``var`` or
    ``(var, "desc")``; ``limit``/``offset`` slice the ordered head
    (only offset+limit rows materialize — LIMIT queries are small by
    contract; ``offset`` requires ``limit``).

    Returns a Dataset of bindings, one column per variable (``select``
    projects/orders a subset)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.stages.grouped import default_num_partitions

    if not patterns:
        raise ValueError("bgp_match needs at least one pattern")

    parsed = [_parse_pattern(p) for p in patterns]
    # optional entries: a pattern tuple (one left join per pattern —
    # the programmatic back-compat form), {"pattern": ..., "filters":
    # [...]} (OPTIONAL-scoped filters whose variables are all bound by
    # the optional pattern itself — the subset where
    # leftjoin(A, filter(F, B)) == leftjoin(A, B, F) exactly), or
    # {"patterns": [...], "filters": [...]} — a GROUPED optional: the
    # inner patterns join FIRST as their own BGP and the result
    # left-joins ONCE (SPARQL's OPTIONAL { a . b } semantics)
    def _opt_entry_vars(e) -> list[str]:
        out: list[str] = []
        pats = ([e["pattern"]] if "pattern" in e else e["patterns"]) \
            if isinstance(e, dict) else [e]
        for pat in pats:
            _, ov = _parse_pattern(pat)
            for v in ov.values():
                if v not in out:
                    out.append(v)
        if isinstance(e, dict):
            for sub in e.get("optional", ()):
                for v in _opt_entry_vars(sub):
                    if v not in out:
                        out.append(v)
        return out

    parsed_opt = []
    for p in optional:
        if isinstance(p, dict):
            pats = p.get("patterns")
            flt = tuple(p.get("filters", ()))
            inner_opt = list(p.get("optional", ()))
            if pats is None:
                pats = [p["pattern"]]
            if len(pats) == 1 and not inner_opt:
                ob, ov = _parse_pattern(pats[0])
                parsed_opt.append(
                    ("single", ob, ov, flt)
                )
            else:
                parsed_opt.append(
                    ("group", list(pats), flt, _opt_entry_vars(p),
                     inner_opt)
                )
        else:
            ob, ov = _parse_pattern(p)
            parsed_opt.append(("single", ob, ov, ()))
    all_vars: list[str] = []
    for _, variables in parsed:
        for v in variables.values():
            if v not in all_vars:
                all_vars.append(v)
    for entry in parsed_opt:
        vs = (
            list(dict.fromkeys(entry[2].values()))
            if entry[0] == "single" else entry[3]
        )
        for v in vs:
            if v not in all_vars:
                all_vars.append(v)
    parsed_binds = []
    for new_var, src in binds:
        nv = new_var.lstrip("?")
        if nv in all_vars:
            raise ValueError(f"bind target already bound: ?{nv}")
        if isinstance(src, str) and src.startswith("?"):
            if src[1:] not in all_vars:
                raise ValueError(
                    f"bind references unbound variable: {src}"
                )
        parsed_binds.append((nv, src))
        all_vars.append(nv)
    out_vars = all_vars if select is None else list(select)
    unknown = [v for v in out_vars if v not in all_vars]
    if unknown:
        raise ValueError(f"select names unbound variables: {unknown}")

    # split scan-level term-metadata specs (lang()/datatype()) from the
    # row-level filter specs: scan specs evaluate over obj_lang/obj_dt
    # at the pattern scans, row specs over the bindings table
    scan_specs, row_specs = [], []
    for f in filters:
        if f[0] != "or" and f[1] in _SCAN_FILTER_OPS:
            var, op, *rest = f
            val = rest[0] if rest else None
            if not isinstance(val, str) or val.startswith("?"):
                raise ValueError(f"{op} needs a constant string value")
            scan_specs.append((var.lstrip("?"), op, val))
        elif any(op in _SCAN_FILTER_OPS for op in _filter_spec_ops(f)):
            raise ValueError(
                "lang()/datatype() accessors cannot appear inside a "
                "disjunction (scan-level vs row-level evaluation)"
            )
        else:
            row_specs.append(f)
    if scan_specs:
        obj_bound = {
            variables["obj"] for _, variables in parsed
            if "obj" in variables
        }
        for var, op, _ in scan_specs:
            if var not in obj_bound:
                raise ValueError(
                    f"{op.rstrip('=!')}(?{var}) needs ?{var} bound in "
                    f"object position by a required pattern (term "
                    f"metadata lives on the object columns)"
                )

    def _empty():
        return rd.from_arrow(pa.table(
            {v: pa.array([], type=pa.string()) for v in out_vars}
        ))

    def _scan(bound):
        if isinstance(source, str):
            return match_triples(source, **bound)
        return source

    def _pushable(spec, pat_vars) -> bool:
        """FILTER pushdown test: a filter whose variables are ALL
        bound by one required pattern can pre-filter that pattern's
        binding set before any join — sound because required-pattern
        bindings are never null and filters are idempotent (the final
        group filter still applies, so pushdown can only shrink join
        inputs, never change the result).  Recurses into ("or", ...)
        disjunctions: an OR pushes iff every atom does."""
        if any(op in ("bound", "!bound")
               for op in _filter_spec_ops(spec)):
            return False  # null semantics belong after OPTIONAL joins
        return all(v in pat_vars for v in _filter_spec_vars(spec))

    # evaluate every required pattern once (they must materialize for
    # the joins anyway), then GREEDY JOIN ORDER: start from the
    # smallest binding set and repeatedly join the smallest remaining
    # set that shares a variable with the accumulated solutions —
    # keeps intermediate join cardinality low regardless of how the
    # user ordered the patterns, and never introduces a cartesian
    # product unless the pattern graph is genuinely disconnected
    pending: list[list] = []
    for idx, (bound, variables) in enumerate(parsed):
        # ==-literal filters become BOUND SCAN TERMS: over a store dir
        # the equality pushes into match_triples and prunes Parquet
        # row groups, not just rows (FILTER(?lang = "en") scans like a
        # bound-object pattern)
        scan_bound = dict(bound)
        if row_specs and variables:
            for spec in row_specs:
                if spec[0] == "or":
                    continue
                var, op, *rest = spec
                if op != "==" or not rest:
                    continue
                val = rest[0]
                if isinstance(val, str) and val.startswith("?"):
                    continue
                v = var.lstrip("?")
                for col, pvar in variables.items():
                    if pvar == v and col not in scan_bound:
                        scan_bound[col] = val
        # lang()/datatype() masks for the patterns binding the filter
        # variable in object position; equality pushes into the scan's
        # bound terms (Parquet row-group statistics prune on it)
        extra_masks = []
        ov = variables.get("obj")
        if scan_specs and ov is not None:
            for var, op, val in scan_specs:
                if var != ov:
                    continue
                col = "obj_lang" if op.startswith("lang") else "obj_dt"
                if op.endswith("!="):
                    extra_masks.append((col, "!=", val))
                elif col not in scan_bound:
                    scan_bound[col] = val
                else:
                    extra_masks.append((col, "==", val))
        pat_binds = _pattern_bindings(_scan(scan_bound), scan_bound,
                                      variables, extra_masks)
        if not variables:  # ASK guard
            if pat_binds.count() == 0:
                return _empty()
            continue
        pat_vars = set(variables.values())
        if row_specs:
            push = [f for f in row_specs if _pushable(f, pat_vars)]
            if push:
                pmask = _compile_filters(push, pat_vars)
                pat_binds = pat_binds.map_batches(
                    lambda t, pm=pmask: t.filter(pm(t)),
                    batch_format="pyarrow",
                )
        if values is not None:
            # VALUES pushdown: when every inline row constrains only
            # THIS pattern's variables, the OR-of-ANDs mask depends on
            # columns this pattern binds — pre-filtering is exact (and
            # the final application is idempotent anyway)
            vrows = [
                {k.lstrip("?"): v for k, v in row.items()}
                for row in values
            ]
            if vrows and all(
                set(r) and set(r) <= pat_vars for r in vrows
            ):
                pat_binds = _apply_values(pat_binds, vrows)
        pat_binds = pat_binds.materialize()
        n = pat_binds.count()
        if n == 0:
            return _empty()
        pending.append(
            [n, idx, pat_binds,
             list(dict.fromkeys(variables.values()))]
        )

    acc = None
    acc_vars: list[str] = []
    acc_rows = 0
    while pending:
        if acc is None:
            pick = min(pending, key=lambda e: (e[0], e[1]))
        else:
            sharing = [
                e for e in pending
                if any(v in acc_vars for v in e[3])
            ]
            pick = min(sharing or pending, key=lambda e: (e[0], e[1]))
        pending.remove(pick)
        n, _, pat_binds, pat_vars = pick
        if acc is None:
            acc, acc_vars, acc_rows = pat_binds, list(pat_vars), n
            continue
        shared = [v for v in acc_vars if v in pat_vars]
        n_parts = max(2, default_num_partitions(
            hi=32, rows=max(acc_rows, n), rows_per_partition=100_000
        ))
        # repartition+materialize: map output can contain empty-schema
        # blocks that break Ray 2.49's hash join (stages/canon.py)
        left = acc.repartition(n_parts).materialize()
        right = pat_binds.repartition(n_parts).materialize()
        if shared:
            ren = {v: f"__r_{v}" for v in shared}
            right = right.map_batches(
                lambda t, ren=ren: t.rename_columns(
                    [ren.get(c, c) for c in t.schema.names]
                ),
                batch_format="pyarrow",
            ).materialize()
            joined = left.join(
                right, join_type="inner", num_partitions=n_parts,
                on=tuple(shared),
                right_on=tuple(ren[v] for v in shared),
            )
            drop = list(ren.values())
        else:
            # no shared variable: cartesian product via a constant key
            def _const(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "__k", pa.array(np.zeros(len(t), dtype=np.int64))
                )

            def _const_r(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "__rk", pa.array(np.zeros(len(t), dtype=np.int64))
                )

            left = left.map_batches(_const, batch_format="pyarrow") \
                .materialize()
            right = right.map_batches(_const_r, batch_format="pyarrow") \
                .materialize()
            joined = left.join(
                right, join_type="inner", num_partitions=n_parts,
                on=("__k",), right_on=("__rk",),
            )
            drop = ["__k", "__rk"]
        acc = joined.map_batches(
            lambda t, drop=drop: t.drop_columns(
                [c for c in drop if c in t.schema.names]
            ),
            batch_format="pyarrow",
        ).materialize()
        acc_rows = acc.count()
        if acc_rows == 0:
            return _empty()
        for v in pat_vars:
            if v not in acc_vars:
                acc_vars.append(v)
    for entry in parsed_opt:
        kind = entry[0]
        if kind == "single":
            _, bound, variables, ofilters = entry
            if not variables:
                # an OPTIONAL ASK guard never filters — no-op by
                # SPARQL semantics (the solution survives whether or
                # not the optional part matches)
                continue
            pat_vars = list(dict.fromkeys(variables.values()))
        else:
            _, gpats, ofilters, pat_vars, inner_opt = entry
        if acc is None:
            raise ValueError(
                "optional patterns require at least one non-ASK "
                "required pattern"
            )
        shared = [v for v in acc_vars if v in pat_vars]
        if not shared:
            raise ValueError(
                "optional pattern shares no variable with the required "
                f"patterns: {pat_vars}"
            )
        new_vars = [v for v in pat_vars if v not in acc_vars]
        if kind == "single":
            pat_binds = _pattern_bindings(_scan(bound), bound,
                                          variables)
            if ofilters:
                # sound as a pre-filter: the subset requires vars(F)
                # to be bound by THIS optional pattern, and SPARQL's
                # leftjoin(A, B, F) equals leftjoin(A, filter(F, B))
                # when F mentions only B's variables (shared ones
                # included — compatible rows agree on them)
                try:
                    omask = _compile_filters(ofilters, set(pat_vars))
                except ValueError as e:
                    raise ValueError(
                        "OPTIONAL-scoped filters may reference only "
                        f"the optional pattern's own variables "
                        f"{pat_vars}: {e}"
                    )
                pat_binds = pat_binds.map_batches(
                    lambda t, om=omask: t.filter(om(t)),
                    batch_format="pyarrow",
                )
            pat_binds = pat_binds.materialize()
        else:
            # grouped OPTIONAL: the inner group joins FIRST (its own
            # BGP — including its scoped filters and, for ONE level of
            # nesting, its own OPTIONALs: OPTIONAL { A OPTIONAL { B } }
            # is leftjoin(outer, leftjoin(A, B)) — the recursive
            # bgp_match call computes the inner leftjoin), then ONE
            # left join of the joined inner solutions (SPARQL
            # semantics; the flattened per-pattern form would bind b's
            # variables even where a failed)
            try:
                pat_binds = bgp_match(
                    source, gpats, filters=list(ofilters),
                    optional=inner_opt,
                ).materialize()
            except ValueError as e:
                raise ValueError(f"OPTIONAL group: {e}")
        n = pat_binds.count()
        if n == 0:
            # nothing matches anywhere: every solution keeps one row
            # with nulls for the new variables
            if new_vars:
                acc = acc.map_batches(
                    lambda t, nv=tuple(new_vars): _with_null_vars(t, nv),
                    batch_format="pyarrow",
                ).materialize()
                acc_vars.extend(new_vars)
            continue
        n_parts = max(2, default_num_partitions(
            hi=32, rows=max(acc_rows, n), rows_per_partition=100_000
        ))
        left = acc.repartition(n_parts).materialize()
        right = pat_binds.repartition(n_parts).materialize()
        ren = {v: f"__r_{v}" for v in shared}
        right = right.map_batches(
            lambda t, ren=ren: t.rename_columns(
                [ren.get(c, c) for c in t.schema.names]
            ),
            batch_format="pyarrow",
        ).materialize()
        joined = left.join(
            right, join_type="left_outer", num_partitions=n_parts,
            on=tuple(shared), right_on=tuple(ren[v] for v in shared),
        )
        drop = list(ren.values())
        acc = joined.map_batches(
            lambda t, drop=drop, nv=tuple(new_vars): _with_null_vars(
                t.drop_columns([c for c in drop if c in t.schema.names]),
                nv,
            ),
            batch_format="pyarrow",
        ).materialize()
        acc_rows = acc.count()
        acc_vars.extend(new_vars)
    if acc is None:  # all patterns were ASK guards that matched
        if filters or values or parsed_binds or exists or not_exists:
            raise ValueError("filters/values/binds/exists need at "
                             "least one variable pattern")
        return rd.from_arrow(pa.table({"ask": pa.array([True])})) \
            if not out_vars else _empty()
    # BIND: append constant / copied columns so filters and select see
    # the new variables (vectorized, no shuffle)
    for nv, src in parsed_binds:
        if isinstance(src, str) and src.startswith("?"):
            acc = acc.map_batches(
                lambda t, nv=nv, s=src[1:]: t.append_column(nv, t[s]),
                batch_format="pyarrow",
            )
        else:
            acc = acc.map_batches(
                lambda t, nv=nv, c=str(src): t.append_column(
                    nv, pa.nulls(len(t), pa.string()).fill_null(c)
                ),
                batch_format="pyarrow",
            )
        acc_vars.append(nv)
    for inner_patterns, keep in (
        [(g, True) for g in exists] + [(g, False) for g in not_exists]
    ):
        acc, acc_rows = _semi_anti_join(
            source, acc, acc_vars, acc_rows, inner_patterns, keep
        )
        if acc is None:
            return _empty()
    if row_specs:
        mask_fn = _compile_filters(row_specs, acc_vars)
        acc = acc.map_batches(
            lambda t: t.filter(mask_fn(t)), batch_format="pyarrow",
        )
    if values is not None:
        acc = _apply_values(acc, _parse_values(values, acc_vars))
    out = acc.map_batches(
        lambda t: pa.table({v: t[v] for v in out_vars}),
        batch_format="pyarrow",
    )
    return _apply_modifiers(out, out_vars, distinct=distinct,
                            order_by=order_by, limit=limit,
                            offset=offset)


def bgp_construct(source, patterns, template, optional=(), filters=(),
                  binds=(), exists=(), not_exists=()):
    """SPARQL CONSTRUCT analog: instantiate a triple ``template`` once
    per solution of the BGP — the rule-driven graph-generation shape
    (Spindle generates proxy graphs from queries over source graphs;
    SURVEY §1.1).

    ``template`` is a list of 4-tuples ``(graph, subj, pred, obj)``
    or 5-tuples ``(..., obj_is_lit)``; each term is a '?var' from the
    BGP or a constant string.  ``obj_is_lit`` defaults to False (IRI
    object) — bindings carry no term kind, so literal-ness is declared
    by the template, like a rulebase entry.  Solutions with a null
    binding used by a template pattern are skipped for THAT pattern
    (SPARQL: invalid RDF terms drop the instantiated triple).

    Output is a TRIPLES_SCHEMA Dataset; instantiation is one
    vectorized map_batches over the bindings (streaming, no shuffle).
    """
    import pyarrow as pa

    from twine_ray.stages.triples import TRIPLES_SCHEMA

    if not template:
        raise ValueError("bgp_construct needs a non-empty template")
    sols = bgp_match(source, patterns, optional=optional,
                    filters=filters, binds=binds, exists=exists,
                    not_exists=not_exists)
    known = set(sols.schema().names)
    parsed_tpl = []
    for entry in template:
        if len(entry) == 4:
            entry = tuple(entry) + (False,)
        if len(entry) != 5:
            raise ValueError(
                f"template entry needs 4 terms (+ optional obj_is_lit "
                f"flag): {entry!r}"
            )
        *terms, is_lit = entry
        for t in terms:
            if t is None:
                raise ValueError(
                    f"template terms must be constants or ?vars, not "
                    f"None: {entry!r}"
                )
            if isinstance(t, str) and t.startswith("?") \
                    and t[1:] not in known:
                raise ValueError(f"template references unbound "
                                 f"variable: {t}")
        parsed_tpl.append((tuple(terms), bool(is_lit)))

    def _instantiate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(t)
        parts = []
        for terms, is_lit in parsed_tpl:
            cols = {}
            valid = None
            for name, term in zip(("graph", "subj", "pred", "obj"),
                                  terms):
                if term.startswith("?"):
                    col = t[term[1:]]
                    v = pc.is_valid(col)
                    valid = v if valid is None else pc.and_(valid, v)
                    cols[name] = col
                else:
                    cols[name] = pa.nulls(n, pa.string()).fill_null(term)
            part = pa.table({
                **cols,
                "obj_is_lit": pa.nulls(n, pa.bool_()).fill_null(is_lit),
                "obj_dt": pa.nulls(n, pa.string()).fill_null(""),
                "obj_lang": pa.nulls(n, pa.string()).fill_null(""),
                "score": pa.nulls(n, pa.int32()).fill_null(0),
            }).cast(TRIPLES_SCHEMA)
            if valid is not None:
                part = part.filter(valid)
            parts.append(part)
        return pa.concat_tables(parts)

    return sols.map_batches(_instantiate, batch_format="pyarrow")


_AGG_OPS = ("count", "count_var", "min", "max")


def bgp_aggregate(source, patterns, group_vars, aggs, optional=(),
                  filters=(), binds=(), exists=(), not_exists=()):
    """SPARQL SELECT-with-GROUP-BY analog: aggregate the solutions of
    a BGP.  ``group_vars`` names the grouping variables; ``aggs`` maps
    output column -> ``("count",)`` (solutions per group),
    ``("count_var", var)`` (non-null bindings of ``var`` — how SPARQL
    COUNT(?v) treats unmatched OPTIONALs), or ``("min"|"max", var)``
    (lexicographic extreme of the term strings).

    Scale shape: per-batch partial aggregation first, so only
    (groups x aggregates) partial rows enter the ONE bucketed exchange
    — the combiner pattern every wide groupby here uses."""
    import pandas as pd

    from twine_ray.stages.grouped import bucketed_group_reduce

    group_vars = [v.lstrip("?") for v in group_vars]
    if not group_vars:
        raise ValueError("bgp_aggregate needs at least one group var")
    specs = []
    for out_col, spec in aggs.items():
        op, *rest = spec
        if op not in _AGG_OPS:
            raise ValueError(f"unknown agg op {op!r} (one of {_AGG_OPS})")
        var = rest[0].lstrip("?") if rest else None
        if op != "count" and var is None:
            raise ValueError(f"{op} needs a variable")
        specs.append((out_col, op, var))

    sols = bgp_match(source, patterns, optional=optional,
                    filters=filters, binds=binds, exists=exists,
                    not_exists=not_exists)
    known = set(sols.schema().names)
    needed = set(group_vars) | {v for _, _, v in specs if v}
    missing = sorted(needed - known)
    if missing:
        raise ValueError(f"aggregate references unbound variables: "
                         f"{missing}")

    minmax_vars = {v for _, op, v in specs if op in ("min", "max")}
    minmax_cols = {c for c, op, _ in specs if op in ("min", "max")}

    def _to_partial(df: pd.DataFrame) -> pd.DataFrame:
        # nullable string dtype: object columns mixing str and NaN
        # (unmatched OPTIONALs) break pandas groupby min/max
        for v in minmax_vars:
            df = df.assign(**{v: df[v].astype("string")})
        g = df.groupby(group_vars, sort=False, dropna=False)
        cols = {}
        for out_col, op, var in specs:
            if op == "count":
                cols[out_col] = g.size()
            elif op == "count_var":
                cols[out_col] = g[var].count()
            elif op == "min":
                cols[out_col] = g[var].min()
            else:
                cols[out_col] = g[var].max()
        out = pd.DataFrame(cols).reset_index()
        for out_col, op, _ in specs:
            if op in ("count", "count_var"):
                out[out_col] = out[out_col].astype("int64")
        return out

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        for c in minmax_cols:
            df = df.assign(**{c: df[c].astype("string")})
        g = df.groupby(group_vars, sort=False, dropna=False)
        cols = {}
        for out_col, op, _ in specs:
            if op in ("count", "count_var"):
                cols[out_col] = g[out_col].sum().astype("int64")
            elif op == "min":
                cols[out_col] = g[out_col].min()
            else:
                cols[out_col] = g[out_col].max()
        return pd.DataFrame(cols).reset_index()

    return bucketed_group_reduce(
        sols.map_batches(_to_partial, batch_format="pandas"),
        group_vars, _merge,
    )


def bgp_union(source, groups, select: list[str] | None = None):
    """SPARQL UNION analog: bag union of the solutions of several BGP
    groups over one source.  Each group is a dict accepted by
    ``bgp_match`` (``patterns`` required; ``optional`` / ``filters``
    optional).  Output columns are the union of every group's
    variables; a group that does not bind a variable contributes nulls
    for it (SPARQL UNION semantics).  The branches stream — the union
    is a zero-copy block concatenation, no shuffle."""
    import ray.data as rd  # noqa: F401  (parity with bgp_match imports)

    if not groups:
        raise ValueError("bgp_union needs at least one group")
    results = [
        bgp_match(source, g["patterns"], optional=g.get("optional", ()),
                  filters=g.get("filters", ()),
                  binds=g.get("binds", ()), exists=g.get("exists", ()),
                  not_exists=g.get("not_exists", ()))
        for g in groups
    ]
    all_vars: list[str] = []
    for r in results:
        for v in r.schema().names:
            if v not in all_vars:
                all_vars.append(v)
    out_vars = all_vars if select is None else list(select)
    unknown = [v for v in out_vars if v not in all_vars]
    if unknown:
        raise ValueError(f"select names unbound variables: {unknown}")

    def _align(t, ov=tuple(out_vars)):
        import pyarrow as pa

        t = _with_null_vars(t, ov)
        return pa.table({v: t[v] for v in ov})

    aligned = [
        r.map_batches(_align, batch_format="pyarrow") for r in results
    ]
    out = aligned[0]
    for r in aligned[1:]:
        out = out.union(r)
    return out


def bgp_ask(source, patterns, optional=(), filters=(), values=None,
            binds=(), exists=(), not_exists=()):
    """SPARQL ASK analog: does at least one solution exist?  Returns a
    one-row Dataset ``{ask: bool}``.  The probe is ``limit(1)`` over
    the lazy solution stream — the streaming executor stops pulling
    blocks once one row lands, so a match on an early block never
    scans the store."""
    import pyarrow as pa
    import ray.data as rd

    sols = bgp_match(source, patterns, optional=optional,
                    filters=filters, values=values, binds=binds,
                    exists=exists, not_exists=not_exists)
    # all-ASK-guard patterns yield a 1-row {ask: True} on match and a
    # zero-column empty table otherwise; variable patterns yield
    # solutions — in both cases "any row" is the answer
    n = sols.limit(1).count()
    return rd.from_arrow(pa.table({"ask": pa.array([n > 0])}))


def bgp_minus(source, patterns, minus, optional=(), filters=(),
              binds=(), exists=(), not_exists=(),
              select: list[str] | None = None):
    """SPARQL MINUS analog: remove solutions compatible with some
    solution of the ``minus`` pattern group on their SHARED variables.
    Per the SPARQL spec, disjoint domains remove nothing (the result
    is the left side unchanged); a null (unmatched-OPTIONAL) shared
    binding never matches a minus row, so such solutions survive —
    hash-join semantics and SPARQL compatibility agree there.

    Scale shape: the minus side is projected to the shared variables
    and deduplicated (bucketed exchange), then one distributed
    left-outer hash join marks compatible solutions and a vectorized
    filter drops them — no driver-side state."""
    import pyarrow as pa

    from twine_ray.stages.grouped import (
        bucketed_group_reduce,
        default_num_partitions,
    )

    acc = bgp_match(source, patterns, optional=optional,
                    filters=filters, binds=binds, exists=exists,
                    not_exists=not_exists)
    acc_vars = list(acc.schema().names)
    m = bgp_match(source, minus)
    shared = [v for v in acc_vars if v in m.schema().names]
    out_vars = acc_vars if select is None else [
        v.lstrip("?") for v in select
    ]
    unknown = [v for v in out_vars if v not in acc_vars]
    if unknown:
        raise ValueError(f"select names unbound variables: {unknown}")

    def _project(t: pa.Table) -> pa.Table:
        return pa.table({v: t[v] for v in out_vars})

    if not shared:  # disjoint domains: MINUS removes nothing
        return acc.map_batches(_project, batch_format="pyarrow")

    ren = {v: f"__m_{v}" for v in shared}
    mk = bucketed_group_reduce(
        m.map_batches(
            lambda t: pa.table({ren[v]: t[v] for v in shared}),
            batch_format="pyarrow",
        ),
        list(ren.values()),
        lambda df: df.drop_duplicates(),
    ).map_batches(
        lambda df: df.assign(__m=1), batch_format="pandas"
    ).materialize()
    n_m = mk.count()
    if n_m == 0:
        return acc.map_batches(_project, batch_format="pyarrow")
    left = acc.materialize()
    n_parts = max(2, default_num_partitions(
        hi=32, rows=max(left.count(), n_m), rows_per_partition=100_000
    ))
    joined = left.repartition(n_parts).materialize().join(
        mk.repartition(n_parts).materialize(),
        join_type="left_outer", num_partitions=n_parts,
        on=tuple(shared), right_on=tuple(ren[v] for v in shared),
    )

    def _keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_null(t["__m"]))
        return _project(t)

    return joined.map_batches(_keep, batch_format="pyarrow")


def describe_resource(source, iri: str, preds=None,
                      bnode_depth: int = 8):
    """SPARQL DESCRIBE analog — a CONCISE BOUNDED DESCRIPTION: every
    store triple where the resource is the subject, the transitive
    closure over BLANK-NODE-valued objects (``_:`` prefixed IRI-kind
    terms — Turtle property lists put these in the store; each bnode's
    OWN properties belong to the resource's description), plus every
    triple pointing AT the resource (object position, IRIs only).
    ``preds`` optionally restricts the predicate set of the RESOURCE's
    direct triples (the predicate-scoped profile Spindle's entity
    lookups return — the closure then walks only from the kept
    triples; a bnode's own properties are never pred-filtered, they
    are part of the value being described).

    Over a store directory every scan is bound-term pruned
    (``match_triples`` pushes subj equality / IN-SET into Parquet
    row-group statistics).  The bnode frontier is collected
    driver-side per level — bounded: an entity description's bnode
    tree is small by contract, and ``bnode_depth`` caps the walk.  No
    shuffle — the store is exact-deduplicated at materialize time and
    the scans are disjoint (bnode subjects are never ``iri``; the
    object scan excludes subj matches)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    pred_arr = (
        pa.array(sorted(preds), type=pa.string())
        if preds is not None else None
    )

    def _pred_mask(t: pa.Table, base):
        if pred_arr is None:
            return base
        return pc.and_(base, pc.is_in(t["pred"], value_set=pred_arr))

    def _subj_scan(subjects, apply_preds: bool):
        """Triples whose subj is in ``subjects`` (pruned over a store
        dir via the IN-SET pushdown), materialized — each frontier is
        consumed twice (bnode extraction + output union)."""
        subs = tuple(sorted(subjects))
        if isinstance(source, str):
            ds = match_triples(
                source, subj=subs[0] if len(subs) == 1 else subs
            )
        else:
            ds = source
        sub_arr = pa.array(subs, type=pa.string())

        def _fn(t: pa.Table) -> pa.Table:
            m = pc.is_in(t["subj"], value_set=sub_arr)
            if apply_preds:
                m = _pred_mask(t, m)
            return t.filter(m)

        return ds.map_batches(_fn, batch_format="pyarrow").materialize()

    def _bnode_objs(ds) -> set[str]:
        rows = ds.map_batches(
            lambda t: pa.table({
                "obj": t.filter(pc.and_(
                    pc.invert(t["obj_is_lit"]),
                    pc.starts_with(t["obj"], "_:"),
                ))["obj"],
            }),
            batch_format="pyarrow",
        ).take_all()  # bounded: bnode fanout of one description
        return {r["obj"] for r in rows}

    out = _subj_scan([iri], True)
    visited = {iri}
    frontier = out
    for _ in range(bnode_depth):
        new = _bnode_objs(frontier) - visited
        if not new:
            break
        visited |= new
        frontier = _subj_scan(sorted(new), False)
        out = out.union(frontier)

    if isinstance(source, str):
        obj_ds = match_triples(source, obj=iri)
    else:
        obj_ds = source

    def _obj_side(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.equal(t["obj"], iri),
                    pc.invert(t["obj_is_lit"])),
            pc.invert(pc.equal(t["subj"], iri)),
        )
        return t.filter(_pred_mask(t, m))

    return out.union(
        obj_ds.map_batches(_obj_side, batch_format="pyarrow")
    )
