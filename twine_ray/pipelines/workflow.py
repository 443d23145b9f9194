"""User-extension surface (SURVEY.md §2.10): Stage registry + config-
ordered workflow chain.

Twine's identity is its plugin API: processors register by name/MIME in
``twine_plugin_init`` (``twine:libtwine/plugin.c``) and the engine runs
the config-ordered chain ``[twine] workflow=sparql-get,spindle-strip,
spindle-correlate,sparql-put`` (``twine:libtwine/workflow.c``).

Here the same shape is Python entry points instead of dlopen: a Stage
is ``(name, apply(ds, ctx) -> ds)``; ``STAGES`` is the registry;
``run_workflow`` executes an ordered stage list from a config dict or
TOML file.  Users extend by calling ``register_stage`` before building.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any


@dataclass
class WorkflowContext:
    """Shared read-only state handed to every stage (rulebase, alias
    dict, knobs) — the analog of Twine's plugin-visible config."""

    alias_rows: list[dict] = field(default_factory=list)
    rulebase: Any = None
    num_buckets: int = 32
    concurrency: int | tuple = 4
    out_dir: str | None = None
    extras: dict[str, Any] = field(default_factory=dict)


StageFn = Callable[[Any, WorkflowContext], Any]

STAGES: dict[str, StageFn] = {}


def register_stage(name: str, fn: StageFn) -> None:
    """``twine_plugin_add_processor`` analog: register by name."""
    STAGES[name] = fn


def _builtin_stages() -> None:
    from twine_ray.pipelines.kg import sameas_edges
    from twine_ray.stages.canon import connected_components
    from twine_ray.stages.extract import extract_text, latest_page_wins
    from twine_ray.stages.materialize import materialize_triples
    from twine_ray.stages.mentions import detect_mentions
    from twine_ray.stages.resolve import (
        resolve_and_dedup,
        rewrite_canon,
        strip_predicates,
    )
    from twine_ray.stages.triples import extract_triples
    from twine_ray.state.rulebase import DEFAULT_RULEBASE

    register_stage("extract", lambda ds, ctx: extract_text(ds))
    register_stage("dedup-pages", lambda ds, ctx: latest_page_wins(ds))
    register_stage(
        "mentions",
        lambda ds, ctx: detect_mentions(
            ds, ctx.alias_rows, concurrency=ctx.concurrency
        ),
    )
    register_stage(
        "triples",
        lambda ds, ctx: extract_triples(
            ds, ctx.alias_rows, concurrency=ctx.concurrency
        ),
    )
    register_stage(
        "strip",
        lambda ds, ctx: strip_predicates(
            ds, ctx.rulebase or DEFAULT_RULEBASE
        ),
    )

    def _canonicalize(ds, ctx):
        # wide step: needs the raw triples twice (edges + rewrite)
        pinned = ds.materialize()
        canon_rows = connected_components(sameas_edges(pinned)).take_all()
        ctx.extras["canon_rows"] = canon_rows
        return rewrite_canon(pinned, canon_rows)

    register_stage("canonicalize", _canonicalize)
    register_stage(
        "resolve",
        lambda ds, ctx: resolve_and_dedup(
            ds, ctx.rulebase or DEFAULT_RULEBASE
        ),
    )

    def _materialize(ds, ctx):
        if ctx.out_dir is None:
            return ds
        ctx.extras["materialize_result"] = materialize_triples(
            ds, ctx.out_dir, num_buckets=ctx.num_buckets
        )
        return ds

    register_stage("materialize", _materialize)


_builtin_stages()


def _reference_aliases() -> None:
    """Map the reference's own workflow stage names (the
    ``[twine] workflow=sparql-get,spindle-strip,spindle-correlate,
    spindle-generate,sparql-put`` chain of ``twine:libtwine/
    workflow.c`` / spindle's plugins) onto this engine's stages, so a
    migrated twine.conf keeps working:

    - ``sparql-get``: fetching the graph's prior state is implicit in
      batch mode (latest-wins dedup replaces the old-state diff on the
      write path; incremental mode diffs via signatures) — alias of
      ``dedup-pages``.
    - ``spindle-strip``  -> ``strip`` (rulebase predicate whitelist)
    - ``spindle-correlate`` -> ``canonicalize`` (coreference closure)
    - ``spindle-generate``  -> ``resolve`` (property resolution into
      proxy graphs)
    - ``sparql-put`` -> ``materialize`` (idempotent bucket replace)
    """
    for ref, ours in (
        ("sparql-get", "dedup-pages"),
        ("spindle-strip", "strip"),
        ("spindle-correlate", "canonicalize"),
        ("spindle-generate", "resolve"),
        ("sparql-put", "materialize"),
    ):
        STAGES[ref] = STAGES[ours]


_reference_aliases()

# The default chain — the twine.conf workflow= analog.
DEFAULT_WORKFLOW = [
    "extract", "dedup-pages", "triples", "strip", "canonicalize", "resolve",
]


def run_workflow(pages_ds, stage_names: list[str] | None = None,
                 ctx: WorkflowContext | None = None):
    """Run the config-ordered stage chain over a pages Dataset."""
    ctx = ctx or WorkflowContext()
    ds = pages_ds
    for name in stage_names or DEFAULT_WORKFLOW:
        try:
            fn = STAGES[name]
        except KeyError:
            raise KeyError(
                f"unknown stage {name!r}; registered: {sorted(STAGES)}"
            ) from None
        ds = fn(ds, ctx)
    return ds


def load_workflow_config(path: str) -> tuple[list[str], dict]:
    """Parse a TOML config file:

        [twine_ray]
        workflow = ["extract", "dedup-pages", "triples", ...]

        [twine_ray.options]
        num_buckets = 32

        # the twine.conf `[xslt:<mime>]` analog — declarative XML
        # extraction rules registered straight from config (inline, or
        # rules = "<path.toml>" relative to this file)
        [xslt."application/rss+xml"]
        rules = "rss_rules.toml"

        [xslt."application/atom+xml".subject]
        path = "id"
        [[xslt."application/atom+xml".fields]]
        path = ".//entry/title"
        pred = "http://purl.org/dc/terms/title"
    """
    import os
    import tomllib

    with open(path, "rb") as f:
        cfg = tomllib.load(f)

    for mime, spec in cfg.get("xslt", {}).items():
        from twine_ray.pipelines.xmlrules import register_xml_type

        if isinstance(spec, dict) and isinstance(spec.get("rules"), str):
            rule_path = spec["rules"]
            if not os.path.isabs(rule_path):
                rule_path = os.path.join(os.path.dirname(path), rule_path)
            register_xml_type(mime, open(rule_path).read())
        else:
            register_xml_type(mime, spec)

    section = cfg.get("twine_ray", {})
    return (
        section.get("workflow", DEFAULT_WORKFLOW),
        section.get("options", {}),
    )
