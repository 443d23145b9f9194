"""§2.10: workflow chain == flagship pipeline; custom stage injection."""

from __future__ import annotations

from tests.kg_oracle import (
    expected_triples,
    precision_recall,
    triples_df_to_set,
)
from twine_ray.pipelines.workflow import (
    DEFAULT_WORKFLOW,
    WorkflowContext,
    register_stage,
    run_workflow,
)
from twine_ray.sources.pages import alias_dict_table, pages_table
from twine_ray.sources.world import synth_pages


def test_default_workflow_matches_truth(ray_session):
    import ray.data as rd

    rows, truths = synth_pages(40, seed=42, n_entities=24)
    pages = rd.from_arrow(pages_table(rows))
    ctx = WorkflowContext(
        alias_rows=alias_dict_table(n_entities=24).to_pylist(),
        concurrency=2,
    )
    out = run_workflow(pages, DEFAULT_WORKFLOW, ctx).to_pandas()
    p, r = precision_recall(triples_df_to_set(out), expected_triples(truths))
    assert p >= 0.95 and r >= 0.95
    assert "canon_rows" in ctx.extras  # canonicalize stage published state


def test_custom_stage_registration(ray_session):
    import pyarrow as pa
    import ray.data as rd

    def only_english(ds, ctx):
        import pyarrow.compute as pc

        return ds.map_batches(
            lambda t: t.filter(pc.equal(t["lang"], "en")),
            batch_format="pyarrow",
        )

    register_stage("only-english", only_english)
    rows, _ = synth_pages(20, seed=42, n_entities=24)
    pages = rd.from_arrow(pages_table(rows))
    ctx = WorkflowContext(
        alias_rows=alias_dict_table(n_entities=24).to_pylist(),
        concurrency=2,
    )
    out = run_workflow(
        pages, ["only-english", "extract", "dedup-pages"], ctx
    ).to_pandas()
    assert (out["lang"] == "en").all()
    assert len(out) > 0


def test_unknown_stage_raises(ray_session):
    import ray.data as rd

    rows, _ = synth_pages(4, seed=42, n_entities=24)
    pages = rd.from_arrow(pages_table(rows))
    try:
        run_workflow(pages, ["no-such-stage"], WorkflowContext())
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "no-such-stage" in str(e)


def test_toml_config(tmp_path):
    from twine_ray.pipelines.workflow import load_workflow_config

    p = tmp_path / "wf.toml"
    p.write_text(
        '[twine_ray]\nworkflow = ["extract", "dedup-pages"]\n'
        "[twine_ray.options]\nnum_buckets = 8\n"
    )
    stages, opts = load_workflow_config(str(p))
    assert stages == ["extract", "dedup-pages"]
    assert opts["num_buckets"] == 8


def test_reference_stage_name_aliases(ray_session):
    """A migrated twine.conf workflow chain (`sparql-get,spindle-strip,
    spindle-correlate,spindle-generate`) runs against this engine's
    stages and equals the native-name chain."""
    import pandas as pd
    import ray.data as rd

    from twine_ray.pipelines.kg import default_alias_rows
    from twine_ray.pipelines.workflow import WorkflowContext, run_workflow
    from twine_ray.sources.pages import pages_table
    from twine_ray.sources.world import synth_pages

    rows, _ = synth_pages(16, seed=5, n_entities=40)
    ctx = WorkflowContext(alias_rows=default_alias_rows(n_entities=40),
                          concurrency=2)
    ref = run_workflow(
        rd.from_arrow(pages_table(rows)),
        ["extract", "sparql-get", "triples", "spindle-strip",
         "spindle-correlate", "spindle-generate"],
        ctx,
    ).to_pandas()
    ours = run_workflow(
        rd.from_arrow(pages_table(rows)),
        ["extract", "dedup-pages", "triples", "strip",
         "canonicalize", "resolve"],
        WorkflowContext(alias_rows=default_alias_rows(n_entities=40),
                        concurrency=2),
    ).to_pandas()
    key = lambda df: set(map(tuple, df[sorted(df.columns)]
                             .itertuples(index=False, name=None)))
    assert key(ref) == key(ours) and len(ref) > 0
