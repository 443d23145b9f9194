"""M4 MIME dispatch + M8 literal normalization."""

from __future__ import annotations

from twine_ray.stages.literals import (
    canon_datetime,
    canon_decimal,
    canon_integer,
)


def test_canon_integer():
    assert canon_integer("007") == "7"
    assert canon_integer("+5") == "5"
    assert canon_integer("-0") == "0"
    assert canon_integer("-42") == "-42"
    assert canon_integer("1.5") == "1.5"  # not an integer → untouched
    assert canon_integer("abc") == "abc"


def test_canon_decimal():
    assert canon_decimal("1.50") == "1.5"
    assert canon_decimal(".5") == "0.5"
    assert canon_decimal("3") == "3.0"
    assert canon_decimal("+07.10") == "7.1"
    assert canon_decimal("-0.0") == "0.0"
    assert canon_decimal("x") == "x"


def test_canon_datetime():
    assert canon_datetime("2024-01-02 03:04:05") == "2024-01-02T03:04:05"
    assert canon_datetime("2024-01-02T03:04:05.500") == \
        "2024-01-02T03:04:05.5"
    assert canon_datetime("2024-01-02T03:04:05+00:00") == \
        "2024-01-02T03:04:05Z"
    assert canon_datetime("2024-01-02T03:04:05+02:00") == \
        "2024-01-02T03:04:05+02:00"
    assert canon_datetime("not a date") == "not a date"


def test_normalize_literals_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.stages.literals import XSD_INTEGER, normalize_literals
    from twine_ray.stages.triples import TRIPLES_SCHEMA

    rows = [
        {"graph": "g", "subj": "s", "pred": "p", "obj": "007",
         "obj_is_lit": True, "obj_dt": XSD_INTEGER, "obj_lang": "",
         "score": 1},
        {"graph": "g", "subj": "s", "pred": "p2", "obj": "Bonjour",
         "obj_is_lit": True, "obj_dt": "", "obj_lang": "FR", "score": 1},
        {"graph": "g", "subj": "s", "pred": "p3", "obj": "http://o",
         "obj_is_lit": False, "obj_dt": "", "obj_lang": "", "score": 1},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA))
    out = normalize_literals(ds).to_pandas().set_index("pred")
    assert out.loc["p", "obj"] == "7"
    assert out.loc["p2", "obj_lang"] == "fr"
    assert out.loc["p3", "obj"] == "http://o"  # URI untouched


def test_dispatch_routes_by_mime(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.pipelines.dispatch import (
        MESSAGES_SCHEMA,
        dispatch_messages,
    )
    from twine_ray.pipelines.kg import default_alias_rows
    from twine_ray.state.rulebase import DC_TITLE

    msgs = [
        {
            "uri": "http://ex.org/page1",
            "content_type": "text/html",
            "payload": b"<html><head><title>Page One</title></head>"
                       b"<body><p>Alder Analytics announced a new "
                       b"initiative this quarter.</p></body></html>",
        },
        {
            "uri": "http://ex.org/dump1",
            "content_type": "application/n-quads",
            "payload": b'<http://a> <http://p> "v" <http://g9> .\n',
        },
        {
            "uri": "http://ex.org/turtle1",
            "content_type": "text/turtle",
            "payload": b"@prefix ex: <http://ex.org/> .\n"
                       b'ex:thing ex:label "A Turtle Thing"@en .\n',
        },
        {
            "uri": "http://ex.org/turtle-bad",
            "content_type": "text/turtle",
            "payload": b"this is not turtle at all (",
        },
        {
            "uri": "http://ex.org/unknown",
            "content_type": "application/x-mystery",
            "payload": b"????",
        },
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(msgs, schema=MESSAGES_SCHEMA))
    triples, counts = dispatch_messages(
        ds, {"alias_rows": default_alias_rows(n_entities=24)}
    )
    df = triples.to_pandas()
    assert counts["text/html"] == 1
    assert counts["application/n-quads"] == 1
    assert counts["text/turtle"] == 1
    assert counts["application/x-mystery"] == -1  # dropped
    # turtle message parsed (graph = message uri); malformed one skipped
    turt = df[df["graph"] == "http://ex.org/turtle1"]
    assert list(turt["obj"]) == ["A Turtle Thing"]
    assert list(turt["obj_lang"]) == ["en"]
    assert not (df["graph"] == "http://ex.org/turtle-bad").any()
    assert (df["graph"] == "http://g9").any()  # quad context respected
    titles = df[df["pred"] == DC_TITLE]
    assert list(titles["obj"]) == ["Page One"]


def test_dispatch_wildcard_fallback(ray_session):
    """`type/*` processors catch subtypes with no exact registration
    (twine_plugin_locate order: exact first, then wildcard)."""
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.pipelines import dispatch as dp
    from twine_ray.stages.triples import TRIPLES_SCHEMA

    def _wild(messages_ds, ctx):
        def _f(batch: pa.Table) -> pa.Table:
            rows = [
                {"graph": uri, "subj": uri, "pred": "http://p/wild",
                 "obj": (payload or b"").decode(), "obj_is_lit": True,
                 "obj_dt": "", "obj_lang": "", "score": 0}
                for uri, payload in zip(batch["uri"].to_pylist(),
                                        batch["payload"].to_pylist())
            ]
            return pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA)

        return messages_ds.map_batches(_f, batch_format="pyarrow")

    dp.register_processor("application/*", _wild)
    try:
        msgs = [
            {"uri": "http://m/1", "content_type": "application/x-custom",
             "payload": b"wildcarded"},
            # exact registration still wins over the wildcard
            {"uri": "http://m/2", "content_type": "application/n-triples",
             "payload": b'<http://a> <http://b> "exact" .'},
        ]
        ds = rd.from_arrow(
            pa.Table.from_pylist(msgs, schema=dp.MESSAGES_SCHEMA)
        )
        triples, counts = dp.dispatch_messages(ds, {})
        df = triples.to_pandas()
        assert counts["application/x-custom"] == 1
        assert "wildcarded" in set(df["obj"])
        exact = df[df["pred"] == "http://b"]
        assert list(exact["obj"]) == ["exact"]
    finally:
        dp.PROCESSORS.pop("application/*", None)
