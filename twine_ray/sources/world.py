"""Deterministic synthetic web-page world (FIXTURES.md T1–T4).

Replaces the reference's ingest side — the AMQP message stream
(``twine:libmq``) fed by the Anansi crawl cache (``twine:plug-ins/s3.c``)
— with a seed-fixed generator of the ``input_hint`` pages table:

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Every artifact (entities, aliases, coreference clusters, page sentences,
HTML variants) is a pure function of ``(seed, index)``, so the corpus is
byte-identical regardless of where or in what order batches are
generated — the property the whole byte-identical-text invariant test
hangs on.

The generator also returns per-page GROUND TRUTH (mentions, association
pairs, sameAs assertions) so tests can compute expected triples
independently of the pipeline (naive DSU oracle, FIXTURES.md T3/T4).
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass, field

from twine_ray.functions.html_text import html_to_text
from twine_ray.functions.ids import bucket_of
from twine_ray.functions.textnorm import norm_alias

WORLD_SEED = 42

_WORDS_A = (
    "Alder Basalt Cedar Delta Ember Falcon Granite Harbor Iris Juniper "
    "Krypton Lumen Maple Nimbus Obsidian Pioneer Quartz Raven Summit Tundra "
    "Umber Vertex Willow Xenon Yarrow Zephyr"
).split()
_WORDS_B = (
    "Analytics Collective Dynamics Enterprises Foundry Group Holdings "
    "Industries Laboratories Logistics Networks Partners Research Society "
    "Studios Syndicate Systems Technologies Ventures Works"
).split()

_FILLER_EN = (
    "The weather remained calm throughout the week.",
    "Markets closed slightly higher after a quiet session.",
    "Local officials announced the schedule for the annual fair.",
    "The committee will publish its findings next month.",
    "Visitors praised the café near the old harbor.",
    "A new exhibition opened to considerable public interest.",
)
_FILLER_DE = (
    "Das Wetter blieb die ganze Woche ruhig und mild.",
    "Die Behörden haben den Zeitplan für das Fest veröffentlicht.",
    "Der Ausschuss wird seine Ergebnisse im nächsten Monat vorlegen.",
    "Eine neue Ausstellung stieß auf großes Interesse.",
)

ALIAS_SHARDS = 64


@dataclass
class Entity:
    idx: int
    key: str
    aliases: list[str]  # surface forms as they appear in text
    priors: list[float]


@dataclass
class World:
    """The entity/alias/coreference universe, pure function of the seed."""

    seed: int
    entities: list[Entity]
    # alias_norm -> list[(entity_key, prior)] (ambiguity allowed)
    alias_map: dict[str, list[tuple[str, float]]] = field(default_factory=dict)
    # sameAs ground-truth edge list over entity keys (asserted in pages)
    coref_edges: list[tuple[str, str]] = field(default_factory=list)


def entity_key(i: int) -> str:
    return f"http://ent.example/e{i:05d}"


def make_world(n_entities: int = 200, seed: int = WORLD_SEED) -> World:
    """Build the deterministic entity universe.

    - entity i has a unique two-word name; ~40% get a second alias
      ("<name> Group" suffix or the first word alone when unique).
    - crafted cases: an ambiguous alias shared by two entities (priors
      differ → linking is still deterministic) and an overlapping
      surface pair ("New Harbor" / "New Harbor City") for longest-match.
    - coreference clusters: entities are grouped in blocks of 4
      (cluster c = {4c..4c+3} ∩ range(n)); the asserted edge set is a
      chain within each cluster, so components only close when the last
      edge's page is processed (FIXTURES.md F5).
    """
    rng = random.Random(f"{seed}:world")
    entities: list[Entity] = []
    used_names: set[str] = set()
    pairs = [(a, b) for a in _WORDS_A for b in _WORDS_B]
    rng.shuffle(pairs)
    for i in range(n_entities):
        a, b = pairs[i]
        name = f"{a} {b}"
        assert name not in used_names
        used_names.add(name)
        aliases = [name]
        priors = [0.9]
        if i % 5 in (0, 2):
            aliases.append(f"{name} International")
            priors.append(0.7)
        entities.append(Entity(i, entity_key(i), aliases, priors))

    # crafted ambiguity: one surface, two entities, distinct priors
    if n_entities >= 8:
        entities[3].aliases.append("Orion Collective")
        entities[3].priors.append(0.8)
        entities[7].aliases.append("Orion Collective")
        entities[7].priors.append(0.4)
    # crafted overlap for longest-match
    if n_entities >= 13:
        entities[11].aliases.append("New Harbor")
        entities[11].priors.append(0.85)
        entities[12].aliases.append("New Harbor City")
        entities[12].priors.append(0.85)

    world = World(seed=seed, entities=entities)
    for e in entities:
        for alias, prior in zip(e.aliases, e.priors):
            world.alias_map.setdefault(norm_alias(alias), []).append(
                (e.key, prior)
            )

    # coreference chains within blocks of 4
    for c0 in range(0, n_entities, 4):
        block = [entity_key(i) for i in range(c0, min(c0 + 4, n_entities))]
        for a, b in zip(block, block[1:]):
            world.coref_edges.append((a, b))
    return world


def resolve_alias(world_alias_map: dict, surface: str) -> tuple[str, float] | None:
    """The linking rule shared by the linker stage and ground truth:
    highest prior wins; ties break on lexicographic-min entity key."""
    cands = world_alias_map.get(norm_alias(surface))
    if not cands:
        return None
    return min(cands, key=lambda kp: (-kp[1], kp[0]))


def alias_dict_rows(world: World) -> list[dict]:
    """FIXTURES.md T2 table rows: alias_norm, entity_key, prior, shard."""
    rows = []
    for alias_norm in sorted(world.alias_map):
        for key, prior in sorted(world.alias_map[alias_norm]):
            rows.append(
                {
                    "alias_norm": alias_norm,
                    "entity_key": key,
                    "prior": float(prior),
                    "shard": bucket_of(alias_norm, ALIAS_SHARDS),
                }
            )
    return rows


# ---------------------------------------------------------------------------
# Page generation
# ---------------------------------------------------------------------------

_EPOCH = dt.datetime(2024, 1, 1)


@dataclass
class PageTruth:
    """Ground truth recorded while generating one page."""

    url: str  # normalized graph URI
    title: str
    lang: str
    warc_ts: dt.datetime
    mention_keys: list[str]  # linked entity keys, in order of appearance
    assoc_pairs: list[tuple[str, str]]  # (entity_key, entity_key)
    sameas_pairs: list[tuple[str, str]]  # (entity_key, entity_key)


def _pick_entity(rng: random.Random, world: World) -> Entity:
    # F6 skew: the head entity appears in ~20% of draws
    if rng.random() < 0.2:
        return world.entities[0]
    return world.entities[rng.randrange(len(world.entities))]


def _surface(rng: random.Random, e: Entity) -> str:
    return e.aliases[rng.randrange(len(e.aliases))]


def build_page(
    world: World,
    page_id: int,
    n_pages: int,
    edges_for_page: list[tuple[str, str]],
) -> tuple[dict, PageTruth]:
    """Generate one page row + its ground truth. Pure fn of (world.seed,
    page_id, edges_for_page)."""
    rng = random.Random(f"{world.seed}:page:{page_id}")
    lang = "de" if page_id % 7 == 3 else "en"
    site = page_id % 50

    # URL variants exercise normalization (M3): same canonical form.
    base = f"http://site{site}.example/page/{page_id}"
    variant = page_id % 5
    if variant == 1:
        url = f"HTTP://Site{site}.EXAMPLE:80/page/{page_id}"
    elif variant == 2:
        url = f"http://site{site}.example/page/{page_id}?ref=%41"
    else:
        url = base
    norm = base if variant != 2 else f"{base}?ref=A"

    title = f"Report {page_id} from Site {site}"
    warc_ts = _EPOCH + dt.timedelta(seconds=(page_id * 137) % 10_000_000)

    sentences: list[str] = []
    truth = PageTruth(
        url=norm, title=title, lang=lang, warc_ts=warc_ts,
        mention_keys=[], assoc_pairs=[], sameas_pairs=[],
    )

    filler = _FILLER_DE if lang == "de" else _FILLER_EN

    def note_mention(e: Entity, surface: str) -> None:
        linked = resolve_alias(world.alias_map, surface)
        if linked:
            truth.mention_keys.append(linked[0])

    for _ in range(rng.randrange(2, 6)):
        roll = rng.random()
        if roll < 0.55:
            e = _pick_entity(rng, world)
            s = _surface(rng, e)
            sentences.append(f"{s} announced a new initiative this quarter.")
            note_mention(e, s)
        elif roll < 0.8:
            e1 = _pick_entity(rng, world)
            e2 = _pick_entity(rng, world)
            if e1.key == e2.key:
                e2 = world.entities[(e1.idx + 1) % len(world.entities)]
            s1, s2 = _surface(rng, e1), _surface(rng, e2)
            sentences.append(f"{s1} was seen with {s2} at the summit.")
            l1 = resolve_alias(world.alias_map, s1)
            l2 = resolve_alias(world.alias_map, s2)
            note_mention(e1, s1)
            note_mention(e2, s2)
            if l1 and l2:
                truth.assoc_pairs.append((l1[0], l2[0]))
        else:
            sentences.append(filler[rng.randrange(len(filler))])

    # coreference assertions assigned to this page
    for a_key, b_key in edges_for_page:
        ent_a = world.entities[int(a_key.rsplit("e", 1)[1])]
        ent_b = world.entities[int(b_key.rsplit("e", 1)[1])]
        s_a, s_b = ent_a.aliases[0], ent_b.aliases[0]
        sentences.append(f"{s_a} is also known as {s_b}.")
        note_mention(ent_a, s_a)
        note_mention(ent_b, s_b)
        truth.sameas_pairs.append((ent_a.key, ent_b.key))

    html_bytes = render_html(page_id, title, lang, sentences)
    row = {
        "url": url,
        "warc_ts": warc_ts,
        "html": html_bytes,
        "text": html_to_text(html_bytes),
        "lang": lang,
    }
    return row, truth


def render_html(page_id: int, title: str, lang: str, sentences: list[str]) -> bytes:
    """HTML template with deterministic variant markup/charset
    (FIXTURES.md F2/F3)."""
    variant = page_id % 4
    paras = "".join(f"<p>{s}</p>" for s in sentences)
    if variant == 0:
        doc = (
            f'<!DOCTYPE html><html lang="{lang}"><head>'
            f'<meta charset="utf-8"><title>{title}</title></head>'
            f"<body><h1>{title}</h1>{paras}</body></html>"
        )
        return doc.encode("utf-8")
    if variant == 1:
        doc = (
            f'<html><head><meta http-equiv="Content-Type" '
            f'content="text/html; charset=iso-8859-1">'
            f"<title>{title}</title>"
            f"<style>body {{ font: serif }}</style></head>"
            f"<body><div><h1>{title}</h1></div>"
            f"<div>{paras}</div>"
            f"<script>var tracker = '<p>ignore me</p>';</script>"
            f"</body></html>"
        )
        return doc.encode("iso-8859-1", errors="replace")
    if variant == 2:
        doc = (
            f'<html><head><title>{title}</title></head><body>'
            f"<h1>{title}</h1>"
            f"<!-- navigation --><ul><li>Home</li><li>News &amp; Events</li></ul>"
            f"{paras}<template><p>unused widget</p></template>"
            f"<table><tr><td>footer&nbsp;cell</td></tr></table>"
            f"</body></html>"
        )
        return b"\xef\xbb\xbf" + doc.encode("utf-8")
    doc = (
        f"<html><body><h1>{title}</h1>"
        + "".join(f"<div><p> {s} </p></div>" for s in sentences)
        + "</body></html>"
    )
    return doc.encode("utf-8")


def edges_by_page(world: World, n_pages: int) -> dict[int, list[tuple[str, str]]]:
    """Deterministic assignment of coreference assertions to pages —
    spread out so clusters only complete after many pages (F5)."""
    out: dict[int, list[tuple[str, str]]] = {}
    for i, edge in enumerate(world.coref_edges):
        out.setdefault((i * 7) % n_pages, []).append(edge)
    return out


def synth_pages(
    n_pages: int, seed: int = WORLD_SEED, n_entities: int = 200
) -> tuple[list[dict], list[PageTruth]]:
    """Driver-side generation of a full small corpus (tests).

    Includes FIXTURES.md F7: the last two page ids are (a) a repeat of
    url 0 with a later warc_ts (latest-wins dedup) and (b) a byte-dup of
    page 1 under a fresh url.
    """
    world = make_world(n_entities=n_entities, seed=seed)
    epp = edges_by_page(world, n_pages)
    rows: list[dict] = []
    truths: list[PageTruth] = []
    for pid in range(n_pages):
        row, truth = build_page(world, pid, n_pages, epp.get(pid, []))
        rows.append(row)
        truths.append(truth)
    if n_pages >= 4:
        # F7a: same url as page 0, newer warc_ts, different content
        row0, truth0 = build_page(world, 0, n_pages, epp.get(0, []))
        row0b, truth0b = build_page(world, n_pages, n_pages, [])
        row0b["url"] = row0["url"]
        truth0b.url = truth0.url
        row0b["warc_ts"] = row0["warc_ts"] + dt.timedelta(days=365)
        truth0b.warc_ts = row0b["warc_ts"]
        rows.append(row0b)
        truths.append(truth0b)
        # F7b: identical bytes as page 1 under a new url
        row1, truth1 = build_page(world, 1, n_pages, epp.get(1, []))
        dup_url = "http://mirror.example/copy-of-1"
        row1 = dict(row1, url=dup_url)
        import copy

        truth1b = copy.deepcopy(truth1)
        truth1b.url = dup_url
        rows.append(row1)
        truths.append(truth1b)
    return rows, truths
