"""Stage M5/J1: gazetteer mention detection + entity linking.

Analog of Spindle's coreference link extraction + per-URI proxy lookup
(``spindle:correlate/`` link scan; ``spindle:correlate/db.c``-style
Postgres LOOKUP per candidate).  The Postgres round-trip per URI — the
reference's serialization bottleneck — becomes a read-only dictionary
broadcast once via ``ray.put`` and dereferenced in each actor's
``__init__`` (SURVEY.md §2.3 ST2 / §2.4 J1 broadcast path), or a
shuffle join on the precomputed ``shard`` column when the dictionary is
too large to broadcast (``link_mentions_shuffle``).

Matching contract (shared regex/Aho-Corasick implementations,
cross-checked in tests): the text is NFKC-casefolded and
whitespace-collapsed first (offsets refer to that normalized text);
matches are word-bounded, leftmost-longest, non-overlapping.

Linking rule (must equal ``twine_ray.sources.world.resolve_alias``):
highest prior wins, ties break on lexicographic-min entity key.
"""

from __future__ import annotations

import re

import pyarrow as pa

from twine_ray.functions.ahocorasick import AhoCorasick, select_matches
from twine_ray.functions.textnorm import norm_alias

MENTIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("mention_id", pa.int64()),
        ("surface", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("norm", pa.string()),
        ("entity_key", pa.string()),  # '' when unlinked
        ("prior", pa.float64()),
    ]
)

# Above this many surfaces, a compiled alternation stops being the fast
# path — switch to the Aho-Corasick automaton.
REGEX_MAX_SURFACES = 5000


class GazetteerMatcher:
    """Shared matcher core: built once per actor, scans normalized text."""

    def __init__(self, alias_rows: list[dict], force_ac: bool | None = None):
        # alias_norm -> (entity_key, prior) winner under the linking rule
        best: dict[str, tuple[str, float]] = {}
        for r in alias_rows:
            k, cand = r["alias_norm"], (r["entity_key"], float(r["prior"]))
            cur = best.get(k)
            if cur is None or (-cand[1], cand[0]) < (-cur[1], cur[0]):
                best[k] = cand
        self.link: dict[str, tuple[str, float]] = best
        surfaces = sorted(best, key=len, reverse=True)
        use_ac = force_ac if force_ac is not None else (
            len(surfaces) > REGEX_MAX_SURFACES
        )
        self.use_ac = use_ac
        if use_ac:
            self.ac = AhoCorasick(surfaces)
            self.rx = None
        else:
            self.ac = None
            alt = "|".join(re.escape(s) for s in surfaces if s)
            self.rx = re.compile(rf"(?<!\w)(?:{alt})(?!\w)") if alt else None

    def find(self, norm_text: str) -> list[tuple[int, int]]:
        """Word-bounded leftmost-longest non-overlapping (start, end)."""
        if self.use_ac:
            return select_matches(self.ac.find_all(norm_text), norm_text)
        if self.rx is None:
            return []
        return [m.span() for m in self.rx.finditer(norm_text)]


class MentionDetector:
    """Actor-pool stage: extracted pages batch -> mentions rows.

    ``alias_ref`` is a ``ray.ObjectRef`` to the alias rows (broadcast
    once from the driver) or the plain list (tests).
    """

    def __init__(self, alias_ref, force_ac: bool | None = None) -> None:
        from twine_ray.state.broadcast import resolve

        self.matcher = GazetteerMatcher(resolve(alias_ref), force_ac=force_ac)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        out = {k: [] for k in (
            "url", "mention_id", "surface", "start", "end", "norm",
            "entity_key", "prior",
        )}
        for url, text in zip(urls, texts):
            norm_text = norm_alias(text or "")
            for mid, (s, e) in enumerate(self.matcher.find(norm_text)):
                surface = norm_text[s:e]
                linked = self.matcher.link.get(surface)
                out["url"].append(url)
                out["mention_id"].append(mid)
                out["surface"].append(surface)
                out["start"].append(s)
                out["end"].append(e)
                out["norm"].append(surface)
                out["entity_key"].append(linked[0] if linked else "")
                out["prior"].append(linked[1] if linked else 0.0)
        return pa.Table.from_pydict(out, schema=MENTIONS_SCHEMA)


def detect_mentions(extracted_ds, alias_rows, concurrency=4,
                    batch_size: int = 128, force_ac: bool | None = None):
    """extracted Dataset -> mentions Dataset (broadcast-linked)."""
    from twine_ray.state.broadcast import broadcast, pool

    alias_ref = broadcast(alias_rows)
    return extracted_ds.map_batches(
        MentionDetector,
        fn_constructor_kwargs={"alias_ref": alias_ref, "force_ac": force_ac},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool(concurrency),
    )


# ---------------------------------------------------------------------------
# J1 shuffle path — when the alias dictionary is too large to broadcast
# ---------------------------------------------------------------------------


def link_mentions_shuffle(mentions_ds, alias_ds):
    """Relink unlinked/linked mentions against a LARGE alias dict by
    shuffle hash join on the normalized surface (SURVEY.md §2.4 J1).

    Both sides get the deterministic ``shard``-compatible key (the
    surface string itself is the join key; Ray hash-partitions it).
    Left join: unmatched mentions keep entity_key '' (Twine keeps
    unmatched URIs verbatim).  The winning candidate per surface is
    reduced on the alias side FIRST (tiny groupby) so the join is 1:1.
    """
    import pandas as pd

    def _best(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized winner per surface: sort + drop_duplicates (C
        # kernels) over the whole bucket — never one Python call per
        # alias (the dict can have 10^5+ surfaces)
        df = df.sort_values(
            ["alias_norm", "prior", "entity_key"],
            ascending=[True, False, True], kind="mergesort",
        )
        r = df.drop_duplicates(subset=["alias_norm"], keep="first")
        return pd.DataFrame(
            {"norm": r["alias_norm"].values,
             "best_key": r["entity_key"].values,
             "best_prior": r["prior"].values}
        )

    from twine_ray.stages.grouped import bucketed_group_reduce

    num_parts = max(2, mentions_ds.num_blocks() if hasattr(mentions_ds, "num_blocks") else 8)
    # repartition: grouped outputs can carry empty-schema blocks that
    # break Ray's hash join (observed in 2.49)
    best = bucketed_group_reduce(
        alias_ds.select_columns(["alias_norm", "entity_key", "prior"]),
        ["alias_norm"], _best, partial=False,
    ).repartition(num_parts)
    joined = mentions_ds.join(
        best, join_type="left_outer", num_partitions=num_parts, on=("norm",),
    )

    def _fill(df: pd.DataFrame) -> pd.DataFrame:
        hit = df["best_key"].notna()
        df.loc[hit, "entity_key"] = df.loc[hit, "best_key"]
        df.loc[hit, "prior"] = df.loc[hit, "best_prior"]
        df["entity_key"] = df["entity_key"].fillna("")
        df["prior"] = df["prior"].fillna(0.0)
        return df.drop(columns=["best_key", "best_prior"])

    return joined.map_batches(_fill, batch_format="pandas")
