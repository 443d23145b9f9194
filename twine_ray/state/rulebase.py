"""Rulebase — declarative predicate/property rules (SURVEY.md §2.3 ST1).

Analog of Spindle's TTL rulebase (``spindle:common/rulebase.c``,
shipped ``rulebase.ttl``): maps vocabulary to canonical predicates,
assigns per-predicate priority scores, marks which predicates are
single-valued (property resolution keeps the highest-score value) vs
multi-valued (dedup only), and which predicate expresses coreference.

Loaded once per actor in ``__init__`` (never per batch).  Kept as plain
Python data — a checked-in dict stands in for the TTL file.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Canonical predicate vocabulary (the "canonical side" of the rulebase).
DC_TITLE = "http://purl.org/dc/terms/title"
DC_LANGUAGE = "http://purl.org/dc/terms/language"
DC_MODIFIED = "http://purl.org/dc/terms/modified"
SCHEMA_MENTIONS = "http://schema.org/mentions"
REL_ASSOCIATED = "http://purl.org/twine-ray/associatedWith"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"

XSD_DATETIME = "http://www.w3.org/2001/XMLSchema#dateTime"
XSD_STRING = ""  # plain literal — empty datatype column

# Root for generated canonical entities, mirroring Spindle's
# http://<root>/<uuid>#id proxy URI shape.
CANON_ROOT = "http://canon.twine-ray/"


def canon_uri(canon_id: str) -> str:
    """Spindle-style proxy URI for a canonical id."""
    return f"{CANON_ROOT}{canon_id}#id"


@dataclass(frozen=True)
class PredicateRule:
    pred: str
    score: int  # source priority — higher wins in property resolution
    single_valued: bool  # True → keep one winning value per (subj, pred)


@dataclass(frozen=True)
class Rulebase:
    """The frozen default rulebase (stand-in for rulebase.ttl)."""

    predicates: dict[str, PredicateRule] = field(
        default_factory=lambda: {
            DC_TITLE: PredicateRule(DC_TITLE, 30, True),
            DC_LANGUAGE: PredicateRule(DC_LANGUAGE, 20, True),
            DC_MODIFIED: PredicateRule(DC_MODIFIED, 20, True),
            SCHEMA_MENTIONS: PredicateRule(SCHEMA_MENTIONS, 10, False),
            REL_ASSOCIATED: PredicateRule(REL_ASSOCIATED, 10, False),
            OWL_SAMEAS: PredicateRule(OWL_SAMEAS, 50, False),
        }
    )
    # Predicates whose (subj, obj) pairs feed the coreference closure.
    coref_predicates: frozenset[str] = frozenset({OWL_SAMEAS})

    def score(self, pred: str) -> int:
        rule = self.predicates.get(pred)
        return rule.score if rule else 0

    def is_single_valued(self, pred: str) -> bool:
        rule = self.predicates.get(pred)
        return rule.single_valued if rule else False

    def whitelist(self) -> frozenset[str]:
        """Predicate whitelist (Spindle's strip step, SURVEY.md M7)."""
        return frozenset(self.predicates)


DEFAULT_RULEBASE = Rulebase()
