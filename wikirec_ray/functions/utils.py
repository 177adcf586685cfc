"""Driver-side helpers mirroring the reference's ``utils.py``.

``suggest_terms`` is the analog of ``_check_str_args`` /
``_check_str_similarity`` (``/root/reference/src/wikirec/utils.py:24-57``):
when a query term / input title misses, print-free top-5 fuzzy suggestions
by difflib ratio (same metric the reference uses).  This is query
validation, not a dataset op (SURVEY M16/K3).
"""

from __future__ import annotations

from difflib import SequenceMatcher


def similarity(a: str, b: str) -> float:
    return SequenceMatcher(None, a, b).ratio()


def suggest_terms(term: str, vocabulary, n: int = 5) -> list[tuple[str, float]]:
    """Top-n closest vocabulary entries to a missing term, best first
    (ratio desc, term asc for determinism)."""
    scored = [(v, similarity(term, v)) for v in vocabulary]
    scored.sort(key=lambda kv: (-kv[1], kv[0]))
    return scored[:n]


def validate_terms(terms: list[str], vocabulary) -> dict[str, list[tuple[str, float]]]:
    """{missing_term: suggestions} for every query term not in the corpus
    vocabulary — the recommend() miss path (model.py:360-370)."""
    vocab = set(vocabulary)
    return {t: suggest_terms(t, vocab) for t in terms if t not in vocab}


def topic_alias_dict() -> dict[str, dict[str, str]]:
    """User-facing topic name -> article-template selector string, per
    language — the reference's ``input_conversion_dict``
    (data_utils.py:71-93): its ``topics`` arguments accept friendly plurals
    ("books") that resolve to the Infobox template actually matched during
    parsing.  Same keys/values so reference callers port unchanged."""
    return {
        "en": {
            "books": "Infobox book",
            "short_stories": "Infobox short story",
            "plays": "Infobox play",
            "authors": "Infobox writer",
            "albums": "Infobox album",
            "musicians": "Infobox musical artist",
            "songs": "Infobox song",
            "movies": "Infobox film",
            "films": "Infobox film",
            "tv_series": "Infobox television",
            "video_games": "Infobox video game",
            "artists": "Infobox artist",
            "athletes": "Infobox sportsperson",
            "politicians": "Infobox officeholder",
            "people": "Infobox person",
        }
    }


def convert_topic(topic: str, language: str = "en") -> str:
    """Resolve a friendly topic alias to its selector; unknown topics pass
    through unchanged (the reference applies the dict with .get fallback)."""
    return topic_alias_dict().get(language, {}).get(topic, topic)
