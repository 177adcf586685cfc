"""Per-language analyzer selection registry.

The reference ships three capability tiers (``/root/reference/src/wikirec/
languages.py``: lemmatizable :31-47, stemmable :63-68, stopword-only
:84-126) and picks the cleaning path per language at
``data_utils.py:730-754`` (full language name → abbreviation → stopword
source).  This registry reproduces the same capability partition as data —
all 60 language entries, both the full name and ISO-639-1 code resolve —
with the semantics re-expressed for the engine:

  "lemmatize"  — spaCy model exists upstream (actor-pool stage T1; this
                 container gates it and falls back to rules, stem.py)
  "stem"       — Snowball-family stemmer fallback (reference :906-940)
  "stopwords"  — stopword removal only (reference: stopwords-iso)
  "tokenize"   — whitespace/punct tokenization only (ultimate fallback for
                 unknown codes; the reference raises instead,
                 data_utils.py:750-754 — degrading keeps a 100 TB run alive
                 on long-tail languages)

Stopword SETS ship for the languages the synthetic corpus and tests
exercise (small public function-word lists, the same spirit as
analyze.DEFAULT_STOPWORDS); real deployments register their own full lists
per language.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LanguageSpec:
    code: str
    name: str
    capability: str  # lemmatize | stem | stopwords | tokenize


_REGISTRY: dict[str, LanguageSpec] = {}
_BY_NAME: dict[str, LanguageSpec] = {}


def register(code: str, name: str, capability: str) -> None:
    if capability not in ("lemmatize", "stem", "stopwords", "tokenize"):
        raise ValueError(f"unknown capability {capability!r}")
    spec = LanguageSpec(code, name, capability)
    _REGISTRY[code] = spec
    _BY_NAME[name] = spec


# Tier 1 — spaCy-lemmatizable (reference languages.py:31-47).  The engine
# treats zh/ja as lemmatize-capable to match the reference's table even
# though its own rule fallback is suffix-based.
for _name, _code in [
    ("chinese", "zh"), ("danish", "da"), ("dutch", "nl"), ("english", "en"),
    ("french", "fr"), ("german", "de"), ("greek", "el"), ("italian", "it"),
    ("japanese", "ja"), ("lithuanian", "lt"), ("norwegian_bokmal", "nb"),
    ("polish", "pl"), ("portuguese", "pt"), ("romanian", "ro"),
    ("spanish", "es"),
]:
    register(_code, _name, "lemmatize")

# Tier 2 — stemmable via Snowball (reference languages.py:63-68)
for _name, _code in [
    ("arabic", "ar"), ("finnish", "fi"), ("hungarian", "hu"), ("swedish", "sv"),
]:
    register(_code, _name, "stem")

# Tier 3 — stopword-removal only (reference languages.py:84-126; "farsi"
# and "persian" are aliases for the same code there)
for _name, _code in [
    ("afrikaans", "af"), ("bulgarian", "bg"), ("bengali", "bn"),
    ("breton", "br"), ("catalan", "ca"), ("czech", "cs"), ("esperanto", "eo"),
    ("estonian", "et"), ("basque", "eu"), ("farsi", "fa"), ("persian", "fa"),
    ("irish", "ga"), ("galician", "gl"), ("gujarati", "gu"), ("hausa", "ha"),
    ("hebrew", "he"), ("hindi", "hi"), ("croatian", "hr"), ("armenian", "hy"),
    ("indonesian", "id"), ("korean", "ko"), ("kurdish", "ku"), ("latin", "la"),
    ("latvian", "lv"), ("marathi", "mr"), ("malay", "ms"), ("norwegian", "no"),
    ("russian", "ru"), ("slovak", "sk"), ("slovenian", "sl"), ("somali", "so"),
    ("sotho", "st"), ("swahili", "sw"), ("thai", "th"), ("tagalog", "tl"),
    ("turkish", "tr"), ("ukrainian", "uk"), ("urdu", "ur"),
    ("vietnamese", "vi"), ("yoruba", "yo"), ("zulu", "zu"),
]:
    register(_code, _name, "stopwords")


def spec_for(code_or_name: str) -> LanguageSpec:
    """Analyzer capability for a language code OR full name (the reference
    accepts full names and maps via its abbreviation dicts,
    data_utils.py:730-754); unknown values degrade to tokenize-only."""
    key = code_or_name.lower()
    if key in _REGISTRY:
        return _REGISTRY[key]
    if key in _BY_NAME:
        return _BY_NAME[key]
    return LanguageSpec(key, key, "tokenize")


def supported() -> dict[str, LanguageSpec]:
    return dict(_REGISTRY)


# --- per-language stopword sets -------------------------------------------
# Small public function-word lists for the languages the synthetic corpus
# declares (documents.lang ∈ {en, de, es, fr, zh}).  The reference pulls
# full lists from stopwords-iso at runtime (data_utils.py:715-728); these
# defaults keep the per-language PATH testable offline and are replaceable
# via the ``stopwords=`` parameter of every cleaning stage.
STOPWORDS_BY_LANG: dict[str, frozenset[str]] = {
    "de": frozenset(
        """der die das und ist von zu mit den im fur auf ein eine nicht als
        auch aus bei nach wie uber dem des einem einen einer sich oder wird
        war sind haben hat wenn noch nur durch kann mehr schon hier alle""".split()
    ),
    "es": frozenset(
        """el la los las de del que y en se un una por para es con no al lo
        como mas pero sus le ya o este si porque esta entre cuando muy sin
        sobre tambien me hasta hay donde quien desde todo nos""".split()
    ),
    "fr": frozenset(
        """le la les de des du et en un une est pour que dans il elle au aux
        ce cette ne pas plus par sur avec son sa ses ils ont mais ou si leur
        bien etre fait tout nous vous je tu on dont""".split()
    ),
    "it": frozenset(
        """il lo la i gli le di a da in con su per tra fra un uno una che e
        non si al allo alla dei degli delle nel nello nella sono era ha
        hanno questo questa come anche piu ma se o""".split()
    ),
    "zh": frozenset(),  # tokenize-only tier: no space-delimited stopwords
}


def stopwords_for(code_or_name: str) -> frozenset[str]:
    """Stopword set for a language (empty when none is registered — the
    reference's ``stopwords(language) != set()`` probe at
    data_utils.py:745-752 has the same no-stopwords degrade)."""
    spec = spec_for(code_or_name)
    if spec.code == "en":
        from wikirec_ray.stages.analyze import DEFAULT_STOPWORDS

        return DEFAULT_STOPWORDS
    return STOPWORDS_BY_LANG.get(spec.code, frozenset())
