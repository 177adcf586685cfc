"""Per-language analyzer selection registry.

The reference ships three capability tiers (``/root/reference/src/wikirec/
languages.py``: lemmatizable :31-47, stemmable :63-68, stopword-only
:84-126) and picks the cleaning path per language at
``data_utils.py:730-754``.  This registry keeps the same *shape* — a
data-driven lookup from language code to analyzer capability — without
copying the reference's full tables; entries cover the languages the
synthetic corpus uses and extend by registration.

Capabilities:
  "lemmatize"  — full pipeline (needs a model; actor-pool stage T1)
  "stem"       — rule stemmer fallback (reference: Snowball, :906-940)
  "stopwords"  — stopword removal only
  "tokenize"   — whitespace/punct tokenization only (ultimate fallback)
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LanguageSpec:
    code: str
    name: str
    capability: str  # lemmatize | stem | stopwords | tokenize


_REGISTRY: dict[str, LanguageSpec] = {}


def register(code: str, name: str, capability: str) -> None:
    if capability not in ("lemmatize", "stem", "stopwords", "tokenize"):
        raise ValueError(f"unknown capability {capability!r}")
    _REGISTRY[code] = LanguageSpec(code, name, capability)


for _code, _name, _cap in [
    ("en", "english", "lemmatize"),
    ("de", "german", "lemmatize"),
    ("es", "spanish", "lemmatize"),
    ("fr", "french", "lemmatize"),
    ("it", "italian", "lemmatize"),
    ("pt", "portuguese", "lemmatize"),
    ("nl", "dutch", "lemmatize"),
    ("sv", "swedish", "stem"),
    ("da", "danish", "stem"),
    ("fi", "finnish", "stem"),  # the reference maps this via the "finish"
    #                             abbreviation typo at data_utils.py:917;
    #                             we use the correct code
    ("hu", "hungarian", "stem"),
    ("zh", "chinese", "tokenize"),
    ("ja", "japanese", "tokenize"),
    ("ko", "korean", "tokenize"),
    ("ru", "russian", "stopwords"),
    ("ar", "arabic", "stopwords"),
]:
    register(_code, _name, _cap)


def spec_for(code: str) -> LanguageSpec:
    """Analyzer capability for a language; unknown codes degrade to
    tokenize-only (the reference raises instead, data_utils.py:750-754 —
    degrading keeps a 100TB run alive on long-tail languages)."""
    return _REGISTRY.get(code, LanguageSpec(code, code, "tokenize"))


def supported() -> dict[str, LanguageSpec]:
    return dict(_REGISTRY)
