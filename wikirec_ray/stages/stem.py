"""Rule-based English stemming stage — the engine's stand-in for the
reference's Snowball-stemmer fallback (``/root/reference/src/wikirec/
data_utils.py:906-940``: when no spaCy model exists, every token is stemmed;
T1/M11 in SURVEY §2).

This is an implementation of the classic Porter stemming algorithm (Porter,
1980, "An algorithm for suffix stripping" — public domain algorithm),
written from the published step tables.  NLTK/Snowball are not shipped in
this container; the lemmatizer slot (``data_utils.py:892-904``) is gated
behind an import-try of spaCy and raises with guidance when absent.

Runs as an actor-pool ``map_batches`` stage; the stem cache (vocabulary is
zipfian — most tokens repeat) lives per actor.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from wikirec_ray.stages.analyze import _flat_tokens

_VOWEL = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWEL:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences in the stem."""
    m = 0
    prev_cons = True
    started = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if not cons:
            started = True
        elif started and not prev_cons:
            m += 1
        prev_cons = cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def porter_stem(word: str) -> str:
    """Porter 1980, steps 1a-5b."""
    if len(word) <= 2:
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 1:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and _measure(w[:-3]) > 1:
            w = w[:-3]

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


class Stemmer:
    """Actor-pool stage: (id, text) -> (id, tokens: stemmed). Cache built per
    actor (__init__); the reference's analog stems inside the driver loop
    (data_utils.py:934-940)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self._cache: dict[str, str] = {}

    def stem(self, tok: str) -> str:
        s = self._cache.get(tok)
        if s is None:
            s = porter_stem(tok)
            self._cache[tok] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        # stem the UNIQUE vocabulary only (dictionary_encode), then gather —
        # the zipfian stream makes vocab << occurrences, so the per-token
        # Python call count drops by the stream/vocab ratio and the list
        # column rebuilds zero-copy from offsets (review r04)
        parents, flat = _flat_tokens(batch[self.text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        enc = flat.dictionary_encode()
        mapped_u = pa.array(
            [self.stem(t) for t in enc.dictionary.to_pylist()], pa.string()
        )
        mapped = pc.take(mapped_u, enc.indices)
        bounds = np.searchsorted(par, np.arange(batch.num_rows + 1))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "tokens": pa.LargeListArray.from_arrays(
                    bounds.astype(np.int64), mapped
                ),
            }
        )


# Common English irregular forms (public knowledge; the kind of closed-class
# table every rule lemmatizer ships).  Used before suffix rules.
IRREGULAR_LEMMAS = {
    "was": "be", "were": "be", "is": "be", "are": "be", "am": "be",
    "been": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do",
    "went": "go", "gone": "go", "going": "go",
    "children": "child", "men": "man", "women": "woman", "people": "person",
    "feet": "foot", "teeth": "tooth", "mice": "mouse", "geese": "goose",
    "better": "good", "best": "good", "worse": "bad", "worst": "bad",
    "said": "say", "made": "make", "took": "take", "taken": "take",
    "came": "come", "saw": "see", "seen": "see", "got": "get",
    "gotten": "get", "ran": "run", "knew": "know", "known": "know",
    "thought": "think", "found": "find", "gave": "give", "given": "give",
    "told": "tell", "became": "become", "brought": "bring",
    "began": "begin", "begun": "begin", "kept": "keep", "held": "hold",
    "wrote": "write", "written": "write", "stood": "stand", "heard": "hear",
    "meant": "mean", "met": "meet", "paid": "pay", "sent": "send",
    "built": "build", "spoke": "speak", "spoken": "speak", "lost": "lose",
    "felt": "feel", "bought": "buy", "sat": "sit", "wore": "wear",
}

_VOWELS = set("aeiou")


def lemmatize_word(word: str) -> str:
    """Deterministic rule lemmatizer (WordNet-morphy-style suffix
    detachment, Fellbaum 1998, plus consonant-doubling / silent-e
    restoration): the pure-Python lemma fallback the VERDICT asked for when
    spaCy is unavailable — same spirit as the Porter-from-the-paper
    stemmer, but lemma-shaped output (cities→city, running→run,
    making→make) instead of stems (citi, run, make)."""
    w = word
    irr = IRREGULAR_LEMMAS.get(w)
    if irr is not None:
        return irr
    n = len(w)
    if n < 4:
        return w

    def undouble_or_e(stem: str) -> str:
        # running→run (undouble, but keep -ll/-ss/-zz: roll, miss, buzz);
        # making→make (restore silent e after a C-V-C tail: mak→make)
        if (
            len(stem) >= 3
            and stem[-1] == stem[-2]
            and stem[-1] not in _VOWELS
            and stem[-1] not in "lsz"
        ):
            return stem[:-1]
        if (
            len(stem) >= 3
            and stem[-1] not in _VOWELS
            and stem[-1] not in "wxy"
            and stem[-2] in _VOWELS
            and stem[-3] not in _VOWELS
        ):
            return stem + "e"
        return stem

    if w.endswith("ies") and n > 4:
        return w[:-3] + "y"
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith(("ches", "shes", "xes", "zes")):
        return w[:-2]
    if w.endswith("ing") and n > 5:
        return undouble_or_e(w[:-3])
    if w.endswith("eed"):
        return w[:-1]  # agreed -> agree, freed -> free
    if w.endswith("ied") and n > 4:
        return w[:-3] + "y"
    if w.endswith("ed") and n > 4:
        return undouble_or_e(w[:-2])
    if w.endswith("s") and not w.endswith(("ss", "us", "is")):
        return w[:-1]
    return w


class RuleLemmatizer:
    """T1-pattern actor-pool stage applying ``lemmatize_word`` with a
    per-actor memo cache — the working lemma path of the reference's
    lemmatize→stem→identity fallback chain (data_utils.py:892-940) when no
    spaCy model can be loaded."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self._cache: dict[str, str] = {}

    def lemma(self, w: str) -> str:
        hit = self._cache.get(w)
        if hit is None:
            hit = lemmatize_word(w)
            self._cache[w] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        # unique-vocab lemmatization + gather (same shape as Stemmer)
        parents, flat = _flat_tokens(batch[self.text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        enc = flat.dictionary_encode()
        mapped_u = pa.array(
            [self.lemma(t) for t in enc.dictionary.to_pylist()], pa.string()
        )
        mapped = pc.take(mapped_u, enc.indices)
        bounds = np.searchsorted(par, np.arange(batch.num_rows + 1))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "tokens": pa.LargeListArray.from_arrays(
                    bounds.astype(np.int64), mapped
                ),
            }
        )


class Lemmatizer:
    """T1 slot: spaCy lemmatization actor (model load once per actor,
    data_utils.py:892-904).  When spaCy + the model are installed the stage
    is real: per doc it joins the tokens, runs ``nlp``, and keeps
    ``token.lemma_`` for the reference's allowed POS tags
    (``_lemmatize``, data_utils.py:600-640).  Without spaCy (this
    container) the constructor raises with guidance; ``select_lemmatizer``
    below picks the working fallback automatically, mirroring the
    reference's lemmatize→stem→identity chain (data_utils.py:893-940)."""

    ALLOWED_POS = ("NOUN", "PROPN", "ADJ", "ADV", "VERB")

    def __init__(self, model: str | None = None, id_col: str = "doc_id",
                 text_col: str = "text"):
        model = model or spacy_model_name() or "en_core_web_sm"
        try:
            import spacy
        except ImportError as e:
            raise NotImplementedError(
                "spaCy is not available in this environment; use "
                "stem.RuleLemmatizer / stem.Stemmer (the reference's own "
                "fallbacks when no spaCy model exists, data_utils.py:906-940)"
            ) from e
        try:
            self.nlp = spacy.load(model, disable=("parser", "ner"))
        except OSError as e:  # model not downloaded (no network here)
            raise NotImplementedError(
                f"spaCy model {model!r} is not installed (the reference "
                "auto-downloads at data_utils.py:899 — no network in this "
                "environment); set WIKIREC_SPACY_MODEL to an installed model"
            ) from e
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, flat = _flat_tokens(batch[self.text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        toks = flat.to_pylist()
        bounds = np.searchsorted(par, np.arange(batch.num_rows + 1))
        texts = [" ".join(toks[bounds[i]: bounds[i + 1]]) for i in range(batch.num_rows)]
        out = [
            [t.lemma_ for t in doc if t.pos_ in self.ALLOWED_POS]
            for doc in self.nlp.pipe(texts)
        ]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "tokens": pa.array(out, type=pa.large_list(pa.string())),
            }
        )


def spacy_model_name() -> str | None:
    """The env-gated model selection (VERDICT r02 item 7): set
    ``WIKIREC_SPACY_MODEL`` to route lemmatization through a real installed
    spaCy model; unset (or unloadable) falls back to the rule lemmatizer."""
    import os

    return os.environ.get("WIKIREC_SPACY_MODEL") or None


def select_lemmatizer() -> tuple[type, dict]:
    """(stage class, constructor kwargs) for ``map_batches``: the real
    spaCy stage when WIKIREC_SPACY_MODEL names a loadable model, else
    ``RuleLemmatizer`` — the engine's version of the reference's
    lemmatize-else-fallback chain (data_utils.py:893-906)."""
    model = spacy_model_name()
    if model and _spacy_model_loadable(model):
        return Lemmatizer, {"model": model}
    if model:
        import logging

        logging.getLogger(__name__).warning(
            "WIKIREC_SPACY_MODEL=%s not loadable — falling back to "
            "RuleLemmatizer", model,
        )
    return RuleLemmatizer, {}


import functools


@functools.lru_cache(maxsize=8)
def _spacy_model_loadable(model: str) -> bool:
    """Cheap, cached loadability probe (review r03: the old probe did a
    full ``spacy.load`` per call — seconds + hundreds of MB — then threw
    the model away; the actors load it themselves)."""
    try:
        import importlib.util

        import spacy  # noqa: F401

        if importlib.util.find_spec(model) is not None:
            return True
        # non-package model paths: fall back to a real load, once (cached)
        spacy.load(model, disable=("parser", "ner"))
        return True
    except Exception:
        return False
