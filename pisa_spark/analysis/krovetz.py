"""Krovetz (kstem) stemmer — rule-cascade approximation.

Parity target: the reference's KrovetzStemmer token filter
(src/token_filter.cpp:31-44), whose kstem backend implements
R. Krovetz, "Viewing morphology as an inference process" (SIGIR
1993): an INFLECTIONAL stemmer — plurals, past tense, -ing — that
checks a headword dictionary after each rule so real words are never
mangled ("news" stays "news").

The full kstem headword lexicon ships as external data files the
reference loads at runtime; those files are not embeddable here, so
this module implements the published rule cascade with

- a small embedded exception table for common irregular forms and
  dictionary-protected words (all public-knowledge English), and
- Porter-style heuristics (undoubling, e-restoration after short
  stems / "at|bl|iz") replacing the dictionary-membership tests.

Behavior on regular inflection matches kstem; on rare
dictionary-dependent cases it may differ — the analyzer accepts
``stemmer="krovetz"`` with these documented semantics, pinned by the
goldens in tests/test_tokenizer.py.
"""

from __future__ import annotations

# Irregular forms -> lemma (plural irregulars + common -e words the
# heuristics would otherwise mangle). Dictionary words ending in
# apparent suffixes are mapped to themselves (the kstem "is it a
# headword already?" check for the worst offenders).
_EXCEPTIONS = {
    # irregular plurals
    "children": "child", "men": "man", "women": "woman", "feet": "foot",
    "geese": "goose", "teeth": "tooth", "mice": "mouse", "lice": "louse",
    "people": "person", "oxen": "ox", "dice": "die",
    "leaves": "leaf", "loaves": "loaf", "knives": "knife",
    "wives": "wife", "lives": "life", "halves": "half",
    "calves": "calf", "shelves": "shelf", "wolves": "wolf",
    "selves": "self", "thieves": "thief", "scarves": "scarf",
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "appendices": "appendix", "crises": "crisis", "analyses": "analysis",
    "theses": "thesis", "hypotheses": "hypothesis", "bases": "basis",
    "axes": "axis", "data": "datum", "media": "medium",
    "criteria": "criterion", "phenomena": "phenomenon",
    # z-plural dictionary cases the -zes rule can't see: un-doubling
    # and vowel+z headwords that take -es
    "quizzes": "quiz", "whizzes": "whiz", "topazes": "topaz",
    # -che headwords the -ches es-strip would mangle
    "aches": "ache", "niches": "niche", "caches": "cache",
    "mustaches": "mustache", "avalanches": "avalanche",
    "headaches": "headache", "toothaches": "toothache",
    "cliches": "cliche", "quiches": "quiche", "psyches": "psyche",
    # words the suffix rules must not touch (protected headwords)
    "news": "news", "series": "series", "species": "species",
    "bus": "bus", "gas": "gas", "lens": "lens", "yes": "yes",
    "this": "this", "his": "his", "is": "is", "was": "was", "has": "has",
    "does": "does", "goes": "goes", "shoes": "shoe", "dies": "die",
    "ties": "tie", "lies": "lie", "pies": "pie",
    "during": "during", "thing": "thing", "king": "king", "ring": "ring",
    "sing": "sing", "spring": "spring", "string": "string",
    "bring": "bring", "wing": "wing", "sting": "sting", "swing": "swing",
    "morning": "morning", "evening": "evening", "ceiling": "ceiling",
    "sterling": "sterling", "darling": "darling", "sibling": "sibling",
    "red": "red", "bed": "bed", "led": "led", "fed": "feed",
    "bred": "breed", "shed": "shed", "sled": "sled", "wed": "wed",
    "hundred": "hundred", "sacred": "sacred", "hatred": "hatred",
    "united": "unite", "used": "use", "based": "base", "need": "need",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
    # -eed: headwords keep it (speed/seed/...); true past forms map
    "agreed": "agree", "freed": "free", "decreed": "decree",
    "guaranteed": "guarantee",
}

_VOWELS = frozenset("aeiou")


def _has_vowel(w: str) -> bool:
    return any(c in _VOWELS or c == "y" for c in w)


def _ends_cvc(w: str) -> bool:
    """consonant-vowel-consonant ending with the usual w/x/y carve-out
    — the 'short stem wants its e back' shape ("bak" -> "bake")."""
    if len(w) < 3:
        return False
    c1, v, c2 = w[-3], w[-2], w[-1]
    return (
        c1 not in _VOWELS
        and v in _VOWELS
        and c2 not in _VOWELS
        and c2 not in "wxy"
    )


def _restore(stem: str) -> str:
    """Post-rule repair shared by -ed/-ing removal: undouble a trailing
    doubled consonant (except ll/ss/zz/ff, which are legitimate
    English finals) or restore 'e' after the classic patterns."""
    if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] not in "aeioulszf":
        return stem[:-1]
    if stem.endswith(("at", "bl", "iz")) or _ends_cvc(stem):
        return stem + "e"
    return stem


def stem(word: str) -> str:
    """kstem cascade: exceptions -> plural() -> past() -> aspect().
    Only lowercase alphabetic input is modified (the analyzer
    lowercases first); anything else passes through untouched."""
    if len(word) < 3 or not word.isalpha():
        return word
    hit = _EXCEPTIONS.get(word)
    if hit is not None:
        return hit

    # ---- plural (kstem step 1)
    if word.endswith("ies") and len(word) > 4:
        word = word[:-3] + "y"
    elif word.endswith(("sses", "shes", "ches", "xes")) and len(word) > 4:
        # common -che headwords (ache, niche, cache) this es-strip
        # would mangle are dictionary knowledge -> _EXCEPTIONS.
        word = word[:-2]
    elif word.endswith("zes") and len(word) > 4:
        # vowel+ze headwords (size, blaze, freeze) pluralize with -s:
        # strip only the s. Consonant+z headwords (waltz, blitz,
        # quartz) and doubled-z (buzz, fizz) pluralize with -es: strip
        # es so singular and plural meet at one term. Cases needing
        # un-doubling (quizzes->quiz) or a vowel+z -es plural
        # (topazes->topaz) are dictionary knowledge -> _EXCEPTIONS.
        word = word[:-1] if word[-4] in "aeiouy" else word[:-2]
    elif word.endswith("s") and not word.endswith(("ss", "us", "is")) and len(word) > 3:
        word = word[:-1]

    # ---- past tense (kstem step 2)
    if word.endswith("ied") and len(word) > 4:
        word = word[:-3] + "y"
    elif word.endswith("eed"):
        pass  # agreed/freed: -eed is not a removable past marker here
    elif word.endswith("ed") and len(word) > 4 and _has_vowel(word[:-2]):
        word = _restore(word[:-2])

    # ---- aspect / -ing (kstem step 3)
    if word.endswith("ying") and len(word) > 5:
        word = word[:-4] + "y"
    elif word.endswith("ing") and len(word) > 5 and _has_vowel(word[:-3]):
        word = _restore(word[:-3])

    return word
