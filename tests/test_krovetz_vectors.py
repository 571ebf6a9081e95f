"""Krovetz stemmer vector set (VERDICT r3 next-#4).

~330 input/output pairs assembled from PUBLIC knowledge of kstem's
behavior: the rule cascade published in R. Krovetz, "Viewing
morphology as an inference process" (SIGIR 1993) — inflectional
plural / past-tense / -ing removal with a headword-dictionary check
after each step — applied to common English inflection. Each expected
output is the dictionary headword of the inflected form (standard
English), which is by construction what kstem returns for these
words. Dictionary-dependent cases where the headword is genuinely
ambiguous or obscure are excluded (that residue is the documented
approximation, COVERAGE.md "Krovetz divergence").

The gate is >=99% agreement; the current table is 100%. Mismatches
print so a regression names the exact words.
"""

from __future__ import annotations

# fmt: off
VECTORS = {
    # --- regular -s / -es plurals
    "cities": "city", "boxes": "box", "watches": "watch",
    "horses": "horse", "dogs": "dog", "glasses": "glass",
    "queries": "query", "churches": "church", "dishes": "dish",
    "foxes": "fox", "classes": "class", "pieces": "piece",
    "pages": "page", "ages": "age", "cars": "car", "books": "book",
    "ideas": "idea", "tables": "table", "days": "day", "keys": "key",
    "boys": "boy", "studies": "study", "babies": "baby",
    "countries": "country", "armies": "army", "puppies": "puppy",
    "houses": "house", "causes": "cause", "phrases": "phrase",
    "excuses": "excuse", "fuses": "fuse", "pauses": "pause",
    "toes": "toe", "shoes": "shoe", "posses": "posse",
    # lexicalized -ring nouns (kstem headwords; the -ing strip must
    # NOT fire — caught by the round-5 full-population audit)
    "earring": "earring", "earrings": "earring",
    "herring": "herring", "herrings": "herring", "xmas": "xmas",
    # vowel+ze vs consonant+z vs doubled-z plurals
    "sizes": "size", "prizes": "prize", "freezes": "freeze",
    "organizes": "organize", "analyzes": "analyze", "gazes": "gaze",
    "waltzes": "waltz", "blitzes": "blitz", "quartzes": "quartz",
    "quizzes": "quiz", "buzzes": "buzz", "fizzes": "fizz",
    "topazes": "topaz",
    # -oes plurals (consonant+o headwords)
    "heroes": "hero", "potatoes": "potato", "tomatoes": "tomato",
    "echoes": "echo", "torpedoes": "torpedo", "vetoes": "veto",
    "mosquitoes": "mosquito", "volcanoes": "volcano",
    "cargoes": "cargo", "dominoes": "domino", "tornadoes": "tornado",
    # -uses (consonant+us headwords)
    "buses": "bus", "gases": "gas", "viruses": "virus",
    "bonuses": "bonus", "campuses": "campus", "censuses": "census",
    "statuses": "status", "geniuses": "genius", "choruses": "chorus",
    "circuses": "circus", "walruses": "walrus",
    # -ies whose singular ends -ie
    "movies": "movie", "cookies": "cookie", "zombies": "zombie",
    "calories": "calorie", "prairies": "prairie",
    "rookies": "rookie", "goalies": "goalie", "brownies": "brownie",
    # -che headwords
    "aches": "ache", "niches": "niche", "caches": "cache",
    "mustaches": "mustache", "headaches": "headache",
    # Greek/Latin
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "crises": "crisis", "analyses": "analysis", "theses": "thesis",
    "hypotheses": "hypothesis", "bases": "basis", "axes": "axis",
    "criteria": "criterion", "phenomena": "phenomenon",
    "diagnoses": "diagnosis", "media": "medium", "data": "datum",
    # irregular plurals
    "children": "child", "men": "man", "women": "woman",
    "feet": "foot", "teeth": "tooth", "mice": "mouse",
    "geese": "goose", "people": "person", "oxen": "ox",
    "knives": "knife", "wives": "wife", "lives": "life",
    "leaves": "leaf", "halves": "half", "shelves": "shelf",
    "wolves": "wolf", "thieves": "thief",
    # --- past tense: plain strips and undoubling
    "walked": "walk", "asked": "ask", "helped": "help",
    "turned": "turn", "jumped": "jump", "looked": "look",
    "seemed": "seem", "worked": "work", "played": "play",
    "stayed": "stay", "enjoyed": "enjoy", "called": "call",
    "passed": "pass", "rolled": "roll", "stuffed": "stuff",
    "stopped": "stop", "planned": "plan", "dropped": "drop",
    "fitted": "fit", "scanned": "scan", "shipped": "ship",
    "logged": "log", "begged": "beg", "drugged": "drug",
    "stemmed": "stem", "added": "add", "erred": "err",
    "tried": "try", "applied": "apply", "carried": "carry",
    "studied": "study", "identified": "identify",
    "agreed": "agree", "freed": "free", "decreed": "decree",
    "guaranteed": "guarantee", "died": "die", "tied": "tie",
    # one-syllable cvc e-restore
    "baked": "bake", "hoped": "hope", "noted": "note",
    "loved": "love", "moved": "move", "lived": "live",
    "saved": "save", "timed": "time", "lined": "line",
    "filed": "file", "smiled": "smile", "closed": "close",
    "shared": "share", "stared": "stare", "cared": "care",
    "scored": "score", "stored": "store", "hired": "hire",
    "fired": "fire", "wired": "wire", "traded": "trade",
    "faded": "fade", "graded": "grade", "voted": "vote",
    "phoned": "phone", "blamed": "blame", "framed": "frame",
    "named": "name", "ruled": "rule", "cured": "cure",
    "faced": "face", "placed": "place", "raced": "race",
    "traced": "trace", "chased": "chase", "staged": "stage",
    "proved": "prove", "starred": "star",
    # multisyllable NO-restore (the one-syllable gate)
    "offered": "offer", "covered": "cover", "entered": "enter",
    "ordered": "order", "delivered": "deliver",
    "remembered": "remember", "considered": "consider",
    "answered": "answer", "gathered": "gather",
    "registered": "register", "suffered": "suffer",
    "wondered": "wonder", "triggered": "trigger",
    "happened": "happen", "opened": "open", "visited": "visit",
    "limited": "limit", "edited": "edit", "credited": "credit",
    "profited": "profit", "benefited": "benefit",
    "exhibited": "exhibit", "deposited": "deposit",
    "inherited": "inherit", "orbited": "orbit", "audited": "audit",
    "targeted": "target", "marketed": "market",
    "budgeted": "budget", "interpreted": "interpret",
    "focused": "focus", "traveled": "travel", "modeled": "model",
    "canceled": "cancel", "leveled": "level", "totaled": "total",
    "labeled": "label", "signaled": "signal",
    "interested": "interest",
    # multisyllable e-restore via the embedded dictionary
    "caused": "cause", "raised": "raise", "pleased": "please",
    "increased": "increase", "released": "release",
    "ceased": "cease", "leased": "lease", "praised": "praise",
    "teased": "tease", "amused": "amuse", "argued": "argue",
    "continued": "continue", "valued": "value", "issued": "issue",
    "rescued": "rescue", "pursued": "pursue", "glued": "glue",
    "invited": "invite", "completed": "complete",
    "computed": "compute", "decided": "decide",
    "provided": "provide", "included": "include",
    "described": "describe", "escaped": "escape",
    "achieved": "achieve", "believed": "believe",
    "received": "receive", "required": "require",
    "retired": "retire", "desired": "desire", "admired": "admire",
    "inspired": "inspire", "acquired": "acquire",
    "compared": "compare", "declared": "declare",
    "prepared": "prepare", "managed": "manage",
    "damaged": "damage", "encouraged": "encourage",
    "engaged": "engage", "arranged": "arrange",
    "changed": "change", "charged": "charge", "judged": "judge",
    "merged": "merge", "urged": "urge", "scheduled": "schedule",
    "measured": "measure", "figured": "figure",
    "featured": "feature", "captured": "capture",
    "ensured": "ensure", "assured": "assure", "secured": "secure",
    "endured": "endure", "configured": "configure",
    "injured": "injure", "structured": "structure",
    "pressured": "pressure", "handled": "handle",
    "enabled": "enable", "doubled": "double",
    "troubled": "trouble", "tackled": "tackle",
    "settled": "settle", "struggled": "struggle",
    "sampled": "sample", "coupled": "couple", "titled": "title",
    "cycled": "cycle", "circled": "circle",
    "assembled": "assemble", "compiled": "compile",
    "styled": "style", "welcomed": "welcome",
    "assumed": "assume", "consumed": "consume",
    "resumed": "resume", "upgraded": "upgrade",
    "invaded": "invade", "persuaded": "persuade",
    "ignored": "ignore", "explored": "explore",
    "restored": "restore", "analyzed": "analyze",
    "supposed": "suppose", "proposed": "propose",
    "exposed": "expose", "imposed": "impose",
    "composed": "compose", "opposed": "oppose",
    "housed": "house", "advised": "advise", "revised": "revise",
    "exercised": "exercise", "surprised": "surprise",
    "promised": "promise", "purchased": "purchase",
    "improved": "improve", "approved": "approve",
    "removed": "remove", "involved": "involve",
    "resolved": "resolve", "evolved": "evolve",
    "dissolved": "dissolve", "served": "serve",
    "reserved": "reserve", "observed": "observe",
    "deserved": "deserve", "preserved": "preserve",
    "derived": "derive", "arrived": "arrive",
    "survived": "survive", "defined": "define",
    "examined": "examine", "determined": "determine",
    "imagined": "imagine", "combined": "combine",
    "declined": "decline", "refined": "refine",
    "produced": "produce", "reduced": "reduce",
    "introduced": "introduce", "replaced": "replace",
    "embraced": "embrace", "forced": "force",
    "enforced": "enforce", "announced": "announce",
    "pronounced": "pronounce", "balanced": "balance",
    "advanced": "advance", "influenced": "influence",
    "experienced": "experience", "referenced": "reference",
    "quoted": "quote", "promoted": "promote", "devoted": "devote",
    "executed": "execute", "contributed": "contribute",
    "distributed": "distribute", "deleted": "delete",
    "competed": "compete", "disputed": "dispute",
    "polluted": "pollute", "guided": "guide", "divided": "divide",
    "collided": "collide", "wasted": "waste", "tasted": "taste",
    "pasted": "paste", "abused": "abuse", "refused": "refuse",
    "confused": "confuse", "excused": "excuse",
    "accused": "accuse", "seized": "seize",
    "breathed": "breathe", "bathed": "bathe",
    "clothed": "clothe", "phrased": "phrase",
    # at/bl/iz rule
    "created": "create", "related": "relate", "stated": "state",
    "updated": "update", "operated": "operate",
    "generated": "generate", "located": "locate",
    "organized": "organize", "recognized": "recognize",
    "enabled_": "enabled_",  # non-alpha passes through
    # --- -ing forms
    "running": "run", "flying": "fly", "making": "make",
    "hoping": "hope", "sitting": "sit", "getting": "get",
    "putting": "put", "winning": "win", "cutting": "cut",
    "taking": "take", "having": "have", "giving": "give",
    "coming": "come", "writing": "write", "riding": "ride",
    "hiding": "hide", "using": "use", "offering": "offer",
    "visiting": "visit", "causing": "cause", "arguing": "argue",
    "continuing": "continue", "managing": "manage",
    "changing": "change", "deciding": "decide",
    "providing": "provide", "including": "include",
    "describing": "describe", "believing": "believe",
    "receiving": "receive", "requiring": "require",
    "comparing": "compare", "measuring": "measure",
    "figuring": "figure", "handling": "handle",
    "struggling": "struggle", "assuming": "assume",
    "ignoring": "ignore", "analyzing": "analyze",
    "closing": "close", "serving": "serve",
    "observing": "observe", "improving": "improve",
    "defining": "define", "combining": "combine",
    "producing": "produce", "replacing": "replace",
    "forcing": "force", "announcing": "announce",
    "executing": "execute", "guiding": "guide",
    "dividing": "divide", "creating": "create",
    "operating": "operate", "organizing": "organize",
    "studying": "study", "paying": "pay", "saying": "say",
    "buying": "buy", "playing": "play", "trying": "try",
    "carrying": "carry", "copying": "copy",
    "dying": "die", "lying": "lie", "tying": "tie",
    # protected -ing headwords
    "during": "during", "thing": "thing", "king": "king",
    "ring": "ring", "sing": "sing", "spring": "spring",
    "string": "string", "bring": "bring", "wing": "wing",
    "morning": "morning", "evening": "evening",
    "ceiling": "ceiling", "sibling": "sibling",
    # protected headwords generally
    "news": "news", "series": "series", "species": "species",
    "bus": "bus", "gas": "gas", "lens": "lens", "yes": "yes",
    "this": "this", "his": "his", "is": "is", "was": "was",
    "has": "has", "red": "red", "bed": "bed", "speed": "speed",
    "need": "need", "proceed": "proceed", "exceed": "exceed",
    "succeed": "succeed", "hundred": "hundred",
    "sacred": "sacred", "hatred": "hatred", "against": "against",
    # plural-of-protected-headword chains (the step-2 dictionary
    # re-check: plural strip must not fall through to -ed/-ing rules)
    "hundreds": "hundred", "hatreds": "hatred",
    "mornings": "morning", "evenings": "evening",
    "siblings": "sibling", "kings": "king", "things": "thing",
    # adjective -ed headwords (not past tense)
    "naked": "naked", "wicked": "wicked", "rugged": "rugged",
    "jagged": "jagged", "ragged": "ragged", "wretched": "wretched",
    "kindred": "kindred",
    # genuine deverbal plurals still stem through both steps
    "buildings": "build", "feelings": "feel", "meetings": "meet",
    "earnings": "earn", "savings": "save", "warnings": "warn",
    "paintings": "paint", "recordings": "record",
    "interest": "interest", "united": "unite", "used": "use",
    "based": "base", "fed": "feed", "bred": "breed",
}
# fmt: on


def test_kstem_vector_agreement():
    from pisa_spark.analysis.krovetz import stem

    bad = {w: (stem(w), want) for w, want in VECTORS.items()
           if stem(w) != want}
    rate = 1.0 - len(bad) / len(VECTORS)
    assert rate >= 0.99, (
        f"kstem vector agreement {rate:.1%} < 99%: {bad}"
    )


def test_kstem_idempotent_on_vector_outputs():
    """kstem is a lemmatizer: its outputs are headwords, so stemming
    an output must be a fixed point (sanity for the dictionary and
    restore paths; known non-fixed-point lemmas are excluded —
    'person' -> 'person' holds, but plural-looking lemmas do not
    arise in this table)."""
    from pisa_spark.analysis.krovetz import stem

    outs = set(VECTORS.values())
    moved = {o: stem(o) for o in outs if stem(o) != o}
    # allow the single-character-of-drift budget: none known today
    assert not moved, moved


def test_ics_nominals_curated_not_blanket():
    """Only lexicalized -ics fields of study return whole (kstem's
    dictionary behavior, SIGIR'93's physics example); ordinary -ic
    noun plurals still conflate with their singular."""
    from pisa_spark.analysis.krovetz import stem

    for w in ("physics", "mathematics", "statistics", "economics",
              "politics", "ethics", "genetics", "linguistics"):
        assert stem(w) == w, w
    assert stem("topics") == "topic"
    assert stem("comics") == "comic"
    assert stem("critics") == "critic"
    assert stem("clinics") == "clinic"
    assert stem("basics") == "basic"
