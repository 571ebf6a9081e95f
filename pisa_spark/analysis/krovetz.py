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

- an embedded exception table for irregular forms and ambiguous
  plural classes (all public-knowledge English),
- an embedded MINI HEADWORD DICTIONARY (_HEADWORDS) consulted in
  kstem's own order — bare stem first, then stem+'e' — before any
  shape heuristic runs, and
- shape heuristics as the fallback: undoubling, e-restoration after
  "at|bl|iz", and a cvc e-restore GATED TO ONE-SYLLABLE stems
  (multisyllable cvc stems — offer, visit, target... — are
  overwhelmingly headwords kstem would leave alone).

Behavior on regular inflection matches kstem; on rare
dictionary-dependent cases outside the embedded tables it may
differ — the analyzer accepts ``stemmer="krovetz"`` with these
documented semantics, pinned by the goldens in
tests/test_tokenizer.py and the ~330-pair vector set in
tests/test_krovetz_vectors.py (agreement rate reported in
COVERAGE.md).
"""

from __future__ import annotations

# Irregular forms -> lemma (plural irregulars + common -e words the
# heuristics would otherwise mangle). Dictionary words ending in
# apparent suffixes are mapped to themselves (the kstem "is it a
# headword already?" check for the worst offenders).
_EXCEPTIONS = {
    # inflected forms too short for the length-gated rules
    "using": "use", "dying": "die", "lying": "lie", "tying": "tie",
    "died": "die", "tied": "tie", "lied": "lie",
    # -oes plurals (consonant+o headwords take -es; toes/shoes-style
    # vowel+e singulars are served by the generic -s strip)
    "heroes": "hero", "potatoes": "potato", "tomatoes": "tomato",
    "echoes": "echo", "torpedoes": "torpedo", "vetoes": "veto",
    "mosquitoes": "mosquito", "volcanoes": "volcano",
    "cargoes": "cargo", "dominoes": "domino", "buffaloes": "buffalo",
    "mangoes": "mango", "tornadoes": "tornado", "embargoes": "embargo",
    # -uses is ambiguous (buses->bus but houses->house): the
    # consonant+us headwords are dictionary knowledge
    "buses": "bus", "gases": "gas", "viruses": "virus",
    "bonuses": "bonus", "campuses": "campus", "censuses": "census",
    "statuses": "status", "geniuses": "genius", "choruses": "chorus",
    "circuses": "circus", "surpluses": "surplus",
    "walruses": "walrus", "octopuses": "octopus",
    "apparatuses": "apparatus", "radiuses": "radius",
    # -ies plurals whose singular ends -ie (not -y)
    "movies": "movie", "cookies": "cookie", "zombies": "zombie",
    "calories": "calorie", "prairies": "prairie",
    "rookies": "rookie", "goalies": "goalie", "genies": "genie",
    "sorties": "sortie", "collies": "collie", "pixies": "pixie",
    "brownies": "brownie", "hippies": "hippie", "selfies": "selfie",
    "birdies": "birdie", "newbies": "newbie",
    # Greek/Latin -oses
    "diagnoses": "diagnosis", "neuroses": "neurosis",
    "psychoses": "psychosis",
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
    "christmas": "christmas", "atlas": "atlas", "alias": "alias",
    "bias": "bias", "canvas": "canvas", "pancreas": "pancreas",
    "chaos": "chaos", "cosmos": "cosmos", "pathos": "pathos",
    "ethos": "ethos", "asbestos": "asbestos",
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
    "kindred": "kindred", "naked": "naked", "wicked": "wicked",
    "rugged": "rugged", "jagged": "jagged", "ragged": "ragged",
    "wretched": "wretched", "crooked": "crooked",
    "united": "unite", "used": "use", "based": "base", "need": "need",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
    # -eed: headwords keep it (speed/seed/...); true past forms map
    "agreed": "agree", "freed": "free", "decreed": "decree",
    "guaranteed": "guarantee",
    # core lexicon entries whose suffix strip yields garbage, so any
    # dictionary-backed kstem returns them whole (everything ->
    # everyth, embed -> emb...). Deverbal -ing nouns are NOT protected:
    # the public vector set shows kstem strips them (buildings ->
    # build, meetings -> meet, offerings -> offer).
    "everything": "everything", "something": "something",
    "anything": "anything", "nothing": "nothing",
    "embed": "embed", "infrared": "infrared", "shred": "shred",
}

# Fields of study and other -ics mass nouns that ARE the headword
# (public knowledge; each names a discipline, not a plural of its
# -ic adjective). Everything else in -ics stems normally.
_ICS_NOMINALS = frozenset("""
physics mathematics economics statistics politics athletics genetics
electronics graphics dynamics ethics tactics logistics linguistics
mechanics gymnastics optics acoustics analytics robotics aesthetics
demographics ergonomics semantics forensics aerobics aeronautics
thermodynamics phonetics pragmatics obstetrics pediatrics geriatrics
""".split())

_VOWELS = frozenset("aeiou")

# Mini headword dictionary consulted by _restore — the kstem "is the
# candidate a headword?" check (kstem tries the bare stem, then
# stem+'e', against its lexicon). Common English only (public
# knowledge). Two roles:
#   bare protect: "add" stops the undoubler ("added" -> add, not ad);
#   e-restore:    "cause" rescues stems the shape heuristics cannot
#                 ("caused" -> caus -> cause; the cvc rule never
#                 fires on vowel-vowel-consonant or multi-syllable
#                 endings, by design — see _restore).
_HEADWORDS = frozenset("""
add err inn egg
cause pause clause raise praise please tease cease lease increase
release decrease purchase promise premise surprise advise devise
revise exercise suppose propose expose impose compose oppose dispose
close house arouse browse cleanse collapse eclipse glimpse rinse
sense license response converse reverse traverse disperse immerse
endorse force enforce divorce source announce pronounce denounce
bounce balance advance silence influence experience reference
produce reduce introduce deduce induce seduce replace embrace
argue continue value issue rescue pursue glue queue subdue
invite unite ignite excite incite recite complete compete delete
compute execute contribute distribute dispute salute dilute pollute
constitute substitute promote devote quote demote denote
decide provide divide reside preside collide coincide guide
include exclude conclude
define examine determine imagine combine decline refine confine
machine outline underline undermine
describe prescribe subscribe ascribe inscribe
escape amuse accuse excuse abuse refuse confuse infuse diffuse
achieve believe receive perceive deceive conceive relieve retrieve
derive arrive revive survive deserve reserve observe preserve
conserve serve swerve involve resolve revolve evolve dissolve
improve approve remove prove
require retire desire admire inspire acquire inquire expire
compare declare prepare beware
manage damage encourage discourage engage arrange exchange change
charge discharge enlarge judge acknowledge merge emerge submerge
urge surge purge indulge plunge lunge challenge avenge revenge
schedule measure figure feature capture ensure assure secure endure
procure configure injure picture lecture torture nurture puncture
structure treasure pressure leisure seize
handle enable disable double trouble tackle settle struggle sample
couple title cycle circle battle bottle assemble resemble gamble
scramble compile style smile whistle wrestle rustle hustle bustle
startle trample stumble tumble crumble mumble grumble fumble humble
juggle giggle wiggle toggle smuggle snuggle shuffle muffle ruffle
baffle stifle rifle trifle table cable stable staple maple people
welcome become assume consume resume costume
upgrade invade persuade evade degrade parade blockade
ignore explore restore adore
analyze paralyze catalyze breathe soothe clothe bathe loathe
waste taste paste haste baste
phrase blame frame
""".split()) | frozenset("""
activity awe bra bro brow clean come common content currency curio
earring herring posse xmas
dvd elder era jack kick kill kiss male mean mountain out over pea
pen periodical photo pig pill plea rock sea sell show site spa
symptom tea tee will
cat dog book city country day time year school student work group
problem program question government company number part place week
point hand eye word fact month lot right study job night area money
story issue side kind head service friend father power hour game
line end member law community name president team minute idea body
information back parent face level office door health person art war
history party result change reason research girl guy moment air
teacher force education boy age policy process music market nation
college interest effect class control field development role effort
rate heart drug leader light voice police mind price report decision
son view relationship town road arm difference action model season
society tax director position player record paper space ground form
event official matter center project street image phone picture
piece land product doctor wall patient worker test movie detail
version item unit page file user server system network computer
website link click email account password domain profile comment
message forum topic thread post review rating search result keyword
category section article author editor publisher reader title
chapter volume edition copy print sale order customer client vendor
supplier partner employee manager owner founder investor share
stock fund loan payment deposit credit card bill invoice receipt
discount coupon deal bargain auction bid seller buyer shipment
delivery package box item label brand logo design color style size
weight height length width depth shape pattern material fabric
metal plastic glass wood stone brick wheel engine motor battery
switch button screen display keyboard mouse printer scanner camera
lens speaker cable wire plug socket charger adapter sensor signal
channel frequency wave sound noise volume track album song artist
band concert ticket venue stage audience crowd fan player coach
league tournament match round score goal team captain referee
advertise manufacture merchandise franchise compromise supervise
recognize organize realize emphasize criticize summarize utilize
minimize maximize optimize customize categorize memorize apologize
""".split())


def _has_vowel(w: str) -> bool:
    return any(c in _VOWELS or c == "y" for c in w)


def _vowel_groups(w: str) -> int:
    """Number of maximal vowel runs — a cheap syllable proxy. The cvc
    e-restore below only fires on ONE-syllable stems ("bak" -> bake):
    multisyllable stems ending cvc are overwhelmingly headwords
    already (visit, limit, offer, target, focus, happen, travel...)
    and kstem's dictionary check would leave them alone."""
    n, prev = 0, False
    for c in w:
        isv = c in _VOWELS
        if isv and not prev:
            n += 1
        prev = isv
    return n


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
    """Post-rule repair shared by -ed/-ing removal, in kstem's order:
    dictionary first (bare stem, then stem+'e'), then the shape
    heuristics — undouble a trailing doubled consonant (except
    ll/ss/zz/ff, legitimate English finals) or restore 'e' after the
    classic patterns. The cvc restore is gated to ONE-syllable stems:
    unrestricted it mangled the whole -er/-en/-it/-et multisyllable
    class (offered -> offere, visited -> visite); with the gate those
    fall through untouched, and the genuinely-restoring multisyllable
    stems (invite, complete, escape...) are dictionary rows."""
    if stem in _HEADWORDS:
        return stem
    if (stem + "e") in _HEADWORDS:
        return stem + "e"
    if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] not in "aeioulszf":
        return stem[:-1]
    if stem.endswith(("at", "bl", "iz")) or (
        _ends_cvc(stem) and _vowel_groups(stem) == 1
    ):
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
    # kstem's FIRST move: if the input itself is a lexicon headword it
    # comes back untouched — this is what keeps lexicalized -ing/-ed
    # nouns (building, meeting, training...) whole, not suffix rules.
    if word in _HEADWORDS:
        return word
    # Lexicalized -ics nominals: kstem's lexicon lists the -ics form
    # itself as a headword for fields of study, so those come back
    # unstripped — Krovetz (SIGIR'93) uses exactly this class to
    # motivate the dictionary check ("physics" must not conflate with
    # "physic"). ONLY the curated set below is lexicalized: ordinary
    # -ic noun plurals (topics, comics, critics, clinics) still
    # conflate with their singular through the generic -s strip.
    if word in _ICS_NOMINALS:
        return word

    # ---- plural (kstem step 1)
    if word.endswith("ies") and len(word) > 4:
        word = word[:-3] + "y"
    elif word.endswith(("sses", "shes", "ches", "xes")) and len(word) > 4:
        # common -che headwords (ache, niche, cache) this es-strip
        # would mangle are dictionary knowledge -> _EXCEPTIONS; -e
        # headwords colliding with the pattern (posse+s looks like
        # class+es) get kstem's stem+'e' dictionary restore.
        word = word[:-2]
        if word not in _HEADWORDS and (word + "e") in _HEADWORDS:
            word += "e"
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

    # kstem checks its dictionary after EACH step — re-check the
    # exception table AND the headword dictionary on the
    # de-pluralized form so noun plurals of protected entries stop
    # here ("hundreds" -> "hundred" must not fall through to the
    # past-tense strip -> "hundr"; "causes" -> "cause" stops at the
    # headword). Plurals of -ing deverbals deliberately do NOT stop:
    # "meanings" -> "meaning" -> "mean", matching the vector set's
    # kstem behavior (buildings -> build). A dictionary hit here also
    # marks the strip CONFIRMED rather than rule-only in the
    # COVERAGE.md characterization.
    hit = _EXCEPTIONS.get(word)
    if hit is not None:
        return hit
    if word in _HEADWORDS:
        return word

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
