"""Tokenizer parity tests — golden strings from SURVEY §5.3 / FIXTURES §4
(reference semantics: src/tokenizer.cpp:72-79, tokenizer.hpp:105-112)."""

import pandas as pd

from pisa_spark.analysis import (
    analyze_series,
    english_tokenize_series,
    strip_html_series,
    whitespace_tokenize_series,
)
from pisa_spark.analysis.porter2 import stem


def eng(text: str, **kw) -> list[str]:
    return analyze_series(pd.Series([text]), tokenizer="english", **kw).iloc[0]


def test_abbreviation_class():
    assert eng("U.S.A. rocks") == ["usa", "rocks"]


def test_possessive_class():
    assert eng("dog's bone") == ["dog", "bone"]


def test_mixed_punctuation():
    assert eng("state-of-the-art 2x faster!") == [
        "state", "of", "the", "art", "2x", "faster",
    ]


def test_case_preserved_without_lowercase():
    out = english_tokenize_series(pd.Series(["U.S.A. Dog's"])).iloc[0]
    assert out == ["USA", "Dog"]


def test_empty_and_null():
    s = pd.Series(["", None, "  ", "one"])
    out = english_tokenize_series(s).tolist()
    assert out == [[], [], [], ["one"]]


def test_whitespace_tokenizer():
    out = whitespace_tokenize_series(pd.Series(["a  b\tc\n d", ""])).tolist()
    assert out == [["a", "b", "c", "d"], []]


def test_stopwords():
    assert eng("the cat and the hat", stopwords=frozenset({"the", "and"})) == [
        "cat", "hat",
    ]


def test_strip_html():
    html = "<html><head><style>p{}</style></head><body><p>Hello <b>world</b></p>" \
           "<script>var x=1;</script><!-- c --></body></html>"
    assert strip_html_series(pd.Series([html])).iloc[0] == "Hello world"


def test_html_roundtrip_invariant():
    # The corpus generator wraps text as <html><body>{text}</body></html>;
    # extraction must return the byte-identical text (FIXTURES §1).
    text = "the quick brown fox 42"
    html = f"<html><body>{text}</body></html>"
    assert strip_html_series(pd.Series([html])).iloc[0] == text


def test_porter2_basics():
    assert stem("running") == "run"
    assert stem("cats") == "cat"
    assert stem("skies") == "sky"
    assert stem("dying") == "die"
    assert stem("ties") == "tie"
    assert stem("at") == "at"  # <=2 letters untouched
    assert stem("nationalization") == stem("nationalize")


def test_analyze_with_stemmer():
    assert eng("running dogs", stemmer="porter2") == ["run", "dog"]


KROVETZ_GOLDENS = {
    # regular inflection (kstem rule cascade)
    "cities": "city", "boxes": "box", "watches": "watch",
    "horses": "horse", "dogs": "dog", "glasses": "glass",
    "stopped": "stop", "baked": "bake", "tried": "try",
    "walked": "walk", "running": "run", "flying": "fly",
    "making": "make", "hoping": "hope", "sitting": "sit",
    "queries": "query", "hashed": "hash", "scanned": "scan",
    # vowel+ze plurals keep the e; consonant+z and doubled-z plurals
    # drop -es (singular/plural must meet at one term); un-doubling
    # and -che forms resolve via the exception table
    "sizes": "size", "prizes": "prize", "freezes": "freeze",
    "organizes": "organize", "analyzes": "analyze", "gazes": "gaze",
    "waltzes": "waltz", "blitzes": "blitz", "klutzes": "klutz",
    "quartzes": "quartz", "spritzes": "spritz", "topazes": "topaz",
    "quizzes": "quiz", "buzzes": "buzz", "fizzes": "fizz",
    "aches": "ache",
    "niches": "niche", "caches": "cache", "churches": "church",
    # irregulars via the embedded exception table
    "children": "child", "men": "man", "feet": "foot",
    "knives": "knife", "indices": "index", "agreed": "agree",
    # protected headwords: no false stemming
    "news": "news", "series": "series", "during": "during",
    "thing": "thing", "king": "king", "morning": "morning",
    "red": "red", "bus": "bus", "this": "this", "speed": "speed",
    # non-alpha / short tokens pass through
    "x1y2": "x1y2", "at": "at",
}


def test_krovetz_goldens():
    from pisa_spark.analysis.krovetz import stem as kstem

    for w, want in KROVETZ_GOLDENS.items():
        assert kstem(w) == want, (w, kstem(w), want)


def test_analyze_with_krovetz():
    assert eng("running dogs and children", stemmer="krovetz") == [
        "run", "dog", "and", "child",
    ]


# ------------------------------------------------------- native JVM parity

ADVERSARIAL = [
    "The U.S.A. is big",
    "crawler's archive, isn't it",
    "a.b.c. x1y2 42 don't O'Neill's",
    "  leading   spaces\tand\ttabs\n",
    "",
    "...",
    "ABC.D.E.  mixed-Case WORDS",
    "apostrophe' trailing 'leading",
    "num0bers m1x3d w1th t3xt",
]


def test_native_analyzer_matches_pandas(spark):
    """native_terms_col must be token-for-token identical to
    analyze_series for every stemmer-free config."""
    import pandas as pd

    from pisa_spark.analysis import analyze_series
    from pisa_spark.build.forward import native_terms_col
    from pisa_spark.config import AnalyzerConfig

    df = spark.createDataFrame(
        pd.DataFrame({"text": ADVERSARIAL}), schema="text string"
    )
    for cfg in [
        AnalyzerConfig(tokenizer="english"),
        AnalyzerConfig(tokenizer="whitespace"),
        AnalyzerConfig(tokenizer="english", lowercase=False),
        AnalyzerConfig(tokenizer="english", stopwords=frozenset({"the", "is"})),
    ]:
        col = native_terms_col(cfg)
        assert col is not None
        got = [r["t"] for r in df.select(col.alias("t")).collect()]
        want = analyze_series(
            pd.Series(ADVERSARIAL),
            tokenizer=cfg.tokenizer,
            lowercase=cfg.lowercase,
            stopwords=cfg.stopwords,
        ).tolist()
        assert got == want, f"mismatch for {cfg}"


def test_native_analyzer_gated_for_stemmer():
    from pisa_spark.build.forward import native_terms_col
    from pisa_spark.config import AnalyzerConfig

    assert native_terms_col(AnalyzerConfig(stemmer="porter2")) is None
    assert native_terms_col(AnalyzerConfig(strip_html=True)) is None



def test_trec_topics_and_query_lines(spark, tmp_path):
    """extract_topics -f trec parity (tools/extract_topics.cpp:30-46
    via trec_topic_reader.hpp): optional attribute labels and closing
    tags, multi-line fields, num:title output lines."""
    from pisa_spark.query.prep import topics_to_query_lines, trec_topics

    (tmp_path / "topics.txt").write_text(
        "<top>\n<num> Number: 301 </num>\n"
        "<title> International Organized Crime </title>\n"
        "<desc> Description:\nIdentify organizations\nacross borders"
        " </desc>\n<narr> Narrative: Relevant docs discuss it.\n"
        "</narr>\n</top>\n"
        "<top>\n<num>302\n<title>Poliomyelitis and Post-Polio\n"
        "<desc>\nIs the disease rising?\n<narr>\nAny mention.\n"
        "</top>\n"
    )
    t = trec_topics(spark, str(tmp_path / "topics.txt")).toPandas()
    t = t.sort_values("num").reset_index(drop=True)
    assert list(t["num"]) == ["301", "302"]
    assert t["title"][0] == "International Organized Crime"
    assert t["title"][1] == "Poliomyelitis and Post-Polio"
    assert t["desc"][0] == "Identify organizations\nacross borders"
    assert t["narr"][1] == "Any mention."

    lines = topics_to_query_lines(
        trec_topics(spark, str(tmp_path / "topics.txt")), "title"
    ).toPandas()
    assert sorted(lines["line"]) == [
        "301:International Organized Crime",
        "302:Poliomyelitis and Post-Polio",
    ]

    # fields are located independently: a topic missing <desc>/<narr>
    # or carrying an extra <smry> section still parses (older TREC
    # sets do both) — it must not be silently skipped
    (tmp_path / "topics.txt").write_text(
        "<top>\n<num>51\n<title>Airbus Subsidies\n"
        "<smry> Summary text that is not a kept field\n</top>\n"
        "<top>\n<num>52\n<title>South African Sanctions\n"
        "<desc>Document will discuss sanctions.\n</top>\n"
    )
    t = trec_topics(spark, str(tmp_path / "topics.txt")).toPandas()
    t = t.sort_values("num").reset_index(drop=True)
    assert list(t["num"]) == ["51", "52"]
    assert t["title"][0] == "Airbus Subsidies"
    assert t["desc"][0] == "" and t["narr"][0] == ""
    assert t["desc"][1] == "Document will discuss sanctions."


def test_aol_queries_filters_and_unique(spark):
    from pisa_spark.query.prep import aol_queries

    rows = [
        (0, "u1\tbig cats\t2006"),
        (1, "u2\t-\t2006"),
        (2, "u3\t\t2006"),
        (3, "u4\tbig cats\t2006"),
        (4, "u5\tzebras\t2006"),
    ]
    lines = spark.createDataFrame(rows, "line_no bigint, value string")
    q = aol_queries(lines).toPandas().sort_values("query_id")
    assert list(q["query_id"]) == ["0", "3", "4"]
    assert list(q["query"]) == ["big cats", "big cats", "zebras"]
    uq = aol_queries(lines, unique=True).toPandas()
    uq = uq.sort_values("query_id").reset_index(drop=True)
    assert list(uq["query_id"]) == ["0", "1"]
    assert list(uq["query"]) == ["big cats", "zebras"]  # std::set order


def test_stem_query_lines_keeps_id_prefix(spark):
    """QueryStemmer parity (query_stemmer.hpp:15-35): colon id kept,
    english tokens lowercased+stemmed, single-space joined."""
    from pisa_spark.query.prep import stem_query_lines

    lines = spark.createDataFrame(
        [("q301:Running QUICKLY, towards cities",),
         ("no prefix Walking here",)],
        "line string",
    )
    got = sorted(
        stem_query_lines(lines, stemmer="porter2").toPandas()["line"]
    )
    assert got[0] == "no prefix walk here"
    assert got[1] == "q301:run quick toward citi"

    plain = sorted(stem_query_lines(lines).toPandas()["line"])
    assert plain[1] == "q301:running quickly towards cities"


def test_map_query_lines_order_and_duplicates(spark):
    """map_queries parity (tools/map_queries.cpp:25-32): ids in
    original token order WITH duplicates, OOV dropped, optional id
    prefix and custom separator."""
    from pisa_spark.query.prep import map_query_lines

    lex = spark.createDataFrame(
        [("dog", 3), ("run", 1), ("cat", 2)], "term string, term_id long"
    )
    lines = spark.createDataFrame(
        [(0, "q1:Dogs running dogs unknownword"), (1, "cats only"),
         (2, "q9:xyzzy frobnitz")],
        "line_no bigint, line string",
    )
    got = map_query_lines(
        lines, lex, stemmer="porter2"
    ).toPandas().sort_values("line_no")
    # all-OOV lines render as an empty id list, never vanish — the
    # tool prints one output line per input query
    assert list(got["line"]) == ["q1:3 1 3", "2", "q9:"]

    noid = map_query_lines(
        lines, lex, stemmer="porter2", separator=",",
        print_query_id=False,
    ).toPandas().sort_values("line_no")
    assert list(noid["line"]) == ["3,1,3", "2", ""]


def test_strip_html_comment_opener_inside_script():
    """'<!--' inside a script body must not open a comment that
    swallows visible text up to a later real comment (script/style
    subtrees strip first, the reference's order)."""
    html = "<script>if(a<!--b){}</script><p>Hello</p><!-- note -->"
    assert strip_html_series(pd.Series([html])).iloc[0] == "Hello"


def test_filter_query_lines_matches_reference_script(spark):
    """script/filter_query.py semantics: tab-separated term count,
    exact match by default, >= with include_longer."""
    import pandas as pd

    from pisa_spark.query.prep import filter_query_lines

    lines = spark.createDataFrame(
        pd.DataFrame({"value": ["a", "a\tb", "a\tb\tc", "x\ty", ""]})
    )
    exact = [r.value for r in filter_query_lines(lines, 2).collect()]
    assert sorted(exact) == ["a\tb", "x\ty"]
    # blank line = 0 fields (csv.reader semantics), not 1
    assert filter_query_lines(lines, 1).count() == 1  # just "a"
    blank = [r.value for r in
             filter_query_lines(lines, 0, include_longer=False).collect()]
    assert blank == [""]
    longer = [
        r.value
        for r in filter_query_lines(lines, 2, include_longer=True).collect()
    ]
    assert sorted(longer) == ["a\tb", "a\tb\tc", "x\ty"]


def test_to_trec_format_matches_reference_script(spark):
    """script/files2trec.py TREC_FORMAT block, id in DOCNO."""
    import pandas as pd

    from pisa_spark.corpus import to_trec_format

    docs = spark.createDataFrame(
        pd.DataFrame({"url": ["d1"], "text": ["hello world"]})
    )
    (row,) = to_trec_format(docs).collect()
    assert row.trec == (
        "<DOC>\n<DOCNO>d1</DOCNO>\n<TEXT>\nhello world</TEXT>\n</DOC>\n"
    )
