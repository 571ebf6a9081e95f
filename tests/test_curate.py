"""End-to-end curation pipeline (scripts/curate.py) over sf0.001.

Pins the composition contract: each stage only ever REMOVES docs, the
planted failure modes are removed at the right stage, and the output
is reproducible (deterministic sampling)."""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from curate import curate  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_curate_lineage_and_planted_failures(spark, tmp_path):
    from pisa_spark.datapipe.dedup import DECON_MOD, DECON_REM

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    base = docs.toPandas()
    next_id = int(base.doc_id.max()) + 1
    donor = base.iloc[0]["text"]
    planted = pd.DataFrame(
        {
            "doc_id": [next_id, next_id + 1, next_id + 2],
            "text": [
                "spam " * 40,          # degenerate repetition -> quality
                donor,                  # exact dup of doc 0 -> dedup
                "tiny doc",             # under min_tokens -> quality
            ],
            "lang": ["en", "en", "en"],
            "source": ["synthetic"] * 3,
            "n_chars": [200, len(donor), 8],
        }
    )
    full = docs.unionByName(
        spark.createDataFrame(
            planted, schema="doc_id long, text string, lang string, "
                            "source string, n_chars long"
        )
    )

    curated, lineage = curate(spark, full)
    out = curated.toPandas()

    # monotone shrink through the stages
    assert (lineage["input"] >= lineage["quality_filtered"]
            >= lineage["after_exact_dedup"]
            >= lineage["after_dedup"]
            >= lineage["after_decontamination"] == lineage["output"])
    # the LSH bucket-cap audit count always rides the lineage
    assert lineage["minhash_dropped_buckets"] >= 0
    assert lineage["input"] == 203

    got = set(out.doc_id)
    assert next_id not in got          # repetition-filtered
    assert next_id + 2 not in got      # too short
    # the exact-dup pair keeps EXACTLY the representative (min id)
    assert 0 in got and next_id + 1 not in got
    # no benchmark docs in the curated output
    assert all(d % DECON_MOD != DECON_REM for d in got)
    # text is the redacted form (column still present, same schema)
    assert set(out.columns) == {"doc_id", "lang", "source", "n_chars", "text"}
    # n_chars describes the POST-redaction text, not stale metadata
    assert (out.n_chars == out.text.str.len()).all()

    # external benchmark table: docs sharing a 5-gram with it are
    # dropped — including the benchmark docs themselves when they sit
    # in the training corpus (the classic self-contamination case)
    bench = docs.filter("doc_id in (1, 2, 5)").select("doc_id", "text")
    cb, lb = curate(spark, full, bench=bench)
    got_b = set(r.doc_id for r in cb.select("doc_id").collect())
    assert not {1, 2, 5} & got_b
    assert lb["after_decontamination"] < lb["after_dedup"]

    # decontamination must run on RAW text: the benchmark's ONLY
    # 5-gram spans an email token (5 tokens, email in the middle), so
    # it can match the training doc only if decon sees pre-redaction
    # text — redact-then-decon would rewrite the train-side token to
    # <EMAIL> and silently miss the contamination
    leak = "contact agent.k@example.org hidden answer key"
    train_text = ("many varied ordinary sentences discuss weather "
                  "travel music history science " + leak +
                  " and then continue about cooking gardens rivers")
    pii_doc = spark.createDataFrame(
        pd.DataFrame({"doc_id": [next_id + 9], "text": [train_text],
                      "lang": ["en"], "source": ["synthetic"],
                      "n_chars": [len(train_text)]}),
        schema="doc_id long, text string, lang string, source string, "
               "n_chars long")
    bench_pii = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [leak]}),
        schema="doc_id long, text string")
    cp, _ = curate(spark, docs.unionByName(pii_doc), bench=bench_pii)
    assert next_id + 9 not in set(r.doc_id for r in
                                  cp.select("doc_id").collect())

    # deterministic sampling: same mix + seed -> identical output set
    mix = {"en": 0.6, "fr": 0.4}
    c1, l1 = curate(spark, full, mix=mix, seed=11)
    c2, l2 = curate(spark, full, mix=mix, seed=11)
    ids1 = sorted(r.doc_id for r in c1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in c2.select("doc_id").collect())
    assert ids1 == ids2
    assert l1["after_sampling"] <= l1["after_decontamination"]
    assert {r.lang for r in c1.select("lang").distinct().collect()} \
        <= {"en", "fr"}


def test_mix_to_rates_targets_output_proportions(spark):
    from pisa_spark.datapipe.curation import mix_to_rates

    # 900 en / 100 fr corpus, target 50/50 output: fr binds (C=200
    # docs per unit proportion), so en keeps 100/900 and fr keeps all
    # 100 -> expected output 100/100, exactly the target mix
    rows = [(i, "en" if i < 900 else "fr") for i in range(1000)]
    docs = spark.createDataFrame(rows, schema="doc_id long, lang string")
    rates = mix_to_rates(docs, "lang", {"en": 0.5, "fr": 0.5})
    assert abs(rates["en"] - 100 / 900) < 1e-9
    assert abs(rates["fr"] - 1.0) < 1e-9
    # expected kept counts are proportional to the mix
    assert abs(rates["en"] * 900 - rates["fr"] * 100) < 1e-6

    # strata missing from the corpus or the mix get rate 0
    rates2 = mix_to_rates(docs, "lang", {"en": 0.7, "de": 0.3})
    assert rates2["de"] == 0.0 and 0 < rates2["en"] <= 1.0


def test_curate_catches_over_cap_exact_dup_group(spark):
    """100 identical copies of one page share EVERY MinHash band
    bucket, so the bucket cap (MAX_BUCKET=64) drops them from the LSH
    pass entirely — the exact-dedup stage must still collapse the
    group to one representative (it used to pass all copies through
    as 'deduplicated')."""
    from pisa_spark.datapipe.dedup import MAX_BUCKET

    n_copies = MAX_BUCKET + 36
    # no internal repetition: the copies must SURVIVE the quality
    # stage so the dedup stage is what removes them
    boiler = ("all rights reserved copyright notice terms of service "
              "privacy policy contact us about frequently asked "
              "questions sitemap careers press media partners help")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    start = 10_000
    planted = pd.DataFrame(
        {
            "doc_id": range(start, start + n_copies),
            "text": [boiler] * n_copies,
            "lang": ["en"] * n_copies,
            "source": ["synthetic"] * n_copies,
            "n_chars": [len(boiler)] * n_copies,
        }
    )
    full = base.unionByName(
        spark.createDataFrame(
            planted, schema="doc_id long, text string, lang string, "
                            "source string, n_chars long"
        )
    )
    curated, lineage = curate(spark, full)
    out_ids = {r.doc_id for r in curated.select("doc_id").collect()}
    kept_copies = out_ids & set(range(start, start + n_copies))
    # exactly ONE representative of the boilerplate group survives
    assert kept_copies == {start}
    assert (lineage["after_exact_dedup"]
            <= lineage["quality_filtered"] - (n_copies - 1))
