"""Segment stage: postings -> block-encoded immutable index segments.

Physical layout (per FIXTURES.md §3, modeled on the reference's
``block_posting_list`` writer, block_posting_list.hpp:12-50):

  segments(term_id long, block_id long, count int, max_doc_id long,
           max_score float, doc_bytes binary, tf_bytes binary,
           len_bytes binary)

- 128-posting blocks (codec/simdbp.hpp:13 block size);
- ``doc_bytes``: the block's first docID *absolute*, then gaps-1 —
  unlike the reference (whose first gap chains from the previous
  block via the block-max array) every block here is self-contained,
  which lets BMW skip straight into any block without touching its
  neighbor and lets buckets encode independently;
- ``tf_bytes``: tf-1 per posting (same trick as the reference);
- ``len_bytes``: doc_len-1 per posting (doc_len >= 1 whenever a
  posting exists). The reference keeps document lengths WITH the wand
  data (wand_data.hpp:38-117, mmapped next to the index) rather than
  at the coordinator; the Spark shape of that design is doc lengths
  riding inside the blocks, so query kernels never need a
  driver-collected doc-length array or a per-executor broadcast —
  at 10^11+ docs either would be a hard scale-killer. The payload
  costs ~1 varint byte/posting and compresses like tf;
- ``max_score``: per-block BM25 upper bound (the WAND/BMW block-max
  metadata, wand_utils.hpp:23-54), computed in float64 and rounded
  *up* into float32 so pruning bounds stay sound under either score
  precision.

Head-term skew (north rule): Zipf head terms have posting lists far
bigger than one task. Postings are salted into ``doc_id //
salt_bucket_docs`` buckets *before* the groupBy, so no single task
ever materializes a full head-term list; buckets cover disjoint
ordered docID ranges, so concatenating their blocks in (bucket,
position) order yields exactly the docID-sorted list — this replaces
the reference's serial ``merge_batches`` (invert.cpp:167-238) with a
shuffle-parallel merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pisa_spark.codecs import CODECS
from pisa_spark.config import BM25Params, IndexConfig
from pisa_spark.functions.scoring import bm25_score_np


def _round_up_f32(x: np.ndarray) -> np.ndarray:
    f = x.astype(np.float32)
    lower = f.astype(np.float64) < x
    f[lower] = np.nextafter(f[lower], np.float32(np.inf))
    return f


def blocks_per_bucket(cfg: IndexConfig) -> int:
    """block_id stride per salt bucket — must be >= the max possible
    blocks a (term, bucket) group can produce, so bucket-local block
    ids never collide across buckets and (bucket, position) order is
    exactly docID order. Fixed blocks: ceil(bucket/block)+slack;
    variable blocks can in principle be 1 posting each, so the stride
    is the bucket's doc capacity."""
    if cfg.block_partition == "variable":
        return cfg.salt_bucket_docs + 2
    return cfg.salt_bucket_docs // cfg.block_size + 2


def scored_postings(
    postings: DataFrame,
    doc_sizes: DataFrame,
    lexicon: DataFrame,
    num_docs: int,
    avg_len: float,
    lexicon_size: int | None = None,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """postings + the per-posting columns BM25 needs (df, doc_len).

    Postings that already carry ``doc_len`` (build_postings
    ``carry_doc_len=True`` — the full-build paths) skip the
    postings ⨝ doc_sizes join entirely: that join re-shuffles every
    corpus pair on doc_id, the single biggest avoidable byte-move in
    the build. Without the column it stays a doc_id co-partitioned
    big-big join (AQE-planned). The lexicon df join is broadcast only
    when the vocabulary is known small (invert.maybe_broadcast) —
    never force-broadcast a web-scale vocabulary.
    """
    from pisa_spark.build.invert import maybe_broadcast

    lex_side = maybe_broadcast(
        lexicon.select("term_id", "df"), lexicon_size, broadcast_threshold
    )
    if "doc_len" in postings.columns:
        base = postings
    else:
        base = postings.join(doc_sizes.select("doc_id", "doc_len"), "doc_id")
    return (
        base.join(lex_side, "term_id")
        .select("term_id", "doc_id", "tf", "doc_len", "df")
    )


def build_segments(
    scored: DataFrame,
    num_docs: int,
    avg_len: float,
    index_cfg: IndexConfig | None = None,
    bm25: BM25Params | None = None,
    index_max_score: float | None = None,
) -> DataFrame:
    """scored postings -> segments (see module docstring for layout).

    With ``index_cfg.quantize_bits`` set, the tf slot stores the
    linearly quantized impact instead (``ceil(score * 2^bits /
    index_max_score)``, reference linear_quantizer.hpp:8-26 +
    quantized build src/compress.cpp:72-91); ``index_max_score`` (the
    index-wide max term weight, wand_data ``index_max_term_weight``)
    is then required. Query-side the ``quantized`` scorer returns the
    stored impact as-is (scorer/quantized.hpp)."""
    cfg = index_cfg or IndexConfig()
    params = bm25 or BM25Params()
    if cfg.quantize_bits and not index_max_score:
        raise ValueError("quantized build requires index_max_score")
    encode, _ = CODECS[cfg.codec]
    block = cfg.block_size
    bucket_docs = cfg.salt_bucket_docs
    stride = blocks_per_bucket(cfg)  # block_id stride per bucket
    variable = cfg.block_partition == "variable"
    lam = cfg.block_lambda

    out_schema = (
        "term_id long, block_id long, count int, max_doc_id long, "
        "max_score float, doc_bytes binary, tf_bytes binary, "
        "len_bytes binary"
    )

    fast_varint = cfg.codec == "varint"

    def encode_one(term_id: int, bucket: int, docs: np.ndarray,
                   tfs: np.ndarray, dls: np.ndarray, scores: np.ndarray,
                   acc: dict) -> None:
        """Encode ONE doc-sorted (term, bucket) group into ``acc``."""
        if cfg.quantize_bits:
            # impact quantization: the tf slot carries q instead of tf
            q = np.ceil(
                scores * float(1 << cfg.quantize_bits) / float(index_max_score)
            ).astype(np.uint64)
            tfs = np.maximum(q, 1)
            scores = tfs.astype(np.float64)  # block maxes bound q sums
        n = len(docs)
        if variable:
            # Score-optimal boundaries (VSBMW DP, build/varblock.py):
            # cuts follow the score distribution instead of a fixed
            # stride, so each block's max is a tight bound.
            from pisa_spark.build.varblock import score_opt_partition

            ends = score_opt_partition(scores, fixed_cost=lam)
            starts = np.concatenate(([0], ends[:-1]))
        else:
            starts = np.arange(0, n, block)
            ends = np.minimum(starts + block, n)
        # whole-list payload: gaps-1 everywhere, block-leading values
        # absolute (each block self-contained)
        payload = np.empty(n, dtype=np.uint64)
        payload[0] = docs[0]
        payload[1:] = docs[1:] - docs[:-1] - 1
        payload[starts] = docs[starts]
        block_max = _round_up_f32(np.maximum.reduceat(scores, starts))

        if fast_varint:
            # varint is per-value: encode ONCE, slice per block
            from pisa_spark.codecs.varint import varint_sizes

            d_off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(varint_sizes(payload), out=d_off[1:])
            t_off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(varint_sizes(tfs - 1), out=t_off[1:])
            l_off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(varint_sizes(dls - 1), out=l_off[1:])
            d_enc = encode(payload)
            t_enc = encode(tfs - 1)
            l_enc = encode(dls - 1)
            doc_bytes = [d_enc[d_off[s]:d_off[e]] for s, e in zip(starts, ends)]
            tf_bytes = [t_enc[t_off[s]:t_off[e]] for s, e in zip(starts, ends)]
            len_bytes = [l_enc[l_off[s]:l_off[e]] for s, e in zip(starts, ends)]
        else:
            doc_bytes = [encode(payload[s:e]) for s, e in zip(starts, ends)]
            tf_bytes = [encode(tfs[s:e] - 1) for s, e in zip(starts, ends)]
            len_bytes = [encode(dls[s:e] - 1) for s, e in zip(starts, ends)]

        base_block_id = bucket * stride
        nb = len(starts)
        acc["term_id"].append(np.full(nb, term_id, dtype=np.int64))
        acc["block_id"].append(
            base_block_id + np.arange(nb, dtype=np.int64))
        acc["count"].append((ends - starts).astype(np.int32))
        acc["max_doc_id"].append(docs[ends - 1].astype(np.int64))
        acc["max_score"].append(block_max)
        acc["doc_bytes"].extend(doc_bytes)
        acc["tf_bytes"].extend(tf_bytes)
        acc["len_bytes"].extend(len_bytes)

    def _encode_frame(pdf: pd.DataFrame, gstarts: np.ndarray) -> pd.DataFrame:
        """Encode every group in ``pdf`` (rows sorted by term_id,
        bucket, doc_id; groups start at ``gstarts``) in one pass:
        columns convert to numpy ONCE, each group is a zero-copy
        slice — no per-group pandas frames."""
        t = pdf["term_id"].to_numpy(np.int64)
        b = pdf["bucket"].to_numpy(np.int64)
        docs_a = pdf["doc_id"].to_numpy(np.uint64)
        tfs_a = pdf["tf"].to_numpy(np.uint64)
        dls_a = pdf["doc_len"].to_numpy(np.uint64)
        scores_a = bm25_score_np(
            pdf["tf"].to_numpy(np.float64),
            pdf["df"].to_numpy(np.float64),
            pdf["doc_len"].to_numpy(np.float64),
            float(num_docs),
            float(avg_len),
            k1=params.k1,
            b=params.b,
        )
        acc: dict = {
            "term_id": [], "block_id": [], "count": [],
            "max_doc_id": [], "max_score": [],
            "doc_bytes": [], "tf_bytes": [], "len_bytes": [],
        }
        bounds = np.concatenate((gstarts, [len(t)]))
        for s, e in zip(bounds[:-1], bounds[1:]):
            encode_one(int(t[s]), int(b[s]), docs_a[s:e], tfs_a[s:e],
                       dls_a[s:e], scores_a[s:e], acc)
        return pd.DataFrame(
            {
                "term_id": np.concatenate(acc["term_id"]),
                "block_id": np.concatenate(acc["block_id"]),
                "count": np.concatenate(acc["count"]),
                "max_doc_id": np.concatenate(acc["max_doc_id"]),
                "max_score": np.concatenate(acc["max_score"]),
                "doc_bytes": acc["doc_bytes"],
                "tf_bytes": acc["tf_bytes"],
                "len_bytes": acc["len_bytes"],
            }
        )

    def kernel(batches):
        """Stream the partition's Arrow batches, cutting complete
        (term, bucket) groups at key-change boundaries and carrying
        the trailing (possibly batch-spanning) group forward. One
        Python call per BATCH instead of per group: profiling showed
        per-group applyInPandas machinery costing more than the
        encode math itself at web-scale vocabularies (~20k+ groups).
        The carry is a LIST of batch tails concatenated only when its
        group completes (no quadratic recopying for head-term groups
        spanning many batches); peak memory stays bounded by one salt
        bucket — the same bound the groupBy path had."""
        carry: list[pd.DataFrame] = []  # tail frames of ONE group
        carry_key: tuple[int, int] | None = None

        def flush_carry() -> pd.DataFrame:
            g = (carry[0] if len(carry) == 1
                 else pd.concat(carry, ignore_index=True))
            return _encode_frame(g.reset_index(drop=True),
                                 np.array([0], dtype=np.int64))

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            t = pdf["term_id"].to_numpy(np.int64)
            b = pdf["bucket"].to_numpy(np.int64)
            if carry and (int(t[0]), int(b[0])) != carry_key:
                yield flush_carry()
                carry, carry_key = [], None
            chg = np.flatnonzero(
                (t[1:] != t[:-1]) | (b[1:] != b[:-1])) + 1
            if len(chg) == 0:
                # whole batch continues (or starts) one group
                carry.append(pdf)
                carry_key = (int(t[0]), int(b[0]))
                continue
            first, last = int(chg[0]), int(chg[-1])
            if carry:
                carry.append(pdf.iloc[:first])
                yield flush_carry()
                carry, carry_key = [], None
            else:
                first = 0
            # complete inner groups: [first, last)
            if last > first:
                gstarts = np.concatenate(
                    ([first], chg[(chg > first) & (chg < last)], ))
                yield _encode_frame(
                    pdf.iloc[first:last].reset_index(drop=True),
                    gstarts - first)
            carry = [pdf.iloc[last:]]
            carry_key = (int(t[last]), int(b[last]))
        if carry:
            yield flush_carry()

    salted = scored.withColumn(
        "bucket", (F.col("doc_id") / F.lit(bucket_docs)).cast("long")
    )
    parted = salted.repartition("term_id", "bucket").sortWithinPartitions(
        "term_id", "bucket", "doc_id"
    )
    return parted.mapInPandas(kernel, out_schema)


def compress_block_maxes(segments: DataFrame, term_meta: DataFrame) -> DataFrame:
    """f32 per-block max_score -> u8 ``max_score_q`` relative to the
    term's global max (wand_data_compressed parity,
    wand_data_compressed.hpp quantized payload).

    q = min(255, floor(b * 255 / tmax) + 2): the floor+2 dominates
    ceil of the exact ratio even after f64 rounding, so the recovered
    bound q/255 * tmax is ALWAYS >= the true block max (one-sided,
    like every other bound in the engine); q == 255 recovers tmax
    itself, which bounds every block. Query-side recovery happens in
    the executor from the term_meta max the kernels already join."""
    tmax = term_meta.select("term_id", F.col("max_score").alias("__tmax"))
    q = F.least(
        F.lit(255),
        (F.floor(F.col("max_score") * 255.0 / F.col("__tmax")) + 2).cast("int"),
    )
    return (
        segments.join(tmax, "term_id")
        .withColumn("max_score_q", q)
        .drop("max_score", "__tmax")
    )


def build_term_meta(scored: DataFrame, num_docs: int, avg_len: float,
                    bm25: BM25Params | None = None) -> DataFrame:
    """Per-term WAND metadata (wand_data.hpp:159-169): df,
    occurrence_count, max BM25 score. Small (|vocab| rows) —
    broadcastable to query kernels."""
    params = bm25 or BM25Params()
    from pisa_spark.functions.scoring import bm25_sql_expr

    expr = bm25_sql_expr(
        tf="tf", df="df", doc_len="doc_len",
        num_docs=str(float(num_docs)), avg_len=str(float(avg_len)),
        k1=params.k1, b=params.b,
    )
    return (
        scored.withColumn("score", F.expr(expr))
        .groupBy("term_id")
        .agg(
            F.max("df").alias("df"),
            F.sum("tf").cast("long").alias("occurrence_count"),
            F.max("score").alias("max_score"),
        )
    )


def decode_segments(segments: DataFrame, index_cfg: IndexConfig | None = None,
                    include_len: bool = False) -> DataFrame:
    """segments -> postings(term_id, doc_id, tf[, doc_len]): the
    verification decode pass (util/verify_collection.hpp,
    compress.cpp:108-110). Every block is self-contained, so this is
    a stateless mapInPandas. ``include_len`` also decodes the inline
    per-posting doc lengths (checked against doc_sizes in tests)."""
    from typing import Iterator

    cfg = index_cfg or IndexConfig()
    _, decode = CODECS[cfg.codec]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            outs = []
            for row in b.itertuples(index=False):
                n = int(row.count)
                payload = decode(bytes(row.doc_bytes), n).astype(np.uint64)
                docs = payload.copy()
                docs[1:] += 1
                docs = np.cumsum(docs)
                tfs = decode(bytes(row.tf_bytes), n).astype(np.int64) + 1
                cols = {
                    "term_id": np.full(n, row.term_id, dtype=np.int64),
                    "doc_id": docs.astype(np.int64),
                    "tf": tfs.astype(np.int32),
                }
                if include_len:
                    cols["doc_len"] = (
                        decode(bytes(row.len_bytes), n).astype(np.int64) + 1
                    ).astype(np.int32)
                outs.append(pd.DataFrame(cols))
            base = {"term_id": [], "doc_id": [], "tf": []}
            if include_len:
                base["doc_len"] = []
            yield pd.concat(outs) if outs else pd.DataFrame(base)

    schema = "term_id long, doc_id long, tf int"
    if include_len:
        schema += ", doc_len int"
    return segments.mapInPandas(kernel, schema)
