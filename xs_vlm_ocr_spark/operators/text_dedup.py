"""Near-duplicate detection for training-data pipelines.

Four families, each with the 100 TB plan shape in mind:

  * exact          — md5 groupBy (operators.dedup.exact_dedup)
  * n-gram Jaccard — shingle explode -> self-equi-join on shingle ->
                     pair-count groupBy -> Jaccard filter. All JVM-side;
                     the join key is the shingle hash (long), so the
                     shuffle carries (hash, doc_id) pairs only.
  * MinHash + LSH  — per-doc signature (vectorized pandas UDF over
                     xxhash-mixed shingle hashes), banded into buckets;
                     candidate pairs only within a bucket (the scale
                     path: no all-pairs join ever materializes).
  * SimHash        — 64-bit fingerprint via sign-sum of per-token
                     hashes; near-dups = equal bands / small Hamming
                     distance.

Determinism: all hashing is xxhash64 (Spark built-in) or a seeded
splitmix64 in the UDF — no Python hash() anywhere.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------ shingling

def with_word_shingles(df: DataFrame, text_col: str = "text", n: int = 3,
                       id_col: str = "doc_id") -> DataFrame:
    """Explode docs into word n-gram shingle hashes: (doc_id, shingle).

    Tokens are lowercase whitespace words; the shingle key is
    xxhash64(n-gram string) — an 8-byte join key instead of the string.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(grams)).alias("_g"))
        .filter(F.col("_g") != "")
        .select("doc_id", F.xxhash64("_g").alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", n: int = 3,
                        threshold: float = 0.8, id_col: str = "doc_id") -> DataFrame:
    """All doc pairs with shingle-set Jaccard >= threshold.

    inter/(|A|+|B|-inter) with sizes from a broadcastable per-doc count.
    a<b ordering dedups the symmetric pair. At scale the shingle join is
    the shuffle; hot shingles (stopword grams) can be frequency-capped
    upstream — here df sizes are modest and AQE skew-split covers it.
    """
    # persist: the self-join + sizes agg would otherwise recompute the
    # shingle explode three times (ContextCleaner unpersists on GC)
    sh = with_word_shingles(df, text_col, n, id_col).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb")), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "na", "nb")
    )
    return out


# ------------------------------------------------------------- MinHash/LSH

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def _doc_shingle_hashes(text: str, n: int) -> np.ndarray:
    import hashlib

    toks = text.lower().split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    # blake2b (C speed, deterministic, unsalted) -> 8-byte gram keys
    b2b, from_bytes = hashlib.blake2b, int.from_bytes
    out = np.fromiter(
        (from_bytes(b2b(g.encode("utf-8"), digest_size=8).digest(), "little")
         for g in grams),
        dtype=np.uint64, count=len(grams),
    )
    return np.unique(out)


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle_n: int = 3, seed: int = 42) -> DataFrame:
    """(doc_id, sig: array<bigint>) — vectorized pandas UDF, Arrow batched."""
    a, b = _perm_params(num_perm, seed)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                hs = _doc_shingle_hashes(text or "", shingle_n)
                if hs.size == 0:
                    sigs.append([0] * num_perm)
                    continue
                mixed = _splitmix64(hs)
                # (a*h + b) mod p, min over shingles, per permutation
                vals = (np.outer(a, mixed) + b[:, None]) % np.uint64(_MERSENNE)
                sigs.append([int(v) for v in vals.min(axis=1).astype(np.int64)])
            yield pd.DataFrame({"doc_id": pdf[id_col], "sig": sigs})

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        run, schema=f"{id_col} string, sig array<bigint>"
    ) if dict(df.dtypes)[id_col] == "string" else df.select(
        F.col(id_col).cast("string").alias(id_col), F.col(text_col)
    ).mapInPandas(run, schema=f"{id_col} string, sig array<bigint>")


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16, shingle_n: int = 3,
                      seed: int = 42) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    bands x rows = num_perm; docs sharing any band bucket become a
    candidate pair, then the full signatures estimate Jaccard. The only
    shuffle is the (band_key -> doc) groupBy-join — never all-pairs.
    """
    assert num_perm % bands == 0
    rows = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n, seed)
    banded = sigs.select(
        "doc_id", "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(F.to_json(F.slice("sig", i * rows + 1, rows)), i).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "bb.band", "bb.bucket").persist()
    # persist: both sides of the self-join share the pandas-UDF
    # signature stage — without it the signatures compute twice
    a = banded.select(F.col("doc_id").alias("a"), F.col("sig").alias("siga"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("b"), F.col("sig").alias("sigb"), "band", "bucket")
    est = F.aggregate(
        F.zip_with("siga", "sigb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(num_perm)
    # estimate per band collision (cheap zip_with, <= `bands` dupes per
    # pair), then dedup on the narrow (a, b, est) — shuffling 64-long
    # signature arrays through a wide distinct costs far more
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .withColumn("est_jaccard", est)
        .groupBy("a", "b")
        .agg(F.first("est_jaccard").alias("est_jaccard"))
    )


# ---------------------------------------------------------------- SimHash

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash via a vectorized (numpy) pandas UDF: per unique
    token an FNV-1a/splitmix64 hash; per-bit majority vote packed into a
    long. One Arrow batch in/out — no per-row Python objects."""

    @F.pandas_udf("long")
    def sim(texts: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            hs = _doc_shingle_hashes(t or "", 1)  # unique token hashes
            if hs.size == 0:
                out[i] = 0
                continue
            mixed = _splitmix64(hs)
            bits = (mixed[:, None] >> shifts) & np.uint64(1)  # (n_tok, 64)
            votes = bits.sum(axis=0) * 2 > hs.size            # majority per bit
            out[i] = (votes.astype(np.uint64) << shifts).sum().astype(np.int64)
        return pd.Series(out)

    return df.withColumn(out_col, sim(F.col(text_col)))


def simhash_near_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       max_hamming: int = 3, bands: int = 4) -> DataFrame:
    """Near-dup pairs by SimHash banding: split the 64-bit hash into
    `bands` chunks; by pigeonhole, any pair within max_hamming <= bands-1
    shares at least one exact chunk -> equi-join per chunk, verify with
    exact popcount Hamming distance."""
    width = 64 // bands
    sh = simhash64(df, text_col, id_col)
    chunks = sh.select(
        F.col(id_col).alias("doc_id"), "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "simhash", "bc.band", "bc.chunk")
    a = chunks.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "band", "chunk")
    b = chunks.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "band", "chunk")
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(b, ["band", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------------- embedding near-dup

def embedding_near_dup_pairs(df: DataFrame, vec_col: str = "embedding",
                             id_col: str = "vec_id", threshold: float = 0.95) -> DataFrame:
    """Exact cosine near-dup pairs above threshold (baseline; the LSH
    bucketed variant in operators.similarity is the scale path)."""
    from xs_vlm_ocr_spark.operators.similarity import _dot, _norm

    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"),
                  _norm(F.col(vec_col)).alias("_na"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"),
                  _norm(F.col(vec_col)).alias("_nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b")
    )
