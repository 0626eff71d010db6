"""Training-data pipeline text operators over the ``documents`` table.

First-class components for 100 TB corpus curation (task brief): exact and
near deduplication, document fingerprinting, language-ID heuristics, quality
scoring and token statistics — all pure Catalyst (whole-stage codegen, no
Python), each with a DuckDB-expressible oracle in kgforge.queries.

Portability note: near-dup primitives hash with ``md5`` (identical hex in
Spark and DuckDB) so correctness is oracle-checkable; the scale path would
swap ``xxhash64`` in for ~4x cheaper signatures with the same structure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column) -> Column:
    """Whitespace tokenizer (F14) — documents.text is single-spaced."""
    return F.split(col, " ")


def word_shingles(col: Column, k: int = 3) -> Column:
    """k-word shingles as an array<string> (MinHash input)."""
    toks = tokens(col)
    n = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )


def decontaminate_hits(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: per-document count of distinct k-word
    n-grams shared with an eval/benchmark set (the Dolma / GPT-3 appendix-C
    discipline — training docs overlapping held-out eval n-grams are
    flagged and dropped before training).

    Scale shape (the reason this is a first-class operator): the eval side
    is always tiny relative to a 100 TB corpus (benchmarks are a few
    thousand docs -> at most a few million distinct n-grams), so its
    distinct n-gram set is **broadcast** and the corpus side stays map-only
    — explode to per-doc distinct n-grams, broadcast-hash semi-probe, then
    one partial-agg-friendly groupBy(doc_id). No corpus-side shuffle except
    the final per-doc count, which AQE coalesces. Production uses k=8..13;
    tests use k=3 because the synthetic docs are short.
    """
    ngrams = word_shingles(F.col(text_col), k)
    eval_ngrams = (
        eval_df.select(F.explode(ngrams).alias("ngram")).distinct()
    )
    doc_ngrams = corpus.select(
        F.col(id_col), F.explode(ngrams).alias("ngram")
    ).distinct()
    return (
        doc_ngrams.join(F.broadcast(eval_ngrams), "ngram")
        .groupBy(id_col)
        .agg(F.count("*").alias("hits"))
        .filter(F.col("hits") >= min_hits)
    )


def bloom_decontaminate_hits(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    depths: int = 3,
    hex_chars: int = 3,
) -> DataFrame:
    """Bloom-filter decontamination: the BOUNDED-size variant of
    ``decontaminate_hits`` for when even the eval n-gram set is too large
    to broadcast exactly (a full benchmark suite at k=13 reaches hundreds
    of millions of distinct n-grams; a Bloom filter of any eval set is
    ``depths * 16^hex_chars`` positions, here 3x4096).

    Bit positions are (depth, hex-prefix-of-md5) pairs — engine-portable
    strings like q75's count-min buckets, so the whole sketch (including
    its deterministic false positives: that is the sketch contract, a
    superset never a miss) is reproducible in the DuckDB oracle and
    HASH-verified. Scale shape: the bit set is built from the tiny eval
    side and broadcast; the corpus side explodes to distinct per-doc
    n-grams map-side, probes the broadcast bits, and keeps an n-gram only
    when ALL ``depths`` positions are set; one partial-agg per-doc count.
    Production swaps the string positions for a real bitmap UDF — the
    dataflow (broadcast sketch, map-only probe) is identical.
    """
    spark = corpus.sparkSession
    ngrams = word_shingles(F.col(text_col), k)
    depth_df = F.broadcast(
        spark.range(depths).select(F.col("id").cast("int").alias("d"))
    )

    def pos(ng: Column) -> Column:
        return F.substring(
            F.md5(F.concat(F.col("d").cast("string"), F.lit("|"), ng)),
            1,
            hex_chars,
        )

    bits = (
        eval_df.select(F.explode(ngrams).alias("ngram"))
        .crossJoin(depth_df)
        .select("d", pos(F.col("ngram")).alias("pos"))
        .distinct()
    )
    probes = (
        corpus.select(F.col(id_col), F.explode(ngrams).alias("ngram"))
        .distinct()
        .crossJoin(depth_df)
        .select(id_col, "ngram", "d", pos(F.col("ngram")).alias("pos"))
    )
    maybe = (
        probes.join(F.broadcast(bits), ["d", "pos"])
        .groupBy(id_col, "ngram")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") == depths)
    )
    return maybe.groupBy(id_col).agg(F.count("*").alias("maybe_hits"))


def minhash_band_sig(shingle_arr: Column, band: int) -> Column:
    """One band's MinHash signature: lexicographic min of md5(band || shingle).

    min over md5 strings is a valid permutation-free MinHash variant and is
    bit-identical in DuckDB (md5 + list min), making LSH oracle-checkable.
    """
    return F.array_min(
        F.transform(
            shingle_arr, lambda s: F.md5(F.concat(F.lit(f"b{band}|"), s))
        )
    )


def simhash16(col: Column) -> Column:
    """16-bit SimHash over tokens: bit b set iff sum(+/-1 per token) > 0,
    where a token votes +1 on bit b when hex digit b of md5(token) is odd.

    Teaching/Column form — 16 aggregate folds with md5 inline, so every
    token is hashed 16 times. The production path is
    ``with_simhash16_md5`` (r7): same result, ONE md5 per token with the
    16 digit parities packed into a long that is materialized as a
    projected array column, then 16 shift/mask folds — the
    ``with_simhash_fast`` shape. The hoist must be a MATERIALIZED
    projection (a bound attribute), not a shared subexpression: Catalyst
    does not CSE across aggregate lambdas, which is why an earlier
    hoisted-md5-array variant inside one Column expression was 3x slower.
    IN-list digit parity is bit-identical in DuckDB.
    """
    toks = tokens(col)
    odd_hex = ("1", "3", "5", "7", "9", "b", "d", "f")

    def make_step(bit_pos: int):
        # named closure keeps the pyspark lambda arity at exactly 2
        def step(acc, tok):
            return acc + F.when(
                F.substring(F.md5(tok), bit_pos + 1, 1).isin(*odd_hex), F.lit(1)
            ).otherwise(F.lit(-1))

        return step

    bits = []
    for b in range(16):
        vote = F.aggregate(toks, F.lit(0), make_step(b))
        bits.append(F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bits[0]
    for e in bits[1:]:
        out = out + e
    return out


def with_simhash16_md5(
    df: DataFrame, text_col: str = "text", out: str = "simhash"
) -> DataFrame:
    """Production form of ``simhash16`` — bit-identical result (oracle-
    hash-checked as q24), ONE md5 per token instead of 16.

    Shape (r7, guide §1.2 step 2 'per-task work'): a nested transform
    first hashes each token once (the inner ``md5`` binds to the outer
    lambda's VARIABLE, so the two substring/conv references below are
    free variable reads, not re-evaluations — higher-order-function
    lambdas are interpreted with no common-subexpression elimination, so
    any expression referenced twice inside one is computed twice); the
    outer lambda packs the 16 hex-digit nibbles into one long
    (``shiftleft(conv(hex[1:8]), 32) | conv(hex[9:16])`` — bit ops, no
    ANSI overflow), materialized as an array projection. The 16 aggregate
    folds then test the nibble LOW bit at position 4*(15-b) — digit b+1
    of the md5 is odd iff that bit is set — so each fold is shift/mask
    over a precomputed long, the ``with_simhash_fast`` shape."""
    toks = tokens(F.col(text_col))
    packed = F.transform(
        F.transform(toks, lambda tk: F.md5(tk)),
        lambda h: F.shiftleft(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), 32
        ).bitwiseOR(F.conv(F.substring(h, 9, 8), 16, 10).cast("long")),
    )
    hashed = df.withColumn("_sh16_m", packed)

    def make_step(b: int):
        pos = 4 * (15 - b)  # low bit of hex digit b+1 within the packed long

        def step(acc, m):
            return acc + F.when(
                F.shiftright(m, pos).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))

        return step

    bits = []
    for b in range(16):
        vote = F.aggregate(F.col("_sh16_m"), F.lit(0), make_step(b))
        bits.append(F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    sig = bits[0]
    for e in bits[1:]:
        sig = sig + e
    return hashed.withColumn(out, sig).drop("_sh16_m")


def minhash_band_sig_fast(
    shingle_arr: Column, band: int, rows_per_band: int = 2
) -> Column:
    """Scale-path MinHash band signature: xxhash64 instead of md5 (~4x
    cheaper, JVM long instead of 32-char string through every shuffle),
    AND-combining ``rows_per_band`` independent min-hashes like
    kgforge.link.minhash_blocks. Not DuckDB-expressible — the md5 twin
    (minhash_band_sig) stays the oracle surface; this is what production
    dedup (q41/q93 path) runs."""
    mins = [
        F.array_min(
            F.transform(
                shingle_arr,
                lambda s, r=r: F.xxhash64(F.lit(band * rows_per_band + r), s),
            )
        )
        for r in range(rows_per_band)
    ]
    return F.xxhash64(*mins)


def with_simhash_fast(
    df: DataFrame, text_col: str = "text", out: str = "simhash", bits: int = 64
) -> DataFrame:
    """Scale-path SimHash: ONE xxhash64 per token, MATERIALIZED as an
    array<long> projection, then ``bits`` scalar aggregate folds that only
    shift/mask the precomputed hash (bit b of the token hash votes +/-1).

    Why this exact shape (all measured warm at sf0.1, local[8]):
    - md5 inline in 16 folds (simhash16, the oracle shape): 5.8 s
    - xxhash64 + array-accumulator zip_with fold: 11.4 s — allocating a
      64-int array per token per row dominates
    - xxhash64 materialized + 64 scalar folds (this): 2.1 s; 16-bit: 0.7 s
    The materialization matters: Catalyst does not CSE across aggregate
    lambdas, so the hash array must be a bound attribute from a previous
    projection or every fold re-hashes every token (the same trap the
    hoisted-md5 variant hit in round 1).

    r7 lane packing (guide §1.2 step 2): each fold accumulates several
    bit-counters in 16-bit lanes of one long, so the array is traversed
    bits/lanes times instead of ``bits`` times — and the per-element cost
    of a fold is interpreted-expression evaluation (higher-order
    functions have no codegen), so the lambda body is kept to THREE nodes
    when the layout allows: for bits a multiple of 16, fold f counts bits
    {f, f+16, f+32, f+48} and the increment for all lanes at once is
    ``(h >> f) & 0x0001000100010001`` — one shift, one mask, one add.
    For narrower signatures (q55's 16-bit) the four lanes are assembled
    per-lane (bits f, f+4, f+8, f+12). vote_b > 0 becomes
    2*count_b > n_tokens, bit-identical to the naive folds (A/B-checked).
    Exactness bound: a 16-bit lane counter is exact for documents under
    65,536 tokens; a corpus with longer documents shards them upstream
    (pack_sequences' budget) or widens to 32-bit lanes — same shape.
    """
    hashed = df.withColumn(
        "_simhash_h", F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t))
    )
    n_toks = F.size(F.col("_simhash_h"))
    sig = F.lit(0).cast("long")

    if bits % 16 == 0 and bits >= 32:
        lanes = bits // 16
        mask = sum(1 << (16 * j) for j in range(lanes))

        def make_step_masked(f: int):
            def step(acc, h):
                return acc + F.shiftright(h, f).bitwiseAND(F.lit(mask))

            return step

        for _f in range(16):
            acc = F.aggregate(
                F.col("_simhash_h"), F.lit(0).cast("long"), make_step_masked(_f)
            )
            for j in range(lanes):
                b = _f + 16 * j
                cnt = F.shiftright(acc, 16 * j).bitwiseAND(F.lit(0xFFFF))
                sig = sig.bitwiseOR(
                    F.when(
                        cnt * 2 > n_toks, F.shiftleft(F.lit(1).cast("long"), b)
                    ).otherwise(F.lit(0).cast("long"))
                )
    else:
        n_folds = max(1, bits // 4)

        def make_step(idxs: list[int]):
            def step(acc, h):
                inc = None
                for j, b in enumerate(idxs):
                    term = F.shiftleft(
                        F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("long"),
                        16 * j,
                    )
                    inc = term if inc is None else inc + term
                return acc + inc

            return step

        for f in range(n_folds):
            idxs = [f + j * n_folds for j in range(4) if f + j * n_folds < bits]
            acc = F.aggregate(
                F.col("_simhash_h"), F.lit(0).cast("long"), make_step(idxs)
            )
            for j, b in enumerate(idxs):
                cnt = F.shiftright(acc, 16 * j).bitwiseAND(F.lit(0xFFFF))
                sig = sig.bitwiseOR(
                    F.when(
                        cnt * 2 > n_toks, F.shiftleft(F.lit(1).cast("long"), b)
                    ).otherwise(F.lit(0).cast("long"))
                )
    return hashed.withColumn(out, sig).drop("_simhash_h")


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return sw.cast("double") / F.size(toks).cast("double")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / stopword quality features + clamped linear score
    (F18/F19 min-max + weighted-score semantics,
    reference: metrics_calculator.py:100-116)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tokens = F.size(toks)
    avg_tok_len = (F.length(c) - (n_tokens - 1)).cast("double") / n_tokens.cast("double")
    sw_ratio = stopword_ratio(c)
    score = F.least(
        F.lit(100.0),
        F.greatest(
            F.lit(0.0),
            F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(100.0)) * 50.0
            + sw_ratio * 30.0
            + F.least(F.lit(1.0), avg_tok_len / F.lit(10.0)) * 20.0,
        ),
    )
    return df.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(avg_tok_len, 4).alias("avg_token_len"),
        F.round(sw_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def lang_scores(col: Column) -> dict[str, Column]:
    """n-gram/stopword language-ID heuristic (deterministic, oracle-checkable)."""
    toks = tokens(col)
    markers = {
        "en": ("the", "a", "and"),
        "es": ("el", "la", "de"),
        "de": ("der", "die", "das"),
        "fr": ("le", "la", "et"),
    }
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words)))
        for lang, words in markers.items()
    }
