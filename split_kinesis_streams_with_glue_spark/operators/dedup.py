"""Deduplication family (SURVEY.md X1/X2) — training-data-pipeline staples.

Exact, MinHash+LSH, SimHash, and n-gram Jaccard dedup over a document
corpus, all expressed as DataFrame plans:

- **exact**: fingerprint → groupBy → keep canonical row. One shuffle on the
  16-byte fingerprint; at 100 TB this is the cheapest possible dedup.
- **n-gram Jaccard**: shingle-explode → self-join on shingle → count
  intersections. Exact but quadratic in the worst case; kept as the oracle
  ground truth and for small/filtered candidate sets.
- **MinHash LSH**: shingles → k minhashes → band buckets → join on bucket →
  exact-verify candidates. The scale path: the join key space is (band,
  hash) buckets, so the shuffle is linear in corpus size; only candidate
  pairs (a vanishing fraction) reach the exact verification.
- **SimHash**: 64-bit signature via per-token hash bit voting; near-dups =
  signatures within small Hamming distance, bucketed by 16-bit chunks
  (pigeonhole: hamming ≤ 3 ⇒ some chunk matches exactly).

All hashing is ``xxhash64``/``md5`` — deterministic, seed-stable, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from split_kinesis_streams_with_glue_spark.functions.textfns import (
    fingerprint,
    whitespace_tokens,
    word_shingles,
)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one canonical row (min id) per normalized-text fingerprint.

    Deterministic by construction — unlike ``dropDuplicates``, whose survivor
    is partition-order dependent; a correctness gate needs the min-id policy.
    """
    w = Window.partitionBy("__fp").orderBy(F.col(id_col))
    return (
        df.withColumn("__fp", fingerprint(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def paragraph_dedup(
    df: DataFrame,
    delim: str = "\n\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sub-document (paragraph-level) exact dedup — the Dolma/CCNet-style
    pass that strips boilerplate repeated ACROSS documents (headers,
    navigation, license blocks) while keeping each document's unique prose.

    Shape: split on ``delim`` → posexplode (paragraph grain) → one shuffle
    on the paragraph fingerprint keeping the globally-first occurrence
    (min (doc, position)) → reassemble in original order with an ordered
    collect per document. Documents whose every paragraph was seen earlier
    come back EMPTY rather than vanishing — the caller decides whether to
    drop or count them. Linear in corpus size; the only wide ops are the
    fingerprint window and the per-document regroup."""
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(delim), -1)).alias(
            "__pidx", "__para"
        ),
    )
    w = Window.partitionBy(fingerprint(F.col("__para"))).orderBy(
        F.col(id_col), F.col("__pidx")
    )
    kept = paras.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pidx"), F.col("__para")))
                ),
                lambda x: x["__para"],
            ),
            delim,
        ).alias(text_col)
    )
    # left join back: docs fully deduplicated away reappear with empty text
    return df.drop(text_col).join(rebuilt, id_col, "left").fillna({text_col: ""})


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) exploded distinct shingle sets.

    Distinct by construction — ``word_shingles`` applies ``array_distinct``
    per document and ids are unique, so no dedup shuffle is needed here.
    """
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(whitespace_tokens(F.lower(F.col(text_col))), n)).alias(
            "shingle"
        ),
    )


def jaccard_pairs(
    shingles: DataFrame, threshold: float, candidates: DataFrame | None = None
) -> DataFrame:
    """Exact Jaccard-similar pairs (d1 < d2, jac >= threshold) from an
    (id, shingle) frame.

    With ``candidates`` (a (d1, d2) frame), only those pairs are scored —
    the LSH verification path: the candidate list is joined in BEFORE the
    shingle-intersection join, so work is linear in candidate pairs, never
    quadratic in co-shingled docs. Without, scores all co-shingled pairs —
    the exact (quadratic-worst-case) path used as ground truth.
    """
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    if candidates is not None:
        a = shingles.select(F.col("id").alias("d1"), "shingle")
        b = shingles.select(F.col("id").alias("d2"), "shingle")
        inter = (
            candidates.join(a, "d1")
            .join(b, ["d2", "shingle"])
            .groupBy("d1", "d2")
            .agg(F.count(F.lit(1)).alias("ix"))
        )
    else:
        a = shingles.alias("a")
        b = shingles.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")),
            )
            .groupBy(F.col("a.id").alias("d1"), F.col("b.id").alias("d2"))
            .agg(F.count(F.lit(1)).alias("ix"))
        )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("d1") == F.col("sa.id"))
        .join(sb, F.col("d2") == F.col("sb.id"))
        .select(
            "d1",
            "d2",
            (F.col("ix") / (F.col("sa.n") + F.col("sb.n") - F.col("ix"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _hash_family(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic universal-hash coefficients (seed 42): lane i maps the
    32-bit-reduced base hash h as a_i*h + b_i. Coefficients stay < 2^30 so
    a_i * h + b_i < 2^62 — no long overflow under ANSI mode (Spark 4
    default throws on wraparound)."""
    import random

    rnd = random.Random(42)
    a = [(rnd.randrange(1, 2**30) | 1) for _ in range(num_hashes)]
    b = [rnd.randrange(0, 2**30) for _ in range(num_hashes)]
    return a, b


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 128
) -> DataFrame:
    """(id, sig array<long>) — sig[i] = min over shingles of lane-i hash.

    One xxhash64 per shingle; lane i is the universal hash
    ``(a_i*h + b_i) mod p`` inlined INSIDE its min aggregate — k scalar
    long expressions in whole-stage codegen, no intermediate array, no
    interpreted higher-order functions (a ``zip_with`` lambda formulation
    measured ~20× slower: HOF lambdas don't codegen). One groupBy on id
    with k min aggregates (map-side partial combine). The modulus is what
    de-correlates lanes — without it the map is monotone in h and every
    lane would pick the same shingle."""
    a, b = _hash_family(num_hashes)
    p = (1 << 31) - 1
    h0 = F.xxhash64(F.col("shingle")).bitwiseAND(F.lit(0xFFFFFFFF))
    agged = (
        shingles.withColumn("__h0", h0)
        .groupBy("id")
        .agg(
            *[
                F.min(F.pmod(F.col("__h0") * F.lit(a[i]) + F.lit(b[i]), F.lit(p))).alias(
                    f"__m{i}"
                )
                for i in range(num_hashes)
            ]
        )
    )
    return agged.select(
        "id", F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int, rows_per_band: int = 2
) -> DataFrame:
    """Band the signature (r rows/band), bucket-join on (band, band-hash).

    Pair probability 1-(1-j^r)^b: r=2, b=64 catches j >= 0.5 with miss
    probability < 1e-8. The self-join key is the band bucket — collision
    groups are tiny, so the join output stays near-linear.

    ``num_hashes`` is required: deriving it with a ``first()`` probe on the
    signature frame would re-execute the whole signature aggregate just to
    read an array length.
    """
    bands = num_hashes // rows_per_band
    banded = signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[bi * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("d1"), F.col("b.id").alias("d2"))
        .distinct()
    )


def minhash_near_dups(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 128,
) -> DataFrame:
    """MinHash LSH near-dup pairs, exact-verified: LSH proposes candidates,
    exact Jaccard on the candidate set filters false positives — output is
    identical to the brute-force ground truth up to the (negligible at these
    parameters) LSH miss probability.

    The shingle frame feeds three plan branches (signatures + both sides of
    the verification join); an eager ``localCheckpoint`` materializes it
    once and truncates lineage, so the tokenize/shingle/explode work runs
    exactly once. (A ``persist()`` + ``unpersist()`` in a ``finally`` here
    would be a bug: the unpersist fires at plan-build time, before the
    caller ever executes the returned frame.)"""
    sh = shingle_sets(df, text_col, id_col, shingle_n).localCheckpoint(eager=True)
    # the signature frame is tiny (one row per doc) but its 128-lane min
    # aggregate is the most expensive expression tree in the plan — and the
    # banded self-join would evaluate it once PER SIDE (no ReusedExchange
    # fires across the a/b aliases; verified on the executed plan).
    # Checkpointing pins it to exactly one evaluation.
    sigs = minhash_signatures(sh, num_hashes).localCheckpoint(eager=True)
    cands = lsh_candidate_pairs(sigs, num_hashes=num_hashes)
    return jaccard_pairs(sh, threshold, candidates=cands)


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash long): per-token hash, each bit votes ±1, sign of the
    vote sum forms the signature bit. Explode+groupBy formulation — one
    shuffle on id, ``bits`` conditional sums (all codegen'd).

    ``hash_fn``: ``xxhash64`` (default, fastest) or ``md5`` — the top 60
    md5 bits, standard across engines, so an external system (or a SQL
    oracle) can recompute the signature bit-for-bit; requires
    ``bits <= 60``."""
    if hash_fn == "xxhash64":
        tok_hash = F.xxhash64("tok")
    elif hash_fn == "md5":
        if bits > 60:
            raise ValueError("md5 token hash provides 60 usable bits")
        tok_hash = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).withColumn("__h", tok_hash)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("id").agg(*votes)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(2 ** i).cast("long") if i < 63 else F.when(
            F.col(f"b{i}") > 0, F.lit(-(2 ** 63))
        ).otherwise(F.lit(0)).cast("long")
        sig = term if sig is None else sig + term
    return agg.select("id", sig.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Pairs with simhash Hamming distance <= max_hamming.

    Bucketing: split the ``bits``-bit signature into 4 chunks; hamming<=3
    implies at least one chunk matches exactly (pigeonhole), so candidates
    come from 4 equi-joins on a chunk value — never a full cross join.
    """
    width = bits // 4
    sigs = simhash_signatures(df, text_col, id_col, bits=bits, hash_fn=hash_fn)
    chunks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("id", "simhash", "cc.chunk", "cc.val")
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("d1"),
            F.col("b.id").alias("d2"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    id_col: str = "doc_id",
    max_distance: int = 1,
) -> DataFrame:
    """Edit-distance <= 1 pairs via symmetric-deletion blocking (the
    SymSpell trick): two strings within one edit share at least one
    single-deletion variant, so generating len+1 variants per string and
    equi-joining on the variant finds every candidate WITHOUT the
    quadratic all-pairs comparison; an exact ``levenshtein`` post-filter
    removes the (rare) same-variant-different-edit false positives.

    The fuzzy entity-match / near-dup-name primitive. Scale shape: the
    variant explode is a linear map (len+1 rows per string at k=1,
    ~len^2/2 at k=2), the join keys on the variant (groups = strings
    sharing a variant — small by construction), and only candidates pay
    the levenshtein. The SymSpell guarantee holds for any k: strings
    within k edits share at least one member of their delete-<=k
    neighborhoods, so blocking misses nothing. k=2 is the practical
    ceiling for name-grade strings — the neighborhood grows C(len, k),
    so larger k on long strings should switch to n-gram Jaccard/minhash
    blocking instead.
    """
    if max_distance not in (1, 2):
        raise NotImplementedError(
            "symmetric-deletion blocking wired for k in {1, 2}; larger k "
            "explodes the C(len, k) neighborhood — use n-gram blocking"
        )
    del1 = (
        f"transform(sequence(1, length({col})), "
        f"i -> concat(substring({col}, 1, i-1), "
        f"substring({col}, i+1, length({col}))))"
    )
    v = f"array_union(array({col}), {del1})"
    if max_distance == 2:
        # delete positions i < j in one pass: left of i, between, right of j
        del2 = (
            f"flatten(transform(sequence(1, length({col})), "
            f"i -> transform(sequence(1, length({col})), "
            f"j -> if(i < j, concat(substring({col}, 1, i-1), "
            f"substring({col}, i+1, j-i-1), "
            f"substring({col}, j+1, length({col}))), null))))"
        )
        v = f"array_union({v}, filter({del2}, x -> x is not null))"
    sides = df.select(
        F.col(id_col).alias("id"), F.col(col).alias("s"), F.explode(F.expr(v)).alias("v")
    )
    a = sides.select(F.col("id").alias("d1"), F.col("s").alias("s1"), "v")
    b = sides.select(F.col("id").alias("d2"), F.col("s").alias("s2"), "v")
    cand = (
        a.join(b, "v")
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2", "s1", "s2")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("s1", "s2"))
        .filter(F.col("dist") <= max_distance)
        .select("d1", "d2", "dist")
    )


def strip_repeated_passages(
    df: DataFrame,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Substring-level cross-document dedup (the passage-removal pass of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): any ``window``-token span that also appears in another
    document is removed from every document except the one with the
    smallest id — exact dedup at sub-document grain, where doc-level and
    paragraph-level passes can't see the copying.

    Output: (id, text_clean, n_removed_tokens); ``text_clean`` is
    whitespace-normalized (tokens re-joined with single spaces — the same
    normalization the matching uses; matching is case-insensitive, removal
    operates on the original-case tokens).

    Shape — linear, three shuffles, no quadratic stage:
    1. per-doc sliding md5 over ``window`` lowercased tokens (array HOFs,
       no explode of the token stream);
    2. chunk occurrences explode → groupBy chunk hash: duplicated = seen
       in >1 doc; keeper = min doc id (map-side combine applies);
    3. join occurrences to duplicated hashes (hash-keyed, linear in
       occurrences), explode each hit to its ``window`` covered positions,
       collect the removal set per doc (bounded by doc length);
    4. left-join removal sets back and rebuild with a positional filter —
       docs without removals pass through the join untouched.
    """
    toks = whitespace_tokens(F.col(text_col))
    ltoks = F.transform(toks, lambda t: F.lower(t))
    # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — short docs
    # must produce no chunks explicitly
    chunk_arr = F.when(
        F.size(ltoks) >= window,
        F.transform(
            F.sequence(F.lit(1), F.size(ltoks) - (window - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(ltoks, i, window))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occurrences = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(chunk_arr).alias("pos0", "h"),
    ).select("id", (F.col("pos0") + 1).alias("pos"), "h")
    dup = (
        occurrences.groupBy("h")
        .agg(
            F.countDistinct("id").alias("n_docs"),
            F.min("id").alias("keeper"),
        )
        .filter(F.col("n_docs") > 1)
        .select("h", "keeper")
    )
    removed = (
        occurrences.join(dup, "h")
        .filter(F.col("id") != F.col("keeper"))
        .select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (window - 1))
            ).alias("rm"),
        )
        .distinct()
        .groupBy("id")
        .agg(F.collect_set("rm").alias("__rm"))
    )
    with_rm = (
        df.select(F.col(id_col).alias("id"), F.col(text_col))
        .join(removed, "id", "left")
        .withColumn(
            "__rm", F.coalesce(F.col("__rm"), F.array().cast("array<int>"))
        )
    )
    kept = F.filter(
        whitespace_tokens(F.col(text_col)),
        lambda t, i: ~F.array_contains(F.col("__rm"), i + 1),
    )
    return with_rm.select(
        F.col("id").alias(id_col),
        F.concat_ws(" ", kept).alias("text_clean"),
        F.size("__rm").alias("n_removed_tokens"),
    )


def ppjoin_pairs(
    shingles: DataFrame, threshold: float
) -> DataFrame:
    """EXACT Jaccard-similar pairs (d1 < d2, jac >= threshold) via prefix
    filtering — the deterministic counterpart to MinHash LSH.

    All-pairs/PPJoin (Bayardo et al., WWW'07; Xiao et al., WWW'08): under a
    global token order, two sets with overlap >= o must share a token in
    their first ``|d| - o + 1`` tokens. Jaccard >= t implies overlap >=
    ceil(t * |d|) for BOTH sides, so probing only each document's prefix of
    ``|d| - ceil(t*|d|) + 1`` rarest tokens finds every qualifying pair —
    no false negatives, and the candidate join touches a small fraction of
    the token postings instead of all of them.

    Ordering tokens by ASCENDING document frequency (ties by token string,
    for cross-run determinism) puts the rarest tokens in the prefix, so
    posting lists joined on are the shortest ones — the frequent-token
    postings (the quadratic blowup in the naive self-join) never meet the
    join. A length filter (``t * max(|a|,|b|) <= min(|a|,|b|)``) prunes
    further before verification; survivors are exact-verified by
    ``jaccard_pairs`` on candidates only.

    Scale shape: one shuffle for document frequencies, one doc-keyed window
    to rank tokens, one equi-join on prefix tokens (linear in prefix
    postings), then candidate-only verification. No all-pairs comparison
    anywhere; skew on a prefix token is bounded by that token's rarity.
    """
    freq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    ranked = shingles.join(freq, "shingle")
    by_rarity = Window.partitionBy("id").orderBy("__df", "shingle")
    whole = Window.partitionBy("id")
    with_pos = ranked.select(
        "id",
        "shingle",
        F.row_number().over(by_rarity).alias("__pos"),
        F.count(F.lit(1)).over(whole).alias("__sz"),
    )
    prefix = with_pos.filter(
        F.col("__pos") <= F.col("__sz") - F.ceil(F.lit(threshold) * F.col("__sz")) + 1
    )
    a = prefix.select(F.col("id").alias("d1"), "shingle", F.col("__sz").alias("__sza"))
    b = prefix.select(F.col("id").alias("d2"), "shingle", F.col("__sz").alias("__szb"))
    cand = (
        a.join(b, "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .filter(
            F.lit(threshold) * F.greatest("__sza", "__szb")
            <= F.least("__sza", "__szb")
        )
        .select("d1", "d2")
        .distinct()
    )
    return jaccard_pairs(shingles, threshold, candidates=cand)


def containment_pairs(
    shingles: DataFrame, threshold: float
) -> DataFrame:
    """EXACT containment-similar pairs: ``|S1 ∩ S2| / |S1| >= t`` for
    ``d1 != d2`` — the ASYMMETRIC near-dup relation Jaccard misses: a
    short document wholly embedded in a long one has high containment
    but low Jaccard (the quote, the excerpt, the template instance), and
    an LSH tuned for Jaccard will skip exactly those pairs.

    Prefix filtering adapts: containment >= t needs overlap >=
    ceil(t*|S1|), so d1's prefix of ``|S1| - ceil(t*|S1|) + 1`` rarest
    tokens must share a token with ANY of d2's tokens — the candidate
    join is d1-prefixes against the full posting lists (heavier than
    PPJoin's prefix x prefix, still linear in postings; the rarest-first
    order keeps the joined lists short). No length filter applies — that
    asymmetry is the point. Candidates verify by exact intersection
    count against |S1|.
    """
    freq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    ranked = shingles.join(freq, "shingle")
    by_rarity = Window.partitionBy("id").orderBy("__df", "shingle")
    whole = Window.partitionBy("id")
    with_pos = ranked.select(
        "id",
        "shingle",
        F.row_number().over(by_rarity).alias("__pos"),
        F.count(F.lit(1)).over(whole).alias("__sz"),
    )
    prefix = with_pos.filter(
        F.col("__pos") <= F.col("__sz") - F.ceil(F.lit(threshold) * F.col("__sz")) + 1
    )
    a = prefix.select(F.col("id").alias("d1"), "shingle")
    b = shingles.select(F.col("id").alias("d2"), "shingle")
    cand = (
        a.join(b, "shingle").filter(F.col("d1") != F.col("d2")).select("d1", "d2").distinct()
    )
    s1 = shingles.select(F.col("id").alias("d1"), "shingle")
    s2 = shingles.select(F.col("id").alias("d2"), "shingle")
    inter = (
        cand.join(s1, "d1")
        .join(s2, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("ix"))
    )
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    return (
        inter.join(sizes.withColumnRenamed("id", "d1"), "d1")
        .select(
            "d1",
            "d2",
            (F.col("ix") / F.col("n")).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def ngram_novelty(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Per-document novelty: the share of a doc's distinct n-gram
    shingles that appear in NO other document (corpus document frequency
    = 1) — the cheap uniqueness signal for training-data curation (near-1
    = fresh content, near-0 = boilerplate/duplicates). One shingle
    explode + one df aggregation + one per-doc fold; linear, two
    shuffles."""
    sh = shingle_sets(df, text_col=text_col, id_col=id_col, n=n)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    return (
        sh.join(freq, "shingle")
        .groupBy("id")
        .agg(
            (
                F.sum(F.when(F.col("__df") == 1, 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("novelty"),
            F.count(F.lit(1)).alias("n_shingles"),
        )
        .withColumnRenamed("id", id_col)
    )


def idf_weighted_jaccard_pairs(
    shingles: DataFrame, threshold: float
) -> DataFrame:
    """IDF-weighted Jaccard near-dup pairs: W(A,B) = Σ_{s∈A∩B} w(s) /
    Σ_{s∈A∪B} w(s) with w(s) = ln(N/df(s)) — shared RARE shingles count
    for much more than boilerplate ones, so two docs wrapping different
    payloads in the same template stop scoring as near-dups (plain
    Jaccard's classic false positive) while short quotes of distinctive
    text still surface.

    Shape mirrors the exact ``jaccard_pairs`` path: the IDF table is one
    Zipf-small aggregate joined back onto the (id, shingle) frame; the
    pair enumeration is the co-shingle self-join (use LSH candidates
    upstream at corpus scale, exactly as with unweighted Jaccard); the
    union weight folds from two per-doc totals and the intersection
    weight (inclusion–exclusion) — no per-pair union materialization."""
    nd = shingles.select("id").distinct().agg(F.count(F.lit(1)).alias("__nd"))
    idf = (
        shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(nd))
        .select("shingle", F.log(F.col("__nd") / F.col("__df")).alias("__w"))
        # a shingle in EVERY document has w = ln(N/N) = 0: it contributes
        # nothing to any score but would pair every doc with every doc in
        # the self-join below — the exact candidate explosion this
        # weighting exists to dodge (round-6 verdict #2). Dropping it here
        # changes no output: intersections and per-doc totals both gain 0
        # from a zero-weight term. The filter runs on the Zipf-small
        # vocabulary frame, not the corpus.
        .filter(F.col("__w") > 0)
    )
    weighted = shingles.join(idf, "shingle")
    wsize = weighted.groupBy("id").agg(F.sum("__w").alias("__tw"))
    a = weighted.select(F.col("id").alias("d1"), "shingle", "__w")
    b = weighted.select(F.col("id").alias("d2"), "shingle")
    inter = (
        a.join(b, ["shingle"])
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.sum("__w").alias("__iw"))
    )
    sa = wsize.select(F.col("id").alias("d1"), F.col("__tw").alias("__ta"))
    sb = wsize.select(F.col("id").alias("d2"), F.col("__tw").alias("__tb"))
    # the union weight is exactly 0 when every shared shingle appears in
    # ALL N docs (w = ln(N/df) = 0 — e.g. two identical docs in a 2-doc
    # corpus): 0/0 would error under ANSI mode, same degenerate-denominator
    # class as the ks_binned/zipf_slope guards. Zero total weight carries
    # no rarity evidence either way → score NULL, filtered out.
    union_w = F.col("__ta") + F.col("__tb") - F.col("__iw")
    return (
        inter.join(sa, "d1")
        .join(sb, "d2")
        .select(
            "d1",
            "d2",
            F.when(union_w > 0, F.col("__iw") / union_w).alias("wjaccard"),
        )
        .filter(F.col("wjaccard") >= threshold)
    )


def group_vocab_overlap(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Pairwise n-gram-VOCABULARY Jaccard between document GROUPS
    (sources/domains/snapshots): for every group pair, |V_a ∩ V_b| /
    |V_a ∪ V_b| over the groups' distinct shingle vocabularies. The
    source-level mirror detector: two crawl sources scraping the same
    upstream show near-identical vocabularies long before any document
    pair crosses a near-dup threshold — the curation signal for dropping
    or down-weighting a whole redundant source, not just documents.

    Shape mirrors ``jaccard_pairs`` one level up: one explode pass
    collapses the corpus to the distinct (group, shingle) frame (the only
    data-sized shuffle); the pair enumeration self-joins ON SHINGLE, so
    the join is linear in the vocabulary with per-shingle fanout bounded
    by the number of groups — never a document-pair blowup. Returns
    (g1, g2, vocab_jaccard, n_inter) for every group pair sharing at
    least one shingle."""
    vocab = df.select(
        F.col(group_col).alias("__g"),
        F.explode(
            word_shingles(whitespace_tokens(F.lower(F.col(text_col))), n)
        ).alias("__s"),
    ).distinct()
    sizes = vocab.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
    a = vocab.select(F.col("__g").alias("g1"), "__s")
    b = vocab.select(F.col("__g").alias("g2"), "__s")
    inter = (
        a.join(b, "__s")
        .filter(F.col("g1") < F.col("g2"))
        .groupBy("g1", "g2")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    sa = sizes.select(F.col("__g").alias("g1"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("__g").alias("g2"), F.col("__n").alias("__nb"))
    return (
        inter.join(sa, "g1")
        .join(sb, "g2")
        .select(
            "g1",
            "g2",
            F.round(
                F.col("__i")
                / (F.col("__na") + F.col("__nb") - F.col("__i")).cast("double"),
                6,
            ).alias("vocab_jaccard"),
            F.col("__i").cast("bigint").alias("n_inter"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TF-IDF cosine-similar document pairs — the classic sparse-vector IR
    similarity, complementing the set-based family: Jaccard sees shared
    SHINGLES, embedding cosine sees dense semantics, TF-IDF cosine sees
    shared RARE TERMS weighted by frequency — the measure that surfaces
    'same topic, different phrasing' pairs the shingle family misses
    while still discounting boilerplate vocabulary.

    w(d, t) = tf(d, t) · ln(N/df(t)); cos = Σ w1·w2 / (‖w1‖·‖w2‖). Shape
    mirrors ``idf_weighted_jaccard_pairs``: one tokenize pass to the
    (doc, term, tf) frame, the Zipf-small IDF table joined back, per-doc
    norms from one aggregate, and the pair enumeration self-joins ON TERM
    (docs sharing no term never pair). Terms in every document carry
    w = 0 — boilerplate can't create candidates. Use LSH/blocking
    upstream at corpus scale, exactly as with the Jaccard path."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = words.groupBy("id", "term").agg(F.count(F.lit(1)).alias("__tf"))
    nd = tf.select("id").distinct().agg(F.count(F.lit(1)).alias("__nd"))
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(nd))
        .select("term", F.log(F.col("__nd") / F.col("__df")).alias("__idf"))
        # idf = 0 terms (present in EVERY doc) carry w = tf·0 = 0: they
        # move no dot product and no norm, but left in they join every
        # doc against every doc on that term — N²/2 candidate rows from
        # one universal token (round-6 verdict #2). Filter on the
        # Zipf-small vocabulary frame so "boilerplate can't create
        # candidates" is true in the PLAN, not just in the scores.
        .filter(F.col("__idf") > 0)
    )
    weighted = tf.join(idf, "term").select(
        "id", "term", (F.col("__tf") * F.col("__idf")).alias("__w")
    )
    norms = weighted.groupBy("id").agg(
        F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__norm")
    )
    a = weighted.select(F.col("id").alias("d1"), "term", F.col("__w").alias("__w1"))
    b = weighted.select(F.col("id").alias("d2"), "term", F.col("__w").alias("__w2"))
    dots = (
        a.join(b, "term")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.sum(F.col("__w1") * F.col("__w2")).alias("__dot"))
    )
    na = norms.select(F.col("id").alias("d1"), F.col("__norm").alias("__na"))
    nb = norms.select(F.col("id").alias("d2"), F.col("__norm").alias("__nb"))
    # all-boilerplate documents have zero norm: cosine undefined -> NULL,
    # filtered by the threshold (same degenerate-denominator guard class
    # as idf_weighted_jaccard_pairs)
    denom = F.col("__na") * F.col("__nb")
    return (
        dots.join(na, "d1")
        .join(nb, "d2")
        .select(
            "d1",
            "d2",
            F.when(denom > 0, F.round(F.col("__dot") / denom, 6)).alias(
                "tfidf_cosine"
            ),
        )
        .filter(F.col("tfidf_cosine") >= threshold)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_key,
    window: int = 3,
    id_col: str = "doc_id",
    n_partitions: int = 32,
) -> DataFrame:
    """Sorted-neighborhood candidate-pair generation (Hernandez &
    Stolfo, SIGMOD 1995): sort the corpus by a fuzzy blocking key and
    emit each row paired with its next ``window`` neighbors in sort
    order. The THIRD blocking geometry in the dedup family — LSH bands
    bucket by hash equality and block-pair joins by exact key equality,
    both of which miss near-keys that differ in their hashed bytes
    ("smith, john" vs "smith, jon"); sorted neighborhood turns key
    PROXIMITY into candidacy, with a guaranteed output bound of
    n * window pairs whatever the key distribution (no hot-bucket
    blowup — the skew-immunity LSH lacks).

    Plan shape (new, and deliberately NOT a global window): the global
    rank is computed in two passes — ``repartitionByRange`` on
    (key, id) + per-PARTITION ``row_number`` (parallel windows), then
    each partition's rank offset from a broadcast #partitions-row
    count frame (lazily localCheckpointed so the sampled range
    boundaries are identical in both consumers). Because the range
    partitioning respects the total (key, id) order, offset +
    within-partition rank IS the global rank — no single-partition
    WindowExec anywhere, unlike a bare ``row_number() OVER (ORDER BY
    ...)``. Candidate edges then come from an offset-explode EQUI-join
    on rank + offset — never a non-equi range join
    (BroadcastNestedLoop at scale) and never a collect_list.

    NULL sort keys are the caller's problem (Spark sorts NULLS FIRST
    ascending, SQL engines default NULLS LAST — filter or coalesce
    first when keys can be null).

    Returns (id_a, id_b, key_a, key_b, offset) with id_a ranked below
    id_b."""
    from split_kinesis_streams_with_glue_spark.partitioning import global_rank

    base = df.select(F.col(id_col).alias("__id"), sort_key.alias("__key"))
    # the two-pass rank was born here (round 8); factored to
    # partitioning.global_rank when quantile_normalize became its second
    # consumer (round 9) — plan shape unchanged (verified by the plan test)
    ranked = global_rank(
        base, "__key", "__id", rank_col="__rn", n_partitions=n_partitions
    ).select("__id", "__key", "__rn")
    offs = F.array([F.lit(i) for i in range(1, window + 1)])
    left = (
        ranked.select(
            F.col("__id").alias("id_a"),
            F.col("__key").alias("key_a"),
            F.col("__rn").alias("__rn_a"),
            F.explode(offs).alias("offset"),
        )
        .withColumn("__target", F.col("__rn_a") + F.col("offset"))
    )
    right = ranked.select(
        F.col("__id").alias("id_b"),
        F.col("__key").alias("key_b"),
        F.col("__rn").alias("__target"),
    )
    return left.join(right, "__target").select(
        "id_a", "id_b", "key_a", "key_b",
        F.col("offset").cast("int").alias("offset"),
    )


def blocking_metrics(
    candidates: DataFrame,
    truth: DataFrame,
    n_rows: int,
    cand_cols: tuple[str, str] = ("id_a", "id_b"),
    truth_cols: tuple[str, str] = ("d1", "d2"),
) -> DataFrame:
    """Blocking-scheme evaluation (Christen, "Data Matching" 2012, ch.
    7): pair completeness PC = |candidates ∩ true matches| / |true
    matches| (the recall a blocking scheme caps every downstream
    matcher at) and reduction ratio RR = 1 - |candidates| / C(n, 2)
    (how much of the quadratic comparison space it removed). The
    evaluation leg the three blocking geometries (LSH bands, block
    joins, sorted neighborhood) lacked: each generates candidates, this
    grades a scheme against exact ground truth — the PC/RR trade-off IS
    the blocking tuning curve.

    Both pair frames normalize to (lo, hi) ordered ids AND deduplicate
    before the equi-join (round-9 advice): a candidate frame carrying
    both orientations of a pair, or band-level LSH duplicates of the
    same pair, would otherwise double-count n_candidates and n_hit via
    join multiplicity — pair_completeness could exceed 1.0. PC/RR are
    defined over pair SETS, so the dedup is the definition, not a
    tolerance (any SQL mirror needs the same DISTINCT). Work: two
    bounded aggregates and one hash-join over pair frames that are
    linear in the corpus by the blocking contract; the dedup shuffles
    on the same (lo, hi) key the join needs. Exact integer counts; PC
    and RR are single IEEE divisions; NULL PC when there are no true
    matches to find.

    Returns one row (n_candidates, n_true, n_hit, pair_completeness,
    reduction_ratio)."""
    ca, cb = cand_cols
    ta, tb = truth_cols
    c = candidates.select(
        F.least(F.col(ca), F.col(cb)).alias("__lo"),
        F.greatest(F.col(ca), F.col(cb)).alias("__hi"),
    ).dropDuplicates(["__lo", "__hi"])
    t = truth.select(
        F.least(F.col(ta), F.col(tb)).alias("__lo"),
        F.greatest(F.col(ta), F.col(tb)).alias("__hi"),
    ).dropDuplicates(["__lo", "__hi"])
    hit = c.join(t, ["__lo", "__hi"]).agg(
        F.count(F.lit(1)).alias("__hit")
    )
    nc = c.agg(F.count(F.lit(1)).alias("__nc"))
    nt = t.agg(F.count(F.lit(1)).alias("__nt"))
    total_pairs = float(n_rows) * float(n_rows - 1) / 2.0
    return (
        nc.crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(hit))
        .select(
            F.col("__nc").cast("bigint").alias("n_candidates"),
            F.col("__nt").cast("bigint").alias("n_true"),
            F.col("__hit").cast("bigint").alias("n_hit"),
            F.when(
                F.col("__nt") > 0,
                F.round(
                    F.col("__hit").cast("double")
                    / F.col("__nt").cast("double"),
                    6,
                ),
            ).alias("pair_completeness"),
            F.round(
                F.lit(1.0)
                - F.col("__nc").cast("double") / F.lit(total_pairs),
                6,
            ).alias("reduction_ratio"),
        )
    )
