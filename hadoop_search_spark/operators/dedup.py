"""Deduplication operators for large-corpus training-data pipelines
(SURVEY.md §7 phase 5; BASELINE.json north star).

Four families, all expressed as relational DataFrame plans (no
driver-side materialization, no Python in the hot path):

* **exact** — hash-groupBy on a content digest;
* **MinHash + LSH** — word-shingle → k min-hashes → banded signature
  → bucket self-join → exact-Jaccard verification of candidates;
* **SimHash** — weighted bit-vote fingerprint + banded Hamming pairs;
* **n-gram Jaccard** — shingle-set self-join for exact similarity on
  candidate pairs.

Determinism note: every hash is derived from md5 hex (verified to
produce identical BIGINTs in Spark and DuckDB), so each operator has
an exact SQL oracle. Hash widths are chosen so all arithmetic stays
far below 2^63 — Spark wraps silently on long overflow while DuckDB
promotes to HUGEINT, so overflow would silently diverge.

Scale: the only self-joins are on LSH band buckets / hash prefixes,
never all-pairs; shingle explosion is linear in corpus size and
shuffles on (doc, shingle)-derived keys. At 100 TB the band join is
the standard MinHash-LSH reduce — skew (a viral shingle) is handled
by AQE skew-join splitting, and WITHIN-bucket blowup (a near-dup
mega-cluster putting m ~ 10⁶ docs in one band bucket → O(m²) join
OUTPUT, which AQE cannot split) is capped by :data:`DEFAULT_BUCKET_CAP`:
hot buckets emit representative edges instead of all pairs (same
candidate-graph connected components; see
:func:`minhash_lsh_candidates`).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 12 hex digits < 2^48: min-hash values
_MH_HEX = 12
# 10 hex digits < 2^40: simhash token hashes (bit votes)
_SH_HEX = 10

NUM_MINHASHES = 16
LSH_BAND_ROWS = 4  # 4 bands of 4 rows

# Per-seed XOR salts for the min-hash family: one md5 per *shingle*
# (uniform 48-bit h), then seed i's hash is ``h XOR SEED_SALTS[i]`` —
# a permutation of the hash space per seed. This is the standard
# "one strong hash + k cheap salts" MinHash construction: at corpus
# scale the signature stage hashes terabytes of shingle strings, and
# salting cuts the string-hash work k-fold versus md5(seed||shingle)
# per seed. Salts are themselves md5-derived so the oracle SQL can
# embed the same constants (generated from this list — one source of
# truth, see catalog._minhash_salts_values).
def seed_salts(k: int) -> list[int]:
    return [
        int(hashlib.md5(f"seed:{i}".encode()).hexdigest()[:_MH_HEX], 16)
        for i in range(k)
    ]


SEED_SALTS: list[int] = seed_salts(NUM_MINHASHES)
SHINGLE_SIZE = 3
SIMHASH_BITS = 40
SIMHASH_PREFIX_SHIFT = 20  # band on top 20 bits for pair generation


def md5_int(col: F.Column, hex_digits: int) -> F.Column:
    """The cross-engine deterministic hash: md5-hex-prefix → BIGINT.
    Bit-identical in Spark and DuckDB; the single shared recipe for
    MinHash, SimHash token hashing, and stratified sampling."""
    return F.conv(F.substring(F.md5(col), 1, hex_digits), 16, 10).cast("bigint")


# ---------------------------------------------------------------- exact


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, keeper_id, group_size): every doc annotated with its
    content-hash group's canonical (min) id. ``doc_id != keeper_id``
    rows are exact duplicates to drop."""
    h = docs.select("doc_id", F.md5(F.col(text_col)).alias("h"))
    groups = h.groupBy("h").agg(
        F.min("doc_id").alias("keeper_id"), F.count("*").alias("group_size")
    )
    return h.join(groups, "h").select("doc_id", "keeper_id", "group_size")


# ---------------------------------------------------------- shingles


def exploded_spans(
    docs: DataFrame, text_col: str = "text", n: int = SHINGLE_SIZE
) -> DataFrame:
    """(doc_id, i, span): every word n-gram of every doc with its
    1-based start index, in stream order WITH multiplicity; docs with
    fewer than n tokens contribute no rows.

    Formulation note: this explodes the START-INDEX sequence and
    builds each n-gram with scalar ``element_at`` calls AFTER the
    explode. The seemingly equivalent
    ``explode(transform(sequence(...), i -> concat_ws(...)))`` puts a
    higher-order lambda inside whole-stage codegen and costs ~10+
    seconds of codegen COMPILATION per fresh plan at n=5 (measured;
    same pitfall as NOTES.md round-2) — the scalar form is ~30x
    faster end-to-end and identical in output.
    """
    from hadoop_search_spark.partitioning import spread

    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    base = spread(docs.select("doc_id", F.col(text_col)), "doc_id").select(
        "doc_id", toks.alias("_toks")
    )
    idx = base.select(
        "doc_id",
        "_toks",
        F.explode(
            F.when(
                F.size("_toks") >= n,
                F.sequence(F.lit(1), F.size("_toks") - n + 1),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("_i"),
    )
    span = F.concat_ws(
        " ", *[F.element_at(F.col("_toks"), F.col("_i") + j) for j in range(n)]
    )
    return idx.select("doc_id", F.col("_i").alias("i"), span.alias("span"))


def word_shingles(docs: DataFrame, text_col: str = "text", n: int = SHINGLE_SIZE) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle)."""
    return (
        exploded_spans(docs, text_col, n)
        .select("doc_id", F.col("span").alias("shingle"))
        .distinct()
    )


def span_overlap(docs: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Cross-document duplicated-span mass, the doc-level signal behind
    substring-dedup decisions (Lee et al., "Deduplicating Training Data
    Makes Language Models Better"): for every doc, how much of its
    word-n-gram stream also occurs in at least one OTHER document.

    Returns (doc_id, n_spans, n_shared_spans, shared_frac) where
    ``n_spans`` counts the doc's word n-grams WITH multiplicity,
    ``n_shared_spans`` the subset whose text appears in >=2 distinct
    docs, and ``shared_frac`` their ratio (one double division).
    Docs with fewer than n tokens yield no row (no spans to classify)
    — identical semantics in the SQL oracle.

    Scale shape: explode is linear in corpus tokens; the per-(doc,span)
    count and the per-span doc-frequency window shuffle on span-derived
    keys (the same two-exchange plan as df-based tf-idf) — never an
    all-pairs comparison. A viral span (boilerplate header) is one hot
    window partition; AQE skew handling applies, and the window only
    carries the small (doc_id, m) rows, not the span text payloads.
    """
    spans = exploded_spans(docs, text_col, n)
    per_ds = spans.groupBy("doc_id", "span").agg(F.count("*").alias("m"))
    # rows of per_ds are distinct (doc, span) pairs, so a plain count
    # over the span partition IS the distinct-doc frequency
    n_docs = F.count("*").over(Window.partitionBy("span"))
    tagged = per_ds.withColumn("n_docs", n_docs)
    shared_m = F.when(F.col("n_docs") >= 2, F.col("m")).otherwise(F.lit(0))
    out = tagged.groupBy("doc_id").agg(
        F.sum("m").cast("bigint").alias("n_spans"),
        F.sum(shared_m).cast("bigint").alias("n_shared_spans"),
    )
    return out.select(
        "doc_id",
        "n_spans",
        "n_shared_spans",
        (F.col("n_shared_spans").cast("double") / F.col("n_spans").cast("double"))
        .alias("shared_frac"),
    )


def span_rewrite(docs: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Substring-level dedup REWRITE (the removal step of Lee et al.'s
    substring deduplication, downstream of :func:`span_overlap`'s
    detection): every token covered by a cross-document duplicated
    span (word n-gram occurring in >= 2 distinct docs) is removed, the
    survivors re-join in order →
    ``(doc_id, n_tokens, n_removed, text_clean)``.

    Semantics: removal is CROSS-doc only — a span repeated within one
    document but nowhere else is kept (within-doc repetition is
    :func:`operators.textstats.repetition_features`' concern). Every
    tokenizable doc gets a row, including fully-scrubbed ones
    (``text_clean = ''``); docs shorter than n tokens have no spans
    and pass through unchanged.

    Scale shape: spans explode linearly; the duplicated-span set comes
    from one (doc,span)-distinct aggregate + span-keyed count (the
    span_overlap exchanges); covered positions explode from flagged
    span starts and DISTINCT per (doc, pos); the token stream drops
    covered positions with a left-anti join on (doc_id, pos) — an
    equi-join on a well-spread composite key — and per-doc reassembly
    is one groupBy with an order-restoring array_sort. No all-pairs,
    nothing driver-side.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    base = docs.select("doc_id", toks.alias("_toks")).filter(F.size("_toks") > 0)
    stream = base.select(
        "doc_id", F.posexplode("_toks").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    spans = exploded_spans(docs, text_col, n)
    dup = (
        spans.select("doc_id", "span")
        .distinct()
        .groupBy("span")
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") >= 2)
        .select("span")
    )
    covered = (
        spans.join(dup, "span")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + F.lit(n - 1))).alias(
                "pos"
            ),
        )
        .distinct()
    )
    kept = stream.join(covered, ["doc_id", "pos"], "left_anti")
    ordered = F.array_sort(F.collect_list(F.struct("pos", "tok")))
    kept_agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(" ", F.transform(ordered, lambda s: s["tok"])).alias(
            "text_clean"
        ),
    )
    counts = base.select("doc_id", F.size("_toks").cast("bigint").alias("n_tokens"))
    return counts.join(kept_agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
    )


def exact_span_pairs(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 8,
    n: int = SHINGLE_SIZE,
) -> DataFrame:
    """MAXIMAL cross-document duplicated substrings with coordinates —
    the pair-evidence form of Lee et al.'s ExactSubstr dedup (the
    doc-level mass is :func:`span_overlap`, the removal is
    :func:`span_rewrite`; this is the audit view: WHO shares WHAT,
    WHERE, and HOW LONG) → ``(doc_a, doc_b, a_start, a_end, b_start,
    b_end, len_words)``, 1-based inclusive word positions, doc_a <
    doc_b, one row per maximal aligned run of at least ``min_len``
    words (``min_len`` ≥ ``n`` — shorter runs have no anchor).

    The suffix-array step of the original becomes pure relational
    algebra: word ``n``-gram anchors equi-join across docs on the
    span TEXT (exact — no hash-collision caveat), and maximality
    falls out of the classic diagonal + gaps-and-islands trick: on a
    fixed alignment diagonal ``d = a_pos − b_pos``, consecutive
    anchor matches share ``a_pos − row_number()``, so one window +
    one aggregate turns anchor matches into maximal runs — no text
    re-reading, no extension loop.

    Scale shape: anchors explode linearly; the cross-doc join is
    anchor-keyed (never all-pairs); the run window partitions by
    (pair, diagonal) — request-bounded per duplicated region. The
    honest skew note: an anchor occurring in D docs yields O(D²)
    pair rows (boilerplate headers) — the same blowup Lee et al.'s
    suffix intervals face; cap upstream by dropping ultra-high-df
    anchors or pre-deduplicating exact copies
    (:func:`exact_dedup_groups`) if the corpus carries viral
    boilerplate."""
    if min_len < n:
        raise ValueError(f"min_len={min_len} must be >= anchor width n={n}")
    spans = exploded_spans(docs, text_col, n)
    a = spans.select(
        F.col("span"),
        F.col("doc_id").alias("doc_a"),
        F.col("i").alias("a_pos"),
    )
    b = spans.select(
        F.col("span"),
        F.col("doc_id").alias("doc_b"),
        F.col("i").alias("b_pos"),
    )
    matches = a.join(b, "span").filter(F.col("doc_a") < F.col("doc_b"))
    d = (F.col("a_pos") - F.col("b_pos")).alias("d")
    w = Window.partitionBy("doc_a", "doc_b", "d").orderBy("a_pos")
    runs = (
        matches.select("doc_a", "doc_b", d, "a_pos")
        .withColumn("island", F.col("a_pos") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "d", "island")
        .agg(
            F.min("a_pos").alias("a_start"),
            (F.max("a_pos") + F.lit(n - 1)).alias("a_end"),
        )
    )
    out = runs.select(
        "doc_a",
        "doc_b",
        F.col("a_start").cast("bigint").alias("a_start"),
        F.col("a_end").cast("bigint").alias("a_end"),
        (F.col("a_start") - F.col("d")).cast("bigint").alias("b_start"),
        (F.col("a_end") - F.col("d")).cast("bigint").alias("b_end"),
        (F.col("a_end") - F.col("a_start") + 1).cast("bigint").alias("len_words"),
    )
    return out.filter(F.col("len_words") >= min_len)


# ------------------------------------------------------- MinHash + LSH


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = NUM_MINHASHES
) -> DataFrame:
    """(doc_id, seed, minhash): k salted min-hashes per doc.

    One explode over a k-element (seed, salt) array then a
    (doc, seed) min — a single shuffle; the shingle string is md5'd
    once and re-permuted per seed via XOR (see :data:`SEED_SALTS`)."""
    ss = seed_salts(num_hashes)
    salts = F.array(
        *[
            F.struct(F.lit(i).alias("seed"), F.lit(ss[i]).alias("salt"))
            for i in range(num_hashes)
        ]
    )
    per_seed = shingles.select(
        "doc_id",
        md5_int(F.col("shingle"), _MH_HEX).alias("h"),
        F.explode(salts).alias("ss"),
    ).select(
        "doc_id",
        F.col("ss.seed").alias("seed"),
        F.col("h").bitwiseXOR(F.col("ss.salt")).alias("h"),
    )
    return per_seed.groupBy("doc_id", "seed").agg(F.min("h").alias("minhash"))


def lsh_bands(signatures: DataFrame, band_rows: int = LSH_BAND_ROWS) -> DataFrame:
    """(doc_id, band, band_key): concatenated in-band min-hashes."""
    with_band = signatures.withColumn("band", (F.col("seed") / band_rows).cast("int"))
    return with_band.groupBy("doc_id", "band").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("seed", "minhash"))),
                lambda s: s["minhash"].cast("string"),
            ),
            ",",
        ).alias("band_key")
    )


def minhash_bands_wide(
    shingles: DataFrame,
    num_hashes: int = NUM_MINHASHES,
    band_rows: int = LSH_BAND_ROWS,
) -> DataFrame:
    """(doc_id, band, band_key) in ONE shuffle: the k min-hashes are k
    min-aggregates over the shingle stream (no k-fold row explosion),
    and bands are a post-aggregation column explode.

    Produces byte-identical band keys to :func:`lsh_bands` ∘
    :func:`minhash_signatures` (pytest-pinned); this is the scale
    path — shuffle volume is |shingles|, not k·|shingles|, and the
    shingle string is md5'd ONCE with per-seed XOR salts
    (:data:`SEED_SALTS`) instead of k string hashes.

    r12 form: the md5→BIGINT hash is PROJECTED once below the
    aggregate (``_h``) instead of being inlined into each of the k
    min-aggregates — k-fold smaller expression tree (faster plan
    construction and whole-stage codegen compile, the dominant cold
    constants of the dedup headline; measured −0.1 s cold at sf0.1)
    and the per-row md5 provably evaluates once. The aggregates and
    the band-struct explode build as SQL strings (one py4j round trip
    each instead of ~10) — same analyzed expressions, values pinned
    byte-identical by the narrow-form equivalence test."""
    ss = seed_salts(num_hashes)
    hashed = shingles.select(
        "doc_id", md5_int(F.col("shingle"), _MH_HEX).alias("_h")
    )
    aggs = [
        F.expr(f"min(_h ^ {ss[i]}L)").alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    wide = hashed.groupBy("doc_id").agg(*aggs)
    # ceil-divide so a trailing partial band is emitted, matching
    # lsh_bands (seed // band_rows) when band_rows doesn't divide k
    n_bands = -(-num_hashes // band_rows)
    band_structs = ", ".join(
        "named_struct('band', {b}, 'band_key', concat_ws(',', {cols}))".format(
            b=b,
            cols=", ".join(
                f"mh{i}"
                for i in range(b * band_rows, min((b + 1) * band_rows, num_hashes))
            ),
        )
        for b in range(n_bands)
    )
    return wide.select(
        "doc_id", F.expr(f"explode(array({band_structs}))").alias("bb")
    ).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key")
    )


# Hot-bucket cap for the band-bucket candidate joins (r11 VERDICT #1:
# the one scale-killer class left). A NEAR-identical mega-cluster
# (templated web boilerplate differing only in a date string — m ~ 10⁶
# at 100 TB) survives exact-dedup-first, shares every band key, and
# makes the within-bucket all-pairs join quadratic (~10¹² pairs from
# ONE bucket). AQE cannot split it: the blowup is join OUTPUT, not
# partition size. Above the cap a bucket emits REPRESENTATIVE edges
# (bucket_min_doc, doc) — O(m) instead of O(m²), same candidate-graph
# connected components (every member stays reachable through the
# representative). The default never bites at the test SFs (max
# observed bucket: 4 minhash / 553 simhash at sf0.1), so sub-cap
# results are bit-identical to the exact all-pairs form.
DEFAULT_BUCKET_CAP = 1024


def _with_bucket_stats(
    banded: DataFrame,
    keys: list[str],
    bucket_cap: int,
    on_hot_bucket: str,
    payload: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """``banded`` annotated per row with its bucket's
    (_bsz, _rep[, _rep_payload]) via WINDOW aggregates over the bucket
    key — one exchange, computed in the same shuffle the candidate
    self-join needs, so the (expensive) upstream signature aggregation
    runs ONCE (a groupBy-stats + join-back form re-computed it: the
    partial-agg subtree cannot reuse the join probe's exchange —
    measured 2× on the sf0.1 headline).

    ``on_hot_bucket`` policy applied to ``_bsz``:

    * ``"star"`` — hot buckets handled by representative edges (the
      caller's contract);
    * ``"error"`` — a bucket over the cap raises loudly (the repo's
      no-silent-fallback doctrine) instead of silently degrading
      recall, for consumers that require exact all-pairs semantics.
    """
    w = Window.partitionBy(*keys)
    sized = banded.withColumn("_bsz", F.count("*").over(w)).withColumn(
        "_rep", F.min(id_col).over(w)
    )
    if payload is not None:
        # the id is unique within a bucket (one row per doc per band),
        # so min_by is deterministic: the representative's payload
        sized = sized.withColumn(
            "_rep_payload", F.min_by(payload, id_col).over(w)
        )
    if on_hot_bucket == "error":
        sized = sized.withColumn(
            "_bsz",
            F.when(
                F.col("_bsz") > bucket_cap,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "LSH bucket over cap "
                            f"{bucket_cap} (on_hot_bucket='error'): "
                            "size "
                        ),
                        F.col("_bsz").cast("string"),
                        F.lit(", representative doc_id "),
                        F.col("_rep").cast("string"),
                        F.lit(
                            " — a near-dup mega-cluster makes the "
                            "all-pairs join quadratic; use "
                            "on_hot_bucket='star' or raise the cap"
                        ),
                    )
                ).cast("long"),
            ).otherwise(F.col("_bsz")),
        )
    elif on_hot_bucket != "star":
        raise ValueError(
            f"on_hot_bucket must be 'star' or 'error', got {on_hot_bucket!r}"
        )
    # three consumers (two self-join sides + the star arm) reference
    # this frame with DIFFERENT pruned projections, so Catalyst plans
    # three independent subtrees (no ReusedExchange) and the upstream
    # signature aggregation would run three times — the lazy local
    # checkpoint materializes it once (linear, banded-size rows), the
    # embedding_dedup_pairs precedent. No streaming consumer exists
    # (checkpointing is batch-only).
    return sized.localCheckpoint(eager=False)


def minhash_lsh_candidates(
    bands: DataFrame,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    on_hot_bucket: str = "star",
) -> DataFrame:
    """Distinct candidate pairs sharing any LSH band bucket, with
    hot-bucket protection: buckets of size ≤ ``bucket_cap`` emit exact
    all-pairs; larger buckets emit representative edges
    ``(bucket_min_doc, other)`` — O(m·cap + m) candidates instead of
    O(m²), and the same candidate-graph connected components (every
    hot-bucket member is adjacent to the representative).

    Recall contract for PAIR consumers (not cluster consumers): inside
    a hot bucket, a pair is attested only through the representative.
    For the mega-cluster data shape that creates hot buckets —
    near-identical documents — every member verifies against the
    representative, so cluster membership is preserved; a bucket that
    mixes genuinely dissimilar docs above the cap is a band-collision
    pathology the verify stage already treats as noise. Pass
    ``on_hot_bucket="error"`` to refuse loudly instead, or
    ``bucket_cap=None`` for the legacy exact all-pairs join."""
    if bucket_cap is None:
        a = bands.alias("a")
        b = bands.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
    sized = _with_bucket_stats(
        bands, ["band", "band_key"], bucket_cap, on_hot_bucket
    )
    small = sized.filter(F.col("_bsz") <= bucket_cap).select(
        "doc_id", "band", "band_key"
    )
    a = small.alias("a")
    b = small.alias("b")
    small_pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )
    star_pairs = sized.filter(
        (F.col("_bsz") > bucket_cap) & (F.col("doc_id") != F.col("_rep"))
    ).select(F.col("_rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    return small_pairs.unionByName(star_pairs).distinct()


def jaccard_verify(
    candidates: DataFrame, shingles: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard on candidate pairs: (doc_a, doc_b, jaccard)."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = shingles.withColumnRenamed("doc_id", "doc_a")
    sb = shingles.withColumnRenamed("doc_id", "doc_b")
    shared = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 9
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = NUM_MINHASHES,
    band_rows: int = LSH_BAND_ROWS,
    shingles: DataFrame | None = None,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    on_hot_bucket: str = "star",
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bucket join →
    exact-Jaccard verify. Returns (doc_a, doc_b, jaccard) pairs.

    The DAG references the shingle set four times (signatures, sizes,
    the two verify sides); pass a caller-persisted ``shingles``
    (``word_shingles(docs)``) to compute it once. Persistence is
    deliberately caller-owned — an operator that persists internally
    on every call leaks cache entries until the MemoryStore thrashes.
    Signatures use the one-shuffle wide form
    (:func:`minhash_bands_wide`); candidate generation is hot-bucket
    capped (see :func:`minhash_lsh_candidates` for the
    ``bucket_cap``/``on_hot_bucket`` contract)."""
    sh = shingles if shingles is not None else word_shingles(docs, text_col)
    cand = minhash_lsh_candidates(
        minhash_bands_wide(sh, num_hashes, band_rows),
        bucket_cap=bucket_cap,
        on_hot_bucket=on_hot_bucket,
    )
    return jaccard_verify(cand, sh, threshold)


def cross_corpus_pairs(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = NUM_MINHASHES,
    band_rows: int = LSH_BAND_ROWS,
    new_shingles: DataFrame | None = None,
    ref_shingles: DataFrame | None = None,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    on_hot_bucket: str = "star",
) -> DataFrame:
    """Near-dup pairs of a NEW snapshot against a REFERENCE corpus
    only → (doc_a [ref], doc_b [new], jaccard): the band join is
    new-bands × ref-bands, so ref-ref and new-new pairs are never
    generated or verified — the snapshot-over-snapshot dedup shape
    (yesterday's corpus is settled; only arrivals need checking),
    sitting between the full batch self-join
    (:func:`minhash_lsh_dedup`) and the greedy online store
    (`streaming/dedup_ingest.py`). Doc ids must be disjoint across
    the two corpora (they identify sides in the shared shingle
    frame).

    Scale shape: identical to the self-join family — band/bucket
    equi-join, never all-pairs — but the verify cost is
    O(candidate pairs across the boundary), which for a daily
    snapshot is ~|new| · dup-rate, not O(corpus²). Hot-bucket cap:
    the blowup case is a bucket hot on BOTH sides (the reference
    already holds the mega-cluster and today's snapshot adds more of
    it → m_ref · m_new pairs from one bucket), so buckets whose
    REFERENCE side exceeds ``bucket_cap`` pair each new doc with the
    reference representative (min ref doc_id) only — O(m_new) output
    per hot bucket, and a new mega-cluster member still matches (it
    verifies against the representative, which is its near-dup by
    the data shape that made the bucket hot). ``on_hot_bucket=
    "error"`` refuses loudly; ``bucket_cap=None`` is the legacy
    exact join."""
    sh_new = (
        new_shingles
        if new_shingles is not None
        else word_shingles(new_docs, text_col)
    )
    sh_ref = (
        ref_shingles
        if ref_shingles is not None
        else word_shingles(ref_docs, text_col)
    )
    bnew = minhash_bands_wide(sh_new, num_hashes, band_rows)
    bref = minhash_bands_wide(sh_ref, num_hashes, band_rows)
    if bucket_cap is None:
        cand = (
            bnew.withColumnRenamed("doc_id", "doc_b")
            .join(
                bref.withColumnRenamed("doc_id", "doc_a"),
                ["band", "band_key"],
            )
            .select("doc_a", "doc_b")
            .distinct()
        )
    else:
        sized_ref = _with_bucket_stats(
            bref, ["band", "band_key"], bucket_cap, on_hot_bucket
        )
        small_ref = sized_ref.filter(F.col("_bsz") <= bucket_cap).select(
            F.col("doc_id").alias("doc_a"), "band", "band_key"
        )
        small_pairs = bnew.withColumnRenamed("doc_id", "doc_b").join(
            small_ref, ["band", "band_key"]
        )
        hot_reps = (
            sized_ref.filter(F.col("_bsz") > bucket_cap)
            .select("band", "band_key", F.col("_rep").alias("doc_a"))
            .distinct()
        )
        hot_pairs = bnew.withColumnRenamed("doc_id", "doc_b").join(
            hot_reps, ["band", "band_key"]
        )
        cand = (
            small_pairs.select("doc_a", "doc_b")
            .unionByName(hot_pairs.select("doc_a", "doc_b"))
            .distinct()
        )
    return jaccard_verify(cand, sh_ref.unionByName(sh_new), threshold)


def cross_corpus_dedup(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    new_shingles: DataFrame | None = None,
    ref_shingles: DataFrame | None = None,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    on_hot_bucket: str = "star",
) -> DataFrame:
    """Admission verdict per NEW doc → ``(doc_id, dup_of, keep)``:
    ``keep`` = no reference doc verifies at ≥ threshold, ``dup_of`` =
    the smallest matching reference id (deterministic evidence row;
    −1 when kept — never NULL, the driver-hash convention). One
    aggregation over :func:`cross_corpus_pairs` + a left join back to
    the new snapshot — every new doc gets a row, matched or not."""
    pairs = cross_corpus_pairs(
        new_docs,
        ref_docs,
        text_col,
        threshold,
        new_shingles=new_shingles,
        ref_shingles=ref_shingles,
        bucket_cap=bucket_cap,
        on_hot_bucket=on_hot_bucket,
    )
    best = pairs.groupBy("doc_b").agg(F.min("doc_a").alias("dup_of"))
    return (
        new_docs.select("doc_id")
        .join(best.withColumnRenamed("doc_b", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_of", F.lit(-1)).cast("bigint").alias("dup_of"),
            F.col("dup_of").isNull().alias("keep"),
        )
    )


# ------------------------------------------------------------ SimHash


def simhash(docs: DataFrame, text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): weighted bit-vote fingerprint over tokens.

    Token hash = 40-bit md5 int; each bit votes ±tf; bit set when the
    vote sum is positive. All arithmetic < 2^63 in both engines."""
    from hadoop_search_spark.partitioning import spread

    toks = spread(docs.select("doc_id", text_col), "doc_id").select(
        "doc_id", F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    hashed = tf.select("doc_id", "tf", md5_int(F.col("tok"), _SH_HEX).alias("h"))
    bit_idx = F.array(*[F.lit(b) for b in range(bits)])
    votes = hashed.select(
        "doc_id",
        "tf",
        "h",
        F.explode(bit_idx).alias("b"),
    ).select(
        "doc_id",
        "b",
        (
            (F.expr("(h >> b) & 1") * 2 - 1) * F.col("tf")
        ).alias("vote"),
    )
    bitsum = votes.groupBy("doc_id", "b").agg(F.sum("vote").alias("s"))
    return bitsum.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("cast(pow(2, b) as bigint)")).otherwise(0)
        ).alias("simhash")
    )


def simhash_pairs(
    sims: DataFrame,
    max_hamming: int = 3,
    num_bands: int = 4,
    bits: int = SIMHASH_BITS,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    on_hot_bucket: str = "star",
) -> DataFrame:
    """Near-dup pairs by Hamming distance, candidate-generated over
    ``num_bands`` bit-bands: a pair differing in ≤ ``num_bands``-1
    bits must agree on at least one whole band (pigeonhole), so with
    the default 4 bands every Hamming ≤ 3 pair is a candidate — never
    an all-pairs join.

    Hot-bucket cap: band chunks have only ``2^(bits/num_bands)``
    values (1024 for 40/4), so at corpus scale EVERY bucket
    eventually saturates — above ``bucket_cap``, a bucket emits
    representative edges (min doc, other) with the true Hamming
    distance (the representative's fingerprint rides along via
    min_by), keeping output O(m) per bucket. The ≤ max_hamming
    guarantee then holds for pairs involving the representative;
    other in-bucket pairs are attested transitively (the near-dup
    consumers cluster by connected components). ``on_hot_bucket=
    "error"`` refuses loudly; ``bucket_cap=None`` is the legacy
    exact form."""
    band_bits = bits // num_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.expr(
                    f"(simhash >> {b * band_bits}) & {(1 << band_bits) - 1}"
                ).alias("chunk"),
            )
            for b in range(num_bands)
        ]
    )
    banded = sims.select("doc_id", "simhash", F.explode(bands).alias("bb")).select(
        "doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk")
    )
    if bucket_cap is None:
        a = banded.alias("a")
        b = banded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.chunk") == F.col("b.chunk"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.bit_count(F.expr("a.simhash ^ b.simhash")).alias("hamming"),
            )
            .filter(F.col("hamming") <= max_hamming)
            .distinct()
        )
    sized = _with_bucket_stats(
        banded, ["band", "chunk"], bucket_cap, on_hot_bucket, payload="simhash"
    )
    small = sized.filter(F.col("_bsz") <= bucket_cap).select(
        "doc_id", "simhash", "band", "chunk"
    )
    a = small.alias("a")
    b = small.alias("b")
    small_pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.bit_count(F.expr("a.simhash ^ b.simhash")).alias("hamming"),
    )
    star_pairs = sized.filter(
        (F.col("_bsz") > bucket_cap) & (F.col("doc_id") != F.col("_rep"))
    ).select(
        F.col("_rep").alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.bit_count(
            F.col("_rep_payload").bitwiseXOR(F.col("simhash"))
        ).alias("hamming"),
    )
    return (
        small_pairs.unionByName(star_pairs)
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ----------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = SHINGLE_SIZE,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
    prefix_freq_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard pairs with PREFIX-FILTERED candidate
    generation (the AllPairs/PPJoin principle — Bayardo et al. WWW'07,
    Xiao et al. WWW'08): under a global shingle order, J(A,B) >= τ
    forces |A∩B| >= ⌈τ·|A|⌉, so the two docs must share a shingle
    among each one's first ``|X| − ⌈τ·|X|⌉ + 1`` shingles (pigeonhole
    — if the intersection avoided A's prefix, too few shingles remain
    to reach the overlap bound). Candidates therefore join PREFIX to
    PREFIX, not full set to full set.

    The global order is ascending corpus frequency (rarest first, ties
    by string), which puts exactly the hot shingles OUTSIDE prefixes —
    on a low-diversity corpus, where the naive shared-shingle join
    degenerates toward all-pairs (every common shingle buckets
    everything), only the rare tail generates candidates. A partner
    size filter (τ·|A| <= |B| <= |A|/τ, also implied by the
    threshold) prunes further. Blocking affects performance only:
    every candidate is verified by exact Jaccard, and the prefix
    lemma guarantees no qualifying pair is missed (pinned by the
    brute-force differential test). Persistence of ``shingles`` is
    caller-owned (see :func:`minhash_lsh_dedup`)."""
    sh = shingles if shingles is not None else word_shingles(docs, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    gf = sh.groupBy("shingle").agg(F.count("*").alias("gdf"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("gdf"), F.asc("shingle"))
    # prefix length |X| − ⌈τ|X|⌉ + 1; the 1e-9 nudge keeps a float
    # product that lands a hair ABOVE an integer from shortening the
    # prefix by one (which would silently drop candidates)
    min_overlap = F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9))
    prefix = (
        sh.join(gf, "shingle")
        .join(sizes, "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("n_sh") - min_overlap + 1)
        .select("doc_id", "shingle", "n_sh")
    )
    if prefix_freq_cap is not None:
        # MEGA-CLUSTER guard (loud by doctrine): an EXACT similarity
        # join cannot star-cap without breaking the prefix lemma's
        # no-missed-pair guarantee, so a prefix shingle blocking more
        # than ``prefix_freq_cap`` docs RAISES instead of silently
        # going quadratic. The exposure: near-identical docs (τ=0.5 →
        # half of each doc's shingles sit in its prefix) share their
        # common shingles' prefix slots, so one cluster of m docs
        # emits O(m²) candidates. For that workload use the capped
        # :func:`minhash_lsh_dedup` (representative edges are sound
        # for its approximate contract) or exact-dedup first.
        pf = F.count("*").over(Window.partitionBy("shingle"))
        prefix = (
            prefix.withColumn("_pf", pf)
            .filter(
                F.when(
                    F.col("_pf") > prefix_freq_cap,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "prefix shingle blocks more than "
                                f"{prefix_freq_cap} docs ("
                            ),
                            F.col("_pf").cast("string"),
                            F.lit(
                                "): a near-dup mega-cluster makes the "
                                "exact prefix join quadratic — use the "
                                "hot-bucket-capped minhash_lsh_dedup or "
                                "exact-dedup first"
                            ),
                        )
                    ).cast("boolean"),
                ).otherwise(F.lit(True))
            )
            .drop("_pf")
        )
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"), "shingle", F.col("n_sh").alias("_na")
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"), "shingle", F.col("n_sh").alias("_nb")
    )
    cand = (
        pa.join(pb, "shingle")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("_nb") >= F.lit(threshold) * F.col("_na") - F.lit(1e-9))
            & (F.col("_na") >= F.lit(threshold) * F.col("_nb") - F.lit(1e-9))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    return jaccard_verify(cand, sh, threshold)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = SHINGLE_SIZE,
    min_shared: int = 1,
    doc_shingles: DataFrame | None = None,
    bench_shingles: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination — flag training docs whose n-gram
    shingles collide with an evaluation set: ``(doc_id, n_shared)``
    for every doc sharing >= ``min_shared`` distinct shingles with
    ANY benchmark doc. The flagged ids are then dropped from the
    training mix (anti-join) before training.

    Scale shape: benchmark suites are tiny next to a 100 TB corpus,
    so the benchmark shingle set is collected into a broadcast — the
    corpus-side join is map-only, and the only shuffle is the
    per-doc count aggregation (partial aggs apply). The corpus is
    never shuffled on shingle.

    ``doc_shingles`` / ``bench_shingles`` accept precomputed
    ``word_shingles``-shaped frames (caller-owned persistence, same
    pattern as :func:`minhash_lsh_dedup`) so a pipeline that already
    materialized the corpus shingle set doesn't re-tokenize.

    PRECONDITION: a caller-supplied ``doc_shingles`` must be distinct
    per (doc_id, shingle) — ``word_shingles`` output satisfies this,
    but e.g. exploded-span frames do not, and duplicates inflate
    ``n_shared`` (the count deliberately skips an internal distinct
    so the map-only corpus side stays shuffle-free)."""
    doc_sh = (
        doc_shingles if doc_shingles is not None else word_shingles(docs, text_col, n)
    )
    bench_sh = (
        bench_shingles
        if bench_shingles is not None
        else word_shingles(benchmark, text_col, n)
    ).select("shingle").distinct()
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))  # shingles are distinct per doc
        .filter(F.col("n_shared") >= min_shared)
    )


def benchmark_contamination_report(
    doc_shingles: DataFrame,
    bench_shingles: DataFrame,
    min_shared: int = 1,
) -> DataFrame:
    """The EVAL-side view of decontamination — for each benchmark
    document, how compromised is it by the training corpus? →
    ``(bench_doc, n_bench_shingles, n_leaked, n_training_docs,
    leak_frac_pct)`` for benchmark docs with >= ``min_shared`` leaked
    shingles. ``n_leaked`` counts the bench doc's DISTINCT shingles
    that appear anywhere in the training corpus; ``n_training_docs``
    counts distinct corpus docs sharing at least one shingle;
    ``leak_frac_pct`` is the integer percentage of the doc's shingles
    that leaked (engine-exact: 100*n div total).

    :func:`decontaminate` answers "which training docs must I drop";
    this answers "which eval results can I still trust" — the report
    an eval-hygiene audit publishes. Scale shape: the benchmark side
    is tiny and broadcasts; the corpus side contributes one
    (shingle → any-doc) aggregation, never a corpus self-join."""
    bench = bench_shingles.select(
        F.col("doc_id").alias("bench_doc"), "shingle"
    )
    sizes = bench.groupBy("bench_doc").agg(
        F.count("*").alias("n_bench_shingles")
    )
    hits = doc_shingles.join(
        F.broadcast(bench.select("shingle").distinct()), "shingle"
    )
    # corpus stream stays the probe side; the (bench_doc, shingle)
    # table broadcasts — the corpus is never shuffled on shingle
    leaked = (
        hits.select("shingle", "doc_id")
        .join(F.broadcast(bench), "shingle")
        .groupBy("bench_doc")
        .agg(
            F.count_distinct("shingle").alias("n_leaked"),
            F.count_distinct("doc_id").alias("n_training_docs"),
        )
    )
    return (
        leaked.filter(F.col("n_leaked") >= min_shared)
        .join(F.broadcast(sizes), "bench_doc")
        .select(
            "bench_doc",
            "n_bench_shingles",
            "n_leaked",
            "n_training_docs",
            F.expr("(100 * n_leaked) div n_bench_shingles").alias(
                "leak_frac_pct"
            ),
        )
    )


BLOOM_BITS = 1 << 15  # 32768 bits = 1024 32-bit words in BIGINTs
BLOOM_HASHES = 3


def _bloom_positions(shingle: F.Column, m: int, k: int) -> F.Column:
    """The k bloom bit positions of a shingle — salted uses of the one
    shared cross-engine hash recipe (:func:`md5_int`)."""
    return F.array(
        *[
            F.pmod(
                md5_int(F.concat(F.lit(f"bloom{j}:"), shingle), 12), F.lit(m)
            )
            for j in range(1, k + 1)
        ]
    )


def bloom_decontaminate(
    doc_shingles: DataFrame,
    bench_shingles: DataFrame,
    min_shared: int = 1,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Two-tier benchmark decontamination with a hand-built Bloom
    filter → ``(doc_id, n_maybe, n_shared, contaminated)`` for every
    doc whose MAYBE-count reaches ``min_shared``.

    Tier 1 (the 100 TB path): the benchmark shingle set is folded
    into an ``m``-bit bitmap — ``k`` salted :func:`md5_int` positions
    per shingle, 32 bits per BIGINT word, ``bit_or`` aggregated; at
    any corpus scale the bitmap is m/32 rows (constant — 1024 at the
    default m) broadcast to a map-side probe, so the corpus pays k
    hashes and one broadcast join per shingle, never a shuffle
    against the benchmark. A shingle is MAYBE-contaminated iff all k
    probed bits are set (no false negatives; false positives at the
    classic (1-e^{-kn/m})^k rate). [This build of Spark does not
    register the SQL bloom_filter_agg/might_contain pair — probed;
    the bitmap here is plain integer arithmetic, so the DuckDB oracle
    reproduces it bit-for-bit.]

    Tier 2: only docs the filter flags are verified EXACTLY against
    the true benchmark shingle set (the :func:`decontaminate` join) —
    at realistic FP rates that join touches a vanishing slice of the
    corpus. ``n_maybe >= n_shared`` always; ``contaminated`` is the
    exact tier-2 verdict at the same ``min_shared``."""
    bench = bench_shingles.select("shingle").distinct()
    pos = F.explode(_bloom_positions(F.col("shingle"), m, k)).alias("pos")
    words = (
        bench.select(pos)
        .select(
            F.expr("pos div 32").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    probes = doc_shingles.select(
        "doc_id",
        "shingle",
        F.explode(_bloom_positions(F.col("shingle"), m, k)).alias("pos"),
    ).select(
        "doc_id",
        "shingle",
        F.expr("pos div 32").alias("word_idx"),
        (F.col("pos") % 32).alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(words), "word_idx", "left")
        .select(
            "doc_id",
            "shingle",
            F.expr(
                "shiftrightunsigned(coalesce(word, CAST(0 AS BIGINT)), "
                "CAST(bit AS INT)) % 2"
            ).alias("hit"),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.min("hit").alias("maybe"))  # all k bits set
    )
    flagged = (
        hits.groupBy("doc_id")
        .agg(F.sum(F.col("maybe")).cast("bigint").alias("n_maybe"))
        .filter(F.col("n_maybe") >= min_shared)
        # referenced twice (output left side + tier-2 pruning);
        # without truncation the whole probe pipeline would
        # re-execute per reference
        .localCheckpoint(eager=False)
    )
    # tier 2 touches ONLY filter-flagged docs — the point of the
    # prefilter: at realistic FP rates the exact join sees a
    # vanishing slice of the corpus (AQE broadcasts the id set when
    # it is small; an explicit broadcast hint would be wrong in the
    # saturated-filter worst case, where the flagged set is large)
    exact = (
        doc_shingles.join(flagged.select("doc_id"), "doc_id")
        # tier 1 counted DISTINCT (doc_id, shingle) pairs (the min-agg
        # groups on both); distinct here keeps n_maybe >= n_shared
        # true even for a caller passing a non-distinct shingle frame
        # (e.g. exploded-span output) — the dedup runs only over the
        # flagged slice, so its shuffle is tiny by construction
        .select("doc_id", "shingle")
        .distinct()
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        flagged.join(exact, "doc_id", "left")
        .select(
            "doc_id",
            "n_maybe",
            F.coalesce(F.col("n_shared"), F.lit(0).cast("bigint")).alias(
                "n_shared"
            ),
            (
                F.coalesce(F.col("n_shared"), F.lit(0)) >= min_shared
            ).alias("contaminated"),
        )
    )


# ------------------------------------------- edit-distance similarity join


def _norm_key_pairs(cands: DataFrame) -> DataFrame:
    """Normalize candidate (doc_a, ka, doc_b, kb) rows so doc_a < doc_b,
    carrying each side's key along, and dedupe."""
    return cands.select(
        F.least("doc_a", "doc_b").alias("doc_a"),
        F.when(F.col("doc_a") < F.col("doc_b"), F.col("ka"))
        .otherwise(F.col("kb"))
        .alias("ka"),
        F.greatest("doc_a", "doc_b").alias("doc_b"),
        F.when(F.col("doc_a") < F.col("doc_b"), F.col("kb"))
        .otherwise(F.col("ka"))
        .alias("kb"),
    ).distinct()


def _qgram_candidates(
    long_keys: DataFrame, max_distance: int, q: int
) -> DataFrame:
    """Asymmetric rarest-prefix q-gram candidate join over keys of
    length ≥ q·(d+1) — see :func:`edit_distance_pairs` for the
    soundness argument and the data-regime caveat."""
    prefix_len = max_distance * q + 1
    # explode 1-based start positions, then slice — NOT a
    # transform(sequence, i -> substring) array lambda: that nested
    # higher-order expression costs ~16 s of whole-stage-codegen
    # compilation per fresh plan (measured), vs ~1 s for this shape
    # no dedup needed: p is unique per doc_id by construction (one row
    # per start position), so the stream is already distinct
    grams = long_keys.select(
        "doc_id",
        "key",
        F.explode(F.sequence(F.lit(1), F.length("key") - (q - 1))).alias("p"),
    ).withColumn("g", F.expr(f"substring(key, p, {q})"))
    gram_freq = grams.groupBy("g").agg(F.count("*").alias("gf"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("gf"), F.asc("g"), F.asc("p"))
    prefix = (
        grams.join(gram_freq, "g")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= prefix_len)
    )
    a = prefix.select(
        F.col("doc_id").alias("doc_a"), F.col("key").alias("ka"),
        F.col("g").alias("ga"), F.col("p").alias("pa"),
    )
    b = grams.select(
        F.col("doc_id").alias("doc_b"), F.col("key").alias("kb"),
        F.col("g").alias("gb"), F.col("p").alias("pb"),
    )
    return _norm_key_pairs(
        a.join(
            b,
            (F.col("ga") == F.col("gb"))  # equi-key → hash join
            & (F.col("doc_a") != F.col("doc_b"))
            & (F.abs(F.col("pa") - F.col("pb")) <= max_distance)
            & (F.abs(F.length("ka") - F.length("kb")) <= max_distance),
        )
    )


def _segment_candidates(
    long_keys: DataFrame, max_distance: int, min_len: int
) -> DataFrame:
    """Partition-based (segment) candidate join over keys of length ≥
    ``min_len`` — the second blocking family, robust where q-gram
    prefixes degenerate.

    Soundness (the PassJoin partition lemma — Li, Deng, Wang & Feng,
    "PASS-JOIN: a partition-based method for similarity joins",
    PVLDB 5(3), 2011): split each indexed key A into d+1 contiguous
    segments. d edit operations can touch at most d segments, so at
    least one segment of A survives UNEDITED in any B with
    edit(A,B) ≤ d, and its occurrence in B starts within ±d of its
    start in A (each insertion/deletion before it shifts it by one).
    The probe side therefore enumerates, for every key B, every
    partner length La ∈ [|B|−d, |B|+d] (∩ ≥ min_len), every segment
    index i of the canonical La-partition, and every start offset
    within the ±d window — O((2d+1)²·(d+1)) ≈ 75 probe substrings per
    key at d=2 — and the join is pure equi (segment string, segment
    index, partner length): one candidate pair per surviving segment,
    direction (A indexed, B probes) fires for every qualifying pair.

    Why a second family: 3-gram buckets collapse on low-diversity
    vocabularies (every gram common → quadratic candidates), while a
    segment is ~L/(d+1) ≥ q characters long — on the same degenerate
    corpus, distinct segment strings stay numerous and buckets small,
    so candidate volume stays near output-bound. Index side is d+1
    rows per key vs the prefix family's d·q+1.

    Canonical partition of length L into k = d+1 segments: the first
    k − (L mod k) segments have length ⌊L/k⌋, the rest ⌊L/k⌋+1
    (min_len ≥ q·(d+1) keeps every segment ≥ q chars)."""
    d = max_distance
    k = d + 1

    def with_geometry(df: DataFrame, length_col: str) -> DataFrame:
        """Canonical-partition geometry (slen, sstart) for segment
        index ``i`` of a length-``length_col`` key split into d+1
        segments — the ONE definition shared by the index and probe
        sides; a divergence between two hand-kept copies would break
        the partition lemma silently (missed candidates, no error)."""
        return (
            df.withColumn("_base", (F.col(length_col) / k).cast("int"))
            .withColumn("_nshort", F.lit(k) - F.col(length_col) % k)
            .withColumn(
                "slen",
                F.col("_base")
                + F.when(F.col("i") >= F.col("_nshort"), F.lit(1)).otherwise(
                    F.lit(0)
                ),
            )
            .withColumn(
                "sstart",
                F.lit(1)
                + F.col("i") * F.col("_base")
                + F.greatest(F.col("i") - F.col("_nshort"), F.lit(0)),
            )
        )

    # index side: the d+1 canonical segments of each key
    seg = (
        with_geometry(
            long_keys.withColumn("L", F.length("key")).withColumn(
                "i", F.explode(F.sequence(F.lit(0), F.lit(d)))
            ),
            "L",
        )
        .select(
            F.col("doc_id").alias("doc_a"),
            F.col("key").alias("ka"),
            F.col("L").alias("La"),
            F.col("i").alias("ia"),
            F.expr("substring(key, sstart, slen)").alias("ga"),
        )
    )
    # probe side: for every partner length and segment spec, the
    # substrings of B inside the ±d start window
    probe = (
        with_geometry(
            long_keys.withColumn(
                "La",
                F.explode(
                    F.sequence(
                        F.greatest(F.length("key") - d, F.lit(min_len)),
                        F.length("key") + d,
                    )
                ),
            ).withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(d)))),
            "La",
        )
        .withColumn("_lo", F.greatest(F.col("sstart") - d, F.lit(1)))
        .withColumn(
            "_hi",
            F.least(F.col("sstart") + d, F.length("key") - F.col("slen") + 1),
        )
        # sequence(lo, hi) with lo > hi counts DOWN — filter the empty
        # windows out instead of generating inverted ranges
        .filter(F.col("_lo") <= F.col("_hi"))
        .withColumn("s", F.explode(F.sequence(F.col("_lo"), F.col("_hi"))))
        .select(
            F.col("doc_id").alias("doc_b"),
            F.col("key").alias("kb"),
            F.col("La").alias("Lb_partner"),
            F.col("i").alias("ib"),
            F.expr("substring(key, s, slen)").alias("gb"),
        )
    )
    return _norm_key_pairs(
        seg.join(
            probe,
            (F.col("ga") == F.col("gb"))  # equi keys → hash join
            & (F.col("ia") == F.col("ib"))
            & (F.col("La") == F.col("Lb_partner"))
            & (F.col("doc_a") != F.col("doc_b")),
        )
    )


def edit_distance_pairs(
    docs: DataFrame,
    key: F.Column,
    max_distance: int = 2,
    q: int = 3,
    blocking: str = "segment",
) -> DataFrame:
    """All pairs of docs whose ``key`` strings are within ``max_distance``
    Levenshtein edits — the fuzzy-title/URL dedup mode of a training-data
    pipeline. Returns (doc_a, doc_b, dist), doc_a < doc_b.

    Long keys (length ≥ q·(d+1)) pair through one of two SOUND
    candidate families (no qualifying pair is ever missed; never
    all-pairs), selected by ``blocking``:

    * ``"segment"`` (default) — partition-based blocking
      (:func:`_segment_candidates`, PassJoin partition lemma): each
      key indexes its d+1 canonical segments; probes enumerate partner
      lengths and ±d start windows. Segments are ~L/(d+1) chars, so
      buckets stay small even on LOW-DIVERSITY vocabularies — the
      regime where q-gram blocking degrades (see below);
    * ``"qgram"`` — asymmetric rarest-prefix q-gram blocking
      (:func:`_qgram_candidates`): each key INDEXES only its d·q+1
      globally rarest grams while the probe side keeps all grams;
      d edits destroy at most q grams each of ANY fixed
      (d·q+1)-subset, so an indexed gram of either key survives
      unedited within ±d positions — soundness needs only one join
      direction to fire. Rarest-first keeps viral shared prefixes off
      the index side. Near-linear on DIVERSE keys (titles, URLs,
      names); on a degenerate tiny-vocabulary corpus every gram is
      common and candidates grow toward quadratic — which is why
      "segment" is the default.

    Keys too short for either bound live in a tiny length band (one
    key ≤ q·(d+1)-1 chars, the other within +d) joined directly; the
    candidate sets are disjoint by construction, and every candidate
    verifies with the exact ``levenshtein`` (JVM codegen,
    character-level). At scale both families shuffle O(|docs|·L) rows
    and join on selective equi keys — all linear in input,
    hot-key-proof."""
    if blocking not in ("segment", "qgram"):
        raise ValueError(f"unknown blocking family {blocking!r}")
    lc = q * (max_distance + 1)  # minimum length for the gram/segment bound
    keys = docs.select("doc_id", key.alias("key"))
    long_keys = keys.filter(F.length("key") >= lc)
    if blocking == "segment":
        cand_long = _segment_candidates(long_keys, max_distance, lc)
    else:
        cand_long = _qgram_candidates(long_keys, max_distance, q)
    short = keys.filter(F.length("key") < lc)
    near = keys.filter(F.length("key") < lc + max_distance)
    sa = short.select(F.col("doc_id").alias("doc_a"), F.col("key").alias("ka"))
    sb = near.select(F.col("doc_id").alias("doc_b"), F.col("key").alias("kb"))
    cand_short = _norm_key_pairs(sa.join(sb, F.col("doc_a") != F.col("doc_b")))
    # lazy localCheckpoint = lineage cut: without it Catalyst pushes
    # the levenshtein verify INTO the candidate join condition and
    # evaluates the O(L²) distance on every raw gram-bucket pair
    # before the cheap positional/length conjuncts prune them
    # (measured 35 s vs ~2 s at 500 docs). The checkpointed frame is
    # the distinct candidate set — output-bound, tiny relative to the
    # corpus, same pattern as embedding_dedup_pairs.
    cand = cand_long.unionByName(cand_short).localCheckpoint(eager=False)
    return (
        cand.withColumn("dist", F.levenshtein("ka", "kb"))
        .filter(F.col("dist") <= max_distance)
        .select("doc_a", "doc_b", "dist")
    )
