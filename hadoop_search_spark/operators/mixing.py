"""Data-mixing and redaction operators for training-data pipelines
(SURVEY.md §7 phase 5 family): PII scrubbing, deterministic
stratified sampling, and per-source token-budget selection — the
three knobs a 100 TB pretraining-data run turns between "curated
corpus" and "training mix".

All three are pure Catalyst expressions (regex / hash / window), no
UDFs, with exact DuckDB oracles in the catalog:

* :func:`pii_scrub` is map-only — a narrow projection that pipelines
  into whatever consumes it;
* :func:`stratified_sample` is map-only — the keep/drop decision is a
  hash of the row's own key, so no shuffle, and the SAME rows are
  kept on every run and every partitioning (unlike ``df.sample``,
  whose output depends on partition layout);
* :func:`token_budget_mix` shuffles once on the stratum key for its
  window — the minimum possible for a per-stratum running total.

Regex patterns stick to constructs with identical semantics in Java
regex (Spark) and RE2 (DuckDB oracle): explicit character classes
(``[0-9]``, never ``\\d``/``\\s``, whose class membership differs
between the engines), ``(?:...)``, ``\\b``, bounded repetition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_search_spark.operators.dedup import md5_int
from hadoop_search_spark.operators.textstats import quality_exprs

# Leftmost non-overlapping matching is identical in Java regex and
# RE2 for these patterns (no backtracking-dependent constructs).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{7,15}|\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\b"

SAMPLE_SCALE = 10_000  # rate resolution: 1/10000


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, IPv4 addresses, and phone numbers →
    ``(doc_id, text_scrubbed, n_email, n_ip, n_phone)``.

    Replacement order is email → IP → phone, and each count is taken
    on the text AFTER the earlier categories were redacted — so an
    IP-like fragment inside an email is counted once as email, and
    ``n_email + n_ip + n_phone`` equals the number of placeholder
    tokens in ``text_scrubbed`` exactly (a reconcilable redaction
    audit). Map-only: no shuffle, no UDF."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    scrubbed = F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        scrubbed.alias("text_scrubbed"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(after_email, F.lit(IPV4_RE)).alias("n_ip"),
        F.regexp_count(after_ip, F.lit(PHONE_RE)).alias("n_phone"),
    )


def _bucket(key_col: str, salt: str = "") -> F.Column:
    """Deterministic uniform bucket in [0, SAMPLE_SCALE) from the
    row's own key — the shared cross-engine :func:`md5_int` recipe.
    A non-empty ``salt`` prefixes the key (``"<salt>:<key>"``) to
    decorrelate this bucketing from other md5(key) uses.

    The prefix is 12 hex digits (48 bits): a 4-digit (16-bit) prefix
    mod 10000 is visibly non-uniform — buckets 0..5535 occur 7/65536
    vs 6/65536 for the rest, so the low-bucket val/test ranges were
    ~7% relatively over-populated; 2^48 mod 10000 bias is ~4e-11,
    negligible."""
    key = F.col(key_col).cast("string")
    if salt:
        key = F.concat(F.lit(salt + ":"), key)
    h = md5_int(key, 12)
    return F.pmod(h, F.lit(SAMPLE_SCALE))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep each stratum at its configured rate, deterministically:
    a row survives iff ``hash(key) mod 10000 < rate*10000``. Strata
    absent from ``rates`` are dropped (rate 0).

    Because the decision is a pure function of the row's key, the
    sample is reproducible across runs, partitionings, and engines,
    and raising a stratum's rate strictly grows its kept set
    (monotone — an 0.2 sample is a subset of the 0.5 sample), which
    is what makes mixing-ratio sweeps comparable run-to-run."""
    thresh = None
    for stratum, rate in sorted(rates.items()):
        t = int(round(rate * SAMPLE_SCALE))
        cond = F.col(strata_col) == stratum
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = F.lit(0) if thresh is None else thresh.otherwise(F.lit(0))
    return docs.withColumn("bucket", _bucket(key_col)).filter(F.col("bucket") < thresh)


def token_budget_mix(
    docs: DataFrame,
    budgets: dict[str, int],
    text_col: str = "text",
    strata_col: str = "source",
) -> DataFrame:
    """Per-stratum greedy selection under a token budget →
    ``(doc_id, <strata_col>, quality, n_tokens, cum_tokens)``.

    Docs in each stratum are ranked by blended quality (desc, doc_id
    tie-break) and kept while the stratum's RUNNING token total stays
    within budget — prefix-cutoff semantics: a doc that overflows the
    budget is dropped and its tokens still count against the prefix
    (deterministic; not a knapsack re-pack). Strata absent from
    ``budgets`` are unlimited. One shuffle (the window's partition by
    stratum); quality/token features are the same expressions the
    curation pipeline uses, so ranking agrees across operators."""
    qe = quality_exprs(text_col)
    scored = docs.select(
        "doc_id",
        strata_col,
        qe["quality"].alias("quality"),
        qe["n_tokens"].alias("n_tokens"),
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cap = None
    for stratum, budget in sorted(budgets.items()):
        cond = F.col(strata_col) == stratum
        cap = F.when(cond, budget) if cap is None else cap.when(cond, budget)
    cap = F.lit(None).cast("bigint") if cap is None else cap.otherwise(F.lit(None))
    return scored.withColumn("cum_tokens", F.sum("n_tokens").over(w)).filter(
        cap.isNull() | (F.col("cum_tokens") <= cap)
    )


def sequence_pack(
    docs: DataFrame,
    seq_len: int = 256,
    text_col: str = "text",
    block: int = 4096,
) -> DataFrame:
    """Concat-and-chop sequence packing (the GPT-style pretraining
    batcher): documents, taken in doc_id order, are virtually
    concatenated into one token stream which is cut into fixed
    ``seq_len``-token training sequences; each doc is assigned the
    sequence containing its first token and its offset within it →
    ``(doc_id, n_tokens, start_tok, seq_id, seq_off)``. All integer
    arithmetic — exact on any engine.

    Scale shape: a naive global running sum is a single-partition
    window over EVERY doc. This is the two-phase distributed cumsum
    instead: docs are bucketed into ``doc_id div block`` blocks, the
    running sum inside each block is a partition-parallel window, and
    only the per-block totals (N/block rows — thousands, not
    billions) pass through the one-partition prefix window before
    being joined back. The block totals join is broadcast (a few MB
    even at 10^10 docs).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    d = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.expr(f"doc_id div {block}").alias("blk"),
    )
    in_blk = (
        Window.partitionBy("blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("cum_in_blk", F.sum("n_tokens").over(in_blk))
    blk_tot = d.groupBy("blk").agg(F.max("cum_in_blk").alias("blk_tokens"))
    prefix = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    blk_off = blk_tot.select(
        "blk",
        F.coalesce(F.sum("blk_tokens").over(prefix), F.lit(0)).alias("blk_offset"),
    )
    start = F.col("blk_offset") + F.col("cum_in_blk") - F.col("n_tokens")
    return (
        d.join(F.broadcast(blk_off), "blk")
        .select(
            "doc_id",
            "n_tokens",
            start.alias("start_tok"),
            F.expr(f"((blk_offset + cum_in_blk) - n_tokens) div {seq_len}").alias(
                "seq_id"
            ),
            (start % seq_len).alias("seq_off"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_len: int = 64,
    stride: int = 48,
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking (embedding/RAG prep): each
    doc splits into windows of ``chunk_len`` tokens starting every
    ``stride`` tokens → ``(doc_id, chunk_id, start_tok, n_tokens,
    chunk_text)``. A doc of n tokens yields
    ``1 + ceil((n - chunk_len)/stride)`` chunks (one if n <=
    chunk_len; none if empty); the last chunk may be short but always
    holds the tail, so every token is covered and consecutive chunks
    overlap by ``chunk_len - stride`` tokens.

    Plan shape: explode of the chunk-index sequence + scalar
    array-slice/concat after the explode (the codegen-cheap
    formulation — see ``dedup.exploded_spans``); map-only, no
    shuffle, pipelines straight into an embedding UDF or a writer.
    All counts are integer-exact: the ceil-division is cross-
    multiplied as ``(n - chunk_len + stride - 1) div stride``.
    """
    if stride <= 0 or chunk_len <= 0:
        raise ValueError("chunk_len and stride must be positive")
    if stride > chunk_len:
        # a gap between windows breaks the every-token-covered
        # guarantee, and the chunk-count formula would emit phantom
        # chunks past the end of short docs (negative n_tokens)
        raise ValueError("stride must be <= chunk_len (overlapping windows)")
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    base = docs.select("doc_id", toks.alias("_toks")).filter(
        F.size("_toks") > 0
    )
    n = F.size("_toks")
    extra = F.expr(
        f"(size(_toks) - {chunk_len} + {stride} - 1) div {stride}"
    )
    k = F.when(n > chunk_len, extra + 1).otherwise(F.lit(1))
    idx = base.select(
        "doc_id",
        "_toks",
        F.explode(F.sequence(F.lit(0), (k - 1).cast("int"))).alias("_c"),
    )
    start = F.col("_c") * stride
    piece = F.slice(F.col("_toks"), start + 1, chunk_len)
    return idx.select(
        "doc_id",
        F.col("_c").cast("bigint").alias("chunk_id"),
        start.cast("bigint").alias("start_tok"),
        F.least(F.lit(chunk_len), F.size("_toks") - start)
        .cast("bigint")
        .alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def shuffle_shard(
    docs: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle + sharding — the training-data
    EXPORT step: every doc gets a shard, a position within the shard,
    and a running token total → ``(doc_id, shard, pos, n_tokens,
    cum_tokens)``. ``partitionBy("shard") + sortWithinPartitions(pos)``
    on this frame writes the final shard files.

    Shard assignment and within-shard order are both pure functions
    of the row's own key (the shared cross-engine :func:`md5_int`
    recipe), so the "shuffle" is reproducible across runs, engines,
    and partition layouts — rerunning the export after adding docs
    moves only the new docs' shards, and two pipelines hashing the
    same corpus produce byte-identical shard manifests. The hash
    order is what makes this a shuffle at all: within a shard, docs
    appear in md5 order, i.e. decorrelated from ingest order — the
    property pretraining batches need.

    Scale shape: ONE shuffle (the window's partition by shard);
    within-shard rank and running-token windows share that partition
    and sort, so Spark evaluates both in a single window stage. No
    global ordering anywhere — at 10^10 docs each shard sorts
    independently in parallel. ``cum_tokens`` doubles as the shard
    manifest: its per-shard max is the shard's token size, read off
    the last row without another aggregate.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    h = md5_int(F.col(key_col).cast("string"), 12)
    d = docs.select(
        key_col,
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("_h"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return d.select(
        key_col,
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
        "n_tokens",
        F.sum("n_tokens").over(run).alias("cum_tokens"),
    )


def temperature_sample(
    docs: DataFrame,
    target_docs: int = 200,
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled mixture sampling at tau = 0.5 (the mT5 /
    XLM-R recipe for up-weighting small sources): source ``s`` with
    ``n_s`` docs is sampled at a rate proportional to
    ``n_s^tau / n_s``, so the expected TOTAL is ``target_docs`` and
    small sources contribute proportionally more than their raw share
    → the kept rows with ``(doc_id, source, bucket, thresh)``.

    Exactness: everything after one ``sqrt`` is INTEGER arithmetic.
    ``w_s = floor(sqrt(n_s) * 1e6)`` — sqrt is IEEE-correctly-rounded
    (bit-identical across engines) and floor of an identical double
    is deterministic, unlike round() whose boundary behavior differs
    cross-engine; ``thresh_s = (SCALE * target * w_s) div (n_s * W)``
    with ``W = sum(w_s)``. The products run in DECIMAL(38,0): at
    web-corpus sizes ``n_s * W`` exceeds int64 (n_s = 1e10 gives
    w_s = 1e11, product 1e21 > 2^63), where bare BIGINT arithmetic
    would silently wrap under Spark's non-ANSI default — DECIMAL(38)
    holds ~1e38 and the integral division is exact on both engines.
    Rates are capped at 1 implicitly (a thresh above SCALE keeps
    everything); no waterfilling re-spread of the capped mass
    (documented).

    Scale shape: per-source counts are one tiny aggregation, the
    thresholds a broadcast join, the keep/drop decision the same
    map-only salted key hash as :func:`stratified_sample` —
    reproducible across runs, partitionings, and engines."""
    counts = docs.groupBy(source_col).agg(F.count("*").alias("n_s"))
    w = counts.withColumn(
        "w_s",
        F.floor(F.sqrt(F.col("n_s").cast("double")) * 1000000).cast("bigint"),
    )
    tot = w.agg(F.sum("w_s").cast("bigint").alias("w_tot"))
    thresh = (
        w.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            F.expr(
                f"(CAST({SAMPLE_SCALE * int(target_docs)} AS DECIMAL(38,0))"
                " * w_s) div (CAST(n_s AS DECIMAL(38,0)) * w_tot)"
            ).alias("thresh"),
        )
    )
    bucket = _bucket(key_col, salt="temp")
    return (
        docs.select(key_col, source_col)
        .withColumn("bucket", bucket)
        .join(F.broadcast(thresh), source_col)
        .filter(F.col("bucket") < F.col("thresh"))
        .select(key_col, source_col, "bucket", "thresh")
    )


def _dsir_toks(
    docs: DataFrame, text_col: str, source_col: str
) -> DataFrame:
    """(doc_id, _src, tok) token stream shared by the weight build and
    the scoring pass."""
    return docs.select(
        "doc_id",
        F.col(source_col).alias("_src"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
        ).alias("tok"),
    )


def dsir_weights(
    docs: DataFrame,
    target_source: str = "src0",
    text_col: str = "text",
    source_col: str = "source",
) -> tuple[DataFrame, DataFrame]:
    """The DSIR weight MODEL, split out of :func:`dsir_select` so it
    can be published and served against a document stream
    (`streaming/dsir_ingest.py`): returns ``(weights, meta)`` where
    ``weights`` is the vocab-sized ``(tok, w6)`` table and ``meta`` is
    one row ``(n_s, v, n_t, default_w6)`` — ``default_w6`` is the
    smoothed weight of a token UNSEEN at weight-build time
    (cnt_s = cnt_t = 0 in the same formula, same double association,
    so a frozen model scores novel stream tokens exactly as a rebuilt
    model with those counts would)."""
    toks = _dsir_toks(docs, text_col, source_col)
    cnt_s = toks.groupBy("tok").agg(F.count("*").alias("cnt_s"))
    cnt_t = (
        toks.filter(F.col("_src") == target_source)
        .groupBy("tok")
        .agg(F.count("*").alias("cnt_t"))
    )
    # vocab = the corpus vocabulary (cnt_s covers every token that
    # can appear at scoring time; target-only tokens can't exist)
    totals = cnt_s.agg(
        F.sum("cnt_s").alias("n_s"), F.count("*").alias("v")
    )
    t_total = cnt_t.agg(F.coalesce(F.sum("cnt_t"), F.lit(0)).alias("n_t"))

    def w6_expr(cnt_t_col, cnt_s_col):
        return (
            F.round(
                F.log10(
                    (
                        (cnt_t_col + 1).cast("double")
                        * (F.col("n_s") + F.col("v")).cast("double")
                    )
                    / (
                        (cnt_s_col + 1).cast("double")
                        * (F.col("n_t") + F.col("v")).cast("double")
                    )
                ),
                6,
            )
            .cast("decimal(18,6)")
        )

    weights = (
        cnt_s.join(cnt_t, "tok", "left")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(t_total))
        .select(
            "tok",
            w6_expr(
                F.coalesce(F.col("cnt_t"), F.lit(0)), F.col("cnt_s")
            ).alias("w6"),
        )
    )
    meta = (
        totals.crossJoin(t_total)
        .select(
            "n_s",
            "v",
            "n_t",
            w6_expr(F.lit(0), F.lit(0)).alias("default_w6"),
        )
    )
    return weights, meta


def dsir_score(
    toks: DataFrame, weights: DataFrame, default_w6=None
) -> DataFrame:
    """Score a ``(doc_id, tok)`` stream against a DSIR weight table →
    ``(doc_id, n_tokens, score, keep)``. With ``default_w6`` set
    (serving a FROZEN model), tokens missing from the table get the
    unseen-token weight via a left join; without it (the batch path,
    where the table covers the corpus vocabulary by construction) the
    join is inner and Catalyst is free to pick the cheaper side."""
    if default_w6 is None:
        joined = toks.join(weights, "tok")
        w = F.col("w6")
    else:
        joined = toks.join(weights, "tok", "left")
        w = F.coalesce(F.col("w6"), F.lit(default_w6).cast("decimal(18,6)"))
    scored = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(w).alias("_sum6"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        F.col("_sum6").cast("double").alias("score"),
        (F.col("_sum6") > 0).alias("keep"),
    )


def dsir_select(
    docs: DataFrame,
    target_source: str = "src0",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """DSIR-style importance weighting for data selection (Xie et al.
    2023, simplified to unigram features): score every document by
    how much more likely its tokens are under a TARGET domain
    distribution than under the full corpus distribution →
    ``(doc_id, n_tokens, score, keep)``. ``score`` is the summed
    per-token log10 likelihood ratio with Laplace smoothing; ``keep``
    marks docs whose evidence favors the target (score > 0) — the
    resampling step of a target-domain selection pass.

    Cross-engine exactness: each token's weight is
    ``log10(((cnt_t+1) * (N_s+V)) / ((cnt_s+1) * (N_t+V)))`` with
    the products and the single division done in doubles in exactly
    this association (IEEE multiply/divide are bit-identical across
    engines; log10 is the safe log), quantized to DECIMAL(18,6)
    BEFORE the per-doc sum.

    Scale shape: identical to the surprisal family — two token-keyed
    count aggregations (target slice + corpus), a vocab-sized weight
    table joined back to the token stream, one per-doc aggregation.
    No all-pairs, no driver state; the scalar totals (N_t, N_s, V)
    are 1-row broadcast aggregates."""
    toks = _dsir_toks(docs, text_col, source_col)
    weights, _ = dsir_weights(docs, target_source, text_col, source_col)
    return dsir_score(toks, weights)


def train_val_test_split(
    docs: DataFrame,
    val_frac: float = 0.01,
    test_frac: float = 0.01,
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment → the input plus a
    ``split`` column: the same hash-bucket machinery as
    :func:`stratified_sample`, carved into three ranges, so the split
    is a pure function of the row's key — stable across runs,
    partitionings, engines, AND corpus growth (a doc keeps its split
    when new docs arrive, the property eval-set hygiene needs; a
    random split reshuffles eval docs into train on every rerun).

    ``salt`` decorrelates this hash from every other md5(key) use
    (sampling, sharding): without it, a 1% val split would be a
    SUBSET of a 1% stratified sample keyed on the same id. Map-only,
    no shuffle — a narrow projection that pipelines into writers.
    """
    if val_frac < 0 or test_frac < 0 or val_frac + test_frac >= 1:
        raise ValueError("need val_frac, test_frac >= 0 with sum < 1")
    if not salt:
        # an unsalted split would share buckets with the unsalted
        # sampling/sharding hashes — the exact correlation this
        # function exists to rule out
        raise ValueError("split salt must be non-empty")
    v = int(round(val_frac * SAMPLE_SCALE))
    t = int(round(test_frac * SAMPLE_SCALE))
    bucket = _bucket(key_col, salt=salt)
    split = (
        F.when(bucket < v, "val")
        .when(bucket < v + t, "test")
        .otherwise("train")
    )
    return docs.withColumn("split", split)


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    val_frac: float = 0.01,
    test_frac: float = 0.01,
    key_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    salt: str = "split",
) -> DataFrame:
    """Near-dup-cluster-ATOMIC train/val/test assignment →
    ``(doc_id, component, split)``: connected components over the
    near-duplicate ``pairs`` graph, then the :func:`train_val_test_
    split` hash carved over the CLUSTER label instead of the doc id,
    so every member of a near-dup family lands in the same split.

    This is the eval-hygiene property a per-doc split cannot give: a
    doc and its near-duplicate must never straddle the train/val
    boundary (the val copy would be memorized via its train twin —
    split leakage). Because the cluster label is the MIN doc id of
    the component, the assignment is still deterministic and stable
    under corpus growth as long as a cluster's minimum id doesn't
    change; new docs joining an existing cluster inherit its split.

    Scale shape: components is O(log diameter) rounds over the pair
    subgraph only (isolated docs bypass the loop); the split itself
    is a map-only hash of the label. ``pairs`` comes from whichever
    near-dup operator fits the corpus (MinHash-LSH, SimHash,
    embedding cosine) — candidate generation scale-behavior is
    theirs."""
    from hadoop_search_spark.operators.graph import connected_components

    comp = connected_components(
        pairs, nodes=docs.select(key_col), src=src, dst=dst
    )
    labeled = comp.select(F.col("node").alias(key_col), "component")
    return train_val_test_split(
        labeled, val_frac, test_frac, key_col="component", salt=salt
    )
