"""Deduplication operators for large-scale training-data pipelines.

Five families, each a first-class operator over a document DataFrame:

- exact            — hash-groupBy on a normalized fingerprint (md5)
- minhash_lsh      — shingle → minhash signature → band-bucket join
- simhash          — 64-bit simhash + band-bucket candidate pairing
- ngram_jaccard    — exact n-gram Jaccard verification on candidates
- embedding cosine — see operators.similarity (near-dup by vector)

Scale stance (100 TB): never build the global pair matrix. Candidate
generation is always *bucketed* (LSH bands / simhash bands) so the
only joins are equi-joins on bucket keys, which shuffle-partition
cleanly; exact verification runs only within buckets. Hot buckets
(boilerplate text) are the skew risk — AQE skew-join handles moderate
cases; pathological buckets should be capped upstream.

Hashing uses Spark's built-in xxhash64/murmur (JVM-side, codegen).
These are deterministic across executors/runs — but engine-specific,
so LSH-based operators are verified by the rows-only track plus local
invariant tests, while exact dedup has a full DuckDB oracle.
"""

from __future__ import annotations

from uuid import uuid4

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.functions.text import fingerprint, tokens


def _spread(df: DataFrame) -> DataFrame:
    """Ensure enough partitions for CPU-heavy per-row work.

    A small/compacted parquet source arrives as one or two input
    splits; signature computation (dozens of hashes per row) would
    then run on one core. At real scale the scan already yields
    thousands of splits and this is a no-op."""
    # inputFiles() inspects the plan without running anything; .rdd
    # would force AQE to materialize upstream query stages just to
    # count partitions — a full extra job on non-scan plans.
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = target
    if 0 < n_files < target:
        return df.repartition(target)
    return df


# ----------------------------------------------------------- exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per normalized-text group.

    One shuffle on the fingerprint; min() is algebraic so map-side
    combine applies. Output: (id_col, fp) — join back to recover
    payload columns, keeping the shuffle payload narrow.
    """
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "fp")
    )


# ----------------------------------------------------- minhash LSH


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles as strings (sliding window over tokens)."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    )


# Kirsch-Mitzenmacher double hashing: the family h_i(s) = (b1(s) +
# i*b2(s)) mod P needs only TWO string hashes per shingle instead of
# num_hashes — the remaining hashes are integer multiply-adds inside
# codegen. Same scheme (and prime) as Spark ML's MinHashLSH; the
# prime < 2^31 keeps i*b2 far from BIGINT overflow under ANSI mode.
_MH_PRIME = 2038074743


def _mh_bases(s: Column) -> tuple[Column, Column]:
    return (
        F.pmod(F.xxhash64(s), F.lit(_MH_PRIME)),
        F.pmod(F.xxhash64(s, F.lit(1)), F.lit(_MH_PRIME)),
    )


def minhash_signature(col: Column | str, num_hashes: int = 32, k: int = 3) -> Column:
    """MinHash signature as a single column expression: per hash
    function i, min over shingles of (b1 + i*b2) mod P (double
    hashing, two xxhash64 per shingle). Pure built-ins —
    ARRAY<BIGINT> of length num_hashes, JVM-side.

    Column-expression form for composition; the LSH pipeline uses the
    explode/aggregate formulation (:func:`minhash_signatures`) which
    codegens faster than this num_hashes-deep lambda tree."""
    bases = F.transform(
        shingles(col, k),
        lambda s: F.struct(_mh_bases(s)[0].alias("b1"), _mh_bases(s)[1].alias("b2")),
    )
    def _min_i(i: int) -> Column:
        # single-argument lambda: a two-parameter lambda would be
        # interpreted by transform() as the (element, index) form,
        # shadowing the hash index with the array position
        return F.array_min(
            F.transform(
                bases,
                lambda p: F.pmod(p["b1"] + F.lit(i) * p["b2"], F.lit(_MH_PRIME)),
            )
        )

    return F.array(*[_min_i(i) for i in range(num_hashes)])


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, sh ARRAY<STRING>) — the distinct k-shingle set per doc.

    The Jaccard verifier's input relation; also accepted by the
    signature builders via their ``sets=`` parameter for pipelines
    that want one shared (persisted) shingle pass. Note
    array_distinct is O(n²) string comparisons per row — signature
    computation skips it (min is duplicate-insensitive)."""
    return _spread(df).select(
        F.col(id_col), F.array_distinct(shingles(text_col, k)).alias("sh")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    k: int = 3,
    sets: DataFrame | None = None,
    use_explode: bool = True,
) -> DataFrame:
    """(id, sig ARRAY<BIGINT>) via explode + num_hashes algebraic min
    aggregates. All shingles of a document sit in its input partition,
    so map-side partial aggregation collapses the exploded rows back
    to one row per document before the exchange — the shuffle carries
    (id, num_hashes longs) regardless of document length, and skewed
    document sizes never concentrate on one reducer.

    ``sets``: precomputed :func:`shingle_sets` relation to reuse
    (min over the distinct set equals min over the multiset).

    ``use_explode=False`` computes the signature as a single per-row
    array expression instead (no shuffle) — but projection collapse
    inlines the shingle-hash subtree into all num_hashes array_min
    branches, so it evaluates the base hashes num_hashes times per
    row: measured ~4× slower than the explode form. Kept only for
    plan-composition cases where a shuffle is unacceptable."""
    if sets is None and use_explode:
        # raw (non-distinct) shingles: min() is duplicate-insensitive
        # and array_distinct is an O(n²) string comparison per row
        ex = _spread(df).select(
            F.col(id_col), F.explode(shingles(text_col, k)).alias("s")
        )
    elif use_explode:
        ex = sets.select(F.col(id_col), F.explode("sh").alias("s"))
    if sets is None and not use_explode:
        sets = shingle_sets(df, text_col, id_col, k)
    if not use_explode:
        bases = F.transform(
            F.col("sh"),
            lambda s: F.struct(
                _mh_bases(s)[0].alias("b1"), _mh_bases(s)[1].alias("b2")
            ),
        )
        def _min_i(i: int) -> Column:
            # single-argument lambda — see minhash_signature
            return F.array_min(
                F.transform(
                    bases,
                    lambda p: F.pmod(
                        p["b1"] + F.lit(i) * p["b2"], F.lit(_MH_PRIME)
                    ),
                )
            )

        sig = F.array(*[_min_i(i) for i in range(num_hashes)])
        return sets.select(F.col(id_col), sig.alias("sig"))
    b1, b2 = _mh_bases(F.col("s"))
    hashed = ex.select(id_col, b1.alias("b1"), b2.alias("b2"))
    agg = hashed.groupBy(id_col).agg(
        *[
            F.min(
                F.pmod(F.col("b1") + F.lit(i) * F.col("b2"), F.lit(_MH_PRIME))
            ).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return agg.select(
        id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    sets: DataFrame | None = None,
    max_bucket_size: int | None = 512,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    rows_per_band = num_hashes/bands; two docs land in the same bucket
    iff a whole band of their signatures matches. Self-join is an
    equi-join on (band, band_hash) — broadcast-free, shuffle-clean.
    Output: (a, b) id pairs with a < b, distinct.

    ``max_bucket_size`` guards the quadratic in-bucket pair explosion
    against pathological buckets (boilerplate-heavy corpora hash
    megadoc cliques into one bucket; at 100 TB that one bucket is an
    OOM). Buckets above the cap are dropped whole — their members
    still pair up through their other, more selective bands — and the
    drop count is published as an ``observe()`` metric (see
    :func:`_bucket_pairs`). ``None`` disables the cap.
    """
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k, sets=sets)
    banded = band_buckets(sig, id_col, num_hashes, bands)
    # Pair generation WITHIN buckets: one shuffle keyed on the bucket,
    # then JVM-side combinatorics over the (sorted) member array. This
    # computes the expensive signature pipeline exactly once — a
    # self-join would recompute it for both sides — and the only data
    # shuffled is (id, band, bucket). Hot buckets (boilerplate text)
    # are the skew risk; the cap below bounds the quadratic blowup.
    return _bucket_pairs(banded, id_col, max_bucket_size)


def band_buckets(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, sig) → (id, band, bucket): xxhash64 of each contiguous
    signature band. Shared by the batch self-dedup and the
    incremental ingest path — the banding MUST be identical for an
    incremental run to land new docs in the same buckets a batch run
    would."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.element_at("sig", b * r + j + 1) for j in range(r)]
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def _hot_bucket_guard(
    members: DataFrame, cap: int | None, members_col: str
) -> DataFrame:
    """Drop buckets whose ``members_col`` array exceeds ``cap``
    entries before pair explosion, publishing the drop count as a
    named ``observe()`` metric (a CollectMetrics node — zero extra
    jobs; read it from a QueryExecutionListener /
    StreamingQueryListener). A hot bucket of size m would emit
    m·(m-1)/2 pairs; at 100 TB one boilerplate clique is an executor
    OOM, and its members still reach each other through their other,
    more selective bands. The metric name embeds ``members_col`` plus
    a per-call uuid so concurrent builds never collide on
    observation names."""
    if cap is None:
        return members
    size_col = F.size(members_col)
    name = f"hot_buckets_{members_col}_{uuid4().hex[:8]}"
    return members.observe(
        name,
        F.sum(F.when(size_col > cap, 1).otherwise(0)).alias("dropped_buckets"),
        F.sum(F.when(size_col > cap, size_col).otherwise(0)).alias(
            "dropped_members"
        ),
    ).filter(size_col <= cap)


def _explode_member_pairs(
    members: DataFrame, members_col: str, pair_builder=None
) -> DataFrame:
    """Sorted member array → all (x, y) element pairs with
    x-before-y, JVM-side (array higher-order functions, no Python).
    One output row per in-bucket pair; callers dedup across buckets
    if members can co-occur in more than one.

    ``pair_builder(x, y) -> struct Column`` customizes the emitted
    struct (default: ``(a, b)`` from the raw elements) — the slice
    combinatorics live HERE only, shared by the MinHash and SimHash
    paths."""
    if pair_builder is None:
        pair_builder = lambda x, y: F.struct(  # noqa: E731
            x.alias("a"), y.alias("b")
        )
    exploded = members.select(
        F.explode(
            F.flatten(
                F.transform(
                    members_col,
                    lambda x, i: F.transform(
                        F.slice(
                            F.col(members_col),
                            i + 2,
                            F.greatest(
                                F.size(members_col) - i - 1, F.lit(0)
                            ),
                        ),
                        lambda y: pair_builder(x, y),
                    ),
                )
            )
        ).alias("p")
    )
    return exploded.select("p.*")


# Public aliases: the bucket-cap and pair-explosion helpers have a
# cross-module consumer (operators.similarity.embedding_near_dups
# shares the capped bucketed self-join shape) — the underscore names
# remain for in-module brevity.
hot_bucket_guard = _hot_bucket_guard
explode_member_pairs = _explode_member_pairs


def _bucket_pairs(
    banded: DataFrame, id_col: str, max_bucket_size: int | None = 512
) -> DataFrame:
    """(id, band, bucket) → distinct (a, b) pairs co-bucketed in ≥1 band."""
    members = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    members = _hot_bucket_guard(members, max_bucket_size, "ids")
    return _explode_member_pairs(members, "ids").distinct()


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 3,
                  sets: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    Joins the (a, b) pair relation back to shingle sets and computes
    |A∩B|/|A∪B| with array built-ins. Candidates only — never all
    pairs: the doc side is semi-join-pruned to ids that actually
    appear in a pair before the (expensive) shingle computation runs.
    Output: (a, b, jaccard DOUBLE).

    ``sets``: precomputed (persisted) :func:`shingle_sets` relation.
    When given, the semi-join prune is skipped — the pair joins
    themselves select only the needed rows from the cached relation,
    and no text expression is re-evaluated here at all."""
    if sets is None:
        pair_ids = (
            df_pairs.select(F.col("a").alias(id_col))
            .union(df_pairs.select(F.col("b").alias(id_col)))
            .distinct()
        )
        sets = shingle_sets(
            docs.join(pair_ids, id_col, "left_semi"), text_col, id_col, k
        )
    sets_df = sets
    return (
        df_pairs.join(sets_df.withColumnRenamed(id_col, "a").withColumnRenamed("sh", "sh_a"), "a")
        .join(sets_df.withColumnRenamed(id_col, "b").withColumnRenamed("sh", "sh_b"), "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )


def minhash_dedup(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard filter.
    Returns pairs (a, b, jaccard) with jaccard >= threshold.

    The corpus text is tokenized exactly twice: once in the signature
    stage (the measured-faster explode + min-agg formulation — see
    SCALE.md on why the no-shuffle fold variant lost), and once in
    the verifier — but there semi-join pruned to only the documents
    that appear in a candidate pair, which LSH keeps orders of
    magnitude smaller than the corpus. The candidate pair set is
    consumed three times by the verification step (two
    id-projections for the prune and the final join), so it is
    materialized once via an eager ``localCheckpoint`` — unlike a
    ``persist``, the checkpoint's storage is released automatically
    when the result is dropped (no cache entry accumulating across
    repeated calls in a long-lived session)."""
    cand = minhash_lsh_candidates(
        df, text_col, id_col, num_hashes, bands, k
    ).localCheckpoint()
    return ngram_jaccard(cand, df, text_col, id_col, k).filter(
        F.col("jaccard") >= threshold
    )


def canonicalize(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate-cluster canonicalization — the step a corpus pipeline
    runs after near-dup pair generation: connected components over the
    pair graph, then every document maps to its cluster's minimum id
    (itself when unpaired). Keep-one dedup is then
    ``filter(doc_id == canonical)``.

    Pair graphs are tiny relative to the corpus (LSH keeps them so),
    and the CC loop runs on pairs only; the corpus is touched once by
    the final left join, which at scale broadcasts the component map
    when it fits. Returns (id_col, canonical)."""
    from pagerank_mapreduce_spark.graph.algorithms import connected_components

    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    comp = connected_components(edges)
    return (
        df.select(id_col)
        .join(comp, F.col(id_col) == F.col("id"), "left")
        .select(
            F.col(id_col),
            F.coalesce("comp", F.col(id_col)).alias("canonical"),
        )
    )


# -------------------------------------------------------- simhash


def portable_hash60(s: Column) -> Column:
    """60-bit hash both Spark and DuckDB can compute identically:
    the first 15 hex chars of md5, parsed as an integer
    (``('0x' || substr(md5(s), 1, 15))::BIGINT`` on the DuckDB side).
    Slower than xxhash64 (crypto rounds vs one multiply chain) —
    used only where cross-engine replay matters more than speed."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              k: int = 2, hash_fn=F.xxhash64) -> DataFrame:
    """63-bit SimHash over word k-shingles (sign bit skipped to stay in
    positive BIGINT space). Returns (id_col, sh BIGINT).

    Shape: explode shingles → hash → ONE groupBy(id) with 63
    algebraic sign-sum aggregates → assemble bits. One shuffle keyed
    on the doc id; every aggregate gets map-side partial aggregation,
    so skewed document lengths stay safe at scale.

    ``hash_fn`` picks the per-shingle hash: xxhash64 (default, fast)
    or :func:`portable_hash60` whose 60 bits replay exactly in DuckDB
    — the checked ``dedup_simhash_pairs`` query uses the portable one
    so the whole pipeline is oracle-verifiable. With a 60-bit hash,
    bits 60-62 are never set, so those sign-sums are all-negative and
    the fingerprint bits land at 0 in both engines — consistent."""
    hashed = _spread(df).select(
        F.col(id_col), F.explode(shingles(text_col, k)).alias("s")
    ).select(id_col, hash_fn(F.col("s")).alias("h"))
    sign_sums = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(63)
    ]
    agg = hashed.groupBy(id_col).agg(*sign_sums)
    sh = F.lit(0)
    for i in range(63):
        sh = sh.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    return agg.select(F.col(id_col), sh.cast("bigint").alias("sh"))


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    k: int = 2,
    max_bucket_size: int | None = 512,
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Near-dup candidates: docs agreeing on at least one of ``bands``
    16-bit slices of their simhash (covers Hamming distance < bands).
    Same bucketed-equi-join shape as MinHash-LSH, including the
    hot-bucket cap (see :func:`_hot_bucket_guard`)."""
    width = 64 // bands
    sim = simhash64(df, text_col, id_col, k, hash_fn)
    banded = sim.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sh"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sh", "bb.band", "bb.bucket")
    # Same bucket-local pair generation as MinHash-LSH (no self-join;
    # the simhash is computed once and travels with the id). array_sort
    # on struct orders by the leading field, giving a < b for free.
    members = (
        banded.groupBy("band", "bucket")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("id"), "sh"))
            ).alias("ms")
        )
        .filter(F.size("ms") > 1)
    )
    members = _hot_bucket_guard(members, max_bucket_size, "ms")
    pairs = _explode_member_pairs(
        members,
        "ms",
        pair_builder=lambda x, y: F.struct(
            x["id"].alias("a"),
            y["id"].alias("b"),
            F.bit_count(x["sh"].bitwiseXOR(y["sh"])).alias("hamming"),
        ),
    )
    return pairs.distinct()


# ----------------------------------------------- decontamination


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    hash_grams: bool = True,
) -> DataFrame:
    """Train/test contamination check: for every training doc that
    shares at least one word ``k``-gram with ANY test doc, return
    ``(id_col, n_shared_ngrams)`` — the count of distinct
    contaminated k-grams in that doc. The standard
    eval-decontamination pass of a pre-training pipeline.

    Scale shape: both sides explode to ``(doc, k-gram)`` rows; the
    test side collapses to its distinct k-gram set — at 100 TB that
    set is still orders of magnitude smaller than the training
    corpus (eval suites are small) and both sides hash-partition on
    the k-gram, so the join is one narrow shuffle keyed by k-gram
    and the per-doc count is a group-by on ``id_col``. No pair
    explosion: a k-gram shared by m test docs still contributes one
    test-side row.

    Three measured choices (sf0.1, local[32], warm):

    - gram keys are TOKEN-LEVEL ROLLING HASHES, never gram strings:
      each token is xxhash64'd once, and a gram's 64-bit key is the
      XOR of its k token hashes, each rotated by 7·position bits
      (position-sensitive, so (a,b) ≠ (b,a)). Building and hashing
      the ~6·k-char gram strings instead measures 2.9× slower
      end-to-end — the string materialization dominates, not the
      hashing. A doc shorter than k tokens hashes its joined token
      string as one whole-text key (mirrors :func:`shingles`).
      Collision risk for G distinct grams is ~G²/2⁶⁵ (≈0.5% at
      G=10¹⁰); pass ``hash_grams=False`` for the exact string join.
    - the shuffle carries those 8-byte keys, not strings — a
      several-fold byte reduction at 100 TB.
    - per-doc gram dedup happens in the aggregate
      (``count_distinct``), not per row: ``array_distinct`` over an
      n-token doc is O(n²) string comparisons row-side — measured
      ~15% slower than letting the partial aggregation dedup.

    No reference counterpart — training-data-pipeline extension.
    """
    def grams_rolling(df: DataFrame, *head) -> DataFrame:
        toks = tokens(text_col)
        th = F.transform(toks, lambda t: F.xxhash64(t))
        n = F.size(th)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))

        def rot(c: Column, r: int) -> Column:
            # bitwise rotate-left: shifts wrap, no ANSI overflow
            return F.shiftleft(c, r).bitwiseOR(
                F.shiftrightunsigned(c, 64 - r)
            )

        def gram(i: Column) -> Column:
            g = F.element_at(F.col("_th"), i + 1)
            for j in range(1, k):
                g = g.bitwiseXOR(
                    rot(F.element_at(F.col("_th"), i + 1 + j), 7 * j)
                )
            return g

        # whole-text key for docs shorter than k: hash the JOINED
        # token string, exactly mirroring shingles()' short-doc gram.
        # An unrotated XOR fold of the token hashes here would be
        # order-insensitive and self-canceling ("a b" = "b a",
        # "ha ha" = "" = key 0) — structured collisions, not the
        # random 2^-64 kind. CASE is per-row lazy, so the join cost
        # is paid only by short docs.
        whole = F.xxhash64(F.array_join(toks, " "))
        pre = df.select(
            *head,
            th.alias("_th"),
            idx.alias("_idx"),
            n.alias("_n"),
            F.when(n < k, whole).alias("_wk"),
        )
        out = pre.select(
            *head,
            "_th",
            "_n",
            "_wk",
            F.explode(
                F.when(F.col("_n") < k, F.array(F.lit(0))).otherwise(
                    F.col("_idx")
                )
            ).alias("_i"),
        )
        g = F.when(F.col("_n") < k, F.col("_wk")).otherwise(
            gram(F.col("_i"))
        )
        return out.select(*head, g.alias("ng"))

    def grams_exact(df: DataFrame, *head) -> DataFrame:
        # explode must be a top-level generator
        return df.select(
            *head, F.explode(shingles(text_col, k)).alias("ng")
        )

    grams = grams_rolling if hash_grams else grams_exact
    tr = grams(train, id_col)
    te = grams(_spread(test)).distinct()
    return tr.join(te, "ng").groupBy(id_col).agg(
        F.count_distinct("ng").cast("bigint").alias("n_shared_ngrams")
    )


def dup_span_coverage(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_key: str = "portable",
) -> DataFrame:
    """Per-document duplicated-substring coverage — the signal behind
    substring-level training-data dedup (Lee et al., *Deduplicating
    Training Data Makes Language Models Better*, ACL'22): a token
    position is "covered" when some word ``n``-gram through it also
    appears in at least one OTHER document. Returns one row per doc:
    ``(doc_id, n_tokens, dup_ngrams, covered_tokens, dup_ratio)`` —
    a pipeline thresholds ``dup_ratio`` to drop boilerplate-heavy
    docs or routes covered spans to a cut pass.

    Shape: explode to (doc, start, gram-key) rows; grams duplicated
    across ≥2 docs are found with one algebraic groupBy on the key
    (count_distinct partial-aggregates map-side, so a boilerplate
    gram in 10⁶ docs is skew-safe); covered positions are the UNION
    of the [s, s+n) intervals of the doc's duplicated starts —
    computed by exploding each start into its n positions and
    count_distinct-ing per doc, which keeps the whole thing
    algebraic aggregation instead of a per-doc interval-merge fold.
    The explode factor is n× the *duplicated* starts only, not the
    corpus.

    Two gram-key modes, identical semantics (both 1-row-per-start,
    8-byte shuffle keys, never gram strings through the exchange):

    - ``gram_key="portable"`` (default): :func:`portable_hash60` of
      the joined gram string (md5) — the DuckDB oracle replays the
      keys bit-for-bit, so the catalog entry is hash-checked.
    - ``gram_key="fast"``: the rolling position-rotated xxhash64 of
      :func:`decontaminate` — each token hashed ONCE, a gram key is
      n element lookups + rotate-XORs, no gram-string
      materialization (measured 2.9× faster on the same shape
      there). The production mode at 100 TB; not SQL-replayable.
      Both modes are asserted equal on collision-free corpora in
      tests.

    No reference counterpart — training-data-pipeline extension.
    """
    if gram_key not in ("portable", "fast"):
        raise ValueError(f"gram_key must be portable|fast, got {gram_key!r}")
    toks = tokens(text_col)
    pre = [F.col(id_col), toks.alias("_t"), F.size(toks).alias("n_tokens")]
    if gram_key == "fast":
        pre.append(
            F.transform(toks, lambda t: F.xxhash64(t)).alias("_th")
        )
    base = docs.select(*pre)

    def _rot(c: Column, r: int) -> Column:
        # bitwise rotate-left (wraps, no ANSI overflow) — the
        # decontaminate gram key's position sensitivity
        return F.shiftleft(c, r).bitwiseOR(F.shiftrightunsigned(c, 64 - r))

    def _key(s: Column) -> Column:
        if gram_key == "portable":
            return portable_hash60(F.array_join(F.slice("_t", s + 1, n), " "))
        g = F.element_at(F.col("_th"), s + 1)
        for j in range(1, n):
            g = g.bitwiseXOR(_rot(F.element_at(F.col("_th"), s + 1 + j), (7 * j) % 64))
        return g

    # docs shorter than n contribute no grams (sequence() would count
    # backwards on a negative span) but keep their zero-coverage row
    # via the final left join
    grams = (
        base.filter(F.col("n_tokens") >= n)
        .select(
            id_col,
            F.posexplode(
                F.transform(F.sequence(F.lit(0), F.col("n_tokens") - n), _key)
            ).alias("s", "gk"),
        )
    )
    dup_grams = (
        grams.groupBy("gk")
        .agg(F.count_distinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("gk")
    )
    dup_starts = grams.join(dup_grams, "gk", "left_semi")
    # dup_ngrams via the p == s flag, NOT a second count_distinct:
    # each start contributes exactly one offset-0 position row, so
    # summing the flag counts starts — a double distinct would plan
    # an Expand (2× the exploded rows through the shuffle), while a
    # single distinct plans as a plain two-phase HashAggregate
    per_doc = (
        dup_starts.select(
            id_col,
            "s",
            F.explode(F.sequence(F.col("s"), F.col("s") + (n - 1))).alias("p"),
        )
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("p") == F.col("s"), 1).otherwise(0)).alias(
                "dup_ngrams"
            ),
            F.count_distinct("p").alias("covered_tokens"),
        )
    )
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("dup_ngrams", F.lit(0)).alias("dup_ngrams"),
        F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.coalesce("covered_tokens", F.lit(0)) / F.col("n_tokens"), 6
            )
        )
        .alias("dup_ratio"),
    )


def minhash_incremental_pairs(
    docs: DataFrame,
    is_new: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    max_bucket_pairs: int | None = 4096,
) -> DataFrame:
    """Ingest-time dedup: for a corpus split into an existing INDEX
    and a NEW batch (``is_new`` boolean column expression), emit
    verified near-duplicate (a=index doc, b=new doc) pairs — "does
    this incoming document duplicate what we already hold?". Output:
    (a, b, jaccard), exact n-gram-Jaccard-verified at ``threshold``.

    Shares :func:`band_buckets` with the batch path, so an
    incremental run lands new docs in exactly the buckets a batch
    re-run would. Pair space is index × new WITHIN buckets only: new
    docs never pair with each other and the index never re-pairs
    with itself — per ingest batch the candidate cost scales with
    the batch, not the corpus. ``max_bucket_pairs`` caps the
    per-bucket cross product (old·new), the incremental analogue of
    the batch path's ``max_bucket_size``, published as an observe()
    drop metric; capped members still meet through their other
    bands.
    """
    sig = minhash_signatures(docs, text_col, id_col, num_hashes, k)
    side = docs.select(F.col(id_col), is_new.alias("_new"))
    banded = band_buckets(sig, id_col, num_hashes, bands).join(side, id_col)
    members = (
        banded.groupBy("band", "bucket")
        .agg(
            F.array_sort(
                F.collect_list(F.when(~F.col("_new"), F.col(id_col)))
            ).alias("old_ids"),
            F.array_sort(
                F.collect_list(F.when(F.col("_new"), F.col(id_col)))
            ).alias("new_ids"),
        )
        .filter((F.size("old_ids") > 0) & (F.size("new_ids") > 0))
    )
    if max_bucket_pairs is not None:
        npairs = F.size("old_ids") * F.size("new_ids")
        name = f"hot_cross_buckets_{uuid4().hex[:8]}"
        members = members.observe(
            name,
            F.sum(F.when(npairs > max_bucket_pairs, 1).otherwise(0)).alias(
                "dropped_buckets"
            ),
            F.sum(
                F.when(npairs > max_bucket_pairs, npairs).otherwise(0)
            ).alias("dropped_pairs"),
        ).filter(npairs <= max_bucket_pairs)
    pairs = (
        members.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "old_ids",
                        lambda o: F.transform(
                            F.col("new_ids"),
                            lambda n: F.struct(o.alias("a"), n.alias("b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.*")
        .distinct()
        .localCheckpoint()
    )
    return ngram_jaccard(pairs, docs, text_col, id_col, k).filter(
        F.col("jaccard") >= threshold
    )


# ----------------------------------------------- paragraph dedup (r8)


def paragraph_dedup(
    df: DataFrame,
    splitter: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    joiner: str = "\n\n",
) -> DataFrame:
    """Paragraph-granularity exact dedup with document reassembly —
    the RefinedWeb/MassiveText shape: boilerplate paragraphs (headers,
    navigation, license blocks) repeat across millions of documents
    that are NOT near-duplicates at whole-document granularity, so
    whole-doc dedup (exact_dedup / minhash_dedup) never removes them.

    Semantics: split each document into paragraphs via ``splitter``
    (an array<string> Column; default: blank-line boundaries), drop
    blank/whitespace-only fragments, keep the corpus-wide FIRST
    occurrence of each distinct paragraph — lowest (doc_id, position)
    — and reassemble every document from its surviving paragraphs in
    original order joined by ``joiner`` (default: a blank line, so the
    default splitter re-splits its own output — idempotence holds
    per splitter/joiner pair that round-trips). A document whose every
    paragraph loses still emits a row (text = '', n_kept = 0) so the
    caller decides the drop policy. Output: (doc_id, text, n_kept,
    n_dropped). Idempotent: re-running on the output changes nothing.

    Scale shape (100 TB): paragraphs are keyed by md5 fingerprint, so
    the winner election is an algebraic min(struct(doc_id, pos)) —
    map-side partial aggregation absorbs the boilerplate skew (a
    paragraph repeated 10^8 times combines to one row per map task
    BEFORE the shuffle; a window over the paragraph key would instead
    sort the entire hot group). One equi-join on the fingerprint
    flags survivors, one groupBy(doc_id) reassembles. No driver
    state, no cross join, per-doc memory bounded by the document
    itself."""
    paras = split_paragraphs(df, splitter, text_col, id_col)
    winners = paras.groupBy("fp").agg(
        F.min(F.struct("doc_id", "pos")).alias("w")
    )
    flagged = paras.join(winners, "fp").withColumn(
        "keep",
        (F.col("doc_id") == F.col("w.doc_id"))
        & (F.col("pos") == F.col("w.pos")),
    )
    return reassemble_marked(flagged, text_col, joiner)


def split_paragraphs(
    df: DataFrame,
    splitter: Column | None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Shared split stage of the paragraph-dedup family: one row per
    non-blank paragraph — (doc_id, pos, para, fp) with fp = md5."""
    if splitter is None:
        splitter = F.split(F.col(text_col), r"\n{2,}")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(splitter).alias("pos", "para"),
        )
        .filter(F.length(F.trim(F.col("para"))) > 0)
        .withColumn("fp", F.md5(F.col("para")))
    )


def reassemble_marked(
    marked: DataFrame, text_col: str = "text", joiner: str = "\n\n"
) -> DataFrame:
    """Shared rebuild stage: given (doc_id, pos, para, keep), emit one
    row per document — survivors joined in original order plus the
    kept/dropped counts (a document whose every paragraph lost keeps
    its row with text='' / n_kept=0)."""
    return marked.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "para"))
                    )
                ),
                lambda s: s["para"],
            ),
            joiner,
        ).alias(text_col),
        F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
        F.count(F.when(~F.col("keep"), 1)).alias("n_dropped"),
    )


def word_chunk_splitter(
    text_col: str = "text", words_per_chunk: int = 16
) -> Column:
    """Splitter for :func:`paragraph_dedup` over corpora without
    structural paragraph boundaries (OCR dumps, single-line records):
    fixed ``words_per_chunk``-word windows, pure array expressions.
    The last chunk keeps the remainder (slice clamps)."""
    w = F.split(F.col(text_col), " ")
    n = words_per_chunk
    return F.transform(
        F.sequence(
            F.lit(0),
            F.floor((F.size(w) - F.lit(1)) / F.lit(n)).cast("int"),
        ),
        lambda i: F.array_join(F.slice(w, i * n + 1, n), " "),
    )


# ------------------------------- prefix-filtering Jaccard join (r8)


def jaccard_prefix_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_prefix_bucket: int | None = None,
) -> DataFrame:
    """EXACT token-set Jaccard similarity join via prefix filtering
    (Chaudhuri et al. 2006; the base filter of PPJoin) — the
    deterministic complement to MinHash-LSH: same candidate-then-
    verify shape, but the candidate generator is LOSSLESS, so the
    output is exactly every pair with J(A, B) >= threshold.

    The theorem: order each document's distinct tokens by ascending
    corpus frequency (rarest first, ties by token) and take the first
    ``|d| - ceil(t*|d|) + 1`` as its prefix; two sets with Jaccard
    >= t must share at least one prefix token. Candidates are
    therefore the in-bucket pairs of the prefix-token buckets —
    equi-join shaped, and the buckets are built from each document's
    RAREST tokens, which is what keeps them small on natural corpora.
    Verification computes the exact Jaccard from the full token sets.

    ``max_prefix_bucket`` caps degenerate buckets (house guard, with
    the observe metric) — but unlike the LSH generators a drop here
    breaks the exactness guarantee, so the default is None; prefer a
    higher threshold (shorter prefixes) on skewed corpora. The float
    prefix length subtracts 1e-9 before ceil so an ulp of overshoot
    in t*n can only lengthen a prefix (extra candidates), never
    shorten it (missed pairs). Output (a, b, jaccard), a < b,
    jaccard rounded to 6."""
    from pagerank_mapreduce_spark.functions.text import tokens as _tokens

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_tokens(text_col))).alias("tok"),
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("dfc"))
    per_doc = (
        toks.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dfc", "tok"))),
                lambda s: s["tok"],
            ).alias("ts")
        )
    )
    n = F.size("ts")
    plen = n - F.ceil(F.lit(threshold) * n - F.lit(1e-9)).cast("int") + 1
    prefixes = per_doc.select(
        "doc_id", F.explode(F.slice("ts", 1, plen)).alias("ptok")
    )
    buckets = (
        prefixes.groupBy("ptok")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    buckets = _hot_bucket_guard(buckets, max_prefix_bucket, "ids")
    cand = _explode_member_pairs(buckets, "ids").distinct()
    a_sets = per_doc.select(
        F.col("doc_id").alias("a"), F.col("ts").alias("_ta")
    )
    b_sets = per_doc.select(
        F.col("doc_id").alias("b"), F.col("ts").alias("_tb")
    )
    jac = F.size(F.array_intersect("_ta", "_tb")) / F.size(
        F.array_union("_ta", "_tb")
    )
    return (
        cand.join(a_sets, "a")
        .join(b_sets, "b")
        .withColumn("_j", jac)
        .filter(F.col("_j") >= threshold)
        .select("a", "b", F.round("_j", 6).alias("jaccard"))
    )


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_df: int = 100,
) -> DataFrame:
    """ASYMMETRIC shingle-set containment join: every ordered pair
    (a, b), a ≠ b, with ``C(a→b) = |A ∩ B| / |A| >= threshold`` over
    the df-pruned k-shingle sets — Broder 1997's *containment*
    companion to resemblance, and the quote/subset detector Jaccard
    structurally misses (a 50-token quote inside a 5,000-token page
    has J ≈ 0.01 but C = 1.0: boilerplate inclusion, quotation,
    page-in-site nesting).

    Scale shape — inverted-index co-occurrence COUNTING, never
    per-pair set materialization: the overlap |A ∩ B| is an algebraic
    count over the per-shingle posting-list self-join, so the shuffle
    carries (a, b, partial count) rows with map-side combine — no
    array column ever rides a join. A first cut of this operator
    carried each candidate's full shingle array into an
    array_intersect verify join; at the 10× fixture that was 121 s
    (2 GB of duplicated arrays) vs 8 s for the counting shape. The
    join is bounded because shingles with ``df > max_df`` are removed
    from the SETS (not just the join) — the replayable df-pruning
    contract of ``tfidf_cosine_pairs``: pruned containment is
    computed exactly, every posting list is ≤ max_df by construction,
    and the pair fan-out is ≤ max_df · Σ df(g) — linear in the corpus
    with the cap (on natural corpora k-shingles are already
    selective — the fixture max df is 25 — so the cap is the 100 TB
    posture, not a fixture crutch). Output (a, b, containment),
    directional, rounded to 6; docs whose pruned set is empty emit
    nothing."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(shingles(text_col, k))
        ).alias("tok"),
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("dfc"))
    # three consumers (both posting-list sides + the sizes relation)
    # would each re-run the shingle explosion + df join. This is a
    # LAZY COLUMNAR persist on purpose, and the cache entry is an
    # intentional leak: the relation is the exploded shingle×doc
    # posting list (corpus-sized × k), and swapping in an eager
    # localCheckpoint — row-based RDD blocks, no compression, no
    # column pruning through the cache — measured 1.6 → 8.9 s on the
    # dedup_containment bench entry (round 11). Callers running many
    # containment passes in one session should spark.catalog
    # .clearCache() between them.
    pruned = toks.join(
        dfreq.filter(F.col("dfc") <= max_df), "tok"
    ).persist()
    sizes = pruned.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_na")
    )
    x = pruned.select("tok", F.col("doc_id").alias("a"))
    y = pruned.select("tok", F.col("doc_id").alias("b"))
    ov = (
        x.join(y, "tok")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_ov"))
    )
    return (
        ov.join(sizes.withColumnRenamed("doc_id", "a"), "a")
        .withColumn("_c", F.col("_ov") / F.col("_na"))
        .filter(F.col("_c") >= threshold)
        .select("a", "b", F.round("_c", 6).alias("containment"))
    )


# ------------------------- deletion-neighborhood fuzzy match (r8)


def fuzzy_match_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    max_dist: int = 1,
    max_bucket_size: int | None = 512,
) -> DataFrame:
    """Edit-distance pair generation via deletion neighborhoods
    (FastSS, Bocek et al. 2007; SymSpell's index): register every
    string under itself AND each of its delete-one-character
    variants; any two strings within Levenshtein distance 1 share at
    least one key (substitution: both delete the differing position;
    insertion/deletion: the longer side's delete-variant IS the
    shorter string's raw key), so the candidate generation is
    LOSSLESS for ``max_dist=1``. Verification recomputes the exact
    Levenshtein inside the bucket and keeps pairs <= max_dist; false
    bucket collisions (e.g. transpositions, true distance 2) are
    filtered there. Output (a, b, dist), a < b by id.

    Why deletion keys and not positional segment blocking: pigeonhole
    segments degenerate on data with a low-entropy region (a constant
    prefix puts the entire relation into one segment bucket — the
    TPC-H 'Customer#0000...' names are exactly that). A delete-one
    key always retains every OTHER position, so bucket sizes are
    bounded by the alphabet at the deleted position, whatever the
    rest of the string looks like.

    ``max_dist`` is restricted to 1: distance d needs delete-d
    neighborhoods, C(len, d) keys per string — past 1, band the
    string into q-grams (the SimHash/MinHash route) instead. Hot
    buckets (a clique of near-identical strings) drop whole under the
    house cap with an observe metric."""
    if max_dist != 1:
        raise ValueError(f"max_dist must be 1, got {max_dist!r}")
    s = F.col(text_col)
    n = F.length(s)
    dels = F.transform(
        F.sequence(F.lit(1), n),
        lambda p: F.concat(
            s.substr(F.lit(1), p - 1), s.substr(p + 1, n - p)
        ),
    )
    keys = F.concat(F.array(s), dels)
    registered = df.select(
        F.col(id_col).alias("_id"),
        s.alias("_s"),
        F.explode(keys).alias("_k"),
    ).distinct()  # a string registers each distinct key once
    buckets = (
        registered.groupBy("_k")
        .agg(
            F.array_sort(F.collect_list(F.struct("_id", "_s"))).alias(
                "ids"
            )
        )
        .filter(F.size("ids") > 1)
    )
    buckets = _hot_bucket_guard(buckets, max_bucket_size, "ids")
    pairs = _explode_member_pairs(
        buckets,
        "ids",
        pair_builder=lambda x, y: F.struct(
            x["_id"].alias("a"),
            y["_id"].alias("b"),
            x["_s"].alias("_sa"),
            y["_s"].alias("_sb"),
        ),
    )
    return (
        pairs.filter(F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.levenshtein("_sa", "_sb").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )


def dup_cluster_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate-cluster census over the exact-dedup fingerprint — the
    curation report that tells you WHAT dedup would remove before you
    remove it: one row per observed cluster size with the number of
    clusters, documents, and removable duplicates at that size, plus
    corpus-level totals and the overall duplicate ratio riding on
    every row (broadcast scalar, so the relation is self-contained).

    Two algebraic shuffles, both narrow: fingerprint → cluster sizes,
    sizes → histogram. The histogram's key cardinality is the number
    of DISTINCT cluster sizes (≤ a few hundred even at corpus scale —
    duplicate-count distributions are heavy-tailed but their support
    is tiny), so the second aggregation is effectively free."""
    from pagerank_mapreduce_spark.functions.text import fingerprint

    sizes = (
        df.select(fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    hist = sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("sz").alias("n_docs"),
        F.sum(F.col("sz") - 1).alias("dup_docs"),
    )
    totals = F.broadcast(
        hist.agg(
            F.sum("n_docs").alias("_total"),
            F.sum("dup_docs").alias("_dups"),
        )
    )
    return hist.crossJoin(totals).select(
        "cluster_size",
        "n_clusters",
        "n_docs",
        "dup_docs",
        F.round(F.col("_dups") / F.col("_total"), 6).alias("corpus_dup_ratio"),
    )


def leakproof_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Dedup-aware train/val/test assignment report: hashing the
    DOCUMENT id splits duplicates across sides (train/test leakage —
    the eval contamination Lee et al. ACL'22 measure), while hashing
    the exact-dedup FINGERPRINT sends every duplicate cluster to one
    side by construction. Both methods run side by side so the
    leakage is measured, not asserted: one row per (method, split)
    with document/cluster counts and the method's count of clusters
    that straddle splits (0 for by_cluster, by construction).

    Scale shape: the split label is a pure md5 expression (no
    shuffle); the census is two algebraic aggregations keyed on the
    fingerprint — the same narrow-shuffle profile as exact_dedup.
    The hash is the portable 60-bit md5 prefix, so the DuckDB oracle
    replays assignments bit-for-bit."""
    from pagerank_mapreduce_spark.functions.text import fingerprint

    def label(h: Column) -> Column:
        b = F.pmod(h, F.lit(100))
        return (
            F.when(b < train_pct, F.lit("train"))
            .when(b < train_pct + val_pct, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    base = df.select(
        F.col(id_col),
        fingerprint(text_col).alias("fp"),
    ).select(
        "fp",
        label(portable_hash60(F.col(id_col).cast("string"))).alias(
            "by_doc"
        ),
        label(portable_hash60(F.col("fp"))).alias("by_cluster"),
    )
    out = []
    for method in ("by_doc", "by_cluster"):
        per_cluster = base.groupBy("fp").agg(
            F.count(F.lit(1)).alias("sz"),
            F.count_distinct(method).alias("nsplits"),
            F.first(method).alias("_any"),
        )
        leaky = F.broadcast(
            per_cluster.agg(
                F.sum((F.col("nsplits") > 1).cast("int")).alias(
                    "leaky_clusters"
                )
            )
        )
        census = (
            base.groupBy(F.col(method).alias("split"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.count_distinct("fp").alias("n_clusters"),
            )
            .crossJoin(leaky)
            .select(
                F.lit(method).alias("method"),
                "split",
                "n_docs",
                "n_clusters",
                F.col("leaky_clusters").cast("bigint"),
            )
        )
        out.append(census)
    return out[0].unionByName(out[1])


def keep_best(
    df: DataFrame,
    score_col: str | Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup with a QUALITY keep-policy: per normalized-text
    group keep the row with the highest ``score_col`` (ties → lowest
    id) instead of :func:`exact_dedup`'s lowest-id convention — the
    RefinedWeb/FineWeb-style election ("of the N copies, keep the
    longest / cleanest / highest-quality one"), which changes WHAT
    survives dedup, not how many.

    Scale shape: one shuffle on the fingerprint with an ALGEBRAIC
    max_by election — no per-group list, no window sort; map-side
    partial aggregation absorbs hot fingerprints exactly like the
    min() election. Output: (``id_col``, fp, score of the winner)."""
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    return (
        df.select(
            F.col(id_col), fingerprint(text_col).alias("fp"), s.alias("_q")
        )
        # max_by on a (score, -id) struct: one algebraic aggregate
        # with deterministic tie-breaks, no secondary pass
        .groupBy("fp")
        .agg(
            F.max(
                F.struct(F.col("_q"), (-F.col(id_col)).alias("_nid"))
            ).alias("_w")
        )
        .select(
            (-F.col("_w._nid")).cast("long").alias(id_col),
            "fp",
            F.col("_w._q").alias("score"),
        )
    )
