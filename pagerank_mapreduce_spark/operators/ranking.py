"""Corpus-statistics text ranking: TF-IDF, BM25, n-gram LM scoring.

Training-data curation needs corpus-relative signals, not just the
per-document heuristics in ``functions/text.py``: which terms
characterize a document (TF-IDF), which documents answer a query
(BM25), and how "natural" a document's token sequence is under a
language model trained on the corpus itself (CCNet-style bigram
perplexity filtering). No reference counterpart — this is extension
surface beyond SURVEY.md §2, same tier as dedup/similarity.

Scale notes (100 TB / 1000 executors):

- Everything is expression-only inside whole-stage codegen; the only
  shuffles are the keyed aggregations themselves (term, (w1, w2)),
  all algebraic → map-side partial aggregation bounds reducer input
  by distinct keys per task, not token count.
- Corpus scalars (N docs, avg length, vocab size) travel as 1-row
  broadcast relations, never driver round-trips.
- The model-to-corpus joins are plain equi-joins on the model key.
  A vocabulary/bigram model can exceed broadcast size at corpus
  scale, so the joins stay shuffle joins and let AQE downgrade to
  broadcast when the model side is measured small.
- Top-k-per-document is ``row_number() <= k``, which Spark compiles
  to a map-side WindowGroupLimit prune (same property pinned for
  ``cap_per_group`` in test_plan_audit.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pagerank_mapreduce_spark.functions import text as T

__all__ = [
    "tfidf_topk",
    "tfidf_cosine_pairs",
    "bm25_score",
    "tfidf_query_score",
    "rrf_fuse",
    "bigram_lm_score",
    "nb_classify",
]


def _n_docs(docs: DataFrame, id_col: str) -> DataFrame:
    """Corpus size as a 1-row broadcastable relation (no driver job)."""
    return F.broadcast(docs.agg(F.count(id_col).alias("_n")))


def tfidf_topk(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF.

    ``tfidf = tf * (ln((N + 1) / (df + 1)) + 1)`` (the smoothed-idf
    formulation sklearn uses), over whitespace-lowercased tokens.
    Ties are broken by term so the result is total-order deterministic.

    Two shuffles: (doc, term) counts and term document frequencies —
    both algebraic counts with map-side partials. The weight is a
    single double product of integer-derived operands, so the DuckDB
    oracle matches bit-for-bit before rounding.
    """
    tf = (
        docs.select(F.col(id_col), F.explode(T.tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfr = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = (
        tf.join(dfr, "term")
        .crossJoin(_n_docs(docs, id_col))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                round_digits,
            ).alias("tfidf"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    )
    return w.withColumn("rk", rk).filter(F.col("rk") <= k).drop("rk")


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """All document pairs with TF-IDF cosine ≥ ``threshold`` — the
    lexical-semantic near-dup signal between byte-exact dedup and
    embedding SemDeDup (two docs rewriting the same content share
    weighted vocabulary long after their shingles diverge). Output
    ``(a, b, cos)``, a < b, cosine over the smoothed-TF-IDF vectors
    restricted to terms with ``df <= max_df``.

    The scale story is df-pruning (Bayardo et al., *Scaling Up All
    Pairs Similarity Search*): the candidate generator is an
    inverted-index self-join on the term, and a term appearing in
    ``df`` documents emits ``df·(df-1)/2`` partial products — one
    stop-word is a quadratic hot key at corpus scale. Terms with
    ``df > max_df`` are excluded from the VECTORS (not just the
    join), so the pruned cosine is exactly replayable; terms with
    ``df = 1`` stay in the vectors/norms but skip the join (they
    cannot contribute to any pair's dot product — identical result,
    and on heavy-tail corpora they are most of the vocabulary).
    Everything else is two algebraic aggregations (term counts, pair
    dots) and two id-keyed norm joins — no cross join anywhere; the
    worst per-term fan-out is bounded at ``max_df²`` by construction.
    """
    tf = (
        docs.select(F.col(id_col), F.explode(T.tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfr = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = (
        tf.join(dfr.filter(F.col("df") <= max_df), "term")
        .crossJoin(_n_docs(docs, id_col))
        .select(
            F.col(id_col),
            "term",
            "df",
            (
                F.col("tf")
                * (F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            ).alias("w"),
        )
    )
    norms = w.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    joinable = w.filter(F.col("df") >= 2)
    x = joinable.select(
        F.col("term"), F.col(id_col).alias("a"), F.col("w").alias("wa")
    )
    y = joinable.select(
        F.col("term"), F.col(id_col).alias("b"), F.col("w").alias("wb")
    )
    dots = (
        x.join(y, "term")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    cos = F.round(
        F.col("dot") / (F.col("na") * F.col("nb")), round_digits
    )
    return (
        dots.join(norms.select(F.col(id_col).alias("a"), F.col("nrm").alias("na")), "a")
        .join(norms.select(F.col(id_col).alias("b"), F.col("nrm").alias("nb")), "b")
        .select("a", "b", cos.alias("cos"))
        # threshold on the ROUNDED value so a last-ulp summation-order
        # difference cannot flip membership cross-engine
        .filter(F.col("cos") >= threshold)
    )


def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """BM25 retrieval: score every document against ``query_terms``,
    return the ``top`` documents (score DESC, id ASC).

    Standard Robertson/Sparck-Jones BM25:
    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``,
    ``score = sum_t idf_t * tf_t*(k1+1) / (tf_t + k1*(1 - b + b*len/avglen))``.

    The query-term set is tiny by construction, so the term filter
    broadcasts; corpus scalars (N, avg length) ride a 1-row broadcast
    relation. One shuffle for (doc, term) counts, one 1-row-keyed
    reduction for the final per-doc sum. A degenerate stop-word query
    term scores many docs but stays an algebraic sum — no pair blowup.
    """
    if not query_terms:
        raise ValueError("bm25_score: query_terms must be non-empty")
    qlit = [t.lower() for t in query_terms]
    stats = F.broadcast(
        docs.select(T.token_count(text_col).cast("double").alias("dl")).agg(
            F.count("*").alias("_n"), F.avg("dl").alias("_avgdl")
        )
    )
    # dl rides the exploded rows (constant per doc, F.first recovers
    # it) so the corpus is scanned once — a second lengths relation
    # would re-scan and re-join the whole table for one column
    tf = (
        docs.select(
            F.col(id_col),
            T.token_count(text_col).cast("double").alias("dl"),
            F.explode(T.tokens(text_col)).alias("term"),
        )
        .filter(F.col("term").isin(qlit))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    dfr = tf.groupBy("term").agg(F.count("*").alias("df"))
    contrib = (
        tf.join(dfr, "term")
        .crossJoin(stats)
        .select(
            id_col,
            (
                F.log(
                    1.0
                    + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy(id_col).agg(
        F.round(F.sum("c"), round_digits).alias("bm25")
    )
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(top)


def tfidf_query_score(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    top: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """Lexical retrieval by summed smoothed TF-IDF weight of the
    query terms — the linear-tf complement to BM25's saturated tf
    (the two disagree exactly on term-stuffed documents, which is
    what makes them worth fusing). Same scale shape as
    :func:`bm25_score`: the query-term filter broadcasts, one
    (doc, term) count shuffle, one algebraic per-doc sum."""
    if not query_terms:
        raise ValueError("tfidf_query_score: query_terms must be non-empty")
    qlit = [t.lower() for t in query_terms]
    tf = (
        docs.select(F.col(id_col), F.explode(T.tokens(text_col)).alias("term"))
        .filter(F.col("term").isin(qlit))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfr = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = (
        tf.join(dfr, "term")
        .crossJoin(_n_docs(docs, id_col))
        .select(
            id_col,
            (
                F.col("tf")
                * (F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            ).alias("w"),
        )
    )
    scored = w.groupBy(id_col).agg(
        F.round(F.sum("w"), round_digits).alias("tfidf_q")
    )
    return scored.orderBy(F.desc("tfidf_q"), F.asc(id_col)).limit(top)


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    k: int = 60,
    top: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR
    2009)::

        rrf(d) = Σ_r 1 / (k + rank_r(d))

    over the candidate lists in ``rankings`` (``[(name, df), ...]``,
    each df = (id, score) with the score already rounded/total-order
    deterministic); documents missing from a list contribute 0 for
    it. The classic score-free way to combine retrievers whose score
    scales don't compare (BM25 vs TF-IDF vs embedding cosine), and
    the standard first stage of hybrid search.

    Ranks are row_numbers by (score desc, id) over the ALREADY
    TRUNCATED candidate lists — each is top-N by construction, so
    the single-partition rank windows are bounded at N rows, never
    corpus-sized (fuse top-N from each retriever, the canonical RRF
    usage; never feed an untruncated corpus scoring in). Fusion is a
    full outer join across the lists on the id; the RRF sum is one
    left-associated chain of coalesced terms so both engines add the
    same doubles in the same order. Output: (id, rrf, r_<name>...),
    top ``top`` by (rrf desc, id)."""
    fused = None
    rank_cols: list[str] = []
    for name, df in rankings:
        score_col = [c for c in df.columns if c != id_col][0]
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        r = df.select(
            id_col,
            F.row_number().over(w).cast("bigint").alias(f"r_{name}"),
        )
        rank_cols.append(f"r_{name}")
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    expr = None
    for rc in rank_cols:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(rc)), F.lit(0.0)
        )
        expr = term if expr is None else expr + term
    return (
        fused.select(
            id_col, F.round(expr, round_digits).alias("rrf"), *rank_cols
        )
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(top)
    )


def bigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per-document mean bigram log-probability under an add-one-
    smoothed bigram LM trained on the corpus itself (the CCNet /
    Gopher "perplexity filter" shape: low scores flag unnatural token
    sequences — boilerplate, word salad, OCR noise).

    ``P(w2 | w1) = (c(w1, w2) + 1) / (c(w1) + V)`` with ``V`` the
    unigram vocabulary size; a document scores
    ``avg over its bigrams of ln P`` (docs with < 2 tokens score 0
    with 0 bigrams, kept — filtering is the caller's policy).

    Shape at scale: per-doc bigrams partial-aggregate to (doc, w1,
    w2, m) before any shuffle; the corpus model is two algebraic
    count relations keyed (w1, w2) and (w1); scoring is equi-joins on
    those keys followed by a weighted-average reduction keyed by doc.
    Adjacent-token pairs come from ``zip_with`` over two slices of
    the token array — one scan, no positional self-join (the first
    formulation posexploded positions and re-joined on (doc, pos):
    an extra sort-merge join and two exchanges, 11 vs 8 in the
    audited plan, for something a pure expression provides).
    """
    t = T.tokens(text_col)
    # guard: slice with a negative length (empty/1-token doc) raises
    # under ANSI — such docs simply have no bigrams
    pair = F.when(
        F.size(t) >= 2,
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array())
    big = (
        docs.select(F.col(id_col), F.explode(pair).alias("p"))
        .groupBy(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("m"))
    )
    c2 = big.groupBy("w1", "w2").agg(F.sum("m").alias("c2"))
    c1 = big.groupBy("w1").agg(F.sum("m").alias("c1"))
    vocab = F.broadcast(
        docs.select(F.explode(t).alias("w"))
        .distinct()
        .agg(F.count("*").alias("_v"))
    )
    logp = (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(vocab)
        .select(
            id_col,
            "m",
            F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("_v"))).alias(
                "lp"
            ),
        )
    )
    scored = logp.groupBy(id_col).agg(
        F.round(F.sum(F.col("m") * F.col("lp")) / F.sum("m"), round_digits)
        .alias("lm_score"),
        F.sum("m").cast("bigint").alias("n_bigrams"),
    )
    # left join back so token-poor docs appear with n_bigrams = 0
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("lm_score", F.lit(0.0)).alias("lm_score"),
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        )
    )


def nb_classify(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Multinomial Naive Bayes classifier self-trained on the corpus
    (the fastText-style "train a cheap linear classifier on your own
    labels, score everything" curation pattern — e.g. language-ID or
    quality-domain routing over a partially-labeled crawl).

    Train: add-one-smoothed class-conditional token likelihoods
    ``P(w|L) = (c(L, w) + 1) / (n_L + V)`` plus document-count priors.
    Score: ``score(d, L) = ln(prior_L) + sum_w tf(d, w) * ln P(w|L)``;
    predict the argmax (ties broken by label ASC — deterministic).
    Returns (id, pred, nb_score), one row per document.

    Shape at scale: training is two algebraic keyed aggregations
    ((label, token) counts and their label totals); scoring crosses
    per-doc token counts with the tiny label set (a broadcast — the
    deliberate |labels|-factor blowup of the standard formulation)
    and equi-joins the model on (label, token), letting AQE broadcast
    the model side when it measures small. Vocabulary size and the
    corpus doc count travel as 1-row broadcast relations. Everything
    else is whole-stage-codegen expressions; the final argmax is a
    per-doc row_number (map-side WindowGroupLimit prune).
    """
    t = T.tokens(text_col)
    # ONE token-explosion pass: (doc, label, token) counts — the label
    # is constant per doc so it rides the aggregation key for free —
    # and the model (class-conditional counts, class totals, vocab)
    # plus the scoring relation all derive from this partial aggregate
    # instead of re-scanning the corpus three times.
    dtw = (
        docs.select(
            F.col(id_col),
            F.col(label_col).alias("_lab"),
            F.explode(t).alias("w"),
        )
        .groupBy(id_col, "_lab", "w")
        .agg(F.count("*").alias("tf"))
    )
    ct = dtw.groupBy("_lab", "w").agg(F.sum("tf").alias("c"))
    nl = ct.groupBy("_lab").agg(F.sum("c").alias("n_l"))
    vocab = F.broadcast(
        ct.select("w").distinct().agg(F.count("*").alias("_v"))
    )
    lab = docs.groupBy(F.col(label_col).alias("_lab")).agg(
        F.count("*").alias("nd")
    )
    ndocs = _n_docs(docs, id_col)
    # score: per-doc token counts x every candidate label
    dt = dtw.select(id_col, "w", "tf")
    sc = (
        dt.crossJoin(F.broadcast(lab))
        .join(ct, ["_lab", "w"], "left")
        .join(nl, "_lab")
        .crossJoin(vocab)
        .select(
            id_col,
            "_lab",
            "nd",
            (
                F.col("tf")
                * F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                    / (F.col("n_l") + F.col("_v"))
                )
            ).alias("lp"),
        )
        .groupBy(id_col, "_lab", "nd")
        .agg(F.sum("lp").alias("ll"))
        .crossJoin(ndocs)
        .select(
            id_col,
            "_lab",
            (F.log(F.col("nd").cast("double") / F.col("_n")) + F.col("ll"))
            .alias("score"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("_lab"))
    )
    return (
        sc.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            id_col,
            F.col("_lab").alias("pred"),
            F.round("score", round_digits).alias("nb_score"),
        )
    )
