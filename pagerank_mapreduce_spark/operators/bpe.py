"""Distributed BPE vocabulary induction (Sennrich, Haddow & Birch
2016, "Neural Machine Translation of Rare Words with Subword Units",
§3.2) — learn the first k byte-pair merges from a corpus.

The algorithm's scale shape is what makes it trainable on 100 TB:
merges are learned over the WORD VOCABULARY with counts, not the raw
token stream — so the corpus is touched exactly once (a whitespace
word count, one algebraic shuffle) and every one of the k iterations
runs over the vocabulary relation (|V| rows, ~10⁶–10⁷ for a web
corpus — many orders below corpus size). Per iteration: one
vocabulary-sized pair-count aggregate, one 1-row argmax collect
(constant-size driver traffic, the IVF-codebook discipline), one
map-side merge rewrite, one vocabulary-sized ``localCheckpoint``
(distinct-value-sized — the cheap kind).

Cross-engine exactness — the merge REWRITE is the hard part, and it
is done with the same primitive in both engines so the semantics
cannot drift: a word's symbol sequence is one string with DOUBLE
``chr(31)`` separators at every boundary (``␟␟t␟␟h␟␟e␟␟``), and
merging pair (l, r) is ``replace(s, ␟l␟␟r␟, ␟lr␟)``. Both Java's
``String.replace`` (Spark) and DuckDB's ``replace`` scan left-to-
right over non-overlapping occurrences, and the double separator
donates one ``␟`` to each side of a match, so chained occurrences
(``aaaa`` under merge (a,a) → ``(aa)(aa)``) merge exactly like the
reference greedy scan — no regex, no lookahead (RE2 has none), no
per-row UDF. Pair counting is a split → zip-adjacent → explode →
algebraic sum (every adjacent position counts, the standard
convention); the argmax tie-breaks on the pair string ascending.

Integer counts only — no float appears anywhere, so oracle hash
equality is unconditional.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.functions.text import tokens

SEP = "\x1f"  # unit separator: cannot appear in whitespace tokens


def _sym_string(word: Column) -> Column:
    """A word as its character-symbol string with double separators:
    'the' → ␟␟t␟␟h␟␟e␟␟."""
    return F.concat(
        F.lit(SEP + SEP),
        F.regexp_replace(word, "(.)", "$1" + SEP + SEP),
    )


def _adjacent_pairs(sym_str: Column) -> Column:
    """Adjacent symbol pairs as 'l␟␟r' strings (every position, the
    standard BPE counting convention)."""
    syms = F.filter(
        F.split(sym_str, SEP + SEP), lambda x: x != ""
    )
    n = F.size(syms)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.concat_ws(SEP + SEP, a, b),
        )
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    mode: str = "distributed",
    vocab_min_count: int = 1,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from the corpus.

    Output, one row per merge in order:
    (merge_rank INT, left STRING, right STRING, merged STRING,
    pair_count BIGINT) — ``pair_count`` is the pair's corpus-weighted
    adjacent-position count at the moment it was chosen.

    Two execution modes producing IDENTICAL merges (pinned by test
    and by the shared DuckDB oracle):

    - ``distributed`` — one Spark job per merge over the vocabulary
      relation (pair-count aggregate → 1-row argmax → map-side
      rewrite). Cost is ~one fixed job overhead × ``n_merges``:
      exact, fully distributed, but a real tokenizer needs 10⁴–10⁵
      merges and tens of thousands of sequential driver jobs do not
      extrapolate. Use it when merges are few or the vocabulary is
      too large for one task.
    - ``vocab_local`` — the 100 TB-viable shape, and how production
      tokenizer trainers actually work (Sennrich's learn_bpe, HF
      tokenizers): the corpus is touched ONCE for the distributed
      word count, then the greedy merge loop runs over the counted
      vocabulary (|V| ≈ 10⁶–10⁷ rows for a web corpus — several
      orders below corpus size) inside a single single-partition
      ``mapInPandas`` kernel with incremental pair-count updates
      (only words containing the chosen pair are recounted). One
      Spark job for ANY number of merges; the kernel replays the
      exact argmax tie-break (count desc, then the ``l␟␟r`` pair
      string asc — byte-identical to the distributed orderBy) and
      the exact left-to-right non-overlapping rewrite.

    ``vocab_min_count`` — the frequency-floor VOCABULARY PRUNE: words
    occurring fewer than this many times are dropped before merge
    learning. Semantics are exact-by-definition: the result equals
    training on the corpus with sub-floor words removed (pair counts
    exclude their contributions — the standard trainer vocabulary
    threshold). Its real job is bounding the vocab_local kernel's
    input: a web-scale corpus has ≫10⁸ distinct "words" but the mass
    lives in the head — a floor of 2-4 typically cuts the distinct
    count by an order of magnitude (hapax-heavy Zipf tail) while
    leaving the learned merges near-identical, keeping the
    single-task kernel viable far past the unpruned bound.
    """
    if vocab_min_count < 1:
        raise ValueError(
            f"bpe_train: vocab_min_count must be >= 1, got {vocab_min_count}"
        )
    if mode == "vocab_local":
        return _bpe_train_vocab_local(
            docs, n_merges, text_col, vocab_min_count
        )
    if mode != "distributed":
        raise ValueError(f"bpe_train: unknown mode {mode!r}")
    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("_w"))
        .filter(~F.col("_w").contains(SEP))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= vocab_min_count)
        .select(_sym_string(F.col("_w")).alias("_s"), "_c")
        .localCheckpoint()
    )
    out: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            vocab.select(
                F.explode(_adjacent_pairs(F.col("_s"))).alias("_p"), "_c"
            )
            .groupBy("_p")
            .agg(F.sum("_c").alias("_n"))
            .orderBy(F.col("_n").desc(), F.col("_p").asc())
            .limit(1)
            .first()
        )
        if top is None:
            break
        left, right = top["_p"].split(SEP + SEP)
        out.append((rank, left, right, left + right, int(top["_n"])))
        vocab = vocab.select(
            F.replace(
                "_s",
                F.lit(SEP + left + SEP + SEP + right + SEP),
                F.lit(SEP + left + right + SEP),
            ).alias("_s"),
            "_c",
        ).localCheckpoint()
    return spark.createDataFrame(
        out,
        "merge_rank int, left string, right string, merged string, "
        "pair_count bigint",
    )


_MERGE_SCHEMA = (
    "merge_rank int, left string, right string, merged string, "
    "pair_count bigint"
)


def _bpe_train_vocab_local(
    docs: DataFrame, n_merges: int, text_col: str, vocab_min_count: int = 1
) -> DataFrame:
    """The vocab_local mode of :func:`bpe_train`: distributed word
    count (optionally frequency-floor pruned — see bpe_train), then
    the greedy loop in one Arrow kernel on the single-partitioned
    vocabulary. See bpe_train's docstring for the scale argument; the
    kernel is order-independent (counting is commutative, the
    tie-break total), so any partition layout of the incoming
    vocabulary yields the same merges."""
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(~F.col("w").contains(SEP))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= vocab_min_count)
    )

    def kernel(batches):
        import pandas as pd

        words: list[str] = []
        counts: list[int] = []
        for pdf in batches:
            words.extend(pdf["w"].tolist())
            counts.extend(int(x) for x in pdf["c"].tolist())
        out = _greedy_merges(words, counts, n_merges)
        yield pd.DataFrame(
            {
                "merge_rank": pd.array(
                    [r[0] for r in out], dtype="int32"
                ),
                "left": [r[1] for r in out],
                "right": [r[2] for r in out],
                "merged": [r[3] for r in out],
                "pair_count": pd.array(
                    [r[4] for r in out], dtype="int64"
                ),
            }
        )

    return vocab.coalesce(1).mapInPandas(kernel, _MERGE_SCHEMA)


def _greedy_merges(
    words: list[str], counts: list[int], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """In-memory greedy BPE over a counted vocabulary with
    incremental pair-count maintenance — the exact semantics of the
    distributed loop:

    - pair counting: EVERY adjacent symbol position (``aaa`` holds
      two (a,a) positions), corpus-weighted by word count;
    - argmax tie-break: count desc, then the ``l␟␟r`` pair STRING
      ascending (the distributed orderBy's key — compared as a
      string, not a tuple, so symbols containing code points below
      ``␟`` cannot reorder ties between the two modes);
    - rewrite: left-to-right non-overlapping within each word, the
      scan order Java's ``String.replace`` and DuckDB's ``replace``
      share (``aaaa`` under (a,a) → ``(aa)(aa)``).

    Per merge, only the words CONTAINING the chosen pair are
    recounted (delta-updated) — the standard trainer optimization
    that makes 10⁴ merges ~linear instead of quadratic. The argmax
    is a LAZY-INVALIDATION heap keyed (-count, pair-string): a linear
    max() scan per merge is O(|pairs|) and |pairs| grows ~linearly
    with merges learned, so at a real 32k-merge vocabulary the scans
    alone would be ~10⁹–10¹⁰ comparisons; the heap re-pushes only
    pairs TOUCHED by each rewrite and discards stale entries at pop
    time — total heap traffic tracks the delta-update work. The
    popped key ((-count, pair-string) ascending) realizes exactly the
    distributed orderBy (count desc, pair string asc), so the heap is
    a physical change only."""
    import heapq
    from collections import Counter, defaultdict

    syms: list[tuple[str, ...]] = [tuple(w) for w in words]
    pair_n: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, (t, c) in enumerate(zip(syms, counts)):
        for j in range(len(t) - 1):
            p = (t[j], t[j + 1])
            pair_n[p] += c
            pair_words[p].add(i)
    heap: list[tuple[int, str, tuple[str, str]]] = [
        (-n, p[0] + SEP + SEP + p[1], p) for p, n in pair_n.items()
    ]
    heapq.heapify(heap)
    out: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        # pop to the first LIVE entry (count matches the current
        # table); stale entries are leftovers from earlier updates
        best = None
        while heap:
            negn, _, p = heap[0]
            if pair_n.get(p) == -negn:
                best = (p, -negn)
                break
            heapq.heappop(heap)
        if best is None:
            break
        (left, right), n = best
        out.append((rank, left, right, left + right, int(n)))
        merged = left + right
        touched: set[tuple[str, str]] = set()
        for i in sorted(pair_words[(left, right)]):
            t, c = syms[i], counts[i]
            # delta out the old adjacency counts of this word
            old_pairs: set[tuple[str, str]] = set()
            for j in range(len(t) - 1):
                p = (t[j], t[j + 1])
                old_pairs.add(p)
                touched.add(p)
                pair_n[p] -= c
                if pair_n[p] <= 0:
                    del pair_n[p]
            # left-to-right non-overlapping rewrite
            new: list[str] = []
            j = 0
            while j < len(t):
                if (
                    j < len(t) - 1
                    and t[j] == left
                    and t[j + 1] == right
                ):
                    new.append(merged)
                    j += 2
                else:
                    new.append(t[j])
                    j += 1
            nt = tuple(new)
            syms[i] = nt
            new_pairs: set[tuple[str, str]] = set()
            for j in range(len(nt) - 1):
                p = (nt[j], nt[j + 1])
                new_pairs.add(p)
                touched.add(p)
                pair_n[p] += c
                pair_words[p].add(i)
            # prune this word from the index of pairs the rewrite
            # removed — otherwise pair_words accumulates stale word
            # ids and a later merge of pair p re-processes every word
            # that EVER contained p (delta-out/no-op-rewrite/delta-in
            # per stale word), degrading the ~linear incremental
            # claim toward quadratic on adversarial vocabularies
            for p in old_pairs - new_pairs:
                if p != (left, right):
                    pair_words[p].discard(i)
        del pair_words[(left, right)]
        # one fresh heap entry per TOUCHED pair's final count; older
        # entries for the same pair go stale and are discarded at pop
        for p in touched:
            cur = pair_n.get(p)
            if cur is not None:
                heapq.heappush(heap, (-cur, p[0] + SEP + SEP + p[1], p))
    return out


def bpe_oracle_sql(n_merges: int = 6, vocab_min_count: int = 1) -> str:
    """DuckDB replay of :func:`bpe_train` over the documents table —
    the k iterations unroll as chained MATERIALIZED CTEs (no
    recursion needed for a fixed k; without MATERIALIZED the planner
    inlines each v_i into every consumer and the chain expands
    exponentially); each iteration's argmax feeds the next rewrite
    via scalar subqueries, the identical double-separator replace.
    ``vocab_min_count`` replays the frequency-floor prune as a
    HAVING on the word count."""
    S = "chr(31)"
    SS = f"{S} || {S}"
    floor = (
        f" HAVING count(*) >= {int(vocab_min_count)}"
        if vocab_min_count > 1
        else ""
    )
    parts = [
        f"""WITH toks AS (
         SELECT unnest(list_filter(
                  string_split_regex(lower(text), '\\s+'),
                  x -> x <> '')) AS w
         FROM documents),
       v0 AS MATERIALIZED (SELECT {SS} || regexp_replace(w, '(.)',
                       '\\1' || {S} || {S}, 'g') AS s,
                     count(*) AS c
              FROM toks WHERE NOT contains(w, chr(31)) GROUP BY w{floor})"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"v{i - 1}"
        parts.append(
            f"""p{i} AS MATERIALIZED (SELECT pr AS p, CAST(sum(c) AS BIGINT) AS n
               FROM (SELECT unnest(CASE WHEN len(t) < 2 THEN []
                              ELSE list_transform(range(1, len(t)),
                                j -> t[j] || {SS} || t[j+1]) END) AS pr,
                            c
                     FROM (SELECT list_filter(string_split(s, {SS}),
                                    x -> x <> '') AS t, c
                           FROM {prev}))
               GROUP BY pr),
       m{i} AS MATERIALIZED (SELECT string_split(p, {SS})[1] AS l,
                       string_split(p, {SS})[2] AS r, n
                FROM p{i} ORDER BY n DESC, p ASC LIMIT 1),
       v{i} AS MATERIALIZED (SELECT replace(s,
                         {S} || (SELECT l FROM m{i}) || {SS}
                             || (SELECT r FROM m{i}) || {S},
                         {S} || (SELECT l FROM m{i})
                             || (SELECT r FROM m{i}) || {S}) AS s, c
                FROM {prev})"""
        )
    selects = "\n       UNION ALL\n".join(
        f"""       SELECT {i} AS merge_rank, l AS left, r AS right,
              l || r AS merged, n AS pair_count FROM m{i}"""
        for i in range(1, n_merges + 1)
    )
    return ",\n       ".join(parts) + "\n" + selects


def bpe_token_counts(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    train_mode: str = "distributed",
    apply_mode: str = "replace",
    vocab_min_count: int = 1,
) -> DataFrame:
    """Apply the corpus-learned merges (:func:`bpe_train`) back to the
    corpus and report per-document BPE token counts — the tokenizer
    APPLY step, and the honest answer to "how many tokens is my
    corpus under MY vocabulary" (the whitespace and regex counters in
    functions/text.py approximate this with fixed vocabularies).

    Scale shape: training is vocabulary-sized (see bpe_train); the
    apply step segments each DISTINCT word once and broadcasts
    nothing — documents join their words' segment lengths by word
    string and aggregate per doc, so the corpus is touched twice
    total (count words, join back). The merge list is k rows
    collected to the driver — constant-size, the codebook
    discipline.

    The k merges are applied to the distinct-word relation in
    CHUNKS of ``chunk_size`` chained ``replace``s, with an eager
    ``localCheckpoint`` of the (vocabulary-sized — the cheap kind)
    relation between chunks. A single expression of k chained
    replaces is exact but unbounded: at a real vocabulary
    (k ≈ 32 000) Catalyst analysis alone would not survive a 32k-
    deep expression tree — chunking bounds the plan depth at
    ``chunk_size`` regardless of k, at the cost of ⌈k/chunk⌉
    vocabulary-relation materializations. Merge ORDER is preserved
    (chunks partition the ordered list), so the segmentation is
    bit-identical to the single-expression form — pinned by test
    and by the chunked catalog entry's DuckDB oracle.

    Two APPLY modes, bit-identical outputs (equivalence argued below,
    pinned by test and by the shared DuckDB oracle):

    - ``replace`` — k chained ``replace``s over the distinct-word
      relation in ``chunk_size`` chunks (eager ``localCheckpoint``
      between chunks bounds plan depth). Purely declarative, but at a
      real vocabulary the ⌈k/chunk⌉ materializations dominate:
      k = 32 768 at chunk 256 is 128 vocabulary-relation rewrites.
    - ``rank_merge`` — the 100 TB shape: the k merges (a k-row driver
      list, the codebook discipline) ship to ONE Arrow kernel over
      the distinct-word relation; each word is segmented in-memory by
      applying merges in ascending rank with a rank-skipping heap, so
      plan depth and job count are INDEPENDENT of k (one corpus word
      count + one vocabulary-sized mapInPandas + the join back).

    rank_merge == the replace chain, exactly: the chain applies rank
    r's left-to-right non-overlapping rewrite iff pair r is present
    when rank r is reached. In the kernel, a pair is present at step
    r either from the start (its ranks are heap-seeded) or created by
    an applying merge q < r (the rewrite re-seeds new adjacencies
    with ranks > q only — a lower-rank pair RE-created by a later
    merge must NOT fire, exactly as the chain has already passed it).
    Pushes always exceed the current pop, so pops are ascending and
    the kernel fires precisely the chain's non-no-op ranks in chain
    order.

    Output: (``id_col``, n_words BIGINT, n_bpe_tokens BIGINT) —
    n_bpe_tokens = Σ over the document's words of the word's symbol
    count after all k merges."""
    if chunk_size < 1:
        raise ValueError(
            f"bpe_token_counts: chunk_size must be >= 1, got {chunk_size}"
        )
    if apply_mode not in ("replace", "rank_merge"):
        raise ValueError(
            f"bpe_token_counts: unknown apply_mode {apply_mode!r}"
        )
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(
            docs,
            n_merges,
            text_col,
            mode=train_mode,
            vocab_min_count=vocab_min_count,
        )
        .orderBy("merge_rank")
        .collect()
    ]
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("_w"))
        .filter(~F.col("_w").contains(SEP))
        .distinct()
    )
    if apply_mode == "rank_merge":
        word_len = _rank_merge_word_segments(words, merges).select(
            "_w", "_l"
        )
    else:
        word_seg = words.select("_w", _sym_string(F.col("_w")).alias("_s"))
        for c0 in range(0, len(merges), chunk_size):
            seg = F.col("_s")
            for left, right in merges[c0 : c0 + chunk_size]:
                seg = F.replace(
                    seg,
                    F.lit(SEP + left + SEP + SEP + right + SEP),
                    F.lit(SEP + left + right + SEP),
                )
            word_seg = word_seg.select("_w", seg.alias("_s"))
            if c0 + chunk_size < len(merges):
                # bound the expression depth: materialize the
                # vocabulary-sized relation and start the next chunk
                # from plain columns (eager checkpoint storage is
                # released with the result — the module's persist
                # discipline)
                word_seg = word_seg.localCheckpoint()
        # symbols = non-empty pieces between double separators
        seg_len = F.size(
            F.filter(F.split(F.col("_s"), SEP + SEP), lambda x: x != "")
        )
        word_len = word_seg.select(
            "_w", seg_len.cast("bigint").alias("_l")
        )
    per_doc = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_w")
    ).filter(~F.col("_w").contains(SEP))
    return (
        per_doc.join(word_len, "_w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_l").alias("n_bpe_tokens"),
        )
    )


def _rank_merge_word_segments(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(_w) → (_w, _l, _seg): post-merge token count and
    space-joined segmentation per distinct word via the in-memory
    rank-skipping segmenter (see bpe_token_counts's rank_merge mode).
    The merge list rides the task closure (k rows, a few hundred KB
    at k = 32 768 — broadcast-sized); the pair→ranks index is rebuilt
    once per task, O(k)."""

    def kernel(batches):
        import heapq

        import pandas as pd

        pair_ranks: dict[tuple[str, str], list[int]] = {}
        by_rank: list[tuple[str, str, str]] = []
        for r0, (left, right) in enumerate(merges):
            by_rank.append((left, right, left + right))
            # the same pair string can in principle be learned at two
            # ranks (a later merge can re-create a token string) —
            # keep ALL ranks, ascending
            pair_ranks.setdefault((left, right), []).append(r0 + 1)

        def segment(word: str) -> list[str]:
            t: list[str] = list(word)
            if len(t) < 2:
                return t
            heap: list[int] = []
            seen: set[int] = set()

            def push(p: tuple[str, str], floor: int) -> None:
                for r in pair_ranks.get(p, ()):
                    if r > floor and r not in seen:
                        seen.add(r)
                        heapq.heappush(heap, r)

            for j in range(len(t) - 1):
                push((t[j], t[j + 1]), 0)
            while heap:
                r = heapq.heappop(heap)
                left, right, merged = by_rank[r - 1]
                new: list[str] = []
                j = 0
                changed = False
                while j < len(t):
                    if (
                        j < len(t) - 1
                        and t[j] == left
                        and t[j + 1] == right
                    ):
                        new.append(merged)
                        j += 2
                        changed = True
                    else:
                        new.append(t[j])
                        j += 1
                if changed:
                    t = new
                    for j in range(len(t) - 1):
                        push((t[j], t[j + 1]), r)
            return t

        for pdf in batches:
            ws = pdf["_w"].tolist()
            segs = [segment(w) for w in ws]
            yield pd.DataFrame(
                {
                    "_w": ws,
                    "_l": pd.array(
                        [len(s) for s in segs], dtype="int64"
                    ),
                    "_seg": [" ".join(s) for s in segs],
                }
            )

    return words.mapInPandas(kernel, "_w string, _l bigint, _seg string")


def bpe_word_segments(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    train_mode: str = "distributed",
    apply_mode: str = "rank_merge",
    chunk_size: int = 64,
    vocab_min_count: int = 1,
) -> DataFrame:
    """The learned tokenizer's VOCABULARY TABLE: every distinct corpus
    word with its post-merge segmentation — the artifact a tokenizer
    actually ships (merges + per-word segmentations), and what a
    training-data pipeline materializes once so corpus tokenization
    becomes a broadcast-join lookup instead of a re-segmentation.

    Output: (word, segments STRING — the tokens space-joined in
    order, n_tokens BIGINT). Same two apply modes as
    :func:`bpe_token_counts`, bit-identical (shared DuckDB oracle:
    :func:`bpe_segments_oracle_sql`)."""
    if apply_mode not in ("replace", "rank_merge"):
        raise ValueError(
            f"bpe_word_segments: unknown apply_mode {apply_mode!r}"
        )
    if chunk_size < 1:
        raise ValueError(
            f"bpe_word_segments: chunk_size must be >= 1, got {chunk_size}"
        )
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(
            docs,
            n_merges,
            text_col,
            mode=train_mode,
            vocab_min_count=vocab_min_count,
        )
        .orderBy("merge_rank")
        .collect()
    ]
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("_w"))
        .filter(~F.col("_w").contains(SEP))
        .distinct()
    )
    if apply_mode == "rank_merge":
        seg = _rank_merge_word_segments(words, merges)
        return seg.select(
            F.col("_w").alias("word"),
            F.col("_seg").alias("segments"),
            F.col("_l").alias("n_tokens"),
        )
    word_seg = words.select("_w", _sym_string(F.col("_w")).alias("_s"))
    for c0 in range(0, len(merges), chunk_size):
        s = F.col("_s")
        for left, right in merges[c0 : c0 + chunk_size]:
            s = F.replace(
                s,
                F.lit(SEP + left + SEP + SEP + right + SEP),
                F.lit(SEP + left + right + SEP),
            )
        word_seg = word_seg.select("_w", s.alias("_s"))
        if c0 + chunk_size < len(merges):
            word_seg = word_seg.localCheckpoint()
    n_tok = F.size(
        F.filter(F.split(F.col("_s"), SEP + SEP), lambda x: x != "")
    )
    return word_seg.select(
        F.col("_w").alias("word"),
        F.trim(
            F.replace(F.col("_s"), F.lit(SEP + SEP), F.lit(" "))
        ).alias("segments"),
        n_tok.cast("bigint").alias("n_tokens"),
    )


def bpe_segments_oracle_sql(n_merges: int = 6) -> str:
    """DuckDB replay of :func:`bpe_word_segments`: the training CTE
    chain, then the chained-replace segmentation of the distinct
    words rendered as the space-joined token string."""
    S = "chr(31)"
    SS = f"{S} || {S}"
    train = bpe_oracle_sql(n_merges)
    ctes = train[: train.index("\n       SELECT 1 AS merge_rank")]
    seg = f"{SS} || regexp_replace(w, '(.)', '\\1' || {S} || {S}, 'g')"
    for i in range(1, n_merges + 1):
        seg = (
            f"replace({seg}, {S} || (SELECT l FROM m{i}) || {SS} || "
            f"(SELECT r FROM m{i}) || {S}, {S} || (SELECT l FROM m{i})"
            f" || (SELECT r FROM m{i}) || {S})"
        )
    return f"""{ctes},
       dw AS MATERIALIZED (SELECT DISTINCT w FROM toks
             WHERE NOT contains(w, chr(31)))
       SELECT w AS word,
              trim(replace({seg}, {SS}, ' ')) AS segments,
              CAST(len(list_filter(string_split({seg}, {SS}),
                                   x -> x <> '')) AS BIGINT) AS n_tokens
       FROM dw"""


def bpe_apply_oracle_sql(n_merges: int = 6) -> str:
    """DuckDB replay of :func:`bpe_token_counts`: re-derive the merges
    with the same unrolled CTE chain, segment the distinct words with
    the same chained replaces, join back to the documents' tokens."""
    S = "chr(31)"
    SS = f"{S} || {S}"
    train = bpe_oracle_sql(n_merges)
    # reuse the training CTE chain up to (and including) v{n}/m{n};
    # strip the final UNION ALL select block
    ctes = train[: train.index("\n       SELECT 1 AS merge_rank")]
    seg = f"{SS} || regexp_replace(w, '(.)', '\\1' || {S} || {S}, 'g')"
    for i in range(1, n_merges + 1):
        seg = (
            f"replace({seg}, {S} || (SELECT l FROM m{i}) || {SS} || "
            f"(SELECT r FROM m{i}) || {S}, {S} || (SELECT l FROM m{i})"
            f" || (SELECT r FROM m{i}) || {S})"
        )
    return f"""{ctes},
       dw AS MATERIALIZED (SELECT DISTINCT w FROM toks),
       wl AS MATERIALIZED (SELECT w,
                CAST(len(list_filter(string_split({seg}, {SS}),
                                     x -> x <> '')) AS BIGINT) AS l
             FROM dw),
       dt AS (SELECT doc_id,
                     unnest(list_filter(
                       string_split_regex(lower(text), '\\s+'),
                       x -> x <> '')) AS w
              FROM documents)
       SELECT dt.doc_id, count(*) AS n_words,
              CAST(sum(wl.l) AS BIGINT) AS n_bpe_tokens
       FROM dt JOIN wl ON wl.w = dt.w
       WHERE NOT contains(dt.w, chr(31))
       GROUP BY dt.doc_id"""
