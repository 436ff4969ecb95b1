"""Deduplication operators over a document corpus.

Training-data-pipeline layer of the engine: the reference dedups *boxes*
(overlap NMS, /root/reference/ppocr/postprocess/picodet_postprocess.py:19-45;
fragment merge, tools/infer/utility.py:980-1027); the corpus analog dedups
*documents*. Four strategies, all expressed in pure Spark SQL built-ins (no
Python in the hot path), each with an exact DuckDB oracle in
``__spark_entry__``:

- exact dedup        — md5(normalized text) group key
- n-gram Jaccard     — 3-token shingles, self-join on shingle, |∩|/|∪|
- MinHash + LSH      — K=8 min-md5 signatures, B=4 bands × R=2, band-bucket
                       self-join (portable: the "min over hashed shingles" is
                       the min *hex string*, identical in any engine)
- SimHash            — 16-bit sign-aggregated token-hash fingerprint

Scale notes (100 TB): every strategy is shuffle-on-key only. The shingle
self-join is the classic LSH candidate join — band hashes are short strings,
the join is an equi-join AQE can skew-split; signatures are computed with one
map-side-combinable groupBy. No driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window, functions as F

from ..functions.textstats import norm_text, tokens

MINHASH_K = 8  # signature length
LSH_BANDS = 4  # bands of R = K/BANDS rows each


def shingles(col, n: int = 3):
    """Distinct n-token shingles of the normalized text (whole text when
    shorter than n tokens).

    Built by zip_with over shifted slices of the token array — NOT by indexing
    ``toks[i+j]`` inside a transform lambda: higher-order-function lambdas are
    interpreted (no whole-stage codegen, no subexpression elimination), so an
    ``element_at(tokens(col), i)`` body would re-run the regexp tokenizer per
    element → O(tokens²) per row. The zip form tokenizes O(1) times per row.
    """
    toks = tokens(col)
    sz = F.size(toks)
    shifted = lambda k: F.slice(toks, k + 1, F.greatest(sz - k, F.lit(0)))
    sh = toks
    for k in range(1, n):
        # zip pads the shorter side with null; concat propagates null → the
        # trailing (n-1) incomplete shingles drop in the filter below
        sh = F.zip_with(sh, shifted(k), lambda a, b: F.concat(a, F.lit(" "), b))
    sh = F.filter(sh, lambda x: x.isNotNull())
    sh = F.when(sz >= n, sh).otherwise(F.array(norm_text(col)))
    return F.array_distinct(sh)


def with_near_dups(docs: DataFrame, id_offset: int = 100000) -> DataFrame:
    """Test-harness helper: union the corpus with a mutated copy of itself
    (last 5 tokens dropped, doc_id += offset) so dedup operators have known
    positives to find. Deterministic; mirrored exactly in the DuckDB oracle."""
    toks = tokens(F.col("text"))
    mutated = docs.select(
        (F.col("doc_id") + F.lit(id_offset)).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 5, F.lit(1)))
        ).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(mutated)


def with_exact_dups(docs: DataFrame, id_offset: int = 100000) -> DataFrame:
    """Union the corpus with verbatim copies (doc_id += offset)."""
    copy = docs.select(
        (F.col("doc_id") + F.lit(id_offset)).alias("doc_id"), "text"
    )
    return docs.select("doc_id", "text").unionByName(copy)


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Group by md5(norm text); canonical id = min(doc_id) per group.

    Map-side combinable single shuffle; at 100 TB the key is 32 bytes/doc.
    """
    return (
        docs.select(F.md5(norm_text(F.col("text"))).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def ngram_jaccard_pairs(docs: DataFrame, min_jac_micro: int = 500000) -> DataFrame:
    """Near-dup pairs by 3-gram Jaccard ≥ threshold (micro-units).

    shingle-explode → self-equi-join on shingle → group pair → |∩|;
    |∪| = |A| + |B| − |∩|. All integers → exact cross-engine equality.
    """
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jac_micro",
            F.floor(
                F.lit(1000000.0) * F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).cast("long"),
        )
        .filter(F.col("jac_micro") >= min_jac_micro)
        .select("doc_a", "doc_b", "n_inter", "jac_micro")
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """K min-md5 signature columns mh0..mh{K-1} per doc — a pure PROJECTION
    (min of a hex string ≡ min of the underlying hash), zero shuffle.

    Round 4 rewrite: this was explode(shingles) → groupBy(doc_id).agg(K
    mins), i.e. a full exchange of every shingle row plus a K-string-wide
    hash-agg state per doc. The aggregate's per-task partial map is sized by
    docs-per-input-partition — a quantity the OPTIMIZER controls (AQE
    coalesced the upstream dedup shuffle to ~34 fat partitions at 4M turns →
    ~120k buffers per concurrent task → heap exhaustion on a shared
    local[32] JVM; on a cluster it's silent memory pressure). The min over a
    doc's own shingles never needed an exchange: ``array_min(transform(sh,
    md5(j || s)))`` computes the identical value row-locally, keeps the
    whole stage memory-flat (one doc's shingle array at a time), and removes
    the signature shuffle from every LSH consumer. The shingle array is
    staged as a named column so CollapseProject keeps ONE tokenizer run per
    row (it refuses to inline non-cheap expressions referenced K times).
    No row filter: ``shingles`` always yields a non-null array with ≥1
    element (the short-text branch emits ``array(norm_text)``), so every doc
    appears in the output exactly as it did under explode/groupBy — empty or
    NULL text yields NULL mh columns in both formulations. (A ``size(_sh)``
    guard here would be pushed below the Project and re-inline the tokenizer
    into the Filter node — a measured 2× per-row tokenize for a vacuous
    predicate.)
    """
    staged = docs.select("doc_id", shingles(F.col("text")).alias("_sh"))
    cols = [
        F.array_min(
            F.transform(
                F.col("_sh"), lambda s: F.md5(F.concat(F.lit(f"{j}:"), s))
            )
        ).alias(f"mh{j}")
        for j in range(MINHASH_K)
    ]
    return staged.select("doc_id", *cols)


def minhash_lsh_pairs(
    docs: DataFrame,
    bucket_cap: int = 10000,
    obs: "Observation | None" = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ANY of the B band hashes.

    Band hash = md5(mh_{rb} || '|' || mh_{rb+1}); candidates via band-bucket
    self-join — the LSH scale path (no all-pairs comparison ever happens).

    ``bucket_cap`` bounds per-bucket pair generation (skew guard; the default
    is mirrored in the DuckDB oracle). Pass an ``Observation`` as ``obs`` to
    make the cap OBSERVABLE: after any action over the result,
    ``obs.get['capped_buckets']`` is the number of buckets that hit the cap
    and ``obs.get['capped_ids_dropped']`` the ids silently excluded from
    pair generation — zero extra passes (round-2 verdict item #5: silent
    truncation reads as "covered everything" when it didn't).
    """
    r = MINHASH_K // LSH_BANDS
    sig = minhash_signatures(docs)
    # ONE scan: band array → posexplode (not a 4-way union re-computing sig),
    # then bucket-local pair generation (not a self-join: signatures would be
    # recomputed per join side, and LSH buckets are small by design — at
    # corpus scale collect_list per (band, hash) bucket is bounded, capped
    # at ``bucket_cap`` ids as a skew guard).
    band_arr = F.array(
        *[
            F.md5(F.concat_ws("|", *[F.col(f"mh{b * r + i}") for i in range(r)]))
            for b in range(LSH_BANDS)
        ]
    )
    bands = sig.select("doc_id", F.posexplode(band_arr).alias("band_id", "bh"))
    buckets = (
        bands.groupBy("band_id", "bh")
        .agg(
            F.count(F.lit(1)).alias("bucket_size"),
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, bucket_cap).alias(
                "ids"
            ),
        )
        .filter(F.size("ids") >= 2)
    )
    if obs is not None:
        capped = (F.col("bucket_size") > bucket_cap).cast("long")
        buckets = buckets.observe(
            obs,
            F.sum(capped).alias("capped_buckets"),
            F.sum(capped * (F.col("bucket_size") - bucket_cap)).alias(
                "capped_ids_dropped"
            ),
        )
    buckets = buckets.drop("bucket_size")
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("ids"), i + 2, F.greatest(F.size("ids") - i - 1, F.lit(0))
                        ),
                        lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def minhash_lsh_star_edges(docs: DataFrame) -> DataFrame:
    """LSH near-dup edges for a CONNECTED-COMPONENTS consumer: one spanning
    star per band bucket (every member → the bucket-minimum hub id), instead
    of ``minhash_lsh_pairs``'s all-pairs-within-bucket.

    Same components, linearly fewer edges. Connectivity is what CC consumes
    — any two docs sharing a bucket are joined through the hub, and a doc in
    several buckets links their hubs transitively, so the component
    partition is IDENTICAL to the all-pairs graph's (property-tested in
    tests/test_cc.py). But a bucket of n ids emits n−1 edges here versus
    n(n−1)/2 pairs there: at web scale near-duplication is exactly where n
    explodes — measured round 4 on the 4.06M-turn corpus (~100 near-dup
    variants per turn): max bucket 17,502 ids, all-pairs graph 475M edges
    (OOM generating + distinct-ing them), star graph ≤ one edge per
    (doc, band) = bounded by 4·|docs| before distinct. No ``bucket_cap``
    and no dropped ids: the hub is a windowed min over the band relation
    (WindowExec buffers one bucket at a time — ids are short strings), not a
    ``collect_list`` slice, so there is nothing to cap.

    Use ``minhash_lsh_pairs`` when downstream needs candidate PAIRS to
    verify individually (Jaccard re-rank); use this when downstream is
    transitive-closure removal.
    """
    r = MINHASH_K // LSH_BANDS
    sig = minhash_signatures(docs)
    band_arr = F.array(
        *[
            F.md5(F.concat_ws("|", *[F.col(f"mh{b * r + i}") for i in range(r)]))
            for b in range(LSH_BANDS)
        ]
    )
    bands = sig.select("doc_id", F.posexplode(band_arr).alias("band_id", "bh"))
    w = Window.partitionBy("band_id", "bh")
    return (
        bands.withColumn("hub", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over distinct tokens.

    Token hash = first 4 hex digits of md5 parsed as int (conv); bit b of the
    fingerprint is 1 iff Σ_tokens (2·bit_b − 1) > 0. Integer-only → exact.
    """
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("t")
    ).withColumn("v", F.conv(F.substring(F.md5("t"), 1, 4), 16, 10).cast("long"))
    aggs = [
        F.sum(
            (F.shiftright(F.col("v"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{b}")
        for b in range(16)
    ]
    agg = tok.groupBy("doc_id").agg(*aggs)
    sim = None
    for b in range(16):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def paragraph_chunks(docs: DataFrame, chunk: int = 20) -> DataFrame:
    """One row per fixed-size token chunk: (doc_id, chunk_idx, chunk_hash).

    The paragraph unit of CCNet-style paragraph-level dedup (public CCNet /
    C4 pipelines drop paragraphs whose hash repeats across documents); the
    corpus documents are single normalized paragraphs, so fixed 20-token
    windows stand in for paragraph boundaries — the hashing/grouping shape
    is identical. Pure built-ins: sequence → transform → posexplode."""
    toks = tokens(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * chunk + 1, chunk)),
    )
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.md5(F.col("chunk_text")).alias("chunk_hash"),
    )


def paragraph_dedup_signals(docs: DataFrame, chunk: int = 20) -> DataFrame:
    """Per-doc paragraph-dedup signals: total chunks, chunks whose hash also
    occurs in ANOTHER document, and the duplicate ratio in micro units —
    the keep/strip signal of paragraph-level corpus dedup.

    Two shuffles, both on short keys: a chunk_hash groupBy (map-side
    combinable count of distinct docs) and the join back — the 100 TB shape
    (no self-join on documents, no text moves after hashing)."""
    ch = paragraph_chunks(docs, chunk)
    owners = ch.groupBy("chunk_hash").agg(
        F.countDistinct("doc_id").alias("n_owner_docs")
    )
    flagged = ch.join(owners, "chunk_hash").withColumn(
        "is_dup", (F.col("n_owner_docs") > 1).cast("long")
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("is_dup").alias("n_dup_chunks"),
        F.floor(F.lit(1000000) * F.sum("is_dup") / F.count(F.lit(1)))
        .cast("long")
        .alias("dup_micro"),
    )


def connected_components(
    pairs: DataFrame,
    max_iter: int = 50,
    checkpoint: bool = True,
    stats: "dict | None" = None,
) -> DataFrame:
    """Connected components over an undirected pair graph — the stage between
    near-dup PAIR generation (minhash_lsh_pairs / ngram_jaccard_pairs /
    embedding_near_dup_pairs) and the actual REMOVE decision: duplicates are
    transitive (A~B, B~C ⇒ {A,B,C} is one group), so survivors must be picked
    per *component*, not per pair — pair-local keep-min drops too little.

    Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond") — NOT naive min-label
    propagation. Propagation needs diameter(G) rounds (a chain of n near-dup
    docs, common with templated boilerplate, needs n rounds); star rounds
    provably converge in O(log² n) and in practice 2–4 rounds on LSH graphs
    (bucket pair-gen emits cliques, so components start near-star-shaped).

    Per round: two map-side-combinable groupBys (min per node) + an equi-join
    back to the edge list — shuffles only on node ids. Convergence is checked
    with a 2-value checksum aggregate (count + sum of xxhash64(edge)), one
    tiny action per round; lineage is cut per round with localCheckpoint (on
    a real cluster: reliable checkpoint dir). No cartesian anywhere.

    Input: (doc_a, doc_b) rows, doc_a ≠ doc_b. Output: one row per node that
    appears in any pair — (doc_id, comp) with comp = min doc_id reachable.
    Deterministic: every step is a min.

    Reference analog: ``merge_fragmented`` chains overlapping box fragments
    transitively (/root/reference/tools/infer/utility.py:980-1027); this is
    the same transitive closure over document near-duplicacy.
    """
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).distinct()

    def _checksum(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) sum: xxhash64 is a full-range long and ANSI mode
            # (on by default here) raises on long-sum overflow
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least(F.col("u"), F.col("mn")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        dire = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = dire.groupBy("u").agg(F.min("v").alias("m"))
        lower = dire.join(mins, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        selfe = mins.select(F.col("u"), F.col("m").alias("v"))
        return (
            lower.unionByName(selfe)
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    prev = _checksum(edges)
    converged = False
    rounds = 0
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges))
        if checkpoint:
            edges = edges.localCheckpoint(eager=True)
        rounds += 1
        cur = _checksum(edges)
        if cur == prev:
            converged = True
            break
        prev = cur
    if stats is not None:  # observability: round count + final edge count
        stats["rounds"] = rounds
        stats["final_edges"] = prev[0]
    if not converged:
        # star rounds provably converge in O(log² n); exhausting the budget
        # means the input violates assumptions (e.g. self-loops) — refuse
        # loudly rather than return labels from a non-star edge set
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # converged: edges are stars (u, root) with root = component min
    roots = edges.select(F.col("v").alias("doc_id")).distinct().join(
        edges.select(F.col("u").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    return edges.select(
        F.col("u").alias("doc_id"), F.col("v").alias("comp")
    ).unionByName(roots.select("doc_id", F.col("doc_id").alias("comp")))


def remove_near_duplicates(
    docs: DataFrame, pairs: DataFrame, stats: "dict | None" = None
) -> DataFrame:
    """The near-dup REMOVE stage end-to-end: given the corpus and its
    candidate pair graph, keep exactly one document per connected component
    (the component-minimum doc_id) plus every unpaired document.

    One anti-join against the loser set (component members that are not the
    representative). The loser set is component-graph-sized, far smaller than
    the corpus at any realistic dup rate — but at a pathological duplicate
    rate (e.g. a mirrored corpus) it approaches corpus size, so we do NOT
    force a broadcast hint: AQE (enabled in session.py) converts the anti-join
    to a broadcast at runtime when the built side is actually small, and falls
    back to a hash join instead of OOMing the driver when it isn't.
    """
    losers = connected_components(pairs, stats=stats).filter(
        F.col("doc_id") != F.col("comp")
    ).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti")


EXSUB_WINDOW = 25  # default duplicated-substring window length (tokens)


def substring_dup_spans(docs: DataFrame, window: int = EXSUB_WINDOW) -> DataFrame:
    """Exact-substring span dedup (the suffix-array dedup of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", re-expressed
    for Spark): any ``window``-token span whose text occurs >= 2 times in the
    corpus (anywhere, including within the same document) is a duplicated
    window; overlapping/adjacent duplicated windows merge into maximal
    duplicated spans, which are removed from the kept text.

    A suffix array is a single-machine structure; the distributed equivalent
    for a fixed minimum match length L is sliding-window hashing: a span of
    length >= L repeats iff every L-window inside it repeats, so the set of
    maximal duplicated spans found by merging duplicated L-windows equals the
    suffix-array answer truncated at resolution L.

    Shape at 100 TB: hashing is O(tokens * L) map-side work (inherent to the
    method); the only shuffles are a groupBy on the 32-byte window hash
    (map-side combinable count) and doc_id-keyed windows/joins for the
    interval merge. No self-join on documents, no text moves after hashing,
    no Python anywhere (plan-gated in tests/test_pipeline_ops.py).

    Returns one row per input doc:
      doc_id, ss_total_tokens, ss_windows, ss_dup_windows, ss_spans,
      ss_dup_tokens, ss_dup_micro, ss_kept_text
    (integers + strings only -> exact cross-engine equality; reference
    analog: fragment-overlap merge in tools/infer/utility.py:980-1027 merges
    overlapping *boxes*, this merges overlapping duplicated token intervals).
    """
    from pyspark.sql import Window

    base = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).withColumn("ss_total_tokens", F.size("toks").cast("long"))

    starts = F.when(
        F.col("ss_total_tokens") >= window,
        F.sequence(F.lit(0), (F.col("ss_total_tokens") - window).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    w = (
        base.select("doc_id", "toks", F.explode(starts).alias("pos"))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.md5(F.array_join(F.slice("toks", F.col("pos") + 1, window), " ")).alias("whash"),
        )
    )
    dup_hashes = (
        w.groupBy("whash")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= 2)
        .select("whash")
    )
    dpos = w.join(dup_hashes, "whash").select("doc_id", "pos")

    ordw = Window.partitionBy("doc_id").orderBy("pos")
    cum = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    isl = (
        dpos.withColumn("prev", F.lag("pos").over(ordw))
        .withColumn(
            "new_isl",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > window),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("isl", F.sum("new_isl").over(cum))
    )
    spans = isl.groupBy("doc_id", "isl").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + window).alias("e"),
        F.count(F.lit(1)).alias("nw"),
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("ss_spans"),
        F.sum(F.col("e") - F.col("s")).alias("ss_dup_tokens"),
        F.sum("nw").alias("ss_dup_windows"),
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("spans"),
    )

    joined = base.join(per_doc, "doc_id", "left")
    spans_arr = F.coalesce(
        F.col("spans"), F.array().cast("array<struct<s:bigint,e:bigint>>")
    )
    # Complement-slice reconstruction: the spans are sorted, disjoint and
    # strictly separated (island merge guarantees s_next > e_prev), so the
    # kept text is the concatenation of the token slices BETWEEN consecutive
    # spans plus the tail after the last one — O(tokens + spans) per doc,
    # replacing the former per-token sequence+exists scan that paid
    # O(tokens * spans) on long documents.
    kept_parts = F.aggregate(
        spans_arr,
        F.struct(
            F.lit(0).cast("bigint").alias("p"),
            F.array().cast("array<array<string>>").alias("parts"),
        ),
        lambda acc, sp: F.struct(
            sp["e"].alias("p"),
            F.concat(
                acc["parts"],
                F.array(
                    F.slice(
                        "toks",
                        (acc["p"] + 1).cast("int"),
                        (sp["s"] - acc["p"]).cast("int"),
                    )
                ),
            ).alias("parts"),
        ),
        lambda acc: F.concat(
            acc["parts"],
            F.array(
                F.slice(
                    F.col("toks"),
                    (acc["p"] + 1).cast("int"),
                    (F.col("ss_total_tokens") - acc["p"]).cast("int"),
                )
            ),
        ),
    )
    kept_text = F.array_join(F.flatten(kept_parts), " ")
    return joined.select(
        "doc_id",
        "ss_total_tokens",
        F.greatest(F.col("ss_total_tokens") - window + 1, F.lit(0))
        .cast("long")
        .alias("ss_windows"),
        F.coalesce(F.col("ss_dup_windows"), F.lit(0)).cast("long").alias("ss_dup_windows"),
        F.coalesce(F.col("ss_spans"), F.lit(0)).cast("long").alias("ss_spans"),
        F.coalesce(F.col("ss_dup_tokens"), F.lit(0)).cast("long").alias("ss_dup_tokens"),
        F.floor(
            F.lit(1000000)
            * F.coalesce(F.col("ss_dup_tokens"), F.lit(0))
            / F.col("ss_total_tokens")
        )
        .cast("long")
        .alias("ss_dup_micro"),
        kept_text.alias("ss_kept_text"),
    )
