"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), MinHash+LSH over word shingles, SimHash, and n-gram
Jaccard -- all expressed with built-in JVM Column expressions so the plans
stay inside whole-stage codegen (no Python in the hot path) and every step
is a plain shuffle Catalyst can plan/AQE-skew-handle.

Shared hash primitive (identical in Spark and DuckDB, so every operator is
oracle-checkable): H(s) = int(md5(s)[:15 hex], 16)  (60 bits), reduced mod
P = 2**31 - 1. The MinHash family is h_i(x) = (a_i * x + b_i) mod P with
a_i = 2i+1, b_i = i*i + 7 -- products stay < 2**37, no int64 overflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.analysis import tokens_col

P = 2_147_483_647  # 2**31 - 1


def md5_int(col: Column) -> Column:
    """First 60 bits of md5 as a bigint (same value as the DuckDB oracle's
    ('0x' || substr(md5(s),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_int_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _hash_params(i: int) -> tuple[int, int]:
    return 2 * i + 1, i * i + 7


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest id per identical text (hash-groupBy dedup).

    Scale note: groups by the FULL 128-bit md5 of the content (16-byte
    binary key via unhex, not the text itself), so the shuffle carries
    ~32 bytes/row instead of the document body. Collision bound: at 10^12
    documents the expected number of false merges is n^2 / 2^129 ~ 1.5e-15
    -- effectively zero, versus ~4e5 for the 60-bit prefix this replaced
    (each false merge silently destroys a unique training document).
    Deliberate md5 second-preimage attacks are out of scope for dedup; use
    sha256 at the same plan shape if the corpus is adversarial.
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.unhex(F.md5(F.coalesce(F.col(text_col), F.lit("")))).alias("_h"),
    )
    keep = keyed.groupBy("_h").agg(
        F.min("id").alias("keep_id"), F.count("*").alias("n_copies")
    )
    return keep.select("keep_id", "n_copies")


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def shingles_col(text_col: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles; texts with < k tokens yield one shingle of
    all their tokens (empty text -> no shingles)."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    full = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    short = F.array(F.array_join(toks, " "))
    return F.array_distinct(
        F.when(n >= k, full).when(n > 0, short).otherwise(F.array().cast("array<string>"))
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 16, k: int = 3
) -> DataFrame:
    """(id, sig_0..sig_{n-1}): MinHash signature over word k-shingles.

    Plan shape: project shingles (codegen) -> explode -> single groupBy(id)
    computing all n mins as one aggregate pass (map-side partial agg makes
    the shuffle carry n*8 bytes per doc, not per shingle).
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles_col(text_col, k)).alias("sh")
    ).withColumn("x", md5_int(F.col("sh")) % P)
    aggs = []
    for i in range(n_hashes):
        a, b = _hash_params(i)
        aggs.append(F.min((F.col("x") * a + b) % P).alias(f"sig_{i}"))
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame,
    n_hashes: int = 16,
    band_size: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing at least one LSH band.

    Bands via a single explode of (band_idx, band_key) -- one self-join on
    the band key, which Spark executes as a shuffle join keyed by band; hot
    buckets are the classic skew case and AQE skew-join splits them.

    ``max_bucket`` caps per-(band, key) population (same contract as
    embedding_neardup_pairs): a degenerate band key -- empty or boilerplate
    shingle sets, mass-duplicated texts -- makes its bucket O(n^2) in pair
    count, which AQE can re-split into tasks but cannot shrink. Oversized
    buckets are EXCLUDED from candidate generation and logged with their
    count and max size, never silently truncated; pairs inside an excluded
    bucket can still surface through their other bands, and a mass-duplicate
    cluster is the exact-dedup operator's job anyway.
    """
    n_bands = n_hashes // band_size
    bands = []
    for bdx in range(n_bands):
        cols = [F.col(f"sig_{i}").cast("string") for i in range(bdx * band_size, (bdx + 1) * band_size)]
        bands.append(F.struct(F.lit(bdx).alias("band"), F.concat_ws("_", *cols).alias("key")))
    banded = sig.select("id", F.explode(F.array(*bands)).alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    if max_bucket is not None:
        import logging

        counts = banded.groupBy("band", "key").agg(F.count("*").alias("n"))
        over = counts.filter(F.col("n") > max_bucket).persist()
        stats = over.agg(
            F.count("*").alias("k"), F.coalesce(F.max("n"), F.lit(0)).alias("mx")
        ).collect()[0]
        if stats["k"]:
            logging.getLogger(__name__).warning(
                "lsh_candidate_pairs: excluded %d oversized LSH buckets "
                "(max population %d > cap %d); run exact_dedup first or "
                "raise the cap for full coverage of those clusters",
                stats["k"], stats["mx"], max_bucket,
            )
        banded = banded.join(over.select("band", "key"), ["band", "key"], "left_anti")
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(r, ["band", "key"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return pairs


def minhash_lsh_sql(source_sql: str, id_expr: str, text_expr: str,
                    n_hashes: int = 16, band_size: int = 4, k: int = 3) -> str:
    """DuckDB oracle for minhash_signature + lsh_candidate_pairs."""
    step_hashes = ",\n      ".join(
        f"min((x * {2*i+1} + {i*i+7}) % {P}) AS sig_{i}" for i in range(n_hashes)
    )
    n_bands = n_hashes // band_size
    band_selects = "\n      UNION ALL ".join(
        "SELECT id, {b} AS band, concat_ws('_', {cols}) AS key FROM sig".format(
            b=b,
            cols=", ".join(f"sig_{i}::VARCHAR" for i in range(b * band_size, (b + 1) * band_size)),
        )
        for b in range(n_bands)
    )
    return f"""
    WITH src AS ({source_sql}),
    tok AS (
      SELECT {id_expr} AS id,
             regexp_extract_all(lower(coalesce({text_expr}, '')), '[a-z0-9]+') AS toks
      FROM src
    ),
    sh AS (
      SELECT id, unnest(list_distinct(CASE
        WHEN len(toks) >= {k} THEN
          list_transform(generate_series(0, len(toks) - {k}),
                         i -> array_to_string(toks[i + 1 : i + {k}], ' '))
        WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        ELSE [] END)) AS s
      FROM tok
    ),
    hx AS (SELECT id, {md5_int_sql('s')} % {P} AS x FROM sh),
    sig AS (SELECT id, {step_hashes} FROM hx GROUP BY id),
    bands AS (
      {band_selects}
    )
    SELECT DISTINCT l.id AS id_a, r.id AS id_b
    FROM bands l JOIN bands r USING (band, key)
    WHERE l.id < r.id
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """(id, simhash): tf-weighted SimHash fingerprint, fully JVM-side.

    Per term: bit_j = ((a_j * H + b_j) mod P) mod 2; fingerprint bit j is 1
    iff sum over terms of tf * (2*bit_j - 1) > 0. One explode + one groupBy.
    """
    toks = df.select(F.col(id_col).alias("id"), F.explode(tokens_col(text_col)).alias("t"))
    tf = toks.groupBy("id", "t").agg(F.count("*").alias("tf"))
    tf = tf.withColumn("x", md5_int(F.col("t")) % P)
    sums = []
    for j in range(bits):
        a, b = _hash_params(j)
        bit = ((F.col("x") * a + b) % P) % 2
        sums.append(F.sum(F.col("tf") * (bit * 2 - 1)).alias(f"s_{j}"))
    agg = tf.groupBy("id").agg(*sums)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"s_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else (fp + term)
    return agg.select("id", fp.cast("long").alias("simhash"))


def simhash_sql(source_sql: str, id_expr: str, text_expr: str, bits: int = 16) -> str:
    sums = ",\n      ".join(
        f"sum(tf * (2 * (((x * {2*j+1} + {j*j+7}) % {P}) % 2) - 1)) AS s_{j}"
        for j in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits))
    return f"""
    WITH src AS ({source_sql}),
    tok AS (
      SELECT {id_expr} AS id,
             unnest(regexp_extract_all(lower(coalesce({text_expr}, '')), '[a-z0-9]+')) AS t
      FROM src
    ),
    tf AS (SELECT id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
    hx AS (SELECT id, tf, {md5_int_sql('t')} % {P} AS x FROM tf),
    agg AS (SELECT id, {sums} FROM hx GROUP BY id)
    SELECT id, CAST({fp} AS BIGINT) AS simhash FROM agg
    """


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for candidate verification)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, pairs: DataFrame, k: int = 3
) -> DataFrame:
    """Exact k-shingle Jaccard for given candidate pairs (id_a, id_b).

    The candidate relation is small (LSH output); the shingle sets are
    broadcast-joined to it per side and compared with array set ops.
    """
    sets = df.select(
        F.col(id_col).alias("id"), shingles_col(text_col, k).alias("sh")
    )
    a = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a",
        "id_b",
        F.round(inter / F.when(union == 0, F.lit(None)).otherwise(union), 6).alias(
            "jaccard"
        ),
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    band_planes: int = 8,
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold, via BANDED
    random-hyperplane LSH (mirrors the MinHash module's band structure).

    Each of the ``n_bands`` bands hashes with its own ``band_planes``
    hyperplanes; candidates = union over bands of within-bucket pairs, then
    an exact cosine re-check. Expected bucket population per band is
    N / 2^band_planes -- at 100 TB you raise band_planes (bounding the
    quadratic within-bucket join) and recover recall with more bands:
    P(candidate) = 1 - (1 - p^r)^b instead of a single table's p^r, where
    p = 1 - angle/pi. At cosine 0.999 with 4x8 the miss rate is ~1e-4.

    ``max_bucket`` caps per-(band, bucket) population: oversized buckets
    (mass near-duplicate clusters, degenerate all-zero embeddings) are
    EXCLUDED from candidate generation and logged with their count and max
    size -- never silently truncated. Pairs inside an excluded bucket can
    still surface through the other bands.
    """
    import logging

    from .similarity import cosine_sim, hyperplanes, lsh_bucket_col

    planes = hyperplanes(_vec_dim(emb, vec_col), n_bands * band_planes, seed)
    bands = []
    for bdx in range(n_bands):
        sub = planes[bdx * band_planes : (bdx + 1) * band_planes]
        bands.append(
            F.struct(
                F.lit(bdx).alias("band"),
                lsh_bucket_col(F.col(vec_col), sub).alias("bucket"),
            )
        )
    banded = emb.select(
        F.col(id_col).alias("id"), F.explode(F.array(*bands)).alias("b")
    ).select("id", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket"))
    if max_bucket is not None:
        counts = banded.groupBy("band", "bucket").agg(F.count("*").alias("n"))
        over = counts.filter(F.col("n") > max_bucket).persist()
        stats = over.agg(
            F.count("*").alias("k"), F.coalesce(F.max("n"), F.lit(0)).alias("mx")
        ).collect()[0]
        if stats["k"]:
            logging.getLogger(__name__).warning(
                "embedding_neardup: excluded %d oversized LSH buckets "
                "(max population %d > cap %d); raise band_planes or the cap "
                "for full coverage of those clusters",
                stats["k"], stats["mx"], max_bucket,
            )
        banded = banded.join(over.select("band", "bucket"), ["band", "bucket"], "left_anti")
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    # vectors join the (small) candidate relation once -- they are NOT
    # replicated through the per-band self-join
    vecs = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    j = cand.join(
        vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a"
    ).join(vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
    cos = F.round(cosine_sim(F.col("va"), F.col("vb")), 6)
    return j.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def _vec_dim(emb: DataFrame, vec_col: str) -> int:
    row = emb.select(F.size(vec_col).alias("d")).limit(1).collect()
    return int(row[0]["d"]) if row else 0


def embedding_neardup_sql(
    threshold: float, dim: int, n_bands: int = 4, band_planes: int = 8,
    seed: int = 42, table: str = "embeddings", id_expr: str = "vec_id",
    vec_expr: str = "embedding",
) -> str:
    """DuckDB oracle for the banded path: identical literal planes per band,
    union-of-bands candidates, exact cosine."""
    from .similarity import _vec_sql, hyperplanes

    planes = hyperplanes(dim, n_bands * band_planes, seed)

    def bucket_expr(bdx: int) -> str:
        sub = planes[bdx * band_planes : (bdx + 1) * band_planes]
        return " + ".join(
            f"(CASE WHEN list_dot_product(v, {_vec_sql(sub[j])}) > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(band_planes)
        )

    band_selects = "\n      UNION ALL ".join(
        f"SELECT id, {bdx} AS band, {bucket_expr(bdx)} AS bucket FROM e"
        for bdx in range(n_bands)
    )
    return f"""
    WITH e AS (SELECT {id_expr} AS id, {vec_expr}::DOUBLE[] AS v FROM {table}),
    bands AS (
      {band_selects}
    ),
    cand AS (
      SELECT DISTINCT l.id AS id_a, r.id AS id_b
      FROM bands l JOIN bands r USING (band, bucket)
      WHERE l.id < r.id
    )
    SELECT id_a, id_b,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
             AS cosine
    FROM cand JOIN e a ON a.id = cand.id_a JOIN e b ON b.id = cand.id_b
    WHERE round(list_dot_product(a.v, b.v) /
                (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
          >= {threshold}
    """


# ---------------------------------------------------------------------------
# near-dup clusters: candidate pairs -> connected components -> keep/drop
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of the candidate-pair graph: ``(id,
    component)`` where ``component`` is the COMPONENT MINIMUM id -- the
    step that turns the pair relations (`lsh_candidate_pairs`,
    `embedding_neardup_pairs`) into a keep/drop verdict. Only ids that
    appear in ``pairs`` come back; singletons never enter the graph (at
    10^12 docs a row per clean doc would dwarf the dup graph).

    Algorithm: min-label propagation with POINTER DOUBLING -- each round
    (1) every node takes the min label over itself and its neighbors,
    then (2) re-reads the label OF its label (path halving), giving
    O(log n) rounds on any topology where plain propagation needs the
    graph diameter (near-dup chains: A~B~C~... are real in
    boilerplate-heavy corpora). Every round shuffles only the PAIR graph
    (dup-cluster sized), never the corpus.

    Each round's labels ``localCheckpoint`` (eager): the checkpoint CUTS
    LINEAGE, which is load-bearing twice -- (a) unpersisting the previous
    round's labels would otherwise CASCADE-invalidate any cache built on
    top of them and force every round to recompute all prior rounds
    (exponential blowup -- the standard iterative-DataFrame trap, the
    reason GraphX checkpoints internally), and (b) 25 rounds of nested
    join plans would otherwise overwhelm the optimizer. localCheckpoint
    is executor-storage only; on a real cluster with executor churn use
    a reliable ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()``
    variant. The loop fails loud past ``max_iter`` rather than returning
    a half-merged clustering."""
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # (1) min over self + neighbors' labels
        nbr = (
            edges.join(labels, edges["v"] == labels["id"])
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("label").alias("nl"))
        )
        l1 = (
            labels.join(nbr, "id", "left")
            .select("id", F.least("label", F.coalesce("nl", "label")).alias("label"))
        )
        # (2) pointer doubling: label of the label
        l2 = (
            l1.alias("a")
            .join(
                l1.select(F.col("id").alias("label"),
                          F.col("label").alias("ll")).alias("b"),
                "label", "left",
            )
            .select("id", F.least("label", F.coalesce("ll", "label")).alias("label"))
            .localCheckpoint()  # eager: cuts lineage BEFORE the old
            # round's storage is released (see docstring)
        )
        changed = (
            l2.join(labels.withColumnRenamed("label", "old"), "id")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = l2
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    edges.unpersist()
    return labels.select("id", F.col("label").alias("component"))


def neardup_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep one doc per near-dup cluster (the component-minimum id) plus
    every doc outside the pair graph -- `exact_dedup`'s contract lifted to
    NEAR duplicates. The drop set is (graph nodes - component minima):
    dup-graph sized, broadcastable against the corpus scan."""
    comp = connected_components(pairs, id_a, id_b)
    drop = comp.filter(F.col("id") != F.col("component")) \
        .select(F.col("id").alias(id_col))
    return docs.join(F.broadcast(drop), id_col, "left_anti")
