"""Deterministic sampling and domain-mixture construction.

Training-data pipelines fix a corpus MIXTURE (so much web, so much code,
so much dialogue...) by sampling each domain at a target rate, sometimes
above 1.0 (up-sampling a scarce domain for several epochs). Two
properties matter at 10^12 rows and are the reason ``DataFrame.sample``
is the wrong tool:

- **Layout independence.** ``sample()`` draws from a per-partition RNG
  stream: the same seed over the same rows returns a DIFFERENT subset
  after a repartition, a file-split change, or an AQE re-plan. A content
  hash of the row key cannot care how the rows are laid out, so a resumed
  / re-run / re-partitioned job keeps the exact same subset (and an
  auditor can re-derive membership per row).
- **Exactness per row, not per batch.** The hash rule is a pure column
  predicate -- pushdown-friendly, shuffle-free, and joinable (the KEPT set
  is a deterministic function of the key, so two tables sampled with the
  same key/seed stay aligned).

Rule: keep a row iff ``md5(key || ':' || seed) mod 10^6 <
round(frac * 10^6)`` -- the md5 integer reuses :func:`dedup.md5_int`'s
60-bit prefix. Resolution is 1e-6 of the corpus; the realized fraction
converges to ``frac`` with the usual binomial concentration (exact
membership, approximate count -- the same contract as Solr/Spark
sampling).

DuckDB twins mirror the arithmetic for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import md5_int, md5_int_sql

__all__ = [
    "sample_key_col",
    "hash_sample",
    "stratified_sample",
    "upsample_mixture",
    "mixture_report",
    "hash_sample_sql",
    "stratified_sample_sql",
]

_M = 1_000_000  # hash-bucket resolution (1e-6 of the corpus)


def sample_key_col(id_col: Column | str, seed: int, salt: str = "") -> Column:
    """The row's sampling bucket in [0, 1e6): a pure function of
    (key, seed, salt) -- independent of partitioning, ordering, or run."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_int(
        F.concat_ws(":", c.cast("string"), F.lit(str(seed)), F.lit(salt))
    ) % _M


def _threshold(frac: float) -> int:
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1]: {frac}")
    return int(round(frac * _M))


def hash_sample(
    df: DataFrame, frac: float, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep a deterministic ~``frac`` of rows by key hash (see module
    docstring for why this beats ``DataFrame.sample`` at scale)."""
    return df.filter(sample_key_col(id_col, seed) < _threshold(frac))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    domain_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    default_frac: float | None = None,
) -> DataFrame:
    """Per-domain deterministic sampling: domain ``d`` keeps
    ``fractions[d]`` of its rows. Domains absent from ``fractions`` keep
    ``default_frac`` if given, else FAIL LOUD at execution (a silent
    drop/keep of an unlisted domain is how mixtures go wrong)."""
    if not fractions:
        raise ValueError("fractions must name at least one domain")
    dom = F.col(domain_col).cast("string")
    thr: Column = F.lit(None).cast("int")
    for d, frac in sorted(fractions.items()):
        thr = F.when(dom == d, F.lit(_threshold(frac))).otherwise(thr)
    if default_frac is not None:
        thr = F.coalesce(thr, F.lit(_threshold(default_frac)))
    else:
        thr = F.coalesce(thr, F.raise_error(F.concat(
            F.lit("stratified_sample: domain not in fractions: "),
            F.coalesce(dom, F.lit("null")),
        )).cast("int"))
    return df.filter(sample_key_col(id_col, seed) < thr)


def upsample_mixture(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Mixture construction with weights that may EXCEED 1: weight 2.3
    emits every row of that domain twice (``epoch`` 0 and 1) plus a
    deterministic 0.3 sample as ``epoch`` 2 (the standard multi-epoch
    up-sampling of scarce domains). The remainder sample is salted per
    integer epoch so it is independent of the sub-1.0 sampling rule.
    Output schema = input + ``epoch int``. Weight 0 drops the domain;
    unknown domains fail loud (same contract as stratified_sample).

    Scale shape: ``explode(sequence(0, full))`` multiplies rows in-plan
    (no self-union per epoch, one scan), and the filter is a pure column
    predicate -- codegen, shuffle-free."""
    if not weights:
        raise ValueError("weights must name at least one domain")
    for d, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {d!r}: {w}")
    dom = F.col(domain_col).cast("string")
    full: Column = F.lit(None).cast("int")
    rem_thr: Column = F.lit(None).cast("int")
    for d, w in sorted(weights.items()):
        full = F.when(dom == d, F.lit(int(w))).otherwise(full)
        rem_thr = F.when(
            dom == d, F.lit(_threshold(round(w - int(w), 9)))
        ).otherwise(rem_thr)
    err = F.raise_error(F.concat(
        F.lit("upsample_mixture: domain not in weights: "),
        F.coalesce(dom, F.lit("null")),
    )).cast("int")
    full, rem_thr = F.coalesce(full, err), F.coalesce(rem_thr, err)
    key = sample_key_col(id_col, seed, salt="rem")
    upper = full - F.when(key < rem_thr, 0).otherwise(1)
    # guard: Spark's sequence(0, -1) would count DOWN, not return empty --
    # weight 0 with no remainder must emit nothing (explode drops the row)
    epochs = F.when(
        upper >= 0, F.sequence(F.lit(0), upper)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("epoch", F.explode(epochs))


def mixture_report(
    df: DataFrame, domain_col: str
) -> DataFrame:
    """The realized mixture: ``(domain, n_rows, frac)`` -- the audit
    companion to the samplers. One partial-agg groupBy over the domain
    column; the total-over-all window runs on the domains-sized counts
    frame, never the corpus."""
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_rows")
    )
    tot = F.sum("n_rows").over(Window.partitionBy())
    return counts.select(
        "domain", "n_rows",
        (F.col("n_rows") / tot).cast("double").alias("frac"),
    )


# --- DuckDB twins -----------------------------------------------------------

def _key_sql(id_expr: str, seed: int, salt: str = "") -> str:
    return (
        md5_int_sql(
            f"concat_ws(':', CAST({id_expr} AS VARCHAR), '{seed}', '{salt}')"
        ) + f" % {_M}"
    )


def hash_sample_sql(
    source_sql: str, frac: float, id_expr: str = "doc_id", seed: int = 0
) -> str:
    return (
        f"SELECT * FROM ({source_sql}) "
        f"WHERE {_key_sql(id_expr, seed)} < {_threshold(frac)}"
    )


def stratified_sample_sql(
    source_sql: str,
    fractions: dict[str, float],
    domain_expr: str,
    id_expr: str = "doc_id",
    seed: int = 0,
    default_frac: float = 0.0,
) -> str:
    branches = " ".join(
        f"WHEN CAST({domain_expr} AS VARCHAR) = '{d}' THEN {_threshold(f)}"
        for d, f in sorted(fractions.items())
    )
    thr = f"CASE {branches} ELSE {_threshold(default_frac)} END"
    return (
        f"SELECT * FROM ({source_sql}) "
        f"WHERE {_key_sql(id_expr, seed)} < {thr}"
    )
