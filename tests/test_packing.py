"""Sequence packing (operators/packing.py): stream_pack vs its DuckDB
twin (hard parity, the in-suite oracle pattern), bin_pack_greedy vs a
brute-force reimplementation, invariants, and layout independence."""

import duckdb
import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.functions.text_metrics import (
    token_count_sql,
    token_count_ws,
)
from solr_semantic_importer_spark.operators.packing import (
    bin_pack_greedy,
    packing_stats,
    stream_pack,
    stream_pack_sql,
)

BUDGET = 256


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").alias("id"), "text"))


# ------------------------------------------------------------- stream_pack


def _spark_stream(spark, docs, parts):
    out = stream_pack(
        docs,
        token_col=token_count_ws("text"),
        order_col="id",
        budget=BUDGET,
        parts=parts,
    )
    return sorted(
        out.select("id", "n_tokens", "stream_pos", "seq_id", "seq_id_end",
                   "seq_spans").collect()
    )


def test_stream_pack_duckdb_parity(spark, docs, sf_dir):
    got = _spark_stream(spark, docs, parts=8)
    ws_sql, _ = token_count_sql("text")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            stream_pack_sql("documents", ws_sql, "doc_id", BUDGET,
                            id_cols="doc_id AS id", id_out="id")
        ).fetchall()
    )
    assert [tuple(r) for r in got] == want


def test_stream_pack_layout_independent(spark, docs):
    # the global stream is a function of the ORDER KEY, not the layout:
    # 3 partitions and 8 partitions must produce identical positions
    assert _spark_stream(spark, docs, parts=3) == _spark_stream(
        spark, docs, parts=8
    )


def test_stream_pack_invariants(spark, docs):
    rows = _spark_stream(spark, docs, parts=8)
    # positions are the exclusive prefix sum of token counts in id order
    pos = 0
    for r in rows:  # sorted by id; ids are the order key
        assert r.stream_pos == pos
        assert r.seq_id == pos // BUDGET
        last = pos + max(r.n_tokens, 1) - 1
        assert r.seq_id_end == last // BUDGET
        assert r.seq_spans == (r.seq_id_end > r.seq_id)
        pos += r.n_tokens


def test_stream_pack_rejects_bad_budget(spark, docs):
    with pytest.raises(ValueError, match="budget"):
        stream_pack(docs, token_col="id", order_col="id", budget=0)


# --------------------------------------------------------- bin_pack_greedy


def _brute_first_fit(items, budget, open_bins):
    """Reference reimplementation of the bounded-lookback first-fit."""
    bins, out, next_id = [], {}, 0
    for key, nt in items:
        if nt > budget:
            out[key] = (next_id, True)
            next_id += 1
            continue
        placed = False
        for i, (bid, used) in enumerate(bins):
            if used + nt <= budget:
                bins[i] = (bid, used + nt)
                out[key] = (bid, False)
                placed = True
                break
        if not placed:
            if len(bins) >= open_bins:
                j = max(range(len(bins)), key=lambda i: (bins[i][1], -bins[i][0]))
                bins.pop(j)
            out[key] = (next_id, False)
            bins.append((next_id, nt))
            next_id += 1
    return out


def test_bin_pack_matches_brute_force_single_partition(spark, docs):
    # parts=1: one greedy stream, directly comparable to the reference
    packed = bin_pack_greedy(
        docs, token_col=token_count_ws("text"), order_col="id",
        budget=BUDGET, parts=1, open_bins=4,
    ).select("id", "n_tokens", "bin_id", "bin_overflow")
    got = {r.id: (r.bin_id, r.bin_overflow) for r in packed.collect()}
    items = sorted(
        (r.id, r.nt)
        for r in docs.select("id", token_count_ws("text").alias("nt")).collect()
    )
    want = _brute_first_fit(items, BUDGET, open_bins=4)
    assert got == want


def test_bin_pack_invariants_multi_partition(spark, docs):
    packed = bin_pack_greedy(
        docs, token_col=token_count_ws("text"), order_col="id",
        budget=BUDGET, parts=4,
    )
    stats = packing_stats(packed, BUDGET).collect()
    assert stats
    for s in stats:
        ov = packed.filter(
            (F.col("bin_id") == s.bin_id) & F.col("bin_overflow")
        ).count()
        if ov:
            assert s.n_docs == 1  # an overflow doc is alone in its bin
        else:
            assert s.tokens <= BUDGET
            assert 0 <= s.fill_milli <= 1000
    # deterministic across runs
    a = sorted((r.id, r.bin_id) for r in packed.collect())
    b = sorted(
        (r.id, r.bin_id)
        for r in bin_pack_greedy(
            docs, token_col=token_count_ws("text"), order_col="id",
            budget=BUDGET, parts=4,
        ).collect()
    )
    assert a == b


def test_bin_pack_no_budget_violations_and_ids_unique_across_partitions(
    spark, docs
):
    packed = bin_pack_greedy(
        docs, token_col=token_count_ws("text"), order_col="id",
        budget=BUDGET, parts=4,
    )
    bad = (
        packed.groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("t"), F.max("bin_overflow").alias("o"))
        .filter((F.col("t") > BUDGET) & ~F.col("o"))
        .count()
    )
    assert bad == 0
