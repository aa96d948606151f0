"""shortestPath() stream expression vs a pure-python BFS reference."""

import datetime
import random

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.stream_expr import run_stream_expr

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)
SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp, from_f string, to_f string")


def _graph_index(spark, tmp_path_factory, name, edges):
    ts = datetime.datetime(2024, 1, 1)
    rows = [(f"c{i:04d}", 0, "user", "hello world", None, ts, s, t)
            for i, (s, t) in enumerate(edges)]
    d = str(tmp_path_factory.mktemp(name))
    build_index(spark, spark.createDataFrame(rows, SCHEMA), d,
                BuildConfig(build_id=name, **CFG))
    return BM25Index(spark, d)


def _bfs_all_shortest(edges, frm, to, max_depth):
    """All minimal-length paths frm->to (<= max_depth hops), as the
    reference."""
    adj = {}
    for s, t in set(edges):
        adj.setdefault(s, set()).add(t)
    if frm == to:
        return [[frm]]
    frontier, visited, depth = [[frm]], {frm}, 0
    while frontier and depth < max_depth:
        depth += 1
        nxt = [p + [t] for p in frontier
               for t in sorted(adj.get(p[-1], ())) if t not in visited]
        hits = [p for p in nxt if p[-1] == to]
        if hits:
            return sorted(hits)
        new_nodes = {p[-1] for p in nxt}
        if not new_nodes:
            return []
        visited |= new_nodes
        frontier = nxt
    return []


def _run(idx, frm, to, max_depth, extra=""):
    df = run_stream_expr(
        idx, f'shortestPath(tx, from="{frm}", to="{to}", '
             f'edge="from_f=to_f", maxDepth="{max_depth}"{extra})')
    return sorted([list(r["path"]) for r in df.collect()])


DIAMOND = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
           ("e", "a"), ("x", "y")]


def test_diamond_all_shortest_paths(spark, tmp_path_factory):
    idx = _graph_index(spark, tmp_path_factory, "spd", DIAMOND)
    # two equally-short 3-hop paths; the cycle e->a must not loop
    assert _run(idx, "a", "e", 6) == [["a", "b", "d", "e"],
                                      ["a", "c", "d", "e"]]
    # one-hop and zero-hop
    assert _run(idx, "a", "b", 4) == [["a", "b"]]
    assert _run(idx, "a", "a", 4) == [["a", "a"]] or \
        _run(idx, "a", "a", 4) == [["a"]]
    # unreachable component / depth ceiling / unknown start
    assert _run(idx, "a", "y", 6) == []
    assert _run(idx, "a", "e", 2) == []
    assert _run(idx, "zz", "e", 4) == []


def test_random_graph_matches_bfs_reference(spark, tmp_path_factory):
    rng = random.Random(1234)
    nodes = [f"n{i}" for i in range(18)]
    edges = list({(rng.choice(nodes), rng.choice(nodes))
                  for _ in range(60)})
    edges = [(s, t) for s, t in edges if s != t]
    idx = _graph_index(spark, tmp_path_factory, "spr", edges)
    for frm, to in [("n0", "n7"), ("n1", "n15"), ("n3", "n3"),
                    ("n5", "n11")]:
        want = _bfs_all_shortest(edges, frm, to, 8)
        got = _run(idx, frm, to, 8)
        if frm == to:
            assert got == [[frm]]
        else:
            assert got == want, (frm, to)


def test_shortest_path_fq_and_validation(spark, tmp_path_factory):
    idx = _graph_index(spark, tmp_path_factory, "spf", DIAMOND)
    # fq narrows the edge set: cutting the b-docs forces the c route
    got = _run(idx, "a", "e", 6, extra=', fq="conv_id:c0002"')
    assert got == []  # only edge b->d survives: no a->... start
    with pytest.raises(ValueError, match="edge must be"):
        run_stream_expr(idx, 'shortestPath(tx, from="a", to="b", '
                             'edge="from_f", maxDepth="3")')
    with pytest.raises(ValueError, match="unknown edge fields"):
        run_stream_expr(idx, 'shortestPath(tx, from="a", to="b", '
                             'edge="nope=to_f", maxDepth="3")')
    with pytest.raises(ValueError, match="maxDepth"):
        run_stream_expr(idx, 'shortestPath(tx, from="a", to="b", '
                             'edge="from_f=to_f", maxDepth="0")')
    with pytest.raises(ValueError, match="missing params"):
        run_stream_expr(idx, 'shortestPath(tx, from="a", to="b", '
                             'edge="from_f=to_f")')


def test_shortest_path_respects_tombstones(spark, tmp_path_factory):
    idx = _graph_index(spark, tmp_path_factory, "spt", DIAMOND)
    # kill the a->b edge doc: only the c route remains
    idx.delete_by_query("conv_id = 'c0000'")
    assert _run(idx, "a", "e", 6) == [["a", "c", "d", "e"]]


def test_zero_hop_requires_known_node(spark, tmp_path_factory):
    """Review fix: from==to never fabricates a path through a node the
    (fq-filtered) graph does not contain."""
    idx = _graph_index(spark, tmp_path_factory, "spz", DIAMOND)
    assert _run(idx, "ghost", "ghost", 3) == []
    assert _run(idx, "a", "a", 3) == [["a"]]
    # fq that removes every a-edge removes the zero-hop witness too
    got = _run(idx, "a", "a", 3, extra=', fq="conv_id:c0002"')
    assert got == []
