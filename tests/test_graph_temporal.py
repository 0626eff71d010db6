"""Behavior tests for the r5 temporal/graph batch (q84/q85/q87/q88/q89):
handmade fixture tables with hand-computable expected outputs, plus an
exact Python cross-check for the priority sampler. The DuckDB oracle gate
covers sf0.001/sf0.01; these pin the *semantics* on graphs/histories small
enough to verify by eye."""

from __future__ import annotations

import datetime
import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kgforge.queries import REGISTRY


def _write(tmp_path, name, table: pa.Table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_scd2_collapses_runs_and_builds_intervals(spark, tmp_path):
    """User 1: A,A,B,A -> 3 versions (A,B,A), last open; covered_ms spans
    first-change to last-change. User 2: single event -> 1 open version."""
    rows = [
        (1, 1, _ts("2024-01-01T00:00:00"), "A"),
        (2, 1, _ts("2024-01-01T00:00:10"), "A"),  # run-collapse: no version
        (3, 1, _ts("2024-01-01T00:01:00"), "B"),
        (4, 1, _ts("2024-01-01T00:02:30"), "A"),
        (5, 2, _ts("2024-01-01T09:00:00"), "Z"),
    ]
    _write(
        tmp_path,
        "events",
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[3] for r in rows]),
            }
        ),
    )
    got = {
        r.user_id: r.asDict()
        for r in REGISTRY["q84_scd2_history"].fn(spark, str(tmp_path)).collect()
    }
    assert got[1]["n_versions"] == 3
    assert got[1]["n_current"] == 1
    assert got[1]["current_type"] == "A"
    # version1 [00:00, 01:00) = 60s, version2 [01:00, 02:30) = 90s
    assert got[1]["covered_ms"] == 150_000
    assert got[2] == {
        "user_id": 2,
        "n_versions": 1,
        "n_current": 1,
        "covered_ms": 0,
        "current_type": "Z",
    }


def test_priority_sample_matches_exact_python_reference(spark):
    """Bit-exact cross-check: the Spark top-32 must equal a pure-Python
    reimplementation (hashlib md5, IEEE double division) on the real
    sf0.001 documents table — same docs, same priorities to 6 dp."""
    import duckdb

    docs = duckdb.sql(
        "SELECT doc_id, n_chars FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    keyed = []
    for doc_id, n_chars in docs:
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        keyed.append((n_chars * 4294967296.0 / (u + 1), doc_id, n_chars))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    expect = [
        (doc_id, n_chars, round(p, 6)) for p, doc_id, n_chars in keyed[:32]
    ]
    got = [
        (r.doc_id, r.n_chars, r.priority)
        for r in REGISTRY["q85_priority_sample"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    ]
    assert got == expect


def test_deletion_neighborhood_exact_recall_for_lev1(spark, tmp_path):
    """{ab, abc, abd, xyz}: candidates are exactly the three lev<=1 pairs
    (ab-abc and ab-abd via identity-vs-deletion keys, abc-abd via the
    shared deletion 'ab'); xyz shares no key with anything."""
    _write(
        tmp_path,
        "customer",
        pa.table({"c_name": pa.array(["ab", "abc", "abd", "xyz"])}),
    )
    row = (
        REGISTRY["q87_deletion_neighborhood_linking"]
        .fn(spark, str(tmp_path))
        .collect()[0]
    )
    assert (row.n_entities, row.n_candidate_pairs, row.n_matches) == (4, 3, 3)


def test_deletion_neighborhood_rejects_transpositions(spark, tmp_path):
    """'ab' vs 'ba' share two deletion keys ('a' and 'b') so they are
    CANDIDATES, but levenshtein('ab','ba') = 2 — the verify step must
    reject them (the false-positive class of the blocking scheme)."""
    _write(tmp_path, "customer", pa.table({"c_name": pa.array(["ab", "ba"])}))
    row = (
        REGISTRY["q87_deletion_neighborhood_linking"]
        .fn(spark, str(tmp_path))
        .collect()[0]
    )
    assert (row.n_entities, row.n_candidate_pairs, row.n_matches) == (2, 1, 0)


def _lineitem_from_orders(tmp_path, orders: dict[int, list[int]]):
    """Write a minimal lineitem.parquet where order k contains the given
    part keys (co-purchase edges = per-order part pairs)."""
    ok, pk = [], []
    for o, parts in orders.items():
        for p in parts:
            ok.append(o)
            pk.append(p)
    _write(
        tmp_path,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
            }
        ),
    )


def _pagerank_reference(edges_undirected, iters=4, T=1_000_000_000_000):
    """Pure-Python mirror of q88's scaled-integer recurrence."""
    from collections import defaultdict

    adj = defaultdict(list)
    for u, v in edges_undirected:
        adj[u].append(v)
        adj[v].append(u)
    nodes = sorted(adj)
    n = len(nodes)
    base = (3 * T) // (20 * n)
    r = {u: T // n for u in nodes}
    d = {u: len(adj[u]) for u in nodes}
    for _ in range(iters):
        s = {u: 0 for u in nodes}
        for u in nodes:
            c = r[u] // d[u]
            for v in adj[u]:
                s[v] += c
        r = {u: base + (17 * s[u]) // 20 for u in nodes}
    return r, d


def test_pagerank_matches_integer_reference_on_star_graph(spark, tmp_path):
    """Star with hub 1 (orders {1:[1,2],2:[1,3],3:[1,4]}) + a 2-3 edge:
    Spark's 4-iteration scaled-integer ranks must equal the pure-Python
    recurrence node for node."""
    orders = {10: [1, 2], 20: [1, 3], 30: [1, 4], 40: [2, 3]}
    _lineitem_from_orders(tmp_path, orders)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3)]
    expect_r, expect_d = _pagerank_reference(edges)
    got = REGISTRY["q88_pagerank"].fn(spark, str(tmp_path)).collect()
    assert {r.node: r.rank_scaled for r in got} == expect_r
    assert {r.node: r.degree for r in got} == expect_d
    # hub must outrank the leaves
    ranks = {r.node: r.rank_scaled for r in got}
    assert ranks[1] == max(ranks.values())
    assert ranks[4] == min(ranks.values())


def test_pagerank_rank_mass_is_conserved_mod_flooring(spark, tmp_path):
    """On a regular graph (triangle) ranks stay exactly uniform: every
    node keeps T//3 through every iteration (symmetry + exact integer
    arithmetic)."""
    _lineitem_from_orders(tmp_path, {1: [7, 8, 9]})
    got = {r.node: r.rank_scaled
           for r in REGISTRY["q88_pagerank"].fn(spark, str(tmp_path)).collect()}
    expect_r, _ = _pagerank_reference([(7, 8), (7, 9), (8, 9)])
    assert got == expect_r
    assert len(set(got.values())) == 1  # symmetric -> identical ranks


def test_triangle_count_known_graphs(spark, tmp_path):
    """K4 inside one order = 4 triangles; adding a pendant edge changes
    nothing. n_wedges counts oriented out-wedges (algorithm-specific but
    deterministic)."""
    _lineitem_from_orders(tmp_path, {1: [1, 2, 3, 4], 2: [4, 9]})
    row = REGISTRY["q89_triangle_count"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_nodes == 5
    assert row.n_edges == 7  # C(4,2) + pendant
    assert row.n_triangles == 4


def test_triangle_count_triangle_free(spark, tmp_path):
    """A path graph (orders as edges) has zero triangles."""
    _lineitem_from_orders(tmp_path, {1: [1, 2], 2: [2, 3], 3: [3, 4]})
    row = REGISTRY["q89_triangle_count"].fn(spark, str(tmp_path)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 3, 0)


def test_no_cartesian_products_in_graph_batch(spark):
    """Plan guard: the graph/linking queries are equi-joins end-to-end —
    a CartesianProduct in any of them would be the quadratic blow-up the
    designs exist to avoid."""
    for name in (
        "q87_deletion_neighborhood_linking",
        "q88_pagerank",
        "q89_triangle_count",
    ):
        plan = (
            REGISTRY[name]
            .fn(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan, (name, plan[:1200])


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_deletion_neighborhood_recall_property(spark, tmp_path):
    """Exact-recall property on a deterministic pseudo-random vocabulary:
    n_matches must equal the brute-force count of lev<=1 pairs (the
    blocking may overgenerate candidates, but must never miss a match)."""
    import hashlib

    names = sorted(
        {
            "".join(
                "abcd"[b % 4]
                for b in hashlib.md5(f"w{i}".encode()).digest()[: 3 + i % 4]
            )
            for i in range(80)
        }
    )
    brute = sum(
        1
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if _lev(names[i], names[j]) <= 1
    )
    assert brute > 0  # fixture must actually exercise the match path
    _write(tmp_path, "customer", pa.table({"c_name": pa.array(names)}))
    row = (
        REGISTRY["q87_deletion_neighborhood_linking"]
        .fn(spark, str(tmp_path))
        .collect()[0]
    )
    assert row.n_entities == len(names)
    assert row.n_matches == brute
    assert row.n_candidate_pairs >= row.n_matches


def test_q98_kcore_oracle_unroll_margin():
    """q98's DuckDB oracle unrolls _KCORE_ROUNDS peel rounds; it equals
    Spark's run-to-fixpoint k_core ONLY if the peel converges within the
    unroll (extra rounds past the fixpoint are no-ops). Pin that margin
    against the actual test tables at both driver scales — if testdata
    ever changes shape, this fails before the driver gate does.
    Pure DuckDB + Python (no Spark): the synchronous peel is tiny here."""
    import collections

    import duckdb

    from kgforge.queries.graph_temporal import _KCORE_K, _KCORE_ROUNDS

    for sf in ("0.001", "0.01"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf{sf}/lineitem.parquet')"
        )
        edges = con.execute(
            """
            SELECT p1, p2 FROM (
                SELECT a.l_partkey p1, b.l_partkey p2,
                       count(DISTINCT a.l_orderkey) c
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2) WHERE c >= 2
            """
        ).fetchall()
        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        rounds = 0
        while True:
            drop = [n for n, s in adj.items() if len(s) < _KCORE_K]
            if not drop:
                break
            rounds += 1
            for n in drop:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
        # >=2 rounds of slack between observed fixpoint and the unroll
        assert rounds <= _KCORE_ROUNDS - 2, (sf, rounds, _KCORE_ROUNDS)
        if sf == "0.01":
            assert adj, "sf0.01 core must be nonempty for a meaningful gate"
