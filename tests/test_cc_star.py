"""Property tests for the large-star/small-star connected components
(operators/dedup.connected_components).

The headline property is ROUND COMPLEXITY, not just correctness: a path
(chain) component is the adversarial shape for min-label propagation
(O(diameter) rounds); the star alternation must converge in O(log n)
rounds. The 300-node chain is pinned at <= 12 iterations -- propagation
would need ~300.
"""

from __future__ import annotations

import random

import pytest

from sample_for_transactional_datalake_using_s3tables_spark.operators.dedup import (
    connected_components,
)

# Long-tail battery: excluded from the default gate (VERDICT r13 #4
# -- the full suite outgrew the driver's verification budget). Run
# everything with:  python -m pytest tests/ -q -m "slow or not slow"
pytestmark = pytest.mark.slow



def _uf_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find oracle: node -> min node id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _run(spark, edges: list[tuple[int, int]], max_iters: int = 50) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.comp
        for r in connected_components(df, max_iters=max_iters).collect()
    }


def test_long_chain_converges_in_log_rounds(spark):
    """300-node path: O(log n) bound -- 12 rounds is ~2*log2(300) + slack;
    min-label propagation would need ~300 rounds here."""
    n = 300
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run(spark, edges, max_iters=12)
    assert got == {i: 0 for i in range(n)}


def test_two_components_and_direction_independence(spark):
    # edges given in mixed directions; two separate clusters
    edges = [(5, 3), (3, 7), (20, 10), (10, 30)]
    got = _run(spark, edges)
    assert got == {3: 3, 5: 3, 7: 3, 10: 10, 20: 10, 30: 10}


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(1, 1), (1, 2), (2, 1), (1, 2)]
    got = _run(spark, edges)
    assert got == {1: 1, 2: 1}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randrange(10, 80))
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, edges)
    assert got == _uf_components(n, edges)
