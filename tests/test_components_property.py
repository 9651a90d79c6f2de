"""Property test for the numpy hook-and-compress labeling core.

The driver fast path of connected_components rests on _hook_compress
producing the exact min-index labeling for ANY edge list. Spark-free,
so hypothesis can hammer it with hundreds of random graphs (chains,
blobs, stars, parallel edges, self-loop-free canonical shapes) in
milliseconds — the Spark-side tests then only need to pin the
DataFrame plumbing.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pii_filter_spark.operators.components import _hook_compress


def _union_find_labels(ea, eb, n):
    """Reference: classic union-find, then relabel each root to the
    minimum vertex index of its component."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ea, eb):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict = {}
    for v in range(n):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return np.array([comp_min[find(v)] for v in range(n)], dtype=np.int64)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=1, max_value=60).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=n - 1),
                    st.integers(min_value=0, max_value=n - 1),
                ),
                max_size=120,
            ),
        )
    )
)
def test_hook_compress_matches_union_find(case):
    n, pairs = case
    # mirror _canon: drop self-loops (parallel/duplicate edges stay —
    # the labeling must tolerate them even though _canon dedups)
    pairs = [(a, b) for a, b in pairs if a != b]
    ea = np.array([a for a, _ in pairs], dtype=np.int64)
    eb = np.array([b for _, b in pairs], dtype=np.int64)
    got = _hook_compress(ea, eb, n)
    exp = _union_find_labels(ea, eb, n)
    assert np.array_equal(got, exp)


def test_hook_compress_worst_case_chain_descending():
    """A descending chain (n-1 — n-2 — ... — 0) maximizes propagation
    distance against the hooking direction; 10k vertices must still
    converge within the 64-round bound and label everything 0."""
    n = 10_000
    ea = np.arange(1, n, dtype=np.int64)
    eb = ea - 1
    lab = _hook_compress(ea, eb, n)
    assert np.array_equal(lab, np.zeros(n, dtype=np.int64))
