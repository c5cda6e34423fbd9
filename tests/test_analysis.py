"""generate_cooccurrence_analysis composition (reference cord19kg/utils.py:
544-734) — per-factor graph + tree with metrics/communities written back."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from bluegraph_ray.pipelines.analysis import generate_cooccurrence_analysis


def _occurrence_fixture():
    # 6 entities over 4 papers; a/b/c co-occur heavily, x/y/z separately
    rows = [
        ("a", ["p1", "p2", "p3"], ["p1:s:0", "p2:s:0", "p3:s:0"]),
        ("b", ["p1", "p2"], ["p1:s:1", "p2:s:1"]),
        ("c", ["p1", "p2", "p3"], ["p1:s:2", "p2:s:2", "p3:s:2"]),
        ("x", ["p4"], ["p4:s:0", "p4:s:1"]),
        ("y", ["p4"], ["p4:s:2", "p4:s:3"]),
        ("z", ["p4", "p3"], ["p4:s:4", "p3:s:4"]),
    ]
    df = pd.DataFrame(rows, columns=["entity", "paper", "paragraph"])
    return ray.data.from_pandas(df), {"paper": 4, "paragraph": 12}


def test_generate_cooccurrence_analysis_graph_and_tree(tmp_path):
    occ, counts = _occurrence_fixture()
    graphs, trees = generate_cooccurrence_analysis(
        occ, counts, factors=["paper"], communities=True,
        community_strategy="louvain", num_buckets=4, n_partitions=2,
        graph_dump_prefix=str(tmp_path / "dump"))
    g = graphs["paper"]
    nodes = g.nodes_df().set_index("@id")
    assert set(nodes.index) == {"a", "b", "c", "x", "y", "z"}
    # metrics + communities written back as node properties
    for col in ("degree_frequency", "pagerank_frequency",
                "community_frequency", "community_npmi", "paper_frequency"):
        assert col in nodes.columns, col
    assert nodes.loc["a", "paper_frequency"] == 3
    edges = g.edges_df()
    assert {"frequency", "ppmi", "npmi", "distance_npmi"} <= set(edges.columns)
    pair = edges.set_index(["@source_id", "@target_id"])
    assert pair.loc[("a", "c"), "frequency"] == 3
    # tree: spanning forest of the connected components; a-c must be in it
    t = trees["paper"].edges_df()
    tp = {frozenset((s, d)) for s, d in zip(t["@source_id"], t["@target_id"])}
    assert frozenset(("a", "c")) in tp
    n_nodes = len(nodes)
    assert len(t) < len(edges)  # strictly sparser than the graph
    assert len(t) <= n_nodes - 1
    # dumps exist and round-trip
    assert (tmp_path / "dump_paper_graph.json").exists()
    assert (tmp_path / "dump_paper_tree.json").exists()


def test_generate_cooccurrence_analysis_topk_and_filters():
    occ, counts = _occurrence_fixture()
    graphs, trees = generate_cooccurrence_analysis(
        occ, counts, factors=["paper"], n_most_frequent=3, keep={"z"},
        communities=False, remove_zero_mi=True, num_buckets=4,
        n_partitions=2)
    nodes = set(graphs["paper"].nodes_df()["@id"])
    # top-3 by paper_frequency (a:3, c:3, then b/z tie at 2 -> smallest
    # entity 'b' wins the deterministic tie-break) + kept 'z'
    assert nodes == {"a", "b", "c", "z"}
    edges = graphs["paper"].edges_df()
    assert (edges["ppmi"] > 0).all()


def test_hll_distinct_accuracy_and_merge_invariance():
    from bluegraph_ray.functions.sketches import (hll_distinct,
                                                  hll_registers)

    vals = pd.DataFrame({"v": [f"item-{i}" for i in range(10_000)]})
    ds = ray.data.from_pandas(vals)
    est = hll_distinct(ds, "v")
    assert abs(est - 10_000) / 10_000 < 0.05

    # duplicates don't move the estimate (set semantics)
    dup = ray.data.from_pandas(pd.concat([vals, vals, vals.head(500)]))
    assert hll_distinct(dup, "v") == est

    # block layout doesn't move the registers (max-merge is exact)
    r1 = hll_registers(ds, "v")
    r64 = hll_registers(ds.repartition(64), "v")
    assert np.array_equal(r1, r64)

    # small-range branch: tiny sets fall back to linear counting ~exactly
    small = ray.data.from_pandas(pd.DataFrame({"v": [f"s{i}" for i in range(40)]}))
    assert abs(hll_distinct(small, "v") - 40) < 3


def test_hll_group_distinct_matches_per_group_sketch():
    from bluegraph_ray.functions.sketches import (hll_distinct,
                                                  hll_group_distinct)

    df = pd.DataFrame({
        "k": ["a"] * 3000 + ["b"] * 700 + ["c"] * 20,
        "v": ([f"a-{i}" for i in range(3000)]
              + [f"b-{i % 350}" for i in range(700)]     # b has dups: 350
              + [f"c-{i}" for i in range(20)]),
    })
    ds = ray.data.from_pandas(df)
    out = hll_group_distinct(ds, "v", "k").set_index("k")
    # grouped sketch == running the global sketch on each group's subset
    for k in ("a", "b", "c"):
        sub = ray.data.from_pandas(df[df.k == k][["v"]])
        assert out.loc[k, "hll_estimate"] == round(hll_distinct(sub, "v"), 6)
    # and the estimates are accurate at these cardinalities
    for k, n in (("a", 3000), ("b", 350), ("c", 20)):
        assert abs(out.loc[k, "hll_estimate"] - n) / n < 0.08
    # layout invariance
    out2 = hll_group_distinct(ds.repartition(16), "v", "k").set_index("k")
    assert (out2["hll_estimate"] == out["hll_estimate"]).all()


def test_count_min_sketch_bounds_and_merge():
    from bluegraph_ray.functions.sketches import cms_query, cms_tables

    rng = np.random.default_rng(4)
    # zipf-ish frequencies over 500 items
    items = [f"k{i}" for i in range(500)]
    counts = {k: int(1000 / (i + 1)) + 1 for i, k in enumerate(items)}
    rows = [k for k, c in counts.items() for _ in range(c)]
    rng.shuffle(rows)
    ds = ray.data.from_pandas(pd.DataFrame({"v": rows}))
    tab = cms_tables(ds, "v")
    est = cms_query(tab, items)
    true = np.array([counts[k] for k in items])
    # CMS never underestimates, and overestimates stay within eps*N
    assert (est >= true).all()
    assert (est - true).max() <= max(4, 3 * len(rows) // (1 << 12))
    # block layout invariance (sum-combine is exact)
    tab2 = cms_tables(ds.repartition(16), "v")
    assert np.array_equal(tab, tab2)


def test_exact_quantiles_match_numpy():
    from bluegraph_ray.functions.quantiles import quantiles, value_histogram

    rng = np.random.default_rng(12)
    vals = np.round(rng.lognormal(3, 1, 5000), 1)
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals}))
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    out = quantiles(ds, "x", qs)
    srt = np.sort(vals)
    for q, v in zip(out["q"], out["value"]):
        want = srt[int(np.ceil(q * len(vals))) - 1]
        assert v == want
    hist = value_histogram(ds, "x")
    assert int(hist["n"].sum()) == len(vals)
    assert (np.diff(hist["value"].to_numpy()) > 0).all()
