"""Flagship end-to-end + synthetic-source invariants.

- generator determinism across parallelism (partition-independence)
- sha256(content) per-row invariant survives the pipeline
- flagship produces a consistent vertex table; PageRank on the produced edge
  table matches NetworkX at 1e-6
"""

from __future__ import annotations

import hashlib

import networkx as nx
import numpy as np
import pandas as pd
import pytest

import ray.data

from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

from bluegraph_ray.pipelines.flagship import run_flagship
from bluegraph_ray.sources.synthetic import (
    source_code_table,
    source_code_table_arrow,
    with_sha256,
)


def test_generator_deterministic_across_parallelism():
    a = source_code_table(500, seed=7, parallelism=2).to_pandas()
    b = source_code_table(500, seed=7, parallelism=8).to_pandas()
    # sort on ALL columns: paths alone aren't unique and Ray's streaming
    # executor returns blocks in completion order (preserve_order=False),
    # so a single-column sort leaves tie order nondeterministic
    cols = sorted(a.columns)
    a = a.sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = b.sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    c = source_code_table_arrow(500, seed=7).to_pandas()
    c = c.sort_values(cols, kind="mergesort").reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, c)


def test_sha256_invariant_through_pipeline():
    src = with_sha256(source_code_table(300, seed=3))
    out = src.to_pandas()
    for r in out.head(20).itertuples():
        assert r.content_sha256 == hashlib.sha256(r.content.encode()).hexdigest()
    # invariant column survives a downstream projection+filter pipeline
    kept = (
        src.filter(expr="lang == 'python'")
        .select_columns(["path", "content", "content_sha256"])
        .to_pandas()
    )
    for r in kept.itertuples():
        assert r.content_sha256 == hashlib.sha256(r.content.encode()).hexdigest()


@pytest.mark.slow
def test_flagship_end_to_end_matches_networkx(tmp_path):
    src = source_code_table(1500, seed=42)
    res = run_flagship(src, n_partitions=3, checkpoint_dir=str(tmp_path / "ck"),
                       graph_path=str(tmp_path / "g"))
    vt = res.vertex_table
    assert res.n == len(vt) > 0
    assert set(vt.columns) == {"node", "pagerank", "component", "community", "degree"}
    assert vt["pagerank"].sum() == pytest.approx(1.0, abs=1e-6)

    edges = res.edges.to_pandas()
    g = nx.Graph()
    for r in edges.itertuples():
        g.add_edge(r.src, r.dst, frequency=float(r.frequency))
    want = _pagerank_python(g, alpha=0.85, tol=1e-6, weight="frequency")
    got = dict(zip(vt["node"], vt["pagerank"]))
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-6)

    # components match networkx exactly
    nxc = {frozenset(c) for c in nx.connected_components(g)}
    ours: dict = {}
    for node, lab in zip(vt["node"], vt["component"]):
        ours.setdefault(lab, set()).add(node)
    # vertices in vt but with no edge can't happen (graph built from edges)
    assert {frozenset(v) for v in ours.values()} == nxc


def test_cli_flagship_and_pagerank(tmp_path, capsys):
    """`python -m bluegraph_ray` entrypoints (ray job submit surface): run
    both subcommands in-process against the session Ray; JSON line out,
    partitioned parquet written, pagerank output readable and stochastic."""
    import json

    from bluegraph_ray.__main__ import main

    out = tmp_path / "flag"
    rc = main([
        "flagship", "--synthetic", "300", "--factor", "repo",
        "--n-partitions", "4", "--num-buckets", "8",
        "--output", str(out),
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_vertices"] > 0 and rep["pagerank_iterations"] > 0
    edges = ray.data.read_parquet(str(out / "edges")).to_pandas()
    assert {"src", "dst", "frequency"} <= set(edges.columns) and len(edges) > 0

    pr_out = tmp_path / "pr"
    rc = main([
        "pagerank", "--edges", str(out / "edges"), "--weight", "frequency",
        "--n-partitions", "4", "--output", str(pr_out),
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["converged"] is True
    pr = ray.data.read_parquet(str(pr_out)).to_pandas()
    assert len(pr) == rep["n_vertices"]
    assert pr["pagerank"].sum() == pytest.approx(1.0, abs=1e-6)


def test_cli_pagerank_checkpoint_resume_identical(tmp_path, capsys):
    """A re-run with the same --checkpoint-dir resumes from the converged
    checkpoint and emits bitwise-identical pagerank output."""
    import json

    from bluegraph_ray.__main__ import main

    flag = tmp_path / "f"
    main(["flagship", "--synthetic", "200", "--n-partitions", "4",
          "--num-buckets", "8", "--output", str(flag)])
    capsys.readouterr()

    outs = []
    for name in ("pr1", "pr2"):
        rc = main([
            "pagerank", "--edges", str(flag / "edges"), "--weight", "frequency",
            "--n-partitions", "4", "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--output", str(tmp_path / name),
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["converged"] is True
        outs.append(ray.data.read_parquet(str(tmp_path / name)).to_pandas()
                    .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
