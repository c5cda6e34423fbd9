"""compute_all_node_metrics orchestration, metric write-back, similarity
processor surface, CC/LPA checkpoint resume."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pandas as pd
import pytest

import ray.data

from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

from bluegraph_ray.pgframe import ID, RayPGFrame
from bluegraph_ray.pipelines.simindex import NodeSimilarityProcessor, SimilarityProcessor
from bluegraph_ray.stages.build import build_graph
from bluegraph_ray.stages.components import connected_components
from bluegraph_ray.stages.lpa import label_propagation_communities
from bluegraph_ray.stages.metricsproc import compute_all_node_metrics, write_node_metric


def karate_df():
    g = nx.karate_club_graph()
    rng = np.random.default_rng(4)
    rows = [(f"n{u}", f"n{v}", float(rng.uniform(0.1, 1))) for u, v in g.edges()]
    return pd.DataFrame(rows, columns=["src", "dst", "mi"])


def test_compute_all_node_metrics_and_writeback():
    df = karate_df()
    ds = ray.data.from_pandas(df)
    out = compute_all_node_metrics(
        ds, degree_weights=[None, "mi"], pagerank_weights=["mi"], n_partitions=4
    )
    g = nx.Graph()
    for r in df.itertuples():
        g.add_edge(r.src, r.dst, mi=r.mi)
    want_deg = dict(g.degree())
    assert out["degree"][None] == want_deg
    want_pr = _pagerank_python(g, alpha=0.85, tol=1e-6, weight="mi")
    for k, v in want_pr.items():
        assert out["pagerank"]["mi"][k] == pytest.approx(v, abs=1e-6)

    frame = RayPGFrame(nodes=list(g.nodes), edges=list(g.edges))
    frame = write_node_metric(frame, out["pagerank"]["mi"], "pagerank")
    ndf = frame.nodes_df().set_index(ID)
    assert ndf.loc["n0", "pagerank"] == pytest.approx(want_pr["n0"], abs=1e-9)


def test_similarity_processor_exact():
    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((50, 16))
    proc = SimilarityProcessor(16, "cosine")
    proc.add(vecs, [f"p{i}" for i in range(50)])
    ids, scores = proc.query(vecs[:3], k=5)
    # nearest neighbour of a vector is itself under cosine
    assert [ids[i][0] for i in range(3)] == ["p0", "p1", "p2"]
    assert (np.diff(scores, axis=1) <= 1e-12).all()  # descending

    emb = pd.DataFrame({"node": [f"p{i}" for i in range(50)], "embedding": list(vecs)})
    nsp = NodeSimilarityProcessor(emb)
    sim = nsp.get_similar_nodes(["p0"], k=3)
    assert "p0" in sim and list(sim["p0"])[0] == "p0"

    with pytest.raises(ValueError):
        SimilarityProcessor(16, "bogus")
    with pytest.raises(ValueError):
        proc.add(np.zeros((2, 8)), ["a", "b"])


def test_cc_lpa_checkpoint_resume(tmp_path):
    df = karate_df()
    handle = build_graph(ray.data.from_pandas(df), weight="mi", directed=False,
                         n_partitions=3, path=str(tmp_path / "g"))
    fresh_cc = connected_components(handle)
    part_cc = connected_components(handle, max_iter=1,
                                   checkpoint_dir=str(tmp_path / "cc"),
                                   checkpoint_every=1)
    assert not part_cc.converged
    resumed_cc = connected_components(handle, checkpoint_dir=str(tmp_path / "cc"),
                                      checkpoint_every=1, resume=True)
    np.testing.assert_array_equal(fresh_cc.values, resumed_cc.values)

    fresh_lpa = label_propagation_communities(handle)
    part = label_propagation_communities(handle, max_iter=1,
                                         checkpoint_dir=str(tmp_path / "lp"),
                                         checkpoint_every=1)
    resumed = label_propagation_communities(handle, checkpoint_dir=str(tmp_path / "lp"),
                                            checkpoint_every=1, resume=True)
    np.testing.assert_array_equal(fresh_lpa.values, resumed.values)


def test_embedding_pipeline_fit_query_save_load(tmp_path):
    """EmbeddingPipeline lifecycle (reference downstream/pipelines.py:27-240):
    fit -> full embedding table -> similar-point queries -> save/load round
    trip; deterministic across reruns at fixed n_partitions."""
    import networkx as nx

    from bluegraph_ray.pipelines.embedpipe import EmbeddingPipeline, PropagationEmbedder

    g = nx.karate_club_graph()
    df = pd.DataFrame([(f"n{u}", f"n{v}") for u, v in g.edges()],
                      columns=["src", "dst"])
    ds = ray.data.from_pandas(df)

    pipe = EmbeddingPipeline(embedder=PropagationEmbedder(dimension=16, iters=3, seed=5))
    pipe.run_fitting(ds, n_partitions=4)
    assert len(pipe.embeddings) == g.number_of_nodes()
    assert all(len(e) == 16 for e in pipe.embeddings["embedding"])

    # transductive contract: every node retrievable, unknown -> None
    vecs = pipe.retrieve_embeddings(["n0", "nope"])
    assert vecs[0] is not None and vecs[1] is None

    sim = pipe.get_similar_points(["n0", "n33"], k=5)
    assert set(sim) == {"n0", "n33"} and all(len(v) == 5 for v in sim.values())
    # self is its own nearest neighbour under cosine
    assert sim["n0"][0] == "n0"

    # determinism: rerun equals first run
    pipe2 = EmbeddingPipeline(embedder=PropagationEmbedder(dimension=16, iters=3, seed=5))
    pipe2.run_fitting(ds, n_partitions=4)
    a = np.stack(pipe.embeddings.sort_values("node")["embedding"].to_numpy())
    b = np.stack(pipe2.embeddings.sort_values("node")["embedding"].to_numpy())
    np.testing.assert_array_equal(a, b)

    # save/load round trip preserves embeddings and query results
    p = str(tmp_path / "pipe")
    pipe.save(p)
    loaded = EmbeddingPipeline.load(p)
    np.testing.assert_array_equal(
        np.stack(loaded.embeddings.sort_values("node")["embedding"].to_numpy()), a)
    assert loaded.get_similar_points(["n0"], k=5) == {"n0": sim["n0"]}


def test_ppmi_svd_text_embedder_topics_and_roundtrip(tmp_path):
    """PPMI-SVD text embedder (the trainable-text-model slot the reference
    fills with Doc2Vec, preprocess/utils.py:102-158): two-topic corpus ->
    within-topic cosine far above cross-topic; deterministic; doc vectors
    separate the topics; full EmbeddingPipeline save/load round trip."""
    from bluegraph_ray.pipelines.embedpipe import EmbeddingPipeline
    from bluegraph_ray.pipelines.textembed import PPMISVDEmbedder

    rng = np.random.default_rng(3)
    animals = ["cat", "dog", "mouse", "horse", "cow", "sheep"]
    tech = ["cpu", "gpu", "ram", "disk", "cache", "bus"]
    docs = [" ".join(rng.choice(animals if i % 2 == 0 else tech, 30))
            for i in range(200)]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs}))

    pipe = EmbeddingPipeline(embedder=PPMISVDEmbedder(dimension=8, window=2,
                                                      seed=0))
    pipe.run_fitting(ds)
    assert set(pipe.embeddings["node"]) == set(animals) | set(tech)

    mat = np.stack(pipe.embeddings["embedding"].to_numpy())
    m = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    wi = {w: i for i, w in enumerate(pipe.embeddings["node"])}
    sims = m @ m.T
    within = np.mean([sims[wi[a], wi[b]] for a in animals for b in animals
                      if a != b])
    cross = np.mean([sims[wi[a], wi[b]] for a in animals for b in tech])
    assert within > cross + 0.5

    # neighbors sane: a word's top-2 neighbours share its topic
    nbrs = pipe.get_similar_points(["cat", "gpu"], k=3)
    assert set(nbrs["cat"][1:]) <= set(animals)
    assert set(nbrs["gpu"][1:]) <= set(tech)

    # determinism
    emb2 = PPMISVDEmbedder(dimension=8, window=2, seed=0)
    tab2 = emb2.fit_model(ds)
    np.testing.assert_allclose(np.stack(tab2["embedding"].to_numpy()), mat)

    # doc-level inference separates topics
    dvec = emb2.doc_embeddings(ds).to_pandas().sort_values("doc_id")
    dm = np.stack(dvec["embedding"].to_numpy())
    dm = dm / np.maximum(np.linalg.norm(dm, axis=1, keepdims=True), 1e-12)
    da, dt = dm[::2].mean(0), dm[1::2].mean(0)
    assert da @ dt / (np.linalg.norm(da) * np.linalg.norm(dt)) < 0.5

    # save/load round trip restores the right embedder class + vectors
    p = str(tmp_path / "tpipe")
    pipe.save(p)
    loaded = EmbeddingPipeline.load(p)
    assert isinstance(loaded.embedder, PPMISVDEmbedder)
    np.testing.assert_array_equal(
        np.stack(loaded.embeddings.sort_values("node")["embedding"].to_numpy()),
        np.stack(pipe.embeddings.sort_values("node")["embedding"].to_numpy()))
