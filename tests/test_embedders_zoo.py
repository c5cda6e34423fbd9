"""From-scratch model-zoo embedders (the reference's gensim/stellargraph
slot): Poincaré hierarchy embeddings, and the KGE / feature-encoder family
added alongside them. Reference surfaces:
``backends/gensim/embed/embedders.py:30-93`` (poincare),
``backends/stellargraph/embed/embedders.py:49-57`` (node2vec, attri2vec,
graphsage, DGI, complex/distmult).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bluegraph_ray.pipelines.hyperbolic import (poincare_distance,
                                                poincare_embeddings)


def _tree_edges(branching=3, depth=3):
    """Balanced tree as (child -> parent) directed edges, string ids."""
    edges = []
    frontier = ["root"]
    for level in range(depth):
        nxt = []
        for parent in frontier:
            for i in range(branching):
                child = f"{parent}/{i}"
                edges.append((child, parent))
                nxt.append(child)
        frontier = nxt
    return pd.DataFrame(edges, columns=["src", "dst"])


def test_poincare_distance_formula():
    z = np.zeros(4)
    assert poincare_distance(z, z) == pytest.approx(0.0)
    u = np.array([0.3, 0.0, 0.0, 0.0])
    v = np.array([-0.4, 0.1, 0.0, 0.0])
    # hand formula
    num = 2 * np.sum((u - v) ** 2)
    den = (1 - u @ u) * (1 - v @ v)
    want = float(np.arccosh(1 + num / den))
    assert poincare_distance(u, v) == pytest.approx(want, rel=1e-12)
    assert poincare_distance(v, u) == pytest.approx(want, rel=1e-12)
    # broadcasting over a candidate axis
    x = np.stack([u, v, z])
    d = poincare_distance(u[None, :], x)
    assert d.shape == (3,)
    assert d[0] == pytest.approx(0.0)


def test_poincare_rejects_undirected():
    with pytest.raises(ValueError, match="directed"):
        poincare_embeddings(_tree_edges(), directed=False)


def test_poincare_max_nodes_guard():
    with pytest.raises(ValueError, match="max_nodes"):
        poincare_embeddings(_tree_edges(), max_nodes=3)


def test_poincare_deterministic_in_ball_and_reconstructs_tree():
    edges = _tree_edges(branching=3, depth=3)
    out = poincare_embeddings(edges, dimension=8, epochs=60, negative=8,
                              seed=3, batch_size=64)
    names = out["@id"].to_numpy()
    mat = np.stack(out["embedding"].to_numpy())
    n = len(names)
    assert n == 1 + 3 + 9 + 27
    assert sorted(names) == list(names)  # sorted, stable output order
    # open unit ball
    assert np.all(np.linalg.norm(mat, axis=1) < 1.0)
    # deterministic under the same seed, different under another
    out2 = poincare_embeddings(edges, dimension=8, epochs=60, negative=8,
                               seed=3, batch_size=64)
    assert np.array_equal(mat, np.stack(out2["embedding"].to_numpy()))
    out3 = poincare_embeddings(edges, dimension=8, epochs=60, negative=8,
                               seed=4, batch_size=64)
    assert not np.array_equal(mat, np.stack(out3["embedding"].to_numpy()))

    # reconstruction: for each edge (child, parent), rank of the true parent
    # under Poincaré distance among all other nodes (Nickel & Kiela's mean
    # rank metric) should beat the random baseline (~n/2) by a wide margin.
    pos = {name: i for i, name in enumerate(names)}
    ranks = []
    for child, parent in _tree_edges(3, 3).itertuples(index=False):
        u = mat[pos[child]]
        d = poincare_distance(u[None, :], mat)
        d[pos[child]] = np.inf
        ranks.append(int(np.sum(d < d[pos[parent]])) + 1)
    assert np.mean(ranks) < n / 4

    # hierarchy norm property: the root sits nearer the origin than leaves
    root_norm = np.linalg.norm(mat[pos["root"]])
    leaf_norms = [np.linalg.norm(mat[pos[nm]]) for nm in names
                  if nm.count("/") == 3]
    assert root_norm < np.mean(leaf_norms)


def test_poincare_dataset_input_path():
    import ray

    edges = _tree_edges(branching=2, depth=2)
    # duplicate rows on purpose: the Dataset path must dedupe distributed
    ds = ray.data.from_pandas(pd.concat([edges, edges], ignore_index=True))
    out = poincare_embeddings(ds, dimension=4, epochs=5, num_buckets=4)
    assert len(out) == 1 + 2 + 4
    out_pd = poincare_embeddings(edges, dimension=4, epochs=5)
    assert np.array_equal(np.stack(out["embedding"].to_numpy()),
                          np.stack(out_pd["embedding"].to_numpy()))


def test_poincare_empty_edges():
    out = poincare_embeddings(pd.DataFrame({"src": [], "dst": []}),
                              dimension=4)
    assert len(out) == 0


# ---------------------------------------------------------------------------
# KGE: DistMult / ComplEx (pipelines/kge.py)
# ---------------------------------------------------------------------------

from bluegraph_ray.pipelines.kge import (kge_embeddings, kge_score,
                                         score_triples)


def test_kge_score_formulas():
    rng = np.random.default_rng(0)
    es, wr, eo = rng.normal(size=(3, 6)), rng.normal(size=(3, 6)), \
        rng.normal(size=(3, 6))
    want = np.sum(es * wr * eo, axis=-1)
    assert np.allclose(kge_score("distmult", es, wr, eo), want)
    # DistMult is exactly symmetric in (s, o)
    assert np.allclose(kge_score("distmult", es, wr, eo),
                       kge_score("distmult", eo, wr, es))
    # ComplEx: Re(<s, r, conj(o)>) with [real | imag] layout
    s = es[:, :3] + 1j * es[:, 3:]
    r = wr[:, :3] + 1j * wr[:, 3:]
    o = eo[:, :3] + 1j * eo[:, 3:]
    want_c = np.real(np.sum(s * r * np.conj(o), axis=-1))
    assert np.allclose(kge_score("complex", es, wr, eo), want_c)
    # and is NOT symmetric in general
    assert not np.allclose(kge_score("complex", es, wr, eo),
                           kge_score("complex", eo, wr, es))


def test_kge_validation():
    t = pd.DataFrame({"src": ["a"], "rel": ["r"], "dst": ["b"]})
    with pytest.raises(ValueError, match="unknown KGE model"):
        kge_embeddings(t, model="transformer")
    with pytest.raises(ValueError, match="even dimension"):
        kge_embeddings(t, model="complex", dimension=5)
    with pytest.raises(ValueError, match="max_triples"):
        kge_embeddings(pd.concat([t.assign(dst=f"b{i}") for i in range(9)]),
                       max_triples=4)


def _group_kg(groups=3, size=6):
    rows = []
    for g in range(groups):
        members = [f"e{g}_{i}" for i in range(size)]
        for a in members:
            for b in members:
                if a != b:
                    rows.append((a, "same_group", b))
    return pd.DataFrame(rows, columns=["src", "rel", "dst"])


def test_distmult_learns_group_structure():
    kg = _group_kg()
    fit = kge_embeddings(kg, model="distmult", dimension=16, epochs=150,
                         negative=6, seed=1, batch_size=64)
    assert fit["model"] == "distmult"
    assert list(fit["relations"]["@id"]) == ["same_group"]
    # deterministic
    fit2 = kge_embeddings(kg, model="distmult", dimension=16, epochs=150,
                          negative=6, seed=1, batch_size=64)
    assert np.array_equal(np.stack(fit["nodes"]["embedding"].to_numpy()),
                          np.stack(fit2["nodes"]["embedding"].to_numpy()))
    # AUC: intra-group positives vs cross-group negatives
    pos = score_triples(kg, fit)["score"].to_numpy()
    rng = np.random.default_rng(0)
    ents = fit["nodes"]["@id"].to_numpy()
    groups = {e: e.split("_")[0] for e in ents}
    neg_rows = []
    while len(neg_rows) < 200:
        a, b = rng.choice(ents, 2, replace=False)
        if groups[a] != groups[b]:
            neg_rows.append((a, "same_group", b))
    neg = score_triples(
        pd.DataFrame(neg_rows, columns=["src", "rel", "dst"]), fit
    )["score"].to_numpy()
    auc = np.mean(pos[:, None] > neg[None, :])
    assert auc > 0.9


def test_complex_learns_antisymmetric_cycle():
    n = 20
    kg = pd.DataFrame({"src": [f"v{i}" for i in range(n)],
                       "rel": "next",
                       "dst": [f"v{(i + 1) % n}" for i in range(n)]})
    fit = kge_embeddings(kg, model="complex", dimension=32, epochs=800,
                         negative=8, seed=2, batch_size=32,
                         learning_rate=0.05)
    fwd = score_triples(kg, fit)["score"].to_numpy()
    rev = score_triples(kg.rename(columns={"src": "dst", "dst": "src"}),
                        fit)["score"].to_numpy()
    # antisymmetric relation: trained direction dominates the reverse
    assert np.mean(fwd) > np.mean(rev) + 1.0
    assert np.mean(fwd[:, None] > rev[None, :]) > 0.85


def test_score_triples_distributed_matches_local():
    import ray

    kg = _group_kg(groups=2, size=4)
    fit = kge_embeddings(kg, model="complex", dimension=8, epochs=20,
                         seed=0, batch_size=32)
    local = score_triples(kg, fit)
    dist = score_triples(ray.data.from_pandas(kg), fit).to_pandas()
    merged = local.merge(dist, on=["src", "rel", "dst"],
                         suffixes=("_l", "_d"))
    assert len(merged) == len(kg)
    assert np.allclose(merged["score_l"], merged["score_d"])
    # unknown entity scores NaN, not an error
    unk = score_triples(pd.DataFrame(
        {"src": ["nope"], "rel": ["same_group"], "dst": ["e0_0"]}), fit)
    assert np.isnan(unk["score"]).all()


def test_kge_dataset_input_and_empty():
    import ray

    kg = _group_kg(groups=2, size=3)
    ds = ray.data.from_pandas(pd.concat([kg, kg], ignore_index=True))
    fit = kge_embeddings(ds, model="distmult", dimension=8, epochs=3,
                         num_buckets=4, seed=5)
    fit_pd = kge_embeddings(kg, model="distmult", dimension=8, epochs=3,
                            seed=5)
    assert np.array_equal(np.stack(fit["nodes"]["embedding"].to_numpy()),
                          np.stack(fit_pd["nodes"]["embedding"].to_numpy()))
    empty = kge_embeddings(pd.DataFrame({"src": [], "rel": [], "dst": []}))
    assert len(empty["nodes"]) == 0 and len(empty["relations"]) == 0


# ---------------------------------------------------------------------------
# Inductive encoders: attri2vec / GraphSAGE-mean / DGI (pipelines/sage.py)
# ---------------------------------------------------------------------------

from bluegraph_ray.pipelines.sage import (attri2vec_fit, dgi_fit,
                                          embed_batches, graphsage_fit,
                                          mean_neighbor_features)


def _two_clusters(size=8):
    """Two dense clusters (ring + chords) joined by one bridge; features
    carry the cluster signal plus deterministic noise."""
    nodes, edges = [], []
    for tag in ("a", "b"):
        mem = [f"{tag}{i}" for i in range(size)]
        nodes += mem
        for i in range(size):
            edges.append((mem[i], mem[(i + 1) % size]))
            edges.append((mem[i], mem[(i + 3) % size]))
    edges.append(("a0", "b0"))
    rng = np.random.default_rng(42)
    feats = pd.DataFrame({
        "node": nodes,
        "f0": [1.0 if n[0] == "a" else 0.0 for n in nodes],
        "f1": [0.0 if n[0] == "a" else 1.0 for n in nodes],
        "f2": rng.normal(0, 0.1, len(nodes)),
        "f3": rng.normal(0, 0.1, len(nodes)),
    })
    e = pd.DataFrame(edges, columns=["src", "dst"])
    e = pd.DataFrame({  # canonical undirected form, no multi-edges
        "src": np.minimum(e["src"], e["dst"]),
        "dst": np.maximum(e["src"], e["dst"]),
    }).drop_duplicates().reset_index(drop=True)
    pairs = pd.concat([
        e.rename(columns={"src": "center", "dst": "context"}),
        e.rename(columns={"src": "context", "dst": "center"}),
    ], ignore_index=True).assign(n=1)
    return feats, e, pairs


def _intra_minus_inter(emb_df):
    mat = np.stack(emb_df["embedding"].to_numpy())
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                            1e-12)
    names = emb_df.iloc[:, 0].to_numpy()
    a = norm[[n[0] == "a" for n in names]]
    b = norm[[n[0] == "b" for n in names]]
    intra = (np.mean(a @ a.T) + np.mean(b @ b.T)) / 2
    inter = np.mean(a @ b.T)
    return intra - inter


def test_mean_neighbor_features_local_and_distributed():
    import ray

    feats, e, _ = _two_clusters(4)
    local = mean_neighbor_features(e, feats).sort_values(
        "node").reset_index(drop=True)
    # hand check one node: a0's neighbors (undirected)
    nbrs = set()
    for s, d in e.itertuples(index=False):
        if s == "a0":
            nbrs.add(d)
        if d == "a0":
            nbrs.add(s)
    want = feats[feats["node"].isin(nbrs)][["f0", "f1", "f2", "f3"]].mean()
    got = local[local["node"] == "a0"].iloc[0]
    assert np.allclose(got[["f0", "f1", "f2", "f3"]].astype(float),
                       want.to_numpy())
    dist = mean_neighbor_features(
        ray.data.from_pandas(e), ray.data.from_pandas(feats),
        num_buckets=4).to_pandas().sort_values("node").reset_index(drop=True)
    assert np.allclose(local[["f0", "f1", "f2", "f3"]].to_numpy(),
                       dist[["f0", "f1", "f2", "f3"]].to_numpy())
    assert list(local["node"]) == list(dist["node"])


def test_attri2vec_separates_clusters_and_is_inductive():
    feats, _, pairs = _two_clusters()
    fit = attri2vec_fit(feats, pairs, dimension=8, epochs=200, seed=1,
                        batch_size=32, learning_rate=0.5, negative=8)
    assert _intra_minus_inter(fit["nodes"]) > 0.25
    fit2 = attri2vec_fit(feats, pairs, dimension=8, epochs=200, seed=1,
                         batch_size=32, learning_rate=0.5, negative=8)
    assert np.array_equal(np.stack(fit["nodes"]["embedding"].to_numpy()),
                          np.stack(fit2["nodes"]["embedding"].to_numpy()))
    # inductive: a NEVER-SEEN node with cluster-a features embeds nearer
    # the a-centroid than the b-centroid
    new = pd.DataFrame({"node": ["fresh"], "f0": [1.0], "f1": [0.0],
                        "f2": [0.05], "f3": [-0.02]})
    h = np.stack(embed_batches(new, fit)["embedding"].to_numpy())[0]
    mat = np.stack(fit["nodes"]["embedding"].to_numpy())
    names = fit["nodes"]["node"].to_numpy()
    ca = mat[[n[0] == "a" for n in names]].mean(axis=0)
    cb = mat[[n[0] == "b" for n in names]].mean(axis=0)
    assert np.linalg.norm(h - ca) < np.linalg.norm(h - cb)


def test_graphsage_distributed_inference_matches_fit():
    import ray

    feats, e, pairs = _two_clusters()
    fit = graphsage_fit(feats, e, pairs, dimension=8, epochs=60, seed=3,
                        batch_size=32, learning_rate=0.1)
    assert _intra_minus_inter(fit["nodes"]) > 1.0
    # the distributed path (mean_neighbor_features + embed_batches) must
    # reproduce the trainer's own embeddings for every training node
    agg = mean_neighbor_features(
        ray.data.from_pandas(e), ray.data.from_pandas(feats),
        num_buckets=4).to_pandas()
    agg = agg.rename(columns={c: f"agg_{c}" for c in ("f0", "f1", "f2",
                                                      "f3")})
    rows = feats.merge(agg, on="node")
    out = embed_batches(ray.data.from_pandas(rows), fit).to_pandas()
    merged = fit["nodes"].merge(out, on="node", suffixes=("_fit", "_inf"))
    assert len(merged) == len(feats)
    a = np.stack(merged["embedding_fit"].to_numpy())
    b = np.stack(merged["embedding_inf"].to_numpy())
    assert np.allclose(a, b, atol=1e-12)


def test_dgi_discriminates_real_from_corrupted():
    from bluegraph_ray.pipelines.sage import (_mean_agg, _sage_inputs,
                                              _stable_sigmoid)

    feats, e, _ = _two_clusters()
    fit = dgi_fit(feats, e, dimension=8, epochs=200, seed=4,
                  learning_rate=0.1)
    names = fit["nodes"]["node"].to_numpy()
    X = feats.sort_values("node")[["f0", "f1", "f2", "f3"]].to_numpy()
    si, di = _sage_inputs(X, names, e, "src", "dst", True)
    Z = np.concatenate([X, _mean_agg(X, si, di, len(X))], axis=1)
    H = np.maximum(Z @ fit["W"], 0.0)
    s = _stable_sigmoid(H.mean(axis=0))
    rng = np.random.default_rng(99)  # fresh corruption, not a training draw
    Xc = X[rng.permutation(len(X))]
    Zc = np.concatenate([Xc, _mean_agg(Xc, si, di, len(X))], axis=1)
    Hc = np.maximum(Zc @ fit["W"], 0.0)
    d_real = _stable_sigmoid(H @ (fit["M"] @ s))
    d_fake = _stable_sigmoid(Hc @ (fit["M"] @ s))
    assert d_real.mean() > d_fake.mean() + 0.2
    # deterministic
    fit2 = dgi_fit(feats, e, dimension=8, epochs=200, seed=4,
                   learning_rate=0.1)
    assert np.array_equal(np.stack(fit["nodes"]["embedding"].to_numpy()),
                          np.stack(fit2["nodes"]["embedding"].to_numpy()))


def test_sage_guards():
    feats, e, pairs = _two_clusters(4)
    with pytest.raises(ValueError, match="max_nodes"):
        attri2vec_fit(feats, pairs, max_nodes=3)
    with pytest.raises(ValueError, match="pairs > max_pairs"):
        attri2vec_fit(feats, pairs, max_pairs=3)
    with pytest.raises(ValueError, match="duplicate node"):
        attri2vec_fit(pd.concat([feats, feats]), pairs)


# ---------------------------------------------------------------------------
# DGI gcn encoder + Watch Your Step
# ---------------------------------------------------------------------------


def test_dgi_gcn_encoder_variant():
    from bluegraph_ray.pipelines.sage import (_gcn_agg, _sage_inputs,
                                              _stable_sigmoid, dgi_fit)

    feats, e, _ = _two_clusters()
    fit = dgi_fit(feats, e, dimension=8, epochs=200, seed=4,
                  learning_rate=0.1, encoder="gcn")
    assert fit["encoder"] == "gcn"
    assert fit["W"].shape == (4, 8)  # d_in, not 2*d_in
    names = fit["nodes"]["node"].to_numpy()
    X = feats.sort_values("node")[["f0", "f1", "f2", "f3"]].to_numpy()
    si, di = _sage_inputs(X, names, e, "src", "dst", True)
    Z = _gcn_agg(X, si, di, len(X))
    H = np.maximum(Z @ fit["W"], 0.0)
    s = _stable_sigmoid(H.mean(axis=0))
    rng = np.random.default_rng(99)
    Zc = _gcn_agg(X[rng.permutation(len(X))], si, di, len(X))
    Hc = np.maximum(Zc @ fit["W"], 0.0)
    d_real = _stable_sigmoid(H @ (fit["M"] @ s))
    d_fake = _stable_sigmoid(Hc @ (fit["M"] @ s))
    assert d_real.mean() > d_fake.mean() + 0.2
    with pytest.raises(ValueError, match="unknown DGI encoder"):
        dgi_fit(feats, e, encoder="gat")


def test_gcn_agg_matches_dense_formula():
    from bluegraph_ray.pipelines.sage import _gcn_agg, _sage_inputs

    feats, e, _ = _two_clusters(4)
    X = feats.sort_values("node")[["f0", "f1", "f2", "f3"]].to_numpy()
    names = np.sort(feats["node"].to_numpy())
    si, di = _sage_inputs(X, names, e, "src", "dst", True)
    n = len(X)
    A = np.zeros((n, n))
    A[si, di] = 1.0
    A += np.eye(n)
    dinv = 1.0 / np.sqrt(A.sum(axis=1))
    want = (dinv[:, None] * A * dinv[None, :]) @ X
    assert np.allclose(_gcn_agg(X, si, di, n), want)


def test_watchyourstep_two_clusters():
    from bluegraph_ray.pipelines.graphembed import watchyourstep_embeddings

    _, e, _ = _two_clusters()
    out = watchyourstep_embeddings(e, dimension=16, window=3, epochs=150,
                                   seed=0)
    assert out["attention"].shape == (3,)
    assert out["attention"].sum() == pytest.approx(1.0)
    assert np.all(out["attention"] > 0)
    assert _intra_minus_inter(out["nodes"]) > 0.5
    out2 = watchyourstep_embeddings(e, dimension=16, window=3, epochs=150,
                                    seed=0)
    assert np.array_equal(np.stack(out["nodes"]["embedding"].to_numpy()),
                          np.stack(out2["nodes"]["embedding"].to_numpy()))
    with pytest.raises(ValueError, match="max_nodes"):
        watchyourstep_embeddings(e, max_nodes=3)


def test_fastrp_matches_dense_replicate(tmp_path):
    """FastRP supersteps == the dense D^-1 A propagation with hash init,
    per-step L2 row normalization and weighted accumulation."""
    import ray

    from bluegraph_ray.pipelines.graphembed import fastrp_embeddings
    from bluegraph_ray.stages.build import (_WALK_C1, _WALK_C2, _WALK_C3,
                                            _WALK_C4, build_graph)

    rng = np.random.default_rng(3)
    src = rng.integers(0, 30, 120)
    dst = rng.integers(0, 30, 120)
    keep = src != dst
    df = pd.DataFrame({
        "src": [f"v{int(s):02d}" for s in src[keep]],
        "dst": [f"v{int(d):02d}" for d in dst[keep]],
        "w": rng.integers(1, 5, int(keep.sum())).astype(np.int64),
    }).drop_duplicates(["src", "dst"])
    handle = build_graph(ray.data.from_pandas(df), weight="w",
                         directed=False, n_partitions=4,
                         path=str(tmp_path / "g"))
    weights = (1.0, 0.5, 0.25)
    got = fastrp_embeddings(handle, dimension=6, iteration_weights=weights,
                            seed=11)
    names = np.asarray(handle.names)
    assert list(got["node"]) == list(names)

    # dense replicate over the same dense-id order
    n, d = len(names), 6
    pos = pd.Index(names)
    A = np.zeros((n, n))
    si = pos.get_indexer(df["src"])
    di = pos.get_indexer(df["dst"])
    # undirected build folds (src,dst)+(dst,src); duplicate pairs sum
    np.add.at(A, (si, di), df["w"].to_numpy().astype(float))
    np.add.at(A, (di, si), df["w"].to_numpy().astype(float))
    did = np.arange(n, dtype=np.uint64)
    X = np.zeros((n, d))
    with np.errstate(over="ignore"):
        for k in range(d):
            h = ((did * _WALK_C1) ^ (np.uint64(k + 11) * _WALK_C2)
                 ^ (did * _WALK_C3)) * _WALK_C4
            r = h % np.uint64(6)
            X[:, k] = np.where(r == 0, np.sqrt(3.0),
                               np.where(r == 1, -np.sqrt(3.0), 0.0))
    inw = A.sum(axis=0)
    want = np.zeros_like(X)
    for wt in weights:
        X = (A.T @ X) / np.maximum(inw, 1e-300)[:, None]
        nrm = np.sqrt((X * X).sum(axis=1))
        X /= np.where(nrm > 0, nrm, 1.0)[:, None]
        want += wt * X
    emb = np.stack(got["embedding"].to_numpy())
    assert np.allclose(emb, want, atol=1e-12)
    # deterministic across runs / partition counts
    h2 = build_graph(ray.data.from_pandas(df), weight="w", directed=False,
                     n_partitions=2, path=str(tmp_path / "g2"))
    got2 = fastrp_embeddings(h2, dimension=6, iteration_weights=weights,
                             seed=11)
    assert np.allclose(np.stack(got2["embedding"].to_numpy()), emb,
                       atol=1e-12)


def test_mean_neighbor_exact_decimal_bitwise_stable_under_block_order():
    """round-4 driver regression: with exact_decimal_scales + round_to the
    mean must be BITWISE identical regardless of how blocks/rows are
    ordered (int64 micro-unit sums, one ratio-rounded division) — and must
    land on the half-even side of true ties (1615/3200 = .5046875 → .504688,
    where float np.round flips down)."""
    import ray

    rng = np.random.default_rng(7)
    n_nodes = 40
    nodes = np.arange(n_nodes)
    # cents-valued feature => exact decimals at scale 100
    feats = pd.DataFrame({
        "node": nodes,
        "price": rng.integers(1, 10_000, n_nodes) / 100.0,
    })
    e = pd.DataFrame({
        "src": rng.integers(0, n_nodes, 600),
        "dst": rng.integers(0, n_nodes, 600),
    })
    e = e[e.src != e.dst].reset_index(drop=True)

    def run(edf, fdf, nb):
        return mean_neighbor_features(
            ray.data.from_pandas(edf, override_num_blocks=nb),
            ray.data.from_pandas(fdf),
            exact_decimal_scales={"price": 100}, round_to=6,
            num_buckets=nb,
        ).to_pandas().sort_values("node").reset_index(drop=True)

    base = run(e, feats, 2)
    shuf = run(e.sample(frac=1.0, random_state=3).reset_index(drop=True),
               feats, 5)
    assert list(base["node"]) == list(shuf["node"])
    assert (base["price"].to_numpy() == shuf["price"].to_numpy()).all()

    # local pandas path agrees bitwise with the distributed path
    local = mean_neighbor_features(
        e, feats, exact_decimal_scales={"price": 100}, round_to=6,
    ).sort_values("node").reset_index(drop=True)
    assert (local["price"].to_numpy() == base["price"].to_numpy()).all()

    # the exact-tie regression case itself
    from bluegraph_ray.util import round_ratio_even
    assert round_ratio_even(np.array([1615]), np.array([3200]))[0] == 0.504688
    assert round_ratio_even(np.array([-1585]), np.array([3200]))[0] == -0.495312


def test_single_step_trainer_oracles_deterministic_under_block_order():
    """attri2vec_step / distmult_step are the SQL-checkable single-step
    trainers: their int64-quantized gradient folds must be bitwise
    identical under any input block layout (that's the whole point of the
    micro-unit quantization)."""
    import ray

    from bluegraph_ray.pipelines.kge import distmult_step
    from bluegraph_ray.pipelines.sage import attri2vec_step

    rng = np.random.default_rng(9)
    n = 30
    feats = pd.DataFrame({
        "node": np.arange(n, dtype=np.int64),
        "f0": rng.integers(0, 1000, n) / 100.0,
        "f1": rng.integers(0, 50, n) / 50.0,
    })
    e = pd.DataFrame({
        "center": rng.integers(0, n, 300),
        "context": rng.integers(0, n, 300),
    })
    e = e[e.center != e.context].reset_index(drop=True)
    W0 = np.round(np.random.default_rng(5).normal(0, 0.5, (2, 4)), 4)

    def run_a2v(nb):
        return attri2vec_step(
            feats, ray.data.from_pandas(e, override_num_blocks=nb),
            W0=W0, negative=2, num_buckets=4,
        ).to_pandas().sort_values("node").reset_index(drop=True)

    a, b = run_a2v(1), run_a2v(5)
    assert a["node"].tolist() == b["node"].tolist()
    for j in range(4):
        assert (a[f"c_{j}"].to_numpy() == b[f"c_{j}"].to_numpy()).all()
    # gradients are nonzero somewhere (the step did something)
    assert np.abs(a[[f"c_{j}" for j in range(4)]].to_numpy()).max() > 0

    trip = pd.DataFrame({
        "src": [f"s{i % 7}" for i in range(60)],
        "rel": [f"r{i % 2}" for i in range(60)],
        "dst": [f"o{i % 11}" for i in range(60)],
    }).drop_duplicates().reset_index(drop=True)

    def run_kge(nb):
        return distmult_step(
            ray.data.from_pandas(trip, override_num_blocks=nb),
            negative=2, num_buckets=4,
        ).to_pandas().sort_values("node").reset_index(drop=True)

    a, b = run_kge(1), run_kge(4)
    assert a["node"].tolist() == b["node"].tolist()
    for j in range(4):
        assert (a[f"c_{j}"].to_numpy() == b[f"c_{j}"].to_numpy()).all()
    assert np.abs(a[[f"c_{j}" for j in range(4)]].to_numpy()).max() > 0
