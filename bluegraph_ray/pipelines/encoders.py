"""Feature encoders — fit/transform preprocessing over Dataset columns.

Re-derives the reference's ScikitLearnPGEncoder capabilities
(/root/reference/bluegraph/preprocess/encoders.py:412-572) without sklearn
(not in this container), Ray-Data-first:

- fit = a distributed aggregate (distinct values / document frequencies /
  moments) collected once to the driver;
- transform = a stateless ``map_batches`` with the fitted state broadcast via
  ``ray.put`` (an actor pool only pays off when the state is heavy — pass
  ``concurrency`` to opt in);
- ``concat_features`` is the reference's row-wise ``aggregate_properties``
  (/root/reference/bluegraph/core/io.py:1115-1131) — a pure per-row op.

Encoders:
- :class:`MultiLabelBinarizerEncoder` — set-valued category cells -> 0/1
  vector (encoders.py:518-522);
- :class:`TfIdfEncoder` — token tf-idf with sublinear tf and max_features,
  the semantics of the reference's ``TfidfVectorizer`` wrapper
  (/root/reference/bluegraph/preprocess/utils.py:80-99); fit computes
  document frequencies as a distributed hash aggregate;
- :class:`StandardScalerEncoder` — (x - mean) / std with optional mean
  imputation (encoders.py:549-569);
- :class:`PCAReducer` — exact eigendecomposition of the feature covariance
  (numpy ``eigh``; covariance accumulated distributed per batch), standing in
  for encoders.py:202-220.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

import ray
import ray.data

from bluegraph_ray.functions.setops import normalize_to_set

_TOKEN = re.compile(r"[A-Za-z][A-Za-z0-9_]+")


class MultiLabelBinarizerEncoder:
    def __init__(self, column: str, out: str | None = None):
        self.column = column
        self.out = out or f"{column}_enc"
        self.classes_: list | None = None

    def fit(self, ds: "ray.data.Dataset") -> "MultiLabelBinarizerEncoder":
        col = self.column

        def uniq(batch: pd.DataFrame) -> pd.DataFrame:
            vals: set = set()
            for cell in batch[col]:
                vals |= normalize_to_set(cell)
            return pd.DataFrame({"v": sorted(vals, key=str)})

        parts = ds.map_batches(uniq, batch_format="pandas", batch_size=None).to_pandas()
        self.classes_ = sorted(set(parts["v"]), key=str)
        return self

    def transform(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        idx = {c: i for i, c in enumerate(self.classes_)}
        ref = ray.put(idx)
        col, out = self.column, self.out

        def enc(batch: pd.DataFrame) -> pd.DataFrame:
            ix = ray.get(ref)
            mat = np.zeros((len(batch), len(ix)), dtype=np.float64)
            for r, cell in enumerate(batch[col]):
                for v in normalize_to_set(cell):
                    j = ix.get(v)
                    if j is not None:
                        mat[r, j] = 1.0
            batch[out] = list(mat)
            return batch

        return ds.map_batches(enc, batch_format="pandas", batch_size=None)


class TfIdfEncoder:
    """tf-idf with sublinear tf (1 + log tf) and smoothed idf
    (ln((1+n)/(1+df)) + 1), L2-normalized rows — TfidfVectorizer defaults as
    used by the reference (sublinear_tf=True, max_features)."""

    def __init__(self, column: str, *, max_features: int = 128,
                 out: str | None = None):
        self.column = column
        self.max_features = max_features
        self.out = out or f"{column}_tfidf"
        self.vocab_: dict | None = None
        self.idf_: np.ndarray | None = None
        self.n_docs_: int = 0

    def fit(self, ds: "ray.data.Dataset") -> "TfIdfEncoder":
        from bluegraph_ray.util import hash_aggregate

        col = self.column

        def doc_tokens(batch: pd.DataFrame) -> pd.DataFrame:
            toks, cnt = [], []
            for text in batch[col]:
                s = set(_TOKEN.findall(str(text).lower()))
                toks.extend(s)
                cnt.extend([1] * len(s))
            return pd.DataFrame({"token": toks, "df_part": cnt})

        k = self.max_features

        def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
            # each block of the (already exact, token-unique) df table keeps
            # only its top-k by (df desc, token asc) — the driver merges
            # <= blocks x max_features rows, never the full vocabulary
            # (O(corpus) distinct tokens on code corpora)
            return batch.sort_values(["df", "token"],
                                     ascending=[False, True],
                                     kind="mergesort").head(k)

        df_tbl = hash_aggregate(
            ds.map_batches(doc_tokens, batch_format="pandas", batch_size=None),
            "token", {"df": ("df_part", "sum")},
        ).map_batches(block_topk, batch_format="pandas",
                      batch_size=None).to_pandas()
        self.fit_rows_collected_ = len(df_tbl)  # <= blocks x max_features
        self.n_docs_ = ds.count()
        df_tbl = df_tbl.sort_values(["df", "token"], ascending=[False, True],
                                    kind="mergesort").head(self.max_features)
        df_tbl = df_tbl.sort_values("token").reset_index(drop=True)
        self.vocab_ = {t: i for i, t in enumerate(df_tbl["token"])}
        self.idf_ = (
            np.log((1.0 + self.n_docs_) / (1.0 + df_tbl["df"].to_numpy())) + 1.0
        )
        return self

    def transform(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        ref = ray.put((self.vocab_, self.idf_))
        col, out = self.column, self.out

        def enc(batch: pd.DataFrame) -> pd.DataFrame:
            vocab, idf = ray.get(ref)
            mat = np.zeros((len(batch), len(vocab)), dtype=np.float64)
            for r, text in enumerate(batch[col]):
                counts: dict = {}
                for t in _TOKEN.findall(str(text).lower()):
                    j = vocab.get(t)
                    if j is not None:
                        counts[j] = counts.get(j, 0) + 1
                for j, c in counts.items():
                    mat[r, j] = (1.0 + math.log(c)) * idf[j]
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat /= np.maximum(norms, 1e-12)
            batch[out] = list(mat)
            return batch

        return ds.map_batches(enc, batch_format="pandas", batch_size=None)


class StandardScalerEncoder:
    def __init__(self, columns: list[str], *, impute_mean: bool = True):
        self.columns = list(columns)
        self.impute_mean = impute_mean
        self.mean_: np.ndarray | None = None
        self.std_: np.ndarray | None = None

    def fit(self, ds: "ray.data.Dataset") -> "StandardScalerEncoder":
        cols = self.columns

        def moments(batch: pd.DataFrame) -> pd.DataFrame:
            x = batch[cols].to_numpy(dtype=np.float64)
            return pd.DataFrame(
                {
                    "n": [np.isfinite(x).sum(axis=0)],
                    "s": [np.nansum(x, axis=0)],
                    "s2": [np.nansum(x**2, axis=0)],
                }
            )

        parts = ds.select_columns(cols).map_batches(moments, batch_format="pandas", batch_size=None).to_pandas()
        n = np.sum(np.stack(parts["n"].to_numpy()), axis=0)
        s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
        s2 = np.sum(np.stack(parts["s2"].to_numpy()), axis=0)
        self.mean_ = s / np.maximum(n, 1)
        var = s2 / np.maximum(n, 1) - self.mean_**2
        self.std_ = np.sqrt(np.maximum(var, 1e-24))
        return self

    def transform(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        ref = ray.put((self.mean_, self.std_))
        cols = self.columns
        impute = self.impute_mean

        def enc(batch: pd.DataFrame) -> pd.DataFrame:
            mean, std = ray.get(ref)
            x = batch[cols].to_numpy(dtype=np.float64)
            if impute:
                nanmask = ~np.isfinite(x)
                x = np.where(nanmask, mean, x)
            batch["scaled"] = list((x - mean) / std)
            return batch

        return ds.map_batches(enc, batch_format="pandas", batch_size=None)


class PCAReducer:
    """Exact PCA via eigendecomposition of the covariance, accumulated
    distributed: per-batch (n, sum, X^T X) partials -> driver eigh."""

    def __init__(self, vec_column: str, n_components: int, out: str | None = None):
        self.vec_column = vec_column
        self.n_components = n_components
        self.out = out or f"{vec_column}_pca"
        self.mean_: np.ndarray | None = None
        self.components_: np.ndarray | None = None

    def fit(self, ds: "ray.data.Dataset") -> "PCAReducer":
        col = self.vec_column

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            x = np.stack(batch[col].to_numpy()).astype(np.float64)
            return pd.DataFrame(
                {"n": [len(x)], "s": [x.sum(axis=0)], "xtx": [x.T @ x]}
            )

        parts = ds.select_columns([col]).map_batches(partial, batch_format="pandas", batch_size=None).to_pandas()
        n = int(parts["n"].sum())
        s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
        xtx = np.sum(np.stack(parts["xtx"].to_numpy()), axis=0)
        self.mean_ = s / n
        cov = xtx / n - np.outer(self.mean_, self.mean_)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1][: self.n_components]
        self.components_ = v[:, order].T  # (k, d)
        return self

    def transform(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        ref = ray.put((self.mean_, self.components_))
        col, out = self.vec_column, self.out

        def enc(batch: pd.DataFrame) -> pd.DataFrame:
            mean, comp = ray.get(ref)
            x = np.stack(batch[col].to_numpy()).astype(np.float64)
            batch[out] = list((x - mean) @ comp.T)
            return batch

        return ds.map_batches(enc, batch_format="pandas", batch_size=None)


class PGFrameEncoder:
    """Property-graph encoder — the ``SemanticPGEncoder`` /
    ``ScikitLearnPGEncoder`` surface (reference preprocess/encoders.py:96-358
    and 412-572): per-property encoders dispatched on the PGFrame's declared
    property type ("category" -> MultiLabelBinarizer, "text" -> TfIdf,
    "numeric" -> StandardScaler), concatenated into one ``features`` vector
    per element.

    ``heterogeneous=True`` (reference encoders.py:173-200, 337-358):
    ``node_properties`` / ``edge_properties`` are ``{type: [props]}`` and
    every node/edge type fits its OWN encoder map over the typed subset
    (subset semantics on ``@type``); transform unions the typed subsets, so
    feature dimensionality is per-type, as in the reference. A multi-typed
    element is encoded once per matching type with the first match kept.

    Execution shape: every fit is a distributed aggregate over the typed
    subset; every transform a ``map_batches`` with ``ray.put``-broadcast
    state — nothing materializes the element tables on the driver."""

    def __init__(self, node_properties=None, edge_properties=None, *,
                 heterogeneous: bool = False, edge_features: bool = False,
                 text_encoding_max_dimension: int = 128,
                 standardize_numeric: bool = True):
        if heterogeneous:
            for props, which in ((node_properties, "node"),
                                 (edge_properties, "edge")):
                if props is not None and not isinstance(props, dict):
                    raise ValueError(
                        f"Encoder is heterogeneous, specified {which} "
                        "properties should be a dictionary whose keys are "
                        f"{which} types and whose values are properties to "
                        "encode.")
        self.node_properties = node_properties
        self.edge_properties = edge_properties
        self.heterogeneous = heterogeneous
        self.edge_features = edge_features
        self.text_encoding_max_dimension = text_encoding_max_dimension
        self.standardize_numeric = standardize_numeric
        self._node_encoders: dict = {}
        self._edge_encoders: dict = {}

    def _make_encoder(self, prop: str, prop_type: str):
        if prop_type == "category":
            return MultiLabelBinarizerEncoder(prop, out=f"_enc_{prop}")
        if prop_type == "text":
            return TfIdfEncoder(prop, max_features=self.text_encoding_max_dimension,
                                out=f"_enc_{prop}")
        if prop_type == "numeric":
            if not self.standardize_numeric:
                return None
            return StandardScalerEncoder([prop])
        raise ValueError(f"unknown property type {prop_type!r}")

    @staticmethod
    def _typed_subset(ds: "ray.data.Dataset", type_name) -> "ray.data.Dataset":
        from bluegraph_ray.pgframe import TYPE

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            mask = batch[TYPE].map(
                lambda t: type_name in normalize_to_set(t))
            return batch[mask.to_numpy(dtype=bool)]

        return ds.map_batches(f, batch_format="pandas", batch_size=None)

    def _fit_side(self, pgframe, which: str, props) -> dict:
        ds = pgframe._nodes if which == "node" else pgframe._edges
        get_type = (pgframe.node_prop_type if which == "node"
                    else pgframe.edge_prop_type)
        encoders: dict = {}
        if self.heterogeneous:
            for t, tprops in props.items():
                sub = self._typed_subset(ds, t).materialize()
                encoders[t] = {}
                for p in tprops:
                    enc = self._make_encoder(p, get_type(p))
                    if enc is not None:
                        encoders[t][p] = enc.fit(sub)
        else:
            for p in props:
                enc = self._make_encoder(p, get_type(p))
                if enc is not None:
                    encoders[p] = enc.fit(ds)
        return encoders

    def fit(self, pgframe) -> "PGFrameEncoder":
        if self.node_properties is not None:
            self._node_encoders = self._fit_side(
                pgframe, "node", self.node_properties)
        if self.edge_features and self.edge_properties is not None:
            self._edge_encoders = self._fit_side(
                pgframe, "edge", self.edge_properties)
        return self

    @staticmethod
    def _apply_encoders(ds: "ray.data.Dataset", encoders: dict,
                        id_cols: list[str]) -> "ray.data.Dataset":
        outs = []
        for p, enc in encoders.items():
            ds = enc.transform(ds)
            outs.append("scaled" if isinstance(enc, StandardScalerEncoder)
                        else enc.out)
        ds = concat_features(ds, outs, out="features")
        return ds.select_columns([*id_cols, "features"])

    def _transform_side(self, pgframe, which: str) -> "ray.data.Dataset":
        from bluegraph_ray.pgframe import DST, ID, SRC

        ds = pgframe._nodes if which == "node" else pgframe._edges
        id_cols = [ID] if which == "node" else [SRC, DST]
        encoders = (self._node_encoders if which == "node"
                    else self._edge_encoders)
        if not self.heterogeneous:
            return self._apply_encoders(ds, encoders, id_cols)
        parts = [self._apply_encoders(self._typed_subset(ds, t), encs, id_cols)
                 for t, encs in encoders.items()]
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)

        # multi-typed elements: keep the first matching type's encoding
        def dedup(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.drop_duplicates(id_cols, keep="first")

        return out.map_batches(dedup, batch_format="pandas", batch_size=None)

    def transform(self, pgframe):
        """-> RayPGFrame whose nodes (and edges when ``edge_features``) carry
        a ``features`` vector column."""
        from bluegraph_ray.pgframe import RayPGFrame

        nodes = self._transform_side(pgframe, "node")
        edges = (self._transform_side(pgframe, "edge")
                 if self.edge_features and self._edge_encoders
                 else pgframe._edges)
        return RayPGFrame(nodes=nodes, edges=edges)

    def fit_transform(self, pgframe):
        return self.fit(pgframe).transform(pgframe)


def concat_features(ds: "ray.data.Dataset", columns: list[str],
                    out: str = "features") -> "ray.data.Dataset":
    """Row-wise horizontal concat of vector/scalar columns — the reference's
    ``aggregate_properties`` (/root/reference/bluegraph/core/io.py:1115-1131).
    Pure per-row op, no shuffle."""

    def cat(batch: pd.DataFrame) -> pd.DataFrame:
        mats = []
        for c in columns:
            v = batch[c].to_numpy()
            if len(v) and isinstance(v[0], (list, np.ndarray)):
                mats.append(np.stack(v).astype(np.float64))
            else:
                mats.append(batch[c].to_numpy(dtype=np.float64)[:, None])
        batch[out] = list(np.hstack(mats))
        return batch

    return ds.map_batches(cat, batch_format="pandas", batch_size=None)
