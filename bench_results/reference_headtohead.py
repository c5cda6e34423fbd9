"""Head-to-head: this engine's co-occurrence builder vs the reference's
CooccurrenceGenerator (BlueBrain/BlueGraph, multiprocessing backend) on the
SAME input and the SAME core budget, with statistic-by-statistic equality
checked before timing is reported.

The reference's heavy optional deps (rdflib/sklearn/scipy/nltk) are absent in
this container and unused by the generator path, so they are stubbed at
import time. The reference scans all n(n-1)/2 node pairs in Python
(generators.py:283-324); this engine shuffles (entity, factor) rows.

Usage: python bench_results/reference_headtohead.py [n_files] [cores]
Prints one JSON line.
"""
import json
import sys
import time
import types


def _fake(name, attrs=()):
    m = types.ModuleType(name)
    m.__path__ = []
    for a in attrs:
        setattr(m, a, object)
    sys.modules[name] = m


for spec in [("rdflib", ["Graph", "Literal", "URIRef", "RDF", "RDFS", "OWL",
                         "XSD", "Namespace"]),
             ("scipy", []), ("scipy.sparse", ["issparse"]),
             ("sklearn", []),
             ("sklearn.preprocessing", ["MultiLabelBinarizer", "StandardScaler",
                                        "OneHotEncoder"]),
             ("sklearn.feature_extraction", []),
             ("sklearn.feature_extraction.text", ["TfidfVectorizer"]),
             ("sklearn.decomposition", ["PCA"]),
             ("sklearn.impute", ["SimpleImputer"]),
             ("sklearn.pipeline", ["Pipeline"]),
             ("sklearn.compose", ["ColumnTransformer"]),
             ("nltk", ["download"]), ("nltk.corpus", ["stopwords", "words"]),
             ("nltk.stem", ["WordNetLemmatizer", "SnowballStemmer"]),
             ("nltk.tokenize", ["word_tokenize"])]:
    _fake(*spec)

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    import ray

    from bluegraph import PandasPGFrame
    from bluegraph.preprocess.generators import CooccurrenceGenerator

    from bluegraph_ray.pipelines.cooccurrence import (
        cooccurrence_edges, occurrences_from_source)
    from bluegraph_ray.sources.synthetic import source_code_table_arrow
    from bluegraph_ray.util import tune_context

    # ---- shared input: (entity=stem, factor=repo) occurrences -------------
    src = source_code_table_arrow(N_FILES, seed=42).to_pandas()
    src["stem"] = (src["path"].str.rpartition("/")[2]
                   .str.replace(r"\.[^.]*$", "", regex=True))
    occ = src[["stem", "repo"]].drop_duplicates()
    n_factors = occ["repo"].nunique()
    n_entities = occ["stem"].nunique()

    # ---- reference: PandasPGFrame + pair scan (their parallel path) -------
    factor_sets = occ.groupby("stem")["repo"].agg(set)
    frame = PandasPGFrame()
    frame._nodes = pd.DataFrame({"factors": factor_sets})
    frame._nodes.index.name = "@id"
    gen = CooccurrenceGenerator(frame)
    t0 = time.perf_counter()
    ref_edges = gen.generate_from_nodes(
        "factors", total_factor_instances=n_factors,
        compute_statistics=["frequency", "ppmi", "npmi"],
        parallelize=True, cores=CORES)
    t_ref = time.perf_counter() - t0

    # ---- this engine on the same core budget -------------------------------
    ray.init(address="local", num_cpus=CORES, include_dashboard=False)
    tune_context()
    srcd = ray.data.from_pandas(src[["repo", "path", "lang"]]).materialize()
    t0 = time.perf_counter()
    ours = cooccurrence_edges(
        occurrences_from_source(srcd, entity="stem", factor="repo"),
        statistics=("frequency", "ppmi", "npmi"),
        max_factor_entities=None, num_buckets=max(16, CORES * 2),
    ).to_pandas()
    t_ours = time.perf_counter() - t0
    ray.shutdown()

    # ---- equality (canonical src<dst both sides) ---------------------------
    ref = ref_edges.reset_index()
    ref[["s", "t"]] = np.sort(ref[["@source_id", "@target_id"]], axis=1)
    ours[["s", "t"]] = np.sort(ours[["src", "dst"]], axis=1)
    m = ref.merge(ours, on=["s", "t"], how="outer", indicator=True,
                  suffixes=("_ref", "_ours"))
    assert (m["_merge"] == "both").all(), "edge sets differ"
    assert (m["frequency_ref"] == m["frequency_ours"]).all(), "frequency differs"
    assert np.allclose(m["ppmi_ref"], m["ppmi_ours"], atol=2e-6), "ppmi differs"
    assert np.allclose(m["npmi_ref"], m["npmi_ours"], atol=2e-6), "npmi differs"

    print(json.dumps({
        "metric": "cooccurrence_headtohead_seconds",
        "n_files": N_FILES, "n_entities": int(n_entities),
        "n_factors": int(n_factors), "n_edges": int(len(ours)),
        "cores": CORES,
        "reference_sec": round(t_ref, 2),
        "engine_sec": round(t_ours, 2),
        "speedup": round(t_ref / t_ours, 2),
        "results_equal": True,
    }))


if __name__ == "__main__":
    main()
