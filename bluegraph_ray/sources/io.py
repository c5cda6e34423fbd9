"""Graph sources / sinks (SURVEY.md §2.1).

Parity operators for the reference's io surface, Ray-Data-first:

- CSV round-trip with set-valued cells (``"{'a', 'b'}"`` strings parsed back
  via ``str_to_set`` — reference /root/reference/bluegraph/core/io.py:533-548,
  1133-1142);
- JSON-LD fold: a stream of JSON-LD resources -> node rows + edge rows via
  ``flat_map``-style batch explode, then groupby-dedup
  (reference core/io.py:457-493 recursion at 367-455);
- node-centric JSON-LD dump (core/io.py:495-527) — groupby(src) adjacency;
- Gephi export: integer-id remap + CSV pair (core/io.py:550-608);
- ontology import is gated on rdflib (not in this container) with a clear
  error (core/io.py:617-708).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from bluegraph_ray.functions.setops import str_to_set
from bluegraph_ray.pgframe import DST, ID, SRC, TYPE, RayPGFrame


# -- CSV with set cells -----------------------------------------------------

def frame_to_csv(frame: RayPGFrame, node_path: str, edge_path: str) -> None:
    """Set-valued cells serialize via repr (the reference relies on pandas'
    default str(set) — core/io.py:1133-1135)."""

    def ser(batch: pd.DataFrame) -> pd.DataFrame:
        for c in batch.columns:
            if batch[c].map(lambda v: isinstance(v, (set, frozenset))).any():
                batch[c] = batch[c].map(
                    lambda v: repr(v) if isinstance(v, (set, frozenset)) else v
                )
        return batch

    frame._nodes.map_batches(ser, batch_format="pandas", batch_size=None).write_csv(node_path)
    frame._edges.map_batches(ser, batch_format="pandas", batch_size=None).write_csv(edge_path)


def frame_from_csv(node_path: str, edge_path: str) -> RayPGFrame:
    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        for c in batch.columns:
            if batch[c].dtype == object:
                batch[c] = batch[c].map(
                    lambda v: str_to_set(v) if isinstance(v, str) and v.startswith("{") else v
                )
        return batch

    nodes = ray.data.read_csv(node_path).map_batches(parse, batch_format="pandas", batch_size=None)
    edges = ray.data.read_csv(edge_path).map_batches(parse, batch_format="pandas", batch_size=None)
    return RayPGFrame(nodes, edges)


# -- JSON-LD ----------------------------------------------------------------

def frame_from_jsonld(resources: list[dict], *, type_key: str = "@type") -> RayPGFrame:
    """Fold JSON-LD-ish resources into nodes/edges: each resource is a node
    (@id, literal props); dict-valued props with an @id are edges to that
    neighbour (reference core/io.py:457-493, simplified one-level recursion
    semantics: nested resources become their own nodes)."""
    import json

    # ship resources as JSON strings — nested list<struct> cells break Ray's
    # block typing; the file-based variant is read_text + the same parse stage
    ds = ray.data.from_items([json.dumps(r) for r in resources])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        node_rows, edge_rows = [], []

        def visit(res: dict):
            nid = res.get("@id")
            if nid is None:
                return None
            node = {ID: nid}
            if type_key in res:
                node[TYPE] = res[type_key]
            for k, v in res.items():
                if k in ("@id", type_key):
                    continue
                if isinstance(v, dict) and "@id" in v:
                    tgt = visit(v) or v["@id"]
                    edge_rows.append({SRC: nid, DST: tgt, TYPE: k})
                elif isinstance(v, list) and v and isinstance(v[0], dict) and "@id" in v[0]:
                    for item in v:
                        tgt = visit(item) or item["@id"]
                        edge_rows.append({SRC: nid, DST: tgt, TYPE: k})
                elif not isinstance(v, (dict, list)):
                    node[k] = v
            node_rows.append(node)
            return nid

        for s in batch["item"]:
            visit(json.loads(s))
        out = pd.DataFrame(
            {"kind": ["n"] * len(node_rows) + ["e"] * len(edge_rows),
             "payload": [json.dumps(r) for r in node_rows + edge_rows]}
        )
        return out

    both = ds.map_batches(explode, batch_format="pandas", batch_size=None).to_pandas()
    nodes = pd.DataFrame([json.loads(s) for s in both[both["kind"] == "n"]["payload"]])
    edges = pd.DataFrame([json.loads(s) for s in both[both["kind"] == "e"]["payload"]])
    if edges.empty:
        edges = pd.DataFrame({SRC: [], DST: []})
    f = RayPGFrame(nodes.drop_duplicates(ID), edges.drop_duplicates([SRC, DST]))
    return f


def frame_to_jsonld(frame: RayPGFrame) -> list[dict]:
    """Node-centric adjacency dump (core/io.py:495-527) — groupby(src)."""
    nodes = frame.nodes_df()
    edges = frame.edges_df()
    adj: dict = {}
    for d in edges.to_dict("records"):
        adj.setdefault(d[SRC], []).append(
            {"@id": d[DST], **{k: v for k, v in d.items() if k not in (SRC, DST)}}
        )
    out = []
    for d in nodes.to_dict("records"):
        doc = {"@id": d[ID]}
        for k, v in d.items():
            if k != ID and v is not None and not (isinstance(v, float) and np.isnan(v)):
                doc[k] = v
        if d[ID] in adj:
            doc["edges"] = adj[d[ID]]
        out.append(doc)
    return out


# -- Gephi export -----------------------------------------------------------

def export_to_gephi(frame: RayPGFrame, node_path: str, edge_path: str,
                    *, node_attrs: list | None = None,
                    edge_attrs: list | None = None) -> None:
    """Integer-id remap + CSV pair (reference core/io.py:550-608): nodes get
    ordinal Ids, edges reference them as Source/Target."""
    names = frame.nodes()
    idmap = {n: i + 1 for i, n in enumerate(names)}
    ref = ray.put(idmap)

    def nmap(batch: pd.DataFrame) -> pd.DataFrame:
        mp = ray.get(ref)
        out = pd.DataFrame({"Id": batch[ID].map(mp), "Label": batch[ID]})
        for a in node_attrs or []:
            out[a] = batch[a]
        return out

    def emap(batch: pd.DataFrame) -> pd.DataFrame:
        mp = ray.get(ref)
        out = pd.DataFrame(
            {"Source": batch[SRC].map(mp), "Target": batch[DST].map(mp)}
        )
        for a in edge_attrs or []:
            out[a] = batch[a]
        return out

    frame._nodes.map_batches(nmap, batch_format="pandas", batch_size=None).write_csv(node_path)
    frame._edges.map_batches(emap, batch_format="pandas", batch_size=None).write_csv(edge_path)


# -- ontology (gated) -------------------------------------------------------

def frame_from_ontology(path: str) -> RayPGFrame:
    """OWL/RDF import requires rdflib (reference core/io.py:617-708), which is
    not in this container."""
    try:
        import rdflib  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "from_ontology requires rdflib; install it and wire the triples "
            "through frame_from_jsonld-style folding (see reference "
            "core/io.py:617-708 for the class/restriction semantics)"
        ) from e
    raise NotImplementedError("rdflib present but wiring not implemented yet")
