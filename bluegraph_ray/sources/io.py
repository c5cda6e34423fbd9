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

import re

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


# -- ontology ---------------------------------------------------------------

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
_RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
_OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
_OWL_INDIVIDUAL = "http://www.w3.org/2002/07/owl#NamedIndividual"
_OWL_SOME = "http://www.w3.org/2002/07/owl#someValuesFrom"
_OWL_ONPROP = "http://www.w3.org/2002/07/owl#onProperty"

_NT_LINE = re.compile(
    r'^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"'
    r'(?:\^\^<[^>]*>|@[A-Za-z0-9-]+)?)\s*\.\s*$')
_NT_LITERAL = re.compile(r'^"((?:[^"\\]|\\.)*)"')


_NT_ESC = re.compile(r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|(.))")
_NT_SIMPLE = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
              '"': '"', "'": "'", "\\": "\\"}


def _nt_unescape(s: str) -> str:
    if "\\" not in s:
        return s

    def sub(m: "re.Match") -> str:
        if m.group(1):
            return chr(int(m.group(1), 16))
        if m.group(2):
            return chr(int(m.group(2), 16))
        return _NT_SIMPLE.get(m.group(3), m.group(3))

    return _NT_ESC.sub(sub, s)


def parse_ntriples(text: str) -> list:
    """Minimal from-scratch N-Triples parser -> (subject, predicate, object,
    is_literal) tuples. URIs lose their angle brackets; blank nodes keep the
    ``_:`` prefix; literals are unescaped with datatype/lang tags dropped."""
    out = []
    for line in text.splitlines():
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        m = _NT_LINE.match(line)
        if not m:
            raise ValueError(f"unparseable N-Triples line: {line!r}")
        s, p, o = m.groups()
        s = s[1:-1] if s.startswith("<") else s
        lit = _NT_LITERAL.match(o)
        if lit:
            out.append((s, p, _nt_unescape(lit.group(1)), True))
        else:
            out.append((s, p, o[1:-1] if o.startswith("<") else o, False))
    return out


def _ttl_tokens(text: str):
    """Tokenize the Turtle subset: IRIs, strings, prefixed names, directives,
    lang tags, ``^^``, punctuation. Yields (kind, value) with kind in
    {iri, string, punct, word}."""
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#":
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "<":
            j = text.index(">", i)
            yield ("iri", text[i + 1:j])
            i = j + 1
            continue
        if c == '"':
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == '"':
                    break
                j += 1
            if j >= n:
                raise ValueError("unterminated string literal in Turtle")
            yield ("string", _nt_unescape(text[i + 1:j]))
            i = j + 1
            continue
        if text.startswith("^^", i):
            yield ("punct", "^^")
            i += 2
            continue
        if c in ";,[]()":
            yield ("punct", c)
            i += 1
            continue
        if c == "." and (i + 1 >= n or text[i + 1] in " \t\r\n#"):
            yield ("punct", ".")
            i += 1
            continue
        j = i
        while j < n and text[j] not in ' \t\r\n;,[]()"<#':
            j += 1
        tok = text[i:j]
        # a trailing '.' on a bare token is the statement terminator
        # (pnames in this subset never end in '.'; numbers keep theirs)
        dot = tok.endswith(".") and not re.match(r"^[+-]?\d+\.$", tok)
        if dot:
            tok = tok[:-1]
            j -= 1
        yield ("word", tok)
        i = j


def parse_turtle(text: str) -> list:
    """From-scratch parser for the Turtle subset that real OWL exports (and
    the reference's own ``tests/test_ontology.ttl``) use: ``@prefix`` /
    ``@base`` directives, prefixed names, ``a``, predicate (``;``) and
    object (``,``) lists, anonymous blank-node property lists ``[ ... ]``
    (OWL restrictions), string literals with ``^^datatype`` / ``@lang``
    tags, numbers and booleans. -> the same (s, p, o, is_literal) tuples as
    :func:`parse_ntriples`. RDF collections ``( ... )`` are not supported."""
    toks = list(_ttl_tokens(text))
    pos = 0
    prefixes: dict = {}
    base = [""]
    bn = [0]
    triples: list = []

    def peek():
        return toks[pos] if pos < len(toks) else (None, None)

    def take(expect: str | None = None):
        nonlocal pos
        if pos >= len(toks):
            raise ValueError("unexpected end of Turtle input")
        k, v = toks[pos]
        pos += 1
        if expect is not None and (k, v) != ("punct", expect):
            raise ValueError(f"expected {expect!r}, got {k} {v!r}")
        return k, v

    def resolve_iri(v: str) -> str:
        return v if "://" in v or not base[0] else base[0] + v

    def resolve_pname(v: str) -> str:
        pre, sep, local = v.partition(":")
        if not sep or pre not in prefixes:
            raise ValueError(f"unknown prefixed name {v!r} in Turtle subset")
        return prefixes[pre] + local

    def parse_term(k, v, as_subject=False):
        """-> (value, is_literal); emits nested triples for [ ... ]."""
        if k == "iri":
            return resolve_iri(v), False
        if k == "string":
            nk, nv = peek()
            if (nk, nv) == ("punct", "^^"):
                take()
                dk, dv = take()  # datatype iri/pname, dropped (reference
                if dk not in ("iri", "word"):  # folds o.value anyway)
                    raise ValueError("bad datatype after ^^")
            elif nk == "word" and nv.startswith("@"):
                take()  # language tag, dropped
            return v, True
        if (k, v) == ("punct", "["):
            node = f"_:ttlb{bn[0]}"
            bn[0] += 1
            parse_po_list(node, "]")
            take("]")
            return node, False
        if k == "word":
            if v == "a":
                return _RDF_TYPE, False
            if v in ("true", "false") or re.match(
                    r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$", v):
                return v, True
            if v.startswith("_:"):
                return v, False
            return resolve_pname(v), False
        raise ValueError(f"unexpected Turtle token {k} {v!r}")

    def parse_po_list(subject: str, closer: str):
        while True:
            k, v = peek()
            if (k, v) == ("punct", closer) or k is None:
                return
            pk, pv = take()
            pred, plit = parse_term(pk, pv)
            if plit:
                raise ValueError("literal in predicate position")
            while True:
                ok, ov = take()
                obj, olit = parse_term(ok, ov)
                triples.append((subject, pred, obj, olit))
                if peek() == ("punct", ","):
                    take()
                    continue
                break
            if peek() == ("punct", ";"):
                take()
                # tolerate trailing ';' before the closer
                continue
            return

    while pos < len(toks):
        k, v = take()
        if k == "word" and v.lower() in ("@prefix", "prefix"):
            _, pname = take()
            ik, iri = take()
            if ik != "iri":
                raise ValueError("@prefix needs an IRI")
            prefixes[pname.rstrip(":")] = iri
            if peek() == ("punct", "."):
                take()
            continue
        if k == "word" and v.lower() in ("@base", "base"):
            ik, iri = take()
            if ik != "iri":
                raise ValueError("@base needs an IRI")
            base[0] = iri
            if peek() == ("punct", "."):
                take()
            continue
        subj, slit = parse_term(k, v, as_subject=True)
        if slit:
            raise ValueError("literal in subject position")
        parse_po_list(subj, ".")
        take(".")
    return triples


_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XML_BASE = "{http://www.w3.org/XML/1998/namespace}base"


def parse_rdfxml(text: str) -> list:
    """From-scratch parser for the RDF/XML subset real OWL exports use
    (stdlib ElementTree, no rdflib): ``rdf:RDF`` root, typed node elements
    (``<owl:Class rdf:about=...>`` emits the rdf:type triple),
    ``rdf:Description``, nested node elements (OWL restriction bnodes),
    ``rdf:about`` / ``rdf:ID`` / ``rdf:nodeID``, ``rdf:resource`` object
    properties, literal property elements (``rdf:datatype`` / ``xml:lang``
    tags dropped, matching :func:`parse_ntriples`), literal property
    ATTRIBUTES, ``rdf:parseType="Resource"`` bnode shorthand, and
    ``xml:base`` resolution. RDF containers/collections and
    ``parseType="Collection"`` are not supported. -> the same
    (s, p, o, is_literal) tuples as the other parsers."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    triples: list = []
    bn = [0]

    def expand(tag: str) -> str:
        if tag.startswith("{"):
            return tag[1:].replace("}", "")
        raise ValueError(f"unqualified RDF/XML name {tag!r} (subset "
                         "requires namespaced elements/attributes)")

    def resolve(ref: str, base: str) -> str:
        if "://" in ref or ref.startswith("_:") or not base:
            return ref
        if ref.startswith("#") or not ref:
            return base.split("#")[0] + ref
        return base.rstrip("/#") + "/" + ref

    def fresh_bnode() -> str:
        bn[0] += 1
        return f"_:xmlb{bn[0]}"

    def node_subject(el, base: str) -> str:
        about = el.get(f"{{{_RDF_NS}}}about")
        if about is not None:
            return resolve(about, base)
        rid = el.get(f"{{{_RDF_NS}}}ID")
        if rid is not None:
            return resolve("#" + rid, base)
        nid = el.get(f"{{{_RDF_NS}}}nodeID")
        if nid is not None:
            return "_:" + nid
        return fresh_bnode()

    def parse_props(s: str, el, base: str) -> None:
        # non-rdf attributes are literal property shortcuts
        for k, v in el.attrib.items():
            if k == _XML_BASE:
                continue
            ku = expand(k)
            if ku.startswith(_RDF_NS):
                continue
            triples.append((s, ku, v, True))
        for child in el:
            base_c = child.get(_XML_BASE, base)
            p = expand(child.tag)
            res = child.get(f"{{{_RDF_NS}}}resource")
            if res is not None:
                triples.append((s, p, resolve(res, base_c), False))
                continue
            nid = child.get(f"{{{_RDF_NS}}}nodeID")
            if nid is not None and len(child) == 0:
                triples.append((s, p, "_:" + nid, False))
                continue
            if child.get(f"{{{_RDF_NS}}}parseType") == "Resource":
                b = fresh_bnode()
                triples.append((s, p, b, False))
                parse_props(b, child, base_c)
                continue
            kids = list(child)
            if kids:
                if len(kids) != 1:
                    raise ValueError(
                        f"property element {p!r} with {len(kids)} child "
                        "node elements (subset allows one)")
                o = parse_node(kids[0], base_c)
                triples.append((s, p, o, False))
            else:
                triples.append((s, p, (child.text or "").strip(), True))

    def parse_node(el, base: str) -> str:
        base = el.get(_XML_BASE, base)
        s = node_subject(el, base)
        tag = expand(el.tag)
        if tag != _RDF_NS + "Description":
            triples.append((s, _RDF_TYPE, tag, False))
        parse_props(s, el, base)
        return s

    base0 = root.get(_XML_BASE, "")
    if expand(root.tag) == _RDF_NS + "RDF":
        for el in root:
            parse_node(el, el.get(_XML_BASE, base0))
    else:
        parse_node(root, base0)
    return triples


def frame_from_ontology(path: str | None = None, *, triples=None,
                        format: str = "nt",
                        remove_prop_uris: bool = False) -> RayPGFrame:
    """Ontology -> PGFrame with the reference's folding semantics
    (core/io.py:617-708): labeled owl:Class / owl:NamedIndividual become
    nodes (by label); rdfs:subClassOf becomes IS_SUBCLASS_OF edges, OWL
    someValuesFrom/onProperty restrictions become typed edges, other object
    properties to labeled targets become edges typed by predicate URI;
    literal predicates become node properties (multi-valued -> list).

    ``format="nt"`` (N-Triples), ``format="turtle"``/``"ttl"`` (the
    OWL-export Turtle subset, :func:`parse_turtle`) and
    ``format="xml"``/``"rdfxml"``/``"owl"`` (the RDF/XML subset,
    :func:`parse_rdfxml`) parse natively — no rdflib needed; other RDF
    serializations (json-ld via rdflib) stay gated in this container."""
    if path is None and triples is None:
        raise ValueError("Ontology source must be specified: both "
                         "'path' and 'triples' are None")
    if triples is None:
        if format == "nt":
            with open(path) as fh:
                triples = parse_ntriples(fh.read())
        elif format in ("turtle", "ttl"):
            with open(path) as fh:
                triples = parse_turtle(fh.read())
        elif format in ("xml", "rdfxml", "owl"):
            with open(path) as fh:
                triples = parse_rdfxml(fh.read())
        else:
            try:
                import rdflib  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    f"from_ontology(format={format!r}) requires rdflib "
                    "(absent in this container); N-Triples (format='nt') "
                    "and Turtle (format='turtle') parse natively") from e
            g = __import__("rdflib").Graph()
            g.parse(path, format=format)
            triples = [(str(s), str(p),
                        o.value if hasattr(o, "value") else str(o),
                        hasattr(o, "value"))
                       for s, p, o in g]

    labels: dict = {}
    types: dict = {}
    by_subject: dict = {}
    for s, p, o, lit in triples:
        by_subject.setdefault(s, []).append((p, o, lit))
        if p == _RDFS_LABEL and lit and s not in labels:
            labels[s] = o
        if p == _RDF_TYPE and not lit:
            types.setdefault(s, set()).add(o)

    classes = [s for s, ts in types.items()
               if _OWL_CLASS in ts and s in labels]
    individuals = [s for s, ts in types.items()
                   if _OWL_INDIVIDUAL in ts and s in labels]

    edges: dict = {}
    props: dict = {}
    for c in classes:
        node_id = labels[c]
        for p, o, lit in by_subject.get(c, []):
            if lit:
                if p == _RDFS_LABEL:
                    continue
                name = labels.get(p, p)
                cur = props.setdefault(name, {})
                if node_id in cur:
                    if isinstance(cur[node_id], list):
                        cur[node_id].append(o)
                    else:
                        cur[node_id] = [cur[node_id], o]
                else:
                    cur[node_id] = o
            elif p == _RDFS_SUBCLASS:
                if o.startswith("_:"):  # OWL restriction blank node
                    target = edge_label = None
                    for pp, oo, _l in by_subject.get(o, []):
                        if pp == _OWL_SOME and oo in labels:
                            target = labels[oo]
                        elif pp == _OWL_ONPROP and oo in labels:
                            edge_label = labels[oo]
                    if target:
                        edges.setdefault((node_id, target), set()).add(edge_label)
                elif o in labels:
                    edges.setdefault((node_id, labels[o]), set()).add(
                        "IS_SUBCLASS_OF")
            elif p != _RDF_TYPE and o in labels:
                edges.setdefault((node_id, labels[o]), set()).add(p)

    if remove_prop_uris:
        # rename BEFORE the property join: a post-hoc column rename
        # round-trips cells through Arrow, which re-materializes tuple
        # cells as ragged ndarrays (they then break the block concat)
        pattern = re.compile(r"(http(s*):\/\/.*)[#|\/](.*)")
        renamed = {}
        for p, v in props.items():
            m = pattern.match(p)
            renamed[m.groups()[2] if m else p] = v
        props = renamed

    frame = RayPGFrame(
        nodes=sorted({labels[el] for el in [*classes, *individuals]}),
        edges=sorted(edges))
    if edges:
        frame = frame.add_edge_types(
            {k: sorted(v) for k, v in edges.items()})
    for k, v in props.items():
        # multi-valued cells as TUPLES: ragged lists/ndarrays trip Ray's
        # tensor-extension cast when blocks with missing values concat;
        # tuples stay plain object cells (the reference uses lists — same
        # content, different container)
        v = {n: (tuple(x) if isinstance(x, list) else x)
             for n, x in v.items()}
        frame = frame.add_node_properties(
            pd.DataFrame(v.items(), columns=["@id", k]))
    return frame
