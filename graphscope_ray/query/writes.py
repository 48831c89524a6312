"""Cypher write clauses — CREATE / MERGE / SET / DELETE.

The reference grammar accepts write statements
(``interactive_engine/compiler/src/main/antlr4/CypherGS.g4`` —
``oC_Create`` / ``oC_Merge`` / ``oC_Set`` / ``oC_Delete`` rules) and
lowers them onto its mutable-fragment path. Here they lower onto
``stages/graph_ops.modify_vertices / modify_edges`` (the
DynamicFragment analogue) against the :class:`CypherGraph` catalog:
the MATCH/WHERE half of a write statement is planned by the SAME read
planner (``CypherGraph._execute`` on a synthesized RETURN), so
predicate pushdown / property pruning apply to writes for free, and
the mutation itself is a streaming union/anti-join — no row ever
passes through the driver beyond literal prop maps and Neo4j-style
counters.

Supported subset (documented contract, tests/test_cypher_writes.py):

- ``CREATE (n:L {id: lit, …})[, (m:L2 {…}), (n)-[:T {…}]->(m), …]``
  (standalone): node prop maps MUST include the label's registered id
  column; ids must be fresh (duplicate id raises — the catalog's
  unique-id invariant). Relationship endpoints must be node variables
  defined in the same CREATE.
- ``MATCH … [WHERE …] CREATE (a)-[:T {props}]->(b)``: one edge per
  binding row, endpoints bound by the MATCH (Cypher multigraph
  semantics — duplicates are appended, compose with a prior MATCH
  WHERE NOT (a)-[:T]->(b) for set semantics).
- ``MERGE (n:L {id: lit, …})`` (standalone): no-op when a row matches
  ALL given props, else creates the node.
- ``MATCH … [WHERE …] SET a.p = expr [, b.q = expr …]``: vectorized
  per-binding update; multiple bindings hitting one vertex resolve
  deterministically (min new value wins — document, don't race).
- ``MATCH … [WHERE …] [DETACH] DELETE x [, r …]``: relationship vars
  delete their matched arcs; vertex vars delete catalog rows — plain
  DELETE raises if incident edges remain (openCypher contract),
  DETACH DELETE removes incident edges from every edge table first.
  Two documented deviations from Neo4j: (1) edge identity is
  ``(src, dst)`` — the catalog has no relationship ids — so DELETE r
  removes EVERY parallel relationship between the matched endpoint
  pairs, not only the rows matching WHERE; (2) the matched delete-key
  set (endpoint pairs / vids) is collected on the driver and
  broadcast for the anti-join (``modify_*``'s small-side contract) —
  a delete matching a corpus-scale fraction of the graph should
  rebuild the table instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.query.cypher import (
    Query,
    RetItem,
    Var,
    _Parser,
    _tokenize,
)

_WRITE_KWS = {"CREATE", "MERGE", "SET", "DELETE", "DETACH"}


# ----------------------------------------------------------- statements
class CreateStmt:
    def __init__(self, match, where, nodes, rels):
        self.match = match          # list[PathPat] (may be empty)
        self.where = where
        self.nodes = nodes          # list[NodePat] with literal props
        self.rels = rels            # list[(src_var, RelPat, dst_var)]


class MergeStmt:
    def __init__(self, node):
        self.node = node            # NodePat with literal props


class SetStmt:
    def __init__(self, match, where, assigns):
        self.match = match
        self.where = where
        self.assigns = assigns      # list[(var, prop, expr)]


class DeleteStmt:
    def __init__(self, match, where, targets, detach):
        self.match = match
        self.where = where
        self.targets = targets      # list[str] variable names
        self.detach = detach


class _WriteParser(_Parser):
    """Reuses the read grammar's pattern/expression sub-parsers. The
    write words are ordinary NAME tokens (so read queries can use them
    as identifiers) — recognized here positionally, case-insensitive."""

    def accept_word(self, w: str) -> bool:
        t = self.peek()
        if t[0] == "name" and t[1].upper() == w:
            self.i += 1
            return True
        return False

    def parse_write(self):
        match, where = [], None
        if self.accept("kw", "MATCH"):
            match = [self.pattern()]
            while self.accept("punct", ","):
                match.append(self.pattern())
            if self.accept("kw", "WHERE"):
                where = self.expr()
        if self.accept_word("CREATE"):
            return self._create(match, where)
        if self.accept_word("MERGE"):
            if match:
                raise ValueError("cypher: MERGE after MATCH is not "
                                 "supported (standalone MERGE only)")
            pat = self.pattern()
            if pat.rels or len(pat.nodes) != 1:
                raise ValueError("cypher: MERGE supports a single "
                                 "node pattern")
            self.expect("eof")
            return MergeStmt(pat.nodes[0])
        if self.accept_word("SET"):
            assigns = [self._assign()]
            while self.accept("punct", ","):
                assigns.append(self._assign())
            self.expect("eof")
            if not match:
                raise ValueError("cypher: SET needs a MATCH clause")
            return SetStmt(match, where, assigns)
        detach = self.accept_word("DETACH")
        if self.accept_word("DELETE"):
            targets = [self.expect("name")[1]]
            while self.accept("punct", ","):
                targets.append(self.expect("name")[1])
            self.expect("eof")
            if not match:
                raise ValueError("cypher: DELETE needs a MATCH clause")
            return DeleteStmt(match, where, targets, detach)
        raise ValueError(
            f"cypher: expected a write clause, got {self.peek()}")

    def _assign(self):
        v = self.expect("name")[1]
        self.expect("punct", ".")
        p = self.expect("name")[1]
        self.expect("punct", "=")
        return (v, p, self.expr())

    def _create(self, match, where):
        nodes, rels = [], []
        while True:
            item = self.pattern_body()
            if item.rels:
                if len(item.rels) != 1:
                    raise ValueError("cypher: CREATE relationships are "
                                     "single hops")
                a, b = item.nodes
                r = item.rels[0]
                if r.direction != "out":
                    raise ValueError("cypher: CREATE relationships "
                                     "must be directed ->")
                if a.label or a.props or b.label or b.props:
                    raise ValueError("cypher: CREATE relationship "
                                     "endpoints must be bare bound "
                                     "variables")
                rels.append((a.var, r, b.var))
            else:
                n = item.nodes[0]
                if n.label is None or not n.props:
                    raise ValueError("cypher: CREATE nodes need a "
                                     "label and a property map")
                nodes.append(n)
            if not self.accept("punct", ","):
                break
        self.expect("eof")
        return CreateStmt(match, where, nodes, rels)


def parse_write(src: str):
    """Parse ``src`` as a write statement, or return None for a read.

    Dispatch: a statement starting with CREATE/MERGE is always a
    write; otherwise the READ grammar gets first try — so reads using
    `set`/`delete`/… as property or alias names keep parsing — and
    only a read-parse failure falls through to the write parser. When
    both parsers fail, the write error is raised if the statement
    mentions a write word, else the read error."""
    from graphscope_ray.query.cypher import parse_cypher

    toks = _tokenize(src)
    first = toks[0] if toks else ("eof", None)
    if first[0] == "name" and first[1].upper() in ("CREATE", "MERGE"):
        return _WriteParser(src).parse_write()
    try:
        parse_cypher(src)
        return None
    except ValueError as read_err:
        try:
            return _WriteParser(src).parse_write()
        except ValueError as write_err:
            has_write_word = any(
                t[0] == "name" and t[1].upper() in _WRITE_KWS
                for t in toks)
            raise (write_err if has_write_word else read_err) from None


# ------------------------------------------------------------ execution
def _summary(**counts) -> pd.DataFrame:
    base = {"nodes_created": 0, "relationships_created": 0,
            "properties_set": 0, "nodes_deleted": 0,
            "relationships_deleted": 0}
    base.update(counts)
    return pd.DataFrame([{k: np.int64(v) for k, v in base.items()}])


def _match_bindings(graph, match, where, items) -> ray.data.Dataset:
    """Plan the write statement's MATCH/WHERE half through the read
    executor (pushdown + pruned property joins for free)."""
    q = Query(patterns=list(match), where=where, distinct=False,
              items=items, order=[], skip=None, limit=None)
    return graph._execute(q)


def _existing_ids(graph, label: str, ids: list) -> np.ndarray:
    ds, vid = graph._v[label]
    arr = np.asarray(ids, dtype=np.int64)
    ref = ray.put(arr)

    def f(t: pa.Table) -> pa.Table:
        want = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        v = t.column(vid).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vid": pa.array(v[np.isin(v, want)], pa.int64())})

    hits = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    if not len(hits):
        return np.empty(0, np.int64)
    return hits["vid"].to_numpy()


def _typed_rows(ds: ray.data.Dataset, rows: pd.DataFrame,
                what: str) -> pa.Table:
    """New rows as an Arrow table with EXACTLY the catalog table's
    schema (missing columns become typed nulls) — a union of
    mismatched block schemas would otherwise degrade every downstream
    stage to schema-unification warnings."""
    from graphscope_ray.stages.relational import _arrow_fields

    fields = _arrow_fields(ds)
    unknown = set(rows.columns) - set(fields)
    if unknown:
        raise ValueError(
            f"cypher: {what} property map has column(s) "
            f"{sorted(unknown)} not in the catalog table schema "
            f"{sorted(fields)}")
    cols = {}
    for name, typ in fields.items():
        if name in rows.columns:
            cols[name] = pa.array(rows[name]).cast(typ)
        else:
            cols[name] = pa.nulls(len(rows), typ)
    return pa.table(cols)


def _empty_like(fields: dict) -> ray.data.Dataset:
    """Zero-row Dataset with the given Arrow fields — a table emptied
    by DELETE must keep its schema or every later read against it
    dies with 'dataset has no schema' (wide-seed stress finding)."""
    return ray.data.from_arrow(
        pa.table({k: pa.nulls(0, typ) for k, typ in fields.items()}))


def _invalidate(graph) -> None:
    """Every catalog mutation resets the id cache AND the planner's
    cardinality statistics (stale counts would steer join ordering
    against a graph that no longer exists)."""
    graph._vid_cache = {}
    graph._stats = None


def _append_vertices(graph, label: str, rows: pd.DataFrame) -> None:
    ds, vid = graph._v[label]
    add = ray.data.from_arrow(_typed_rows(ds, rows, f"CREATE (:{label})"))
    graph._v[label] = (ds.union(add), vid)
    _invalidate(graph)


def _append_edges(graph, rtype: str, rows_ds: ray.data.Dataset) -> None:
    if rtype not in graph._e:
        raise KeyError(f"cypher: unknown relationship type {rtype!r}")
    ds, s, d = graph._e[rtype]
    from graphscope_ray.stages.relational import _arrow_fields

    fields = _arrow_fields(ds)
    fref = ray.put(fields)

    def pad(df: pd.DataFrame) -> pa.Table:
        fl = ray.get(fref) if isinstance(fref, ray.ObjectRef) else fref
        unknown = set(df.columns) - set(fl)
        if unknown:
            raise ValueError(
                f"cypher: CREATE -[:{rtype}]- property map has "
                f"column(s) {sorted(unknown)} not in the edge table "
                f"schema {sorted(fl)}")
        return pa.table({
            name: (pa.array(df[name]).cast(typ) if name in df.columns
                   else pa.nulls(len(df), typ))
            for name, typ in fl.items()})

    graph._e[rtype] = (ds.union(rows_ds.map_batches(
        pad, batch_format="pandas")), s, d)
    _invalidate(graph)


def execute_write(graph, stmt) -> pd.DataFrame:
    if isinstance(stmt, CreateStmt):
        return _exec_create(graph, stmt)
    if isinstance(stmt, MergeStmt):
        return _exec_merge(graph, stmt)
    if isinstance(stmt, SetStmt):
        return _exec_set(graph, stmt)
    if isinstance(stmt, DeleteStmt):
        return _exec_delete(graph, stmt)
    raise TypeError(f"unknown write statement {stmt!r}")


def _exec_create(graph, stmt: CreateStmt) -> pd.DataFrame:
    nodes_created = rels_created = 0
    node_ids: dict[str, object] = {}
    # --- standalone node creation (literal prop maps)
    by_label: dict[str, list] = {}
    for n in stmt.nodes:
        if stmt.match:
            raise ValueError("cypher: CREATE after MATCH may only "
                             "create relationships between bound "
                             "variables")
        if n.label not in graph._v:
            raise KeyError(f"cypher: unknown vertex label {n.label!r}")
        vid_col = graph._v[n.label][1]
        if vid_col not in n.props:
            raise ValueError(
                f"cypher: CREATE (:{n.label}) needs the id property "
                f"{vid_col!r} in its map")
        by_label.setdefault(n.label, []).append(n)
        if n.var is not None:
            node_ids[n.var] = n.props[vid_col]
    for label, ns in by_label.items():
        vid_col = graph._v[label][1]
        ids = [n.props[vid_col] for n in ns]
        if len(set(ids)) != len(ids):
            raise ValueError("cypher: duplicate ids in CREATE")
        dup = _existing_ids(graph, label, ids)
        if len(dup):
            raise ValueError(
                f"cypher: CREATE would duplicate existing "
                f":{label} id(s) {sorted(dup.tolist())[:5]} — "
                "use MERGE for upsert-if-absent")
        _append_vertices(graph, label,
                         pd.DataFrame([n.props for n in ns]))
        nodes_created += len(ns)
    # --- relationship creation
    if stmt.rels and stmt.match:
        # bound-variable endpoints: one edge per binding row
        for (av, rel, bv) in stmt.rels:
            rtype = rel.rtype
            if rtype is None or isinstance(rtype, tuple):
                raise ValueError("cypher: CREATE needs exactly one "
                                 "relationship type")
            items = [RetItem(Var(av), "src"), RetItem(Var(bv), "dst")]
            pairs = _match_bindings(graph, stmt.match, stmt.where, items)

            def lits(df: pd.DataFrame, props=dict(rel.props)
                     ) -> pd.DataFrame:
                for k, v in props.items():
                    df[k] = v
                return df

            # materialize: without this the appended side is a lazy
            # match pipeline that re-executes its joins on EVERY later
            # consumer of the edge table
            pairs = pairs.map_batches(
                lits, batch_format="pandas").materialize()
            n_new = pairs.count()
            s, d = graph._e[rtype][1], graph._e[rtype][2]
            ren = {c: n for c, n in zip(["src", "dst"], [s, d])
                   if c != n}
            if ren:
                pairs = pairs.rename_columns(ren)
            _append_edges(graph, rtype, pairs)
            rels_created += n_new
    elif stmt.rels:
        # endpoints are nodes created in this statement
        rows: dict[str, list] = {}
        for (av, rel, bv) in stmt.rels:
            rtype = rel.rtype
            if rtype is None or isinstance(rtype, tuple):
                raise ValueError("cypher: CREATE needs exactly one "
                                 "relationship type")
            if av not in node_ids or bv not in node_ids:
                raise ValueError(
                    "cypher: standalone CREATE relationship endpoints "
                    "must be nodes created in the same statement")
            s, d = graph._e[rtype][1], graph._e[rtype][2]
            rows.setdefault(rtype, []).append(
                {s: node_ids[av], d: node_ids[bv], **rel.props})
        for rtype, rws in rows.items():
            _append_edges(graph, rtype,
                          ray.data.from_pandas(pd.DataFrame(rws)))
            rels_created += len(rws)
    return _summary(nodes_created=nodes_created,
                    relationships_created=rels_created)


def _exec_merge(graph, stmt: MergeStmt) -> pd.DataFrame:
    n = stmt.node
    if n.label not in graph._v:
        raise KeyError(f"cypher: unknown vertex label {n.label!r}")
    if not n.props:
        raise ValueError("cypher: MERGE needs a property map")
    ds, vid_col = graph._v[n.label]
    props = dict(n.props)
    ref = ray.put(props)

    def hit(df: pd.DataFrame) -> pd.DataFrame:
        ps = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        m = np.ones(len(df), dtype=bool)
        for k, v in ps.items():
            m &= (df[k] == v).to_numpy()
        return df[m].head(1)

    found = ds.map_batches(hit, batch_format="pandas").count()
    if found:
        return _summary()
    if vid_col not in props:
        raise ValueError(
            f"cypher: MERGE (:{n.label}) needs the id property "
            f"{vid_col!r} in its map (no full match exists, and a "
            "create without an id would break the catalog invariant)")
    if len(_existing_ids(graph, n.label, [props[vid_col]])):
        raise ValueError(
            "cypher: MERGE pattern does not match, but its id is "
            "already taken with different properties")
    _append_vertices(graph, n.label, pd.DataFrame([props]))
    return _summary(nodes_created=1)


def _exec_set(graph, stmt: SetStmt) -> pd.DataFrame:
    from graphscope_ray.stages.relational import cogroup_join, dedup_first

    props_set = 0
    for (var, prop, expr) in stmt.assigns:
        items = [RetItem(Var(var), "vid"), RetItem(expr, "_newval")]
        upd = _match_bindings(graph, stmt.match, stmt.where, items)
        # deterministic resolution when several bindings hit one
        # vertex: smallest new value wins
        upd = dedup_first(upd, ["vid"], order_by=["_newval"])
        label = None
        for pat in stmt.match:
            for nd in pat.nodes:
                if nd.var == var and nd.label is not None:
                    label = nd.label
        if label is None or label not in graph._v:
            raise ValueError(f"cypher: SET target {var!r} must be a "
                             "labeled node variable")
        ds, vid_col = graph._v[label]
        n_upd = upd.count()
        if n_upd == 0:
            # empty match: nothing to set — a fully-empty update
            # Dataset can carry no schema, which the co-group join
            # rightly refuses (wide-seed stress finding, r5)
            continue
        keyed = upd.map_batches(
            lambda t, c=vid_col: pa.table(
                {c: t.column("vid").cast(pa.int64()),
                 "_newval": t.column("_newval")}),
            batch_format="pyarrow")
        joined = cogroup_join(ds, keyed, on=vid_col, how="left",
                              num_buckets=graph.num_buckets)

        def overwrite(df: pd.DataFrame, prop=prop) -> pd.DataFrame:
            m = df["_newval"].notna().to_numpy()
            vals = df[prop].to_numpy()
            nv = df["_newval"].to_numpy()
            sel = nv[m]
            # the left join NaN-pads unmatched rows, so _newval is
            # float64 even for integer expressions — keep an integer
            # column integer when every assigned value is integral,
            # but PROMOTE to float when not (Neo4j semantics:
            # SET p.x = p.x / 2 stores 1.5, never a silent truncate)
            out = vals.copy()
            if (m.any() and vals.dtype != object
                    and np.issubdtype(vals.dtype, np.integer)):
                arr = np.asarray(sel, dtype=np.float64)
                if np.all(np.isfinite(arr)) \
                        and np.all(arr == np.floor(arr)):
                    out[m] = arr.astype(vals.dtype)
                else:
                    out = vals.astype(np.float64)
                    out[m] = arr
            elif m.any():
                out[m] = sel
            df = df.drop(columns=["_newval"])
            df[prop] = out
            return df

        # materialize: every later statement and the final read-back
        # re-consume the vertex table — without this the SET's bucketed
        # join re-executes once per consumer
        graph._v[label] = (
            joined.map_batches(overwrite,
                               batch_format="pandas").materialize(),
            vid_col)
        _invalidate(graph)
        props_set += n_upd
    return _summary(properties_set=props_set)


def _exec_delete(graph, stmt: DeleteStmt) -> pd.DataFrame:
    from graphscope_ray.stages.graph_ops import modify_edges
    from graphscope_ray.stages.relational import (
        broadcast_semi_join,
        dedup_first,
    )

    rel_of = {}
    label_of = {}
    for pat in stmt.match:
        for nd in pat.nodes:
            if nd.var is not None:
                label_of[nd.var] = nd.label
        for rel, left, right in zip(
                pat.rels, pat.nodes[:-1], pat.nodes[1:]):
            if rel.var is not None:
                rel_of[rel.var] = (rel, left.var, right.var)
    nodes_deleted = rels_deleted = 0
    for tgt in stmt.targets:
        if tgt in rel_of:
            rel, lv, rv = rel_of[tgt]
            if rel.max_hops != 1:
                # openCypher rejects DELETE on var-length bindings;
                # deleting the endpoints' direct arc would silently
                # corrupt the graph
                raise ValueError(
                    "cypher: cannot DELETE a variable-length "
                    "relationship binding")
            rtype = rel.rtype
            if rtype is None and len(graph._e) == 1:
                rtype = next(iter(graph._e))
            if not isinstance(rtype, str):
                raise ValueError("cypher: DELETE relationship needs "
                                 "one concrete type")
            items = [RetItem(Var(lv), "a"), RetItem(Var(rv), "b")]
            pairs = _match_bindings(graph, stmt.match, stmt.where,
                                    items)
            pairs = dedup_first(pairs, ["a", "b"],
                                num_buckets=graph.num_buckets)
            pdf = pairs.to_pandas()
            if not len(pdf):
                continue
            if rel.direction == "out":
                dead = pdf.rename(columns={"a": "src", "b": "dst"})
            elif rel.direction == "in":
                dead = pdf.rename(columns={"a": "dst", "b": "src"})
            else:
                dead = pd.concat([
                    pdf.rename(columns={"a": "src", "b": "dst"}),
                    pdf.rename(columns={"a": "dst", "b": "src"}),
                ], ignore_index=True)
            ds, s, d = graph._e[rtype]
            from graphscope_ray.stages.relational import _arrow_fields
            fields_before = _arrow_fields(ds)
            before = ds.count()
            upd = ray.data.from_pandas(
                dead[["src", "dst"]].drop_duplicates())
            renamed = ds if (s, d) == ("src", "dst") else ds.rename_columns(
                {s: "src", d: "dst"})
            out = modify_edges(renamed, upd, delete=True)
            if (s, d) != ("src", "dst"):
                out = out.rename_columns({"src": s, "dst": d})
            out = out.materialize()
            n_after = out.count()
            if n_after == 0:
                out = _empty_like(fields_before)
            graph._e[rtype] = (out, s, d)
            _invalidate(graph)
            rels_deleted += before - n_after
        elif tgt in label_of:
            label = label_of[tgt]
            if label is None or label not in graph._v:
                raise ValueError(f"cypher: DELETE target {tgt!r} must "
                                 "be a labeled node variable")
            items = [RetItem(Var(tgt), "vid")]
            dead_ds = dedup_first(
                _match_bindings(graph, stmt.match, stmt.where, items),
                ["vid"], num_buckets=graph.num_buckets)
            dead = dead_ds.to_pandas()["vid"].to_numpy().astype(np.int64)
            if len(dead) == 0:
                continue
            for rtype, (eds, s, d) in list(graph._e.items()):
                incident = broadcast_semi_join(
                    eds, dead, on=s).union(
                    broadcast_semi_join(
                        broadcast_semi_join(eds, dead, on=s, anti=True),
                        dead, on=d))
                n_inc = incident.count()
                if n_inc and not stmt.detach:
                    raise ValueError(
                        f"cypher: cannot DELETE {tgt!r} — {n_inc} "
                        f":{rtype} relationship(s) still attached "
                        "(use DETACH DELETE)")
                if n_inc:
                    from graphscope_ray.stages.relational import (
                        _arrow_fields,
                    )
                    efields = _arrow_fields(eds)
                    kept = broadcast_semi_join(
                        broadcast_semi_join(eds, dead, on=s, anti=True),
                        dead, on=d, anti=True).materialize()
                    if kept.count() == 0:
                        kept = _empty_like(efields)
                    graph._e[rtype] = (kept, s, d)
                    rels_deleted += n_inc
            ds, vid_col = graph._v[label]
            from graphscope_ray.stages.relational import _arrow_fields
            vfields = _arrow_fields(ds)
            kept_v = broadcast_semi_join(ds, dead, on=vid_col,
                                         anti=True).materialize()
            if kept_v.count() == 0:
                kept_v = _empty_like(vfields)
            graph._v[label] = (kept_v, vid_col)
            _invalidate(graph)
            nodes_deleted += len(dead)
        else:
            raise ValueError(f"cypher: DELETE target {tgt!r} is not "
                             "bound by the MATCH")
    return _summary(nodes_deleted=nodes_deleted,
                    relationships_deleted=rels_deleted)


def maybe_execute_write(graph, src: str):
    """Entry used by :meth:`CypherGraph.query` — returns the summary
    DataFrame for a write statement, or None for reads."""
    stmt = parse_write(src)
    if stmt is None:
        return None
    return execute_write(graph, stmt)
