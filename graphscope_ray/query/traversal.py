"""Gremlin-style fluent traversal surface over the Cypher executor.

GIE's other query language (``interactive_engine/compiler`` accepts
Gremlin; steps lower to the same relational algebra as Cypher). This
module gives the fluent builder: each step appends to an immutable
traversal, ``toDataset()/toList()`` compiles the step list into the
SAME :class:`~graphscope_ray.query.cypher.Query` AST the Cypher parser
produces and runs it through ``CypherGraph._execute`` — one executor,
two language frontends, exactly the reference's compiler shape.

Supported steps (tested in tests/test_traversal.py):
``g.V(label)``, ``has(key, value_or_P)``, ``hasId(value_or_P)``,
``out/ in_/ both(type)`` (optionally repeated via ``times``),
``optionalOut/ optionalIn/ optionalBoth(type)`` (left-outer single
hop — must come after the mandatory hops; a missing neighbor leaves
the new element null), ``as_(name)`` + ``select(*names)``,
``path()``, ``values(prop)``, ``id_()``, ``dedup()``,
``order().by(key, asc)``, ``limit(n)``, ``count()``,
``sum_/ min_/ max_/ mean(prop)``, ``groupCount()`` (by the current
element), ``group(key_prop, fn, prop)`` (by-key aggregation),
predicates ``P.eq/neq/gt/gte/lt/lte/within``,
``repeat_out/ repeat_in/ repeat_both(type, k, emit=…)`` (Gremlin
``repeat(out()).times(k)`` / ``…emit()``, lowered to the Cypher
variable-length segment), ``where(P.neq("tag"))`` (compare the current
element to an ``as_``-tagged one — cycle/anti filters),
``simplePath()``, ``hasE(key, value_or_P)`` (last hop's edge
property), ``union(other)``, and the existential neighbor filters
``whereOut/ whereNotOut/ whereIn/ whereNotIn/ whereBoth/
whereNotBoth(*types)`` (Gremlin ``where(out('T'))`` /
``where(__.not_(out('T')))`` — SEMI/ANTI joins), and the round-5 step
breadth: ``choose(key, P, then, otherwise)`` (CASE projection),
``coalesce_values(*props, default=…)`` (first non-null),
``project_(alias=spec, …)`` (``"~id"`` / ``"prop"`` / ``"@tag"`` /
``"@tag.prop"``), ``localCount(*types, direction=…)`` (per-element
neighbor count including zero — ``local(out().count())``), and
mid-traversal ``V_(id[, label])`` (jump to a concrete vertex; the
unrestricted cartesian ``V()`` restart is deliberately unsupported).
"""

from __future__ import annotations

from dataclasses import dataclass

import ray.data

from graphscope_ray.query.cypher import (
    Agg,
    BinOp,
    CaseExpr,
    CypherGraph,
    InOp,
    IsNull,
    Lit,
    NodePat,
    PathPat,
    Prop,
    Query,
    RelPat,
    RetItem,
    Var,
)


@dataclass(frozen=True)
class P:
    op: str
    value: object

    @staticmethod
    def eq(v):
        return P("=", v)

    @staticmethod
    def neq(v):
        return P("<>", v)

    @staticmethod
    def gt(v):
        return P(">", v)

    @staticmethod
    def gte(v):
        return P(">=", v)

    @staticmethod
    def lt(v):
        return P("<", v)

    @staticmethod
    def lte(v):
        return P("<=", v)

    @staticmethod
    def within(*vs):
        return P("in", list(vs))


class Traversal:
    """Immutable step chain; every fluent call returns a new one."""

    def __init__(self, graph: CypherGraph, label: str | None):
        self._g = graph
        self._nodes = [NodePat("v0", label, {})]
        self._rels: list = []
        self._patterns: list = []       # completed chains (V_() jumps)
        self._conjuncts: list = []
        self._optionals: list = []      # PathPat left-outer hops
        self._aliases: dict = {}        # as_() name -> node var
        self._current: str = "v0"       # var terminal steps project
        self._path_vars: list = ["v0"]  # every element, in step order
        self._tail: dict = {"distinct": False, "order": [],
                            "limit": None, "items": None}

    def _clone(self) -> "Traversal":
        t = Traversal.__new__(Traversal)
        t._g = self._g
        t._nodes = list(self._nodes)
        t._rels = list(self._rels)
        t._patterns = list(self._patterns)
        t._conjuncts = list(self._conjuncts)
        t._optionals = list(self._optionals)
        t._aliases = dict(self._aliases)
        t._current = self._current
        t._path_vars = list(self._path_vars)
        t._tail = {**self._tail, "order": list(self._tail["order"])}
        return t

    @property
    def _cur(self) -> str:
        return self._current

    # ---- filters
    def has(self, key: str, value) -> "Traversal":
        t = self._clone()
        if isinstance(value, P):
            if value.op == "in":
                t._conjuncts.append(InOp(Prop(t._cur, key), value.value))
            else:
                t._conjuncts.append(
                    BinOp(value.op, Prop(t._cur, key), Lit(value.value)))
        else:
            t._conjuncts.append(BinOp("=", Prop(t._cur, key), Lit(value)))
        return t

    def hasLabel(self, label: str) -> "Traversal":
        if self._current != self._nodes[-1].var:
            raise ValueError("traversal: hasLabel cannot follow an "
                             "optional hop")
        t = self._clone()
        n = t._nodes[-1]
        t._nodes[-1] = NodePat(n.var, label, n.props)
        return t

    def hasId(self, value) -> "Traversal":
        """Filter the current element's id (Gremlin hasId)."""
        t = self._clone()
        if isinstance(value, P):
            if value.op == "in":
                t._conjuncts.append(InOp(Var(t._cur), value.value))
            else:
                t._conjuncts.append(
                    BinOp(value.op, Var(t._cur), Lit(value.value)))
        else:
            t._conjuncts.append(BinOp("=", Var(t._cur), Lit(value)))
        return t

    # ---- step labeling (as/select/path)
    def as_(self, name: str) -> "Traversal":
        t = self._clone()
        t._aliases[name] = t._cur
        return t

    def select(self, *names: str) -> "Traversal":
        t = self._clone()
        items = []
        for n in names:
            if n not in t._aliases:
                raise KeyError(f"traversal: no step labeled {n!r}")
            items.append(RetItem(Var(t._aliases[n]), n))
        t._tail["items"] = items
        return t

    def path(self) -> "Traversal":
        """Project every element along the traversal, in step order."""
        t = self._clone()
        t._tail["items"] = [RetItem(Var(v), v) for v in t._path_vars]
        return t

    # ---- hops
    def _hop(self, rtype, direction, times) -> "Traversal":
        """``times`` int k → k single hops (each element addressable);
        (lo, hi) tuple → ONE variable-length segment binding only its
        endpoint (the Cypher ``*lo..hi`` / Gremlin repeat-emit path)."""
        if self._current != self._nodes[-1].var:
            raise ValueError("traversal: mandatory hops cannot follow "
                             "an optional hop (null keys cannot drive "
                             "an inner join)")
        t = self._clone()
        # name by the GLOBAL element count (len(_path_vars)), not the
        # current chain's length — after a V_() jump resets the chain,
        # chain-local indices would collide with pre-jump variables
        # and silently turn fresh hops into equality joins
        if isinstance(times, tuple):
            lo, hi = times
            i = len(t._path_vars)
            t._rels.append(RelPat(f"e{i}", rtype, direction, {},
                                  int(lo), int(hi)))
            t._nodes.append(NodePat(f"v{i}", None, {}))
            t._current = f"v{i}"
            t._path_vars.append(f"v{i}")
            return t
        for _ in range(times):
            i = len(t._path_vars)
            t._rels.append(RelPat(f"e{i}", rtype, direction, {}))
            t._nodes.append(NodePat(f"v{i}", None, {}))
            t._current = f"v{i}"
            t._path_vars.append(f"v{i}")
        return t

    @staticmethod
    def _rt(rtypes: tuple) -> "str | tuple | None":
        """Gremlin variadic edge labels: out() → any (single-table
        graphs), out('A') → one type, out('A', 'B') → the union of
        the per-type arc tables (RelPat tuple rtype)."""
        if not rtypes:
            return None
        return rtypes[0] if len(rtypes) == 1 else tuple(rtypes)

    @staticmethod
    def _rt_times(rtypes: tuple, times):
        # pre-variadic signature was out(rtype, times): keep a trailing
        # positional int working as `times`
        if rtypes and isinstance(rtypes[-1], int):
            return rtypes[:-1], rtypes[-1]
        return rtypes, times

    def out(self, *rtypes, times=1) -> "Traversal":
        rtypes, times = self._rt_times(rtypes, times)
        return self._hop(self._rt(rtypes), "out", times)

    def in_(self, *rtypes, times=1) -> "Traversal":
        rtypes, times = self._rt_times(rtypes, times)
        return self._hop(self._rt(rtypes), "in", times)

    def both(self, *rtypes, times=1) -> "Traversal":
        rtypes, times = self._rt_times(rtypes, times)
        return self._hop(self._rt(rtypes), "both", times)

    # ---- repeat/emit (Gremlin loop steps)
    def repeat_out(self, rtype: str | None = None, max_times: int = 1,
                   emit: bool = False, direction: str = "out"
                   ) -> "Traversal":
        """Gremlin ``repeat(out(T)).times(k)`` (``emit=False`` → only
        the k-th-hop frontier) / ``…emit().times(k)`` (``emit=True`` →
        every element reached within 1..k hops, one row per path —
        compose with ``dedup()`` for the distinct frontier). Lowers to
        the Cypher var-length relationship (`*lo..hi`), so the
        executor's per-k hop-union runs it; intermediate loop elements
        are not addressable (no ``as_`` inside the loop)."""
        if emit:
            return self._hop(rtype, direction, (1, max_times))
        return self._hop(rtype, direction, max_times)

    def repeat_in(self, rtype: str | None = None, max_times: int = 1,
                  emit: bool = False) -> "Traversal":
        return self.repeat_out(rtype, max_times, emit, "in")

    def repeat_both(self, rtype: str | None = None, max_times: int = 1,
                    emit: bool = False) -> "Traversal":
        return self.repeat_out(rtype, max_times, emit, "both")

    # ---- cross-step predicates
    def where(self, pred: "P") -> "Traversal":
        """Gremlin ``where(P.neq("a"))``: compare the CURRENT element's
        id to the element tagged ``a`` by an earlier ``as_("a")`` —
        the cycle/anti-join filter (e.g. mutual followers that aren't
        self: ``.as_("a").out().out().where(P.neq("a"))``)."""
        if pred.op == "in":
            raise ValueError("traversal: where(P.within) is not "
                             "supported — tag comparisons are scalar")
        tag = pred.value
        if tag not in self._aliases:
            raise KeyError(f"traversal: no step labeled {tag!r}")
        t = self._clone()
        t._conjuncts.append(
            BinOp(pred.op, Var(t._cur), Var(t._aliases[tag])))
        return t

    def _nbr_exists(self, rtypes, direction, neg) -> "Traversal":
        from graphscope_ray.query.cypher import PatternPred
        t = self._clone()
        t._conjuncts.append(PatternPred(
            neg, t._cur, RelPat(None, self._rt(rtypes), direction, {}),
            None))
        return t

    def whereOut(self, *rtypes: str) -> "Traversal":
        """Gremlin ``where(out('T'))``: keep elements with ≥1 outgoing
        T-neighbor (existential pattern predicate — SEMI join)."""
        return self._nbr_exists(rtypes, "out", False)

    def whereNotOut(self, *rtypes: str) -> "Traversal":
        """Gremlin ``where(__.not_(out('T')))`` — ANTI join."""
        return self._nbr_exists(rtypes, "out", True)

    def whereIn(self, *rtypes: str) -> "Traversal":
        return self._nbr_exists(rtypes, "in", False)

    def whereNotIn(self, *rtypes: str) -> "Traversal":
        return self._nbr_exists(rtypes, "in", True)

    def whereBoth(self, *rtypes: str) -> "Traversal":
        return self._nbr_exists(rtypes, "both", False)

    def whereNotBoth(self, *rtypes: str) -> "Traversal":
        return self._nbr_exists(rtypes, "both", True)

    def simplePath(self) -> "Traversal":
        """Keep only bindings whose mandatory chain visits pairwise
        distinct vertices (Gremlin simplePath). O(k²) conjuncts over
        the k chain elements so far; variable-length segments
        constrain their endpoints only (intermediates aren't bound)."""
        t = self._clone()
        vars_ = [n.var for n in t._nodes]
        for i in range(len(vars_)):
            for j in range(i + 1, len(vars_)):
                t._conjuncts.append(
                    BinOp("<>", Var(vars_[i]), Var(vars_[j])))
        return t

    def hasE(self, key: str, value) -> "Traversal":
        """Filter the LAST hop's edge property (Gremlin
        ``outE(T).has(key, …).inV()`` flattened). Single-hop edges
        only — variable-length segments cannot bind edge properties."""
        if not self._rels:
            raise ValueError("traversal: hasE needs a prior hop")
        rel = self._rels[-1]
        if rel.max_hops != 1:
            raise ValueError("traversal: hasE cannot follow a "
                             "variable-length hop")
        t = self._clone()
        if isinstance(value, P):
            if value.op == "in":
                t._conjuncts.append(InOp(Prop(rel.var, key), value.value))
            else:
                t._conjuncts.append(
                    BinOp(value.op, Prop(rel.var, key), Lit(value.value)))
        else:
            t._conjuncts.append(BinOp("=", Prop(rel.var, key), Lit(value)))
        return t

    def union(self, other: "Traversal") -> ray.data.Dataset:
        """Gremlin union(): both traversals' rows in one Dataset (the
        terminal projections must agree on column names)."""
        a, b = self.toDataset(), other.toDataset()
        if a.schema().names != b.schema().names:
            raise ValueError(
                f"traversal union: incompatible projections "
                f"{a.schema().names} vs {b.schema().names}")
        return a.union(b)

    # ---- optional (left-outer) hops — Gremlin optional(out(...))
    def _optional_hop(self, rtype, direction) -> "Traversal":
        if self._current != self._nodes[-1].var:
            raise ValueError("traversal: optional hops cannot chain "
                             "off another optional hop")
        t = self._clone()
        i = len(t._path_vars)   # globally unique across V_() jumps
        new = NodePat(f"o{i}", None, {})
        t._optionals.append(PathPat(
            [NodePat(t._current, None, {}), new],
            [RelPat(f"eo{i}", rtype, direction, {})]))
        # the optional element becomes current for terminal
        # projections; further mandatory hops from it are unsupported
        t._current = new.var
        t._path_vars.append(new.var)
        return t

    def optionalOut(self, rtype: str | None = None) -> "Traversal":
        return self._optional_hop(rtype, "out")

    def optionalIn(self, rtype: str | None = None) -> "Traversal":
        return self._optional_hop(rtype, "in")

    def optionalBoth(self, rtype: str | None = None) -> "Traversal":
        return self._optional_hop(rtype, "both")

    # ---- mid-traversal V (jump to a concrete vertex)
    def V_(self, vid: int, label: str | None = None) -> "Traversal":
        """Gremlin mid-traversal ``V(id)``: jump to the concrete
        vertex ``vid`` and keep traversing from it. The executor
        attaches the pinned id as a constant column (no cartesian
        product — the unrestricted ``V()`` restart is deliberately
        unsupported; anchor with an id)."""
        t = self._clone()
        t._patterns = t._patterns + [PathPat(t._nodes, t._rels)]
        var = f"m{len(t._path_vars)}"
        t._nodes = [NodePat(var, label, {})]
        t._rels = []
        t._conjuncts.append(BinOp("=", Var(var), Lit(int(vid))))
        t._current = var
        t._path_vars.append(var)
        return t

    # ---- choose / coalesce / project / local (GIE step breadth)
    def choose(self, key: str, pred: "P", then, otherwise
               ) -> "Traversal":
        """``choose(values(key).is(pred), constant(then),
        constant(otherwise))`` flattened: per element, project
        ``then`` when the property satisfies ``pred``, else
        ``otherwise`` — columns (id, choice)."""
        t = self._clone()
        item = Prop(t._cur, key)
        if pred.op == "in":
            cond = InOp(item, pred.value)
        else:
            cond = BinOp(pred.op, item, Lit(pred.value))
        t._tail["items"] = [
            RetItem(Var(t._cur), "id"),
            RetItem(CaseExpr([(cond, Lit(then))], Lit(otherwise)),
                    "choice")]
        return t

    def coalesce_values(self, *props: str, default=None) -> "Traversal":
        """``coalesce(values(p1), values(p2), …, constant(default))``:
        per element, the first non-null property (else the constant)
        — columns (id, value)."""
        t = self._clone()
        whens = [(IsNull(Prop(t._cur, p), neg=True), Prop(t._cur, p))
                 for p in props]
        t._tail["items"] = [
            RetItem(Var(t._cur), "id"),
            RetItem(CaseExpr(whens, Lit(default)), "value")]
        return t

    def project_(self, **specs) -> "Traversal":
        """``project('a','b').by(…)`` flattened to keywords: value
        ``"~id"`` → the current element's id, ``"@tag"`` → the element
        tagged by ``as_``, ``"@tag.prop"`` → that element's property,
        any other string → the current element's property."""
        t = self._clone()
        items = []
        for alias, spec in specs.items():
            if spec == "~id":
                items.append(RetItem(Var(t._cur), alias))
            elif spec.startswith("@"):
                ref = spec[1:]
                if "." in ref:
                    tag, prop = ref.split(".", 1)
                else:
                    tag, prop = ref, None
                if tag not in t._aliases:
                    raise KeyError(f"traversal: no step labeled {tag!r}")
                v = t._aliases[tag]
                items.append(RetItem(
                    Var(v) if prop is None else Prop(v, prop), alias))
            else:
                items.append(RetItem(Prop(t._cur, spec), alias))
        t._tail["items"] = items
        return t

    def localCount(self, *rtypes: str, direction: str = "out"
                   ) -> "Traversal":
        """``local(out('T').count())``: per-element neighbor count
        INCLUDING zero (a plain groupCount after a mandatory hop drops
        zero-degree elements) — columns (id, n). Lowered as a
        left-outer hop + null-skipping count."""
        pre = self._cur
        t = self._optional_hop(self._rt(rtypes), direction)
        ov = t._cur
        t._current = pre
        t._path_vars.pop()
        t._tail["items"] = [
            RetItem(Var(pre), "id"),
            RetItem(Agg("count", Var(ov)), "n")]
        return t

    # ---- terminal projections
    def values(self, *props: str) -> "Traversal":
        t = self._clone()
        t._tail["items"] = [RetItem(Prop(t._cur, p), p) for p in props]
        return t

    def valueMap(self, *props: str) -> "Traversal":
        """Gremlin valueMap: the element id plus the named properties
        (columns, not a nested dict — the tabular GIE sink shape)."""
        t = self._clone()
        t._tail["items"] = ([RetItem(Var(t._cur), "id")]
                            + [RetItem(Prop(t._cur, p), p)
                               for p in props])
        return t

    def id_(self) -> "Traversal":
        t = self._clone()
        t._tail["items"] = [RetItem(Var(t._cur), "id")]
        return t

    def dedup(self) -> "Traversal":
        t = self._clone()
        t._tail["distinct"] = True
        return t

    def order(self) -> "Traversal":
        return self._clone()

    def by(self, key: str | None = None, asc: bool = True) -> "Traversal":
        t = self._clone()
        items = t._tail["items"] or [RetItem(Var(t._cur), "id")]
        alias = items[0].alias if key is None else key
        t._tail["order"].append((Var(alias), asc))
        return t

    def limit(self, n: int) -> "Traversal":
        t = self._clone()
        t._tail["limit"] = int(n)
        return t

    # ---- aggregates
    def _agg(self, fn: str, prop: str | None) -> "Traversal":
        t = self._clone()
        arg = None if prop is None else Prop(t._cur, prop)
        t._tail["items"] = [RetItem(Agg(fn, arg), fn)]
        return t

    def count(self) -> "Traversal":
        return self._agg("count", None)

    def sum_(self, prop: str) -> "Traversal":
        return self._agg("sum", prop)

    def min_(self, prop: str) -> "Traversal":
        return self._agg("min", prop)

    def max_(self, prop: str) -> "Traversal":
        return self._agg("max", prop)

    def mean(self, prop: str) -> "Traversal":
        return self._agg("avg", prop)

    def std(self, prop: str) -> "Traversal":
        """Sample standard deviation (Cypher stDev)."""
        return self._agg("stdev", prop)

    def percentile(self, prop: str, p: float) -> "Traversal":
        """Interpolated percentile of the current element's property
        (Cypher percentileCont)."""
        t = self._clone()
        t._tail["items"] = [RetItem(
            Agg("percentilecont", Prop(t._cur, prop), param=p),
            "percentile")]
        return t

    def group(self, key_prop: str, fn: str,
              prop: str | None = None) -> "Traversal":
        """``group().by(key).by(agg)`` flattened: aggregate ``fn``
        (count/sum/min/max/avg) of the current element's ``prop``
        per distinct ``key_prop`` value."""
        t = self._clone()
        arg = None if prop is None else Prop(t._cur, prop)
        t._tail["items"] = [
            RetItem(Prop(t._cur, key_prop), "key"),
            RetItem(Agg(fn, arg), fn),
        ]
        return t

    def groupCount(self, prop: str | None = None) -> "Traversal":
        """Histogram of the current element (or one of its
        properties): RETURN key, count(*)."""
        t = self._clone()
        key = (RetItem(Var(t._cur), "key") if prop is None
               else RetItem(Prop(t._cur, prop), "key"))
        t._tail["items"] = [key, RetItem(Agg("count", None), "count")]
        return t

    # ---- execution
    def _to_query(self) -> Query:
        items = self._tail["items"] or [RetItem(Var(self._cur), "id")]
        where = None
        for c in self._conjuncts:
            where = c if where is None else BinOp("and", where, c)
        return Query(
            patterns=self._patterns + [PathPat(self._nodes, self._rels)],
            where=where,
            distinct=self._tail["distinct"],
            items=items,
            order=self._tail["order"],
            skip=None,
            limit=self._tail["limit"],
            optionals=list(self._optionals),
        )

    def toDataset(self) -> ray.data.Dataset:
        return self._g._execute(self._to_query())

    def toList(self) -> list:
        ds = self.toDataset()
        rows = ds.take_all()
        cols = ds.schema().names if rows else []
        if len(cols) == 1:
            return [r[cols[0]] for r in rows]
        return [tuple(r[c] for c in cols) for r in rows]


def traversal_source(graph: CypherGraph):
    """``g = traversal_source(cg); g.V("Person")…`` — the Gremlin
    ``GraphTraversalSource`` entry."""

    class _Source:
        def V(self, label: str | None = None) -> Traversal:
            return Traversal(graph, label)

    return _Source()
