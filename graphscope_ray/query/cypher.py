"""Cypher-subset frontend compiled onto the relational operator layer.

The reference's GIE compiler parses Cypher/Gremlin and lowers them to
its relational algebra (``interactive_engine/compiler/…`` →
``algebra.proto``: Scan/Project/Select/ExpandE/GetV/PathExpand/
GroupBy/OrderBy/Limit/Dedup). This module is that pipeline
Ray-Data-first: a hand-written tokenizer + recursive-descent parser
and a planner that lowers each clause onto ``stages/relational`` —
pattern hops become bucketed co-group joins (ExpandE+GetV), WHERE
becomes a vectorized batch mask (Select), RETURN aggregates become
``grouped_agg`` (GroupBy), ORDER/SKIP/LIMIT become sort + offset-rank
(OrderBy+Limit), DISTINCT becomes ``dedup_first`` (Dedup). Everything
streams; the driver never holds row data.

Supported subset (documented contract, tested in tests/test_cypher.py):

- ``MATCH`` with one or more comma-separated linear path patterns;
  shared variables join patterns. Directed ``-[e:T]->`` / ``<-[e:T]-``,
  undirected ``-[e:T]-``, variable-length ``-[:T*1..3]->`` (bounded;
  Cypher path-enumeration semantics — one binding row per distinct
  arc sequence, so multiple intermediates yield multiple rows and a
  2-cycle may return to the start; relationship-distinctness within a
  path is not enforced for hops ≥ 3 — fuzz-pinned vs a walk-counting
  oracle in tests/test_fuzz_cypher.py), alternative relationship
  types ``-[e:A|B]->`` (union of the per-type arc tables; ``e``'s
  properties ride each type's own rows),
  inline property maps ``{k: v}`` as equality filters.
- ``MATCH p = shortestPath((a)-[:T*lo..hi]->(b))`` — min-hop-per-pair
  BFS (GIE ShortestPathExpand via ``relational.path_expand``):
  binds every (a, b) pair whose shortest T-distance falls in
  [lo, hi]; ``length(p)`` returns the hop count; a == b never binds
  (distance 0). Either the first pattern, or starts on a bound
  variable with a fresh end.
- ``OPTIONAL MATCH`` patterns after the mandatory MATCH (left-outer
  expand — GIE's optional EdgeExpand). Each optional pattern must
  START on an already-bound variable and bind only fresh variables
  otherwise; the whole pattern matches or every variable it binds is
  null (the sub-pattern inner-joins first, then one left join
  attaches it). Properties of optional variables ride the
  sub-pattern, so they are null exactly when the pattern missed.
- ``UNWIND [literals] AS x`` — before MATCH (standalone row source)
  or after it (per-binding replication). Literal lists only.
- ``WHERE`` with comparisons (=, <>, <, <=, >, >=), arithmetic
  (+ - * /), AND/OR/NOT, parentheses, ``x.p IN [lits]``,
  ``x.p STARTS WITH / ENDS WITH / CONTAINS 'lit'``, and
  ``x IS [NOT] NULL`` (null comparisons filter, as in Cypher).
  Pattern predicates ``[NOT] (a)-[:T]->(b)`` and the existential
  ``[NOT] (a)-[:T]->()`` (GIE SEMI/ANTI join —
  ``relational.cogroup_pair_semi`` on the endpoint pair, or on the
  key against the arc-src set) as top-level AND-conjuncts over bound,
  non-OPTIONAL variables; single property-free hop, any direction,
  alternative types allowed.
- ``RETURN [DISTINCT]`` of ``var`` (the vertex id), ``var.prop``,
  arithmetic expressions (+ - * / %), ``CASE WHEN … THEN … [ELSE …]
  END`` (first-match; omitted ELSE is null), and aggregates
  ``count(*) / count(x) / count(DISTINCT x) / sum / min / max / avg /
  collect / percentileCont(x, p) / percentileDisc(x, p) / stDev /
  stDevP`` with ``AS`` aliases; every aggregate but ``count(*)``
  skips nulls (Cypher semantics); non-aggregate items become the
  grouping keys (grouping by a nullable optional variable is
  unsupported — filter ``IS NOT NULL`` first).
- ``WITH [DISTINCT] … [WHERE …]`` chains (projection/aggregation
  stages with HAVING-style filters; later stages reference the
  projected aliases).
- ``ORDER BY … [ASC|DESC]``, ``SKIP n``, ``LIMIT n``.
- Write statements — ``CREATE`` / ``MERGE`` / ``SET`` / ``DELETE`` /
  ``DETACH DELETE`` (CypherGS.g4 oC_Create/oC_Merge/oC_Set/oC_Delete)
  — parse and execute in :mod:`graphscope_ray.query.writes`, lowered
  onto ``stages/graph_ops.modify_*``; ``query()`` returns their
  Neo4j-style counter summary instead of a Dataset.

Pattern matching is homomorphic (variables may bind the same vertex
unless constrained) — GIE's default as well.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# ------------------------------------------------------------ tokens
_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<num>\d+\.\d+|\d+)
    | (?P<str>'[^']*'|"[^"]*")
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<punct><=|>=|<>|\.\.|->|<-|[()\[\]{},:.\-<>=+*/%|])
    )""", re.VERBOSE)

# NOTE: the write-clause words (CREATE/MERGE/SET/DELETE/DETACH) are
# deliberately NOT keywords — they stay ordinary name tokens so read
# queries can keep using them as property/alias/variable names
# (`RETURN n.set`); query/writes.py recognizes them positionally.
_KEYWORDS = {"MATCH", "WHERE", "RETURN", "WITH", "ORDER", "BY",
             "LIMIT", "SKIP", "AS", "DISTINCT", "AND", "OR", "NOT",
             "ASC", "DESC", "IN", "TRUE", "FALSE", "NULL",
             "OPTIONAL", "UNWIND", "STARTS", "ENDS", "CONTAINS", "IS",
             "CASE", "WHEN", "THEN", "ELSE", "END"}


def _tokenize(src: str) -> list[tuple[str, object]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise ValueError(f"cypher: cannot tokenize at {src[pos:pos+20]!r}")
            break
        pos = m.end()
        if m.group("num"):
            v = m.group("num")
            out.append(("num", float(v) if "." in v else int(v)))
        elif m.group("str"):
            out.append(("str", m.group("str")[1:-1]))
        elif m.group("name"):
            n = m.group("name")
            up = n.upper()
            out.append(("kw", up) if up in _KEYWORDS else ("name", n))
        else:
            out.append(("punct", m.group("punct")))
    out.append(("eof", None))
    return out


# --------------------------------------------------------------- AST
@dataclass
class NodePat:
    var: str | None
    label: str | None
    props: dict


@dataclass
class RelPat:
    var: str | None
    rtype: str | None
    direction: str          # "out" | "in" | "both"
    props: dict
    min_hops: int = 1
    max_hops: int = 1


@dataclass
class PathPat:
    nodes: list
    rels: list
    name: str | None = None        # `p = …` path variable
    shortest: bool = False         # `shortestPath(…)` wrapper


@dataclass
class Prop:
    var: str
    name: str


@dataclass
class Var:
    var: str


@dataclass
class Lit:
    value: object


@dataclass
class BinOp:
    op: str
    left: object
    right: object


@dataclass
class NotOp:
    item: object


@dataclass
class InOp:
    item: object
    values: list


@dataclass
class IsNull:
    item: object
    neg: bool               # True → IS NOT NULL


@dataclass
class StrPred:
    op: str                 # "startswith" | "endswith" | "contains"
    item: object
    arg: object             # literal string expr


@dataclass
class Agg:
    fn: str                 # count/sum/min/max/avg/collect/percentile…
    arg: object             # expr or None for count(*)
    distinct: bool = False
    param: object = None    # percentile fraction for percentileCont/Disc


@dataclass
class CaseExpr:
    whens: list             # [(cond_expr, value_expr)]
    default: object         # ELSE expr (Lit(None) when omitted)


@dataclass
class PatternPred:
    """``WHERE [NOT] (a)-[:T]->(b)`` — single-hop pattern predicate
    between two bound variables (GIE SEMI/ANTI join)."""
    neg: bool
    left: str
    rel: object            # RelPat, single hop, no props
    right: str


@dataclass
class RetItem:
    expr: object
    alias: str


@dataclass
class Query:
    patterns: list
    where: object | None
    distinct: bool
    items: list
    order: list             # [(alias_or_expr, asc)]
    skip: int | None
    limit: int | None
    #: chained WITH stages: [(items, distinct, where_after)] — each
    #: projects/aggregates the stream, the optional WHERE filters the
    #: aggregated rows (HAVING); later stages reference bare aliases
    withs: list = field(default_factory=list)
    #: OPTIONAL MATCH patterns (left-outer, applied after `patterns`)
    optionals: list = field(default_factory=list)
    #: UNWIND stages: [(name, [literal values])] — applied before WHERE
    unwinds: list = field(default_factory=list)


_AGG_FNS = {"count", "sum", "min", "max", "avg", "collect",
            "percentilecont", "percentiledisc", "stdev", "stdevp"}


class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, val=None):
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise ValueError(f"cypher: expected {val or kind}, got {t}")
        return t

    def accept(self, kind, val=None):
        t = self.peek()
        if t[0] == kind and (val is None or t[1] == val):
            self.i += 1
            return True
        return False

    # ---- query
    def unwind_clause(self) -> tuple:
        self.expect("punct", "[")
        vals: list = []
        if not self.accept("punct", "]"):
            vals = [self.literal()]
            while self.accept("punct", ","):
                vals.append(self.literal())
            self.expect("punct", "]")
        self.expect("kw", "AS")
        return (self.expect("name")[1], vals)

    def parse(self) -> Query:
        unwinds: list = []
        while self.accept("kw", "UNWIND"):
            unwinds.append(self.unwind_clause())
        patterns: list = []
        if self.accept("kw", "MATCH"):
            patterns = [self.pattern()]
            while self.accept("punct", ","):
                patterns.append(self.pattern())
        elif not unwinds:
            self.expect("kw", "MATCH")   # raises the usual error
        optionals: list = []
        while self.accept("kw", "OPTIONAL"):
            self.expect("kw", "MATCH")
            if not patterns:
                raise ValueError("cypher: OPTIONAL MATCH needs a "
                                 "mandatory MATCH first")
            optionals.append(self.pattern())
        where = None
        if self.accept("kw", "WHERE"):
            where = self.expr()
        while self.accept("kw", "UNWIND"):
            unwinds.append(self.unwind_clause())
        # WHERE may also follow the UNWINDs (both filter the same
        # stream — unwinds replicate before the filter runs)
        if self.accept("kw", "WHERE"):
            w2 = self.expr()
            where = w2 if where is None else BinOp("and", where, w2)
        withs = []
        while self.accept("kw", "WITH"):
            wdistinct = self.accept("kw", "DISTINCT")
            witems = [self.ret_item()]
            while self.accept("punct", ","):
                witems.append(self.ret_item())
            wwhere = None
            if self.accept("kw", "WHERE"):
                wwhere = self.expr()
            withs.append((witems, wdistinct, wwhere))
        self.expect("kw", "RETURN")
        distinct = self.accept("kw", "DISTINCT")
        items = [self.ret_item()]
        while self.accept("punct", ","):
            items.append(self.ret_item())
        order: list = []
        if self.accept("kw", "ORDER"):
            self.expect("kw", "BY")
            order.append(self.order_item())
            while self.accept("punct", ","):
                order.append(self.order_item())
        skip = limit = None
        if self.accept("kw", "SKIP"):
            skip = int(self.expect("num")[1])
        if self.accept("kw", "LIMIT"):
            limit = int(self.expect("num")[1])
        self.expect("eof")
        return Query(patterns, where, distinct, items, order, skip,
                     limit, withs=withs, optionals=optionals,
                     unwinds=unwinds)

    # ---- patterns
    def pattern(self) -> PathPat:
        name = None
        shortest = False
        if self.peek()[0] == "name":
            nm = self.next()[1]
            if (nm.lower() == "shortestpath"
                    and self.peek() == ("punct", "(")):
                shortest = True
            else:
                name = nm
                self.expect("punct", "=")
                t = self.peek()
                if t[0] == "name" and t[1].lower() == "shortestpath":
                    self.next()
                    shortest = True
        if shortest:
            self.expect("punct", "(")
        pat = self.pattern_body()
        if shortest:
            self.expect("punct", ")")
            if len(pat.rels) != 1:
                raise ValueError("cypher: shortestPath needs exactly "
                                 "one relationship")
        elif name is not None:
            raise ValueError("cypher: named paths are only supported "
                             "with shortestPath(...) — length(p) of a "
                             "plain pattern is not implemented")
        pat.name = name
        pat.shortest = shortest
        return pat

    def pattern_body(self) -> PathPat:
        nodes = [self.node()]
        rels = []
        while self.peek() == ("punct", "-") or self.peek() == ("punct", "<-"):
            rels.append(self.rel())
            nodes.append(self.node())
        return PathPat(nodes, rels)

    def node(self) -> NodePat:
        self.expect("punct", "(")
        var = label = None
        props: dict = {}
        if self.peek()[0] == "name":
            var = self.next()[1]
        if self.accept("punct", ":"):
            label = self.expect("name")[1]
        if self.peek() == ("punct", "{"):
            props = self.prop_map()
        self.expect("punct", ")")
        return NodePat(var, label, props)

    def rel(self) -> RelPat:
        direction = "both"
        t = self.next()
        if t == ("punct", "<-"):
            direction = "in"
        elif t != ("punct", "-"):
            raise ValueError(f"cypher: bad relationship start {t}")
        var = rtype = None
        props: dict = {}
        lo = hi = 1
        if self.accept("punct", "["):
            if self.peek()[0] == "name":
                var = self.next()[1]
            if self.accept("punct", ":"):
                rtype = self.expect("name")[1]
                alts = [rtype]
                while self.accept("punct", "|"):
                    alts.append(self.expect("name")[1])
                if len(alts) > 1:
                    rtype = tuple(alts)
            if self.accept("punct", "*"):
                lo = int(self.expect("num")[1])
                self.expect("punct", "..")
                hi = int(self.expect("num")[1])
                if not (1 <= lo <= hi <= 8):
                    raise ValueError("cypher: *lo..hi must satisfy "
                                     "1 <= lo <= hi <= 8")
            if self.peek() == ("punct", "{"):
                props = self.prop_map()
            self.expect("punct", "]")
        if self.accept("punct", "->"):
            if direction == "in":
                raise ValueError("cypher: <-…-> is not a direction")
            direction = "out"
        else:
            self.expect("punct", "-")
            # "<-[…]-" keeps direction "in"; "-[…]-" stays "both"
        return RelPat(var, rtype, direction, props, lo, hi)

    def prop_map(self) -> dict:
        self.expect("punct", "{")
        out = {}
        while True:
            k = self.expect("name")[1]
            self.expect("punct", ":")
            out[k] = self.literal()
            if not self.accept("punct", ","):
                break
        self.expect("punct", "}")
        return out

    def literal(self):
        if self.accept("punct", "-"):
            v = self.literal()
            return -v
        t = self.next()
        if t[0] in ("num", "str"):
            return t[1]
        if t == ("kw", "TRUE"):
            return True
        if t == ("kw", "FALSE"):
            return False
        raise ValueError(f"cypher: expected literal, got {t}")

    # ---- expressions (precedence: OR < AND < NOT < cmp < add < mul)
    def expr(self):
        e = self.and_expr()
        while self.accept("kw", "OR"):
            e = BinOp("or", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.not_expr()
        while self.accept("kw", "AND"):
            e = BinOp("and", e, self.not_expr())
        return e

    def not_expr(self):
        pp = self._try_pattern_pred(False)
        if pp is not None:
            return pp
        if self.accept("kw", "NOT"):
            pp = self._try_pattern_pred(True)
            if pp is not None:
                return pp
            return NotOp(self.not_expr())
        return self.cmp_expr()

    def _try_pattern_pred(self, neg: bool):
        """Lookahead for ``(var)-[:T]->(var)`` at predicate position —
        backtracks cleanly when the '(' opens an ordinary
        parenthesized expression."""
        save = self.i
        if not self.accept("punct", "("):
            return None
        if self.peek()[0] != "name":
            self.i = save
            return None
        left = self.next()[1]
        if not self.accept("punct", ")") or self.peek() not in (
                ("punct", "-"), ("punct", "<-")):
            self.i = save
            return None
        try:
            rel = self.rel()
            self.expect("punct", "(")
            right = None
            if self.peek()[0] == "name":
                right = self.next()[1]
            self.expect("punct", ")")
        except ValueError:
            # `(a) - 1 > 0`-style arithmetic: the '(' opened an
            # ordinary parenthesized expression — backtrack
            self.i = save
            return None
        if rel.min_hops != 1 or rel.max_hops != 1 or rel.props:
            raise ValueError("cypher: pattern predicates support a "
                             "single property-free hop")
        if rel.var is not None:
            # openCypher rejects introducing new variables inside a
            # pattern expression — raise here instead of silently
            # dropping the binding (a later reference to it would
            # otherwise fail with a confusing downstream error)
            raise ValueError(
                "cypher: a pattern predicate cannot introduce a "
                f"relationship variable ({rel.var!r})")
        return PatternPred(neg, left, rel, right)

    def cmp_expr(self):
        e = self.add_expr()
        if self.accept("kw", "IN"):
            self.expect("punct", "[")
            vals = [self.literal()]
            while self.accept("punct", ","):
                vals.append(self.literal())
            self.expect("punct", "]")
            return InOp(e, vals)
        if self.accept("kw", "IS"):
            neg = self.accept("kw", "NOT")
            self.expect("kw", "NULL")
            return IsNull(e, neg)
        if self.accept("kw", "STARTS"):
            self.expect("kw", "WITH")
            return StrPred("startswith", e, self.add_expr())
        if self.accept("kw", "ENDS"):
            self.expect("kw", "WITH")
            return StrPred("endswith", e, self.add_expr())
        if self.accept("kw", "CONTAINS"):
            return StrPred("contains", e, self.add_expr())
        t = self.peek()
        if t[0] == "punct" and t[1] in ("=", "<>", "<", "<=", ">", ">="):
            self.next()
            return BinOp(t[1], e, self.add_expr())
        return e

    def add_expr(self):
        e = self.mul_expr()
        while self.peek()[0] == "punct" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            e = BinOp(op, e, self.mul_expr())
        return e

    def mul_expr(self):
        e = self.atom()
        while (self.peek()[0] == "punct"
               and self.peek()[1] in ("*", "/", "%")):
            op = self.next()[1]
            e = BinOp(op, e, self.atom())
        return e

    def atom(self):
        t = self.peek()
        if t == ("kw", "CASE"):
            self.next()
            whens = []
            while self.accept("kw", "WHEN"):
                cond = self.expr()
                self.expect("kw", "THEN")
                whens.append((cond, self.expr()))
            if not whens:
                raise ValueError("cypher: CASE needs at least one WHEN")
            default = Lit(None)
            if self.accept("kw", "ELSE"):
                default = self.expr()
            self.expect("kw", "END")
            return CaseExpr(whens, default)
        if t == ("punct", "-"):
            self.next()
            return BinOp("-", Lit(0), self.atom())
        if t == ("punct", "("):
            self.next()
            e = self.expr()
            self.expect("punct", ")")
            return e
        if t[0] in ("num", "str") or t[1] in ("TRUE", "FALSE"):
            return Lit(self.literal())
        if t[0] == "name":
            name = self.next()[1]
            if name.lower() == "length" and self.peek() == ("punct", "("):
                self.next()
                p = self.expect("name")[1]
                self.expect("punct", ")")
                # hop count of a named path: the planner materializes
                # it as the `<p>__len` column
                return Prop(p, "len")
            if name.lower() in _AGG_FNS and self.peek() == ("punct", "("):
                self.next()
                distinct = self.accept("kw", "DISTINCT")
                if self.accept("punct", "*"):
                    arg = None
                else:
                    arg = self.expr()
                param = None
                if self.accept("punct", ","):
                    param = self.literal()
                self.expect("punct", ")")
                fn = name.lower()
                if fn in ("percentilecont", "percentiledisc"):
                    if not isinstance(param, (int, float)) \
                            or not 0 <= param <= 1:
                        raise ValueError(f"cypher: {name} needs a "
                                         "percentile in [0, 1]")
                return Agg(fn, arg, distinct, param)
            if self.accept("punct", "."):
                prop = self.expect("name")[1]
                return Prop(name, prop)
            return Var(name)
        raise ValueError(f"cypher: unexpected token {t}")

    def ret_item(self) -> RetItem:
        e = self.expr()
        alias = None
        if self.accept("kw", "AS"):
            alias = self.expect("name")[1]
        if alias is None:
            if isinstance(e, Prop):
                alias = f"{e.var}_{e.name}"
            elif isinstance(e, Var):
                alias = e.var
            elif isinstance(e, Agg):
                alias = e.fn
            else:
                raise ValueError("cypher: computed RETURN items need AS")
        return RetItem(e, alias)

    def order_item(self):
        e = self.expr()
        asc = True
        if self.accept("kw", "DESC"):
            asc = False
        else:
            self.accept("kw", "ASC")
        return (e, asc)


def parse_cypher(src: str) -> Query:
    return _Parser(src).parse()


# ----------------------------------------------------------- planner
def _expr_vars(e, out: set, props: list):
    """Collect referenced variable names; append Prop nodes to props."""
    if isinstance(e, Var):
        out.add(e.var)
    elif isinstance(e, Prop):
        out.add(e.var)
        props.append(e)
    elif isinstance(e, BinOp):
        _expr_vars(e.left, out, props)
        _expr_vars(e.right, out, props)
    elif isinstance(e, NotOp):
        _expr_vars(e.item, out, props)
    elif isinstance(e, (InOp, IsNull)):
        _expr_vars(e.item, out, props)
    elif isinstance(e, StrPred):
        _expr_vars(e.item, out, props)
        _expr_vars(e.arg, out, props)
    elif isinstance(e, CaseExpr):
        for c, v in e.whens:
            _expr_vars(c, out, props)
            _expr_vars(v, out, props)
        _expr_vars(e.default, out, props)
    elif isinstance(e, Agg) and e.arg is not None:
        _expr_vars(e.arg, out, props)
    elif isinstance(e, PatternPred):
        out.add(e.left)
        if e.right is not None:
            out.add(e.right)


def _expr_props(e, out: set):
    """Collect referenced (var, prop) pairs."""
    if isinstance(e, Prop):
        out.add((e.var, e.name))
    elif isinstance(e, BinOp):
        _expr_props(e.left, out)
        _expr_props(e.right, out)
    elif isinstance(e, NotOp):
        _expr_props(e.item, out)
    elif isinstance(e, InOp):
        _expr_props(e.item, out)
    elif isinstance(e, IsNull):
        _expr_props(e.item, out)
    elif isinstance(e, StrPred):
        _expr_props(e.item, out)
        _expr_props(e.arg, out)
    elif isinstance(e, CaseExpr):
        for c, v in e.whens:
            _expr_props(c, out)
            _expr_props(v, out)
        _expr_props(e.default, out)
    elif isinstance(e, Agg) and e.arg is not None:
        _expr_props(e.arg, out)


def _local_props(e) -> list:
    """All Prop nodes referenced by an expression."""
    out: set = set()
    props: list = []
    _expr_vars(e, out, props)
    return props


def _null_mask(v, df):
    """Null positions of an operand (False scalar when not a Series)."""
    return v.isna() if hasattr(v, "isna") else False


def _kleene(r, na, df):
    """Boolean result with pd.NA where an input was null — pandas'
    nullable ``boolean`` dtype implements Kleene and/or/not, giving
    Cypher's ternary logic for free once comparisons propagate NA."""
    if not hasattr(r, "astype"):
        return r
    out = pd.Series(r, index=df.index).astype("boolean")
    if np.any(na):
        out[na] = pd.NA
    return out


def _eval(e, df: pd.DataFrame):
    """Vectorized expression evaluation over the binding frame.

    Predicates return the nullable ``boolean`` dtype with pd.NA where
    an operand was null (an OPTIONAL MATCH miss): comparisons, IN and
    string predicates against null are null; AND/OR/NOT follow Kleene
    logic; the WHERE filter then drops non-True rows — Cypher's
    ternary-null contract."""
    if isinstance(e, Lit):
        return e.value
    if isinstance(e, Var):
        return df[e.var]
    if isinstance(e, Prop):
        return df[f"{e.var}__{e.name}"]
    if isinstance(e, NotOp):
        v = _eval(e.item, df)
        if not hasattr(v, "astype"):
            return not v
        return ~v.astype("boolean")
    if isinstance(e, InOp):
        v = _eval(e.item, df)
        if not hasattr(v, "isin"):
            v = pd.Series(v, index=df.index)
        return _kleene(v.isin(e.values), _null_mask(v, df), df)
    if isinstance(e, IsNull):
        v = _eval(e.item, df)
        if not hasattr(v, "isna"):
            v = pd.Series(v, index=df.index)
        m = v.isna()
        return ~m if e.neg else m
    if isinstance(e, StrPred):
        v = _eval(e.item, df)
        arg = _eval(e.arg, df)
        if not isinstance(arg, str):
            raise ValueError("cypher: STARTS WITH / ENDS WITH / "
                             "CONTAINS needs a string literal")
        if not hasattr(v, "str"):
            v = pd.Series(v, index=df.index)
        if e.op == "contains":
            r = v.str.contains(arg, regex=False)
        else:
            r = getattr(v.str, e.op)(arg)
        # .str methods yield NaN on nulls already — normalize to NA
        return pd.Series(r, index=df.index).astype("boolean")
    if isinstance(e, CaseExpr):
        dv = _eval(e.default, df)
        if not isinstance(dv, pd.Series):
            dv = pd.Series([dv] * len(df), index=df.index)
        res = dv.copy()
        # apply WHENs in reverse so the FIRST matching branch wins
        for cond, val in reversed(e.whens):
            m = _eval(cond, df)
            if not hasattr(m, "fillna"):
                m = pd.Series(m, index=df.index)
            m = np.asarray(m.fillna(False), bool)
            v = _eval(val, df)
            res = res.mask(m, v)
        return res
    if isinstance(e, BinOp):
        a, b = _eval(e.left, df), _eval(e.right, df)
        if e.op in ("=", "<>", "<", "<=", ">", ">="):
            na = _null_mask(a, df) | _null_mask(b, df)
            r = {
                "=": lambda: a == b, "<>": lambda: a != b,
                "<": lambda: a < b, "<=": lambda: a <= b,
                ">": lambda: a > b, ">=": lambda: a >= b,
            }[e.op]()
            return _kleene(r, na, df)
        if e.op in ("and", "or"):
            if hasattr(a, "astype"):
                a = a.astype("boolean")
            if hasattr(b, "astype"):
                b = b.astype("boolean")
            return (a & b) if e.op == "and" else (a | b)
        return {
            "+": lambda: a + b, "-": lambda: a - b,
            "*": lambda: a * b, "/": lambda: a / b,
            "%": lambda: a % b,
        }[e.op]()
    raise ValueError(f"cypher: cannot evaluate {e!r}")


class CypherGraph:
    """Property-graph catalog + Cypher executor.

    ``add_vertices(label, ds, vid_col)`` registers a vertex table
    (unique ids required); ``add_edges(rtype, ds, src, dst)`` an edge
    table; ``query(cypher)`` returns a Ray Dataset. All intermediate
    state is Datasets — patterns grow a streaming *binding table* with
    one int64 column per bound variable plus lazily-joined
    ``var__prop`` property columns (only properties the query actually
    references are ever joined — the GIE column-prune contract)."""

    def __init__(self, num_buckets: int = 16, optimize: bool = True):
        """``num_buckets`` sizes every bucketed exchange (joins and
        aggregates) a query plans — set ≳ cluster cores at scale; the
        default favors low fixed overhead on small graphs.
        ``optimize`` enables cardinality-ordered pattern planning
        (GLogue-style); disable to force source-order planning (the
        naive baseline the planning pytest compares against)."""
        self._v: dict[str, tuple] = {}
        self._e: dict[str, tuple] = {}
        self.num_buckets = int(num_buckets)
        self.optimize = bool(optimize)
        #: set by the planner on every multi-pattern/reorderable query:
        #: {"order": [source indices], "reversed": [bool], "est": [float]}
        self.last_plan: dict | None = None

    def add_vertices(self, label: str, ds: ray.data.Dataset,
                     vid_col: str = "vid") -> "CypherGraph":
        self._v[label] = (ds, vid_col)
        self._vid_cache: dict = {}
        return self

    def _label_vids(self, label: str):
        """Label's vid set as a driver numpy array when it fits the
        broadcast limit (cached), else None → co-group path."""
        import numpy as _np

        from graphscope_ray.pipelines.triangles import (
            BROADCAST_LIMIT_ROWS,
        )
        cache = getattr(self, "_vid_cache", None)
        if cache is None:
            cache = self._vid_cache = {}
        if label in cache:
            return cache[label]
        vds = self._vertex_ds(label)
        n = vds.count()
        out = None
        if n <= BROADCAST_LIMIT_ROWS:
            out = _np.concatenate([
                b["vid"] for b in vds.iter_batches(batch_format="numpy")
            ] or [_np.empty(0, _np.int64)]).astype(_np.int64)
        cache[label] = out
        return out

    def add_edges(self, rtype: str, ds: ray.data.Dataset,
                  src: str = "src", dst: str = "dst") -> "CypherGraph":
        self._e[rtype] = (ds, src, dst)
        return self

    # -- planner statistics (GLogue-style cardinality ordering)
    def _graph_stats(self) -> dict:
        """Cheap catalog statistics for join ordering — per-label
        vertex counts and per-type arc counts (the reference's GLogue
        keeps pattern-cardinality estimates the same way,
        interactive_engine/compiler/…/glogue/GlogueQuery.java). One
        ``count()`` per table, cached for the catalog's lifetime —
        a metadata read on materialized/parquet-backed tables."""
        st = getattr(self, "_stats", None)
        if st is not None:
            return st
        st = {"v": {lb: ds.count() for lb, (ds, _) in self._v.items()},
              "e": {rt: ds.count() for rt, (ds, _, _) in self._e.items()}}
        st["nv"] = max(sum(st["v"].values()), 1)
        self._stats = st
        return st

    @staticmethod
    def _conjunct_selectivity(conjuncts: list) -> dict:
        """Heuristic per-variable selectivity from pushable single-
        variable conjuncts (equality ≪ modulo ≪ IN ≪ range) — constants
        only need to ORDER anchors, not predict true cardinalities."""
        sel: dict[str, float] = {}

        def one(c) -> "tuple[str, float] | None":
            vs: set = set()
            ps: list = []
            _expr_vars(c, vs, ps)
            if len(vs) != 1 or isinstance(c, PatternPred):
                return None
            v = next(iter(vs))
            if isinstance(c, BinOp) and c.op == "=":
                # `x % k = 0`-style: selectivity 1/k
                for side in (c.left, c.right):
                    if isinstance(side, BinOp) and side.op == "%" \
                            and isinstance(side.right, Lit) \
                            and isinstance(side.right.value, (int, float)) \
                            and side.right.value:
                        return v, 1.0 / abs(side.right.value)
                return v, 0.001
            if isinstance(c, InOp):
                return v, min(0.001 * max(len(c.values), 1), 0.5)
            if isinstance(c, BinOp) and c.op in ("<", "<=", ">", ">="):
                return v, 0.33
            if isinstance(c, StrPred):
                return v, 0.1
            return None

        for c in conjuncts:
            got = one(c)
            if got is not None:
                v, s = got
                sel[v] = sel.get(v, 1.0) * s
        return sel

    def _order_patterns(self, patterns: list, conjuncts: list) -> list:
        """Cardinality-ordered pattern planning for multi-pattern MATCH
        (and anchor-side choice within a chain): greedily pick the
        cheapest startable pattern — possibly REVERSED so its selective
        end anchors the expansion — using per-label counts, per-type
        average degrees and conjunct selectivities. A fixed source
        order on a cyclic pattern over a skewed graph blows up
        intermediates even though every operator streams; this is the
        reference compiler's GLogue ordering re-expressed over catalog
        stats. shortestPath patterns keep source order (their own
        anchored-pushdown logic is already cardinality-aware)."""
        if any(p.shortest for p in patterns):
            self.last_plan = None
            return patterns
        st = self._graph_stats()
        sel = self._conjunct_selectivity(conjuncts)
        # vars pinned to a literal id can START an additional pattern
        # (the executor attaches them as constant columns)
        pinned_vars: set = set()
        for c in conjuncts:
            if isinstance(c, BinOp) and c.op == "=":
                for a, b in ((c.left, c.right), (c.right, c.left)):
                    if (isinstance(a, Var) and isinstance(b, Lit)
                            and isinstance(b.value, int)):
                        pinned_vars.add(a.var)

        def n_label(node) -> float:
            if node.label is not None and node.label in st["v"]:
                return max(st["v"][node.label], 1)
            return float(st["nv"])

        def fanout(rel) -> float:
            rts = (rel.rtype if isinstance(rel.rtype, tuple)
                   else (rel.rtype,))
            rows = 0.0
            for rt in rts:
                if rt is None:
                    rows += sum(st["e"].values())
                else:
                    rows += st["e"].get(rt, 0)
            if rel.direction == "both":
                rows *= 2.0
            return max(rows / st["nv"], 1e-3)

        def reverse(pat: PathPat) -> PathPat:
            flip = {"out": "in", "in": "out", "both": "both"}
            rels = [RelPat(r.var, r.rtype, flip[r.direction], r.props,
                           r.min_hops, r.max_hops)
                    for r in reversed(pat.rels)]
            out = PathPat(list(reversed(pat.nodes)), rels)
            out.name, out.shortest = pat.name, pat.shortest
            return out

        def cost(pat: PathPat, bound: set) -> float:
            first = pat.nodes[0]
            card = (1.0 if first.var in bound
                    else n_label(first) * sel.get(first.var, 1.0))
            total = card
            for rel, node in zip(pat.rels, pat.nodes[1:]):
                # var-length: pessimistic max-hop fan-out product
                card *= fanout(rel) ** rel.max_hops
                card *= sel.get(node.var, 1.0)
                if node.var in bound:
                    # closing a cycle / joining a bound var filters
                    card /= max(n_label(node), 1.0)
                total += card
            return total

        remaining = list(enumerate(patterns))
        chosen: list = []
        order: list = []
        rev_flags: list = []
        ests: list = []
        bound: set = set()
        while remaining:
            best = None
            for pos, (idx, pat) in enumerate(remaining):
                cands = [(pat, False)]
                if pat.rels:
                    cands.append((reverse(pat), True))
                for cand, rv in cands:
                    startable = (not bound
                                 or cand.nodes[0].var in bound
                                 or cand.nodes[0].var in pinned_vars)
                    if not startable:
                        continue
                    c = cost(cand, bound)
                    if best is None or c < best[0]:
                        best = (c, pos, idx, cand, rv)
            if best is None:
                # no startable pattern (disconnected) — fall back to
                # SOURCE order entirely so the executor's existing
                # behavior (including its error message) is preserved
                self.last_plan = None
                return patterns
            c, pos, idx, cand, rv = best
            remaining.pop(pos)
            chosen.append(cand)
            order.append(idx)
            rev_flags.append(rv)
            ests.append(c)
            bound |= {n.var for n in cand.nodes}
        self.last_plan = {"order": order, "reversed": rev_flags,
                          "est": ests}
        return chosen

    # -- helpers
    def _vertex_ds(self, label: str | None) -> ray.data.Dataset:
        if label is not None:
            if label not in self._v:
                raise KeyError(f"cypher: unknown vertex label {label!r}")
            ds, vid = self._v[label]
            return self._seed(ds.map_batches(
                lambda t, vid=vid: pa.table(
                    {"vid": t.column(vid).cast(pa.int64())}),
                batch_format="pyarrow"), {"vid": pa.int64()})
        # unlabeled: union of all labels' ids + edge endpoints
        parts = [self._vertex_ds(lb) for lb in self._v]
        for rtype in self._e:
            ds, s, d = self._e[rtype]
            parts.append(ds.map_batches(
                lambda t, s=s, d=d: pa.table({"vid": pa.concat_arrays([
                    t.column(s).cast(pa.int64()).combine_chunks(),
                    t.column(d).cast(pa.int64()).combine_chunks()])}),
                batch_format="pyarrow"))
        if not parts:
            raise ValueError("cypher: empty graph")
        from graphscope_ray.stages.relational import dedup_first
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return self._seed(dedup_first(out, ["vid"]), {"vid": pa.int64()})

    @staticmethod
    def _seed(ds: ray.data.Dataset, fields: dict) -> ray.data.Dataset:
        """Union a typed zero-row block into ``ds`` so its schema
        survives even when every mapped block comes out empty (Ray
        drops empty map outputs; a table emptied by DELETE-all would
        otherwise present no schema and break the co-group planner)."""
        seed = ray.data.from_arrow(pa.table(
            {k: pa.nulls(0, t) for k, t in fields.items()}))
        return seed.union(ds)

    def _edge_arcs(self, rel: RelPat, left: str, right: str,
                   eprops: list[str]) -> ray.data.Dataset:
        """Arc table for one hop: columns (left, right, e__p...) in
        traversal orientation."""
        if rel.rtype is None:
            if len(self._e) != 1:
                raise ValueError("cypher: untyped relationship is only "
                                 "allowed with exactly one edge table")
            rel = RelPat(rel.var, next(iter(self._e)), rel.direction,
                         rel.props, rel.min_hops, rel.max_hops)
        # alternative relationship types [:A|B] expand to the union of
        # the per-type arc tables (each row keeps its own properties)
        rtypes = (rel.rtype if isinstance(rel.rtype, tuple)
                  else (rel.rtype,))

        def arcs_of(rtype: str) -> ray.data.Dataset:
            if rtype not in self._e:
                raise KeyError(f"cypher: unknown relationship type "
                               f"{rtype!r}")
            ds, s, d = self._e[rtype]

            def orient(flip: bool):
                def f(t: pa.Table) -> pa.Table:
                    a = t.column(s).cast(pa.int64())
                    b = t.column(d).cast(pa.int64())
                    cols = {left: b if flip else a,
                            right: a if flip else b}
                    for p in eprops:
                        cols[f"{rel.var}__{p}"] = t.column(p)
                    return pa.table(cols)
                return f

            if rel.direction == "out":
                return ds.map_batches(orient(False),
                                      batch_format="pyarrow")
            if rel.direction == "in":
                return ds.map_batches(orient(True),
                                      batch_format="pyarrow")
            return (ds.map_batches(orient(False), batch_format="pyarrow")
                    .union(ds.map_batches(orient(True),
                                          batch_format="pyarrow")))

        out = arcs_of(rtypes[0])
        for rt in rtypes[1:]:
            out = out.union(arcs_of(rt))
        from graphscope_ray.stages.relational import _arrow_fields

        efields = _arrow_fields(self._e[rtypes[0]][0])
        seed_fields = {left: pa.int64(), right: pa.int64()}
        for p in eprops:
            seed_fields[f"{rel.var}__{p}"] = efields[p]
        return self._seed(out, seed_fields)

    # -- execution
    def query(self, src: str):
        """Run one Cypher statement. Read statements return a streaming
        Ray Dataset; write statements (CREATE / MERGE / SET / DELETE —
        query/writes.py) mutate the catalog in place and return a
        one-row summary DataFrame of Neo4j-style counters."""
        from graphscope_ray.query.writes import maybe_execute_write

        handled = maybe_execute_write(self, src)
        if handled is not None:
            return handled
        return self._execute(parse_cypher(src))

    def _execute(self, q: Query) -> ray.data.Dataset:
        from graphscope_ray.stages.relational import (
            cogroup_join,
            dedup_first,
            grouped_agg,
        )

        # referenced properties (pruned joins) — only the PATTERN
        # stage touches graph properties; after a WITH, expressions
        # reference the projected aliases
        need: set = set()
        if q.where is not None:
            _expr_props(q.where, need)
        stage1_items = q.withs[0][0] if q.withs else q.items
        for it in stage1_items:
            _expr_props(it.expr, need)
        if not q.withs:
            for e, _ in q.order:
                _expr_props(e, need)

        # inline {k: v} maps become WHERE conjuncts; WHERE itself
        # splits into its top-level AND-conjuncts so each can push
        # down (or semi/anti-join, for pattern predicates) on its own
        def _split_and(e, out):
            if isinstance(e, BinOp) and e.op == "and":
                _split_and(e.left, out)
                _split_and(e.right, out)
            else:
                out.append(e)

        def _no_nested_pp(e):
            if isinstance(e, PatternPred):
                raise ValueError(
                    "cypher: pattern predicates must be top-level "
                    "WHERE conjuncts (not under OR/NOT/CASE/RETURN/…)")
            if isinstance(e, (list, tuple)):
                for item in e:
                    _no_nested_pp(item)
                return
            for f in getattr(e, "__dataclass_fields__", {}):
                _no_nested_pp(getattr(e, f))

        conjuncts: list = []
        if q.where is not None:
            _split_and(q.where, conjuncts)
            for c in conjuncts:
                if not isinstance(c, PatternPred):
                    _no_nested_pp(c)
        for it in q.items:
            _no_nested_pp(it.expr)
        for witems, _wd, wwhere in q.withs:
            for it in witems:
                _no_nested_pp(it.expr)
            if wwhere is not None:
                _no_nested_pp(wwhere)
        var_labels: dict[str, str | None] = {}
        anon = [0]

        def nm(v):
            if v is None:
                anon[0] += 1
                return f"_anon{anon[0]}"
            return v

        def normalize(pat, conj_sink):
            nodes = []
            for n in pat.nodes:
                v = nm(n.var)
                nodes.append(NodePat(v, n.label, n.props))
                if n.label is not None:
                    var_labels.setdefault(v, n.label)
                else:
                    var_labels.setdefault(v, None)
                for k, val in n.props.items():
                    conj_sink.append(BinOp("=", Prop(v, k), Lit(val)))
                    need.add((v, k))
            rels = []
            for r in pat.rels:
                rv = nm(r.var)
                rels.append(RelPat(rv, r.rtype, r.direction, r.props,
                                   r.min_hops, r.max_hops))
                for k, val in r.props.items():
                    conj_sink.append(BinOp("=", Prop(rv, k), Lit(val)))
                    need.add((rv, k))
            out = PathPat(nodes, rels)
            out.name, out.shortest = pat.name, pat.shortest
            return out

        patterns = [normalize(pat, conjuncts) for pat in q.patterns]
        if self.optimize and patterns and (
                len(patterns) > 1 or patterns[0].rels):
            patterns = self._order_patterns(patterns, conjuncts)
        path_names = {p.name for p in patterns if p.name}
        # optional patterns keep their inline-prop conjuncts LOCAL —
        # they must filter the sub-pattern, not the outer binding
        opt_patterns = []
        for pat in q.optionals:
            local: list = []
            opt_patterns.append((normalize(pat, local), local))

        edge_vars = {r.var for pat in patterns for r in pat.rels}
        edge_vars |= {r.var for pat, _ in opt_patterns for r in pat.rels}
        eprops_of = {v: sorted({p for (vv, p) in need if vv == v})
                     for v in edge_vars}

        # plan-time binding check: a pattern-predicate conjunct whose
        # endpoint was never bound by any MATCH (a typo like
        # ``WHERE (z)-[:T]->()``) would otherwise survive in `pending`,
        # fold into the residual filter and only fail at dataset-
        # consumption time inside a Ray task with a generic error
        will_bind = {n.var for pat in patterns for n in pat.nodes}
        will_bind |= {n.var for pat, _ in opt_patterns for n in pat.nodes}
        will_bind |= {name for name, _ in q.unwinds}
        for c in conjuncts:
            if isinstance(c, PatternPred):
                for v in (c.left, c.right):
                    if v is not None and v not in will_bind:
                        raise ValueError(
                            f"cypher: unbound variable {v!r} in "
                            "pattern predicate")

        # ---- WHERE / local filters
        def filter_ds(ds, pred):
            def filt(df: pd.DataFrame) -> pd.DataFrame:
                if not len(df):
                    return df
                m = _eval(pred, df)
                if not hasattr(m, "fillna"):
                    m = pd.Series(m, index=df.index)
                # null comparisons (optional-match misses) filter, per
                # Cypher's ternary logic
                return df[np.asarray(m.fillna(False), bool)]
            return ds.map_batches(filt, batch_format="pandas")

        # ---- build the binding table pattern by pattern
        binding: ray.data.Dataset | None = None
        bound: set = set()
        tmp = [0]

        def bind_node(b, node, col):
            """Ensure `col` satisfies node's label: broadcast
            semi-join when the label's vid set fits the broadcast
            limit (one ray.put + per-batch isin — no shuffle), else a
            bucketed co-group (the >10⁷-vertex path)."""
            if node.label is None:
                return b
            keys = self._label_vids(node.label)
            if keys is not None:
                from graphscope_ray.stages.relational import (
                    broadcast_semi_join,
                )
                return broadcast_semi_join(b, keys, on=col)
            lab = self._vertex_ds(node.label).map_batches(
                lambda t, col=col: pa.table(
                    {col: t.column("vid")}), batch_format="pyarrow")
            return cogroup_join(b, lab, on=col,
                                num_buckets=self.num_buckets)

        def hop(b, rel, lcol, rnode, bound, allow_push=False):
            """One relationship hop from bound column `lcol`.

            ``allow_push``: WHERE conjuncts that reference ONLY this
            relationship variable filter the ARC TABLE before the join
            (edge-predicate pushdown — conjunction commutes with the
            inner join), so a hop guarded by ``e.weight >= k`` joins
            the pruned arcs, not the full table. Mandatory-pattern
            hops only: on OPTIONAL hops a WHERE over the optional var
            must see the null rows the left join produces."""
            rcol = rnode.var
            fresh = rcol not in bound
            tgt = rcol if fresh else f"_tmp{tmp[0]}"
            if not fresh:
                tmp[0] += 1
            eprops = eprops_of.get(rel.var, [])
            if rel.max_hops == 1:
                arcs = self._edge_arcs(rel, lcol, tgt, eprops)
                if allow_push and eprops:
                    def bare_vars(e, out):
                        if isinstance(e, Var):
                            out.add(e.var)
                        elif isinstance(e, (list, tuple)):
                            for x in e:
                                bare_vars(x, out)
                        else:
                            for f in getattr(e, "__dataclass_fields__",
                                             {}):
                                bare_vars(getattr(e, f), out)

                    push = []
                    for c in list(pending):
                        vs: set = set()
                        ps: list = []
                        _expr_vars(c, vs, ps)
                        bv: set = set()
                        bare_vars(c, bv)
                        if (vs == {rel.var} and not bv
                                and not isinstance(c, PatternPred)):
                            pending.remove(c)
                            push.append(c)
                    if push:
                        pred = push[0]
                        for c in push[1:]:
                            pred = BinOp("and", pred, c)
                        arcs = filter_ds(arcs, pred)
                b = cogroup_join(b, arcs, on=lcol,
                                 num_buckets=self.num_buckets)
            else:
                if eprops:
                    raise ValueError("cypher: variable-length "
                                     "relationships cannot bind "
                                     "edge properties")
                outs = []
                for k in range(rel.min_hops, rel.max_hops + 1):
                    bk = b
                    cur = lcol
                    for j in range(k):
                        nxt = tgt if j == k - 1 else f"_h{tmp[0]}_{j}"
                        arcs = self._edge_arcs(rel, cur, nxt, [])
                        bk = cogroup_join(bk, arcs, on=cur,
                                          num_buckets=self.num_buckets)
                        cur = nxt
                    keep = [c for c in bk.schema().names
                            if not c.startswith("_h")]
                    outs.append(bk.select_columns(keep))
                tmp[0] += 1
                b = outs[0]
                for o in outs[1:]:
                    b = b.union(o)
            if not fresh:
                b = b.map_batches(
                    lambda t, a=rcol, bcol=tgt: t.filter(
                        pa.compute.equal(t.column(a), t.column(bcol))
                    ).drop_columns([bcol]),
                    batch_format="pyarrow")
            else:
                bound.add(rcol)
                b = bind_node(b, rnode, rcol)
            return b

        def shortest_pattern(pat, binding):
            """`shortestPath((a)-[:T*lo..hi]->(b))` — min-hop-per-pair
            BFS via relational.path_expand (GIE ShortestPathExpand):
            pairs whose shortest distance falls in [lo, hi]; a == b
            pairs are never emitted (dist 0). The hop count
            materializes as `<pathname>__len` for `length(p)`."""
            from graphscope_ray.stages.relational import path_expand

            a, bnode = pat.nodes
            rel = pat.rels[0]
            if eprops_of.get(rel.var):
                raise ValueError("cypher: shortestPath cannot bind "
                                 "edge properties")
            if binding is not None and a.var in bound:
                # expand only from the anchored start set (pushed-down
                # WHERE filters have already pruned the binding)
                starts = dedup_first(
                    binding.map_batches(
                        lambda t, av=a.var: pa.table(
                            {"vid": t.column(av).cast(pa.int64())}),
                        batch_format="pyarrow"),
                    ["vid"], num_buckets=self.num_buckets)
            else:
                starts = self._vertex_ds(a.label).map_batches(
                    lambda t: pa.table({"vid": t.column("vid")}),
                    batch_format="pyarrow")
            one_hop = RelPat(rel.var, rel.rtype, rel.direction, {}, 1, 1)
            arcs = self._edge_arcs(one_hop, "src", "dst", [])
            sp = path_expand(arcs, starts, rel.min_hops, rel.max_hops,
                             num_buckets=self.num_buckets)
            lencol = f"{pat.name}__len" if pat.name else f"_plen{tmp[0]}"
            tmp[0] += 1
            sub = sp.map_batches(
                lambda t, av=a.var, bv=bnode.var, lc=lencol: pa.table(
                    {av: t.column("start"), bv: t.column("end"),
                     lc: t.column("hops")}), batch_format="pyarrow")
            sub = bind_node(sub, bnode, bnode.var)
            if binding is None:
                bound.add(a.var)
                bound.add(bnode.var)
                return sub
            if a.var in bound and bnode.var not in bound:
                bound.add(bnode.var)
                return cogroup_join(binding, sub, on=a.var,
                                    num_buckets=self.num_buckets)
            raise ValueError(
                "cypher: shortestPath must either be the first pattern "
                "or start on a bound variable and end on a fresh one")

        # ---- node-property join helper (pruned to `need`)
        def join_node_props(b, v, props, how="inner"):
            label = var_labels.get(v)
            if label is None:
                cands = [lb for lb, (ds, vid) in self._v.items()
                         if all(p in ds.schema().names for p in props)]
                if len(cands) != 1:
                    raise ValueError(
                        f"cypher: property access on unlabeled {v!r} is "
                        f"ambiguous across vertex tables {cands}")
                label = cands[0]
            ds, vid = self._v[label]
            cols = [vid] + sorted(set(props))
            side = ds.select_columns(cols).map_batches(
                lambda t, v=v, vid=vid, props=props: pa.table(
                    {v: t.column(vid).cast(pa.int64()),
                     **{f"{v}__{p}": t.column(p)
                        for p in sorted(set(props))}}),
                batch_format="pyarrow")
            return cogroup_join(b, side, on=v, how=how,
                                num_buckets=self.num_buckets)

        # WHERE pushdown: a conjunct whose variables are all bound and
        # that touches no property can filter the binding as soon as
        # those variables exist (conjunction commutes; left-side
        # predicates commute with the optional left joins) — this is
        # what keeps an anchored shortestPath from BFS-ing every vertex
        pending = list(conjuncts)
        joined_props: set = set()   # (var, prop) already on the binding
        opt_fresh_vars: set = set()  # variables an OPTIONAL MATCH bound

        def flush_filters(b):
            """Apply every pending conjunct whose variables are all
            bound, joining any vertex properties it needs first (the
            reference compiler's predicate pushdown) — so a
            property-anchored pattern prunes before the next
            expansion. Edge-property conjuncts wait for the final
            filter (their columns appear with their hop)."""
            nonlocal pending
            if b is None:
                return b          # nothing to filter yet — keep all
            ready, rest = [], []
            for c in pending:
                vs: set = set()
                ps: list = []
                _expr_vars(c, vs, ps)
                ok = vs <= bound and all(
                    (p.var, p.name) in joined_props
                    or (p.var not in edge_vars
                        and p.var not in path_names
                        and p.var not in opt_fresh_vars)
                    for p in ps)
                (ready if ok else rest).append(c)
            pending = rest
            pats = [c for c in ready if isinstance(c, PatternPred)]
            ready = [c for c in ready if not isinstance(c, PatternPred)]
            if ready:
                by_var: dict = {}
                for c in ready:
                    for p in _local_props(c):
                        if (p.var, p.name) not in joined_props:
                            by_var.setdefault(p.var, set()).add(p.name)
                for v, props in sorted(by_var.items()):
                    b = join_node_props(b, v, sorted(props))
                    joined_props.update((v, p) for p in props)
                pred = ready[0]
                for c in ready[1:]:
                    pred = BinOp("and", pred, c)
                b = filter_ds(b, pred)
            for pp in pats:
                # WHERE [NOT] (a)-[:T]->(b): SEMI/ANTI join of the
                # binding against the (deduped) arc table on the
                # endpoint pair — GIE's SEMI/ANTI join kinds
                if {pp.left, pp.right} & opt_fresh_vars:
                    raise ValueError(
                        "cypher: pattern predicates on OPTIONAL-bound "
                        "variables are unsupported (nullable keys)")
                from graphscope_ray.stages.relational import (
                    cogroup_pair_semi,
                )
                arcs = self._edge_arcs(pp.rel, "_ppa", "_ppb", [])
                if pp.right is None:
                    # existential (a)-[:T]->(): pairing the key with
                    # itself turns the pair join into src-set
                    # membership — no extra operator needed
                    on, ron = (pp.left, pp.left), ("_ppa", "_ppa")
                else:
                    on, ron = (pp.left, pp.right), ("_ppa", "_ppb")
                b = cogroup_pair_semi(
                    b, arcs, on=on, right_on=ron, negate=pp.neg,
                    num_buckets=self.num_buckets)
            return b

        for pat in patterns:
            if pat.shortest:
                binding = flush_filters(binding)
                binding = shortest_pattern(pat, binding)
                continue
            first = pat.nodes[0]
            if binding is None or first.var not in bound:
                start = self._vertex_ds(first.label).map_batches(
                    lambda t, c=first.var: pa.table(
                        {c: t.column("vid")}), batch_format="pyarrow")
                if binding is None:
                    binding = start
                    bound.add(first.var)
                else:
                    # cartesian-free rule: patterns after the first
                    # must START on a bound variable — EXCEPT when the
                    # start is pinned to a literal id (`…, (b:L)` with
                    # `WHERE b = 5`, or Gremlin mid-traversal V(id)):
                    # a one-row side attaches as a constant column, no
                    # cartesian blowup possible.
                    pinned = None
                    for c in conjuncts:
                        if (isinstance(c, BinOp) and c.op == "="):
                            a, b2 = c.left, c.right
                            if (isinstance(a, Var) and a.var == first.var
                                    and isinstance(b2, Lit)):
                                pinned = b2.value
                            elif (isinstance(b2, Var)
                                    and b2.var == first.var
                                    and isinstance(a, Lit)):
                                pinned = a.value
                    if pinned is None or not isinstance(pinned, int):
                        raise ValueError(
                            "cypher: each additional pattern must "
                            "start on an already-bound variable (or "
                            "one pinned to a literal id)")
                    binding = binding.map_batches(
                        lambda t, c=first.var, v=int(pinned):
                        t.append_column(c, pa.array(
                            np.full(t.num_rows, v, np.int64))),
                        batch_format="pyarrow")
                    bound.add(first.var)
                    binding = bind_node(binding, first, first.var)
                    if first.label is None:
                        # bind_node is a no-op for unlabeled nodes —
                        # verify the pinned vertex actually exists, or
                        # every row would pair with a phantom binding
                        import pyarrow.compute as _pc

                        hit = self._vertex_ds(None).map_batches(
                            lambda t, v=int(pinned): t.filter(
                                _pc.equal(t.column("vid"),
                                          pa.scalar(v, pa.int64()))),
                            batch_format="pyarrow").count()
                        if hit == 0:
                            binding = binding.limit(0)
            lcol = first.var
            for rel, rnode in zip(pat.rels, pat.nodes[1:]):
                binding = hop(binding, rel, lcol, rnode, bound,
                              allow_push=True)
                lcol = rnode.var
            binding = flush_filters(binding)

        # ---- OPTIONAL MATCH: inner-join the whole sub-pattern from
        # its start variable's scan, then ONE left join onto the
        # binding — so a partial hop chain can never leave a half-bound
        # row, and optional properties are null exactly on misses
        opt_prop_joined: set = set()
        for pat, local_conj in opt_patterns:
            if pat.shortest:
                raise ValueError("cypher: shortestPath inside "
                                 "OPTIONAL MATCH is not supported")
            first = pat.nodes[0]
            if first.var not in bound:
                raise ValueError("cypher: OPTIONAL MATCH must start "
                                 "on an already-bound variable")
            if first.var in opt_fresh_vars:
                raise ValueError("cypher: OPTIONAL MATCH cannot start "
                                 "on a variable another OPTIONAL MATCH "
                                 "bound (it may be null)")
            fresh = [n.var for n in pat.nodes[1:]]
            if any(v in bound for v in fresh):
                raise ValueError("cypher: OPTIONAL MATCH may bind only "
                                 "fresh variables after the start")
            sub = self._vertex_ds(first.label).map_batches(
                lambda t, c=first.var: pa.table(
                    {c: t.column("vid")}), batch_format="pyarrow")
            subbound = {first.var}
            lcol = first.var
            for rel, rnode in zip(pat.rels, pat.nodes[1:]):
                sub = hop(sub, rel, lcol, rnode, subbound)
                lcol = rnode.var
            for v in fresh:
                props = sorted({p for (vv, p) in need if vv == v})
                if props:
                    sub = join_node_props(sub, v, props)
                    opt_prop_joined.add(v)
            # an inline prop map on the START node filters the
            # sub-pattern locally (real Cypher semantics: a non-match
            # yields nulls, not a dropped anchor row) — join those
            # props into the sub for the filter, then DROP them so the
            # left join can't null them on rows where the anchor
            # itself still exists (the global prop join covers reads)
            start_props = sorted({p.name for c in local_conj
                                  for p in _local_props(c)
                                  if p.var == first.var})
            if start_props:
                sub = join_node_props(sub, first.var, start_props)
            if local_conj:
                pred = local_conj[0]
                for c in local_conj[1:]:
                    pred = BinOp("and", pred, c)
                sub = filter_ds(sub, pred)
            if start_props:
                drop = [f"{first.var}__{p}" for p in start_props]
                sub = sub.map_batches(
                    lambda df, d=drop: df.drop(columns=d),
                    batch_format="pandas")
            binding = cogroup_join(binding, sub, on=first.var,
                                   how="left",
                                   num_buckets=self.num_buckets)
            bound |= set(fresh)
            opt_fresh_vars |= set(fresh)
            for v in fresh:
                joined_props.update(
                    (v, p) for (vv, p) in need if vv == v)
            binding = flush_filters(binding)

        # ---- UNWIND (literal lists): replicate each binding row
        for name, vals in q.unwinds:
            if name in bound:
                raise ValueError(f"cypher: UNWIND alias {name!r} "
                                 "is already bound")
            series = pd.Series(vals)

            def unwind(df: pd.DataFrame, name=name, series=series):
                if not len(df):
                    out = df.copy()
                    out[name] = series[:0]
                    return out
                rep = df.loc[df.index.repeat(len(series))]
                rep = rep.reset_index(drop=True)
                rep[name] = np.tile(series.values, len(df))
                return rep

            if binding is None:
                binding = ray.data.from_pandas(pd.DataFrame({name: vals}))
            else:
                binding = binding.map_batches(unwind,
                                              batch_format="pandas")
            bound.add(name)
        if q.unwinds:
            binding = flush_filters(binding)

        # ---- join needed node properties (pruned; optional vars were
        # handled inside their sub-pattern)
        node_need: dict[str, list[str]] = {}
        for v, p in need:
            if (v not in edge_vars and v not in opt_prop_joined
                    and v not in path_names
                    and (v, p) not in joined_props):
                node_need.setdefault(v, []).append(p)
        for v, props in sorted(node_need.items()):
            binding = join_node_props(binding, v, props)

        if pending:
            pred = pending[0]
            for c in pending[1:]:
                pred = BinOp("and", pred, c)
            binding = filter_ds(binding, pred)

        # ---- projection/aggregation stage (shared by WITH and RETURN)
        def apply_stage(src, items, distinct):
            aggs = [it for it in items if isinstance(it.expr, Agg)]
            keys = [it for it in items if not isinstance(it.expr, Agg)]

            def project_keys(df: pd.DataFrame) -> pd.DataFrame:
                out = {}
                for it in keys:
                    out[it.alias] = _eval(it.expr, df)
                for it in aggs:   # pre-compute agg input columns
                    if it.expr.arg is not None:
                        out[f"_in_{it.alias}"] = _eval(it.expr.arg, df)
                    else:
                        out[f"_in_{it.alias}"] = np.ones(len(df),
                                                         np.int64)
                if not len(df):
                    return pd.DataFrame(
                        {k: pd.Series([], dtype=object)
                         for k in out} if not out else
                        {k: v[:0] if hasattr(v, "__len__")
                         else pd.Series([], dtype=np.float64)
                         for k, v in out.items()})
                return pd.DataFrame(out)

            proj = src.map_batches(project_keys, batch_format="pandas")

            if aggs:
                gkeys = [it.alias for it in keys]
                dummy = not gkeys
                if dummy:
                    proj = proj.map_batches(
                        lambda df: df.assign(_g=np.int64(0)),
                        batch_format="pandas")
                    gkeys = ["_g"]
                spec = {}
                post_avg = []
                for it in aggs:
                    a: Agg = it.expr
                    col = f"_in_{it.alias}"
                    if a.fn == "count" and a.distinct:
                        spec[it.alias] = (col, "nunique")
                    elif a.fn == "count":
                        # count(*) counts rows; count(x) skips nulls
                        spec[it.alias] = (
                            col, "size" if a.arg is None else "count")
                    elif a.fn == "collect":
                        # Cypher collect() skips nulls (optional-match
                        # misses)
                        spec[it.alias] = (
                            col, lambda s: s.dropna().tolist())
                    elif a.fn == "percentilecont":
                        spec[it.alias] = (
                            col, lambda s, p=a.param:
                            s.dropna().quantile(p))
                    elif a.fn == "percentiledisc":
                        def pdisc(s, p=a.param):
                            import math
                            s = (s.dropna().sort_values()
                                 .reset_index(drop=True))
                            if not len(s):
                                return None
                            # nearest-rank: the ceil(p·n)-th smallest
                            return s.iloc[max(0,
                                              math.ceil(p * len(s)) - 1)]
                        spec[it.alias] = (col, pdisc)
                    elif a.fn == "stdev":
                        spec[it.alias] = (
                            col, lambda s: s.dropna().std(ddof=1))
                    elif a.fn == "stdevp":
                        spec[it.alias] = (
                            col, lambda s: s.dropna().std(ddof=0))
                    elif a.fn == "avg":
                        # Cypher avg() skips nulls: sum / non-null
                        # count, not / row count
                        spec[f"_s_{it.alias}"] = (col, "sum")
                        spec[f"_c_{it.alias}"] = (col, "count")
                        post_avg.append(it.alias)
                    else:
                        spec[it.alias] = (col, a.fn)
                decomposable = all(
                    fn in ("sum", "min", "max", "size", "count")
                    for _, fn in spec.values())
                out = grouped_agg(proj, gkeys, spec,
                                  num_buckets=self.num_buckets,
                                  combine=decomposable or None
                                  if decomposable else False)

                def post(df: pd.DataFrame) -> pd.DataFrame:
                    for al in post_avg:
                        df[al] = df[f"_s_{al}"] / df[f"_c_{al}"]
                        df = df.drop(columns=[f"_s_{al}",
                                              f"_c_{al}"])
                    if dummy:
                        df = df.drop(columns=["_g"])
                    return df[[it.alias for it in items]]

                res = out.map_batches(post, batch_format="pandas")
                if dummy:
                    # Cypher: a GLOBAL aggregate over an empty stream
                    # yields exactly ONE identity row (count/sum → 0,
                    # collect → [], min/max/avg/… → null) — the
                    # groupby would yield zero. The result is ≤ 1 row,
                    # but checking means the upstream pipeline runs at
                    # query() time rather than at consumption — an
                    # accepted laziness trade for global aggregates
                    # (the caller always consumes the scalar row).
                    res = res.materialize()
                    if res.count() == 0:
                        ident = {}
                        for it in aggs:
                            fn = it.expr.fn
                            if fn == "count":
                                ident[it.alias] = np.int64(0)
                            elif fn == "sum":
                                ident[it.alias] = np.int64(0)
                            elif fn == "collect":
                                ident[it.alias] = []
                            else:
                                ident[it.alias] = None
                        res = ray.data.from_pandas(
                            pd.DataFrame([ident]))
                return res
            if distinct:
                return dedup_first(proj, [it.alias for it in items],
                                   num_buckets=self.num_buckets)
            return proj

        # ---- WITH chain, then RETURN
        current = binding
        for witems, wdistinct, wwhere in q.withs:
            current = apply_stage(current, witems, wdistinct)
            if wwhere is not None:
                current = filter_ds(current, wwhere)
        result = apply_stage(current, q.items, q.distinct)

        # ---- ORDER BY / SKIP / LIMIT
        if q.order:
            cols, desc = [], []
            extra = [0]

            def order_col(e):
                for it in q.items:
                    if repr(it.expr) == repr(e) or (
                            isinstance(e, Var) and it.alias == e.var):
                        return it.alias, None
                extra[0] += 1
                return f"_o{extra[0]}", e

            add_exprs = []
            for e, asc in q.order:
                name, expr = order_col(e)
                cols.append(name)
                desc.append(not asc)
                if expr is not None:
                    add_exprs.append((name, expr))
            if add_exprs:
                raise ValueError("cypher: ORDER BY must reference "
                                 "RETURN items (use AS aliases)")
            from graphscope_ray.stages.relational import coalesce_blocks
            result = coalesce_blocks(result).sort(cols, descending=desc)
        if q.skip or q.limit is not None:
            if q.skip and not q.order:
                raise ValueError("cypher: SKIP requires ORDER BY")
            if q.skip:
                refs = result.materialize().to_arrow_refs()

                @ray.remote
                def _n(t: pa.Table) -> int:
                    return t.num_rows

                counts = ray.get([_n.remote(r) for r in refs])
                offs = np.concatenate(([0], np.cumsum(counts)))

                @ray.remote
                def _slice(t: pa.Table, base: int, skip: int) -> pa.Table:
                    lo = max(0, skip - base)
                    return t.slice(min(lo, t.num_rows))

                result = ray.data.from_arrow_refs(
                    [_slice.remote(t, int(offs[i]), int(q.skip))
                     for i, t in enumerate(refs)])
            if q.limit is not None:
                result = result.limit(q.limit)
        return result
