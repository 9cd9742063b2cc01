"""Parser unit tests — modeled on the reference's 83 inline parser tests
(open_cypher_parser/*: full-query test mod.rs:119-253, expression
precedence expression.rs:354-548, clause tests per file)."""

import pytest

from brahmand_spark.errors import ParseError
from brahmand_spark.parser import ast, parse


def rq(text):
    stmt = parse(text)
    assert isinstance(stmt, ast.ReadQuery)
    return stmt


class TestMatch:
    def test_single_node(self):
        q = rq("MATCH (a:Person) RETURN a.name")
        [part] = q.parts
        [mc] = part.matches
        [path] = mc.paths
        assert path.nodes[0].alias == "a"
        assert path.nodes[0].label == "Person"
        assert path.rels == []

    def test_anonymous_node(self):
        q = rq("MATCH (:Person)-[:FOLLOWS]->() RETURN count(*)")
        [path] = q.parts[0].matches[0].paths
        assert path.nodes[0].alias is None
        assert path.nodes[1].alias is None
        assert path.nodes[1].label is None

    def test_full_pattern(self):
        q = rq("MATCH (a:Person {name: 'x'})-[f:FOLLOWS {since: 2020}]->(b) RETURN b")
        [path] = q.parts[0].matches[0].paths
        a, b = path.nodes
        [f] = path.rels
        assert a.properties == {"name": ast.Literal("x")}
        assert f.alias == "f" and f.type_name == "FOLLOWS"
        assert f.direction == "out"
        assert f.properties == {"since": ast.Literal(2020)}

    def test_directions(self):
        for text, d in [
            ("-[r:T]->", "out"), ("<-[r:T]-", "in"), ("-[r:T]-", "either"),
        ]:
            q = rq(f"MATCH (a){text}(b) RETURN a")
            assert q.parts[0].matches[0].paths[0].rels[0].direction == d

    def test_multi_hop_chain(self):
        q = rq("MATCH (a)-[:X]->(b)-[:Y]->(c) RETURN a")
        [path] = q.parts[0].matches[0].paths
        assert len(path.nodes) == 3
        assert [r.type_name for r in path.rels] == ["X", "Y"]

    def test_comma_separated_paths(self):
        q = rq("MATCH (a)-[:X]->(b), (a)-[:Y]->(c) RETURN a")
        assert len(q.parts[0].matches[0].paths) == 2

    def test_var_length(self):
        q = rq("MATCH (a)-[:X*1..3]->(b) RETURN a")
        [r] = q.parts[0].matches[0].paths[0].rels
        assert (r.min_hops, r.max_hops) == (1, 3)

    def test_order_label_is_soft_keyword(self):
        q = rq("MATCH (o:Order) RETURN o.o_orderkey")
        assert q.parts[0].matches[0].paths[0].nodes[0].label == "Order"

    def test_path_variable(self):
        q = rq("MATCH p = (a:X)-[:R]->(b) RETURN length(p)")
        path = q.parts[0].matches[0].paths[0]
        assert path.var == "p"
        assert [n.alias for n in path.nodes] == ["a", "b"]

    def test_path_without_variable_has_none(self):
        q = rq("MATCH (a:X)-[:R]->(b) RETURN a")
        assert q.parts[0].matches[0].paths[0].var is None


class TestExpressions:
    def where(self, text):
        return rq(f"MATCH (a) WHERE {text} RETURN a").parts[0].where

    def test_precedence_and_or(self):
        e = self.where("a.x = 1 OR a.y = 2 AND a.z = 3")
        assert isinstance(e, ast.Binary) and e.op == "OR"
        assert e.right.op == "AND"

    def test_precedence_arithmetic(self):
        e = self.where("a.x + 2 * 3 = 7")
        assert e.op == "="
        assert e.left.op == "+"
        assert e.left.right.op == "*"

    def test_power_right_assoc(self):
        e = self.where("a.x ^ 2 ^ 3 > 0")
        assert e.left.op == "^"
        assert e.left.right.op == "^"  # 2^(3) nested under right

    def test_not(self):
        e = self.where("NOT a.x = 1")
        assert isinstance(e, ast.Unary) and e.op == "NOT"

    def test_in_list(self):
        e = self.where("a.name IN ['x', 'y']")
        assert e.op == "IN"
        assert isinstance(e.right, ast.ListLiteral)

    def test_not_in(self):
        e = self.where("a.name NOT IN ['x']")
        assert e.op == "NOT_IN"

    def test_is_null(self):
        e = self.where("a.name IS NULL")
        assert isinstance(e, ast.IsNull) and not e.negated
        e = self.where("a.name IS NOT NULL")
        assert e.negated

    def test_string_predicates(self):
        assert self.where("a.s STARTS WITH 'x'").op == "STARTS_WITH"
        assert self.where("a.s ENDS WITH 'x'").op == "ENDS_WITH"
        assert self.where("a.s CONTAINS 'x'").op == "CONTAINS"

    def test_parameter(self):
        e = self.where("a.name = $who")
        assert e.right == ast.Parameter("who")

    def test_literals(self):
        assert self.where("a.x = 1.5").right == ast.Literal(1.5)
        assert self.where("a.x = true").right == ast.Literal(True)
        assert self.where("a.x = null").right == ast.Literal(None)
        assert self.where("a.x = 'it\\'s'").right == ast.Literal("it's")

    def test_function_call(self):
        e = self.where("toUpper(a.name) = 'X'")
        assert e.left == ast.FnCall("toUpper", (ast.PropertyAccess("a", "name"),))

    def test_case(self):
        e = self.where("CASE WHEN a.x > 1 THEN true ELSE false END")
        assert isinstance(e, ast.CaseExpr)


class TestReturn:
    def test_aliases(self):
        q = rq("MATCH (a) RETURN a.name AS n, count(*) AS c")
        items = q.return_clause.items
        assert items[0].alias == "n"
        assert items[1].expr == ast.FnCall("count", (ast.Star(),))

    def test_star(self):
        q = rq("MATCH (a) RETURN *")
        assert isinstance(q.return_clause.items[0].expr, ast.Star)

    def test_distinct(self):
        q = rq("MATCH (a) RETURN DISTINCT a.name")
        assert q.return_clause.distinct

    def test_count_distinct(self):
        q = rq("MATCH (a) RETURN count(DISTINCT a.name)")
        fn = q.return_clause.items[0].expr
        assert fn.distinct

    def test_order_skip_limit(self):
        q = rq("MATCH (a) RETURN a.name ORDER BY a.age DESC, a.name SKIP 5 LIMIT 10")
        assert [o.ascending for o in q.order_by] == [False, True]
        assert q.skip == 5 and q.limit == 10


class TestWith:
    def test_with_pipeline(self):
        q = rq("MATCH (a:P) WITH a.name AS n, count(*) AS c WHERE c > 2 RETURN n")
        assert len(q.parts) == 2
        assert q.parts[0].with_clause is not None
        assert q.parts[1].where is not None

    def test_with_order_limit(self):
        q = rq("MATCH (a:P) WITH a ORDER BY a.x LIMIT 3 MATCH (a)-[:F]->(b) RETURN b")
        assert q.parts[0].limit == 3
        assert len(q.parts[1].matches) == 1

    def test_unwind(self):
        q = rq("UNWIND [1,2,3] AS x RETURN x")
        assert q.parts[0].unwind.alias == "x"


class TestDDL:
    def test_create_node_table(self):
        s = parse("CREATE NODE TABLE User (id UInt64, name String DEFAULT 'x', "
                  "PRIMARY KEY (id), NODE ID (id))")
        assert isinstance(s, ast.CreateNodeTable)
        assert s.name == "User" and s.node_id == "id"
        assert s.primary_keys == ["id"]
        assert s.columns[1].default == ast.Literal("x")

    def test_create_rel_table(self):
        s = parse("CREATE REL TABLE Follows FROM User TO User (since Int64, ADJ INDEX(true))")
        assert isinstance(s, ast.CreateRelTable)
        assert (s.from_node, s.to_node) == ("User", "User")
        assert s.adj_index

    def test_write_query_classified(self):
        s = parse("MATCH (a:P) SET a.x = 1")
        assert isinstance(s, ast.WriteQuery)
        s = parse("MATCH (a:P) DETACH DELETE a")
        assert s.delete.detach
        s = parse("CREATE (a:P {x: 1})")
        assert isinstance(s, ast.WriteQuery) and s.create is not None


class TestErrors:
    def test_unterminated(self):
        with pytest.raises(ParseError):
            parse("MATCH (a RETURN a")

    def test_trailing_garbage(self):
        with pytest.raises(ParseError):
            parse("MATCH (a) RETURN a extra")

    def test_bad_string(self):
        with pytest.raises(ParseError):
            parse("MATCH (a) WHERE a.x = 'oops RETURN a")


class TestUnion:
    def test_union_chain(self):
        q = rq("MATCH (a:P) RETURN a.name AS n UNION MATCH (b:Q) RETURN b.name AS n "
               "UNION ALL MATCH (c:R) RETURN c.name AS n")
        assert len(q.unions) == 1  # nested right-assoc chain
        sub, distinct = q.unions[0]
        assert distinct is True
        assert len(sub.unions) == 1
        assert sub.unions[0][1] is False  # UNION ALL

    def test_optional_match_where_attaches(self):
        q = rq("MATCH (a:P) OPTIONAL MATCH (a)-[:F]->(b) WHERE b.x > 1 RETURN a")
        [part] = q.parts
        assert part.where is None
        assert part.matches[1].optional
        assert part.matches[1].where is not None


class TestPatternPredicates:
    def test_bare_pattern_in_where(self):
        q = rq("MATCH (a:P) WHERE (a)-[:F]->(b) RETURN a.name")
        [part] = q.parts
        assert isinstance(part.where, ast.PatternPredicate)
        assert len(part.where.path.rels) == 1

    def test_exists_fn_form(self):
        q = rq("MATCH (a:P) WHERE exists((a)-[:F]->()) RETURN a.name")
        [part] = q.parts
        assert isinstance(part.where, ast.PatternPredicate)

    def test_not_pattern(self):
        q = rq("MATCH (a:P) WHERE NOT (a)-[:F]->() RETURN a.name")
        [part] = q.parts
        assert isinstance(part.where, ast.Unary)
        assert part.where.op == "NOT"
        assert isinstance(part.where.operand, ast.PatternPredicate)

    def test_conjunction_with_plain_filter(self):
        q = rq("MATCH (a:P) WHERE (a)-[:F]->(b) AND a.x > 1 RETURN a.name")
        [part] = q.parts
        assert isinstance(part.where, ast.Binary)
        assert part.where.op == "AND"
        assert isinstance(part.where.left, ast.PatternPredicate)

    def test_parenthesized_expr_not_pattern(self):
        q = rq("MATCH (a:P) WHERE (a.x + 1) > 2 RETURN a.name")
        [part] = q.parts
        assert isinstance(part.where, ast.Binary)
        assert part.where.op == ">"

    def test_parenthesized_variable_not_pattern(self):
        q = rq("MATCH (a:P) WHERE (a.x) > 2 RETURN a.name")
        [part] = q.parts
        assert part.where.op == ">"

    def test_exists_non_pattern_falls_back_to_fn(self):
        q = rq("MATCH (a:P) RETURN exists(a.x) AS e")
        item = q.return_clause.items[0]
        assert isinstance(item.expr, ast.FnCall)
        assert item.expr.name.lower() == "exists"


class TestListComprehensions:
    def test_comprehension_full(self):
        q = rq("MATCH (a:P) RETURN [x IN a.xs WHERE x > 1 | x * 2] AS ys")
        e = q.return_clause.items[0].expr
        assert isinstance(e, ast.ListComprehension)
        assert e.var == "x"
        assert e.where is not None and e.map is not None

    def test_comprehension_filter_only(self):
        e = rq("MATCH (a:P) RETURN [x IN a.xs WHERE x > 1] AS ys") \
            .return_clause.items[0].expr
        assert isinstance(e, ast.ListComprehension)
        assert e.map is None

    def test_comprehension_map_only(self):
        e = rq("MATCH (a:P) RETURN [x IN a.xs | x * 2] AS ys") \
            .return_clause.items[0].expr
        assert isinstance(e, ast.ListComprehension)
        assert e.where is None

    def test_list_literal_still_works(self):
        e = rq("MATCH (a:P) RETURN [1, 2, 3] AS xs") \
            .return_clause.items[0].expr
        assert isinstance(e, ast.ListLiteral)

    def test_quantifiers(self):
        for kind in ("any", "all", "none", "single"):
            e = rq(f"MATCH (a:P) WHERE {kind}(x IN a.xs WHERE x > 0) RETURN a.name") \
                .parts[0].where
            assert isinstance(e, ast.Quantifier)
            assert e.kind == kind

    def test_reduce(self):
        e = rq("MATCH (a:P) RETURN reduce(acc = 0, x IN a.xs | acc + x) AS s") \
            .return_clause.items[0].expr
        assert isinstance(e, ast.Reduce)
        assert e.acc == "acc" and e.var == "x"

    def test_all_keyword_fn_still_parses(self):
        # `all` is also the UNION ALL keyword; quantifier wins on (x IN
        e = rq("MATCH (a:P) WHERE all(x IN [1] WHERE x = 1) RETURN a.name") \
            .parts[0].where
        assert isinstance(e, ast.Quantifier)


class TestExplain:
    def test_explain_wraps_read_query(self):
        s = parse("EXPLAIN MATCH (a:P) RETURN a.name AS n")
        assert isinstance(s, ast.ExplainQuery)
        assert s.mode == "formatted" and not s.profile
        assert isinstance(s.statement, ast.ReadQuery)

    def test_explain_modes(self):
        for mode in ("COST", "FORMATTED", "EXTENDED", "CODEGEN"):
            s = parse(f"EXPLAIN {mode} MATCH (a:P) RETURN a.name AS n")
            assert s.mode == mode.lower()

    def test_profile(self):
        s = parse("PROFILE MATCH (a:P) RETURN a.name AS n")
        assert isinstance(s, ast.ExplainQuery) and s.profile

    def test_explain_call(self):
        s = parse("EXPLAIN CALL graph.pagerank('R', 3) YIELD id, rank")
        assert isinstance(s.statement, ast.CallProcedure)

    def test_cost_stays_usable_as_identifier(self):
        # `cost` is NOT a reserved word: a property named cost parses
        q = parse("MATCH (a:P) WHERE a.cost > 1 RETURN a.cost AS cost")
        assert isinstance(q, ast.ReadQuery)

    def test_nested_explain_rejected(self):
        with pytest.raises(ParseError, match="nested"):
            parse("EXPLAIN EXPLAIN MATCH (a:P) RETURN a.name AS n")

    def test_explain_write_parses_but_session_rejects(self):
        s = parse("EXPLAIN MATCH (a:P) SET a.x = 1")
        assert isinstance(s, ast.ExplainQuery)
        assert isinstance(s.statement, ast.WriteQuery)


class TestSubqueryBlocks:
    def test_exists_block(self):
        e = rq("MATCH (c:P) WHERE EXISTS { MATCH (c)-[:R]->(b:Q) "
               "WHERE b.x > 1 } RETURN c.name").parts[0].where
        assert isinstance(e, ast.PatternPredicate)
        assert e.where is not None

    def test_exists_block_no_match_keyword(self):
        e = rq("MATCH (c:P) WHERE EXISTS { (c)-[:R]->(b:Q) } "
               "RETURN c.name").parts[0].where
        assert isinstance(e, ast.PatternPredicate)
        assert e.where is None

    def test_count_block(self):
        q_ = rq("MATCH (c:P) RETURN COUNT { (c)-[:R]->(b:Q) } AS n")
        e = q_.return_clause.items[0].expr
        assert isinstance(e, ast.CountSubquery)

    def test_count_block_in_comparison(self):
        e = rq("MATCH (c:P) WHERE COUNT { (c)-[:R]->(b) } >= 2 "
               "RETURN c.name").parts[0].where
        assert isinstance(e, ast.Binary)
        assert isinstance(e.left, ast.CountSubquery)

    def test_count_fn_still_parses(self):
        e = rq("MATCH (c:P) RETURN count(c.name) AS n") \
            .return_clause.items[0].expr
        assert isinstance(e, ast.FnCall)

    def test_call_subquery_block(self):
        q_ = rq("MATCH (r:Region) "
                "CALL { MATCH (n:Nation) RETURN count(*) AS total } "
                "RETURN r.r_name AS region, total")
        part = q_.parts[0]
        assert len(part.calls) == 1
        inner = part.calls[0].query
        assert inner.return_clause is not None
        assert inner.return_clause.items[0].alias == "total"

    def test_call_subquery_standalone_start(self):
        q_ = rq("CALL { MATCH (n:P) RETURN n.x AS x } RETURN x")
        assert len(q_.parts[0].calls) == 1
        assert q_.parts[0].matches == []

    def test_call_subquery_requires_return(self):
        # a block without RETURN fails in the inner parser (it sees
        # '}' where a clause keyword belongs)
        with pytest.raises(ParseError, match="RETURN"):
            rq("MATCH (a:P) CALL { MATCH (b:Q) } RETURN a.x AS x")

    def test_call_procedure_still_parses(self):
        from brahmand_spark.parser.parser import parse

        stmt = parse("CALL graph.pagerank('R', 5) YIELD id, rank")
        assert isinstance(stmt, ast.CallProcedure)

    def test_has_count_subquery_flag(self):
        """The parser flags queries containing COUNT { } so the
        compiler can skip per-item rewrite walks on subquery-free
        queries (VERDICT r5 #5)."""
        assert rq("MATCH (c:P) RETURN COUNT { (c)-[:R]->(b) } AS n") \
            .has_count_subquery is True
        assert rq("MATCH (c:P) WHERE COUNT { (c)-[:R]->(b) } >= 2 "
                  "RETURN c.name").has_count_subquery is True
        assert rq("MATCH (c:P) RETURN count(c.name) AS n") \
            .has_count_subquery is False
        # EXISTS { } compiles as a pattern predicate, not a COUNT
        # rewrite — it must not set the flag
        assert rq("MATCH (c:P) WHERE EXISTS { (c)-[:R]->(b:Q) } "
                  "RETURN c.name").has_count_subquery is False
        # union arms carry their own precise flag
        u = rq("MATCH (c:P) RETURN c.name AS n "
               "UNION MATCH (d:P) WHERE COUNT { (d)-[:R]->(b) } > 0 "
               "RETURN d.name AS n")
        assert u.has_count_subquery is True  # conservative on the root
        assert u.unions[0][0].has_count_subquery is True


def test_foreach_parses_to_write_clause():
    """FOREACH after MATCH parses into a WriteQuery ForeachClause (r7
    — executable under allow_writes; the rejection moved to the
    session's write gate)."""
    wq = parse("MATCH (a:P) FOREACH (x IN [1,2] | SET a.v = x)")
    assert isinstance(wq, ast.WriteQuery)
    fc = wq.foreachs[0]
    assert fc.var == "x" and len(fc.sets) == 1
    target, value = fc.sets[0]
    assert target == ast.PropertyAccess("a", "v")
    assert value == ast.Variable("x")


def test_foreach_unsupported_bodies_guided():
    """CREATE / MERGE / REMOVE / nested FOREACH bodies keep a guided
    rejection."""
    with pytest.raises(ParseError, match="only SET and DELETE"):
        parse("MATCH (a:P) FOREACH (x IN [1] | CREATE (:T {v: x}))")
    with pytest.raises(ParseError, match="only SET and DELETE"):
        parse("MATCH (a:P) FOREACH (x IN [1] | "
              "FOREACH (y IN [2] | SET a.v = y))")


def test_foreach_stays_usable_as_identifier():
    """FOREACH is only reserved at clause position: properties and
    labels named foreach still parse through the soft-keyword path
    (aliases are plain identifiers for every soft keyword, unchanged)
    (r6 review)."""
    q = rq("MATCH (n:foreach) RETURN n.foreach AS f")
    assert q.parts[0].matches[0].paths[0].nodes[0].label == "foreach"
    e = q.return_clause.items[0].expr
    assert e == ast.PropertyAccess("n", "foreach")


def test_foreach_rejected_at_statement_start():
    """Statement-initial FOREACH has nothing to mutate — still a
    guided rejection."""
    with pytest.raises(ParseError, match="UNWIND"):
        parse("FOREACH (x IN [1,2] | CREATE (:T {v: x}))")


def test_foreach_combines_with_set_in_write_query():
    wq = parse("MATCH (a:P) SET a.y = 1 FOREACH (x IN [1] | SET a.v = x)")
    assert isinstance(wq, ast.WriteQuery)
    assert wq.set_clause is not None and len(wq.foreachs) == 1


class TestSubqueryBlockErrorLocality:
    """r9 advice fix: a block that unambiguously STARTED as a
    subquery pattern (EXISTS/COUNT/COLLECT { MATCH ... / ( ... )
    must error AT the fault when malformed — no silent backtrack to
    a far-away 'expected expression' / map-projection error. Blocks
    that never looked like patterns still fall through, so variables
    named exists/count/collect keep their map projections."""

    def test_malformed_exists_block_points_at_fault(self):
        import pytest

        from brahmand_spark.errors import ParseError
        from brahmand_spark.parser.parser import parse

        with pytest.raises(ParseError, match=r"expected '\]'"):
            parse("MATCH (c:Customer) WHERE EXISTS "
                  "{ MATCH (c)-[:PLACED->(o:Order) } "
                  "RETURN c.c_custkey AS k")

    def test_malformed_collect_block_points_at_fault(self):
        import pytest

        from brahmand_spark.errors import ParseError
        from brahmand_spark.parser.parser import parse

        with pytest.raises(ParseError, match=r"expected '\)'"):
            parse("MATCH (c:Customer) RETURN "
                  "COLLECT { MATCH (c)-[:PLACED]-(o RETURN o.x } AS xs")

    def test_variables_named_like_blocks_keep_map_projection(self):
        from brahmand_spark.parser.parser import parse

        for name in ("count", "exists", "collect"):
            stmt = parse(f"MATCH ({name}:Customer) "
                         f"RETURN {name} {{.c_name}} AS m")
            assert stmt.return_clause is not None


class TestQppParsing:
    """Quantified path patterns (r13): parse-time desugar to the
    var-length RelPattern; genuinely new shapes reject loudly."""

    def _rel(self, text):
        from brahmand_spark.parser.parser import parse

        return parse(text).parts[0].matches[0].paths[0].rels[0]

    def test_desugars_to_var_length(self):
        r = self._rel("MATCH (a:Customer) ((x)-[:NEXT_CUST]->(y)){1,3}"
                      " (b:Customer) RETURN a")
        assert (r.type_name, r.min_hops, r.max_hops) == \
            ("NEXT_CUST", 1, 3)

    def test_exact_open_and_plus_quantifiers(self):
        r = self._rel("MATCH (a) (()-[:R]->()){2} (b) RETURN a")
        assert (r.min_hops, r.max_hops) == (2, 2)
        r = self._rel("MATCH (a) (()-[:R]->()){2,} (b) RETURN a")
        assert (r.min_hops, r.max_hops) == (2, None)
        r = self._rel("MATCH (a) (()-[:R]->())+ (b) RETURN a")
        assert (r.min_hops, r.max_hops) == (1, None)

    def test_zero_length_quantifiers(self):
        """* / {,n} / {0,n} desugar to a zero lower bound (r13 —
        zero-hop identity rows, compile/compiler._zero_hop_rows)."""
        r = self._rel("MATCH (a) (()-[:R]->())* (b) RETURN a")
        assert (r.min_hops, r.max_hops) == (0, None)
        r = self._rel("MATCH (a) (()-[:R]->()){,3} (b) RETURN a")
        assert (r.min_hops, r.max_hops) == (0, 3)
        r = self._rel("MATCH (a) (()-[:R]->()){0,2} (b) RETURN a")
        assert (r.min_hops, r.max_hops) == (0, 2)

    def test_direction_and_where_fold(self):
        from brahmand_spark.parser import ast

        r = self._rel("MATCH (a) (()<-[h:R]-() WHERE h.k = 5){1,2} "
                      "(b) RETURN a")
        assert r.direction == "in"
        assert r.properties == {"k": ast.Literal(5)}

    def test_rejections_are_loud(self):
        import pytest

        from brahmand_spark.parser.parser import parse

        for text, frag in [
            ("MATCH (a) ((x)-[:R]->(y)-[:S]->(z)){1,2} (b) RETURN a",
             "exactly one"),
            ("MATCH (a) ((x)-[:R]->(y:L)){1,2} (b) RETURN a",
             "inner node labels"),
            ("MATCH (a) ((x {k: 1})-[:R]->(y)){1,2} (b) RETURN a",
             "inner node labels"),
            ("MATCH (a) ((x)-[:R*1..2]->(y)){1,2} (b) RETURN a",
             "nested quantifier"),
            ("MATCH (a) ((x)-[:R]->(y)) (b) RETURN a", "quantifier"),
            ("MATCH (a) ((x)-[h:R]->(y) WHERE x.v > 0){1,2} (b) "
             "RETURN a", "equalit"),
            ("MATCH (a) ((x)-[h:R]->(y) WHERE h.v > 0){1,2} (b) "
             "RETURN a", "equalit"),
        ]:
            with pytest.raises(ParseError, match=frag):
                parse(text)
