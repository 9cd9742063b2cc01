"""Property-based parser tests (hypothesis): render random expression
ASTs to Cypher text with full parenthesization, re-parse, and require the
identical AST back. Catches precedence/tokenizer regressions the example
tests miss."""

from hypothesis import given, settings
from hypothesis import strategies as st

from brahmand_spark.parser import ast, parse

# Derive the reserved set from the lexer so it can never drift: a
# hand-copied list silently misses keywords added later (ON/MERGE/
# CALL/YIELD/FOREACH/EXPLAIN/PROFILE landed in r5-r7 and hypothesis
# eventually generated `on` as a variable name, r8).
from brahmand_spark.parser.lexer import KEYWORDS  # noqa: E402

IDENT = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s.upper() not in KEYWORDS
)

LITERALS = st.one_of(
    st.integers(min_value=0, max_value=10**12).map(ast.Literal),
    st.floats(min_value=0.001, max_value=1e6, allow_nan=False,
              allow_infinity=False).map(lambda f: ast.Literal(round(f, 6))),
    st.booleans().map(ast.Literal),
    st.just(ast.Literal(None)),
    st.text(
        alphabet=st.characters(
            codec="ascii", exclude_characters="'\"\\\n\r\t`"
        ),
        max_size=12,
    ).map(ast.Literal),
)

BIN_OPS = ["+", "-", "*", "/", "%", "^", "=", "<>", "<", ">", "<=", ">=",
           "AND", "OR", "XOR", "STARTS_WITH", "ENDS_WITH", "CONTAINS"]


def exprs(depth: int = 3):
    base = st.one_of(
        LITERALS,
        IDENT.map(ast.Variable),
        st.tuples(IDENT, IDENT).map(lambda t: ast.PropertyAccess(*t)),
        IDENT.map(ast.Parameter),
    )
    if depth == 0:
        return base
    sub = exprs(depth - 1)
    return st.one_of(
        base,
        st.tuples(st.sampled_from(BIN_OPS), sub, sub).map(
            lambda t: ast.Binary(t[0], t[1], t[2])
        ),
        st.tuples(st.sampled_from(["NOT", "-"]), sub).map(
            lambda t: ast.Unary(t[0], t[1])
        ),
        st.tuples(sub, st.booleans()).map(
            lambda t: ast.IsNull(t[0], negated=t[1])
        ),
        st.lists(sub, max_size=3).map(lambda xs: ast.ListLiteral(tuple(xs))),
        st.tuples(IDENT, st.lists(sub, max_size=3)).map(
            lambda t: ast.FnCall(t[0], tuple(t[1]))
        ),
    )


def render(e: ast.Expr) -> str:
    """Fully-parenthesized Cypher text for an expression AST."""
    if isinstance(e, ast.Literal):
        v = e.value
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return "'" + v.replace("'", "\\'") + "'"
        return repr(v)
    if isinstance(e, ast.Variable):
        return e.name
    if isinstance(e, ast.PropertyAccess):
        return f"{e.alias}.{e.key}"
    if isinstance(e, ast.Parameter):
        return f"${e.name}"
    if isinstance(e, ast.ListLiteral):
        return "[" + ", ".join(render(x) for x in e.items) + "]"
    if isinstance(e, ast.FnCall):
        return f"{e.name}(" + ", ".join(render(a) for a in e.args) + ")"
    if isinstance(e, ast.Unary):
        op = "NOT " if e.op == "NOT" else e.op
        return f"({op}{render(e.operand)})"
    if isinstance(e, ast.IsNull):
        return f"({render(e.operand)} IS {'NOT ' if e.negated else ''}NULL)"
    if isinstance(e, ast.Binary):
        op = {
            "STARTS_WITH": "STARTS WITH", "ENDS_WITH": "ENDS WITH",
        }.get(e.op, e.op)
        return f"({render(e.left)} {op} {render(e.right)})"
    raise AssertionError(f"unhandled {e!r}")


@settings(max_examples=300, deadline=None)
@given(exprs())
def test_expr_roundtrip(e):
    text = f"MATCH (a) WHERE {render(e)} RETURN a"
    q = parse(text)
    assert isinstance(q, ast.ReadQuery)
    assert q.parts[0].where == e, f"\nrendered: {text}\nparsed:  {q.parts[0].where}"


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(IDENT, st.one_of(st.none(), IDENT)), min_size=1, max_size=4
    )
)
def test_return_items_roundtrip(items):
    text = "MATCH (a) RETURN " + ", ".join(
        name if alias is None else f"{name} AS {alias}"
        for name, alias in items
    )
    q = parse(text)
    got = [
        (i.expr.name, i.alias) for i in q.return_clause.items
    ]
    assert got == list(items)
