"""Tokenizer for the openCypher subset.

The reference parses with nom combinators directly over the input str
(open_cypher_parser/*.rs); we tokenize first — same surface, simpler
recursive-descent parser on top.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..errors import ParseError

KEYWORDS = {
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "ORDER", "BY", "ASC",
    "ASCENDING", "DESC", "DESCENDING", "SKIP", "LIMIT", "DISTINCT", "AND",
    "OR", "NOT", "XOR", "IN", "IS", "NULL", "TRUE", "FALSE", "AS", "CREATE",
    "NODE", "REL", "TABLE", "FROM", "TO", "PRIMARY", "KEY", "DEFAULT",
    "SET", "REMOVE", "DELETE", "DETACH", "UNION", "ALL", "UNWIND", "CASE",
    "WHEN", "THEN", "ELSE", "END", "STARTS", "ENDS", "CONTAINS", "MERGE",
    "ON", "CALL", "YIELD", "EXPLAIN", "PROFILE", "FOREACH",
}

# Multi-char operators first (longest match wins).
TWO_CHAR = {"<=", ">=", "<>", "!=", "=~", ".."}
ONE_CHAR = set("()[]{},;:.+-*/%^<>=|$")


@dataclass(frozen=True)
class Token:
    kind: str  # 'KEYWORD' | 'IDENT' | 'INT' | 'FLOAT' | 'STRING' | 'OP' | 'EOF'
    value: str
    pos: int


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "/" and i + 1 < n and text[i + 1] == "/":  # line comment
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "/" and i + 1 < n and text[i + 1] == "*":  # block comment
            j = text.find("*/", i + 2)
            if j < 0:
                raise ParseError("unterminated block comment", i, text)
            i = j + 2
            continue
        if c.isalpha() or c == "_":
            j = i + 1
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            word = text[i:j]
            kind = "KEYWORD" if word.upper() in KEYWORDS else "IDENT"
            tokens.append(Token(kind, word.upper() if kind == "KEYWORD" else word, i))
            i = j
            continue
        if c == "`":  # backtick-quoted identifier
            j = text.find("`", i + 1)
            if j < 0:
                raise ParseError("unterminated quoted identifier", i, text)
            tokens.append(Token("IDENT", text[i + 1:j], i))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and text[i + 1].isdigit()):
            j = i
            seen_dot = False
            seen_exp = False
            while j < n:
                ch = text[j]
                if ch.isdigit():
                    j += 1
                elif ch == "." and not seen_dot and not seen_exp:
                    # Don't consume '..' (range operator).
                    if j + 1 < n and text[j + 1] == ".":
                        break
                    seen_dot = True
                    j += 1
                elif ch in "eE" and not seen_exp and j > i:
                    if j + 1 < n and (text[j + 1].isdigit() or text[j + 1] in "+-"):
                        seen_exp = True
                        j += 2 if text[j + 1] in "+-" else 1
                    else:
                        break
                else:
                    break
            num = text[i:j]
            kind = "FLOAT" if (seen_dot or seen_exp) else "INT"
            tokens.append(Token(kind, num, i))
            i = j
            continue
        if c in ("'", '"'):
            j = i + 1
            buf = []
            while j < n and text[j] != c:
                if text[j] == "\\" and j + 1 < n:
                    esc = text[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r", "\\": "\\",
                                "'": "'", '"': '"'}.get(esc, esc))
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise ParseError("unterminated string literal", i, text)
            tokens.append(Token("STRING", "".join(buf), i))
            i = j + 1
            continue
        if text[i:i + 2] in TWO_CHAR:
            tokens.append(Token("OP", text[i:i + 2], i))
            i += 2
            continue
        if c in ONE_CHAR:
            tokens.append(Token("OP", c, i))
            i += 1
            continue
        raise ParseError(f"unexpected character {c!r}", i, text)
    tokens.append(Token("EOF", "", n))
    return tokens
