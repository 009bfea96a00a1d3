"""Parse a SQL boolean expression (WHERE-clause text) into the Predicate AST.

The inverse direction of the reference's expr_to_predicate.rs (DataFusion
Expr -> Iceberg Predicate, crates/integrations/datafusion/src/physical_plan/
expr_to_predicate.rs:45-278): here SQL text becomes OUR Predicate so the SQL
front door can file-prune DELETEs and scans. Grammar (recursive descent):

    expr     := or
    or       := and (OR and)*
    and      := unary (AND unary)*
    unary    := NOT unary | '(' expr ')' | cmp
    cmp      := ident (op literal | IN list | NOT IN list |
                IS NULL | IS NOT NULL | BETWEEN lit AND lit |
                LIKE 'prefix%')
    literal  := number | 'string' | DATE 'd' | TIMESTAMP 'ts' | TRUE | FALSE

Only prefix LIKE ('abc%') maps to starts_with — same Inexact rule the
reference applies (expr_to_predicate.rs:151); anything unsupported raises,
callers fall back to post-scan filtering (fail-safe, never over-prunes).
"""

from __future__ import annotations

import datetime as dt
import re
from typing import Any, List, Tuple

from . import expr as E

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<num>-?\d+\.\d+|-?\d+)
    | (?P<str>'(?:[^']|'')*')
    | (?P<op><=|>=|<>|!=|=|<|>)
    | (?P<lp>\() | (?P<rp>\))
    | (?P<comma>,)
    | (?P<word>[A-Za-z_][A-Za-z_0-9.]*)
    )""", re.VERBOSE)


def _tokenize(s: str) -> List[Tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m:
            if s[i:].strip() == "":
                break
            raise ValueError(f"cannot tokenize SQL predicate at: {s[i:]!r}")
        i = m.end()
        for kind in ("num", "str", "op", "lp", "rp", "comma", "word"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


class _Parser:
    def __init__(self, tokens: List[Tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self, kind=None, value=None):
        if self.i >= len(self.toks):
            return None
        k, v = self.toks[self.i]
        if kind and k != kind:
            return None
        if value and v.upper() != value:
            return None
        return v

    def take(self, kind=None, value=None):
        v = self.peek(kind, value)
        if v is None:
            got = self.toks[self.i] if self.i < len(self.toks) else "<eof>"
            raise ValueError(f"expected {value or kind}, got {got}")
        self.i += 1
        return v

    # expr := or
    def parse(self) -> E.Predicate:
        p = self.or_()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return p

    def or_(self) -> E.Predicate:
        p = self.and_()
        while self.peek("word", "OR"):
            self.take()
            p = p | self.and_()
        return p

    def and_(self) -> E.Predicate:
        p = self.unary()
        while self.peek("word", "AND"):
            self.take()
            p = p & self.unary()
        return p

    def unary(self) -> E.Predicate:
        if self.peek("word", "NOT"):
            self.take()
            return ~self.unary()
        if self.peek("lp"):
            self.take()
            p = self.or_()
            self.take("rp")
            return p
        return self.cmp()

    def literal(self) -> Any:
        if self.peek("num") is not None:
            v = self.take("num")
            return float(v) if "." in v else int(v)
        if self.peek("word", "DATE") or self.peek("word", "TIMESTAMP"):
            kind = self.take().upper()
            raw = self.take("str")[1:-1]
            if kind == "DATE":
                return dt.date.fromisoformat(raw)
            return dt.datetime.fromisoformat(raw)
        if self.peek("word", "TRUE"):
            self.take()
            return True
        if self.peek("word", "FALSE"):
            self.take()
            return False
        if self.peek("str") is not None:
            return self.take("str")[1:-1].replace("''", "'")
        raise ValueError(f"expected literal at {self.toks[self.i:]}")

    def cmp(self) -> E.Predicate:
        name = self.take("word")
        c = E.col(name)
        if self.peek("word", "IS"):
            self.take()
            if self.peek("word", "NOT"):
                self.take()
                self.take("word", "NULL")
                return c.not_null()
            self.take("word", "NULL")
            return c.is_null()
        negated = False
        if self.peek("word", "NOT"):
            self.take()
            negated = True
        if self.peek("word", "IN"):
            self.take()
            self.take("lp")
            vals = [self.literal()]
            while self.peek("comma"):
                self.take()
                vals.append(self.literal())
            self.take("rp")
            return c.not_in(vals) if negated else c.isin(vals)
        if self.peek("word", "BETWEEN"):
            self.take()
            lo = self.literal()
            self.take("word", "AND")
            hi = self.literal()
            p = (c >= lo) & (c <= hi)
            return ~p if negated else p
        if self.peek("word", "LIKE"):
            self.take()
            pat = self.take("str")[1:-1].replace("''", "'")
            if not pat.endswith("%") or any(ch in pat[:-1] for ch in "%_"):
                raise ValueError(
                    f"only prefix LIKE 'abc%' is prunable, got {pat!r}")
            p = c.starts_with(pat[:-1])
            return ~p if negated else p
        if negated:
            raise ValueError("NOT must precede IN/BETWEEN/LIKE")
        op = self.take("op")
        lit = self.literal()
        return {"<": c < lit, "<=": c <= lit, ">": c > lit, ">=": c >= lit,
                "=": c == lit, "!=": c != lit, "<>": c != lit}[op]


def sql_to_predicate(where: str) -> E.Predicate:
    """Parse WHERE-clause text into a Predicate (raises on unsupported
    constructs — callers treat that as 'cannot prune', never as 'no rows')."""
    return _Parser(_tokenize(where)).parse()
