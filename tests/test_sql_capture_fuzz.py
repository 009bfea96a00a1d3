"""Randomized soundness fuzz for the r12 SQL predicate capture: for
arbitrary generated WHERE clauses (AND/OR nesting, BETWEEN, IN, NOT,
LIKE, parens, mixed qualified/unqualified references, self joins),
run_sql over Iceberg tables must return EXACTLY what plain Spark SQL
returns on the same data — the captured filter may only skip IO, never
change rows. This is the property the round's two capture bugs
(self-join over-capture, OR/AND precedence) violated."""

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from iceberg_rust_spark import FileSystemCatalog, Table
from iceberg_rust_spark.sources.sql import run_sql
from iceberg_rust_spark.sources.types import schema_from_spark

COLS = ["a", "b", "c"]


@st.composite
def leaf(draw, no_like=False):
    col = draw(st.sampled_from(COLS))
    kind = draw(st.sampled_from(
        ["cmp", "between", "in", "null"] + ([] if no_like else ["like"])))
    if kind == "cmp":
        op = draw(st.sampled_from(["=", "<>", "<", "<=", ">", ">="]))
        return f"{col} {op} {draw(st.integers(-2, 12))}"
    if kind == "between":
        lo = draw(st.integers(-2, 8))
        return f"{col} BETWEEN {lo} AND {lo + draw(st.integers(0, 6))}"
    if kind == "in":
        vals = draw(st.lists(st.integers(-2, 12), min_size=1, max_size=4))
        return f"{col} IN ({', '.join(map(str, vals))})"
    if kind == "null":
        return f"{col} IS {'NOT ' if draw(st.booleans()) else ''}NULL"
    return f"s LIKE '{draw(st.sampled_from(['r%', '%3', 'r1%', '%']))}'"


@st.composite
def boolexpr(draw, depth=0, no_like=False):
    if depth >= 3 or draw(st.integers(0, 2)) == 0:
        e = draw(leaf(no_like=no_like))
        return f"NOT ({e})" if draw(st.booleans()) else e
    left = draw(boolexpr(depth + 1, no_like=no_like))
    right = draw(boolexpr(depth + 1, no_like=no_like))
    op = draw(st.sampled_from(["AND", "OR"]))
    if draw(st.booleans()):
        return f"({left}) {op} ({right})"
    return f"{left} {op} {right}"


@pytest.fixture(scope="module")
def fuzz_env(spark, tmp_path_factory):
    import pyspark.sql.functions as F
    wh = tmp_path_factory.mktemp("capture_fuzz")
    cat = FileSystemCatalog(str(wh))
    df = spark.range(0, 400, 1, 4).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b"),
        F.when(F.col("id") % 11 == 0, None)
         .otherwise(F.col("id") % 13).alias("c"),
        F.concat(F.lit("r"), (F.col("id") % 5).cast("string")).alias("s"))
    Table.create(cat, "db.fz", schema_from_spark(df.schema)).append(spark, df)
    df.createOrReplaceTempView("fz_raw")
    df2 = df.select(F.col("a").alias("k"), (F.col("a") % 3).alias("g"))
    Table.create(cat, "db.fz2", schema_from_spark(df2.schema)).append(spark, df2)
    df2.createOrReplaceTempView("fz2_raw")
    return cat


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(where=boolexpr())
def test_single_table_capture_sound(spark, fuzz_env, where):
    q = f"SELECT a, b, c FROM db.fz WHERE {where} ORDER BY a"
    got = [tuple(r) for r in run_sql(spark, fuzz_env, q).collect()]
    want = [tuple(r) for r in
            spark.sql(q.replace("db.fz", "fz_raw")).collect()]
    assert got == want, where


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(w1=boolexpr(), w2=boolexpr(no_like=True))
def test_join_capture_sound(spark, fuzz_env, w1, w2):
    # qualified per-alias WHERE over an inner join; w2 rewritten onto fz2
    w1q = w1
    for c in COLS + ["s"]:
        w1q = w1q.replace(f"{c} ", f"x.{c} ").replace(f"({c} ", f"(x.{c} ")
    import re as _re
    w2q = _re.sub(r"\b([abc])\b",
                  lambda m: {"a": "y.k", "b": "y.g", "c": "y.g"}[m.group(1)],
                  w2)
    q = (f"SELECT x.a, y.g FROM db.fz x JOIN db.fz2 y ON x.a = y.k "
         f"WHERE ({w1q}) AND ({w2q}) ORDER BY x.a, y.g")
    got = [tuple(r) for r in run_sql(spark, fuzz_env, q).collect()]
    want = [tuple(r) for r in spark.sql(
        q.replace("db.fz2", "fz2_raw").replace("db.fz", "fz_raw")
    ).collect()]
    assert got == want, (w1q, w2q)


def _qx(w):
    import re as _re
    return _re.sub(r"\b([abc])\b", lambda m: f"x.{m.group(1)}", w)


def _qy(w):
    import re as _re
    return _re.sub(r"\b([abc])\b",
                   lambda m: {"a": "y.k", "b": "y.g", "c": "y.g"}[m.group(1)],
                   w)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(w1=boolexpr(no_like=True), w2=boolexpr(no_like=True),
       off=st.integers(0, 3))
def test_self_join_per_reference_capture_sound(spark, fuzz_env, w1, w2, off):
    """r13 per-reference views: a self join where EACH reference carries
    its own conjunct — both references may now prune independently, and
    the result must still equal plain Spark exactly."""
    import re as _re
    w2x = _re.sub(r"\b([abc])\b", lambda m: f"y.{m.group(1)}", w2)
    q = (f"SELECT x.a, x.b, y.c FROM db.fz x JOIN db.fz y "
         f"ON x.a = y.a + {off} WHERE ({_qx(w1)}) AND ({w2x}) "
         f"ORDER BY x.a, y.c")
    got = [tuple(r) for r in run_sql(spark, fuzz_env, q).collect()]
    want = [tuple(r) for r in
            spark.sql(q.replace("db.fz", "fz_raw")).collect()]
    assert got == want, (w1, w2, off)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(w=boolexpr(no_like=True), on_extra=boolexpr(no_like=True),
       kind=st.sampled_from(["JOIN", "LEFT JOIN", "LEFT OUTER JOIN",
                             "RIGHT JOIN", "RIGHT OUTER JOIN"]),
       w_side=st.sampled_from(["x", "y"]),
       on_side=st.sampled_from(["x", "y"]))
def test_outer_join_where_and_on_capture_sound(spark, fuzz_env, w,
                                               on_extra, kind, w_side,
                                               on_side):
    """r13 fuzz extension (VERDICT task 3): LEFT/RIGHT joins with WHERE
    conjuncts on either side and extra ON conjuncts on either side —
    sql.py's preserved-side / null-supplying routing (WHERE prunes only
    the preserved side; ON prunes only the null-supplying side) must
    leave run_sql ≡ plain Spark, including IS NULL leaves that punish
    any mis-routed capture with fabricated or dropped null-extensions."""
    wq = _qx(w) if w_side == "x" else _qy(w)
    onq = _qx(on_extra) if on_side == "x" else _qy(on_extra)
    q = (f"SELECT x.a, x.c, y.g FROM db.fz x {kind} db.fz2 y "
         f"ON x.a = y.k AND ({onq}) WHERE ({wq}) "
         f"ORDER BY x.a, x.c, y.g")
    got = [tuple(r) for r in run_sql(spark, fuzz_env, q).collect()]
    want = [tuple(r) for r in spark.sql(
        q.replace("db.fz2", "fz2_raw").replace("db.fz", "fz_raw")
    ).collect()]
    assert got == want, (kind, w_side, wq, on_side, onq)
