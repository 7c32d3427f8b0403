"""Function-query parser registry (ValueSourceParser analog)."""

import pandas as pd
import pytest

from lucene_solr_spark.functions.funcquery import compile_func


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        pd.DataFrame({
            "x": [1.0, 4.0, 9.0, 16.0],
            "y": [10.0, 20.0, 30.0, 40.0],
            "s": ["kitten", "sitting", "abc", "abc"],
        })
    )


def _vals(df, col):
    return [r["v"] for r in df.select(col.alias("v")).collect()]


def test_arithmetic_nesting(df):
    c = compile_func("sum(product(x,2),div(y,10))")
    assert _vals(df, c) == [3.0, 10.0, 21.0, 36.0]
    c = compile_func("sqrt(x)")
    assert _vals(df, c) == [1.0, 2.0, 3.0, 4.0]
    c = compile_func("max(x,min(y,12))")
    assert _vals(df, c) == [10.0, 12.0, 12.0, 16.0]


def test_recip_linear_map(df):
    c = compile_func("recip(x,1,100,1)")  # 100/(x+1)
    assert _vals(df, c) == [50.0, 20.0, 10.0, 100.0 / 17.0]
    c = compile_func("linear(x,3,7)")
    assert _vals(df, c) == [10.0, 19.0, 34.0, 55.0]
    c = compile_func("map(x,4,9,0)")  # x in [4,9] -> 0, else x
    assert _vals(df, c) == [1.0, 0.0, 0.0, 16.0]


def test_conditional_and_bool(df):
    c = compile_func("if(and(gt(x,2),lt(x,12)),1,0)")
    assert _vals(df, c) == [0, 1, 1, 0]
    c = compile_func("if(or(eq(x,1),gte(x,16)),y,neg(y))")
    assert _vals(df, c) == [10.0, -20.0, -30.0, 40.0]


def test_strdist(df):
    c = compile_func('strdist(s,"sitting")')
    got = _vals(df, c)
    assert got[1] == 1.0  # identical
    assert 0 < got[0] < 1  # kitten vs sitting: 3 edits / 7


def test_scale_two_pass(spark, df):
    c = compile_func("scale(x,0,1)", df)
    got = _vals(df, c)
    assert got[0] == 0.0 and got[3] == 1.0
    assert got[1] == pytest.approx(3.0 / 15.0)


def test_errors(df):
    with pytest.raises(ValueError, match="unknown function"):
        compile_func("frobnicate(x)")
    with pytest.raises(ValueError, match="NOW"):
        compile_func("ms(NOW,x)")
    with pytest.raises(ValueError, match="scale.*DataFrame"):
        compile_func("scale(x,0,1)")


@pytest.fixture(scope="module")
def docs_df(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta"]
    rows = []
    for i in range(40):
        n = int(rng.integers(3, 12))
        rows.append((i, " ".join(rng.choice(words, n)), f"s{i % 7}"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_single_quoted_strings_parse():
    from lucene_solr_spark.functions.funcquery import _Parser

    tree = _Parser("tf(text,'dup')").parse_expr()
    assert tree == ("call", "tf", [("field", "text"), ("str", "dup")])


def test_ord_rord(spark, docs_df):
    from lucene_solr_spark.functions.funcquery import apply_funcquery

    got = {
        r["source"]: r["func"]
        for r in apply_funcquery(docs_df, "ord(source)")
        .select("source", "func").distinct().collect()
    }
    srcs = sorted({f"s{i % 7}" for i in range(40)})
    assert got == {s: i + 1 for i, s in enumerate(srcs)}
    rgot = {
        r["source"]: r["func"]
        for r in apply_funcquery(docs_df, "rord(source)")
        .select("source", "func").distinct().collect()
    }
    assert rgot == {s: len(srcs) - i for i, s in enumerate(srcs)}


def test_tf_docfreq_idf(spark, docs_df):
    from lucene_solr_spark.functions.funcquery import apply_funcquery
    from lucene_solr_spark.search import bm25

    pdf = docs_df.toPandas()
    tf_exp = {
        int(r["doc_id"]): r["text"].split().count("alpha")
        for _, r in pdf.iterrows()
    }
    got = {
        int(r["doc_id"]): int(r["func"])
        for r in apply_funcquery(docs_df, "tf(text,'alpha')").collect()
    }
    assert got == tf_exp
    dfreq = sum(1 for v in tf_exp.values() if v > 0)
    g = apply_funcquery(docs_df, "docfreq(text,'alpha')").collect()
    assert all(r["func"] == dfreq for r in g)
    g2 = apply_funcquery(docs_df, "idf(text,'alpha')").collect()
    import numpy as np

    assert all(
        np.float32(r["func"]) == bm25.idf(dfreq, len(pdf)) for r in g2
    )


def test_norm_quantized_length(spark, docs_df):
    import numpy as np

    from lucene_solr_spark.functions.funcquery import apply_funcquery
    from lucene_solr_spark.search import bm25

    pdf = docs_df.toPandas()
    got = {
        int(r["doc_id"]): r["func"]
        for r in apply_funcquery(docs_df, "norm(text)").collect()
    }
    for _, r in pdf.iterrows():
        dl = len(r["text"].split())
        exp = float(bm25.NORM_TABLE[bm25.encode_norm(np.array([dl]))[0]])
        assert got[int(r["doc_id"])] == exp


def test_query_value_source(spark, small_index, pages_small):
    import numpy as np

    from lucene_solr_spark.functions.funcquery import apply_funcquery
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    s = SparkSearcher(spark, idx)
    docs = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    )
    out = {
        int(r["doc_id"]): np.float32(r["func"])
        for r in apply_funcquery(docs, "query('babe roro')", searcher=s).collect()
    }
    ref = s.search_pdf("babe roro", k=5000)
    ref_map = dict(zip(ref["docid"].astype(int), ref["score"].astype(np.float32)))
    for d in range(2000):
        assert out[d] == np.float32(ref_map.get(d, 0.0))


def test_geodist_matches_haversine(spark, docs_df):
    from pyspark.sql import functions as F

    from lucene_solr_spark.functions.funcquery import apply_funcquery
    from lucene_solr_spark.functions.spatial import haversine_km

    g = docs_df.select(
        "doc_id",
        (F.col("doc_id") * 7 % 180 - 90 + F.lit(0.25)).cast("double").alias("lat"),
        (F.col("doc_id") * 13 % 360 - 180 + F.lit(0.25)).cast("double").alias("lon"),
    )
    a = apply_funcquery(g, "geodist(lat, lon, 42.0, 7.0)").select("doc_id", "func")
    b = g.select("doc_id", haversine_km(
        F.col("lat"), F.col("lon"), F.lit(42.0), F.lit(7.0)).alias("ref"))
    j = a.join(b, "doc_id").collect()
    for r in j:
        assert r["func"] == r["ref"]


def test_def_exists_xor(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.functions.funcquery import compile_func

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 7.0)], "id long, x double"
    )
    got = {r["id"]: r["v"] for r in df.select(
        "id", compile_func("def(x, 0)").alias("v")).collect()}
    assert got == {1: 5.0, 2: 0.0, 3: 7.0}
    got = {r["id"]: r["v"] for r in df.select(
        "id", compile_func("exists(x)").alias("v")).collect()}
    assert got == {1: True, 2: False, 3: True}
    got = {r["id"]: r["v"] for r in df.select(
        "id", compile_func("xor(gt(x,6), exists(x))").alias("v")).collect()}
    assert got == {1: True, 2: None, 3: False}


def test_xor_numeric_truthiness(spark):
    """xor coerces operands to booleans (XOrFunction): truthy xor truthy
    is false even for ints 2 and 1."""
    from lucene_solr_spark.functions.funcquery import compile_func

    df = spark.createDataFrame([(2, 1), (0, 3), (0, 0)], "a int, b int")
    got = [r["v"] for r in df.select(compile_func("xor(a, b)").alias("v")).collect()]
    assert got == [False, True, False]


def test_apply_funcquery_preserves_caller_columns(spark):
    from lucene_solr_spark.functions.funcquery import apply_funcquery

    df = spark.createDataFrame(
        [(1, "alpha beta", 5, 6)], "doc_id long, text string, lo int, hi int"
    )
    out = apply_funcquery(df, "tf(text,'alpha')")
    assert {"lo", "hi"} <= set(out.columns)
