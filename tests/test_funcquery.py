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
