"""Expression compiler tests (expressions/.../js/JavascriptCompiler.java
grammar; value cases mirror the reference's TestJavascriptCompiler /
TestJavascriptOperations style)."""

import numpy as np
import pytest

from lucene_ray.functions.expressions import (
    ExpressionError,
    compile_expression,
)


def ev(src, **env):
    return compile_expression(src).evaluate(env)


def test_literals_and_arithmetic():
    assert ev("1+2*3") == pytest.approx(7.0)
    assert ev("(1+2)*3") == pytest.approx(9.0)
    assert ev("10/4") == pytest.approx(2.5)
    assert ev("7%3") == pytest.approx(1.0)
    assert ev("-7%3") == pytest.approx(-1.0)  # Java remainder keeps sign
    assert ev("0x10") == pytest.approx(16.0)
    assert ev("010") == pytest.approx(8.0)  # octal
    assert ev("1.5e2") == pytest.approx(150.0)
    assert ev(".5") == pytest.approx(0.5)


def test_unary_and_precedence():
    assert ev("-2*3") == pytest.approx(-6.0)
    assert ev("2+-3") == pytest.approx(-1.0)
    assert ev("!0") == 1.0 and ev("!3") == 0.0
    assert ev("~5") == pytest.approx(-6.0)
    assert ev("1+2==3") == 1.0  # + binds tighter than ==


def test_comparison_boolean_ternary():
    assert ev("3<4") == 1.0 and ev("4<=4") == 1.0 and ev("5>6") == 0.0
    assert ev("1&&2") == 1.0 and ev("1&&0") == 0.0
    assert ev("0||0") == 0.0 and ev("0||7") == 1.0
    assert ev("1 ? 10 : 20") == 10.0
    assert ev("0 ? 10 : 20") == 20.0
    # nested / right-assoc
    assert ev("0 ? 1 : 0 ? 2 : 3") == 3.0


def test_bitwise_long_semantics():
    assert ev("6&3") == 2.0 and ev("6|3") == 7.0 and ev("6^3") == 5.0
    assert ev("1<<4") == 16.0
    assert ev("-8>>1") == -4.0
    assert ev("-1>>>60") == 15.0  # unsigned shift
    # (long) cast truncates toward zero
    assert ev("5.9&7") == 5.0
    assert ev("-5.9&-1") == -5.0


def test_functions():
    assert ev("sqrt(16)") == 4.0
    assert ev("min(3, max(1, 2))") == 2.0
    assert ev("pow(2, 10)") == 1024.0
    assert ev("ln(exp(1))") == pytest.approx(1.0)
    assert ev("log10(1000)") == pytest.approx(3.0)
    assert ev("logn(2, 8)") == pytest.approx(3.0)
    assert ev("abs(0-5)") == 5.0
    assert ev("atan2(1, 1)") == pytest.approx(np.pi / 4)
    # haversin: same point = 0; ~111km per degree of latitude
    assert ev("haversin(0,0,0,0)") == pytest.approx(0.0)
    assert ev("haversin(0,0,1,0)") == pytest.approx(111.2, abs=0.5)


def test_variables_vectorized():
    e = compile_expression("0.3*ln(popularity+1) + 0.7*_score")
    assert set(e.variables) == {"popularity", "_score"}
    pop = np.array([0.0, 9.0, 99.0])
    sc = np.array([1.0, 2.0, 3.0])
    out = e.evaluate({"popularity": pop, "_score": sc})
    np.testing.assert_allclose(out, 0.3 * np.log(pop + 1) + 0.7 * sc)


def test_score_fn_adapter():
    fn = compile_expression("_score * 2 + boost").as_score_fn()
    out = fn(np.array([1.0, 2.0]), {"boost": np.array([10.0, 20.0])})
    np.testing.assert_allclose(out, [12.0, 24.0])


def test_errors():
    with pytest.raises(ExpressionError):
        compile_expression("1 +")
    with pytest.raises(ExpressionError):
        compile_expression("nosuchfn(1)")
    with pytest.raises(ExpressionError):
        compile_expression("min(1)")  # arity
    with pytest.raises(ExpressionError):
        compile_expression("1 @ 2")
    with pytest.raises(ExpressionError):
        compile_expression("(1+2")
    with pytest.raises(ExpressionError):
        compile_expression("a b")  # trailing input
    e = compile_expression("x + y")
    with pytest.raises(ExpressionError):
        e.evaluate({"x": 1.0})  # unbound y


def test_function_score_query_end_to_end(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.index_pipeline import build_index_by_file
    from lucene_ray.query import FunctionScoreQuery, TermQuery
    from lucene_ray.searcher import IndexSearcher

    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["alpha beta", "alpha alpha beta", "beta only here"],
        "pop": [100, 1, 50],
    }), src)
    idx = str(tmp_path / "idx")
    build_index_by_file(src, idx, key_col="doc_id", text_col="text",
                        docvalue_cols=("pop",))
    s = IndexSearcher(idx)
    expr = compile_expression("_score + 100*pop")
    td = s.search(FunctionScoreQuery(TermQuery("alpha"), expr.as_score_fn()), k=3)
    keys = [sd.doc_key for sd in td.score_docs]
    assert keys == [0, 1]  # pop dominates: doc0 (pop=100) over doc1 (pop=1)
