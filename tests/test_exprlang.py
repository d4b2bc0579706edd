"""Converter transform-expression DSL: parser, compiler, vectorized
evaluation, user-function escape hatch (reference TransformerParser +
ScriptingFunctionFactory surface)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from geomesa_ray.functions.exprlang import (
    ExprParseError,
    compile_expr,
    derive_columns,
    parse_expr,
    register_expr_function,
)


@pytest.fixture()
def batch():
    return pa.table(
        {
            "name": pa.array(["Alice", "  Bob ", "carol"]),
            "n": pa.array([1, 2, 3], pa.int64()),
            "city": pa.array(["NYC", "SF", "LA"]),
        }
    )


def test_parse_shapes():
    assert parse_expr("$name") == ("ref", "name")
    assert parse_expr("$1") == ("ref", "1")
    assert parse_expr("'a\\'b'") == ("lit", "a'b")
    assert parse_expr("42") == ("lit", 42)
    assert parse_expr("-1.5") == ("lit", -1.5)
    assert parse_expr("true") == ("lit", True)
    assert parse_expr("null") == ("lit", None)
    assert parse_expr("concat($a, '-', $b)") == (
        "call", "concat", [("ref", "a"), ("lit", "-"), ("ref", "b")]
    )
    # nesting
    ast = parse_expr("lowercase(trim(substr($name, 0, 3)))")
    assert ast[0] == "call" and ast[1] == "lowercase"


def test_parse_errors():
    with pytest.raises(ExprParseError, match="trailing"):
        parse_expr("$a $b")
    with pytest.raises(ExprParseError, match="expected '\\('"):
        parse_expr("lowercase")
    with pytest.raises(ExprParseError, match="',' or '\\)'"):
        parse_expr("concat($a $b)")
    with pytest.raises(ExprParseError, match="unknown function"):
        compile_expr("nosuchfn($a)")
    with pytest.raises(ExprParseError, match="cannot tokenize"):
        parse_expr("concat($a, @b)")


def test_eval_matches_direct_kernels(batch):
    assert compile_expr("lowercase($name)")(batch).to_pylist() == [
        "alice", "  bob ", "carol"
    ]
    assert compile_expr("length(trim($name))")(batch).to_pylist() == [5, 3, 5]
    got = compile_expr("concat(uppercase($city), '-', $name)")(batch)
    assert got.to_pylist() == ["NYC-Alice", "SF-  Bob ", "LA-carol"]
    # positional refs are 1-based column indexes
    assert compile_expr("uppercase($1)")(batch).to_pylist() == [
        "ALICE", "  BOB ", "CAROL"
    ]
    # arithmetic with literal broadcast
    assert compile_expr("add(multiply($n, 10), 5)")(batch).to_pylist() == [
        15, 25, 35
    ]


def test_bad_refs(batch):
    with pytest.raises(ExprParseError, match="unknown field"):
        compile_expr("lowercase($nope)")(batch)
    with pytest.raises(ExprParseError, match="out of range"):
        compile_expr("lowercase($9)")(batch)


def test_user_function_escape_hatch(batch):
    @register_expr_function("shout")
    def shout(col):
        return pc.binary_join_element_wise(pc.utf8_upper(col), "!", "")

    assert compile_expr("shout($city)")(batch).to_pylist() == [
        "NYC!", "SF!", "LA!"
    ]

    # user registration shadows a builtin
    @register_expr_function("length")
    def neg_length(col):
        return pc.multiply(pc.utf8_length(col), -1)

    try:
        assert compile_expr("length($city)")(batch).to_pylist() == [-3, -2, -2]
    finally:
        from geomesa_ray.functions import exprlang

        exprlang._USER.pop("length")
        exprlang._USER.pop("shout")


def test_derive_columns_dataset(ray_session, batch):
    import ray.data

    ds = ray.data.from_arrow(batch).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=2
    )
    out = derive_columns(
        ds, {"tag": "lowercase(concat($city, '-', $name))", "ln": "length($name)"}
    ).to_pandas().sort_values("n")
    assert list(out["tag"]) == ["nyc-alice", "sf-  bob ", "la-carol"]
    assert list(out["ln"]) == [5, 6, 5]
    # overwrite an existing column in place
    out2 = derive_columns(ds, {"city": "lowercase($city)"}).to_pandas()
    assert sorted(out2["city"]) == ["la", "nyc", "sf"]


def test_hex_cell_function():
    import numpy as np
    import pyarrow as pa

    from geomesa_ray.curves.hexgrid import hex_encode
    from geomesa_ray.functions.exprlang import compile_expr

    t = pa.table({"lon": pa.array([2.35, -73.98]),
                  "lat": pa.array([48.85, 40.75])})
    out = compile_expr("hexCell($lon, $lat, 7)")(t)
    exp = hex_encode(np.array([2.35, -73.98]), np.array([48.85, 40.75]), 7)
    assert out.to_pylist() == exp.tolist()


def test_cast_and_geometry_functions():
    import pyarrow as pa

    from geomesa_ray.functions.exprlang import compile_expr
    from geomesa_ray.geometry.wkb import from_wkb

    t = pa.table({"v": ["12", "x", "7"], "lon": [1.0, 2.0, 3.0],
                  "lat": [4.0, 5.0, 6.0],
                  "w": ["POINT (1 2)", "garbage", None]})
    assert compile_expr("toInt($v)")(t).to_pylist() == [12, None, 7]
    assert compile_expr("toInt($v, 0)")(t).to_pylist() == [12, 0, 7]
    assert compile_expr("toLong($v)")(t).type == pa.int64()
    assert compile_expr("toDouble($v)")(t).to_pylist() == [12.0, None, 7.0]
    tb = pa.table({"b": ["true", "NO", "1"]})
    assert compile_expr("toBoolean($b)")(tb).to_pylist() == [True, False, True]
    assert compile_expr("toString($lon)")(t).to_pylist() == ["1", "2", "3"]
    pts = compile_expr("point($lon, $lat)")(t)
    assert from_wkb(pts[1].as_py()).x == 2.0
    g = compile_expr("geomFromWKT($w)")(t)
    assert from_wkb(g[0].as_py()).x == 1.0
    assert g[1].as_py() is None and g[2].as_py() is None


def test_cast_exactness_and_point_nulls():
    """Review findings: large-int exactness with bad rows present,
    out-of-range → default/null (never wrap), point() null contract,
    literal-first point broadcast."""
    import pyarrow as pa

    from geomesa_ray.functions.convert import (point_geom, to_float, to_int,
                                               to_long)
    from geomesa_ray.functions.exprlang import compile_expr
    from geomesa_ray.geometry.wkb import from_wkb

    big = "9223372036854775807"
    got = to_long(pa.array([big, "x"])).to_pylist()
    assert got == [9223372036854775807, None]
    assert to_int(pa.array(["3000000000"])).to_pylist() == [None]
    assert to_int(pa.array(["3000000000"]), -1).to_pylist() == [-1]
    assert to_int(pa.array([3.7])).to_pylist() == [3]  # Number.intValue
    assert to_float(pa.array(["1e39", "x"])).to_pylist()[1] is None
    # point(): null/NaN coordinate → null geometry, not NaN WKB
    pts = point_geom(pa.array([1.0, None]), pa.array([2.0, 3.0]))
    assert from_wkb(pts[0].as_py()).x == 1.0 and pts[1].as_py() is None
    # literal-first broadcast
    t = pa.table({"lat": [4.0, 5.0]})
    arr = compile_expr("point(2.0, $lat)")(t)
    assert from_wkb(arr[1].as_py()).y == 5.0


def test_cast_nonfinite_and_null_consistency():
    """Advisor findings r4: NaN/Inf must honor the unparseable→default
    contract (int(nan) raises), and null handling must be identical on the
    fast-cast and fallback paths (block-content-independent)."""
    import math

    import pyarrow as pa

    from geomesa_ray.functions.convert import to_float, to_int

    # non-finite floats route to default/null, never crash the task
    assert to_int(pa.array([1.5, float("nan")]), 0).to_pylist() == [1, 0]
    assert to_int(pa.array([float("inf"), float("-inf")]), -1).to_pylist() == [-1, -1]
    assert to_int(pa.array([float("nan")])).to_pylist() == [None]
    # null semantics are batch-content-INdependent: the same null row gets
    # the default whether the block hit the fast cast or the fallback
    assert to_int(pa.array(["1", None]), 7).to_pylist() == [1, 7]
    assert to_int(pa.array(["x", None]), 7).to_pylist() == [7, 7]
    assert to_int(pa.array(["1", None])).to_pylist() == [1, None]
    assert to_int(pa.array(["x", None])).to_pylist() == [None, None]
    assert to_float(pa.array(["1.5", None]), 2.0).to_pylist() == [1.5, 2.0]
    got = to_float(pa.array(["z", None]), 2.0).to_pylist()
    assert got[0] == 2.0 and got[1] == 2.0 and all(math.isfinite(v) for v in got)


def test_derive_constant_on_empty_block(ray_session):
    """A constant expression must carry its inferred Arrow type onto 0-row
    blocks (filters legitimately emit them); a null-typed empty column
    breaks union/write schema checks (advisor finding r4)."""
    import pyarrow as pa
    import ray

    from geomesa_ray.functions.exprlang import derive_columns

    full = pa.table({"a": pa.array([1, 2], pa.int64())})
    empty = full.slice(0, 0)
    ds = ray.data.from_arrow([empty, full])
    out = derive_columns(ds, {"c": "42", "s": "'x'"})
    schemas = {
        str(b.schema)
        for b in out.iter_batches(batch_format="pyarrow", batch_size=None)
    }
    assert len(schemas) == 1  # empty and non-empty blocks agree
    tbl = out.to_pandas()
    assert tbl["c"].tolist() == [42, 42]
    assert tbl["s"].tolist() == ["x", "x"]


def test_cql_escape_hatch():
    """cql('<ecql>') inside a transform expression — the CqlFunctionFactory
    analog (geomesa-convert CqlFunctionFactory.scala:29-66): the predicate
    compiles on the driver (loud parse errors) and evaluates per batch under
    the same Kleene three-valued semantics as the query-layer filters."""
    import pyarrow as pa
    import pytest

    from geomesa_ray.functions.exprlang import ExprParseError, compile_expr

    batch = pa.table({
        "type": ["click", "view", "click", None],
        "value": [150, 50, 90, 200],
    })
    fn = compile_expr(r"cql('type = \'click\' AND value >= 100')")
    assert fn(batch).to_pylist() == [True, False, False, False]
    # Kleene NOT: the null-typed row passes on value alone
    fn2 = compile_expr(r"cql('NOT (value <= 100)')")
    assert fn2(batch).to_pylist() == [True, False, False, True]
    # composes with DSL builtins
    fn3 = compile_expr(r"intToBoolean(toInt(cql('value > 100')))")
    assert fn3(batch).to_pylist() == [True, False, False, True]
    with pytest.raises(ExprParseError):
        compile_expr("cql($type)")  # must be a literal string
    with pytest.raises(ValueError):
        compile_expr("cql('value ><')")  # bad ECQL fails at compile time
