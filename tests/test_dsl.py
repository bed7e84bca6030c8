from feathub_spark.common import types as t
from feathub_spark.common.time_utils import to_java_date_format
from feathub_spark.dsl.parser import derive_dtype, parse_expr, to_spark_sql

SCHEMA = {
    "cost": t.Int64,
    "distance": t.Int64,
    "name": t.String,
    "ratio": t.Float32,
    "m": t.MapType(t.String, t.Int64),
    "v": t.VectorType(t.Int64),
}


def test_arithmetic_precedence():
    assert to_spark_sql("cost + distance * 2") == "`cost` + `distance` * 2"
    assert to_spark_sql("(cost + distance) * 2") == "(`cost` + `distance`) * 2"


def test_type_derivation():
    assert derive_dtype("cost + distance", SCHEMA) == t.Int64
    assert derive_dtype("cost + ratio", SCHEMA) == t.Float32
    assert derive_dtype("cost / 2.0", SCHEMA) == t.Float64
    assert derive_dtype("cost > distance", SCHEMA) == t.Bool
    assert derive_dtype("name IS NOT NULL", SCHEMA) == t.Bool
    assert derive_dtype("CAST(cost AS STRING)", SCHEMA) == t.String
    assert derive_dtype("TRY_CAST(name AS DOUBLE)", SCHEMA) == t.Float64
    assert derive_dtype("m['a']", SCHEMA) == t.Int64
    assert derive_dtype("SIZE(v)", SCHEMA) == t.Int32
    assert derive_dtype("MAP('a', 1, 'b', 2)", SCHEMA) == t.MapType(t.String, t.Int64)
    assert derive_dtype("ARRAY(1.0, 2.0)", SCHEMA) == t.VectorType(t.Float64)
    assert (
        derive_dtype("CASE WHEN cost > 1 THEN ratio ELSE 0 END", SCHEMA) == t.Float32
    )


def test_case_lowering():
    sql = to_spark_sql("CASE WHEN cost > 100 THEN 'high' ELSE 'low' END")
    assert sql == "CASE WHEN `cost` > 100 THEN 'high' ELSE 'low' END"


def test_string_escape():
    assert to_spark_sql("'it''s'") == r"'it\'s'"


def test_backtick_identifier():
    assert to_spark_sql("`select` + 1") == "`select` + 1"


def test_unix_timestamp_lowering():
    sql = to_spark_sql("UNIX_TIMESTAMP(ts, '%Y-%m-%d %H:%M:%S')")
    assert sql == "TO_UNIX_TIMESTAMP(`ts`, 'yyyy-MM-dd HH:mm:ss')"


def test_comparison_ops():
    assert to_spark_sql("a <> b") == "`a` <> `b`"
    assert to_spark_sql("a != b") == "`a` <> `b`"


def test_java_date_format():
    assert to_java_date_format("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"
    assert to_java_date_format("%Y-%m-%dT%H:%M:%S") == "yyyy-MM-dd'T'HH:mm:ss"
    assert to_java_date_format("%Y-%m-%d,%H:%M:%S") == "yyyy-MM-dd,HH:mm:ss"
    # %f = 1-6 fraction digits on parse, 6 on format (Python %f prints 6)
    assert to_java_date_format("%Y-%m-%d %H:%M:%S.%f") == "yyyy-MM-dd HH:mm:ss.SSSSSS"


def test_is_null_precedence():
    ast = parse_expr("a + 1 IS NOT NULL AND b IS NULL")
    assert ast.to_spark_sql() == "`a` + 1 IS NOT NULL AND `b` IS NULL"


def test_variables_collection():
    assert parse_expr("a + b * SIZE(c) - 1").variables() == {"a", "b", "c"}
