"""Data types for feathub_spark.

Re-expresses the reference type system (see
/root/reference/python/feathub/common/types.py:29-206) on top of Spark SQL
types: primitive scalars, 1-D homogeneous vectors, and maps.  The Spark
mapping follows the table the reference itself uses for its Spark processor
(/root/reference/python/feathub/processors/spark/spark_types_utils.py:30-120).
"""

from __future__ import annotations

from enum import Enum
from typing import Any, Dict

from pyspark.sql import types as T

from feathub_spark.common.exceptions import TypeError_


class BasicDType(Enum):
    UNKNOWN = "unknown"
    BYTES = "bytes"
    STRING = "string"
    INT32 = "int32"
    INT64 = "int64"
    FLOAT32 = "float32"
    FLOAT64 = "float64"
    BOOL = "bool"
    TIMESTAMP = "timestamp"


class DType:
    """Base of the engine's type lattice."""

    def to_json(self) -> Dict[str, Any]:
        raise NotImplementedError

    def __eq__(self, other: object) -> bool:
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self) -> int:
        return hash(repr(self))

    def __repr__(self) -> str:
        raise NotImplementedError


class PrimitiveType(DType):
    def __init__(self, basic_dtype: BasicDType) -> None:
        self.basic_dtype = basic_dtype

    def to_json(self) -> Dict[str, Any]:
        return {"type": "primitive", "dtype": self.basic_dtype.value}

    def __repr__(self) -> str:
        return self.basic_dtype.name.capitalize()


class VectorType(DType):
    """1-D homogeneous array (reference types.py:78-89)."""

    def __init__(self, dtype: DType) -> None:
        if isinstance(dtype, VectorType):
            raise TypeError_("Nested vector types are not supported.")
        self.dtype = dtype

    def to_json(self) -> Dict[str, Any]:
        return {"type": "vector", "dtype": self.dtype.to_json()}

    def __repr__(self) -> str:
        return f"Vector({self.dtype!r})"


class MapType(DType):
    def __init__(self, key_dtype: DType, value_dtype: DType) -> None:
        self.key_dtype = key_dtype
        self.value_dtype = value_dtype

    def to_json(self) -> Dict[str, Any]:
        return {
            "type": "map",
            "key_dtype": self.key_dtype.to_json(),
            "value_dtype": self.value_dtype.to_json(),
        }

    def __repr__(self) -> str:
        return f"Map({self.key_dtype!r}, {self.value_dtype!r})"


# Singletons (reference types.py:159-167)
Unknown = PrimitiveType(BasicDType.UNKNOWN)
Bytes = PrimitiveType(BasicDType.BYTES)
String = PrimitiveType(BasicDType.STRING)
Bool = PrimitiveType(BasicDType.BOOL)
Int32 = PrimitiveType(BasicDType.INT32)
Int64 = PrimitiveType(BasicDType.INT64)
Float32 = PrimitiveType(BasicDType.FLOAT32)
Float64 = PrimitiveType(BasicDType.FLOAT64)
Timestamp = PrimitiveType(BasicDType.TIMESTAMP)

Int32Vector = VectorType(Int32)
Int64Vector = VectorType(Int64)
Float32Vector = VectorType(Float32)
Float64Vector = VectorType(Float64)
StringVector = VectorType(String)

# SQL-ish type names usable in CAST(x AS <name>) (reference types.py:169-178).
_NAME_TO_DTYPE: Dict[str, DType] = {
    "BYTES": Bytes,
    "STRING": String,
    "INTEGER": Int32,
    "INT": Int32,
    "BIGINT": Int64,
    "FLOAT": Float32,
    "DOUBLE": Float64,
    "BOOLEAN": Bool,
    "TIMESTAMP": Timestamp,
}


def dtype_from_name(name: str) -> DType:
    try:
        return _NAME_TO_DTYPE[name.upper()]
    except KeyError:
        raise TypeError_(f"Unknown CAST target type: {name}")


_SPARK_BY_BASIC: Dict[BasicDType, T.DataType] = {
    BasicDType.BYTES: T.BinaryType(),
    BasicDType.STRING: T.StringType(),
    BasicDType.BOOL: T.BooleanType(),
    BasicDType.INT32: T.IntegerType(),
    BasicDType.INT64: T.LongType(),
    BasicDType.FLOAT32: T.FloatType(),
    BasicDType.FLOAT64: T.DoubleType(),
    BasicDType.TIMESTAMP: T.TimestampType(),
}


def to_spark_type(dtype: DType) -> T.DataType:
    if isinstance(dtype, PrimitiveType):
        try:
            return _SPARK_BY_BASIC[dtype.basic_dtype]
        except KeyError:
            raise TypeError_(f"No Spark type for {dtype!r}")
    if isinstance(dtype, VectorType):
        return T.ArrayType(to_spark_type(dtype.dtype))
    if isinstance(dtype, MapType):
        return T.MapType(to_spark_type(dtype.key_dtype), to_spark_type(dtype.value_dtype))
    raise TypeError_(f"No Spark type for {dtype!r}")


def from_spark_type(spark_type: T.DataType) -> DType:
    if isinstance(spark_type, T.BinaryType):
        return Bytes
    if isinstance(spark_type, T.StringType):
        return String
    if isinstance(spark_type, T.BooleanType):
        return Bool
    if isinstance(spark_type, (T.IntegerType, T.ShortType, T.ByteType)):
        return Int32
    if isinstance(spark_type, T.LongType):
        return Int64
    if isinstance(spark_type, T.FloatType):
        return Float32
    if isinstance(spark_type, (T.DoubleType,)):
        return Float64
    if isinstance(spark_type, (T.TimestampType, T.TimestampNTZType)):
        return Timestamp
    if isinstance(spark_type, T.DateType):
        return Timestamp
    if isinstance(spark_type, T.ArrayType):
        return VectorType(from_spark_type(spark_type.elementType))
    if isinstance(spark_type, T.MapType):
        return MapType(from_spark_type(spark_type.keyType), from_spark_type(spark_type.valueType))
    return Unknown


def to_spark_sql_type_name(dtype: DType) -> str:
    """Spark SQL DDL name, for use inside generated CAST(...) expressions."""
    return to_spark_type(dtype).simpleString()


def dtype_from_json(json_obj: Dict[str, Any]) -> DType:
    kind = json_obj["type"]
    if kind == "primitive":
        return PrimitiveType(BasicDType(json_obj["dtype"]))
    if kind == "vector":
        return VectorType(dtype_from_json(json_obj["dtype"]))
    if kind == "map":
        return MapType(
            dtype_from_json(json_obj["key_dtype"]),
            dtype_from_json(json_obj["value_dtype"]),
        )
    raise TypeError_(f"Unknown dtype json: {json_obj}")


# Numeric precision rank for mixed-type arithmetic (reference dsl/ast.py:33-46).
_NUMERIC_RANK = {Int32: 0, Int64: 1, Float32: 2, Float64: 3}


def is_numeric(dtype: DType) -> bool:
    return dtype in _NUMERIC_RANK


def common_numeric_type(left: DType, right: DType) -> DType:
    if not is_numeric(left) or not is_numeric(right):
        raise TypeError_(f"Cannot mix {left!r} and {right!r} in arithmetic expression.")
    return left if _NUMERIC_RANK[left] >= _NUMERIC_RANK[right] else right
