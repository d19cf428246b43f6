"""Schema-validated DataFrame wrapper — the engine's one data abstraction.

Re-expresses the reference's ``Dataset`` idea (reference:
src/gentropy/dataset/dataset.py:28-76 construction-time validation;
src/gentropy/common/schemas.py:57-212 recursive comparison) with a
single recursive validator over Spark's own type tree. Validation is
analysis-time only (inspects ``df.schema``, never triggers a job).

Closed-world semantics, identical to the reference:
- unexpected (extra) columns are errors,
- missing mandatory (nullable=False) columns are errors,
- duplicated column names are errors,
- type mismatches are errors, recursively through struct/array/map,
Observed-nullable feeding an expected-mandatory field is permitted
(mandatory means "must be present", matching the reference where
``createDataFrame`` results are always nullable).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType
from pyspark.sql.window import Window

from genetics_spark_coloc_spark.core.schema_registry import get_schema

if TYPE_CHECKING:
    from collections.abc import Iterable
    from pyspark.sql import SparkSession


class SchemaValidationError(ValueError):
    """Observed DataFrame schema deviates from the declared schema."""

    def __init__(self, message: str, errors: list[str]):
        self.errors = errors
        super().__init__(f"{message}\n" + "\n".join(f"  - {e}" for e in errors))


def _compare_types(path: str, observed: DataType, expected: DataType, errors: list[str]) -> None:
    if isinstance(expected, StructType) and isinstance(observed, StructType):
        _compare_structs(path, observed, expected, errors)
    elif isinstance(expected, ArrayType) and isinstance(observed, ArrayType):
        _compare_types(path + "[]", observed.elementType, expected.elementType, errors)
    elif isinstance(expected, MapType) and isinstance(observed, MapType):
        _compare_types(path + "<key>", observed.keyType, expected.keyType, errors)
        _compare_types(path + "<value>", observed.valueType, expected.valueType, errors)
    elif observed != expected:
        errors.append(
            f"{path}: type mismatch (observed {observed.simpleString()}, "
            f"expected {expected.simpleString()})"
        )


def _compare_structs(path: str, observed: StructType, expected: StructType, errors: list[str]) -> None:
    prefix = f"{path}." if path else ""
    observed_names = [f.name for f in observed.fields]
    dupes = {n for n in observed_names if observed_names.count(n) > 1}
    if dupes:
        errors.append(f"{prefix}*: duplicated columns {sorted(dupes)}")
    expected_by_name = {f.name: f for f in expected.fields}
    unexpected = [n for n in observed_names if n not in expected_by_name]
    if unexpected:
        errors.append(f"{prefix}*: unexpected columns {unexpected}")
    observed_by_name = {f.name: f for f in observed.fields}
    for exp in expected.fields:
        obs = observed_by_name.get(exp.name)
        if obs is None:
            if not exp.nullable:
                errors.append(f"{prefix}{exp.name}: missing mandatory column")
            continue
        _compare_types(f"{prefix}{exp.name}", obs.dataType, exp.dataType, errors)


def validate_schema(observed: StructType, expected: StructType) -> None:
    """Raise SchemaValidationError when observed deviates from expected."""
    errors: list[str] = []
    _compare_structs("", observed, expected, errors)
    if errors:
        raise SchemaValidationError("schema validation failed", errors)


@dataclass
class Dataset:
    """A DataFrame plus the name of its registered schema.

    Subclass-free by design: the reference's per-entity subclasses
    exist to host methods; here the operators live in
    ``operators/`` as DataFrame->DataFrame functions, so one generic
    wrapper suffices and any entity is ``Dataset(df, "study_locus")``.
    """

    _df: DataFrame
    schema_name: str

    def __post_init__(self) -> None:
        validate_schema(self._df.schema, self.schema())

    @property
    def df(self) -> DataFrame:
        return self._df

    @df.setter
    def df(self, new_df: DataFrame) -> None:
        validate_schema(new_df.schema, self.schema())
        self._df = new_df

    def schema(self) -> StructType:
        return get_schema(self.schema_name)

    # -- constructors -------------------------------------------------
    @classmethod
    def from_parquet(
        cls, spark: SparkSession, path: str | list[str], schema_name: str
    ) -> Dataset:
        """Schema-enforced parquet scan (reference: dataset.py:144-172).

        Passing the expected schema to the reader prunes the scan to
        the declared columns (ReadSchema) instead of reading then
        validating — the at-scale difference.
        """
        expected = get_schema(schema_name)
        df = spark.read.schema(expected).parquet(
            *(path if isinstance(path, list) else [path])
        )
        if df.isEmpty():
            raise ValueError(f"Parquet data is empty at {path}")
        return cls(df, schema_name)

    # -- generic helpers (reference: dataset/dataset.py) --------------
    def filter(self, condition: Column) -> Dataset:
        return Dataset(self._df.filter(condition), self.schema_name)

    def persist(self) -> Dataset:
        self._df = self._df.persist()
        return self

    def unpersist(self) -> Dataset:
        self._df = self._df.unpersist()
        return self

    def coalesce(self, n: int) -> Dataset:
        return Dataset(self._df.coalesce(n), self.schema_name)

    def repartition(self, *cols: str) -> Dataset:
        return Dataset(self._df.repartition(*cols), self.schema_name)

    def valid_rows(self, invalid_flags: list[str], invalid: bool = False) -> Dataset:
        """Keep rows whose QC array avoids (or hits) the given flags
        (reference: dataset.py:204-250)."""
        overlap = F.arrays_overlap(
            F.coalesce(F.col("qualityControls"), F.array().cast("array<string>")),
            F.array(*[F.lit(x) for x in invalid_flags]),
        )
        return self.filter(overlap if invalid else ~overlap)

    def drop_infinity_values(self, *cols: str) -> Dataset:
        """Drop rows with ±Inf in any given double column
        (reference: dataset.py:252-273)."""
        inf = [float("inf"), float("-inf")]
        cond = None
        for c in cols:
            test = F.col(c).isin(inf)
            cond = test if cond is None else (cond | test)
        return self if cond is None else self.filter(~F.coalesce(cond, F.lit(False)))

    def flag_duplicates(self, *key_cols: str, flag_col: str = "isDuplicate") -> Dataset:
        """Mark all-but-first duplicate per key, DETERMINISTICALLY.

        The reference orders by ``rand()`` (dataset.py:343-357), which
        is irreproducible; here the survivor is the smallest tuple of
        the remaining columns, so reruns and the oracle agree.
        """
        other = [c for c in self._df.columns if c not in key_cols]
        w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc_nulls_last() for c in other])
        return Dataset(
            self._df.withColumn(flag_col, F.row_number().over(w) > 1), self.schema_name
        )


def generate_identifier(cols: Iterable[str]) -> Column:
    """Deterministic md5 id over null-safe concatenated key columns
    (reference: dataset.py:359-375)."""
    safe = [F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in cols]
    return F.md5(F.concat_ws("|", *safe))
