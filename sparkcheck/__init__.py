"""sparkcheck — a PySpark-native schema + constraint validation engine.

Re-expresses the declarative rule model of muniter/model-validator-ts
(/root/reference, MIT) — typed field validators, cross-field dependency rules,
conditional business-rule chains — as a compiled DAG of Spark SQL predicates
and vectorized pandas/Arrow UDFs evaluated in a single partition-parallel pass
over Parquet/Iceberg tables. Built from scratch on the public PySpark API;
see SURVEY.md for the semantic mapping.
"""

from .errors import ErrorBag
from .model import (ArrayAllRule, Check, ColumnStatsRule, CustomPandasRule,
                    DriftKLRule, EnrichRule, FieldConstraint, FieldRule,
                    InputSchema, ReferentialRule, RuleSpec, UniqueRule,
                    ValidatorBuilder, build_validator, invariant)
from .engine import RunCheck, ValidationResult, run_validation
from .session import get_spark

__all__ = [
    "ArrayAllRule", "Check", "ColumnStatsRule", "CustomPandasRule",
    "DriftKLRule", "EnrichRule", "ErrorBag", "FieldConstraint", "FieldRule",
    "InputSchema", "ReferentialRule", "RuleSpec", "RunCheck", "UniqueRule",
    "ValidationResult", "ValidatorBuilder", "build_validator", "get_spark",
    "invariant", "run_validation",
]

__version__ = "0.1.0"
