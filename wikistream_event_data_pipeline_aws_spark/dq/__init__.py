"""Data-quality engine (SURVEY §2.11, Q1-Q16).

Native PySpark re-implementation of the reference's PyDeequ-backed
check suite (/root/reference ``spark/jobs/dq/dq_checks.py``,
``dq_utils.py``): declarative check specs compiled into ONE aggregation
pass per table (the reference recomputes each metric with its own job —
``dq_checks.py:302-371``; compiling to a single ``agg()`` preserves the
semantics at a fraction of the scans, which matters at 100 TB).
"""

from .checks import (
    Completeness,
    Containment,
    CrossRowCheck,
    DQCheckResult,
    DQGateResult,
    DQSuite,
    RangeCheck,
    Recompute,
    Uniqueness,
)
from .profiler import ColumnProfile, profile_columns

__all__ = [
    "Completeness",
    "Containment",
    "CrossRowCheck",
    "DQCheckResult",
    "DQGateResult",
    "DQSuite",
    "RangeCheck",
    "Recompute",
    "Uniqueness",
    "ColumnProfile",
    "profile_columns",
]
