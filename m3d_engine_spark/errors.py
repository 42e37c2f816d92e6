"""Spark error-condition extraction, version-compatible.

Spark 4 renamed ``getErrorClass`` to ``getCondition``; matching on the
condition string is the supported way to distinguish error cases
(PATH_NOT_FOUND vs UNABLE_TO_INFER_SCHEMA vs TABLE_OR_VIEW_NOT_FOUND).
One extraction helper so the compat dance is written once — the
streaming state reads and the catalog partition lister both key on it.
"""

from __future__ import annotations


def error_condition(e: BaseException) -> str:
    """The error condition/class name of a PySpark exception, or ''
    when the exception carries none (works on both the Spark 4
    ``getCondition`` and the legacy ``getErrorClass`` spellings)."""
    get = getattr(e, "getCondition", None) or getattr(
        e, "getErrorClass", None
    )
    return (get() if get is not None else None) or ""
