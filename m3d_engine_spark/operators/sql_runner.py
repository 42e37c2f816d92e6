"""Ordered SQL statement runner.

Reference parity: algo/SQLRunner.scala:8-19 — execute N numbered SQL
statements from the params file in order. The one place arbitrary SQL
enters the engine; each statement gets the full Catalyst lifecycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from m3d_engine_spark.operators.base import Algorithm, register


@register("SQLRunner")
class SQLRunner(Algorithm):
    """Config: {"steps": N, "0": "sql...", "1": "sql...", ...} (the
    reference's numbered-key format) or {"statements": [...]}."""

    def statements(self) -> list[str]:
        if self.params.has("statements"):
            return [str(s) for s in self.params.get_list("statements")]
        # The reference params files hold steps as a quoted string
        # ("steps": "5") and convert with .toString.toInt
        # (SQLRunner.scala:12-14) — accept both forms.
        steps = self.params.get_optional("steps")
        if steps is None:
            from m3d_engine_spark.config import ConfigError

            raise ConfigError(
                "SQLRunner needs either 'statements' (list) or 'steps' "
                "(count) plus numbered statement keys"
            )
        n = int(steps)
        return [self.params.get_string(str(i)) for i in range(n)]

    def read(self) -> list[DataFrame]:
        return []

    def transform(self, dfs: list[DataFrame]) -> list[DataFrame]:
        return [self.spark.sql(stmt) for stmt in self.statements()]

    def write(self, dfs: list[DataFrame]) -> None:
        for df in dfs:
            df.show(1000)  # SQLRunner.scala:17
