"""Algorithm scaffold — the starting point for a new algorithm.

Reference parity: algo/templates/AlgorithmTemplate.scala +
config/templates/AlgorithmTemplateConfiguration.scala (including the
``today``/``yesterday``/literal date-rule parser, :88-97). Copy this
module, rename the class and CLI name, and fill in the three steps.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame

from m3d_engine_spark.operators.base import Algorithm, register


def resolve_date_rule(rule: str, today: _dt.date | None = None) -> str:
    """'today' / 'yesterday' / literal 'yyyy-MM-dd' → ISO date string
    (AlgorithmTemplateConfiguration.scala:88-97)."""
    base = today or _dt.date.today()
    if rule == "today":
        return base.isoformat()
    if rule == "yesterday":
        return (base - _dt.timedelta(days=1)).isoformat()
    _dt.date.fromisoformat(rule)  # validates
    return rule


@register("AlgorithmTemplate")
class AlgorithmTemplate(Algorithm):
    """Scaffold: wire read/transform/write for a new job. Mirrors the
    reference template, which throws until filled in
    (AlgorithmTemplate.scala:20-41)."""

    def read(self) -> list[DataFrame]:
        if self.params.has("source_location"):
            return [self.spark.read.parquet(self.params.get_string("source_location"))]
        raise NotImplementedError("AlgorithmTemplate: wire your read step")

    def transform(self, dfs: list[DataFrame]) -> list[DataFrame]:
        raise NotImplementedError("AlgorithmTemplate: wire your transform step")

    def write(self, dfs: list[DataFrame]) -> None:
        from m3d_engine_spark.sources.writers import write_output

        write_output(self.spark, dfs[0], self.params)
