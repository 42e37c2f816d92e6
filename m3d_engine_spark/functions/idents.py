"""SQL identifier quoting for user-provided column names.

Several operators build expressions that only SQL strings can express
(``percentile`` with an array of fractions, higher-order ``aggregate``
folds) and interpolate a caller-supplied column name into them. An
unquoted name containing a space, hyphen, dot, or a reserved keyword
either fails to parse or — worse — silently parses as an expression
(``a-b`` becomes subtraction). Backtick-quoting with doubled inner
backticks is Spark's (and Hive's) escape rule, so quoting is always
safe and never changes the meaning of a well-formed name.
"""


def qident(name: str) -> str:
    """Backtick-quote ``name`` for safe interpolation into a Spark SQL
    expression string. Doubles embedded backticks per the SQL rule."""
    return "`" + name.replace("`", "``") + "`"
