"""SQL function surface: ``register_sql_functions(spark)`` (engine
scalars), ``register_clickhouse_functions(spark)`` (dialect aliases),
``rewrite_clickhouse_sql(sql)`` (string-level dialect rewrite) and
``ch_sql(spark, sql)`` (the session-aware front door — adds WITH FILL,
ASOF JOIN, ANY JOIN)."""

from .chsql import ch_sql, rewrite_clickhouse_sql  # noqa: F401
from .clickhouse import register_clickhouse_functions  # noqa: F401
from .sql_functions import register_sql_functions  # noqa: F401
