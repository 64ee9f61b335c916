"""SQL function surface: ``register_sql_functions(spark)``."""

from .sql_functions import register_sql_functions  # noqa: F401
