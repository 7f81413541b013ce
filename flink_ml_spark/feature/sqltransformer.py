"""SQLTransformer — run a SQL statement over the input as ``__THIS__``.

Reference: feature/sqltransformer/SQLTransformer.java:70-110.  The
reference routes through Flink SQL and needs a changelog-collapse fallback
for retracting results; Spark batch semantics make that moot (SURVEY §2.2).
Dialect is Spark SQL (documented difference, SURVEY §7 watch list).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

from ..api import Transformer
from ..param import StringParam


class SQLTransformer(Transformer):
    statement = StringParam("statement", "SQL statement with __THIS__ placeholder.", None)

    def _transform(self, df: DataFrame) -> DataFrame:
        view = f"sql_transformer_{uuid.uuid4().hex}"
        df.createOrReplaceTempView(view)
        stmt = self.get_("statement").replace("__THIS__", view)
        return df.sparkSession.sql(stmt)
