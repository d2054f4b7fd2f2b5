"""Declared query registry — every entry here is an operator claim.

Each query has (a) a Spark DataFrame implementation and (b) an equivalent
ANSI-SQL oracle string for DuckDB. The driver hash-compares the two at
sf0.01; `tests/test_oracle.py` runs the same comparison locally.
"""

from .registry import QUERIES, Query, query  # noqa: F401

# Importing the modules populates the registry.
from . import relational  # noqa: F401, E402
from . import relational2  # noqa: F401, E402
from . import relational3  # noqa: F401, E402
from . import text  # noqa: F401, E402
from . import text2  # noqa: F401, E402
from . import vector  # noqa: F401, E402
from . import cdc  # noqa: F401, E402
from . import dedup  # noqa: F401, E402
from . import graph  # noqa: F401, E402
from . import dsl  # noqa: F401, E402
from . import reconcile_gate  # noqa: F401, E402
from . import enrich_gate  # noqa: F401, E402
