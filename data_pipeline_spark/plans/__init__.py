"""Search-DSL compiler (SURVEY §2.10 Q1-Q9): parse the LUX-style string
query language and plan it as DataFrame operations over the
entities/edges relational model.
"""

from .parser import parse  # noqa: F401
from .planner import SearchPlanner  # noqa: F401
