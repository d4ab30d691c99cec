from .engine import SearchEngine  # noqa: F401
from .parser import parse_query  # noqa: F401
