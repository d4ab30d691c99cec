from .build import InvertedIndex, build_index  # noqa: F401
