"""raycrawl — a Ray-Data-native URL-frontier + fetch-and-extract engine.

Brand-new implementation with the query/data-processing capabilities of the
celitedev/node-crawler reference (see SURVEY.md; the reference checkout is
empty, so semantics are pinned by raycrawl.core + the raycrawl.pyref oracle).
"""

from raycrawl import _rayfix
from raycrawl.core import CrawlConfig  # noqa: F401

# Ray 2.49 hash-shuffle schema-broadcast race workaround (see _rayfix):
# must be active in any process that builds Dataset.join/groupby pipelines
# whose inputs can contain 0-row blocks, i.e. every entry point — the
# driver contract imports this package, so applying at import time covers
# the grading driver, bench.py, the CLI mains and the test session alike.
_rayfix.apply()

__version__ = "0.1.0"
