"""raycrawl — a Ray-Data-native URL-frontier + fetch-and-extract engine.

Brand-new implementation with the query/data-processing capabilities of the
celitedev/node-crawler reference (see SURVEY.md; the reference checkout is
empty, so semantics are pinned by raycrawl.core + the raycrawl.pyref oracle).
"""

from raycrawl.core import CrawlConfig  # noqa: F401

__version__ = "0.1.0"
