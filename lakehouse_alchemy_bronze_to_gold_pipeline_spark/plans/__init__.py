"""Physical-plan inspection and linting (the ``plans`` surface).

``tests/test_plans.py`` pins specific queries; this package is the
ENGINE-side API those gates build on, usable by operators and by
users before launching a large job: structured facts about a
DataFrame's physical plan (``report``) and an anti-pattern linter
(``lint``) that flags the shapes that melt at 100 TB — cartesian
products, unpartitioned windows, scans without column pruning,
shuffle counts.
"""

from .inspect import (
    formatted,
    lint,
    lint_plan,
    ops,
    report,
    shuffles,
    unpartitioned_windows,
)

__all__ = [
    "formatted",
    "ops",
    "shuffles",
    "unpartitioned_windows",
    "report",
    "lint",
    "lint_plan",
]
