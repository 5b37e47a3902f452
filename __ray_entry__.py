"""Driver contract (see SURVEY.md §2 for the operator inventory).

Ray is initialised by the driver before this module is imported; nothing
here (or in the ``engine`` package) calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# Driver-side insurance: make the engine package resolve even if this
# module is loaded by file path (importlib spec) without the repo root on
# sys.path. Note: Ray WORKER processes inherit their module search path
# from the raylet started at ray.init — they find `engine` when the
# driver ran from the repo root (the normal case) or with the repo on
# PYTHONPATH at init time.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry() -> Any:
    """Flagship: language-ID + quality-filter + scrub pipeline on the
    sf0.001 ``documents`` table adapted to the corpus shape
    (repo, path, commit, lang, content)."""
    from engine.pipelines.quality import corpus_from_documents, quality_pipeline

    ds = corpus_from_documents("/root/testdata/sf0.001")
    out = quality_pipeline(
        ds,
        thresholds={
            # documents carry natural-language labels outside the code-langid
            # label set; disable the code-lang rules for this smoke run
            "known_langs": ("en", "de", "fr", "es", "zh"),
            "min_mismatch_conf": 2.0,  # conf is <=1 -> lang_mismatch off
        },
    )
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from engine.queries import QUERIES
    import engine.queries_ext  # noqa: F401  (registers the extended set)

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from engine.queries import ORACLE_SQL
    import engine.queries_ext  # noqa: F401

    return dict(ORACLE_SQL)
