"""Report sinks — reference parity surface: objects with
``generate(results, summary) -> path`` (reference: src/reporter/__init__.py:5-8)."""

from .csv_reporter import CSVReporter
from .html_reporter import HTMLReporter

__all__ = ["CSVReporter", "HTMLReporter"]
