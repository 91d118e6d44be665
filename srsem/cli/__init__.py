"""Unified CLI (the reference has none — scripts are run directly with
hard-coded constants, SURVEY.md §0)."""

from srsem.cli.main import main  # noqa: F401
