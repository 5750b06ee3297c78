"""Typed errors shared across the persisted index stores and the CLI.

IndexNotBuiltError replaces the substring-matched "build() first"
ValueError text that cmd_forget (cli.py) previously keyed on — a wording
edit in any store silently changed CLI behavior (ADVICE r10). Subclassing
ValueError keeps every existing `except ValueError` call-site working.
"""

from __future__ import annotations


class IndexNotBuiltError(ValueError):
    """An index store operation (append/forget/serve) needs an existing
    persisted index, and there is none at the configured path."""
