"""Engine error types."""

from __future__ import annotations


class KafSqlError(Exception):
    """Base for all engine errors."""


class ParseError(KafSqlError):
    """The statement does not match the KAFSQL grammar."""


class ValidationError(KafSqlError):
    """The statement parsed but violates a dialect/governance rule."""


class GovernanceError(KafSqlError):
    """Rejected by scan budgets / admission control."""
