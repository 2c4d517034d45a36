"""Error model (reference: src/errors.rs:1-10, src/main.rs:51-61).

Three variants, same fields as the reference enum, as exception classes.
"""

from __future__ import annotations


class ArnabError(Exception):
    """Generic pipeline error (reference: errors.rs `Error(String)`)."""


class StatementExecutionError(ArnabError):
    """A statement failed inside the engine (reference: errors.rs
    `StatementExecutionError{msg, sql, path}`)."""

    def __init__(self, msg: str, sql: str, path: str):
        self.msg = msg
        self.sql = sql
        self.path = path
        super().__init__(f"{msg}\n  in statement: {sql.strip()[:200]}\n  from model: {path}")


class UnknownModelType(ArnabError):
    """A file in the models dir has an unsupported extension
    (reference: errors.rs `UnknownModelType`, session.rs:98-104)."""


class CyclicDependencyError(ArnabError):
    """Model DAG contains a cycle. Improvement over the reference, whose
    DFS toposort recurses forever on cycles (reference: session.rs:282-292
    has no cycle detection)."""
