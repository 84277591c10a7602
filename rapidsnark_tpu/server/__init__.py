"""Proof service (reference layer L6, SURVEY.md §2.6-2.7, §3.2-3.3)."""

from .fullprover import FullProver, Status  # noqa: F401
