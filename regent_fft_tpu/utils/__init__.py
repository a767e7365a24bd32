"""Verification, accounting, observability, wisdom."""
