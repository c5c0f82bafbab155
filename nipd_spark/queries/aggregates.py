"""Placeholder — queries land in a later phase commit."""
