"""Reusable custom operators (SURVEY.md §4.3) — compositions of built-in
DataFrame ops; no custom Catalyst rules needed (we control query
construction).
"""
