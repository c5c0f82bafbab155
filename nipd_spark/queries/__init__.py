"""Query modules — one per SURVEY.md §2 operator family.

Importing a module registers its queries via nipd_spark.registry.query;
registry._QUERY_MODULES is the authoritative module list.
"""
