"""DuckDB-oracle SQL helpers (SURVEY.md §1.2 / §4.2 cross-engine pitfalls).

Float discipline for the driver's value-hash comparison:

- **Per-row arithmetic** is emitted UNROUNDED on both sides with the same
  expression shape: IEEE double ops over identical parquet inputs are
  bit-deterministic, so Spark and DuckDB produce identical bits.
- **Order-dependent aggregates** (sum/avg/stddev/…) differ in the last
  ulp between engines, so both sides round. Spark's ``F.round`` on a
  double is ``BigDecimal.valueOf(shortestRepr(x)).setScale(n, HALF_UP)``
  — NOT a binary-double round — so the oracle must emulate it:
  shortest-repr via VARCHAR cast → DECIMAL → round (ties away from
  zero == HALF_UP) → DOUBLE. Verified equivalent on boundary cases.
- ``events.ts`` is µs-precision parquet in the current fixtures (ns in
  round-1 vintages; catalog.load adapts per-footer). Oracle SQL goes
  through ``ts_us`` so both eras compare at µs.
"""

from __future__ import annotations


def dround(expr: str, n: int = 4) -> str:
    """DuckDB SQL equivalent of Spark's ``F.round(expr, n)`` on doubles."""
    return (
        f"CAST(round(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,15)), {n}) AS DOUBLE)"
    )


def ts_us(expr: str = "ts") -> str:
    """Normalize a DuckDB timestamp to µs TIMESTAMP, matching Spark's
    parquet read (no-op on µs data; truncates ns-vintage fixtures)."""
    return f"CAST(({expr}) AS TIMESTAMP)"
