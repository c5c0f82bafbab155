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
    """DuckDB SQL equivalent of Spark's ``F.round(expr, n)`` on doubles.

    Java's BigDecimal.valueOf keeps the FULL scale of the shortest repr
    before setScale — a fixed DECIMAL(38,15) silently rounds the 16th+
    fractional digit first, which flips HALF_UP on boundary values like
    6.9487499999999995 (observed in w12 at sf0.1). Shortest-repr doubles
    carry ≤17 significant digits, so |x| ≥ 1 fits scale 18 exactly
    (integer headroom 1e20) and |x| < 1 fits scale 37 (leading zeros
    eat scale, integer part is 0).
    """
    v = f"({expr})"

    def path(scale: int) -> str:
        return (
            f"CAST(round(CAST(CAST({v} AS VARCHAR) AS DECIMAL(38,{scale})), {n})"
            " AS DOUBLE)"
        )

    return f"CASE WHEN abs({v}) < 1 THEN {path(37)} ELSE {path(18)} END"


def ts_us(expr: str = "ts") -> str:
    """Normalize a DuckDB timestamp to µs TIMESTAMP, matching Spark's
    parquet read (no-op on µs data; truncates ns-vintage fixtures)."""
    return f"CAST(({expr}) AS TIMESTAMP)"
