"""Analytic knife-edge audit of the ROUND(SUM(money)) oracle census.

Round 7's multi-seed sweeps caught four knife edges empirically (q212,
q64, q210: order-dependent ROUND(SUM(double)); q208: per-engine
ROUND(x, n) tie resolution) — all on PRODUCT/quotient expressions,
since converted to exact integer cents. What remains on the detector
policy is the census of sites that ROUND a SUM of a RAW decimal-aligned
money/value COLUMN (no arithmetic). Random multi-seed data can't
efficiently stress those, so this tool adjudicates them ANALYTICALLY,
proving for each site that NO dataset the driver can supply and NO
summation order can flip the final digit:

1. **Lattice distance** ``d``: every value of a decimal-aligned column
   is an exact multiple of a quantum q (0.01 for 2-dec money, 1.0 for
   integer quantities — VERIFIED against the actual parquet, bitwise,
   not assumed), so every group's TRUE sum lies on the lattice qZ. A
   ROUND(x, n) tie sits on the midpoint grid (k+1/2)*10^-n. The
   minimum distance between the two grids is a closed form: with
   q/10^-n = a/b in lowest terms, d = 10^-n/(2b) when b is odd and 0
   when b is even (an EXACT tie is reachable — the site must convert,
   because Spark rounds the binary expansion of the double while
   DuckDB rounds the FP-scaled value, and those disagree on ~2.6% of
   midpoints; see probe_round_tie_disagreement).

2. **Worst-case any-order FP error** ``E``: summing N doubles with
   total mass A = sum(|x|) in ANY order yields a result within
   (N-1) * eps * A * (1 + O(N*eps)) of the true sum (standard
   backward-error bound, eps = 2^-53). Two engines' sums therefore
   differ from each other by <= 2*N*eps*A; adding 4 ulps of
   representation slack covers the lattice point's own rounding. The
   bound is taken over the WHOLE TABLE (N, A at the audited sf_dir),
   which dominates every possible GROUP BY — no per-gate grouping
   analysis needed.

A site is PROVEN safe when margin = d / E >= 10. At sf0.1 the typical
margin is ~1e4-1e6; a failing margin or an unaligned column means the
data model changed and the site must take the standard integer-cents
recipe (the q212/q208 conversions). tests/test_knife_edge_audit.py
runs this as a regression gate, so any new gate that ROUNDs a raw
money sum is auto-audited, and any fixture-precision change fails
loudly instead of flaking on the driver.

Usage: python tools/knife_edge_audit.py [sf_dir]
"""

from __future__ import annotations

import math
import re
import sys
from fractions import Fraction

EPS = 2.0**-53

# Map column prefixes to their TPC-H-ish tables.
_PREFIX_TABLE = {
    "l_": "lineitem",
    "o_": "orders",
    "c_": "customer",
    "s_": "supplier",
    "p_": "part",
    "ps_": "partsupp",
    "n_": "nation",
    "r_": "region",
}

# Census members whose summed expression is not a bare aligned column:
# (gate, normalized arg) -> (table, column, coefficient). Each entry is
# a nested/aliased/scaled re-expression of a decimal-aligned column,
# manually resolved; the audit fails on any UNRESOLVED non-bare site so
# new gates can't silently skip the audit.
_OVERRIDES = {
    # two-level sums: SUM over per-group SUM(value) partials — the
    # whole-table bound covers the nested tree (same N, same A).
    ("q198_exchange_reuse", "total"): ("orders", "o_totalprice", 1),
    ("q170_map_functions", "CASE WHEN total > 50 THEN total END"): (
        "events",
        "value",
        1,
    ),
    ("q221_multi_stateful_chain", "sv"): ("events", "value", 1),
    # windowed prefix sum — every prefix is a group; same bound.
    (
        "q13_window_analytics",
        "value OVER_WINDOW",
    ): ("events", "value", 1),
    # ABS of an aligned column stays on the same lattice.
    ("q19_conditional", "ABS(c_acctbal)"): ("customer", "c_acctbal", 1),
    # doubling a double is exact: lattice quantum scales to 0.02.
    (
        "q225_dynamic_partition_overwrite",
        "CASE WHEN day = (SELECT m FROM mx) THEN 2 * value ELSE value END",
    ): ("events", "value", 2),
    # per-row quality = ROUND(n_chars/100.0, 6) == the exact double of
    # k/100 (integer n_chars): a 2-dec lattice summed at scale 6.
    ("q151_schema_drift_union", "quality"): (
        "documents",
        "ROUND(n_chars / 100.0, 6)",
        1,
    ),
}


def _balanced(s: str, start: int) -> int:
    """Index just past the ')' matching the '(' at ``start``."""
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced parens")


def census(oracles: dict[str, str]) -> list[dict]:
    """All ROUND(<SUM-of-column expr>, n) final sites across the
    oracle SQL census. Quotients/products of sums (the converted
    cents idiom divides an exact integer) are excluded by requiring
    the ROUND argument to be exactly the SUM/COALESCE(SUM) call."""
    sites = []
    for gate, sql in oracles.items():
        if not sql:
            continue
        for m in re.finditer(r"ROUND\s*\(", sql):
            end = _balanced(sql, m.end() - 1)
            inner = sql[m.end() : end - 1]
            # split top-level comma: ROUND(arg, scale)
            depth = 0
            cut = None
            for i, ch in enumerate(inner):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif ch == "," and depth == 0:
                    cut = i
            if cut is None:
                continue  # scale-0 ROUND: integer result, engine-agreeing
            arg = " ".join(inner[:cut].split())
            try:
                scale = int(inner[cut + 1 :].strip())
            except ValueError:
                continue
            # unwrap COALESCE(expr, <literal>)
            cm = re.fullmatch(
                r"COALESCE\s*\((.*),\s*-?[\d.]+\s*\)", arg, re.S
            )
            if cm:
                arg = cm.group(1).strip()
            sm = re.fullmatch(
                r"SUM\s*\((.*?)\)(\s+OVER\s*\(.*\))?", arg, re.S
            )
            if not sm:
                continue  # not the raw-sum class (quotients, products,
                # already-converted cents idioms, scalars)
            summand = " ".join(sm.group(1).split())
            if sm.group(2):
                summand += " OVER_WINDOW"
            sites.append({"gate": gate, "arg": summand, "scale": scale})
    return sites


def resolve(site: dict) -> tuple[str, str, int]:
    """(table, column, coefficient) for a census site; raises on any
    summed expression the audit can't prove decimal-aligned."""
    arg = site["arg"]
    key = (site["gate"], arg)
    if key in _OVERRIDES:
        return _OVERRIDES[key]
    bare = re.fullmatch(r"(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)", arg)
    if not bare:
        raise ValueError(
            f"{site['gate']}: ROUND(SUM({arg!r}), {site['scale']}) is not "
            "a bare aligned column and has no _OVERRIDES entry — either "
            "add one (proving alignment) or convert the site to integer "
            "cents (the q212 recipe)"
        )
    col = bare.group(1)
    for pref, table in _PREFIX_TABLE.items():
        if col.startswith(pref):
            return table, col, 1
    if col == "value":
        return "events", col, 1
    raise ValueError(f"{site['gate']}: unknown column {col!r}")


def column_stats(con, sf_dir: str, table: str, col: str) -> dict:
    """N, sum(|x|), and the VERIFIED lattice quantum of a column.

    Alignment is checked bitwise: x must equal the double of
    round(x * 1/q) * q recomputed through the same FP ops both engines
    use — if any row fails for q in {1, 0.01, 0.001}, the column is
    unaligned and the audit fails (quantum 0)."""
    path = f"{sf_dir}/{table}.parquet"
    n, a = con.execute(
        f"SELECT COUNT(*), COALESCE(SUM(ABS({col})), 0)"
        f" FROM read_parquet('{path}')"
    ).fetchone()
    quantum = 0.0
    for q, inv in ((1.0, 1), (0.01, 100), (0.001, 1000)):
        bad = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{path}') "
            f"WHERE {col} IS NOT NULL AND "
            f"{col} <> CAST(ROUND({inv} * {col}) AS BIGINT) / {inv}.0"
        ).fetchone()[0]
        if bad == 0:
            quantum = q
            break
    return {"n": int(n), "abs_sum": float(a), "quantum": quantum}


def lattice_distance(quantum: float, coeff: int, scale: int) -> float:
    """Exact min distance from the sum lattice (multiples of
    quantum*coeff) to the ROUND(x, scale) midpoint grid."""
    if quantum <= 0:
        return 0.0
    u = Fraction(1, 10**scale)
    q = Fraction(quantum).limit_denominator(10**6) * coeff
    r = q / u  # lattice step in units of 10^-scale
    b = r.denominator
    if b % 2 == 0:
        return 0.0  # exact ties reachable
    return float(u / (2 * b))


def audit(sf_dir: str, oracles: dict[str, str]) -> list[dict]:
    import duckdb

    con = duckdb.connect()
    stats_cache: dict[tuple[str, str], dict] = {}
    rows = []
    for site in census(oracles):
        table, col, coeff = resolve(site)
        key = (table, col)
        if key not in stats_cache:
            stats_cache[key] = column_stats(con, sf_dir, table, col)
        st = stats_cache[key]
        d = lattice_distance(st["quantum"], coeff, site["scale"])
        if st["quantum"] >= 1.0 and st["abs_sum"] * coeff < 2.0**53:
            # integer-valued summands: every partial sum is an integer
            # below 2^53, hence exactly representable — FP addition is
            # EXACT in any order, any grouping. No error at all.
            err = 0.0
        else:
            err = 2 * st["n"] * EPS * st["abs_sum"] * coeff + 4 * math.ulp(
                max(st["abs_sum"] * coeff, 1.0)
            )
        rows.append(
            {
                **site,
                "table": table,
                "column": col,
                "quantum": st["quantum"],
                "tie_distance": d,
                "err_bound": err,
                "margin": (d / err) if err > 0 else math.inf,
            }
        )
    con.close()
    return rows


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from python_tool_setup_spark.queries import all_queries

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    oracles = {n: q.oracle for n, q in all_queries().items() if q.oracle}
    rows = audit(sf_dir, oracles)
    rows.sort(key=lambda r: r["margin"])
    print(
        f"{'gate':38s} {'col':16s} sc  quantum  tie_dist   err_bound   margin"
    )
    worst = math.inf
    for r in rows:
        worst = min(worst, r["margin"])
        print(
            f"{r['gate']:38s} {r['column']:16s} {r['scale']:2d}  "
            f"{r['quantum']:7.3f}  {r['tie_distance']:.2e}  "
            f"{r['err_bound']:.3e}  {r['margin']:.2e}"
        )
    print(f"\n{len(rows)} sites audited at {sf_dir}; worst margin {worst:.2e}")
    return 0 if worst >= 10 else 1


if __name__ == "__main__":
    raise SystemExit(main())
