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
import os
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


# ===================================================================
# Quantile / interpolation family (VERDICT r8, next-round item 3)
# ===================================================================
#
# The q524 catch (seed 5050) was a QUANTILE-INTERPOLATION tie: with
# p = a/b over a lattice-valued column, the continuous quantile
# v = lo + frac*(hi - lo) (frac = r/b, r = (n-1)*a mod b) lies on the
# sub-lattice (q*k/b)Z, and when a ROUND(k*quantile, s) midpoint is
# reachable on that sub-lattice the engines' interpolation doubles can
# differ by an ulp and round apart. This section adjudicates every
# quantile_cont / quantile_disc / median oracle site the way the
# ROUND(SUM) census above is adjudicated — a closed-form verdict per
# site, data-measured where the closed form needs the actual n/range:
#
# 1. **exact-FP** (proven): p dyadic (b in {2,4}) AND the argument
#    population is INTEGER-valued AND k*|v|max*10^s < 2^50. Then
#    h = p*(n-1) is exact (dyadic scaling of an integer), frac is
#    exactly one of {0, 1/4, 1/2, 3/4}, frac*(hi-lo) is exact (3t < 2^53
#    representable), lo + frac*(hi-lo) is exact, k*v exact, and both
#    engines' ROUND paths produce the correctly-rounded double of the
#    same rational (Spark: BigDecimal HALF_UP on the exact decimal;
#    DuckDB: exact x*10^s product, exact round, one correctly-rounded
#    division). At exact .5 ties both engines round AWAY FROM ZERO
#    (Java HALF_UP == C++ std::round), so even reachable ties agree.
#    The two engines therefore hold IDENTICAL doubles, which also makes
#    every downstream deterministic arithmetic/comparison identical.
#
# 2. **closed-form margin** (proven): lattice distance d from the
#    quantile sub-lattice (unit*k/b)Z to the ROUND(, s) midpoint grid
#    (same closed form as lattice_distance) vs the FP divergence bound
#    E = 2*(eps*h*G + 8*ulp(k*|v|max)) where h = p*(n-1) and G bounds
#    the interpolation bracket gap (whole-population range — valid
#    because |hi-lo| <= range, and the bound survives rank-boundary
#    crossing: the interpolated value is continuous in h, so an eps*h
#    position error moves the value by at most eps*h*gap). n, range
#    measured from the actual population at the audited sf_dir (same
#    policy as column_stats). PROVEN when margin = d/E >= 10.
#
# 3. **overrides**: sites the parser can't classify carry either a
#    written identical-pipeline proof (_Q_PROVEN) or a site-specific
#    measurement (_Q_MEASURED). An unclassified site RAISES, so a new
#    quantile gate cannot silently skip the audit.

# Bare-column name -> table for quantile args (beyond _PREFIX_TABLE).
_Q_NAME_TABLE = {"value": "events", "n_chars": "documents"}

# (gate, normalized arg) -> integer-valued population in `unit`-sized
# real units. SQL yields one column ``v`` (BIGINT); {sf} placeholder.
_Q_POPS: dict[tuple[str, str], dict] = {
    # norms CTE of the gate (integers by construction); the MAD site's
    # |norm - med| devs are bounded by the same range, so one
    # population serves both sites.
    ("q374_embedding_norm_outliers", "norm_micro"): {
        "unit": 1,
        "sql": """
            SELECT CAST(ROUND(sqrt(CAST(SUM(CAST(q AS HUGEINT) * q)
                       AS DOUBLE))) AS BIGINT) AS v
            FROM (SELECT vec_id,
                         CAST(ROUND(CAST(e AS DOUBLE) * 1000000.0)
                             AS BIGINT) AS q
                  FROM (SELECT vec_id, unnest(embedding) AS e
                        FROM read_parquet('{sf}/embeddings.parquet')))
            GROUP BY vec_id
        """,
    },
    ("q374_embedding_norm_outliers", "ABS(n.norm_micro - med.m)"): {
        "alias_of": ("q374_embedding_norm_outliers", "norm_micro"),
        "note": "devs |norm - med| are integers bounded by the norm "
        "range; reusing the norm population's stats is conservative",
    },
    ("q407_approx_percentile_audit", "v"): {
        "unit": Fraction(1, 100),
        "sql": "SELECT CAST(ROUND(100 * l_extendedprice) AS BIGINT) AS v"
        " FROM read_parquet('{sf}/lineitem.parquet')",
    },
    ("q411_time_to_convert", "lat_s"): {
        "unit": 1,
        "sql": """
            WITH firsts AS (
                SELECT user_id,
                       MIN(CASE WHEN event_type = 'view'
                                THEN epoch_ms(ts) END) AS first_view_ms
                FROM read_parquet('{sf}/events.parquet') GROUP BY user_id
            )
            SELECT (MIN(epoch_ms(e.ts)) - f.first_view_ms) // 1000 AS v
            FROM firsts f
            JOIN read_parquet('{sf}/events.parquet') e
              ON e.user_id = f.user_id AND e.event_type = 'purchase'
             AND epoch_ms(e.ts) >= f.first_view_ms
            WHERE f.first_view_ms IS NOT NULL
            GROUP BY f.user_id, f.first_view_ms
        """,
    },
    ("q425_anomaly_consensus", "x"): {
        "unit": 1,
        "sql": "SELECT COUNT(*) AS v FROM"
        " read_parquet('{sf}/events.parquet')"
        " GROUP BY event_type, CAST(ts AS DATE)",
    },
    ("q425_anomaly_consensus", "ABS(2 * d.x - st.med2)"): {
        "alias_of": ("q425_anomaly_consensus", "x"),
        "note": "|2x - med2| <= 2*(xmax - xmin) + 1: integer devs "
        "bounded by twice the daily-count range (stats scaled below)",
        "range_scale": 2,
    },
    ("q430_quantile_treatment_effect", "v"): {
        "unit": 1,
        "sql": "SELECT CAST(ROUND(1e6 * value) AS BIGINT) AS v"
        " FROM read_parquet('{sf}/events.parquet')",
    },
    ("q461_median_heterogeneity", "cents"): {
        "unit": 1,
        "sql": "SELECT CAST(ROUND(100 * o_totalprice) AS BIGINT) AS v"
        " FROM read_parquet('{sf}/orders.parquet')",
    },
    ("q482_grouped_mad_outliers", "cents"): {
        "unit": 1,
        "sql": "SELECT CAST(ROUND(100 * o_totalprice) AS BIGINT) AS v"
        " FROM read_parquet('{sf}/orders.parquet')",
    },
    ("q482_grouped_mad_outliers", "dev2"): {
        "alias_of": ("q482_grouped_mad_outliers", "cents"),
        "note": "dev2 = |2*cents - med2| <= 2*(range): integer",
        "range_scale": 2,
    },
    ("q534_runs_test", "cents"): {
        "unit": 1,
        "sql": "SELECT SUM(CAST(ROUND(100 * o_totalprice) AS BIGINT))"
        " AS v FROM read_parquet('{sf}/orders.parquet')"
        " GROUP BY YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1",
    },
    # q149's MAD argument: med = ROUND(median(price), 4) is EXACTLY the
    # rational (lo+hi)/200 (the 0.005 lattice is a sub-lattice of the
    # 1e-4 round grid, so the ROUND is a no-op in real terms), hence
    # |price - med| = |2*cents - (lo+hi)| / 200: an INTEGER population
    # in 1/200-dollar units. b=2 puts the MAD median on (1/400)Z =
    # 25e-4 * 1e-4-grid steps: 25 odd -> midpoints unreachable,
    # d = 5e-5 (the naive 1e-4-lattice reading would give d = 0; the
    # refinement to the true half-cent med lattice is what proves it).
    ("q149_mad_outliers", "ABS(l_extendedprice - med)"): {
        "unit": Fraction(1, 200),
        "sql": """
            WITH c AS (
                SELECT l_returnflag AS g,
                       CAST(ROUND(100 * l_extendedprice) AS BIGINT) AS c
                FROM read_parquet('{sf}/lineitem.parquet')
            ),
            r AS (
                SELECT g, c,
                       ROW_NUMBER() OVER (PARTITION BY g ORDER BY c) - 1
                           AS rk,
                       COUNT(*) OVER (PARTITION BY g) AS n
                FROM c
            ),
            med2 AS (
                SELECT g,
                       MAX(CASE WHEN rk = (n - 1) // 2 THEN c END)
                       + MAX(CASE WHEN rk = n // 2 THEN c END) AS m2
                FROM r GROUP BY g
            )
            SELECT ABS(2 * c.c - m.m2) AS v
            FROM c JOIN med2 m ON m.g = c.g
        """,
    },
}

# Sites proven by a written identical-pipeline argument (no lattice
# math applies: raw/windowed/comparison consumers).
_Q_PROVEN: dict[tuple[str, str], str] = {
    ("q380_rolling_median_anomaly", "n"): (
        "windowed median over <=7 INTEGER daily counts with p=1/2 "
        "(dyadic): med is an exact dyadic double, identical on both "
        "engines (exact-FP class). Every downstream op is identical-"
        "input deterministic arithmetic: ABS(n-med) exact on (1/2)Z, "
        "*100 exact (<2^53), strict > of exact values agrees; "
        "dev*100.0/med is ONE correctly-rounded IEEE division of "
        "identical doubles -> identical; *10.0 correctly rounded "
        "identical; ROUND scale-0 of identical doubles agrees (both "
        "engines round half away from zero); AVG of integers is an "
        "exact integer sum with one identical division. The Spark "
        "side (queries/batch88.py) mirrors the oracle op-for-op."
    ),
    ("q97_quality_percentile_filter", "n_chars"): (
        "quantile_disc returns an ACTUAL population element (a parquet "
        "double, bit-identical in both engines); the only risk is the "
        "rank convention. Probed empirically (round 9): Spark "
        "approxQuantile(relativeError=0) vs DuckDB quantile_disc(0.1) "
        "over n = 2..60, 100, 1000, 9999..10001 — including every "
        "n = 0 mod 10 boundary where fl(0.1)*n straddles an integer — "
        "0 mismatches. Consumer is `>=` of identical doubles."
    ),
}


def _q418_measure(con, sf_dir: str) -> list[dict]:
    """q418 Freedman–Diaconis sites: q25/q75 have DYADIC p (25e-2,
    75e-2 are exact doubles), so per column both engines interpolate
    the same op sequence over identical parquet doubles — but the
    consumer divides by cbrt(n) (libm, not cross-engine identical) and
    ROUNDs at milli scale, so the verdict needs the MEASURED distance
    of the actual fd_width value to the nearest scale-0 midpoint.
    The exact IQR is computed in integer units (4*q25 = lo*(4-r)+hi*r)
    and x = 2000*IQR/cbrt(n) evaluated once; E budgets 8 ulps of |x|
    for the two engines' interpolate+divide+cbrt divergence (cbrt is
    correctly rounded to <=1 ulp on both). fd_bins' CEIL consumes
    identical doubles (same BIGINT width, same vmax/vmin parquet
    doubles, one identical division), so it adds no extra site."""
    out = []
    cols = [
        ("l_extendedprice", "lineitem", 100),
        ("l_quantity", "lineitem", 1),
        ("o_totalprice", "orders", 100),
    ]
    for col, table, inv in cols:
        n, q25x4, q75x4 = con.execute(
            f"""
            WITH r AS (
                SELECT CAST(ROUND({inv} * {col}) AS BIGINT) AS u,
                       ROW_NUMBER() OVER (ORDER BY {col}) - 1 AS rk,
                       COUNT(*) OVER () AS n
                FROM read_parquet('{sf_dir}/{table}.parquet')
            ),
            agg AS (
                SELECT MAX(n) AS n,
                       MAX(CASE WHEN rk = ((n-1) * 1) // 4
                           THEN u END) AS lo25,
                       MAX(CASE WHEN rk = LEAST(n-1, ((n-1) * 1) // 4 + 1)
                           THEN u END) AS hi25,
                       MAX(CASE WHEN rk = ((n-1) * 3) // 4
                           THEN u END) AS lo75,
                       MAX(CASE WHEN rk = LEAST(n-1, ((n-1) * 3) // 4 + 1)
                           THEN u END) AS hi75
                FROM r
            )
            SELECT n,
                   lo25 * (4 - ((n-1) * 1) % 4) + hi25 * (((n-1) * 1) % 4),
                   lo75 * (4 - ((n-1) * 3) % 4) + hi75 * (((n-1) * 3) % 4)
            FROM agg
            """
        ).fetchone()
        iqr = Fraction(int(q75x4) - int(q25x4), 4 * inv)
        x = 2000.0 * float(iqr) / float(int(n)) ** (1.0 / 3.0)
        d = abs((x - math.floor(x)) - 0.5)
        err = 8 * EPS * max(abs(x), 1.0)
        out.append(
            {
                "gate": "q418_fd_binning_advisor",
                "arg": col,
                "p": "1/4,3/4",
                "scale": 0,
                "strategy": "measured-fd",
                "tie_distance": d,
                "err_bound": err,
                "margin": d / err if err else math.inf,
            }
        )
    return out


def _q430_p90_measure(con, sf_dir: str) -> list[dict]:
    """q430 p90 (b=10, non-dyadic) over micro-unit integers: the
    whole-range gap bound fails (range ~5e8 units), so measure the
    ACTUAL bracket gap around the p90 rank per (event_type, arm)
    group — the continuity argument only needs the max adjacent gap
    within +-2 ranks of the interpolation position. d = 5e-5 is the
    closed-form lattice distance ((1/10)Z vs the 1e-4 midpoint grid,
    r=1000 odd); E doubles once more for the qte final (difference of
    two p90s on the same lattice)."""
    gap, n_max, v_max = con.execute(
        f"""
        WITH assign AS (
            SELECT event_type,
                   CAST(('0x' || substr(md5('arm|' ||
                       CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2
                       AS arm,
                   CAST(ROUND(1e6 * value) AS BIGINT) AS v
            FROM read_parquet('{sf_dir}/events.parquet')
        ),
        r AS (
            SELECT event_type, arm, v,
                   ROW_NUMBER() OVER (PARTITION BY event_type, arm
                                      ORDER BY v) - 1 AS rk,
                   COUNT(*) OVER (PARTITION BY event_type, arm) AS n,
                   LEAD(v) OVER (PARTITION BY event_type, arm
                                 ORDER BY v) AS nxt
            FROM assign
        )
        SELECT MAX(CASE WHEN rk BETWEEN ((n-1) * 9) // 10 - 2
                                    AND ((n-1) * 9) // 10 + 2
                        THEN nxt - v ELSE 0 END),
               MAX(n), MAX(ABS(v))
        FROM r
        """
    ).fetchone()
    h = 0.9 * (int(n_max) - 1)
    err = 4 * (
        EPS * h * float(gap) + 8 * math.ulp(max(float(v_max), 1.0))
    )
    d = 5e-5
    return [
        {
            "gate": "q430_quantile_treatment_effect",
            "arg": "v",
            "p": "9/10",
            "scale": 4,
            "strategy": "measured-gap",
            "tie_distance": d,
            "err_bound": err,
            "margin": d / err if err else math.inf,
        }
    ]


_Q_MEASURED = {
    ("q418_fd_binning_advisor", None): _q418_measure,
    ("q430_quantile_treatment_effect", "9/10"): _q430_p90_measure,
}


def quantile_census(oracles: dict[str, str]) -> list[dict]:
    """Every quantile_cont/quantile_disc/median call site across the
    oracle census: (gate, arg, p, k, scale, fn, windowed)."""
    sites = []
    for gate, sql in oracles.items():
        if not sql:
            continue
        norm = " ".join(sql.split())
        for m in re.finditer(
            r"\b(quantile_cont|quantile_disc|median)\s*\(", norm, re.I
        ):
            fn = m.group(1).lower()
            end = _balanced(norm, m.end() - 1)
            inner = norm[m.end() : end - 1]
            depth = 0
            cut = None
            for i, ch in enumerate(inner):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif ch == "," and depth == 0:
                    cut = i
            if fn == "median":
                arg, p = inner.strip(), Fraction(1, 2)
            else:
                arg = inner[:cut].strip()
                from decimal import Decimal

                p = Fraction(Decimal(inner[cut + 1 :].strip()))
            windowed = bool(re.match(r"\s*OVER\s*\(", norm[end:]))
            # enclosing ROUND( [k *] <call> [, s] ) ?
            k, scale = 1, None
            pre = norm[max(0, m.start() - 24) : m.start()]
            rm = re.search(r"ROUND\s*\(\s*(?:(\d+)\s*\*\s*)?$", pre, re.I)
            if rm and not windowed:
                k = int(rm.group(1) or 1)
                ropen = m.start() - len(pre) + rm.start() + pre[
                    rm.start() :
                ].upper().index("ROUND") + len("ROUND")
                ropen = norm.index("(", ropen)
                rend = _balanced(norm, ropen)
                tail = norm[end : rend - 1].strip()
                if tail == "":
                    scale = 0
                elif re.fullmatch(r",\s*(\d+)", tail):
                    scale = int(tail.lstrip(", "))
                else:
                    scale = None  # ROUND over a larger expression
            sites.append(
                {
                    "gate": gate,
                    "arg": arg,
                    "p": p,
                    "k": k,
                    "scale": scale,
                    "fn": fn,
                    "windowed": windowed,
                }
            )
    return sites


def _q_pop_stats(con, sf_dir: str, key: tuple[str, str]) -> dict:
    """n / unit-range / integrality for an override population."""
    entry = _Q_POPS[key]
    scale = 1
    while "alias_of" in entry:
        scale *= entry.get("range_scale", 1)
        entry = _Q_POPS[entry["alias_of"]]
    sql = entry["sql"].format(sf=sf_dir)
    n, vmin, vmax, nonint = con.execute(
        f"SELECT COUNT(*), MIN(v), MAX(v),"
        f" COUNT(*) FILTER (WHERE v <> CAST(v AS BIGINT)) FROM ({sql})"
    ).fetchone()
    if nonint:
        raise ValueError(f"{key}: population is not integer-valued")
    return {
        "n": int(n),
        "vmin": int(vmin) * scale,
        "vmax": int(vmax) * scale,
        "unit": Fraction(entry["unit"]),
    }


def _q_auto_stats(con, sf_dir: str, gate: str, arg: str) -> dict | None:
    """Stats for a bare-column quantile argument (strip alias)."""
    bare = re.fullmatch(r"(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)", arg)
    if not bare:
        return None
    col = bare.group(1)
    table = _Q_NAME_TABLE.get(col)
    if table is None:
        for pref, t in _PREFIX_TABLE.items():
            if col.startswith(pref):
                table = t
                break
    if table is None:
        return None
    st = column_stats(con, sf_dir, table, col)
    if st["quantum"] <= 0:
        raise ValueError(f"{gate}: column {col} is not lattice-aligned")
    unit = Fraction(st["quantum"]).limit_denominator(10**6)
    path = f"{sf_dir}/{table}.parquet"
    vmin, vmax = con.execute(
        f"SELECT MIN({col}), MAX({col}) FROM read_parquet('{path}')"
    ).fetchone()
    return {
        "n": st["n"],
        "vmin": int(round(float(vmin) / float(unit))),
        "vmax": int(round(float(vmax) / float(unit))),
        "unit": unit,
    }


def q_lattice_distance(unit: Fraction, k: int, b: int, scale: int) -> float:
    """Min distance from the quantile sub-lattice (unit*k/b)Z to the
    ROUND(, scale) midpoint grid (k+1/2)*10^-scale."""
    u = Fraction(1, 10**scale)
    r = (unit * k / b) / u
    if r.denominator % 2 == 0:
        return 0.0
    return float(u / (2 * r.denominator))


def quantile_audit(sf_dir: str, oracles: dict[str, str]) -> list[dict]:
    """Per-site verdicts for the quantile census; raises on any site
    it can neither prove nor find an override for."""
    import duckdb

    con = duckdb.connect()
    rows = []
    measured_done = set()
    for site in quantile_census(oracles):
        gate, arg, p = site["gate"], site["arg"], site["p"]
        if (gate, arg) in _Q_PROVEN:
            rows.append(
                {
                    **site,
                    "p": str(p),
                    "strategy": "proven-identical",
                    "tie_distance": math.inf,
                    "err_bound": 0.0,
                    "margin": math.inf,
                    "proof": _Q_PROVEN[(gate, arg)],
                }
            )
            continue
        mkey = (gate, f"{p.numerator}/{p.denominator}")
        mkey_any = (gate, None)
        if mkey in _Q_MEASURED or mkey_any in _Q_MEASURED:
            fn = _Q_MEASURED.get(mkey) or _Q_MEASURED[mkey_any]
            tag = mkey if mkey in _Q_MEASURED else mkey_any
            if tag not in measured_done:
                measured_done.add(tag)
                rows.extend(fn(con, sf_dir))
            continue
        st = (
            _q_pop_stats(con, sf_dir, (gate, arg))
            if (gate, arg) in _Q_POPS
            else _q_auto_stats(con, sf_dir, gate, arg)
        )
        if st is None or site["scale"] is None:
            raise ValueError(
                f"{gate}: quantile site over {arg!r} (p={p}, "
                f"scale={site['scale']}) has no population resolution "
                "or no ROUND context — add a _Q_POPS/_Q_PROVEN/"
                "_Q_MEASURED entry (with proof) or convert the site "
                "to exact-rational interpolation (the q524 recipe)"
            )
        b, k, scale = p.denominator, site["k"], site["scale"]
        vmax_abs = max(abs(st["vmin"]), abs(st["vmax"]))
        if (
            b in (2, 4)
            and st["unit"] == 1
            and k * vmax_abs * 10**scale < 2**50
        ):
            rows.append(
                {
                    **site,
                    "p": str(p),
                    "strategy": "exact-fp",
                    "tie_distance": math.inf,
                    "err_bound": 0.0,
                    "margin": math.inf,
                }
            )
            continue
        d = q_lattice_distance(st["unit"], k, b, scale)
        h = float(p) * (st["n"] - 1)
        G = (st["vmax"] - st["vmin"]) * float(st["unit"]) * k
        vreal = max(vmax_abs * float(st["unit"]) * k, 1.0)
        E = 2 * (EPS * h * G + 8 * math.ulp(vreal))
        rows.append(
            {
                **site,
                "p": str(p),
                "strategy": "closed-form",
                "tie_distance": d,
                "err_bound": E,
                "margin": (d / E) if E > 0 else math.inf,
            }
        )
    con.close()
    return rows


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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

    qrows = quantile_audit(sf_dir, oracles)
    qrows.sort(key=lambda r: r["margin"])
    print(
        f"\n{'gate':34s} {'arg':28s} {'p':7s} sc "
        f"{'strategy':16s} tie_dist  err_bound  margin"
    )
    qworst = math.inf
    for r in qrows:
        qworst = min(qworst, r["margin"])
        sc = r.get("scale")
        print(
            f"{r['gate']:34s} {str(r['arg'])[:28]:28s} {str(r['p']):7s} "
            f"{('--' if sc is None else f'{sc:2d}'):2s} "
            f"{r['strategy']:16s} {r['tie_distance']:.2e}  "
            f"{r['err_bound']:.2e}  {r['margin']:.2e}"
        )
    print(
        f"\n{len(qrows)} quantile sites audited; worst margin {qworst:.2e}"
    )
    return 0 if worst >= 10 and qworst >= 10 else 1


if __name__ == "__main__":
    raise SystemExit(main())
