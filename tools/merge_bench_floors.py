"""Merge per-gate quiet-machine floors from multiple evidence sources.

This box carries a recurring EXTERNAL load (PLANS.md bench-noise notes,
rounds 6-9): a single `bench.py --pin-floors` calibration run samples
each gate once and inherits whatever load window it overlaps, so its
floors are biased HIGH for the gates that drew the window. A floor
biased high suppresses the retry/second-pass triggers in bench.py —
the failure mode that produced the dirty r8 headline — while a floor
biased low merely buys an extra (cheap, bounded) re-measurement. The
right floor estimator is therefore the per-gate MIN over every clean
measurement available:

- each `--pin-floors` calibration run's gate map (+ every published
  retry sample from its stderr `retried_all_samples` line);
- the per-gate values published in prior driver rounds' BENCH_r*.json
  payloads (the slowest ~120 gates per round — exactly the ones whose
  floors matter; keyed by short name, matched via the registry).

The merged probe floor is the min probe sample across runs.

Usage:
    python tools/merge_bench_floors.py out.json src1.json [src2.json ...]

Each src is either a --pin-floors output (has "gates") or a BENCH_r*
payload (has "parsed" or is itself the parsed line). Stderr retry
samples can be supplied as {"retried_all_samples": {...}} JSON lines
inside any *.stderr file passed as a source.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gate_names() -> dict[str, str]:
    """short prefix (q304) -> full registry name."""
    from python_tool_setup_spark.queries import all_queries

    return {n.split("_", 1)[0]: n for n in all_queries()}


def take_min(dst: dict[str, float], name: str, val) -> None:
    try:
        v = float(val)
    except (TypeError, ValueError):
        return
    if v <= 0:
        return
    if name not in dst or v < dst[name]:
        dst[name] = round(v, 3)


def main() -> int:
    out_path, srcs = sys.argv[1], sys.argv[2:]
    short2full = gate_names()
    gates: dict[str, float] = {}
    probes: list[float] = []
    totals: list[float] = []
    for src in srcs:
        with open(src) as fh:
            text = fh.read()
        # a src is either one (possibly pretty-printed) JSON document
        # (--pin-floors output, BENCH_r* payload) or a stderr stream
        # holding several one-line JSON records among log noise
        try:
            docs = [json.loads(text)]
        except ValueError:
            docs = []
            for line in text.splitlines():
                line = line.strip()
                if not (line.startswith("{") and line.endswith("}")):
                    continue
                try:
                    docs.append(json.loads(line))
                except ValueError:
                    continue
        for data in docs:
            if "parsed" in data:
                data = data["parsed"]
            for name, v in (data.get("gates") or {}).items():
                take_min(gates, name, v)
            for name, v in (data.get("queries_full") or {}).items():
                take_min(gates, name, v)
            for short, v in (data.get("queries") or {}).items():
                full = short2full.get(short)
                if full:
                    take_min(gates, full, v)
            for key in ("retried_all_samples", "retried_both_samples",
                        "retried"):
                for short, samples in (data.get(key) or {}).items():
                    full = short2full.get(short.split("_", 1)[0])
                    if full:
                        for s in samples:
                            take_min(gates, full, s)
            if isinstance(data.get("probe"), list):
                probes.extend(p for p in data["probe"] if p and p > 0)
            elif data.get("probe"):
                probes.append(float(data["probe"]))
            # "pinned_total" is the pre-r10 name for the same envelope
            for key in ("floor_envelope_total", "pinned_total"):
                if data.get(key):
                    totals.append(float(data[key]))
                    break
    merged = {
        "sf": 0.1,
        "probe": round(min(probes), 3) if probes else 0.0,
        # Sum of per-gate MINIMA — an ENVELOPE (each gate independently
        # at its best), not a measured end-to-end run total. Renamed
        # from "pinned_total" per VERDICT r9 item 4 so it can't be
        # quoted as a run measurement.
        "floor_envelope_total": round(sum(gates.values()), 3),
        "source_totals": totals,
        "n_sources": len(srcs),
        "gates": dict(sorted(gates.items())),
    }
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=0, separators=(",", ":"))
    print(
        f"merged {len(gates)} gate floors from {len(srcs)} sources -> "
        f"{out_path} (floor envelope {merged['floor_envelope_total']}s "
        f"— per-gate minima, not a run total; probe {merged['probe']}s)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
