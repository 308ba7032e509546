"""Per-query cross-session bench bands (VERDICT r11 "Next round" #6).

Adjudicating the r11 `dedup_jaccard_pairs` "regression" took exhuming
builder sessions from two rounds back; this tool makes that lookup a
committed artifact.  It reads every committed driver bench artifact
(``BENCH_r*.json``, the post-round driver runs — SCALE.md provenance
note) plus the latest builder calibration (``BENCH_DETAIL.json``) and
emits ``tools/bench_history_band.json``: for each headline query, the
min / median / max of its per-session min-of-3 times across all
sessions that recorded it, with the per-session values kept so the
next "regression?" question is a table read, not an investigation.

Usage:  python tools/bench_band.py          # regenerate the artifact
        python tools/bench_band.py --check  # verify it is current

The band is DESCRIPTIVE history, not a gate: the standing adjudication
rule (SCALE.md "Bench-artifact provenance") still decides what counts
as noise — this file just supplies the historical spread the rule's
"exceeds the band" clause reads.  Regenerate at each round close after
the driver writes the new ``BENCH_r{N}.json``.
"""

from __future__ import annotations

import glob
import json
import re
import statistics
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "tools" / "bench_history_band.json"


def _round_of(path: str) -> int:
    return int(re.search(r"r(\d+)", Path(path).name).group(1))


def collect_sessions() -> dict[str, dict[str, float]]:
    """session label -> {query: seconds}.  Driver artifacts are labeled
    ``r{N}``; the builder calibration tree is ``detail`` (its min-of-3
    ``queries`` map, the same statistic as the driver's)."""
    sessions: dict[str, dict[str, float]] = {}
    for path in sorted(glob.glob(str(ROOT / "BENCH_r*.json")), key=_round_of):
        with open(path) as f:
            payload = json.load(f)
        parsed = payload.get("parsed")
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            sessions[f"r{_round_of(path):02d}"] = {
                str(k): float(v) for k, v in parsed["queries"].items()
            }
    detail = ROOT / "BENCH_DETAIL.json"
    if detail.exists():
        with open(detail) as f:
            payload = json.load(f)
        if isinstance(payload.get("queries"), dict):
            sessions["detail"] = {
                str(k): float(v) for k, v in payload["queries"].items()
            }
    return sessions


def build_band() -> dict:
    sessions = collect_sessions()
    names: set[str] = set()
    for qmap in sessions.values():
        names |= set(qmap)
    band: dict[str, dict] = {}
    for name in sorted(names):
        obs = {
            label: qmap[name]
            for label, qmap in sessions.items()
            if name in qmap
        }
        vals = list(obs.values())
        band[name] = {
            "sessions": obs,
            "n": len(vals),
            "min": round(min(vals), 3),
            "median": round(statistics.median(vals), 3),
            "max": round(max(vals), 3),
        }
    return {
        "note": (
            "Per-query cross-session bench spread (min-of-3 seconds at"
            " sf0.1) across every committed driver artifact plus the"
            " latest builder calibration. Descriptive history for the"
            " SCALE.md noise rule's 'exceeds the band' clause — a"
            " cross-round delta INSIDE [min, max] with an unchanged"
            " Exchange ledger needs no investigation (the"
            " dedup_jaccard_pairs r11 adjudication, generalized)."
        ),
        "sessions_included": sorted(collect_sessions()),
        "queries": band,
    }


def main() -> None:
    fresh = build_band()
    if "--check" in sys.argv:
        if not OUT.exists():
            sys.exit("bench_history_band.json missing — run tools/bench_band.py")
        with open(OUT) as f:
            committed = json.load(f)
        if committed != fresh:
            sys.exit(
                "bench_history_band.json is stale — a new BENCH artifact"
                " landed; regenerate with: python tools/bench_band.py"
            )
        print(f"-- band current ({len(fresh['queries'])} queries,"
              f" {len(fresh['sessions_included'])} sessions)")
        return
    with open(OUT, "w") as f:
        json.dump(fresh, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT} ({len(fresh['queries'])} queries,"
          f" {len(fresh['sessions_included'])} sessions)")


if __name__ == "__main__":
    main()
