"""Merge per-family selfcheck artifacts into one gate file.

The sf10 gate runs each family in its OWN process (a DuckDB
out-of-memory abort in one family's oracle must not take down the
others — the first combined run died exactly that way), so the
per-family JSONs are merged here into the single SELFCHECK_SF10.json
the round records.

Usage: python tools/merge_selfchecks.py OUT.json IN1.json IN2.json ...
Notes from each input are concatenated; n_queries/n_failures recomputed.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    out_path, in_paths = sys.argv[1], sys.argv[2:]
    merged: dict = {"schema_version": 2, "sf_dir": None, "notes": [], "queries": {}}
    for p in in_paths:
        with open(p) as f:
            part = json.load(f)
        merged["sf_dir"] = merged["sf_dir"] or part.get("sf_dir")
        if part.get("note"):
            merged["notes"].append(part["note"])
        # inputs may themselves be merged artifacts carrying a notes list
        merged["notes"].extend(part.get("notes") or [])
        for k in ("money_guard_decimal_engaged", "money_guard_forced"):
            if k in part:
                merged[k] = part[k]
        overlap = merged["queries"].keys() & part["queries"].keys()
        if overlap:
            # later inputs override earlier ones (re-runs of a query
            # with an adjusted oracle budget supersede the first try)
            print(f"{p}: overriding earlier verdicts for {sorted(overlap)}")
        merged["queries"].update(part["queries"])
    merged["n_queries"] = len(merged["queries"])
    merged["n_failures"] = sum(
        1
        for v in merged["queries"].values()
        if not v.get("skipped")
        and (v.get("err") or v.get("hash_match") is False)
    )
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(
        f"wrote {out_path}: {merged['n_queries']} queries, "
        f"{merged['n_failures']} failures"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
