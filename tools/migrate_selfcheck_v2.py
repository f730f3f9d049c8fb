"""One-shot migration of v1 SELFCHECK artifacts to schema v2.

Schema v2 (r9 verdict #7) requires every per-query row to carry
machine-readable ``{verdict, reason, rows}``. The v1 rows already
encode the verdict across ad-hoc fields (hash_match / rows_match /
skipped / oracle_infeasible / except_all_diff_rows / err); this tool
normalizes them in place WITHOUT re-running anything — the underlying
evidence is unchanged, only its labeling is made uniform. Rows written
by the round-10 selfcheck are already v2 and pass through untouched.

Derivation rules (exactly the ones tools/selfcheck.py applies live):

- skipped: True                      -> skipped (reason preserved)
- err present                        -> fail
- hash_match: True                   -> pass (hash compare path)
- except_all_diff_rows == 0          -> pass (big-result EXCEPT ALL path)
- oracle_infeasible / oracle: None   -> rows_only (reason recorded)
- anything else with compare fields  -> fail

Usage: python tools/migrate_selfcheck_v2.py SELFCHECK_SF10.json ...
"""

from __future__ import annotations

import json
import sys


def migrate_row(row: dict) -> dict:
    if not isinstance(row, dict) or "verdict" in row:
        return row
    out = dict(row)
    if row.get("skipped"):
        out["verdict"] = "skipped"
        out.setdefault("reason", None)
        out.setdefault("rows", None)
    elif "err" in row and row["err"]:
        out["verdict"] = "fail"
        out["reason"] = str(row["err"])[:200]
        out.setdefault("rows", row.get("spark_rows"))
    elif row.get("hash_match"):
        out["verdict"] = "pass"
        out["reason"] = (
            "rows + schema + order-insensitive value hash vs DuckDB oracle"
        )
        out["rows"] = row.get("spark_rows")
    elif row.get("except_all_diff_rows") == 0:
        out["verdict"] = "pass"
        out["reason"] = (
            "EXCEPT ALL empty both ways vs DuckDB oracle (big-result path)"
        )
        out["rows"] = row.get("spark_rows")
    elif "oracle_infeasible" in row:
        out["verdict"] = "rows_only"
        out["reason"] = (
            f"oracle infeasible at this scale: {str(row['oracle_infeasible'])[:160]}"
        )
        out["rows"] = row.get("spark_rows")
    elif row.get("oracle", "missing") is None:
        out["verdict"] = "rows_only"
        out["reason"] = "no oracle registered (non-SQL-expressible)"
        out["rows"] = row.get("spark_rows")
    else:
        out["verdict"] = "fail"
        out["reason"] = "mismatch: rows_match=%s schema_match=%s hash_match=%s" % (
            row.get("rows_match"),
            row.get("schema_match"),
            row.get("hash_match"),
        )
        out["rows"] = row.get("spark_rows")
    return out


def migrate(path: str) -> None:
    with open(path) as f:
        art = json.load(f)
    if art.get("schema_version", 1) >= 2:
        print(f"{path}: already v2")
        return
    art["queries"] = {k: migrate_row(v) for k, v in art.get("queries", {}).items()}
    art["schema_version"] = 2
    art["note"] = (art.get("note") or "") + (
        " | migrated to schema v2 by tools/migrate_selfcheck_v2.py "
        "(verdict labels derived from the recorded v1 fields; no re-run)"
    )
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    counts: dict[str, int] = {}
    for row in art["queries"].values():
        counts[row.get("verdict", "?")] = counts.get(row.get("verdict", "?"), 0) + 1
    print(f"{path}: migrated, verdicts={counts}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        migrate(p)
