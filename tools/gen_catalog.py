"""Regenerate CATALOG.md from the live query registry.

Usage:  python tools/gen_catalog.py          # rewrites CATALOG.md in place

Keeps the existing hand-edited header — everything up to and including
the `| # | entry ...` table-header line (it documents the gate-window
rotation state; update it by hand when rotating _PRIORITY) — then one
row per registry entry: position, name, oracle/rows-only, and the
docstring flattened to 152 chars.
"""
from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_monotasks_spark.queries import ORACLE_REGISTRY, QUERY_REGISTRY  # noqa: E402

def summary(fn) -> str:
    flat = re.sub(r"\s+", " ", (fn.__doc__ or "").strip())
    return flat[:152] + "..." if len(flat) > 152 else flat


def main() -> None:
    path = os.path.join(REPO, "CATALOG.md")
    header: list[str] = []
    with open(path) as f:
        for line in f:
            header.append(line)
            if line.startswith("| # | entry"):
                break
        else:
            raise RuntimeError("CATALOG.md table-header line not found")
    rows = [
        f"| {i} | `{name}` | "
        f"{'oracle' if name in ORACLE_REGISTRY else 'rows-only'} | {summary(fn)} |\n"
        for i, (name, fn) in enumerate(QUERY_REGISTRY.items(), 1)
    ]
    with open(path, "w") as f:
        f.writelines(header)
        f.writelines(rows)
    print(f"wrote {len(rows)} rows to CATALOG.md")


if __name__ == "__main__":
    main()
