"""Regenerate CATALOG.md (and README.md's counts) from the live registry.

Usage:  python tools/gen_catalog.py          # rewrites CATALOG.md in place
        python tools/gen_catalog.py --readme # also sync README's entry/
                                             # oracle/rows-only/test counts
                                             # (runs pytest --collect-only
                                             # for the test count)

Keeps the existing hand-edited CATALOG header — everything up to and
including the `| # | entry ...` table-header line (it documents the
gate-window rotation state; update it by hand when rotating _PRIORITY)
— then one row per registry entry: position, name, oracle/rows-only,
and the docstring flattened to 152 chars.  The README sync exists
because three consecutive rounds hand-drifted the counts; the numbers
are now only ever written by this tool (tests/test_api_sources.py
guards the registry-derived ones)."""
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


def count_tests() -> int:
    """Collected test count via pytest itself — the number README cites."""
    import subprocess

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    ).stdout
    m = re.search(r"(\d+) tests collected", out)
    if not m:
        raise RuntimeError(f"could not parse collected count from: {out[-200:]}")
    return int(m.group(1))


def sync_readme(n_tests: int | None = None) -> None:
    path = os.path.join(REPO, "README.md")
    s = open(path).read()
    n_entries = len(QUERY_REGISTRY)
    n_oracles = len(ORACLE_REGISTRY)
    n_rows_only = n_entries - n_oracles
    s = re.sub(r"\(\d+ in the catalog", f"({n_entries} in the catalog", s)
    s = re.sub(
        r"\(\d+ oracles — the \d+ rows-only entries",
        f"({n_oracles} oracles — the {n_rows_only} rows-only entries",
        s,
    )
    if n_tests is not None:
        s = re.sub(
            r"pytest coverage \(\d+ tests,",
            f"pytest coverage ({n_tests} tests,",
            s,
        )
    open(path, "w").write(s)
    print(
        f"README synced: {n_entries} entries / {n_oracles} oracles / "
        f"{n_rows_only} rows-only"
        + (f" / {n_tests} tests" if n_tests is not None else "")
    )


if __name__ == "__main__":
    main()
    if "--readme" in sys.argv:
        sync_readme(count_tests())
