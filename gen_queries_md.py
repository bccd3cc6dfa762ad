#!/usr/bin/env python
"""Regenerate QUERIES.md from the registry docstrings (run per round)."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

HEADER = """# QUERIES — operator registry catalog

Auto-generated from `crawler_spark/queries*.py` docstrings (via
`python gen_queries_md.py`). Every entry is a `(Spark DataFrame
program, DuckDB oracle SQL)` pair unless marked *rows-only* (not
SQL-expressible). The driver compares both sides at sf0.01 (row count
+ schema + order-insensitive value hash).

| query | oracle | summary |
|---|---|---|
"""


def summary(doc: str | None, limit: int = 220) -> str:
    if not doc:
        return ""
    s = re.sub(r"\s+", " ", doc).strip().replace("|", "\\|")
    return s if len(s) <= limit else s[: limit - 3].rstrip() + "..."


def main() -> None:
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    rows = []
    for name in sorted(qs):
        kind = "yes" if name in oracles else "rows-only"
        rows.append(f"| `{name}` | {kind} | {summary(qs[name].__doc__)} |")
    with open("QUERIES.md", "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n")
    print(f"QUERIES.md: {len(rows)} queries ({len(oracles)} oracle-checked)")


if __name__ == "__main__":
    main()
