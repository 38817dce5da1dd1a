#!/usr/bin/env python3
"""Regenerate SURVEY.md's canonical operator inventory from SparkEntry itself.

The binding SURVEY §2 inventory grew across 8 rounds of widening tables and
became drift-prone (four generations of superseded totals). This script makes
it mechanically un-driftable: the single source of truth is
`SparkEntry.queries` — every entry is resolved to its `def` site
(file:line) and its verification tier (duckdb-oracle if the name is in
`SparkEntry.oracleSql`, scalatest otherwise), and the table between the
BEGIN/END markers in SURVEY.md is rewritten in place.

Usage:
  python3 tools/gen_inventory.py          # rewrite SURVEY.md in place
  python3 tools/gen_inventory.py --check  # exit 1 if SURVEY.md is stale

ContractSpec additionally asserts the table's keys equal
SparkEntry.queries' keys at test time, so a widening that skips this script
fails the build.
"""
import re
import sys
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
ENTRY = ROOT / "src/main/scala/graft/SparkEntry.scala"
SRC = ROOT / "src/main/scala"
SURVEY = ROOT / "SURVEY.md"
BEGIN = "<!-- BEGIN GENERATED INVENTORY (tools/gen_inventory.py) -->"
END = "<!-- END GENERATED INVENTORY -->"


def parse_entry():
    text = ENTRY.read_text()
    q_re = re.compile(r'"([a-z0-9_]+)"\s*->\s*\((\w+)\.(\w+) _\)')
    queries = {m.group(1): (m.group(2), m.group(3))
               for m in q_re.finditer(text)}
    o_re = re.compile(r'"([a-z0-9_]+)"\s*->\s*Oracle\.')
    oracles = {m.group(1) for m in o_re.finditer(text)}
    return queries, oracles


def def_sites():
    sites = {}  # (object, method) -> "file:line"
    for path in sorted(SRC.rglob("*.scala")):
        obj = None
        for i, line in enumerate(path.read_text().splitlines(), 1):
            # top-level containers only (no leading whitespace): a
            # nested helper object must not shadow the enclosing
            # container, and a top-level class/trait (e.g. a stateful
            # processor) must RESET the tracker — otherwise its method
            # defs would be attributed to the preceding object and
            # could claim an (object, method) key with a wrong line
            m = re.match(
                r"(?:private\[\w+\]\s+)?(?:case\s+|abstract\s+)?"
                r"(object|class|trait)\s+(\w+)", line)
            if m:
                obj = m.group(2) if m.group(1) == "object" else None
            d = re.match(r"\s*(?:private\[\w+\]\s+)?def\s+(\w+)\b", line)
            if d and obj:
                sites.setdefault((obj, d.group(1)),
                                 f"{path.relative_to(ROOT)}:{i}")
    return sites


def render():
    queries, oracles = parse_entry()
    sites = def_sites()
    n_oracle = sum(1 for q in queries if q in oracles)
    lines = [
        BEGIN,
        f"Generated from SparkEntry.queries — {len(queries)} operators, "
        f"{n_oracle} duckdb-oracle / {len(queries) - n_oracle} scalatest-"
        "verified (the no-oracle set is pinned in ContractSpec with a "
        "reason per entry). Regenerate with `python3 tools/gen_inventory.py`.",
        "",
        "| operator | verification | impl (src/main/scala/) |",
        "|---|---|---|",
    ]
    missing = []
    for name in sorted(queries):
        obj, meth = queries[name]
        site = sites.get((obj, meth))
        if site is None:
            missing.append(f"{name} -> {obj}.{meth}")
            site = f"{obj}.{meth} (UNRESOLVED)"
        tier = "duckdb-oracle" if name in oracles else "scalatest"
        lines.append(f"| `{name}` | {tier} | {site} |")
    lines.append(END)
    if missing:
        sys.exit("could not resolve def sites: " + ", ".join(missing))
    return "\n".join(lines)


def main():
    table = render()
    text = SURVEY.read_text()
    if BEGIN not in text or END not in text:
        sys.exit(f"SURVEY.md is missing the {BEGIN} / {END} markers")
    new = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), table, text,
                 flags=re.S)
    if "--check" in sys.argv:
        if new != text:
            sys.exit("SURVEY.md inventory is stale: run tools/gen_inventory.py")
        print("inventory up to date")
        return
    SURVEY.write_text(new)
    print(f"rewrote inventory ({len(render().splitlines()) - 6} operators)")


if __name__ == "__main__":
    main()
