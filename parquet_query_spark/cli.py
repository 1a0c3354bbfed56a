"""Workbench CLI/REPL — the reference app's shell semantics, terminal-first.

Maps the reference UI surface (SURVEY §2.A) onto a CLI:

* ``python -m parquet_query_spark <folder> [--table NAME]`` — import a folder
  (A1-A5) and start a REPL.
* Multi-statement buffers split on ``;`` exactly like the editor (A6);
  ``-c/--command`` runs one buffer non-interactively.
* Results render as the 200-row preview + true-count banner (A10, A14).
* ``\\export <file.csv> <sql>`` streams the full result to CSV (A13).
* Scripts persist to ``~/.parquet_query_spark/tabs.json`` — the localStorage
  tab store (A16) with the reference's three categories
  ``scripts|bookmarks|templates`` (``App.tsx:23-29``): ``\\save NAME
  [category]`` / ``\\open NAME`` / ``\\tabs [category]``; the six built-in
  template queries ship pre-seeded and open as script copies.
* ``\\example [FILE]`` — the reference's one-click example queries:
  bare = ``SELECT * FROM <table> LIMIT 50`` for the union view
  (``App.tsx:61-64``), with FILE = ``SELECT * FROM '<path>' LIMIT 100``.
"""

from __future__ import annotations

import argparse
import os
import sys

from parquet_query_spark.engine import Engine
from parquet_query_spark.workbench.tabs import (
    TabStore,
    file_example_sql,
    table_example_sql,
)

TABS_PATH = os.path.expanduser("~/.parquet_query_spark/tabs.json")


def render(res) -> str:
    widths = [
        max(len(c), *(len(r[i]) for r in res.rows)) if res.rows else len(c)
        for i, c in enumerate(res.columns)
    ]
    lines = [
        " | ".join(c.ljust(w) for c, w in zip(res.columns, widths)),
        "-+-".join("-" * w for w in widths),
    ]
    lines += [" | ".join(v.ljust(w) for v, w in zip(row, widths)) for row in res.rows]
    shown = len(res.rows)
    lines.append(f"({res.num_rows} rows{f', showing {shown}' if res.num_rows > shown else ''})")
    return "\n".join(lines)


def run_buffer(eng: Engine, buffer: str) -> None:
    for res in eng.run_script(buffer):
        print(render(res))


def repl(eng: Engine) -> None:
    tabs = TabStore(TABS_PATH)
    buffer: list[str] = []
    print(
        "parquet_query_spark — ';' runs, \\q quits, "
        "\\tabs \\save \\open \\example \\export"
    )
    while True:
        try:
            line = input("pq> " if not buffer else "  > ")
        except EOFError:
            break
        if line.strip() == "\\q":
            break
        if line.strip() == "\\tabs" or line.strip().startswith("\\tabs "):
            cat = line.strip()[5:].strip() or None
            try:
                for c, names in tabs.names(cat).items():
                    print(f"{c}:")
                    for name in names:
                        print(f"  {name}")
            except KeyError:
                print(f"no category '{cat}'")
            continue
        if line.strip().startswith("\\save "):
            parts = line.strip()[6:].split()
            name = parts[0] if parts else ""
            category = parts[1] if len(parts) > 1 else "scripts"
            try:
                tabs.save(name, "\n".join(buffer), category)
                print(f"saved '{name}' to {category}")
            except ValueError as exc:
                print(f"error: {exc}")
            continue
        if line.strip().startswith("\\open "):
            name = line.strip()[6:].strip()
            try:
                sql, category = tabs.open(name)
            except KeyError:
                print(f"no tab '{name}'")
            else:
                buffer = sql.splitlines()
                print(f"-- [{category}] {name}")
                print(sql)
            continue
        if line.strip() == "\\example" or line.strip().startswith("\\example "):
            arg = line.strip()[8:].strip()
            if arg:
                sql = file_example_sql(arg)
            elif getattr(eng, "table_name", None):
                sql = table_example_sql(eng.table_name)
            else:
                print("no union table (start with --table NAME) — "
                      "use \\example FILE for a per-file query")
                continue
            buffer = sql.splitlines()
            print(sql)
            continue
        if line.strip().startswith("\\export "):
            rest = line.strip()[8:]
            path, _, sql = rest.partition(" ")
            try:
                n = eng.export_csv(sql, path)
                print(f"exported {n} rows to {path}")
            except Exception as exc:  # noqa: BLE001 — REPL surfaces all errors
                print(f"error: {exc}")
            continue
        buffer.append(line)
        text = "\n".join(buffer)
        from parquet_query_spark.workbench.statements import split_statements

        if text.rstrip().endswith(";") and split_statements(text):
            try:
                run_buffer(eng, text)
            except Exception as exc:  # noqa: BLE001
                print(f"error: {exc}")
            buffer = []


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="parquet_query_spark")
    ap.add_argument("folder", nargs="?", help="data folder to import (A1-A5)")
    ap.add_argument("--table", help="union-view name over imported parquets (A5)")
    ap.add_argument("-c", "--command", help="run one SQL buffer and exit")
    args = ap.parse_args(argv)

    eng = (
        Engine.open(args.folder, table_name=args.table)
        if args.folder
        else Engine()
    )
    if args.command:
        run_buffer(eng, args.command)
        return 0
    repl(eng)
    return 0


if __name__ == "__main__":
    sys.exit(main())
