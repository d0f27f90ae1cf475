#!/usr/bin/env python
"""Regenerate the auto-maintained blocks of COVERAGE.md from the registry
(verdict r06 item 4: the hand-written header said "453 queries" against a
472-key registry — counts must be generated, not typed).

Two marker-delimited blocks are rewritten in place; everything else in
COVERAGE.md (the hand-written §2 mapping prose) is left untouched:

- AUTO-COUNTS: the header sentence with len(queries()) and the oracle count.
- AUTO-KEYS: the full sorted key inventory, one fenced block, with a
  rows-only marker for the (currently zero) keys lacking an oracle.

tests/test_properties.py pins that the committed file matches what this
script would write, so any registry growth without a regen fails CI.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN_COUNTS = "<!-- BEGIN AUTO-COUNTS (tools/gen_coverage.py) -->"
END_COUNTS = "<!-- END AUTO-COUNTS -->"
BEGIN_KEYS = "<!-- BEGIN AUTO-KEYS (tools/gen_coverage.py) -->"
END_KEYS = "<!-- END AUTO-KEYS -->"


def render_counts() -> str:
    from c2_duckdb_runner_spark import registry

    qs = registry.queries()
    oracles = registry.oracle_sql()
    n, n_o = len(qs), len(oracles)
    return (
        f"{BEGIN_COUNTS}\n"
        f"**{n} registered queries, {n_o} with DuckDB oracles"
        f"{'' if n == n_o else f' ({n - n_o} rows-only)'}** — counts and the\n"
        f"inventory below are generated from `registry.queries()` by\n"
        f"`tools/gen_coverage.py`; `tests/test_properties.py` pins them.\n"
        f"{END_COUNTS}"
    )


def render_keys() -> str:
    from c2_duckdb_runner_spark import registry

    qs = registry.queries()
    oracles = registry.oracle_sql()
    lines = [
        k if k in oracles else f"{k}  [rows-only]" for k in sorted(qs)
    ]
    body = "\n".join(lines)
    return (
        f"{BEGIN_KEYS}\n"
        f"## Registry inventory ({len(qs)} keys, generated)\n\n"
        f"```\n{body}\n```\n"
        f"{END_KEYS}"
    )


def rewrite(text: str) -> str:
    counts = render_counts()
    keys = render_keys()
    for begin, end, block in (
        (BEGIN_COUNTS, END_COUNTS, counts),
        (BEGIN_KEYS, END_KEYS, keys),
    ):
        pat = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.S)
        if pat.search(text):
            text = pat.sub(lambda _m: block, text)
        else:
            text = text.rstrip("\n") + "\n\n" + block + "\n"
    return text


def main() -> None:
    path = os.path.join(REPO, "COVERAGE.md")
    with open(path) as fh:
        text = fh.read()
    new = rewrite(text)
    if "--check" in sys.argv:
        if new != text:
            sys.exit("COVERAGE.md is stale — run tools/gen_coverage.py")
        print("COVERAGE.md is current")
        return
    with open(path, "w") as fh:
        fh.write(new)
    print(f"rewrote {path}")


if __name__ == "__main__":
    main()
