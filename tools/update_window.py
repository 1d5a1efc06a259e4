"""Regenerate the _LAST_SIGNED table in plans/driver_queries.py from the
driver's CORRECTNESS_r*.json artifacts.

The driver signs only the first 50 registry entries; the window itself is
computed in driver_queries.py from this table (never-signed first, then
least-recently-signed). Run this once at the start of each round, after
the driver has written the previous round's artifact:

    python tools/update_window.py && python -c "import __spark_entry__"
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGET = os.path.join(REPO, "langtoolsosm_spark", "plans", "driver_queries.py")


def last_signed() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        for k, v in json.load(open(f)).items():
            if v.get("rows_match") and v.get("schema_match") and not v.get("err"):
                last[k] = max(rnd, last.get(k, 0))
    return last


def main() -> int:
    last = last_signed()
    src = open(TARGET).read()
    entries = "\n".join(
        f'    "{k}": {r},'
        for k, r in sorted(last.items(), key=lambda kv: (kv[1], kv[0]))
    )
    new_block = "_LAST_SIGNED = {\n" + entries + "\n}"
    out, n = re.subn(r"_LAST_SIGNED = \{.*?\n\}", new_block, src, flags=re.S)
    if n != 1:
        print(f"expected exactly one _LAST_SIGNED block, found {n}", file=sys.stderr)
        return 1
    if out != src:
        open(TARGET, "w").write(out)
        print(f"updated _LAST_SIGNED: {len(last)} signed queries")
    else:
        print(f"_LAST_SIGNED already current ({len(last)} signed queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
