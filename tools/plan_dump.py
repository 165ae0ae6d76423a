"""Dump ``explain("formatted")`` for catalog queries to files.

Usage: python tools/plan_dump.py <out_dir> <query> [<query> ...]
Writes <out_dir>/<query>_<suffix>.txt where suffix comes from
$PLAN_DUMP_SUFFIX (default "after").

Used to produce the plans/r10/<query>_{before,after}.txt evidence files:
run once from a worktree at the round-start commit (suffix=before) and once
from HEAD (suffix=after).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_DUMP_SUFFIX", "after")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from platform_etl_drug_disease_spark.session import get_spark

    spark = get_spark(app_name="plan_dump")
    catalog = entrymod.queries()
    import contextlib
    import io

    for name in names:
        df = catalog[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
