"""Summarize a `tools/check_oracles.py` sweep log into a committed
markdown artifact (SWEEP_sf001.md): one row per registry entry with its
verified row count, plus the sweep's verdict line. Usage:

    python tools/check_oracles.py /root/testdata/sf0.01 2>&1 | tee sweep.log
    python tools/summarize_sweep.py sweep.log SWEEP_sf001.md sf0.01
"""

from __future__ import annotations

import re
import sys


def main() -> None:
    log_path, out_path, sf_label = sys.argv[1], sys.argv[2], sys.argv[3]
    entries: dict[str, str] = {}
    fails: list[str] = []
    verdict = None
    pat = re.compile(r"^(PASS|FAIL|OK\?) +(\S+): (.*)$")
    with open(log_path, errors="replace") as fh:
        for line in fh:
            m = pat.match(line.strip())
            if m:
                status, name, detail = m.groups()
                entries[name] = detail if status != "OK?" else f"{detail}"
                if status == "FAIL":
                    fails.append(name)
            elif line.strip() == "ALL PASS" or line.strip().endswith("FAILURES"):
                verdict = line.strip()
    zero = sorted(n for n, d in entries.items() if d.startswith("0 rows"))
    with open(out_path, "w") as out:
        out.write(
            f"# Full-registry oracle sweep @ {sf_label}\n\n"
            f"`python tools/check_oracles.py /root/testdata/{sf_label}` — every\n"
            "`queries()` entry run on Spark and compared against its\n"
            "`oracle_sql()` DuckDB twin (row count, column names,\n"
            "order-insensitive dtype-strict values). Declared rows-only\n"
            "entries report row counts only (value-pinned by pytest).\n\n"
            f"**Result: {len(entries)} entries, "
            f"{len(entries) - len(fails)} pass, {len(fails)} fail"
            f"{' — ' + verdict if verdict else ''}**\n\n"
        )
        if fails:
            out.write("FAILURES: " + ", ".join(sorted(fails)) + "\n\n")
        if zero:
            out.write(
                "Zero-row entries at this scale: "
                + ", ".join(zero)
                + " (verify these at a larger sf).\n\n"
            )
        out.write("| entry | result |\n|---|---|\n")
        for name in sorted(entries):
            out.write(f"| {name} | {entries[name]} |\n")
    print(f"wrote {out_path}: {len(entries)} entries, {len(fails)} failures")


if __name__ == "__main__":
    main()
