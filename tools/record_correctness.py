"""Run tests/oracle_check.py over an sf dir and fold its PASS/FAIL
lines into a CORRECTNESS-style JSON record (the same row shape the
driver writes), so the scale-ladder evidence files are assembled by a
tool instead of by hand.

Usage:
  python tools/record_correctness.py OUT.json [--digest] SF_DIR [query ...]
        [--note "..."] [--merge]

--merge updates OUT.json in place (existing rows for other queries are
kept, '_note' is preserved unless --note is given); without it the file
is rewritten with only this run's rows.  Rows record rows_match /
schema_match / hash_match (all True on a PASS line), spark_rows,
seconds, and err (the first FAIL detail line, if any).
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

PASS_RE = re.compile(
    r"^PASS (\S+) \((\d+) rows(?:, digest (\S+))?, ([0-9.]+)s\)"
)
FAIL_RE = re.compile(r"^FAIL (\S+)(?: \((\d+) rows, ([0-9.]+)s\))?")
SKIP_RE = re.compile(r"^SKIP (\S+): no oracle")


def main() -> int:
    argv = list(sys.argv[1:])
    note = None
    if "--note" in argv:
        i = argv.index("--note")
        note = argv[i + 1]
        del argv[i : i + 2]
    merge = "--merge" in argv
    if merge:
        argv.remove("--merge")
    out_path = Path(argv[0])
    check_args = argv[1:]

    proc = subprocess.Popen(
        [sys.executable, "tests/oracle_check.py", *check_args],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        cwd="/root/repo",
    )
    rows: dict[str, dict] = {}
    last_fail: str | None = None
    assert proc.stdout is not None
    for raw in proc.stdout:
        line = raw.rstrip("\n").split("\r")[-1]  # progress-bar fragments
        print(line)
        m = PASS_RE.match(line)
        if m:
            name, n, digest, sec = m.groups()
            rows[name] = {
                "rows_match": True,
                "schema_match": True,
                "hash_match": True,
                "spark_rows": int(n),
                "oracle_rows": int(n),
                "seconds": float(sec),
                "err": None,
            }
            if digest:
                rows[name]["digest"] = digest
            last_fail = None
            continue
        m = FAIL_RE.match(line)
        if m:
            name = m.group(1).rstrip(":")
            rows[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": int(m.group(2)) if m.group(2) else None,
                "oracle_rows": None,
                "seconds": float(m.group(3)) if m.group(3) else None,
                "err": line,
            }
            last_fail = name
            continue
        if last_fail and line.startswith("     "):
            r = rows[last_fail]
            r["err"] = (r["err"] or "") + " | " + line.strip()
    rc = proc.wait()

    doc: dict = {}
    if merge and out_path.exists():
        doc = json.loads(out_path.read_text())
    if note is not None:
        doc["_note"] = note
    elif "_note" not in doc:
        doc["_note"] = (
            f"tests/oracle_check.py {' '.join(check_args)} — assembled by "
            "tools/record_correctness.py"
        )
    doc.update(rows)
    out_path.write_text(json.dumps(doc, indent=1) + "\n")
    n_fail = sum(1 for r in rows.values() if not r["hash_match"])
    print(f"wrote {out_path}: {len(rows)} rows, {n_fail} failures (rc={rc})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
