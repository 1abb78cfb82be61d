#!/usr/bin/env python
"""Staleness-driven sweep rotation (VERDICT r07 item 3).

With every registry entry driver-verified at least once, the driver's
50-slot sweep budget is best spent RE-verifying entries whose verdict
has gone stale: the source module that defines them changed in a round
AFTER the round that graded them (e.g. the 22 flagship queries' verdicts
are r01-r03 but queries/core.py changed in r06's broadcast-hint sweep).

This tool computes, for every registered query:

* its newest green driver verdict round (from CORRECTNESS_r*.json);
* whether its defining module has commits after that round's boundary
  (the driver's "round N: verdict/advice/correctness/bench" commit);

and writes the full ordering to
``cartodb_importer_spark/queries/_rotation.py`` as ``SWEEP_ORDER``:
stale entries first (oldest verdict first), then fresh entries (oldest
verdict first). ``__spark_entry__.queries()`` serves never-verified
entries ahead of this list, then follows it verbatim — so the sweep's
fixed budget always lands on the least-recently-trusted code.

Run after any round's source changes, before hand-off:

    python tools/rotation.py
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

OUT = os.path.join(HERE, "cartodb_importer_spark", "queries", "_rotation.py")


def parse_hunk_ranges(diff_text: str) -> list[tuple[int, int]]:
    """New-file line ranges from a ``git diff -U0`` text.

    A pure-deletion hunk (+c,0) still touches the seam between lines, so
    it widens to one line — adjacent query spans must notice a deleted
    block between them."""
    ranges: list[tuple[int, int]] = []
    for m in re.finditer(
        r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", diff_text, re.M
    ):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        ranges.append((start, start + max(count, 1) - 1))
    return ranges


def span_intersects(span: tuple[int, int], ranges: list[tuple[int, int]]) -> bool:
    lo, hi = span
    return any(h_lo <= hi and lo <= h_hi for h_lo, h_hi in ranges)


def verdict_rounds() -> dict[str, int]:
    """Newest green driver-verdict round per query name."""
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            results = json.load(open(path))
        except Exception:
            continue
        for name, r in results.items():
            if not isinstance(r, dict):
                continue
            green = (
                r.get("rows_match")
                and r.get("schema_match") is not False
                and r.get("hash_match") is not False
                and not r.get("err")
            ) or (
                # rows-only-by-design: a sweep visit IS its verdict
                r.get("err") == "no_oracle"
                and r.get("spark_rows") is not None
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def round_markers() -> dict[int, str]:
    """Commit hash of each driver round boundary ("round N: verdict...")."""
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=HERE,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    markers: dict[int, str] = {}
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            markers.setdefault(int(m.group(1)), sha)  # newest first wins
    return markers


def main() -> int:
    from cartodb_importer_spark.queries import QUERIES

    verdicts = verdict_rounds()
    markers = round_markers()

    qfile: dict[str, str] = {}
    qspan: dict[str, tuple[int, int]] = {}
    for name, fn in QUERIES.items():
        try:
            qfile[name] = os.path.relpath(inspect.getsourcefile(fn), HERE)
            lines, start = inspect.getsourcelines(fn)
            qspan[name] = (start, start + len(lines) - 1)
        except (TypeError, OSError):
            qfile[name] = ""
            qspan[name] = (0, 10**9)

    hunk_cache: dict[tuple[str, int], list[tuple[int, int]] | None] = {}

    def changed_hunks(path: str, rnd: int):
        """New-file line ranges `path` changed after round `rnd`'s boundary
        commit; None = unparseable/whole-file (treat everything stale).

        Line-range granularity (r12): the old whole-file check re-staled a
        5 000-line family over a one-function edit, flooding the 50-slot
        sweep budget with fresh verdicts while the genuinely oldest tail
        aged (VERDICT r11 finding 1). A query goes stale only when a
        post-grading hunk INTERSECTS its current source span (decorator +
        oracle literal included via getsourcelines). Limitation, accepted
        and bounded: a change to a shared helper OUTSIDE every query span
        (e.g. a _*_oracle generator) no longer stales its callers — the
        builder's full-registry three-SF local replica still value-checks
        every entry every round, so the sweep order is a budget optimizer,
        never the only net."""
        key = (path, rnd)
        if key not in hunk_cache:
            marker = markers.get(rnd)
            if not path or marker is None:
                hunk_cache[key] = []
            else:
                # marker vs WORKING TREE (not ..HEAD): the regen runs at
                # round end, possibly with the final commit still pending
                diff = subprocess.run(
                    ["git", "diff", "-U0", marker, "--", path],
                    cwd=HERE,
                    capture_output=True,
                    text=True,
                )
                if diff.returncode != 0:
                    hunk_cache[key] = None
                else:
                    hunk_cache[key] = parse_hunk_ranges(diff.stdout)
        return hunk_cache[key]

    def changed_since(name: str, rnd: int) -> bool:
        """True if `name`'s defining source span changed after round `rnd`."""
        hunks = changed_hunks(qfile[name], rnd)
        if hunks is None:
            return True
        return span_intersects(qspan[name], hunks)

    registry_pos = {n: i for i, n in enumerate(QUERIES)}
    verified = [n for n in QUERIES if n in verdicts]
    stale = [n for n in verified if changed_since(n, verdicts[n])]
    fresh = [n for n in verified if n not in set(stale)]
    # oracle-less queries can only ever re-earn a rows-only verdict — a
    # front-50 slot spent there upgrades nothing, so rank them after
    # every oracled entry within each block (found by the r10 preflight:
    # llm_embedding_pca burned a slot at position ~40)
    from __spark_entry__ import ORACLES

    key = lambda n: (n not in ORACLES, verdicts[n], registry_pos[n])  # noqa: E731
    order = sorted(stale, key=key) + sorted(fresh, key=key)

    lines = [
        '"""GENERATED by tools/rotation.py — do not edit by hand.',
        "",
        "Staleness-ranked sweep ordering for already-driver-verified",
        "queries: entries whose defining module changed AFTER the round",
        "that graded them come first (oldest verdict first), then fresh",
        "entries oldest-verdict-first. Regenerate after each round's",
        "source changes: python tools/rotation.py",
        '"""',
        "",
        "SWEEP_ORDER: tuple[str, ...] = (",
    ]
    for n in order:
        tag = "stale" if n in set(stale) else "fresh"
        lines.append(f'    "{n}",  # r{verdicts[n]:02d} {tag}')
    lines.append(")")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        f"wrote {OUT}: {len(order)} verified "
        f"({len(stale)} stale, {len(fresh)} fresh); "
        f"{len(QUERIES) - len(order)} never-verified lead the sweep"
    )
    for n in order[:15]:
        print(f"  {n} (r{verdicts[n]:02d}, {qfile[n]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
