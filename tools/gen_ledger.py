"""Regenerate __spark_entry__._LAST_DRIVER_CHECK from CORRECTNESS_r0*.json.

The ledger maps each registered query to the latest round whose committed
CORRECTNESS_r0N.json holds a fully-green row (rows+schema+hash all true).
Run after each round with ``--apply`` to rewrite the block in
__spark_entry__.py in place (then clear _CHANGED_THIS_ROUND by hand if the
round changed registered behavior); without ``--apply`` it prints the block
for manual pasting. tests/test_entry_contract.py pins that the committed
ledger matches this derivation exactly.
"""
from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _correctness_files() -> list[str]:
    """COMMITTED (git-tracked) CORRECTNESS files only. The driver
    writes CORRECTNESS_r{N}.json AFTER the builder's session closes, so
    a plain disk glob sees a file the committed ledger cannot possibly
    include yet — that made the ratchet test red at every round
    boundary for four straight rounds (r7-r10 verdicts, Next #1 each
    time) while catching nothing real. Deriving from git-tracked files
    keeps the ratchet honest (a tracked-but-unfolded file still fails)
    without the designed-in boundary failure. Falls back to the glob
    outside a working git checkout."""
    import subprocess

    try:
        tracked = subprocess.run(
            ["git", "-C", REPO, "ls-files", "CORRECTNESS_r*.json"],
            capture_output=True, text=True, check=True, timeout=30,
        ).stdout.split()
        if tracked:
            return sorted(os.path.join(REPO, f) for f in tracked)
    except Exception:  # noqa: BLE001 - no git / not a checkout
        pass
    return sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))


def green_rows() -> dict[str, int]:
    """name -> max round with a fully-green committed driver row."""
    ledger: dict[str, int] = {}
    for path in _correctness_files():
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                ledger[name] = max(ledger.get(name, 0), rnd)
    return ledger


def render(ledger: dict[str, int]) -> str:
    by_round: dict[int, list[str]] = {}
    for name, rnd in ledger.items():
        by_round.setdefault(rnd, []).append(name)
    out = ["_LAST_DRIVER_CHECK = {"]
    for rnd in sorted(by_round):
        out.append(f"    # --- last green driver row: CORRECTNESS_r{rnd:02d}.json ---")
        line = "   "
        for name in sorted(by_round[rnd]):
            frag = f' "{name}": {rnd},'
            if len(line) + len(frag) > 76:
                out.append(line)
                line = "   "
            line += frag
        if line.strip():
            out.append(line)
    out.append("}")
    return "\n".join(out)


def apply(block: str, path: str | None = None) -> None:
    """Rewrite the _LAST_DRIVER_CHECK block in __spark_entry__.py in
    place. ``path`` defaults to the repo's entry file; the smoke test
    passes a temp copy so it exercises THIS function, not a
    re-implementation (review catch)."""
    if path is None:
        path = os.path.join(REPO, "__spark_entry__.py")
    with open(path) as f:
        src = f.read()
    start = src.index("_LAST_DRIVER_CHECK = {")
    # end points just past the closing '}'; src[end:] keeps the
    # original trailing newline, so the block is written WITHOUT an
    # extra one (appending '\n' here grew a blank line per round —
    # review catch)
    end = src.index("\n}", start) + 2
    with open(path, "w") as f:
        f.write(src[:start] + block + src[end:])


if __name__ == "__main__":
    import sys

    block = render(green_rows())
    if "--apply" in sys.argv:
        apply(block)
        print("applied to __spark_entry__.py")
    else:
        print(block)
