#!/usr/bin/env python
"""Witness-age ledger: which driver CORRECTNESS round last proved each query.

    python tools/witness_age.py [--window 50] [--changed name1,name2] [--emit-window]

Reads every ``CORRECTNESS_r*.json`` in the repo root plus the live registry
and prints:

  1. the witness-age histogram (how many queries were last driver-witnessed
     in each round, plus never-witnessed),
  2. any query whose LATEST witness is not green (should always be none),
  3. the proposed next driver window, priority order:
       never-witnessed  >  impl-changed (from --changed)  >  oldest witness,
     ties broken by registry order so the proposal is deterministic.

``--emit-window`` prints the proposal as a ready-to-paste Python list for
``suite/__init__.py::_DRIVER_WINDOW``.  The hand-maintained queue comment
there drifted by round 5 (VERDICT r5 #3); this tool is now the source of
truth — paste its output, don't hand-edit the list.

The driver checks only the first ``--window`` (default 50) registry entries
per round, so at 200+ queries the steady-state age is ~4 rounds; the
histogram makes that visible and the proposal keeps it mechanical.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_witnesses() -> dict[str, tuple[int, bool]]:
    """name -> (latest round witnessed, green at that witness)."""
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, green)
    return latest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument(
        "--changed",
        default="",
        help="comma-separated query names whose implementation changed this "
        "round (they pre-empt stale re-witnesses; keep the list honest)",
    )
    ap.add_argument("--emit-window", action="store_true")
    args = ap.parse_args()
    changed = [c.strip() for c in args.changed.split(",") if c.strip()]

    from oem_gateway_spark.suite import REGISTRY

    names = list(REGISTRY)
    witnesses = load_witnesses()
    stale_unknown = sorted(set(witnesses) - set(names))

    never = [n for n in names if n not in witnesses]
    by_round: dict[int, list[str]] = {}
    not_green: list[str] = []
    for n in names:
        if n in witnesses:
            rnd, green = witnesses[n]
            by_round.setdefault(rnd, []).append(n)
            if not green:
                not_green.append(n)

    print(f"registry: {len(names)} queries; witnessed: {len(names) - len(never)}")
    print("witness-age histogram (latest round -> count):")
    for rnd in sorted(by_round, reverse=True):
        print(f"  r{rnd}: {len(by_round[rnd])}")
    if never:
        print(f"  never: {len(never)}  ({', '.join(never)})")
    if not_green:
        print(f"RED AT LATEST WITNESS: {not_green}")
    if stale_unknown:
        print(f"witnessed-but-unregistered (renamed/removed?): {stale_unknown}")

    # Proposal: never-witnessed > impl-changed > oldest witness; registry
    # order breaks ties.  Changed names that are also never-witnessed stay
    # in the never tier (no double count).
    reg_pos = {n: i for i, n in enumerate(names)}
    # Sort by registry position, not CLI order: --changed a,b and
    # --changed b,a must emit the same window (the committed list is a
    # byte-identical paste of this output — review r6).
    changed_known = sorted(
        (n for n in changed if n in reg_pos and n not in never),
        key=reg_pos.__getitem__,
    )
    unknown_changed = [n for n in changed if n not in reg_pos]
    if unknown_changed:
        print(f"WARNING --changed names not in registry: {unknown_changed}")
    rest = [n for n in names if n not in never and n not in changed_known]
    rest.sort(key=lambda n: (witnesses[n][0], reg_pos[n]))
    proposal = (never + changed_known + rest)[: args.window]

    print(f"\nproposed next window (first {args.window}):")
    if args.emit_window:
        tiers = {n: "never witnessed" for n in never}
        tiers.update({n: "impl changed this round" for n in changed_known})
        print("_DRIVER_WINDOW = [")
        for n in proposal:
            tag = tiers[n] if n in tiers else f"last witness r{witnesses[n][0]}"
            print(f'    "{n}",  # {tag}')
        print("]")
    else:
        for n in proposal:
            tag = "never" if n in never else (
                "changed" if n in changed_known else f"r{witnesses[n][0]}"
            )
            print(f"  {n}  [{tag}]")


if __name__ == "__main__":
    main()
