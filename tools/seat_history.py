"""Driver-seat accounting: which registry queries have ever held one of
the 50 CORRECTNESS sample seats, and which are still waiting.

The driver samples the first 50 ``queries()`` entries each round
(recorded in CORRECTNESS_r<N>.json). The r9 verdict flagged the
never-sampled backlog as a certification residual; the rotation policy
since r10 is: green seats rotate out (their certification is on
record), never-seated queries rotate in, new queries seat immediately.
This tool regenerates the backlog so each round's rotation is a
mechanical edit of ``registry/__init__.py::PREFIX_ORDER``.

Usage: python tools/seat_history.py [--verbose]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def seat_rounds() -> dict[str, list[int]]:
    seated: dict[str, list[int]] = {}
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for q in json.load(open(f)):
            seated.setdefault(q, []).append(rnd)
    return seated


def main(verbose: bool = False) -> None:
    import __spark_entry__ as entry

    names = list(entry.queries())
    seated = seat_rounds()
    prefix = names[:50]
    pending = [q for q in prefix if q not in seated]  # seated when driver runs
    backlog = [q for q in names if q not in seated and q not in set(prefix)]
    print(f"registry: {len(names)} queries")
    print(f"ever seated (recorded rounds): {len(seated)}")
    print(f"current prefix first-evers (seated at next driver run): {len(pending)}")
    print(f"backlog (never seated, not in current prefix): {len(backlog)}")
    for q in backlog:
        print(f"  {q}")
    if verbose:
        print("\nseat history:")
        for q in names:
            rounds = seated.get(q)
            mark = "*" if q in set(prefix) else " "
            print(f" {mark} {q}: {rounds or 'never'}")


if __name__ == "__main__":
    main(verbose="--verbose" in sys.argv)
