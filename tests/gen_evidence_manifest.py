"""Regenerate EVIDENCE.json — run ONLY when rotating CURATED_FIRST.

The manifest pins each registry query's (fn source + oracle) hash at the
moment the driver verification window was last rotated;
``tests/test_registry_order.py::test_changed_queries_hold_verification_slots``
fails when a query drifts from its pinned hash without holding a window
slot. Usage (both work — the script path-inserts its repo root):

    python -m tests.gen_evidence_manifest --round N
    python tests/gen_evidence_manifest.py --round N

``--round`` is REQUIRED: round-7 review found that omitting it silently
wrote ``rotated_for_round: "unspecified"``, clobbering the round label
the freshness pytest keys on.
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--round",
        dest="round",
        type=int,
        required=True,
        help="round number this rotation targets (e.g. 8)",
    )
    args = parser.parse_args()

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from arnab_spark.queries import all_queries

    def h(q) -> str:
        src = inspect.getsource(q.fn) + "\n---\n" + (q.oracle or "")
        return hashlib.sha256(src.encode()).hexdigest()[:16]

    out = {
        "_comment": (
            "Per-query implementation hashes at the time the driver "
            "verification window (CURATED_FIRST) was last rotated. "
            "test_registry_order.py fails if a query's hash drifts "
            "without a window slot. Regenerate with: "
            "python -m tests.gen_evidence_manifest --round N"
        ),
        "rotated_for_round": args.round,
        "query_src_hashes": {n: h(q) for n, q in sorted(all_queries().items())},
    }
    with open(os.path.join(REPO, "EVIDENCE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"EVIDENCE.json: {len(out['query_src_hashes'])} queries hashed "
        f"(rotated for round {args.round})"
    )


if __name__ == "__main__":
    main()
