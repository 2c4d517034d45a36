"""Regenerate EVIDENCE.json — run ONLY when rotating CURATED_FIRST.

The manifest pins each registry query's (fn source + oracle) hash at the
moment the driver verification window was last rotated;
``tests/test_registry_order.py::test_changed_queries_hold_verification_slots``
fails when a query drifts from its pinned hash without holding a window
slot. Usage: ``python -m tests.gen_evidence_manifest [round_number]``.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys


def main() -> None:
    from arnab_spark.queries import all_queries

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else None

    def h(q) -> str:
        src = inspect.getsource(q.fn) + "\n---\n" + (q.oracle or "")
        return hashlib.sha256(src.encode()).hexdigest()[:16]

    out = {
        "_comment": (
            "Per-query implementation hashes at the time the driver "
            "verification window (CURATED_FIRST) was last rotated. "
            "test_registry_order.py fails if a query's hash drifts "
            "without a window slot. Regenerate with: "
            "python -m tests.gen_evidence_manifest"
        ),
        "rotated_for_round": rnd if rnd is not None else "unspecified",
        "query_src_hashes": {n: h(q) for n, q in sorted(all_queries().items())},
    }
    with open(os.path.join(repo, "EVIDENCE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"EVIDENCE.json: {len(out['query_src_hashes'])} queries hashed")


if __name__ == "__main__":
    main()
