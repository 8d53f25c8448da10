"""Regenerate ``tests/shuffle_budgets_all.json`` (the full-registry
cold-slot exchange-count snapshot asserted by ``test_plan_lint``).

Run after any plan-affecting change::

    python tests/regen_shuffle_budgets.py            # refuses on decreases
    python tests/regen_shuffle_budgets.py --allow-decrease q246_... q63_...

The INCREASE direction is caught by the test itself; this script
guards the other direction (VERDICT r8 #7): a pin that silently
DECREASES can mean a lost repartition guard or an accidentally-
dropped exchange, not just a win — so every decrease must be named
on the command line, which puts the acknowledgment in the command
history / commit message rather than letting a blanket regeneration
absorb it. New queries and removed queries are reported but never
block.
"""

from __future__ import annotations

import json
import pathlib
import sys

SNAPSHOT = pathlib.Path(__file__).parent / "shuffle_budgets_all.json"


def main() -> int:
    allow = set()
    args = sys.argv[1:]
    if args and args[0] == "--allow-decrease":
        allow = set(args[1:])
    elif args:
        print(__doc__)
        return 2

    here = pathlib.Path(__file__).parent
    sys.path.insert(0, str(here.parent))  # repo root (the package)
    sys.path.insert(0, str(here))
    from conftest import SF_DIR

    from building_energy_data_pipeline_spark import caching
    from building_energy_data_pipeline_spark.ops.observe import (
        shuffle_count,
    )
    from building_energy_data_pipeline_spark.plans import REGISTRY
    from building_energy_data_pipeline_spark.session import get_spark

    old = json.loads(SNAPSHOT.read_text()) if SNAPSHOT.exists() else {}
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    new: dict[str, int] = {}
    try:
        for name in sorted(REGISTRY):
            caching.release_caches()
            new[name] = shuffle_count(REGISTRY[name].spark(spark, SF_DIR))
    finally:
        spark.stop()

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    increases = {n: (old[n], new[n]) for n in new if n in old and new[n] > old[n]}
    decreases = {n: (old[n], new[n]) for n in new if n in old and new[n] < old[n]}
    if added:
        print(f"new queries ({len(added)}): {added}")
    if removed:
        print(f"removed queries ({len(removed)}): {removed}")
    if increases:
        print(f"INCREASES (was, now): {increases}")
    unacked = {n: d for n, d in decreases.items() if n not in allow}
    if unacked:
        print(
            "REFUSING to write: unacknowledged pin DECREASES (was, now): "
            f"{unacked}\nA lost exchange can be a lost repartition "
            "guard. Verify each is intentional, then re-run with "
            "--allow-decrease " + " ".join(sorted(unacked))
        )
        return 1
    if decreases:
        print(f"acknowledged decreases (was, now): {decreases}")
    SNAPSHOT.write_text(json.dumps(new, indent=2, sort_keys=True) + "\n")
    print(f"wrote {len(new)} pins to {SNAPSHOT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
