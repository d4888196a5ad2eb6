"""Scale-linearity spot check: run a subset of suite queries at two scale
factors and report the wall-time ratio vs the data ratio. A query whose
time grows much faster than its input (and than its OUTPUT — pair-emitting
dedup queries legitimately grow quadratically in replica count, see
tools/make_sf.py) is flagged for SCALING.md.

Usage:
  python tools/scale_check.py q1 q2 ... [--small DIR] [--big DIR]
Defaults: small=/root/testdata/sf0.1, big=/tmp/sf1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    small = "/root/testdata/sf0.1"
    big = "/tmp/sf1"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--small":
            small = sys.argv[2 + i]
        if a == "--big":
            big = sys.argv[2 + i]

    from lance_spark import suite
    from lance_spark.session import get_spark

    names = args or [
        "curate_pack_sequences", "dedup_paragraphs", "events_asof_join",
        "events_range_join", "text_build_vocab", "dedup_semantic_keep",
    ]
    spark = get_spark("scale-check")
    print(f"{'query':28s} {'small(s)':>9s} {'big(s)':>9s} {'ratio':>7s} rows_small rows_big")
    for name in names:
        fn = suite.QUERIES[name]
        out = {}
        for label, sf_dir in (("small", small), ("big", big)):
            fn(spark, sf_dir).count()  # warmup (footers, codegen)
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            out[label] = (time.time() - t0, n)
        ratio = out["big"][0] / max(out["small"][0], 1e-9)
        print(
            f"{name:28s} {out['small'][0]:9.2f} {out['big'][0]:9.2f} {ratio:6.1f}x "
            f"{out['small'][1]:10d} {out['big'][1]:9d}"
        )


if __name__ == "__main__":
    main()
