"""Cluster entry point for the full conflation pipeline.

Local/dev::

    python -m pdxbldgimport_spark --sf-dir /root/testdata/sf0.01 \
        --checkpoint /tmp/pdx_ckpt

Cluster (the reference's `rake default` analog, SURVEY.md §3.1)::

    spark-submit --py-files pdxbldgimport_spark.zip \
        -m pdxbldgimport_spark -- --sf-dir s3://... --checkpoint s3://...

Runs the resumable checkpointed DAG (plans/manifest.run_pipeline):
completed fresh stages are skipped, the first stale/missing stage
rebuilds, every stage writes per-partition lineage + metrics, and join
planning reads the ingest manifests (row counts + hot-cell skew
histograms) instead of re-scanning inputs. Prints one JSON line with
the built/skipped report.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pdxbldgimport_spark")
    ap.add_argument("--sf-dir", required=True, help="input table directory")
    ap.add_argument("--checkpoint", required=True, help="stage-DAG root")
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N] cores (default: all; ignored under a cluster master)")
    args = ap.parse_args(argv)

    from .plans.manifest import run_pipeline
    from .session import get_spark
    from .shipping import ship

    spark = get_spark(app_name="pdxbldgimport_pipeline", cores=args.cores)
    ship(spark)
    report = run_pipeline(spark, args.sf_dir, args.checkpoint)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
