"""Checkpointed stage DAG with per-partition lineage + metrics and
resume-from-checkpoint (north_rule; re-expresses the reference's
Rake::TableTask staleness machinery — `table :x => [deps]` +
`add_update_column` timestamps, e.g. tasks/pdx_bldgs.rake:2,176 — as a
run manifest over materialized parquet stages).

Each stage is a pure DataFrame function materialized at the reference's
physical-table boundary:

- data  → ``<root>/<stage>/data`` (parquet; Iceberg table on a real
  cluster — parquet is the sandbox stand-in, same snapshot semantics);
- manifest row → ``<root>/<stage>/manifest.json``: input fingerprint
  (recursive over upstream manifests — the `updated_at` analog), row
  count, partition count, **per-partition row counts** (the lineage +
  metrics record), wall time, engine fingerprint.

``StageRunner.stage(name, deps, build)`` skips the build when a
manifest exists whose input fingerprint matches (the rake "rebuild only
stale nodes" semantics); otherwise it rebuilds and rewrites. A killed
run resumes by construction: completed stages are skipped, the first
missing/stale stage recomputes (tests/test_resume.py kills after stage
k and asserts identical outputs + skip counts).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _fingerprint(*parts: str) -> str:
    return hashlib.md5("\x1f".join(parts).encode()).hexdigest()


def _code_token(build: Callable) -> str:
    """Engine fingerprint for a stage: package version + the build
    callable's source text, so editing a stage's logic invalidates its
    checkpoint on resume (a fresh-looking manifest for stale code is the
    silent-wrong-resume failure mode). Source of a closure captures the
    call text only, not callee internals — bump ``__version__`` for
    engine-wide logic changes."""
    from .. import __version__

    try:
        src = inspect.getsource(build)
    except (OSError, TypeError):
        src = getattr(build, "__qualname__", repr(build))
    return _fingerprint(__version__, src)


class StageRunner:
    """One materialized-DAG run rooted at ``root`` (a checkpoint dir)."""

    def __init__(self, spark: SparkSession, root: str, inputs_token: str = ""):
        """``inputs_token`` fingerprints the run's external inputs (e.g.
        the sf_dir path + source snapshot ids) — any change invalidates
        every stage, like a reloaded source table would."""
        self.spark = spark
        self.root = root
        self.inputs_token = inputs_token
        self.built: list[str] = []    # stages recomputed this run
        self.skipped: list[str] = []  # stages resumed from checkpoint

    # -- manifest plumbing -------------------------------------------------
    def _paths(self, name: str) -> tuple[str, str]:
        d = os.path.join(self.root, name)
        return os.path.join(d, "data"), os.path.join(d, "manifest.json")

    def read_manifest(self, name: str) -> dict | None:
        _, mpath = self._paths(name)
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            return json.load(f)

    def _input_fp(self, name: str, deps: list[str], code_token: str = "") -> str:
        parts = [name, self.inputs_token, code_token]
        for d in deps:
            m = self.read_manifest(d)
            # missing dep manifest → unknown lineage → never matches
            parts.append(m["fingerprint"] if m else f"<missing:{d}>@{time.time()}")
        return _fingerprint(*parts)

    # -- the stage operator -------------------------------------------------
    def hot_cells(self, name: str) -> list[int] | None:
        """Skew stats recorded at ingest (see ``stage(hot_col=...)``) —
        the feed for ``pip_join(hot_cells=...)``: the shuffle join plans
        its salting from the manifest instead of re-scanning the point
        side (a full extra pass at petabyte scale)."""
        m = self.read_manifest(name)
        if m is None or "hot_cells" not in m:
            return None
        return [int(k) for k in m["hot_cells"]]

    def stage(
        self,
        name: str,
        deps: list[str],
        build: Callable[[], DataFrame],
        hot_col: str | None = None,
        hot_threshold: int = 200_000,
    ) -> DataFrame:
        """Materialize stage ``name`` (skipping if checkpoint is fresh)
        and return it as a DataFrame read from the checkpoint — so every
        consumer sees the materialized table, never the logical plan
        (plan-growth control, same reason as queries.stage)."""
        data, mpath = self._paths(name)
        want_fp = self._input_fp(name, deps, _code_token(build))
        m = self.read_manifest(name)
        if m is not None and m["input_fp"] == want_fp and os.path.exists(data):
            self.skipped.append(name)
            return self.spark.read.parquet(data)

        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(data)
        out = self.spark.read.parquet(data)
        # per-partition lineage/metrics (north_rule): rows per partition
        # of the materialized table, plus totals.
        per_part = (
            out.groupBy(F.spark_partition_id().alias("partition"))
            .count()
            .orderBy("partition")
            .collect()
        )
        parts = {int(r["partition"]): int(r["count"]) for r in per_part}
        hot: dict[str, int] | None = None
        if hot_col is not None:
            # skew histogram at ingest (one map-side-combined agg over the
            # freshly-written table; bounded output: only cells above the
            # salting threshold are recorded)
            hot = {
                str(r[hot_col]): int(r["cnt"])
                for r in out.groupBy(hot_col)
                .agg(F.count(F.lit(1)).alias("cnt"))
                .where(F.col("cnt") > hot_threshold)
                .collect()
            }
        manifest = {
            "stage": name,
            "deps": deps,
            "input_fp": want_fp,
            # this stage's own fingerprint folds its inputs + row stats:
            # downstream stages inherit staleness transitively.
            "fingerprint": _fingerprint(want_fp, str(sum(parts.values()))),
            "row_count": sum(parts.values()),
            "n_partitions": len(parts),
            "partition_rows": parts,
            "wall_s": round(time.time() - t0, 3),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        if hot is not None:
            manifest["hot_cells"] = hot
            manifest["hot_threshold"] = hot_threshold
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mpath)  # atomic: a killed run never half-commits
        self.built.append(name)
        return out

    def run_report(self) -> dict:
        return {"built": self.built, "skipped": self.skipped}


def run_pipeline(spark: SparkSession, sf_dir: str, root: str) -> dict:
    """The full conflation pipeline as a resumable checkpointed DAG —
    the reference's `rake default` entry point (Rakefile:28-30) over the
    webtext world. Returns the run report (built/skipped stages).

    Join planning is fully manifest-fed: the pages ingest stage records
    the per-cell skew histogram (hot_col) and the footprint ingest
    records its row count, so the pip_assign stage plans its
    broadcast-vs-shuffle choice AND its salting without any extra scan
    of either side (at 10^12 docs a planning scan is a full extra pass;
    tests/test_plans.py asserts the no-scan property directly)."""
    from .. import queries as Q
    from ..operators import conflation as CF
    from ..operators.pip_join import cell_expr, pip_join, tile_expr
    from ..geo import cells as C
    from ..queries_osm import tile_export_df

    Q.views(spark, sf_dir)
    r = StageRunner(spark, root, inputs_token=sf_dir)

    pages_ing = r.stage(
        "pages_ingest", [],
        lambda: spark.table("pages").select(
            "page_id", "lon", "lat",
            cell_expr(F.col("lon"), F.col("lat"), C.RES_JOIN).alias("cell"),
        ),
        hot_col="cell",
    )
    fps_ing = r.stage(
        "footprints_ingest", [],
        lambda: Q.prepared_footprints(spark, sf_dir).select("fp_id", "rings"),
    )
    pip = r.stage(
        "pip_assign", ["pages_ingest", "footprints_ingest"],
        lambda: pip_join(
            pages_ing, fps_ing, "page_id", "fp_id",
            polys_count=r.read_manifest("footprints_ingest")["row_count"],
            hot_cells=r.hot_cells("pages_ingest"),
        ),
    )
    # the north-star ambiguity resolver, also planned purely from
    # manifests: candidate count from the footprint ingest manifest →
    # the kNN broadcast gate decides without scanning either side.
    from ..operators.knn import knn_join

    def build_knn():
        cents = Q.prepared_footprints(spark, sf_dir).select(
            "fp_id", "centroid_lon", "centroid_lat"
        )
        un = pages_ing.join(pip.select("page_id"), "page_id", "left_anti")
        return knn_join(
            un, cents, "page_id", "fp_id",
            cands_count=r.read_manifest("footprints_ingest")["row_count"],
        )

    r.stage("knn_unassigned", ["pages_ingest", "footprints_ingest", "pip_assign"],
            build_knn)

    cbldg = r.stage(
        "cbldg_enriched", [],
        lambda: Q.prepared_cbldg(spark, sf_dir),
    )
    addrs = r.stage("pdx_addrs", [], lambda: CF.pdx_addrs(spark.table("caddr")))
    counts = r.stage(
        "addr_bldg_counts", ["cbldg_enriched", "pdx_addrs"],
        lambda: CF.addr_bldg_counts(cbldg, addrs),
    )
    hg = r.stage(
        "house_and_garage", ["cbldg_enriched", "addr_bldg_counts"],
        lambda: CF.house_and_garage(cbldg, counts),
    )
    view = r.stage(
        "pdx_bldg_view", ["cbldg_enriched", "pdx_addrs", "addr_bldg_counts"],
        lambda: CF.pdx_bldg_view(cbldg, addrs, counts),
    )
    pdx = r.stage(
        "pdx_bldgs", ["pdx_bldg_view", "house_and_garage"],
        lambda: CF.pdx_bldgs(
            view, hg, lambda lon, lat: tile_expr(lon, lat, C.RES_TILE)
        ),
    )
    r.stage(
        "tile_export", ["pdx_bldgs"],
        lambda: tile_export_df(pdx),
    )
    return r.run_report()
