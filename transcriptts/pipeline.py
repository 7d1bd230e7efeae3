"""Resumable, snapshot-checkpointed rollup pipeline with lineage + metrics.

North-rule shape: 'rollups run as a resumable Iceberg-snapshot-checkpointed
pipeline emitting per-partition lineage and row-count/byte metrics'. This
sandbox has no Iceberg runtime jars, so the pipeline implements the same
contract on parquet + an atomically-swapped JSON manifest; every concept maps
1:1 onto Iceberg when the catalog is available (snapshot id ↔ Iceberg
snapshot id, manifest swap ↔ commit, watermark ↔ WAP branch publish,
partition dir ↔ hidden partition days(bucket_start)):

layout under root/:
  state.json                    -- atomic checkpoint: per-tier watermark +
                                   last snapshot id + input fingerprint
  tier=<t>/p_date=YYYY-MM-DD/   -- rollup data, partitioned by bucket date
  lineage/<snapshot>.json       -- per-run, per-partition lineage + metrics

Resume semantics:
- a tier whose state entry matches the current input fingerprint is skipped
  entirely (idempotent rerun after a crash between tiers);
- with `incremental=True` and a previously committed watermark, only buckets
  strictly after the watermark minus one coarse bucket are recomputed and
  their partitions overwritten (dynamic partition overwrite) — the standard
  continuous-aggregate maintenance pattern;
- state.json is swapped via os.replace AFTER the tier's data lands, so a
  crash at any point leaves a consistent (re-runnable) view.

Every write sorts within partitions by (conv_id, metric, bucket_start) so a
rerun of the same input produces identical logical content (verified by the
resume test with a content hash).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .rollup import rollup, with_derived_metrics
from .schema import TIERS


class RollupPipeline:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        os.makedirs(os.path.join(root, "lineage"), exist_ok=True)

    # --- state checkpoint ---------------------------------------------------

    @property
    def _state_path(self) -> str:
        return os.path.join(self.root, "state.json")

    def load_state(self) -> dict:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return json.load(f)
        return {"tiers": {}}

    def _commit_state(self, state: dict) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)
        os.replace(tmp, self._state_path)  # atomic snapshot commit

    # --- run ------------------------------------------------------------------

    def run(
        self,
        transcripts: DataFrame,
        tiers: tuple[str, ...] = ("1m", "1h", "1d"),
        input_fingerprint: str | None = None,
        incremental: bool = False,
    ) -> dict:
        """Compute + persist the requested tiers; returns the run report.

        input_fingerprint identifies the input version (e.g. source snapshot
        id / max ingest ts). Tiers already committed for this fingerprint are
        skipped — that is the resume path.
        """
        if input_fingerprint is None:
            agg = transcripts.select(
                F.count("*").alias("n"), F.max("ts").alias("mx"), F.min("ts").alias("mn")
            ).collect()[0]
            input_fingerprint = f"n={agg['n']}/min={agg['mn']}/max={agg['mx']}"

        derived = with_derived_metrics(transcripts)
        state = self.load_state()
        report: dict = {"snapshot_ids": {}, "skipped": [], "metrics": {}}

        for tier in tiers:
            entry = state["tiers"].get(tier)
            if entry and entry.get("fingerprint") == input_fingerprint:
                report["skipped"].append(tier)
                continue
            snapshot_id = f"{tier}-{uuid.uuid4().hex[:12]}"
            t0 = time.time()

            r = rollup(derived, tier)
            prev_watermark = entry.get("watermark") if (entry and incremental) else None
            if prev_watermark is not None:
                # recompute every DATE partition touched at/after the
                # watermark (dynamic overwrite swaps whole p_date partitions,
                # so the incremental filter must align to that granularity)
                r = r.where(F.to_date("bucket_start") >= F.to_date(F.lit(prev_watermark)))
            out = (
                r.withColumn("p_date", F.to_date("bucket_start"))
                .repartition("p_date")
                .sortWithinPartitions("conv_id", "metric", "bucket_start")
            )
            path = os.path.join(self.root, f"tier={tier}")
            writer = out.write.partitionBy("p_date")
            if prev_watermark is not None and os.path.exists(path):
                self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
                writer.mode("overwrite").parquet(path)
            else:
                writer.mode("overwrite").parquet(path)
            wall = time.time() - t0

            written = self.spark.read.parquet(path)
            part_stats = [
                row.asDict()
                for row in written.groupBy("p_date")
                .agg(F.count("*").alias("rows"), F.max("bucket_start").alias("max_bucket"))
                .orderBy("p_date")
                .collect()
            ]
            watermark = str(max(p["max_bucket"] for p in part_stats)) if part_stats else None
            total_rows = sum(p["rows"] for p in part_stats)
            byte_size = sum(
                os.path.getsize(os.path.join(dp, fn))
                for dp, _, fns in os.walk(path)
                for fn in fns
                if fn.endswith(".parquet")
            )

            lineage = {
                "snapshot_id": snapshot_id,
                "tier": tier,
                "input_fingerprint": input_fingerprint,
                "incremental_from": prev_watermark,
                "rows": total_rows,
                "bytes": byte_size,
                "wall_sec": round(wall, 3),
                "partitions": [
                    {"p_date": str(p["p_date"]), "rows": p["rows"], "max_bucket": str(p["max_bucket"])}
                    for p in part_stats
                ],
            }
            with open(os.path.join(self.root, "lineage", f"{snapshot_id}.json"), "w") as f:
                json.dump(lineage, f, indent=2)

            # commit AFTER data + lineage land (crash before this line →
            # tier is simply recomputed on the next run)
            state["tiers"][tier] = {
                "fingerprint": input_fingerprint,
                "snapshot_id": snapshot_id,
                "watermark": watermark,
                "rows": total_rows,
                "bytes": byte_size,
            }
            self._commit_state(state)
            report["snapshot_ids"][tier] = snapshot_id
            report["metrics"][tier] = {"rows": total_rows, "bytes": byte_size, "wall_sec": round(wall, 3)}

        return report

    def read_tier(self, tier: str) -> DataFrame:
        if tier not in TIERS:
            raise ValueError(f"unknown tier {tier!r}")
        return self.spark.read.parquet(os.path.join(self.root, f"tier={tier}"))

    def content_hash(self, tier: str) -> str:
        """Order-insensitive logical content hash of a tier (resume tests)."""
        df = self.read_tier(tier).drop("p_date")
        row = df.select(
            F.sha2(
                F.concat_ws(
                    "|",
                    *[F.coalesce(F.col(c).cast("string"), F.lit("null")) for c in sorted(df.columns)],
                ),
                256,
            ).alias("h")
        ).agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"))
        return str(row.collect()[0]["s"])
