"""Scale probe: per-reducer pressure of the ngram index build as one
shingle's document frequency crosses the stop-DF cap.

The r10 review found the index build's original shape —
``groupBy(h).agg(collect_set(doc_id))`` THEN the df cut — bounded the
output posting list but not the intermediate aggregation buffer: a
boilerplate shingle shared by ``hot_df`` documents merges a
``hot_df``-element set on a single reducer BEFORE the filter drops
the row, in UNTRACKED JVM heap (collect_set state never registers
with the memory manager, so it cannot spill — it can only OOM).
_ngram_pair_scores now builds the index as a HYBRID: a raw-count
routing pass (constant per-key state) splits shingles into SAFE
(raw instances ≤ cap ⇒ the one-pass collect_set buffer is provably
≤ cap for any distribution) and SUSPECT (hot candidates →
``dropDuplicates([h, doc_id])`` — the shuffle key is the PAIR, so a
hot h spreads across reducers by doc_id — then ``groupBy(h).count()``
→ cut → LEFT SEMI join back).

This probe measures both shapes on a constructed corpus where ONE
shingle's df walks a ladder across the cap (everything else is
background noise with tiny df), attributing per-step reducer
pressure by running each step as its own job and diffing the REST
API's per-task metrics:

- OLD `agg` job: max single-task shuffle-read bytes of the
  collect_set merge — every hot instance converges on one reducer's
  buffer, so the series grows LINEARLY with hot_df (the probe's
  headline).
- `hyb_raw` job: partial counts — one row per (mapper, h); flat
  and tiny.
- `hyb_safe` job: the anti-join excludes the hot shingle BEFORE the
  collect_set, so the set-merge stage's max-task read stays FLAT.
- `hyb_dedup` job (the suspect branch's only per-h-unbounded-input
  aggregation): the pair key spreads the hot shingle, so max-task
  read stays FLAT.
- `hyb_full` job: the semi probe does still converge the hot
  shingle's rows on one task before dropping them (reported read
  grows), but the only per-task state is a memory-manager-TRACKED,
  SPILLABLE sorter/hash relation — peakExecutionMemory is reported
  to show the plateau, and a skewed probe partition is
  AQE-skew-splittable on a real cluster.

Verdict line asserts: old agg read grows ≥5× over the ladder's
1000× hot-df swing while new dedup/count reads stay within 2×.

The probe session disables AQE partition coalescing: the engine's
64MB advisory target packs small post-shuffle partitions together,
which hides a sub-64MB hot key inside a padded partition at probe
scale — on a real corpus the hot posting (1% of 10B docs ≈ 800MB of
doc_ids) dwarfs any advisory target, so the uncoalesced read is the
faithful signal.  Coalescing never SPLITS a key, so it cannot help
the old shape at scale.

Usage: python tools/probe_ngram_hotkey.py [hot_df ...]
       (default ladder: 500 5_000 50_000 500_000; cap = 1000)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.error
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from ondemand_dask_spark.session import build_session  # noqa: E402

CAP = 1000
N_DOCS = 100_000
BG_PER_DOC = 5
UI_PORT = 4057


def instances(spark, hot_df: int):
    """(doc_id, h) shingle instances: BG_PER_DOC near-unique
    background shingles per doc (df ~ 1-2) + shingle h = -1 present
    in `hot_df` docs, each hot instance DUPLICATED 3x so the per-doc
    dedup step has real work on the hot key too."""
    d = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    bg = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(BG_PER_DOC)),
                lambda i: F.pmod(
                    F.xxhash64(F.col("doc_id"), i), F.lit(2_000_000)
                ),
            )
        ).alias("h"),
    )
    hot = (
        spark.range(hot_df)
        .select(F.col("id").alias("doc_id"))
        .crossJoin(spark.range(3))
        .select("doc_id", F.lit(-1).alias("h"))
    )
    return bg.unionByName(hot)


def old_shape(inst):
    return (
        inst.groupBy("h")
        .agg(F.collect_set("doc_id").alias("ds"))
        .filter(F.size("ds") <= CAP)
        .select("h", F.explode("ds").alias("doc_id"))
    )


def new_steps(inst):
    """The engine's HYBRID shape (mirrors _ngram_pair_scores), split
    into separately-runnable steps for per-job metric attribution:
    raw-count routing pass, safe branch (anti-join guard +
    provably-bounded collect_set), suspect branch (pair-keyed dedup
    + plain-count df + semi-join)."""
    raw = inst.groupBy("h").agg(F.count("*").alias("rc"))
    suspect = raw.filter(F.col("rc") > CAP).select("h")
    safe_kept = (
        inst.join(suspect, "h", "left_anti")
        .groupBy("h")
        .agg(F.collect_set("doc_id").alias("ds"))
        .filter(F.size("ds") <= CAP)
        .select("h", F.explode("ds").alias("doc_id"))
    )
    sus_uniq = inst.join(suspect, "h", "left_semi").dropDuplicates(
        ["h", "doc_id"]
    )
    sus_keep = (
        sus_uniq.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= CAP)
        .select("h")
    )
    kept = safe_kept.unionByName(sus_uniq.join(sus_keep, "h", "left_semi"))
    return raw, safe_kept, sus_uniq, kept


class StageMeter:
    """Diff REST-API stage/task metrics around each job."""

    def __init__(self, spark):
        # the session's OWN bound UI + app id — a hardcoded port
        # would meter a different application if 4057 was taken and
        # spark.port.maxRetries rebound this session elsewhere
        self.ui = spark.sparkContext.uiWebUrl
        assert self.ui, "probe session must run with spark.ui.enabled"
        app = spark.sparkContext.applicationId
        self.base = f"{self.ui}/api/v1/applications/{app}"
        self.seen: set[int] = set()

    def run(self, label: str, action) -> dict:
        t0 = time.time()
        action()
        wall = time.time() - t0
        stages = json.load(urllib.request.urlopen(self.base + "/stages"))
        fresh = [s for s in stages if s["stageId"] not in self.seen]
        self.seen.update(s["stageId"] for s in stages)
        max_read = peak = spill = 0
        skipped = 0
        for s in fresh:
            if s["status"] == "SKIPPED":
                skipped += 1
                continue
            # fetch the stage's OWN attempt id, not a hardcoded /0:
            # a retried stage (attempt 1+) or one evicted past
            # spark.ui.retainedStages would 404 and kill the probe
            # mid-ladder (ADVICE r11) — skip what the UI no longer
            # holds; the ladder's verdict is the max over what
            # remains, still valid as a lower bound the caller sees
            attempt = s.get("attemptId", 0)
            try:
                det = json.load(
                    urllib.request.urlopen(
                        f"{self.base}/stages/{s['stageId']}/{attempt}"
                        "?details=true"
                    )
                )
            except urllib.error.HTTPError:
                skipped += 1
                continue
            for t in det.get("tasks", {}).values():
                m = t.get("taskMetrics") or {}
                sr = m.get("shuffleReadMetrics") or {}
                max_read = max(
                    max_read,
                    sr.get("localBytesRead", 0)
                    + sr.get("remoteBytesRead", 0),
                )
                peak = max(peak, m.get("peakExecutionMemory", 0))
                spill = max(spill, m.get("memoryBytesSpilled", 0))
        return {
            "job": label,
            "max_task_shuffle_read": max_read,
            "max_task_peak_exec_mem": peak,
            "max_task_spill": spill,
            "skipped_stages": skipped,
            "wall_s": round(wall, 2),
        }


def noop_write(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    ladder = [int(a) for a in sys.argv[1:]] or [500, 5_000, 50_000, 500_000]
    spark = build_session(
        app_name="probe_ngram_hotkey",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "2000",
            # see docstring: coalescing pads sub-64MB keys together
            # and would hide the hot key at probe scale
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    meter = StageMeter(spark)
    series: dict[str, list[int]] = {
        "old_agg": [], "hyb_raw": [], "hyb_safe": [], "hyb_dedup": [],
    }
    for hot_df in ladder:
        inst = instances(spark, hot_df)
        rows = {"hot_df": hot_df, "jobs": []}
        r = meter.run("old_agg", lambda: noop_write(old_shape(inst)))
        rows["jobs"].append(r)
        series["old_agg"].append(r["max_task_shuffle_read"])
        raw, safe_kept, sus_uniq, kept = new_steps(inst)
        r = meter.run("hyb_raw", lambda: noop_write(raw))
        rows["jobs"].append(r)
        series["hyb_raw"].append(r["max_task_shuffle_read"])
        r = meter.run("hyb_safe", lambda: noop_write(safe_kept))
        rows["jobs"].append(r)
        series["hyb_safe"].append(r["max_task_shuffle_read"])
        r = meter.run("hyb_dedup", lambda: noop_write(sus_uniq))
        rows["jobs"].append(r)
        series["hyb_dedup"].append(r["max_task_shuffle_read"])
        rows["jobs"].append(meter.run("hyb_full", lambda: noop_write(kept)))
        print(json.dumps(rows))
    swing = ladder[-1] / ladder[0]
    old_growth = series["old_agg"][-1] / max(series["old_agg"][0], 1)
    flat = all(
        max(v) / max(min(v), 1) < 2.0
        for v in (series["hyb_raw"], series["hyb_safe"], series["hyb_dedup"])
    )
    print(
        json.dumps(
            {
                "verdict": {
                    "hot_df_swing": swing,
                    "old_agg_read_growth": round(old_growth, 1),
                    "old_grows": old_growth >= 5.0,
                    "new_agg_reads_flat_within_2x": flat,
                }
            }
        )
    )
    # growth threshold is calibrated to the default 1000x ladder
    # (hot bytes must clear the ~180KB background floor); a custom
    # short ladder still prints the verdict but only the flatness
    # claim is asserted
    assert flat, "hybrid aggregation stages not flat in hot df"
    if swing >= 1000:
        assert old_growth >= 5.0, "old-shape growth signal missing"


if __name__ == "__main__":
    main()
