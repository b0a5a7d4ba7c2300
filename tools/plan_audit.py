"""Registry-wide physical-plan audit: structural scale invariants.

For EVERY registered query (not just the PLANS.md showcase), build the
plan at sf0.001 and flag:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` on non-broadcast-
  sized inputs — unless the query is on the ALLOWED_EXACT list (the
  documented fixture-scale truth twins of a shipped blocked/celled path);
  BroadcastNestedLoopJoin against literally tiny broadcast frames
  (centroids, calibration rows, distance maps) is fine and common.
- row-at-a-time Python (``BatchEvalPython`` / ``ArrowEvalPython``) —
  NEVER allowed; grouped/batched Python (``FlatMapGroupsInPandas``,
  ``MapInPandas``) is allowed only for the known codec/model set.

Run per round:  python tools/plan_audit.py
Exit 1 on any violation.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Exhaustive-comparison queries that are DELIBERATE truth twins of a
# shipped blocked path (each docstring says so): the exact ANN baseline
# (e1 vs e3/e2/e20), exact hard negatives (e15 vs e15b), the recall
# evaluators' truth sides (e10/e16/e22 vs their approximate paths), and
# MMR, whose candidate pool is contractually the top-k of a previous
# retrieval stage (bounded), not a corpus.
ALLOWED_CARTESIAN = {
    "e1_cosine_topk",
    "e15_hard_negatives",
    "e10_ann_recall",
    "e16_mrl_recall",
    "e22_ivf_probe_sweep",
    "e12_mmr_topk",
}

# Queries allowed an UNPARTITIONED window (r09, VERDICT r08 ask #3 —
# the a43 class must stay dead): each entry's global window runs on a
# frame whose row count is bounded by something OTHER than data size,
# stated here. A new query that trips the check either partitions its
# window, routes through windows.global_ntile / orderBy().limit(R)
# (TakeOrderedAndProject), or earns a justified row in this table.
ALLOWED_GLOBAL_WINDOW = {
    # value-lattice axes: rows = quantization grid cells, not corpus rows
    "m15_ks_drift", "m17_mann_whitney", "m20_spearman", "m22_roc_auc",
    "m16_isotonic_calibration", "m13_bh_fdr", "m26_kaplan_meier",
    # post-limit / top-R frames (rank window AFTER TakeOrderedAndProject)
    "o1_sort_topn", "t44_zipf_slope", "t24_dsir_select",
    # seeded-sample / codebook selections (LIMIT k upstream)
    "e7_pq_encode", "e8_pq_adc_topk",
    # bounded business axes: funnel steps / calendar buckets / config-
    # sized partition-count offsets (windows.global_ntile)
    "a27_funnel", "w5_proration", "t27_vocab_growth",
    "w8_cumulative_distinct", "w12_session_paths", "a43_rfm_segments",
}

GLOBAL_WINDOW_RE = re.compile(
    # windowspecdefinition whose FIRST argument is already a sort column
    # (has a direction marker) => the partition-column list is empty
    r"windowspecdefinition\([^,()]* (?:ASC|DESC) NULLS"
)

# Grouped/Arrow-batched Python stages: per-group statistical models and
# byte codecs — the applyInPandas/mapInPandas niche.
ALLOWED_GROUPED_PYTHON = {
    "m4_glmm", "m4zi_glmm", "m4b_glmm_1ri", "m4_poisson_glm",
    "mm2_resize_plumbing", "mm3_image_decode", "mm4_audio_decode",
    "mm5_video_frame_sample", "mm6_phash_neardup", "mm7_silence_runs",
    "mm8_image_resize", "mm9_scene_cuts", "mm10_audio_decimate",
    "mm11_channel_stats",
    "mm1_binary_meta",      # typed byte-metadata extraction over binary cols
    "mm13_audio_clipping",  # WAV-rail saturation counts over real bytes
    "mm14_png_decode",      # pure-Python PNG codec over real bytes
    "mm15_jpeg_decode",     # pure-Python baseline JPEG codec over real bytes
    "t16_pack_sequences",   # greedy context-packing walk per md5 shard
}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    from peskas_timor_data_pipeline_spark.harness import registry
    from peskas_timor_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    violations: list[str] = []
    n = 0
    for name, (fn, _sql) in registry().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(jmode)
        except Exception as e:  # noqa: BLE001 — audit must not die mid-scan
            violations.append(f"{name}: plan build failed: {e}")
            continue
        n += 1
        if "CartesianProduct" in plan and name not in ALLOWED_CARTESIAN:
            violations.append(f"{name}: CartesianProduct outside the truth-twin allowlist")
        if GLOBAL_WINDOW_RE.search(plan) and name not in ALLOWED_GLOBAL_WINDOW:
            violations.append(
                f"{name}: unpartitioned window outside the bounded-axis "
                "allowlist (single-partition sort at scale — partition it, "
                "use global_ntile/TakeOrdered, or justify an allowlist row)"
            )
        if re.search(r"\(\d+\) (Batch|Arrow)EvalPython", plan):
            violations.append(f"{name}: row-at-a-time Python UDF in the plan")
        if (
            re.search(r"\(\d+\) (FlatMapGroupsInPandas|MapInPandas|PythonMapInArrow|MapInArrow)", plan)
            and name not in ALLOWED_GROUPED_PYTHON
        ):
            violations.append(f"{name}: unexpected grouped-Python stage")
    print(f"audited {n} query plans at {sf_dir}")
    if violations:
        print("VIOLATIONS:")
        for v in violations:
            print(" -", v)
        return 1
    print("clean: no cartesians outside truth twins, no row-wise Python, "
          "grouped Python only in the codec/model set, no unpartitioned "
          "windows outside the bounded-axis allowlist")
    return 0


if __name__ == "__main__":
    sys.exit(main())
