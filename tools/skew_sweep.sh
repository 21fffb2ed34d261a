#!/bin/bash
# Skewed-vs-uniform benchmark sweep (SURVEY §5 / round-7 task 1):
# benches the graph + dedup + slice-tensor families on a uniform
# ScaleGen replica and its --skew twin (global celebrity supplier/peer
# hubs + a hot shingle family) and prints both JSON lines. A healthy
# engine holds every per-query skewed/uniform ratio under ~2x: the hub
# work is bounded by adjCap / df-caps / AQE skew splits, never by the
# hot key's square.
#
# usage: tools/skew_sweep.sh <uniformDir> <skewDir> [budgetSec]
set -euo pipefail
UNI="$1"; SKEW="$2"; BUDGET="${3:-900}"
ONLY="q20_degrees,q21_common_neighbors,q22_neighbor_avg_degree,q23_triangles,\
q25_row_normalize_adj,q43_col_normalize_adj,q45_multi_relation_degrees,\
q46_edge_sampling_prob,q47_connected_components,q53_signed_degrees,\
q55_dedup_clusters,q64_multi_relation_sampling_prob,\
q65_edge_class_balanced_prob,q66_gcn_propagate,q67_gcn_propagate2,\
q73_pagerank,q75_kcore,q80_weighted_pagerank,q85_slice_feature_tensor,\
q86_attention_propagate,q87_temporal_attention_pool,q30_dedup_exact,\
q31_dedup_ngram_jaccard,q32_dedup_minhash,q33_dedup_simhash,\
q60_decontaminate,q63_line_dedup,q78_dup_spans,q81_pmi_bigrams"
for DIR in "$UNI" "$SKEW"; do
  echo "== $DIR =="
  SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_BENCH_BUDGET="$BUDGET" \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
done
