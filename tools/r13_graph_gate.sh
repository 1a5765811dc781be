#!/bin/bash
# r13 graph serving ladder: recall@10 + p95 for every graph config, then
# the resident-descent hnsw re-gate. Each run is one JVM; fixtures build
# on first use and are reused after.
set -x
cd /root/repo
log=/tmp/r13_graph_gate.log
: > $log
run() { "$@" sbt -batch "runMain graft.ConcurrencyProbe" 2>&1 | grep -E "RECALL10|CONCURRENCY3072|error\]" | grep -v WARN >> $log; echo "---" >> $log; }
run env CONC_MODE=graph
run env CONC_MODE=graph CONC_ENTRY=ivf
run env CONC_MODE=graph CONC_GRAPH_K=10
run env CONC_MODE=graph CONC_GRAPH_K=10 CONC_ENTRY=ivf
run env CONC_MODE=graph CONC_GRAPH_K=10 CONC_ENTRY=ivf CONC_GRAPH_EF=40 CONC_GRAPH_HOPS=4
run env CONC_MODE=hnsw
echo DONE >> $log
