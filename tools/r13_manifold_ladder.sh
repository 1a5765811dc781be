#!/bin/bash
# r13 manifold recall/latency ladder: ef × hops sweep for the layered
# (resident-descent) hnsw walk and the flat ivf-entry graph walk over
# the prebuilt manifold indexes (r13_manifold_gate.sh must have run).
set -x
cd /root/repo
log=/tmp/r13_manifold_ladder.log
: > $log
for cfg in "48 3" "64 5" "128 6"; do
  set -- $cfg
  ef=$1; hops=$2
  echo "== ef=$ef hops=$hops ==" >> $log
  env CONC_FIXTURE=manifold CONC_MODE=hnsw,graph \
    CONC_GRAPH_K=10 CONC_HNSW_K0=10 CONC_ENTRY=ivf \
    CONC_GRAPH_EF=$ef CONC_GRAPH_HOPS=$hops \
    sbt -batch "runMain graft.ConcurrencyProbe" 2>&1 |
    grep -E "CONCURRENCY3072|RECALL10" >> $log
done
echo LADDER_DONE >> $log
