#!/bin/bash
# r13 manifold-fixture serving gate: price graph/hnsw (and the dense
# default, as the in-phase control) on LOW-INTRINSIC-DIMENSION data —
# the corpus shape where graph navigation has gradient. Protocol as
# r13_menu_gate.sh: prebuild every fixture/index with a minimal pass,
# then measure all modes with recall in ONE fresh JVM / one VM phase.
set -x
cd /root/repo
log=/tmp/r13_manifold_gate.log
: > $log
echo "== prebuild (fixture + indexes, unmeasured) ==" >> $log
env CONC_FIXTURE=manifold CONC_MODE=dense,ivf,graph,hnsw \
  CONC_GRAPH_K=10 CONC_HNSW_K0=10 CONC_ENTRY=ivf \
  CONC_USERS=1 CONC_REQS=1 CONC_RECALL_QS=0 \
  sbt -batch "runMain graft.ConcurrencyProbe" 2>&1 |
  grep -E "CONCURRENCY3072|RECALL10" >> $log
echo "== manifold menu (one phase, with recall) ==" >> $log
env CONC_FIXTURE=manifold CONC_MODE=dense,ivf,graph,hnsw,brute \
  CONC_GRAPH_K=10 CONC_HNSW_K0=10 CONC_ENTRY=ivf \
  sbt -batch "runMain graft.ConcurrencyProbe" 2>&1 |
  grep -E "CONCURRENCY3072|RECALL10" >> $log
echo MANIFOLD_DONE >> $log
