#!/bin/bash
# r14: exercise the resident-walk budget at its declared 2M-node edge
# (VERDICT r13 items 3+4). dim=128 keeps the 2M adjacency on this VM's
# disk; the walk's cost model is dim-independent except the code bytes.
# Emits XRS_BUILD / XRS_LOAD / XRS_REFUSE / XRS_RECALL10 / XRS_SERVE
# lines; artifacts cache under the Fp16Corpus work root (rebuildable).
set -x
cd /root/repo
log=/tmp/r14_resident_edge.log
: > $log
echo "== 1M warm-up point (budget midpoint) ==" >> $log
env XRS_N=1000000 XRS_DIM=128 \
  sbt -batch "runMain graft.XResidentScale" 2>&1 | grep -E "^\[info\] XRS_" >> $log
echo "== 2M — the declared DefaultMaxResidentNodes edge ==" >> $log
env XRS_N=2000000 XRS_DIM=128 \
  sbt -batch "runMain graft.XResidentScale" 2>&1 | grep -E "^\[info\] XRS_" >> $log
echo "== 2M under a 4g heap: the transient BOUND (artifacts cached; " >> $log
echo "   boxed-Row collects would not fit — primitives + GC headroom do) ==" >> $log
env XRS_N=2000000 XRS_DIM=128 SPARK_DRIVER_MEM=4g \
  sbt -batch "runMain graft.XResidentScale" 2>&1 | grep -E "^\[info\] XRS_" >> $log
echo EDGE_DONE >> $log
