#!/bin/bash
# r15: price SOAR spilled assignment vs single and vs plain
# second-nearest multi-assignment (the λ=0 ablation) on the manifold
# corpus. Emits XS_SETUP / XS_TRAIN / XS_ASSIGN / XS_RECALL lines;
# results land in SCALE.md §r15 (SOAR). 48g heap: the measurement run
# caches three assignment relations at once (a production build holds
# one).
set -x
cd /root/repo
log=/tmp/r15_soar.log
: > $log
echo "== 50k smoke ==" >> $log
env XS_N=50000 XS_CELLS=64 XS_QUERIES=5 SPARK_GRAFT_CPUS=8 \
  sbt -batch "runMain graft.XSoarScale" 2>&1 | grep -E "XS_" >> $log
echo "== 2M, 256 cells, three policies (exact + ADC shortlist=50) ==" >> $log
env SPARK_DRIVER_MEM=48g XS_N=2000000 XS_CELLS=256 XS_QUERIES=20 \
  SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.XSoarScale" 2>&1 | grep -E "XS_" >> $log
echo "== 2M ADC at shortlist=200 (the coupling dial) ==" >> $log
env SPARK_DRIVER_MEM=48g XS_N=2000000 XS_CELLS=256 XS_QUERIES=20 \
  XS_SHORTLIST=200 XS_SKIP_EXACT=1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.XSoarScale" 2>&1 | grep -E "XS_" >> $log
echo SOAR_DONE >> $log
