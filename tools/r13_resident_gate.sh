#!/bin/bash
# r13 resident-walk serving gate: price the driver-resident code walk
# (CONC_MODE=resident) on BOTH corpus shapes at the locust protocol,
# with the dense default and ivf as in-phase controls. Protocol as
# r13_manifold_gate.sh: prebuild with a minimal pass, then measure all
# modes in ONE fresh JVM / one VM phase, recall included.
set -x
cd /root/repo
log=/tmp/r13_resident_gate.log
: > $log
for fx in manifold uniform; do
  echo "== $fx prebuild (fixture + indexes, unmeasured) ==" >> $log
  env CONC_FIXTURE=$fx CONC_MODE=dense,ivf,resident \
    CONC_GRAPH_K=10 CONC_ENTRY=ivf \
    CONC_USERS=1 CONC_REQS=1 CONC_RECALL_QS=0 \
    sbt -batch "runMain graft.ConcurrencyProbe" 2>&1 |
    grep -E "CONCURRENCY3072|RECALL10" >> $log
  echo "== $fx menu (one phase, with recall) ==" >> $log
  env CONC_FIXTURE=$fx CONC_MODE=dense,ivf,resident \
    CONC_GRAPH_K=10 CONC_ENTRY=ivf \
    sbt -batch "runMain graft.ConcurrencyProbe" 2>&1 |
    grep -E "CONCURRENCY3072|RECALL10" >> $log
done
echo RESIDENT_DONE >> $log
