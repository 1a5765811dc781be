#!/bin/bash
# r15: measure the bucket-density dial at the 2M resident edge
# (VERDICT r14 item 1 / the weak item). The r14 capacity adjudication of
# the 841ms 20-user p95 STATED the fix — scale `buckets` with adjacency
# rows (~50k rows/bucket; 2M nodes x 11 rows = 22M rows -> ~440 buckets
# vs the shipped 64) — but never rebuilt and re-measured. This script
# builds the 2M adjacency ONCE (cellKnnGraph, ~26 min), lays it out at
# buckets=440, then RE-BUCKETS the same edges at 64 (fast) so both serve
# points are same-graph same-phase: the delta is pure layout density.
set -x
cd /root/repo
log=/tmp/r15_resident_buckets.log
: > $log
echo "== 2M edge at buckets=440 (~50k rows/bucket, the stated dial) ==" >> $log
env XRS_N=2000000 XRS_DIM=128 XRS_BUCKETS=440 \
  sbt -batch "runMain graft.XResidentScale" 2>&1 | grep -E "^\[info\] XRS_" >> $log
echo "== 2M edge at buckets=64 (the r14 shipped density; re-bucketed " >> $log
echo "   from the same graph for a phase-controlled comparison) ==" >> $log
env XRS_N=2000000 XRS_DIM=128 XRS_BUCKETS=64 \
  sbt -batch "runMain graft.XResidentScale" 2>&1 | grep -E "^\[info\] XRS_" >> $log
echo "== both densities at 5 users (the capacity model's second point) ==" >> $log
env XRS_N=2000000 XRS_DIM=128 XRS_BUCKETS=440 XRS_USERS=5 XRS_REQS=40 \
  sbt -batch "runMain graft.XResidentScale" 2>&1 | grep -E "^\[info\] XRS_" >> $log
env XRS_N=2000000 XRS_DIM=128 XRS_BUCKETS=64 XRS_USERS=5 XRS_REQS=40 \
  sbt -batch "runMain graft.XResidentScale" 2>&1 | grep -E "^\[info\] XRS_" >> $log
echo BUCKETS_DONE >> $log
