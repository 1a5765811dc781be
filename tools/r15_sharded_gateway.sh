#!/bin/bash
# r15: measure the sharded resident gateway at 2 x 1M (VERDICT r14 item
# 2). Two disjoint 1M-node shards, per-shard budget pinned AT 1M — the
# configuration where a single resident index over the 2M union REFUSES
# (XSH_REFUSE line demonstrates it against the r15 ladder's cached 2M
# layout) and the fan-and-merge gateway is the path. Emits XSH_BUILD /
# XSH_REFUSE / XSH_LOAD / XSH_RECALL10 / XSH_SERVE.
set -x
cd /root/repo
log=/tmp/r15_sharded_gateway.log
: > $log
echo "== 2 x 1M shards, 20 users (the locust gate shape) ==" >> $log
env XSH_SHARD_N=1000000 XSH_SHARDS=2 XSH_DIM=128 \
  sbt -batch "runMain graft.XShardedScale" 2>&1 | grep -E "^\[info\] XSH_" >> $log
echo "== same gateway at 5 users (the capacity model's second point) ==" >> $log
env XSH_SHARD_N=1000000 XSH_SHARDS=2 XSH_DIM=128 XSH_USERS=5 XSH_REQS=40 \
  sbt -batch "runMain graft.XShardedScale" 2>&1 | grep -E "^\[info\] XSH_" >> $log
echo SHARDED_DONE >> $log
