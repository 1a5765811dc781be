#!/bin/bash
# r14: the compressed-descent CONVERGENCE ladder (VERDICT r13 item 5).
# r13 measured edge recall@5 at FIXED rounds=3/buildK=10 decaying
# 0.54->0.11 over 25k->200k; this ladder sweeps rounds and buildK per n
# on both fixtures to find the growth rule that holds recall flat.
# dim=768 (prefix slice) keeps the 100k manifold runs inside this VM's
# disk — the hub structure, which is what the cap is priced on, is
# dim-independent. Cap = 2*buildK on manifold (required); uncapped on
# uniform (r13 baseline shape).
set -x
cd /root/repo
log=/tmp/r14_descent_ladder.log
: > $log

run() { # fixture n rounds buildK cap
  env XSD_FIXTURE=$1 XSD_N=$2 XSD_ROUNDS=$3 XSD_BK=$4 XSD_CAP=$5 \
    XSD_DIM=768 XSD_CODEC=int8 \
    sbt -batch "runMain graft.XScaleDescent" 2>&1 |
    grep -E "SCALEDESC" >> $log
}

echo "== uniform: hold recall flat as n doubles ==" >> $log
run uniform  25000 3 10 0
run uniform  50000 3 10 0
run uniform  50000 4 10 0
run uniform  50000 3 14 0
run uniform 100000 3 10 0
run uniform 100000 5 10 0
run uniform 100000 3 20 0
run uniform 100000 4 14 0

echo "== manifold (capped 2*buildK): same sweep ==" >> $log
run manifold  25000 3 10 20
run manifold  50000 3 10 20
run manifold  50000 4 10 20
run manifold  50000 3 14 28
run manifold 100000 3 10 20
run manifold 100000 4 14 28

echo LADDER_DONE >> $log
