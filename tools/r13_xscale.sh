#!/bin/bash
# r13: compressed NN-Descent at corpus scale (verdict item 2).
# int8 steps up while disk headroom holds (its round shuffle carries
# 3 KB codes; the 79 GB free on this box bounds the biggest safe n);
# pq runs at the full 200 k x 3072 target (codes are 32 B).
set -x
cd /root/repo
log=/tmp/r13_xscale.log
: > $log
free_gb() { df --output=avail -BG /tmp | tail -1 | tr -dc 0-9; }
run() {
  echo "== $* free=$(free_gb)G ==" >> $log
  "$@" sbt -batch "runMain graft.XScaleDescent" 2>&1 |
    grep -E "SCALEDESC" >> $log
  echo "after: free=$(free_gb)G" >> $log
}
run env XSD_CODEC=pq XSD_N=200000
run env XSD_CODEC=int8 XSD_N=25000
if [ "$(free_gb)" -gt 40 ]; then run env XSD_CODEC=int8 XSD_N=50000; fi
if [ "$(free_gb)" -gt 60 ]; then run env XSD_CODEC=int8 XSD_N=100000; fi
echo XSCALE_DONE >> $log
