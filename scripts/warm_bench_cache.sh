#!/bin/bash
# Regenerate the committed bench_cache/ compile-cache entries. Run after any
# runner/model/ops change that alters the three bench programs (the cache key
# is the HLO hash), with the TPU chip otherwise idle. The committed cache is
# what lets the driver's cold-machine 480s bench run all three phases warm —
# remote-tunnel compiles cost 250s+ per phase cold (BENCH_r04: the smaclite
# guard phase started at +421.8s and never emitted).
set -e
cd /root/repo
rm -rf bench_cache
BENCH_DEADLINE_S=2000 timeout 2100 python bench.py "$@"
echo "bench_cache size: $(du -sh bench_cache | cut -f1)"
