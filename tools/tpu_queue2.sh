#!/bin/sh
# Round-3 follow-up queue: re-measure everything the mid-session fixes
# touched (fused temporal kernel DMA alignment, any-hit epilogue, topk
# schedule default, wavefront SMEM cap + cond sweep), plus the Q=1
# wavefront sweep the first queue missed.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export LPRT_TPU_QUEUE=1
L=/tmp/q2
echo $$ > /tmp/q.lock
trap 'rm -f /tmp/q.lock' EXIT INT TERM
run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" >> $L.progress
  timeout 5400 "$@" > $L.$name.log 2>&1
  echo "=== $name exit=$? ($(date))" >> $L.progress
}
run bench python bench.py
run wf_profile python tools/profile_wavefront.py 6 3 16 1 8
run wf_tune python tools/bench_wavefront_tune.py 6 3
run large_46k python tools/bench_large_scene.py 6 3
run stage_budget python -m low_precision_raytracer_tpu.cli render cornell --width 1920 --height 1080 --precision bf16 --frames 3 --profile
echo ALL_DONE >> $L.progress
rm -f /tmp/q.lock
